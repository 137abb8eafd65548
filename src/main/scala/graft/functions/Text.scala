package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * token counting, language-ID, quality scoring, fingerprinting, shingles.
  * All pure Column pipelines (codegen'd, no UDFs) so they survive a 100 TB
  * scan: each is a narrow map over the `text` column with no shuffle.
  */
object Text {

  /** Whitespace token count. Native single-scan kernel
    * ([[graft.plans.TokenCountExpr]]) with the exact semantics of
    * `size(split(trim(text), "\\s+"))` — the composable form
    * materializes the full split array per row just to take its
    * length. */
  def token_count(text: Column): Column =
    graft.plans.TextExpressions.token_count(text)

  /** BPE-ish subword token estimate: words + punctuation marks counted
    * separately (a cheap proxy for a real tokenizer's token count). */
  def subword_token_count(text: Column): Column =
    size(split(trim(text), "\\s+")) +
      length(regexp_replace(text, "[\\p{L}\\p{N}\\s]", ""))

  /** n-gram character shingles of the normalized text (lowercased,
    * whitespace collapsed). Returns ArrayType(StringType). Native
    * single-pass kernel — the composable transform/sequence/substr form
    * re-runs the normalization regex per element (quadratic, see
    * graft.plans.TextExpressions). */
  def char_shingles(text: Column, n: Int): Column =
    graft.plans.TextExpressions.char_shingles(text, n)

  /** Word n-gram shingles. Returns ArrayType(StringType). */
  def word_shingles(text: Column, n: Int): Column =
    graft.plans.TextExpressions.word_shingles(text, n)

  /** Quality-score features: length, mean word length, punctuation ratio,
    * stopword ratio, uppercase ratio — the standard cheap heuristics. */
  def quality_features(text: Column): Column = {
    val t = trim(text)
    val nChars = length(t).cast("double")
    val words = split(t, "\\s+")
    val nWords = size(words).cast("double")
    val punct = length(regexp_replace(t, "[^.,;:!?]", "")).cast("double")
    val upperChars = length(regexp_replace(t, "[^A-Z]", "")).cast("double")
    val stopwords: Seq[Any] = Seq("the", "a", "an", "and", "or", "of", "to",
      "in", "is", "it", "that", "for", "on", "with", "as")
    val stopHits =
      size(filter(words, w => lower(w).isin(stopwords: _*))).cast("double")
    struct(
      nChars.as("n_chars"),
      nWords.as("n_words"),
      (nChars / greatest(nWords, lit(1.0))).as("mean_word_len"),
      (punct / greatest(nChars, lit(1.0))).as("punct_ratio"),
      (stopHits / greatest(nWords, lit(1.0))).as("stopword_ratio"),
      (upperChars / greatest(nChars, lit(1.0))).as("upper_ratio"))
  }

  /** Simple additive quality score in [0,1]. */
  def quality_score(text: Column): Column = {
    val f = quality_features(text)
    val lenOk = when(f.getField("n_words").between(5, 100000), 0.4).otherwise(0.0)
    val punctOk = when(f.getField("punct_ratio") <= 0.1, 0.3).otherwise(0.0)
    val stopOk = when(f.getField("stopword_ratio") >= 0.05, 0.3).otherwise(0.0)
    round(lenOk + punctOk + stopOk, 1)
  }

  /** Repetition features (the Gopher-style repetitiousness gates): word
    * duplication fraction and the fraction of word-bigram slots taken by
    * the single most frequent bigram. Entirely row-local (one narrow map,
    * no shuffle): the bigram mode-count runs over the row's own sorted
    * bigram array via `aggregate`, not via an explode+groupBy — at 100 TB
    * that is the difference between a scan and a corpus-wide shuffle of
    * every bigram occurrence. */
  def repetition_features(text: Column): Column = {
    val words = split(trim(lower(text)), "\\s+")
    val n = size(words)
    val dupWordFrac = when(n > 0,
      lit(1.0) - size(array_distinct(words)).cast("double") / n.cast("double"))
      .otherwise(lit(0.0))
    // Native single-pass kernel: the composable transform(sequence …)
    // form re-evaluates the captured words array per element when it
    // falls out of codegen (the quadratic trap documented in
    // graft.plans.TextKernels). Guard: the kernel returns the whole text
    // as one window for <2 words, which is not a bigram.
    val bigrams = when(n >= 2, word_shingles(text, 2))
      .otherwise(array().cast("array<string>"))
    // most-frequent-bigram multiplicity: native hash-count kernel — the
    // composable array_sort + aggregate(run-length) form runs its
    // lambda interpreted per element
    val topCount = graft.plans.TextExpressions.top_count(bigrams)
    val topBigramFrac = when(n >= 2,
      topCount.cast("double") / (n - 1).cast("double")).otherwise(lit(0.0))
    struct(
      n.cast("long").as("n_words"),
      dupWordFrac.as("dup_word_frac"),
      topBigramFrac.as("top_bigram_frac"))
  }

  /** The COMPLETE published Gopher n-gram repetition bundle (Rae et
    * al. 2021 §A1.1, table A1): top n-gram character fraction for
    * n ∈ {2,3,4} (thresholded 0.20/0.18/0.16 in the paper) and
    * duplicate n-gram character fraction for n ∈ {5..10}
    * (0.15…0.10) — the signals [[repetition_features]]' single
    * top-bigram slot fraction approximates. Fractions normalize by
    * TEXT characters as in the paper (word char mass — separators
    * excluded from both sides of the ratio): top n-gram = every
    * occurrence's chars over text chars; duplicate n-gram =
    * positional COVERAGE (chars of words inside ≥1 occurrence of a
    * repeated gram, each word counted once) over text chars — see
    * [[graft.plans.TextKernels.repetitionNgramFeatures]] for the
    * exact units contract. All 9 features come from ONE fused native
    * kernel pass (one tokenization, one reused hash map); 4-dp
    * rounding in the Column layer for cross-engine replay. Documents
    * with fewer than n words score 0 for the n-gram features.
    *
    * Tokenization contract (shared with every word-granularity kernel
    * and oracle in this repo): input is expected whitespace-normalized
    * text — the kernel's Java trim/\s+ split and the oracle's DuckDB
    * trim/RE2 \s+ agree on space/tab/newline/CR/FF-separated text but
    * diverge on exotic edges (a leading U+000B, say); the corpus
    * contract is normalized extraction output (html_to_text
    * canonicalizes whitespace upstream). */
  def repetition_ngram_features(text: Column): Column = {
    // coalesce: NULL text scores 0.0 everywhere (and keeps), exactly
    // like empty text — the null-safe kernel alone would return a
    // NULL struct and flip the gate to a silent drop
    val f = graft.plans.TextExpressions
      .repetition_ngram_raw(coalesce(text, lit("")))
    val names = Seq(2, 3, 4).map(k => s"top_${k}gram_char_frac") ++
      (5 to 10).map(k => s"dup_${k}gram_char_frac")
    struct(names.map(c => round(f.getField(c), 4).as(c)): _*)
  }

  /** The Gopher keep-decision over [[repetition_ngram_features]] —
    * the paper's table A1 thresholds: top n-gram char fraction ≤
    * 0.20/0.18/0.16 for n=2/3/4, duplicate n-gram char fraction ≤
    * 0.15/0.14/0.13/0.12/0.11/0.10 for n=5..10; AND-composed. The
    * feature fractions normalize by text chars (see
    * [[repetition_ngram_features]]), so these are the published cuts
    * applied in the published units. Pass
    * the SAME struct Column so the features compute once per row.
    *
    * Compose with the paper's 50-word minimum-length rule
    * ([[gopher_keep]]'s minWords): standalone, the table-A1 cuts are
    * non-monotone on very short documents — a 2..~9-word doc fails on
    * its inherently-high top fraction while a sub-n-word doc scores 0
    * and passes; under the composed Gopher gate both fail the length
    * rule first, which is the published semantics. */
  def repetition_ngram_keep(f: Column): Column = {
    val tops = Seq(2 -> 0.20, 3 -> 0.18, 4 -> 0.16)
      .map { case (n, t) => f.getField(s"top_${n}gram_char_frac") <= t }
    val dups = (5 to 10).zip(Seq(0.15, 0.14, 0.13, 0.12, 0.11, 0.10))
      .map { case (n, t) => f.getField(s"dup_${n}gram_char_frac") <= t }
    (tops ++ dups).reduce(_ && _)
  }

  /** Compression-ratio quality signal (the RefinedWeb/Gopher-family
    * heuristic): raw-DEFLATE(level 6) size ÷ UTF-8 size, via the native
    * [[graft.plans.TextExpressions.deflated_size]] kernel. Natural text
    * lands mid-range; near-1.0 is high-entropy noise (binary spill,
    * encrypted/compressed payloads pasted as text), near-0 is repeated
    * boilerplate. Null/empty text → null (a 0-byte doc has no ratio).
    * Row-local, zero shuffle — scoring a corpus is one scan. */
  def compression_ratio(text: Column): Column = {
    val bytes = octet_length(text)
    when(bytes > 0,
      round(graft.plans.TextExpressions.deflated_size(text)
        .cast("double") / bytes.cast("double"), 4))
  }

  /** Gopher-rule document features (Rae et al. 2021 §A1.1, the quality
    * bundle every modern curation stack reuses — complements
    * [[quality_features]]' generic ratios and [[repetition_features]]'
    * n-gram repetition with the word-shape and line-shape rules):
    * word count, mean word length, alphabetic-word fraction,
    * symbol-to-word ratio (`#`, `...`, `…`), bullet-line and
    * ellipsis-line fractions, duplicate-line fraction and
    * duplicate-line CHARACTER fraction. Entirely row-local (split +
    * higher-order filter/aggregate — no explode, no shuffle): scoring
    * a 100 TB corpus is one scan. All ratios round to 4 dp so the
    * identical arithmetic replays in DuckDB (`q_quality_gopher`). */
  def gopher_features(text: Column): Column = {
    val t = trim(text)
    val words = when(t === "", array().cast("array<string>"))
      .otherwise(split(t, "\\s+"))
    val nWords = size(words).cast("long")
    val wordChars =
      coalesce(aggregate(words, lit(0L), (a, w) => a + length(w)), lit(0L))
    val meanWordLen = when(nWords > 0,
      round(wordChars.cast("double") / nWords, 4)).otherwise(lit(0.0))
    val alphaFrac = when(nWords > 0,
      round(size(filter(words, w => w.rlike("[A-Za-z]"))).cast("double")
        / nWords, 4)).otherwise(lit(0.0))
    val hashes = (length(t) - length(replace(t, lit("#"), lit("")))).cast("long")
    val ell3 = ((length(t) - length(replace(t, lit("..."), lit("")))) / 3)
      .cast("long") // leftmost non-overlapping removal → always a multiple of 3
    val ellU = (length(t) - length(replace(t, lit("…"), lit("")))).cast("long")
    val symbolRatio = when(nWords > 0,
      round((hashes + ell3 + ellU).cast("double") / nWords, 4))
      .otherwise(lit(0.0))
    val lines = split(text, "\n", -1) // split("") = [""] → nLines >= 1 always
    val nLines = size(lines).cast("long")
    val bulletFrac = round(
      size(filter(lines, l => trim(l).rlike("^[-*•]"))).cast("double")
        / nLines, 4)
    val ellipsisFrac = round(
      size(filter(lines, l => trim(l).rlike("(\\.\\.\\.|…)$"))).cast("double")
        / nLines, 4)
    val dupLineFrac = round(
      lit(1.0) - size(array_distinct(lines)).cast("double") / nLines, 4)
    val lineChars =
      coalesce(aggregate(lines, lit(0L), (a, l) => a + length(l)), lit(0L))
    val distinctChars = coalesce(
      aggregate(array_distinct(lines), lit(0L), (a, l) => a + length(l)),
      lit(0L))
    val dupLineCharFrac = when(lineChars > 0,
      round((lineChars - distinctChars).cast("double") / lineChars, 4))
      .otherwise(lit(0.0))
    struct(
      nWords.as("n_words"),
      meanWordLen.as("mean_word_len"),
      alphaFrac.as("alpha_word_frac"),
      symbolRatio.as("symbol_word_ratio"),
      bulletFrac.as("bullet_line_frac"),
      ellipsisFrac.as("ellipsis_line_frac"),
      dupLineFrac.as("dup_line_frac"),
      dupLineCharFrac.as("dup_line_char_frac"))
  }

  /** The Gopher keep-decision over [[gopher_features]] — every rule a
    * closed threshold on one feature, AND-composed; thresholds default
    * to the published Gopher values. Pass the SAME struct Column (not a
    * re-computation) so the features compute once per row. */
  def gopher_keep(f: Column,
      minWords: Long = 50, maxWords: Long = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, minAlphaFrac: Double = 0.8,
      maxBulletFrac: Double = 0.9, maxEllipsisFrac: Double = 0.3,
      maxDupLineFrac: Double = 0.3, maxDupLineCharFrac: Double = 0.2)
      : Column =
    f.getField("n_words").between(minWords, maxWords) &&
      f.getField("mean_word_len").between(minMeanWordLen, maxMeanWordLen) &&
      f.getField("symbol_word_ratio") <= maxSymbolRatio &&
      f.getField("alpha_word_frac") >= minAlphaFrac &&
      f.getField("bullet_line_frac") <= maxBulletFrac &&
      f.getField("ellipsis_line_frac") <= maxEllipsisFrac &&
      f.getField("dup_line_frac") <= maxDupLineFrac &&
      f.getField("dup_line_char_frac") <= maxDupLineCharFrac

  /** Gopher table-A1 paragraph-repetition pair (Rae et al. 2021 —
    * the PARAGRAPH-granularity complement to [[gopher_features]]'
    * line pair; the paper thresholds both): paragraphs split on the
    * blank-line boundary `\n\n`, duplicate-paragraph fraction
    * (1 − distinct/total) and duplicate-paragraph CHARACTER fraction
    * ((chars − distinctChars)/chars — one boilerplate banner pasted
    * between every section weighs by its length, not its count).
    * Row-local higher-order array ops, zero shuffle; ratios round to
    * 4 dp so the identical arithmetic replays in DuckDB
    * (`q_quality_gopher_para`). `split("", …)` yields `[""]`, so
    * n_paras ≥ 1 and the frac denominator never zeroes. */
  def paragraph_dup_features(text: Column): Column = {
    val paras = split(text, "\n\n", -1)
    val nParas = size(paras).cast("long")
    val dupParaFrac = round(
      lit(1.0) - size(array_distinct(paras)).cast("double") / nParas, 4)
    val paraChars =
      coalesce(aggregate(paras, lit(0L), (a, p) => a + length(p)), lit(0L))
    val distinctChars = coalesce(
      aggregate(array_distinct(paras), lit(0L), (a, p) => a + length(p)),
      lit(0L))
    val dupParaCharFrac = when(paraChars > 0,
      round((paraChars - distinctChars).cast("double") / paraChars, 4))
      .otherwise(lit(0.0))
    struct(
      nParas.as("n_paras"),
      dupParaFrac.as("dup_para_frac"),
      dupParaCharFrac.as("dup_para_char_frac"))
  }

  /** The published A1 paragraph gate over [[paragraph_dup_features]]:
    * keep iff dup_para_frac ≤ 0.30 AND dup_para_char_frac ≤ 0.20
    * (Gopher's table values as defaults). AND-compose with
    * [[gopher_keep]] for the full rule set. */
  def gopher_para_keep(f: Column,
      maxDupParaFrac: Double = 0.30,
      maxDupParaCharFrac: Double = 0.20): Column =
    f.getField("dup_para_frac") <= maxDupParaFrac &&
      f.getField("dup_para_char_frac") <= maxDupParaCharFrac

  /** Code-vs-prose routing features — the cheap structural heuristics
    * web pipelines use to ROUTE documents before language-specific
    * processing (code goes to a code pipeline, not through prose
    * quality gates that would shred it; C4 instead just drops `{`
    * lines): fraction of lines carrying code punctuation (`{`/`}`/`;`),
    * fraction of indentation-led lines (4+ spaces or tab), and the
    * character mass in code symbols `{}[]();=<>`. Row-local split +
    * higher-order filters, 4-dp rounding for the DuckDB replay
    * (`q_quality_code_detect`); one scan, zero shuffle. */
  def code_features(text: Column): Column = {
    val lines = split(text, "\n", -1)
    val nLines = size(lines).cast("double")
    val braceFrac = round(
      size(filter(lines, l => l.rlike("[{};]"))) / nLines, 4)
    val indentFrac = round(
      size(filter(lines, l => l.rlike("^( {4}|\t)"))) / nLines, 4)
    val chars = length(text).cast("long")
    val symFrac = when(chars > 0, round(
      (chars - length(translate(text, "{}[]();=<>", ""))).cast("double")
        / chars, 4)).otherwise(lit(0.0))
    struct(
      braceFrac.as("brace_line_frac"),
      indentFrac.as("indent_line_frac"),
      symFrac.as("symbol_char_frac"))
  }

  /** The routing decision over [[code_features]] — any one structural
    * signal past its threshold marks the doc code-like (OR-composed:
    * minified JS trips symbols with no indentation; Python trips
    * indentation with no braces). Defaults are heuristic, not from a
    * paper — tune per corpus. */
  def code_like(f: Column,
      minBraceFrac: Double = 0.3, minIndentFrac: Double = 0.3,
      minSymbolFrac: Double = 0.08): Column =
    f.getField("brace_line_frac") >= minBraceFrac ||
      f.getField("indent_line_frac") >= minIndentFrac ||
      f.getField("symbol_char_frac") >= minSymbolFrac

  /** Script fractions + dominant script over a
    * [[graft.plans.TextExpressions.script_counts]] struct — the
    * multilingual routing signal (script gates BEFORE langid: a
    * Latin-trained model scores garbage on Devanagari). Pass the SAME
    * struct Column so the kernel runs once per row. Fractions round to
    * 4 dp (DuckDB replay, `q_text_script_profile`); dominant breaks
    * ties by the canonical bucket order (first ≥-max wins), `none`
    * for letterless text. Row-local, zero shuffle. */
  def scriptFractions(c: Column): Column = {
    val names = Seq("latin", "cyrillic", "greek", "arabic", "han", "hangul",
      "other")
    val nL = c.getField("n_letters")
    def frac(n: String) = when(nL > 0,
      round(c.getField(n).cast("double") / nL, 4)).otherwise(lit(0.0))
    // first bucket ≥ every later bucket wins — the oracle's CASE chain
    // replays the same tie-break
    val dominant = names.init.zipWithIndex.foldLeft(
      when(nL === 0, "none")) { case (acc, (n, i)) =>
        acc.when(names.drop(i + 1)
          .map(m => c.getField(n) >= c.getField(m)).reduce(_ && _), n)
      }.otherwise(names.last)
    struct(
      (nL.as("n_letters") +: names.map(n => frac(n).as(s"${n}_frac"))) :+
        dominant.as("dominant"): _*)
  }

  /** HTML → text extraction — the first step of every web-corpus
    * pipeline (C4/CommonCrawl lineage). Pure chained regexp/replace
    * Column ops (codegen'd, RE2-safe so the identical arithmetic
    * replays in DuckDB), one narrow map, zero shuffle:
    *
    *   1. drop `<script>`/`<style>` blocks wholesale (lazy spans);
    *   2. block-level closers + `<br>` become newlines;
    *   3. every remaining tag strips to a space (inline tags must not
    *      glue adjacent words together);
    *   4. the six ubiquitous entities decode — `&amp;` LAST, so
    *      `&amp;lt;` correctly yields `&lt;` and not `<`;
    *   5. whitespace canonicalizes: horizontal runs → one space,
    *      spaces shaved around newlines, ≥3 blank-line runs → one
    *      blank line, outer whitespace trimmed (regex trim — plain
    *      `trim` leaves newlines).
    */
  def html_to_text(html: Column): Column = {
    val noBlocks = regexp_replace(html,
      "(?is)<(?:script|style)[^>]*>.*?</(?:script|style)\\s*>", " ")
    val withBreaks = regexp_replace(noBlocks,
      "(?i)<(?:br\\s*/?|/p|/div|/h[1-6]|/li|/tr|/ul|/ol|/table)\\s*>", "\n")
    val noTags = regexp_replace(withBreaks, "<[^>]+>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (ent, ch)) => replace(c, lit(ent), lit(ch)) }
    val ws = regexp_replace(
      regexp_replace(
        regexp_replace(decoded, "[ \\t\\r]+", " "),
        " *\\n *", "\n"),
      "\\n{3,}", "\n\n")
    regexp_replace(ws, "^\\s+|\\s+$", "")
  }

  /** Deterministic document fingerprint: sha-256 of the normalized text
    * (lowercase, whitespace collapsed) — the exact-dedup key. sha2 is
    * portable across engines (DuckDB sha256), unlike xxhash64 seeds. */
  def fingerprint(text: Column): Column =
    sha2(lower(regexp_replace(trim(text), "\\s+", " ")), 256)

  /** Heuristic language-ID over stopword markers per language. Returns the
    * language with the highest marker hit-count ('und' when nothing hits;
    * ties break toward the later language code). One narrow pass. */
  private val langMarkers: Seq[(String, Seq[Any])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "es" -> Seq("el", "la", "de", "que", "los"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"))

  /** The language codes [[lang_id]] can emit (besides 'und') — vote
    * buckets for [[graft.operators.Corpus.unitLangProfile]]. */
  val langIdCodes: Seq[String] = langMarkers.map(_._1)

  def lang_id(text: Column): Column = {
    val markers = langMarkers
    val words = split(lower(trim(text)), "\\s+")
    val scores = markers.map { case (lang, ws) =>
      struct(
        size(filter(words, w => w.isin(ws: _*))).as("hits"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(scores: _*))
    when(best.getField("hits") > 0, best.getField("lang")).otherwise("und")
  }
}
