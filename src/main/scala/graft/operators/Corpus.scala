package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines: deterministic
  * sampling, per-group caps, and BM25 retrieval scoring.
  *
  * Scale design notes:
  *  - [[hashKeep]] is a pure map-side filter — sampling 100 TB costs one
  *    scan, no shuffle, and is reproducible across reruns and engines
  *    (md5 of the content, not Spark's partition-dependent `rand()`).
  *  - [[capPerGroup]] shuffles once on the group key; with per-group
  *    output bounded at `n` Spark plans a WindowGroupLimit, so the
  *    exchange carries at most what survives the running top-n per map
  *    task, not the full group.
  *  - [[bm25]] is two scans: one tiny aggregate for the corpus stats
  *    (broadcast back as a 1-row cross join) and one map over documents;
  *    term frequencies are row-local array ops, so the only wide plan
  *    node in a top-k retrieval is the final TakeOrdered.
  */
object Corpus {

  /** Deterministic Bernoulli-style sampling predicate: keep rows whose
    * md5(key) prefix falls below `rate` of the 16-bit prefix space.
    * Content-hash sampling dedups with reruns (same doc → same verdict)
    * and is portable to any engine with md5. */
  def hashKeep(key: Column, rate: Double): Column = {
    require(rate >= 0 && rate <= 1, "rate must be in [0,1]")
    // rate 1.0 would format as 5-hex-char "10000", which compares
    // LOWER than most 4-char buckets as a string (the hazard
    // [[splitByHash]] and rebalanceMixture document) — keeping only
    // the ~1/16 of buckets starting with '0'. Short-circuit.
    if (rate >= 1.0) lit(true)
    else {
      val threshold = f"${math.floor(rate * 65536).toInt}%04x"
      hashBucket(key) < lit(threshold)
    }
  }

  /** The 4-hex-char md5 prefix used by [[hashKeep]] (exposed so callers
    * can stratify: different thresholds per stratum over one hash). */
  def hashBucket(key: Column): Column = substring(md5(key), 1, 4)

  /** Deterministic train/val/test (or any weighted) split: each row's
    * label is picked by which cumulative-fraction range its
    * [[hashBucket]] prefix falls in. Map-only (zero shuffle at any
    * scale), rerun-stable, engine-portable, and independent of
    * partition layout — unlike `randomSplit`, whose assignment changes
    * with the partitioning; content-keyed splits also keep exact
    * duplicates on the same side, so a dedup-imperfect corpus cannot
    * leak train rows into eval. Fraction granularity is 1/65536. */
  def splitByHash(key: Column, fractions: Seq[(String, Double)],
      outCol: String = "split"): Column = {
    require(fractions.nonEmpty && fractions.forall(_._2 >= 0) &&
      math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      "fractions must be non-negative and sum to 1")
    val cum = fractions.scanLeft(0.0)(_ + _._2).tail
    // null keys hash like the empty string (deterministic range
    // membership) instead of silently falling through every
    // comparison into the LAST split
    val b = hashBucket(coalesce(key.cast("string"), lit("")))
    cum.init.zip(fractions.init).foldRight(
      lit(fractions.last._1): Column) { case ((c, (name, _)), rest) =>
      // a cumulative fraction of 1.0 (trailing zero-weight splits)
      // would format as 5-hex-char "10000", which compares LOWER than
      // 4-char buckets as a string (same hazard rebalanceMixture
      // documents) — short-circuit to an always-true condition
      val cond =
        if (c >= 1.0) lit(true)
        else b < lit(f"${math.floor(c * 65536).toInt}%04x")
      when(cond, name).otherwise(rest)
    }.as(outCol)
  }

  /** Duplicated word-n-gram SPAN detection ("Deduplicating Training
    * Data Makes Language Models Better"-style substring dedup, at word
    * granularity): every position whose n-gram occurs ≥ `minCount`
    * times corpus-wide, merged into maximal spans per document.
    * Returns (idCol, span_start, span_end, n_windows) with inclusive
    * word indices into the normalized (lowercased,
    * whitespace-collapsed) token stream; documents shorter than n
    * words yield no spans.
    *
    * Scale shape: grams are hashed map-side to 8-byte keys (the native
    * in-order [[graft.plans.ShinglesExpr]] kernel feeds xxhash64), so
    * the global count groupBy shuffles (hash) and the position join
    * shuffles (hash, doc, pos) — gram TEXT never crosses the wire; the
    * span merge is the classic gaps-and-islands window, partitioned
    * per document. A 64-bit collision can only mark an extra window as
    * duplicated (never unmark one) — at 2⁻⁶⁴ per gram pair, accepted.
    * Fan-out is |tokens| rows per document — the same order as the
    * tokenize pass every curation pipeline already does. */
  def duplicatedSpans(docs: DataFrame, textCol: String, idCol: String,
      n: Int = 4, minCount: Long = 2L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // `grams` feeds both the count aggregate and the position join —
    // deliberately UNcached: the lineage is a map-only explode (scan +
    // kernel, no shuffle), so recomputing it costs one extra map pass,
    // while persisting |tokens| rows of exploded corpus inside a
    // lazily-returned result would pin a session cache entry this
    // function can never unpersist (the r8 leak class). dedupLinesImpl
    // caches its explode because its consumers are EAGER (two counting
    // passes + a collect) and the cache drops before return.
    val grams = Dedup.fanOut(docs.select(col(idCol), col(textCol)))
      .filter(graft.plans.TextExpressions.token_count(col(textCol)) >= n)
      .select(col(idCol).as("__doc"),
        posexplode(graft.plans.TextExpressions
          .word_shingles(col(textCol), n)).as(Seq("p", "__g")))
      .select(col("__doc"), col("p"), xxhash64(col("__g")).as("__gh"))
    val dup = grams.groupBy("__gh")
      .agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") >= minCount)
      .select("__gh")
    val marked = grams.join(dup, Seq("__gh")).select("__doc", "p")
    // Maximal spans: two duplicated windows at start positions p1 < p2
    // overlap or touch whenever p2 - p1 <= n, so islands merge on THAT
    // gap, not only on consecutive starts — otherwise windows at 0 and
    // 2 (n=4) emit overlapping spans [0,3] and [2,5] and a consumer
    // summing span lengths double-counts the shared tokens. Classic
    // gaps-and-islands with tolerance: flag each island head, running-
    // sum the flags (both windows share one partition sort).
    val byPos = Window.partitionBy("__doc").orderBy("p")
    marked
      .withColumn("__head",
        when(coalesce(col("p") - lag("p", 1).over(byPos), lit(n + 1)) > n,
          1L).otherwise(0L))
      .withColumn("__isl", sum("__head").over(byPos))
      .groupBy(col("__doc"), col("__isl"))
      .agg(min("p").cast("long").as("span_start"),
        (max("p") + n - 1).cast("long").as("span_end"),
        count(lit(1)).as("n_windows"))
      .select(col("__doc").as(idCol), col("span_start"), col("span_end"),
        col("n_windows"))
  }

  /** C4-style global line deduplication: delete every line that occurs
    * more than `maxOccurrences` times across the WHOLE corpus (the
    * boilerplate/navigation-chrome strip of C4/RefinedWeb pipelines),
    * reconstructing each document with its surviving lines in original
    * order.
    *
    * Scale shape: the count aggregate shuffles 8-byte xxhash64 line
    * keys (map-side combined), never text; the frequent set is tiny by
    * construction (Zipf — few lines exceed any meaningful threshold),
    * so its STRINGS are recovered by one broadcast semi-join of hashes
    * and handed back as a 1-row broadcast; the rewrite is then a pure
    * row-local filter over split(text) — documents themselves never
    * shuffle. Collisions: pass 1's hash counts are a SUPERSET filter —
    * pass 2 re-counts the surviving occurrences by the actual string,
    * so a 64-bit collision can only add a string to the (tiny)
    * recovery set, never delete an innocent line nor pool two
    * sub-threshold lines over the limit.
    *
    * Execution contract: the frequent set materializes at CALL time
    * (two Spark jobs + one bounded driver collect) — this is an
    * operator that runs, not a lazy frame definition. The "tiny by
    * construction" bound is lines_total/threshold, which is only a
    * real bound when the threshold is large ([[dedupLinesAuto]]'s
    * > |docs|); at `maxOccurrences = 1` the frequent set is every
    * line occurring twice — corpus-shaped on a boilerplate-heavy
    * crawl — so the collect is guarded by `maxFrequentLines` AND
    * `maxFrequentBytes` (a row-count cap alone would let 4M × 1 KB
    * lines build a ~4 GB collect before any count could fire): both
    * are checked by a tiny aggregate BEFORE any string leaves the
    * cluster, so the operator fails fast with sizing guidance instead
    * of silently OOMing the driver mid-collect. */
  def dedupLines(docs: DataFrame, textCol: String,
      delim: String = "\n", maxOccurrences: Long = 1L,
      maxFrequentLines: Long = 4L << 20,
      maxFrequentBytes: Long = 256L << 20,
      maxLiteralLines: Long = 4096L,
      maxLiteralBytes: Long = 1L << 20): DataFrame =
    dedupLinesImpl(docs, textCol, delim,
      docs.sparkSession.range(1).select(
        lit(maxOccurrences).as("__thr")),
      maxFrequentLines, maxFrequentBytes,
      maxLiteralLines, maxLiteralBytes)

  /** [[dedupLines]] with the C4 convention that "frequent" means
    * "appears more often than there are documents" — the threshold is
    * computed IN the flow (a 1-row broadcast aggregate), not as a
    * separate driver `count()` prepass blocking the query. */
  def dedupLinesAuto(docs: DataFrame, textCol: String,
      delim: String = "\n", maxFrequentLines: Long = 4L << 20,
      maxFrequentBytes: Long = 256L << 20,
      maxLiteralLines: Long = 4096L,
      maxLiteralBytes: Long = 1L << 20): DataFrame =
    dedupLinesImpl(docs, textCol, delim,
      docs.agg(count(lit(1)).as("__thr")),
      maxFrequentLines, maxFrequentBytes,
      maxLiteralLines, maxLiteralBytes)

  /** C4-style line-level quality filtering (the other half of C4's line
    * treatment, complementing [[dedupLines]]' frequency cut): keep only
    * lines that look like prose — at least `minWordsPerLine` words,
    * terminal punctuation (`. ! ? "`), no deny-listed boilerplate token
    * (`javascript`-warning chrome, lorem ipsum, cookie banners), no
    * `{` (leaked code/markup) — then drop documents left with fewer
    * than `minKeptLines` surviving lines.
    *
    * Scale shape: entirely row-local — the line split, the per-line
    * predicate, and the document rebuild all run inside one
    * higher-order `filter` over the split array (codegen, no explode,
    * no shuffle). Filtering a 100 TB corpus is ONE scan; the only
    * reason the doc gate is a `filter` and not a join is that the kept
    * count is already a row-local value. Every predicate is RE2-safe
    * so the identical arithmetic replays in DuckDB (`q_corpus_c4_lines`).
    *
    * Returns (idCol, clean_text, n_kept, n_dropped); kept lines keep
    * their original (untrimmed) bytes and order. */
  def c4FilterLines(docs: DataFrame, textCol: String, idCol: String,
      minWordsPerLine: Int = 3, minKeptLines: Int = 1,
      denyTokens: Seq[String] =
        Seq("javascript", "lorem ipsum", "cookie policy")): DataFrame = {
    require(minWordsPerLine >= 1, s"minWordsPerLine >= 1: $minWordsPerLine")
    require(minKeptLines >= 0, s"minKeptLines >= 0: $minKeptLines")
    val lines = split(col(textCol), "\n", -1)
    val kept = filter(lines, l => {
      val t = trim(l)
      val wc = when(t === "", lit(0))
        .otherwise(size(split(t, "\\s+", -1)))
      val denied = denyTokens
        .map(d => lower(t).contains(d))
        .reduceOption(_ || _).getOrElse(lit(false))
      wc >= minWordsPerLine && t.rlike("[.!?\"]$") &&
        !denied && !t.contains("{")
    })
    docs
      // __kept is pinned with StageBarrier.stage: the minKeptLines
      // filter otherwise pushes below any upstream exchange with the
      // whole per-line kernel chain substituted into its condition
      // (§4.4 double evaluation — found via the respread test scan,
      // where the duplicate ran single-task)
      .select(col(idCol), lines.as("__lines"),
        graft.plans.StageBarrier.stage(kept).as("__kept"))
      .select(col(idCol),
        array_join(col("__kept"), "\n").as("clean_text"),
        size(col("__kept")).cast("long").as("n_kept"),
        (size(col("__lines")) - size(col("__kept"))).cast("long")
          .as("n_dropped"))
      .filter(col("n_kept") >= minKeptLines)
  }

  /** C4 §2.2-style flagged-wordlist DOCUMENT filter: drop any document
    * whose normalized token stream contains a word from `flagged`
    * (exact word match after lower + non-alphanumeric split — never a
    * substring hit, so flagging "ass" does not drop "class"; that is
    * the whole reason this is not a `contains` scan). Null text passes
    * through, the shared null-pass-through convention.
    *
    * Every entry is normalized through the SAME tokenizer as the text
    * (the real C4 list mixes case, hyphens, and multi-word phrases —
    * an entry the text tokenizer could never emit would otherwise be
    * silently inert and the filter under-drops with no signal): an
    * entry that tokenizes to MULTIPLE words matches as a phrase —
    * its token sequence, word-boundary-exact, via a padded substring
    * probe over the space-joined token stream; an entry that
    * tokenizes to NOTHING (pure punctuation) throws.
    *
    * Scale shape: the deduplicated lowercase list rides the plan as
    * ONE constant-folded array literal into a codegen'd
    * `arrays_overlap` (which hash-sets the smaller side) — map-only,
    * no join, no shuffle; filtering 100 TB is one scan. Wordlists are
    * 10^2-10^3 entries (the published C4 list is ~400); the require
    * caps the literal at 10^5 — past that a list is a TABLE, and the
    * right tool is [[filterDomainBlocklist]]'s explode + anti-join
    * shape on tokens. */
  def filterFlaggedWords(docs: DataFrame, textCol: String,
      flagged: Seq[String]): DataFrame = {
    // entry-side normalization = the text-side tokenizer, exactly
    def tokenize(e: String): String =
      e.toLowerCase.replaceAll("[^a-z0-9']+", " ").trim
    val inert = flagged.filter(e => e.trim.nonEmpty && tokenize(e).isEmpty)
    require(inert.isEmpty,
      s"filterFlaggedWords: entries ${inert.mkString("'", "', '", "'")} " +
        "tokenize to nothing under the [a-z0-9'] tokenizer — they " +
        "could never match a token and the filter would silently " +
        "under-drop; remove them or fix the entries")
    val list = flagged.map(tokenize).filter(_.nonEmpty).distinct
    require(list.nonEmpty,
      "filterFlaggedWords: empty wordlist — filtering by nothing is " +
        "a no-op; pass the list or skip the stage")
    require(list.size <= 100000,
      s"filterFlaggedWords: ${list.size} entries would ride the plan " +
        "as a literal; a list that size is a table — use a tokenized " +
        "anti-join instead")
    val (phrases, words) = list.partition(_.contains(" "))
    val toks = split(
      regexp_replace(lower(col(textCol)), "[^a-z0-9']+", " "), " ", -1)
    val wordHit =
      if (words.nonEmpty) arrays_overlap(toks, lit(words.toArray))
      else lit(false)
    // phrase entries: word-boundary-exact sequence match against the
    // space-joined token stream (padded so ends are boundaries too) —
    // still map-only; the joined stream is built once per row and
    // only when the list actually has phrases
    val phraseHit =
      if (phrases.isEmpty) lit(false)
      else {
        val stream = concat(lit(" "), array_join(toks, " "), lit(" "))
        phrases.map(p => stream.contains(s" $p ")).reduce(_ || _)
      }
    docs.filter(col(textCol).isNull || !(wordHit || phraseHit))
  }

  /** URL domain-blocklist DOCUMENT filter — the RefinedWeb/Dolma
    * source-level gate: drop documents whose URL host falls under any
    * blocklisted domain, where "under" is label-suffix match
    * (blocking example.com drops a.b.example.com but NOT
    * notexample.com — the label boundary is the point; a `endsWith`
    * scan gets that wrong). `blocklist` is a single-column frame of
    * lowercase domains — a real blocklist is 10^5-10^7 rows, a TABLE,
    * not a literal. Docs with null/host-less URLs pass through.
    *
    * Scale shape: corpus hosts DISTINCT first (hosts are many-per-doc
    * duplicated — the distinct shuffles short strings, never text),
    * then each distinct host explodes into its ≤ label-count suffixes
    * map-side and left-semi-joins the blocklist to a matched-host
    * set, bounded by actual matches; the text-bearing corpus touches
    * only the final host-keyed LEFT ANTI join, which AQE broadcasts
    * when the matched set is small (the common case: a blocklist hits
    * a sliver of a crawl). Nothing here scales with blocklist ×
    * corpus. */
  def filterDomainBlocklist(docs: DataFrame, urlCol: String,
      blocklist: DataFrame): DataFrame = {
    require(blocklist.columns.length == 1,
      "filterDomainBlocklist: blocklist must be a single-column " +
        s"frame of domains (got ${blocklist.columns.mkString(", ")})")
    val blCol = blocklist.columns.head
    val withHost = docs.withColumn("__bl_host",
      graft.functions.Url.host(col(urlCol)))
    val labels = split(col("__bl_host"), "\\.")
    val suffixes = transform(sequence(lit(1), size(labels)),
      i => array_join(slice(labels, i, size(labels) - i + 1), "."))
    val blocked = withHost
      .select(col("__bl_host"))
      .where(col("__bl_host").isNotNull && col("__bl_host") =!= "")
      .distinct()
      .select(col("__bl_host"), explode(suffixes).as("__sfx"))
      .join(blocklist, col("__sfx") === col(blCol), "left_semi")
      .select(col("__bl_host"))
      .distinct()
    withHost.join(blocked, Seq("__bl_host"), "left_anti")
      .drop("__bl_host")
  }

  /** Per-GROUP boilerplate line removal — the domain-scoped variant of
    * [[dedupLines]] (web curation strips nav bars / footers / cookie
    * banners, which are frequent WITHIN their site and invisible to a
    * corpus-global threshold): drop lines appearing in more than
    * `maxDocShare` of the group's documents. Lines count once per
    * document (`array_distinct` before the explode — a line repeated
    * inside one page is repetition, not boilerplate).
    *
    * Same scale shape and guard discipline as [[dedupLines]]: ONE
    * cached explode pass; the counting shuffle carries (group, 8-byte
    * hash) keys; string recovery re-counts by the actual string so a
    * hash collision cannot delete innocent lines; the per-group
    * frequent sets collect to ONE driver map literal only after a
    * (count, bytes) guard aggregate accepts them, and the rewrite is
    * map-only (`element_at` on the group key → `array_contains`).
    *
    * Degradation ladder (the many-domain 100 TB case): a frequent set
    * within (maxLiteralLines, maxLiteralBytes) binds as the driver map
    * literal above — zero joins in the returned plan; a larger one
    * switches to a BROADCAST LEFT-OUTER JOIN against the per-group
    * frequent frame (no driver collect at all — the set never leaves
    * the cluster), so a corpus with millions of boilerplate-heavy
    * domains degrades to one dimension-side broadcast instead of
    * refusing; only past (maxFrequentLines, maxFrequentBytes) — now
    * the bound on the BROADCAST, not on a collect — does it fail fast
    * with sizing guidance. The literal defaults are deliberately small
    * (4096 lines / 1 MB): the ScaleStress groupdedup drill measured the
    * join path ~2.7× FASTER once the set is thousands of lines (the
    * map literal rides every task binary and array_contains scans it
    * per line), so the literal is reserved for the common tiny-set
    * case where skipping the join genuinely wins. */
  def dedupLinesPerGroup(docs: DataFrame, groupCol: String,
      textCol: String, delim: String = "\n", maxDocShare: Double = 0.5,
      minDocs: Long = 3L, maxFrequentLines: Long = 4L << 20,
      maxFrequentBytes: Long = 256L << 20,
      maxLiteralLines: Long = 4096L,
      maxLiteralBytes: Long = 1L << 20): DataFrame = {
    require(maxDocShare > 0 && maxDocShare <= 1,
      "maxDocShare must be in (0, 1]")
    require(minDocs >= 2, "minDocs must be ≥ 2 — in a singleton group " +
      "every line is 100% of the docs and the whole document erases")
    // internal names must be free on BOTH paths: the literal path's
    // withColumn would silently overwrite a caller's __freq, and the
    // join path's docs⋈freqSets would make __g/__freq ambiguous — a
    // crash that appears only once the frequent set crosses the literal
    // threshold (data-size-dependent). Same guard as shuffleWithPositions.
    require(!docs.columns.contains("__g") && !docs.columns.contains("__freq"),
      "dedupLinesPerGroup reserves the internal column names __g and " +
        "__freq — rename them in the input")
    val lineArr = split(col(textCol),
      java.util.regex.Pattern.quote(delim))
    val lines = docs
      .select(col(groupCol).cast("string").as("__g"),
        explode(array_distinct(lineArr)).as("__l"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // per-group doc totals (|groups| rows, broadcast into both
    // passes), FLOORED at minDocs: long-tail groups too small for a
    // share to mean anything (1-doc domains: every line is 100%) are
    // exempt — their lines simply never enter the frequent set
    val nDocs = docs
      .groupBy(col(groupCol).cast("string").as("__g"))
      .agg(count(lit(1)).as("__nd"))
      .filter(col("__nd") >= minDocs)
    val freqHashes = lines
      .groupBy(col("__g"), xxhash64(col("__l")).as("__h"))
      .agg(count(lit(1)).as("__n"))
      .join(broadcast(nDocs), Seq("__g"))
      .filter(col("__n") > col("__nd") * maxDocShare)
      .select(col("__g").as("__fg"), col("__h"))
    val freqStrings = lines
      .join(broadcast(freqHashes),
        col("__g") === col("__fg") &&
          xxhash64(col("__l")) === col("__h"), "left_semi")
      .groupBy(col("__g"), col("__l"))
      .agg(count(lit(1)).as("__n"))
      .join(broadcast(nDocs), Seq("__g"))
      .filter(col("__n") > col("__nd") * maxDocShare)
      .select(col("__g"), col("__l"))
      // persisted across guard + consume — see dedupLinesImpl
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (nFreq, bFreq) = guardFrequentSet(freqStrings, "__l",
      maxFrequentLines, maxFrequentBytes, Seq(lines, freqStrings),
      "dedupLinesPerGroup", "raise maxDocShare / minDocs or the caps")
    // the rewrite is shared by both paths: unconditional, so null text
    // normalizes to "" exactly like dedupLines, independent of whether
    // any group happened to have boilerplate
    def rewrite(withFreq: DataFrame): DataFrame = withFreq
      .withColumn(textCol, concat_ws(delim, filter(lineArr,
        l => !coalesce(array_contains(col("__freq"), l), lit(false)))))
      .drop("__freq")
    if (nFreq <= maxLiteralLines && bFreq <= maxLiteralBytes) {
      // literal path: one driver map (group → frequent lines), guarded
      // above; collecting it (vs joining the frame) keeps the returned
      // plan independent of the cache being unpersisted here. The
      // group's array binds ONCE per row (map literals have no hash
      // index — an element_at inside the filter lambda would
      // linear-scan |groups| keys per LINE).
      val freqMap: Map[String, Seq[String]] = freqStrings
        .groupBy(col("__g")).agg(collect_set(col("__l")).as("__f"))
        .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
      lines.unpersist(blocking = false)
      freqStrings.unpersist(blocking = false)
      val freqForRow =
        if (freqMap.isEmpty) lit(null).cast("array<string>")
        else element_at(typedlit(freqMap), col(groupCol).cast("string"))
      rewrite(docs.withColumn("__freq", freqForRow))
    } else {
      // join path: the frequent frame stays on the cluster and reaches
      // every doc row through one broadcast left-outer join on the
      // group key. `lines` is unpersisted here; freqStrings stays
      // persisted (guard-bounded) so the returned plan reads the
      // already-filled cache instead of re-running both counting
      // passes per action — it stays in the CacheManager until the
      // caller unpersists/clearCaches (the dedupLinesImpl lifecycle;
      // the ContextCleaner never reclaims Dataset caches on GC).
      val freqSets = freqStrings
        .groupBy(col("__g")).agg(collect_set(col("__l")).as("__freq"))
      lines.unpersist(blocking = false)
      rewrite(docs
        .join(broadcast(freqSets),
          col(groupCol).cast("string") === col("__g"), "left_outer")
        .drop("__g"))
    }
  }

  /** The collect guard shared by the line-dedup family: reject an
    * oversized frequent set with a two-long aggregate BEFORE any line
    * string leaves the cluster (a bare limit(cap) row check would let
    * millions of KB-sized lines assemble driver-side first).
    *
    * `freq` must arrive PERSISTED: the guard's head() is then also the
    * cache fill, so the consumer that follows (the literal collect or
    * the join path's set aggregate) reads the just-guarded cache
    * instead of re-running the two counting passes — the r11 bench
    * regression was exactly this aggregate running as a second full
    * evaluation. On rejection every frame in `cached` unpersists. */
  private def guardFrequentSet(freq: DataFrame, lineCol: String,
      maxLines: Long, maxBytes: Long,
      cached: Seq[DataFrame], opName: String, remedy: String)
      : (Long, Long) = {
    val g = freq
      .agg(count(lit(1)).as("__n"),
        coalesce(sum(octet_length(col(lineCol))), lit(0L)).as("__b"))
      .head()
    val (n, b) = (g.getLong(0), g.getLong(1))
    if (n > maxLines || b > maxBytes) {
      cached.foreach(_.unpersist(blocking = false))
      throw new IllegalArgumentException(
        s"$opName: frequent set is $n lines / $b bytes " +
          s"(caps: $maxLines lines, $maxBytes bytes) — $remedy.")
    }
    (n, b)
  }

  private def dedupLinesImpl(docs: DataFrame, textCol: String,
      delim: String, threshold: DataFrame,
      maxFrequentLines: Long, maxFrequentBytes: Long,
      maxLiteralLines: Long = 4096L,
      maxLiteralBytes: Long = 1L << 20): DataFrame = {
    // the join fallback binds the set as a __freq column — same
    // data-size-dependent-crash guard as dedupLinesPerGroup
    require(!docs.columns.contains("__freq"),
      "dedupLines reserves the internal column name __freq — rename " +
        "it in the input")
    val lineArr = split(col(textCol),
      java.util.regex.Pattern.quote(delim))
    // ONE split+explode pass, cached for the two counting passes
    // (pass 1 hash-count and pass 2 string recovery previously each
    // recomputed the full explode — the dominant cost, measured 7 s at
    // sf0.1). MEMORY_AND_DISK: spills rather than evicts, and lineage
    // stays intact so a lost block recomputes instead of failing.
    val lines = docs.select(explode(lineArr).as("__l"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val thr = broadcast(threshold)
    // pass 1: count by hash — the only full-width shuffle, 8-byte keys
    val freqHashes = lines
      .groupBy(xxhash64(col("__l")).as("__h"))
      .agg(count(lit(1)).as("__n"))
      .crossJoin(thr).filter(col("__n") > col("__thr"))
      .select(col("__h"))
    // pass 2: recover the frequent STRINGS — broadcast-filter by hash
    // FIRST (map-side, no shuffle; the exchange then carries
    // ≈ |frequent| × partitions partial rows, not every line), then
    // RE-COUNT by the actual string so hash collisions can't delete
    // innocent lines or pool two sub-threshold lines over the limit
    val freqStrings = GraftCaches.register(lines
      .join(broadcast(freqHashes),
        xxhash64(col("__l")) === col("__h"), "left_semi")
      .groupBy(col("__l")).agg(count(lit(1)).as("__n"))
      .crossJoin(thr).filter(col("__n") > col("__thr"))
      .select(col("__l"))
      // persisted so the guard's aggregate IS the only evaluation of
      // the two counting passes — the collect (literal path) and the
      // set aggregate (join path) read this cache, guarded-bounded at
      // ≤ maxFrequentBytes. GraftCaches-registered: on the join path
      // it outlives this function (the returned plan reads it), so
      // only the caller-lifecycle release can drop it
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // guard FIRST (shared [[guardFrequentSet]]): an oversized frequent
    // set is rejected before a single line string leaves the cluster
    val (nFreq, bFreq) = guardFrequentSet(freqStrings, "__l",
      maxFrequentLines, maxFrequentBytes, Seq(lines, freqStrings),
      "dedupLines",
      "the rewrite carries the frequent set as a broadcast, which is " +
        "only bounded when the threshold is large relative to the " +
        "corpus; raise maxOccurrences (or use dedupLinesAuto, " +
        "threshold > |docs|), or raise the caps if the cluster can " +
        "hold it")
    if (nFreq <= maxLiteralLines && bFreq <= maxLiteralBytes) {
      // literal path (tiny sets — where skipping the join wins, same
      // threshold rationale as dedupLinesPerGroup): the frequent set is
      // materialized NOW by a driver collect of the ONE aggregated
      // row — the guard, both counting passes, and the collect all run
      // against the cached lines, so the lines cache drops before this
      // operator even returns instead of pinning exploded text for the
      // rest of the session. A single array literal neither pins a
      // CacheManager entry for the session (the r8 persist draft
      // leaked one per call) nor rides a non-recomputable
      // localCheckpoint block.
      val freqArr: Seq[String] = freqStrings
        .agg(collect_set(col("__l")).as("__freq"))
        .head().getSeq[String](0)
      lines.unpersist(blocking = false)
      freqStrings.unpersist(blocking = false)
      docs.withColumn(textCol,
        concat_ws(delim, filter(lineArr,
          l => !array_contains(typedlit(freqArr), l))))
    } else {
      // join path (the per-group fallback's corpus-global analog): the
      // frequent set never leaves the cluster — ONE aggregated row
      // reaches every doc through a broadcast cross join. The
      // per-group drill measured this form ~2.7x faster than a
      // thousands-of-lines map literal (the literal rides every task
      // binary); without it a 4M-line frequent set was a ~256 MB
      // typedlit in the plan. freqStrings stays persisted (guard-
      // bounded ≤ maxFrequentBytes): the returned plan reads the
      // already-filled cache instead of re-running both counting
      // passes per action; it stays in the CacheManager until the
      // caller unpersists/clearCaches — the winnowOverlapPairs
      // lifecycle (the ContextCleaner never reclaims Dataset caches
      // on GC).
      val freqSet = freqStrings.agg(collect_set(col("__l")).as("__freq"))
      lines.unpersist(blocking = false)
      docs.crossJoin(broadcast(freqSet))
        .withColumn(textCol,
          concat_ws(delim, filter(lineArr,
            l => !coalesce(array_contains(col("__freq"), l),
              lit(false)))))
        .drop("__freq")
    }
  }

  /** Keep-FIRST-occurrence exact unit dedup — the RefinedWeb /
    * MassiveText paragraph rule: a repeated unit (paragraph, line —
    * any `delim`-separated span) survives ONLY at its globally first
    * occurrence, ordered by (doc id, position), and strips everywhere
    * else; documents rebuild in original unit order, and documents
    * whose every unit was seen before vanish. Complements
    * [[dedupLines]], which is a threshold strip (frequent units leave
    * ALL documents, boilerplate-style) — keep-first retains exactly
    * one canonical copy of every unit.
    *
    * Scale shape: posexplode → `groupBy(u).agg(min(struct(id, pos)))`
    * — ONE hash shuffle keyed by the unit string itself
    * (collision-free by construction — no 8-byte pre-hash whose
    * collisions would need a string re-verify pass), with PARTIAL
    * aggregation below the exchange: every map task pre-reduces its
    * occurrences of a unit to one candidate row before anything
    * ships, so a boilerplate unit duplicated 10^8 times (blank line,
    * "Home", a cookie banner) costs each map task one row, not a
    * single-task corpus-scale window sort (the r10 skew flag — a
    * `PARTITION BY u` window pins every occurrence of a mega-unit on
    * ONE task, and AQE cannot split a window partition). The winner
    * rows ARE the kept unit set — (u, first.id, first.pos) is exactly
    * the surviving occurrence, so no join back to the occurrence
    * stream and no second evaluation of the tiling. One doc-keyed
    * shuffle then rebuilds the kept units in order. The winner set is
    * never collected or broadcast — it is corpus-sized, exactly the
    * shape where [[dedupLines]]' broadcast rewrite is unavailable —
    * so nothing here grows with corpus size except the two keyed
    * exchanges, and nothing grows with DUPLICATION depth at all. */
  def dedupKeepFirst(docs: DataFrame, textCol: String, idCol: String,
      delim: String = "\n"): DataFrame =
    keepFirstRebuild(unitsOf(docs, textCol, idCol, delim), idCol,
      textCol, delim)

  /** WITHIN-document unit dedup — the doc-internal complement of
    * [[dedupKeepFirst]] (FineWeb-style page cleanup: a nav line or
    * repeated header appearing five times in ONE page keeps its first
    * occurrence; other documents are not consulted, so no global
    * canonical-copy semantics and no shuffle). A unit survives iff it
    * is the first occurrence of its string within its own document;
    * unit order is preserved.
    *
    * Scale shape: entirely row-local — one higher-order
    * `filter((u, i) => array_position(units, u) == i+1)` over the
    * split array, codegen, zero Exchange; deduping 100 TB is one
    * scan. Quadratic in UNITS-PER-DOC (array_position rescans the
    * prefix), which is bounded by page size, not corpus size — the
    * global variant pays shuffles instead because its duplicate set
    * is corpus-wide.
    *
    * Returns (idCol, clean_text, n_units_removed). */
  def dedupUnitsWithinDoc(docs: DataFrame, textCol: String,
      idCol: String, delim: String = "\n"): DataFrame = {
    val units = split(col(textCol),
      java.util.regex.Pattern.quote(delim), -1)
    val kept = filter(units,
      (u, i) => array_position(units, u) === i.cast("long") + 1L)
    docs.select(col(idCol),
      array_join(kept, delim).as("clean_text"),
      (size(units) - size(kept)).cast("long").as("n_units_removed"))
  }

  /** Per-unit language profile — CCNet's per-paragraph langid regrouped
    * to a document mixture signal: language votes over the doc's units
    * (paragraphs/lines), the dominant language, and the fraction of
    * units agreeing with it. dominant_frac < 1 flags code-switching
    * pages that a whole-doc langid mislabels (the reason CCNet LIDs
    * paragraphs, not pages). ENTIRELY row-local — the unit split, the
    * per-unit [[graft.functions.Text.lang_id]] vote, and the argmax
    * all run as higher-order array ops inside one scan: profiling a
    * 100 TB corpus shuffles nothing. Ties break toward the
    * lexicographically larger code (array_max struct order; the
    * oracle's `ORDER BY votes DESC, lang DESC` replays it). */
  def unitLangProfile(docs: DataFrame, textCol: String, idCol: String,
      delim: String = "\n"): DataFrame = {
    val units = split(col(textCol),
      java.util.regex.Pattern.quote(delim), -1)
    // stage the per-unit votes behind a Project: the six downstream
    // references (five vote buckets + size) must reuse ONE evaluation
    // of the transform — re-expanding the lang_id chain per bucket is
    // the captured-subexpression trap the shingle kernel documents
    val staged = docs.select(col(idCol),
      transform(units, u => graft.functions.Text.lang_id(u))
        .as("__langs"))
    val langs = col("__langs")
    val votes = ("und" +: graft.functions.Text.langIdCodes).map { l =>
      struct(size(filter(langs, x => x === l)).as("votes"),
        lit(l).as("lang"))
    }
    val best = array_max(array(votes: _*))
    staged.select(col(idCol),
      size(langs).cast("long").as("n_units"),
      best.getField("lang").as("dominant_lang"),
      round(best.getField("votes").cast("double") / size(langs), 4)
        .as("dominant_frac"))
  }

  /** Boilerplate audit report — the diagnostic a paragraph-dedup
    * deploy runs FIRST (FineWeb/Dolma publish exactly this table): the
    * k most-duplicated units with occurrence and document counts, so
    * an operator can eyeball what keep-first is about to delete before
    * pointing it at a crawl. Scale shape: two partially-aggregated
    * exchanges — (unit, doc) first, so a mega-duplicated unit's
    * occurrences crush map-side before any wire; then (unit), where
    * the per-(unit, doc) rows crush to one row per unit per map task —
    * a unit present in EVERY document of a 100 TB corpus ships
    * O(tasks) rows, never O(docs). The global top-k is
    * TakeOrderedAndProject (per-partition k, driver merges
    * |partitions|·k rows). minCount floors the report to actual
    * repetition; (count desc, unit asc) is a deterministic total
    * order, so the k-boundary never flaps. */
  def topDuplicatedUnits(docs: DataFrame, idCol: String, units: Column,
      k: Int, minCount: Long = 2L): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(split(units, "\n", -1)).as("u"))
      .groupBy("u", "doc_id").agg(count(lit(1)).as("c"))
      .groupBy("u").agg(sum("c").as("n_occurrences"),
        count(lit(1)).as("n_docs"))
      .filter(col("n_occurrences") >= minCount)
      .orderBy(col("n_occurrences").desc, col("u").asc)
      .limit(k)

  /** (id, pos, unit) tiling of a corpus — the shared front of the
    * keep-first family. */
  private def unitsOf(docs: DataFrame, textCol: String, idCol: String,
      delim: String): DataFrame =
    docs.select(col(idCol),
      posexplode(split(col(textCol),
        java.util.regex.Pattern.quote(delim))).as(Seq("pos", "u")))

  /** Keep-first winner selection + ordered document rebuild over an
    * (id, pos, u) unit stream — the shared back of the keep-first
    * family (see [[dedupKeepFirst]] for the scale shape: partial-agg
    * winner groupBy, winners ARE the kept set, no window, no join). */
  private def keepFirstRebuild(units: DataFrame, idCol: String,
      textCol: String, delim: String): DataFrame = {
    // min_long_pair, not min(struct): a declarative Min over a struct
    // buffer is ineligible for HashAggregateExec and drags the whole
    // aggregation onto SortAggregate — a full sort of the exploded
    // unit stream below AND above the exchange. The primitive
    // object-hash form keeps partial aggregation and the winner rule
    // identical (lexicographic (id, pos) min) with zero Sort
    // operators and no per-row allocation. Integral ids only (every
    // corpus id in this repo); other id types keep the generic form.
    val idIsIntegral = units.schema(idCol).dataType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    val kept = (if (idIsIntegral)
      units.groupBy(col("u"))
        .agg(graft.plans.ArgExtremumAgg
          .min_long_pair(col(idCol), col("pos")).as("__first"))
        .select(col("__first")("id").cast(units.schema(idCol).dataType)
          .as(idCol), col("__first")("pos").as("pos"), col("u"))
    else
      units.groupBy(col("u"))
        .agg(graft.plans.ArgExtremumAgg
          .obj_min(struct(col(idCol), col("pos"))).as("__first"))
        .select(col("__first")(idCol).as(idCol),
          col("__first")("pos").as("pos"), col("u")))
    rebuildDocs(kept, idCol, textCol, delim)
  }

  /** Ordered document rebuild from a surviving (idCol, pos, u) unit
    * stream — one doc-keyed shuffle; docs with no surviving unit
    * vanish. Shared tail of the keep-first and near-dedup families. */
  private def rebuildDocs(units: DataFrame, idCol: String,
      textCol: String, delim: String): DataFrame =
    units.groupBy(col(idCol))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("u")))),
          x => x("u")), delim).as(textCol))

  /** Paragraph-level NEAR dedup — the Dolma paragraph rule, and the
    * missing cell of the dedup matrix (exact×{doc,paragraph,substring}
    * and near×doc exist elsewhere in this package): `delim`-separated
    * units cluster corpus-wide by minhash-LSH candidates + exact
    * Jaccard verification at `threshold`
    * ([[graft.operators.Dedup.removeNearDups]] machinery — same
    * banding, caps, and verification gate), each cluster keeps its
    * globally FIRST member by (doc id, pos) — the [[dedupKeepFirst]]
    * policy, which exact unit dedup and near unit dedup must share or
    * compose incoherently — and documents rebuild in unit order (docs
    * whose every unit was a non-first cluster member vanish).
    *
    * The keep-first priority rides a single orderable unit id
    * `id·maxUnitsPerDoc + pos` (the documented-stride pattern):
    * `idCol` must be a non-negative integral id and docs must stay
    * under `maxUnitsPerDoc` units — at the default stride ids up to
    * ~9.2×10^12 fit a long.
    *
    * Scale: unit rows ≈ corpus units (not docs²); every stage is the
    * banded/capped/verified pipeline SCALE.md measures for doc-level
    * near-dup, at unit granularity, plus one doc-keyed rebuild
    * shuffle. Set `broadcastSurvivors=false` past broadcastable
    * survivor-set sizes (the [[graft.operators.Dedup.removeNearDups]]
    * contract). */
  def nearDedupUnits(docs: DataFrame, textCol: String, idCol: String,
      delim: String = "\n", threshold: Double = 0.4,
      shingleWords: Int = 3, maxUnitsPerDoc: Long = 1000000L,
      broadcastSurvivors: Boolean = true,
      exactCandidates: Boolean = false): DataFrame = {
    require(maxUnitsPerDoc > 0,
      s"nearDedupUnits: maxUnitsPerDoc > 0 (got $maxUnitsPerDoc)")
    // The stride arithmetic is only sound over integral non-negative
    // ids with pos under the stride — and both failure shapes are
    // SILENT without a guard (a string id implicit-casts to double and
    // nulls/rounds the uid; a doc past maxUnitsPerDoc collides into
    // its neighbor's uid range), corrupting keep-first winners rather
    // than crashing. Type is checked up front (the topKPerGroup
    // stance); the value bounds ride the projection as a raise_error
    // branch — two comparisons per unit row, no extra pass. Stride
    // OVERFLOW (huge id × stride) throws on its own: ANSI mode.
    locally {
      import org.apache.spark.sql.types.{ByteType, IntegerType,
        LongType, ShortType}
      val idType = docs.schema(idCol).dataType
      require(Seq(LongType, IntegerType, ShortType, ByteType)
          .contains(idType),
        s"nearDedupUnits: idCol '$idCol' must be an integral type " +
          s"(got $idType) — the keep-first priority is " +
          "id*maxUnitsPerDoc+pos, and a non-integral id would cast " +
          "to double and corrupt it silently")
    }
    val uid = when(col(idCol) < 0 || col("pos") >= maxUnitsPerDoc,
      raise_error(concat(
        lit("nearDedupUnits: doc id "), col(idCol).cast("string"),
        lit(" pos "), col("pos").cast("string"),
        lit(s" violates 0 <= id, pos < maxUnitsPerDoc=$maxUnitsPerDoc" +
          " — raise maxUnitsPerDoc (ids up to Long.MaxValue/stride" +
          " fit) or split oversized docs"))).cast("long"))
      .otherwise(col(idCol).cast("long") * maxUnitsPerDoc + col("pos"))
    val units = unitsOf(docs, textCol, idCol, delim)
      .select(uid.as("__uid"), col(idCol), col("pos"), col("u"))
    // exactCandidates = shared-shingle pair generation instead of LSH
    // banding: the kept set becomes a pure function of the corpus (the
    // strict-oracle / recall-critical mode) at Σ(bucket²) cost — see
    // Dedup.exactCandidates; the default banded path is the 100 TB one
    val kept =
      if (exactCandidates)
        Dedup.removeNearDupsExact(units, "u", "__uid", threshold,
          shingleWords, broadcastSurvivors)
      else Dedup.removeNearDups(units, "u", "__uid", threshold,
        shingleWords, broadcastSurvivors)
    rebuildDocs(kept.select(col(idCol), col("pos"), col("u")),
      idCol, textCol, delim)
  }

  /** Persisted-index form of [[dedupKeepFirst]] — the incremental
    * crawl shape: the historical corpus is represented ONLY by the
    * md5 fingerprints of its distinct units (`unitIndex`), so each new
    * batch pays |batch units| + |index| and the corpus text is never
    * re-read — the same contract as
    * [[graft.operators.Dedup.dedupAgainstIndex]] one level down, at
    * paragraph granularity. 128-bit md5 keys make false strips
    * vanishingly improbable at any real unit count (a 64-bit key
    * would collide on a 10^12-unit corpus), while shuffling 16-byte
    * keys instead of paragraph strings.
    *
    * A batch unit survives iff its fingerprint is NOT in the index
    * (left-anti, fp-keyed shuffle) AND it is the first occurrence
    * within the batch itself (the shared keep-first window); surviving
    * docs rebuild in unit order. Append `unitIndex(batch)` to the
    * store afterwards to advance the index. */
  def unitIndex(corpus: DataFrame, textCol: String, idCol: String,
      delim: String = "\n"): DataFrame =
    unitsOf(corpus, textCol, idCol, delim)
      .select(md5(col("u")).as("ufp")).distinct()

  def dedupKeepFirstAgainstIndex(batch: DataFrame, index: DataFrame,
      textCol: String, idCol: String, delim: String = "\n"): DataFrame = {
    requireUnitIndex(index)
    val novel = unitsOf(batch, textCol, idCol, delim)
      .join(index, md5(col("u")) === col("ufp"), "left_anti")
    keepFirstRebuild(novel, idCol, textCol, delim)
  }

  private def requireUnitIndex(index: DataFrame): Unit =
    require(index.columns.sameElements(Array("ufp")),
      "keep-first dedup: index must be a unitIndex result " +
        s"(single ufp column; got ${index.columns.mkString(", ")})")

  /** Bloom sidecar over a [[unitIndex]]'s `ufp` column — the
    * [[graft.operators.Dedup.indexBloom]] analog at paragraph
    * granularity. Null on an empty index;
    * [[dedupKeepFirstAgainstIndexBloom]] handles it. */
  def unitIndexBloom(index: DataFrame, fpp: Double = 0.01,
      expectedItems: Long = -1L): Array[Byte] = {
    requireUnitIndex(index)
    graft.plans.BloomProbe.buildFilter(index, col("ufp"), fpp,
      expectedItems)
  }

  /** [[dedupKeepFirstAgainstIndex]] with a pre-built [[unitIndexBloom]]
    * sidecar — row-identical results at any fpp: a Bloom MISS proves
    * the unit absent from the index map-side, and only the accepted
    * sliver (historical units + fpp) consults the index, via
    * [[graft.operators.Dedup.broadcastSliverSplit]] when it fits
    * `maxSliverUnits` (index scanned once, exchanged never) or the
    * plain shuffled anti-join past the cap. Null sidecar = EMPTY
    * index → plain in-batch [[dedupKeepFirst]]. */
  def dedupKeepFirstAgainstIndexBloom(batch: DataFrame,
      index: DataFrame, textCol: String, idCol: String,
      bloom: Array[Byte], delim: String = "\n",
      maxSliverUnits: Long = 1000000L): DataFrame = {
    if (bloom == null)
      return dedupKeepFirst(batch, textCol, idCol, delim)
    requireUnitIndex(index)
    val probed = unitsOf(batch, textCol, idCol, delim)
      .withColumn("__ufp", md5(col("u")))
      .withColumn("__maybe", graft.plans.BloomProbe
        .mightContain(bloom, xxhash64(col("__ufp"))))
    val miss = probed.filter(!col("__maybe")).drop("__maybe")
      // increment-lived cache: the count probe fills it, the returned
      // lazy split reads it. Registered with [[GraftCaches]] — drivers
      // running many increments call GraftCaches.release() (or
      // spark.catalog.clearCache()) between batches; the ContextCleaner
      // does NOT reclaim Dataset caches on GC
    val accepted = GraftCaches.register(
      probed.filter(col("__maybe")).drop("__maybe")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // row count bounds distinct count — one map-only pass, no shuffle
    val novel =
      if (accepted.count() <= maxSliverUnits)
        Dedup.broadcastSliverSplit(accepted, "__ufp", index, "ufp")._2
      else accepted
        .join(index, accepted("__ufp") === index("ufp"), "left_anti")
    keepFirstRebuild(novel.unionByName(miss).drop("__ufp"), idCol,
      textCol, delim)
  }

  /** Intra-corpus EXACT-SUBSTRING self-dedup — the suffix-array
    * "deduplicating training data" operator (Lee et al. 2021) at a
    * fixed window length: any run of ≥ k consecutive (normalized)
    * words that occurs more than once ANYWHERE in the corpus —
    * across documents or within one — survives only at its globally
    * first occurrence (ordered by (doc id, position)) and is cut from
    * every other site; overlapping/adjacent cut windows merge into
    * maximal spans and documents rebuild without them. Complements
    * [[dedupKeepFirst]], which needs duplication to align on
    * `delim`-unit boundaries — this catches repeated passages at
    * ARBITRARY offsets (the boilerplate-inside-a-paragraph case
    * paragraph dedup misses).
    *
    * Mechanics: every k-word window is an anchor; a repeated ≥k-word
    * substring makes ALL its anchors repeat, so cutting the covered
    * positions of non-first anchor occurrences removes exactly the
    * repeated run. Anchors hash to md5-128 fingerprints before they
    * shuffle (16-byte keys instead of k-word strings — the
    * [[unitIndex]] rationale; a false cut needs a 2^-128 collision).
    *
    * Scale shape: one fp-keyed exchange with PARTIAL `min(struct)` +
    * count below it (the [[dedupKeepFirst]] winner shape — a
    * boilerplate anchor duplicated 10^8× ships one row per map
    * task); winners prune to count ≥ 2 BEFORE the rejoin, so unique
    * anchors — the overwhelming majority of a real corpus — never
    * build a join side; the occurrence⋈winner equi-join is
    * AQE-skew-splittable; the hit stream is bounded by actual
    * duplication and feeds [[Contamination.scrubFromHits]]' per-doc
    * islands merge + size-guarded rebuild join.
    *
    * Returns (idCol, clean_text, n_words_removed, n_spans) over the
    * normalized (trim/lower/single-space) token stream — the
    * [[Contamination.scrubSpans]] output contract. */
  def dedupSubstrings(docs: DataFrame, textCol: String, idCol: String,
      k: Int = 8, broadcastMaxHitDocs: Long = 4000000L): DataFrame = {
    val anchors = anchorsOf(docs, textCol, idCol, k)
    val hits = nonFirstOccurrences(anchors)
    Contamination.scrubFromHits(docs, idCol, textCol, hits, k,
      buffer = 0, broadcastMaxHitDocs = broadcastMaxHitDocs)
  }

  /** (__doc, p, __gfp) md5-fingerprinted k-word anchor stream — the
    * shared front of the substring-dedup family (docs shorter than k
    * words produce no anchors; the gram text never leaves the map
    * side). */
  private def anchorsOf(docs: DataFrame, textCol: String, idCol: String,
      k: Int): DataFrame = {
    require(k >= 2, s"substring dedup: k >= 2 (got $k) — window-1 " +
      "self-dedup would cut every repeated WORD; use a stopword or " +
      "frequency filter for that")
    docs
      .filter(graft.plans.TextExpressions.token_count(col(textCol)) >= k)
      .select(col(idCol).as("__doc"),
        posexplode(
          graft.plans.TextExpressions.word_shingles(col(textCol), k))
          .as(Seq("p", "__g")))
      .select(col("__doc"), col("p"), md5(col("__g")).as("__gfp"))
  }

  /** Occurrences that are NOT their gram's globally first (doc, pos)
    * site — the substring-dedup hit rule (partial-agg winner groupBy,
    * count ≥ 2 prune, skew-splittable rejoin; see [[dedupSubstrings]]
    * for the scale shape). */
  private def nonFirstOccurrences(anchors: DataFrame): DataFrame = {
    // min_long_pair: same SortAggregate-avoidance as
    // [[keepFirstRebuild]] (anchorsOf ids are the caller's idCol —
    // integral everywhere in this repo; p is a posexplode int).
    // Non-integral ids keep the generic struct-min form.
    val docIsIntegral = anchors.schema("__doc").dataType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    val firstAgg =
      if (docIsIntegral) graft.plans.ArgExtremumAgg
        .min_long_pair(col("__doc"), col("p"))
      else graft.plans.ArgExtremumAgg
        .obj_min(struct(col("__doc").as("id"), col("p").as("pos")))
    val winners = anchors.groupBy(col("__gfp"))
      .agg(firstAgg.as("__first"), count(lit(1)).as("__c"))
      .filter(col("__c") >= 2)
      .select(col("__gfp"), col("__first"))
    anchors.join(winners, Seq("__gfp"))
      .filter(!(col("__doc") === col("__first")("id") &&
        col("p") === col("__first")("pos")))
      .select(col("__doc"), col("p"))
  }

  /** Persisted anchor-fingerprint index of a corpus — the substring
    * analog of [[unitIndex]]: the historical corpus is represented
    * ONLY by the distinct md5-128 fingerprints of its k-word anchor
    * windows, so incremental crawls substring-dedup against history
    * without ever re-reading corpus text. */
  def substringAnchorIndex(corpus: DataFrame, textCol: String,
      idCol: String, k: Int = 8): DataFrame =
    anchorsOf(corpus, textCol, idCol, k)
      .select(col("__gfp").as("afp")).distinct()

  /** Incremental [[dedupSubstrings]]: cut from each batch document
    * every ≥k-word run that history already contains (anchor
    * fingerprint present in `index`) PLUS every non-first repeat
    * within the batch itself — exactly the spans a one-shot
    * [[dedupSubstrings]] over history ∪ batch would cut from the
    * batch side, at |batch anchors| + |index| cost per increment.
    * Append `substringAnchorIndex(batch, …, k)` (same k) to the store
    * afterwards to advance history.
    *
    * Scale shape: one semi/anti join pair against the index on
    * 16-byte keys (historical grams hit wholesale — no winner
    * arithmetic needed for them), the [[dedupSubstrings]] winner
    * groupBy only over the batch-novel remainder, then the shared
    * islands merge + size-guarded rebuild. */
  def dedupSubstringsAgainstIndex(batch: DataFrame, index: DataFrame,
      textCol: String, idCol: String, k: Int = 8,
      broadcastMaxHitDocs: Long = 4000000L): DataFrame = {
    requireAnchorIndex(index)
    val anchors = anchorsOf(batch, textCol, idCol, k)
    val hits = indexSplitHits(anchors, index, extraNovel = None)
    Contamination.scrubFromHits(batch, idCol, textCol, hits, k,
      buffer = 0, broadcastMaxHitDocs = broadcastMaxHitDocs)
  }

  /** Bloom sidecar over a [[substringAnchorIndex]]'s `afp` column —
    * the [[Dedup.indexBloom]] analog for anchors. Anchors outnumber
    * documents by the doc word count, so at 100 TB the batch-anchor ⋈
    * index exchange is the probe's dominant cost; with the sidecar a
    * Bloom MISS proves the anchor novel map-side and only the
    * historical sliver (+ fpp) shuffles against the index. Null on an
    * empty index (the aggregate's empty-input result) —
    * [[dedupSubstringsAgainstIndexBloom]] handles it. */
  def substringIndexBloom(index: DataFrame, fpp: Double = 0.01,
      expectedItems: Long = -1L): Array[Byte] = {
    requireAnchorIndex(index)
    graft.plans.BloomProbe.buildFilter(index, col("afp"), fpp,
      expectedItems)
  }

  /** [[dedupSubstringsAgainstIndex]] with a pre-built
    * [[substringIndexBloom]] sidecar — row-identical results at any
    * fpp (a Bloom miss has no false negatives): misses join the
    * batch-novel pool directly; only accepted anchors (historical +
    * fpp sliver) consult the index. Null sidecar = EMPTY index, so
    * the whole batch is novel and this degenerates to the one-shot
    * [[dedupSubstrings]].
    *
    * The index never exchanges on the fast path: when the accepted
    * sliver holds ≤ `maxSliverAnchors` rows (the incremental premise
    * — a fresh crawl re-sees little), its distinct fingerprints
    * BROADCAST into a map-only semi-scan of the index, and the
    * surviving truly-historical fingerprints broadcast back to split
    * the sliver — the index is scanned once per increment, shuffled
    * never, which is the shape that survives a 100 TB history. A
    * dup-heavy batch overflows the cap and falls back to the plain
    * shuffled semi/anti pair (still |index|+|sliver|, still correct).
    * (The anchor subtree feeds both branches of the bloom split; the
    * sliver is persisted, the miss side may recompute — a
    * |batch|-sized map-only cost, by construction tiny next to the
    * index.) */
  def dedupSubstringsAgainstIndexBloom(batch: DataFrame,
      index: DataFrame, textCol: String, idCol: String,
      bloom: Array[Byte], k: Int = 8,
      broadcastMaxHitDocs: Long = 4000000L,
      maxSliverAnchors: Long = 1000000L): DataFrame = {
    if (bloom == null)
      return dedupSubstrings(batch, textCol, idCol, k,
        broadcastMaxHitDocs)
    requireAnchorIndex(index)
    val probed = anchorsOf(batch, textCol, idCol, k)
      .withColumn("__maybe", graft.plans.BloomProbe
        .mightContain(bloom, xxhash64(col("__gfp"))))
    val miss = probed.filter(!col("__maybe")).drop("__maybe")
      // increment-lived cache: the count probe fills it, the returned
      // lazy split reads it. Registered with [[GraftCaches]] — drivers
      // running many increments call GraftCaches.release() (or
      // spark.catalog.clearCache()) between batches; the ContextCleaner
      // does NOT reclaim Dataset caches on GC
    val accepted = GraftCaches.register(
      probed.filter(col("__maybe")).drop("__maybe")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // row count bounds distinct count — one map-only pass, no shuffle
    val hits =
      if (accepted.count() <= maxSliverAnchors) {
        val (histAcc, novelAcc) = Dedup.broadcastSliverSplit(
          accepted, "__gfp", index, "afp")
        histAcc.select(col("__doc"), col("p"))
          .unionByName(
            nonFirstOccurrences(novelAcc.unionByName(miss)))
      } else indexSplitHits(accepted, index, extraNovel = Some(miss))
    Contamination.scrubFromHits(batch, idCol, textCol, hits, k,
      buffer = 0, broadcastMaxHitDocs = broadcastMaxHitDocs)
  }

  private def requireAnchorIndex(index: DataFrame): Unit =
    require(index.columns.sameElements(Array("afp")),
      "substring dedup: index must be a substringAnchorIndex result " +
        s"(single afp column; got ${index.columns.mkString(", ")})")

  /** The shared index-probe tail: `probe` anchors split into
    * historical hits (semi-join — wholesale cuts, no winner
    * arithmetic) and the batch-novel remainder (anti-join survivors ∪
    * `extraNovel`), which alone pays [[nonFirstOccurrences]]' winner
    * groupBy. */
  private def indexSplitHits(probe: DataFrame, index: DataFrame,
      extraNovel: Option[DataFrame]): DataFrame = {
    val historical = probe
      .join(index, probe("__gfp") === index("afp"), "left_semi")
      .select(col("__doc"), col("p"))
    val antiSurvivors = probe
      .join(index, probe("__gfp") === index("afp"), "left_anti")
    val novel = extraNovel.fold(antiSurvivors)(antiSurvivors.unionByName)
    historical.unionByName(nonFirstOccurrences(novel))
  }

  /** Deterministic training-order shuffle: ORDER BY md5("id:seed") —
    * rerun-stable, partition-layout-independent, and engine-portable
    * (the same md5 trick as [[hashKeep]]); a different seed is an
    * independent permutation. At any scale this is ONE range exchange
    * (Spark samples split points and sorts within partitions in
    * parallel) — downstream epoch writers consume partitions in
    * order. For shard-local shuffling without the global exchange,
    * bucket by [[hashBucket]] first and shuffle within shards. */
  /** The permutation key behind [[shuffleDeterministic]] (and the
    * shard writer): md5("id:seed") with the id string appended, so
    * DISTINCT ids always get distinct keys (the md5 prefix shuffles,
    * the id suffix makes ties impossible) and a null id sorts like the
    * empty string instead of collapsing every null onto one key. */
  def shuffleKey(id: Column, seed: Long): Column = {
    val idStr = coalesce(id.cast("string"), lit(""))
    concat(md5(concat_ws(":", idStr, lit(seed.toString))), lit(":"), idStr)
  }

  def shuffleDeterministic(df: DataFrame, idCol: String,
      seed: Long = 0L): DataFrame =
    df.orderBy(shuffleKey(col(idCol), seed))

  /** [[shuffleDeterministic]] plus a 1-based global position column —
    * WITHOUT the single-partition global window `row_number() OVER
    * (ORDER BY key)` would plan (every row through one task, dead at
    * scale). Delegates to [[Pack.cumBefore]] — the shared two-phase
    * prefix sum (range-exchange sort, frozen-partition checkpoint,
    * bounded counts collect, parallel ordered fold; every protocol
    * subtlety is documented there, once) — with unit weights, so the
    * running total IS the 0-based position. The 32-byte md5 sort key
    * is projected away before the fold's object round-trip. Positions
    * equal the global window's wherever ids are distinct (the key is
    * tie-free by construction, see [[shuffleKey]]). */
  def shuffleWithPositions(df: DataFrame, idCol: String, seed: Long = 0L,
      posCol: String = "pos"): DataFrame = {
    require(!df.columns.contains("__k") && !df.columns.contains("__cum"),
      "shuffleWithPositions: input must not carry the internal " +
        "__k/__cum column names")
    Pack.cumBefore(
      df.withColumn("__k", shuffleKey(col(idCol), seed)),
      col("__k"), partitions = 0, weightCol = None,
      dropBeforeFold = Seq("__k"), outCol = "__cum")
      // rename, not add+drop: add+drop would delete the result when a
      // caller names the output column "__cum" itself
      .withColumn("__cum", col("__cum") + 1L)
      .withColumnRenamed("__cum", posCol)
  }

  /** Keep at most `n` rows per group, best-first by `order`. One shuffle
    * on the group key; the top-n is pushed below the exchange as a
    * WindowGroupLimit (partial group-limit per map task). The 1-based
    * per-group rank is RETURNED as column `rnk` — part of the contract
    * (per-source caps report it); callers that only want the cap drop
    * it. The input must not already carry a `rnk` column (it would be
    * silently replaced otherwise). */
  def capPerGroup(df: DataFrame, groupCol: String, order: Seq[Column],
      n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(!df.columns.contains("rnk"),
      "capPerGroup: input must not carry a rnk column (returned rank)")
    val w = Window.partitionBy(col(groupCol)).orderBy(order: _*)
    df.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= n)
  }

  /** Deterministic per-group TOKEN-budget cap — the mixture primitive
    * for targets specified in tokens, not rows (epoch/temperature
    * recipes say "20B tokens of domain X", and [[rebalanceMixture]]'s
    * row rates miss that by the group's mean-length skew): per group,
    * keep the md5(id:seed)-ordered prefix of documents whose cumulative
    * token count stays ≤ `budget`. Hash order makes the kept set
    * rerun- and layout-stable, and a different `seed` an independent
    * draw; the prefix rule is strict (a doc that would cross the
    * budget, and everything after it, drops).
    *
    * One shuffle on the group key; the running sum is a per-group
    * window, so each group sorts within one task — sized for
    * many-group corpora (domains, sources, languages). A single
    * enormous group degenerates to one task; at that shape use the
    * two-phase distributed prefix sum ([[graft.operators.Pack]]) on
    * the group's slice instead. */
  def takeTokenBudget(df: DataFrame, groupCol: String, textCol: String,
      idCol: String, budget: Long, seed: Long = 0L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // same fail-fast convention as shuffleWithPositions: silently
    // replacing and then dropping a caller's __cum would delete data
    require(!df.columns.contains("__cum"),
      "takeTokenBudget: input must not carry the internal __cum name")
    // the shared shuffle key: null-id-safe (coalesced to "") and
    // collision-proof (raw id suffix), so the window order — and with
    // it the kept set — is total on ANY id column, not just non-null
    // distinct ones
    val w = Window.partitionBy(col(groupCol))
      .orderBy(shuffleKey(col(idCol), seed))
    df.withColumn("__cum",
        sum(graft.functions.Text.token_count(col(textCol)).cast("long"))
          .over(w))
      .filter(col("__cum") <= budget)
      .drop("__cum")
  }

  /** BM25 scores of every document against a small bag of query terms.
    * Returns (idCol, dl, score) for documents matching ≥1 term; callers
    * take the top-k. Formula (Robertson/Sparck Jones, the Okapi BM25
    * published form):
    *   Σ_t ln(1 + (N - df_t + 0.5)/(df_t + 0.5))
    *       · tf_t(k1+1)/(tf_t + k1(1 - b + b·dl/avgdl))
    * Term frequencies are row-local (`filter` over the token array); the
    * corpus stats (N, Σdl, df per term) are ONE partial-aggregated pass
    * producing a single row that cross-joins (broadcast) back — no
    * per-term shuffle, no explode of the corpus. */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val words = split(trim(lower(col(textCol))), "\\s+")
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      size(filter(words, w => w === lit(t))).as(s"tf$i")
    }
    val freqs = docs.select(
      (col(idCol) +: size(words).as("dl") +: tfCols): _*)
    val dfCols = terms.indices.flatMap { i =>
      Seq(sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))
    }
    val aggCols = Seq(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl")) ++ dfCols
    val stats = freqs.agg(aggCols.head, aggCols.tail: _*)
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val score = terms.indices.map { i =>
      val tf = col(s"tf$i").cast("double")
      val dfT = col(s"df$i").cast("double")
      val idf = log(lit(1.0) +
        (col("n_docs").cast("double") - dfT + lit(0.5)) / (dfT + lit(0.5)))
      idf * tf * lit(k1 + 1) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / avgdl))
    }.reduce(_ + _)
    freqs.crossJoin(broadcast(stats))
      .filter(terms.indices.map(i => col(s"tf$i") > 0).reduce(_ || _))
      .select(col(idCol), col("dl"), score.as("score"))
  }

  /** PII scrubbing: replace emails, IPv4 addresses, and phone-shaped
    * digit runs with typed placeholder tokens, and count each class.
    * Pure row-local regexp work (codegen'd `RegExpReplace`) — scrubbing
    * 100 TB is a scan. Patterns are deliberately RE2-compatible (no
    * backrefs/lookahead) so the same scrub is portable to other engines.
    * Returns struct(scrubbed, n_emails, n_ips, n_phones). */
  def scrubPii(text: Column): Column = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ip = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    val phone = "\\b\\d{3}-\\d{3,}\\b"
    val nEmails = size(regexp_extract_all(text, lit(email), lit(0)))
    val afterEmail = regexp_replace(text, email, "<EMAIL>")
    val nIps = size(regexp_extract_all(afterEmail, lit(ip), lit(0)))
    val afterIp = regexp_replace(afterEmail, ip, "<IP>")
    val nPhones = size(regexp_extract_all(afterIp, lit(phone), lit(0)))
    val scrubbed = regexp_replace(afterIp, phone, "<PHONE>")
    struct(scrubbed.as("scrubbed"),
      nEmails.cast("long").as("n_emails"),
      nIps.cast("long").as("n_ips"),
      nPhones.cast("long").as("n_phones"))
  }

  /** Data profiling: per-column row count, null count, distinct count,
    * and min/max (as portable string reprs supplied by the caller).
    * Output: one row per profiled column. `cols` maps column name → the
    * repr expression used for min/max (identity for strings, integer
    * encodings for money).
    *
    * Shape: one single-distinct aggregate PER column, unioned — not all
    * columns in one agg. Mixing several count_distincts with regular
    * aggregates in a single agg triggers Spark's RewriteDistinct-
    * Aggregates Expand: every row replicates |distincts|+1×, and the
    * first-level hash aggregate keys on the distinct value streams, so
    * its per-partition tables grow to the HIGHEST column cardinality
    * with the full min/max/null buffer width on every entry (measured
    * 8× slower at 600k rows × 3 columns: 3.9 s vs 0.5 s). Per-column
    * aggs each plan as the standard two-phase partial distinct, and on
    * columnar storage the per-column scans read the same total bytes
    * as one multi-column scan — |columns| cheap scans beat one
    * Expand-inflated scan at any scale.
    *
    * Contract change vs one agg: each column profiles in its OWN job,
    * so the rows are a consistent snapshot only when `df` is
    * deterministic (a static table/file scan — every caller here).
    * Profiling a nondeterministic frame (an unseeded sample, a source
    * being appended to) or an expensive derived frame? Persist it
    * first — otherwise n_rows may disagree across rows and the
    * upstream recomputes |columns| times. */
  def profile(df: DataFrame, cols: Seq[(String, Column)]): DataFrame =
    cols.map { case (name, repr) =>
      df.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col(name).isNull, 1L).otherwise(0L)).as("n_nulls"),
        count_distinct(col(name)).as("n_distinct"),
        // string casts so heterogeneous column types share one output
        // schema (long casts stringify identically in any engine)
        min(repr).cast("string").as("min_repr"),
        max(repr).cast("string").as("max_repr"))
        .select(lit(name).as("col_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_repr"), col("max_repr"))
    }.reduce(_ unionByName _)

  /** Rebalance a multi-source corpus toward target mixture proportions:
    * given target weights w_g and a target total T, keep each group-g row
    * with probability min(1, T·w_g / n_g) — deterministically, via the
    * same md5-prefix predicate as [[hashKeep]], so reruns and engines
    * agree row-for-row. Groups absent from `weights` are dropped.
    *
    * Scale shape: group counts are one tiny aggregate broadcast back;
    * the keep decision is then a pure map-side filter over the corpus —
    * rebalancing 100 TB to a target mix is one scan, no shuffle of the
    * data itself, and adding a source only changes that source's rate. */
  def rebalanceMixture(df: DataFrame, groupCol: String, key: Column,
      weights: Map[String, Double], targetTotal: Long): DataFrame =
    rebalanceMixtureWithCounts(df, groupCol, key, weights, targetTotal,
      df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n")))

  /** [[rebalanceMixture]] with the (group, __n) counts precomputed —
    * lets [[rebalanceTemperature]] reuse the aggregate it already
    * collected instead of recomputing the input lineage. The weights
    * map is keyed by the group's STRING form (the lookup casts), so
    * non-string group columns work too. */
  private def rebalanceMixtureWithCounts(df: DataFrame, groupCol: String,
      key: Column, weights: Map[String, Double], targetTotal: Long,
      counts: DataFrame): DataFrame = {
    val w = typedLit(weights)
    val rate = least(lit(1.0),
      lit(targetTotal.toDouble) * w(col(groupCol).cast("string")) /
        col("__n").cast("double"))
    // 16-bit md5-prefix threshold, exactly [[hashKeep]]'s arithmetic.
    // lower(lpad(hex(…))) not format_string: the Formatter costs
    // ~1.2µs per ROW (thr depends on the joined __n). Safe only under
    // the rate >= 1.0 short-circuit below: rate < 1 keeps the value ≤
    // 0xffff (4 hex chars — lpad would TRUNCATE a 5-char 0x10000)
    val thr = lower(lpad(hex(floor(rate * 65536).cast("int")), 4, "0"))
    df.join(broadcast(counts), groupCol)
      .filter(w(col(groupCol).cast("string")).isNotNull &&
        (rate >= 1.0 || hashBucket(key) < thr))
      .drop("__n")
  }

  /** Temperature (α-) mixture rebalancing — the multilingual/multi-source
    * sampling rule of the XLM/mT5 lineage: sample group g with mass
    * ∝ n_g^α, so α = 1 keeps natural proportions, α = 0 equalizes all
    * groups, and the usual α ∈ (0.2, 0.8) up-weights tail groups
    * without drowning the head. Computes the α-weights from the group
    * counts (one tiny aggregate, collected — bounded by the number of
    * groups: languages/sources, never rows) and delegates the keep
    * decision to [[rebalanceMixture]]'s map-side md5 filter — the whole
    * rebalance is one scan. Rows whose group is null are dropped. */
  def rebalanceTemperature(df: DataFrame, groupCol: String, key: Column,
      alpha: Double, targetTotal: Long, maxGroups: Int = 10000): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, "alpha must be in [0, 1]")
    val spark = df.sparkSession
    val countsDf = df.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"))
    // fail-fast BEFORE the collect ([[perplexityBuckets]]' maxGroups
    // contract): a caller keying on a high-cardinality column (url,
    // doc id) would otherwise silently pull a corpus-sized count table
    // onto the driver instead of failing with a named contract
    val rows = countsDf.limit(maxGroups + 1).collect()
    require(rows.length <= maxGroups,
      s"rebalanceTemperature: more than $maxGroups groups in " +
        s"'$groupCol' — mixture groups are languages/sources, never " +
        "corpus-scale; raise maxGroups only if the driver can hold " +
        "the count table")
    require(rows.nonEmpty, "no non-null groups to rebalance")
    // group-key-sorted before the z fold: a float Σ in collect()
    // partition order would make the α-weights layout-sensitive in the
    // last ulp — against the module's rerun-stable sampling contract
    val counts = rows
      .map(r => (String.valueOf(r.get(0)), r.getLong(1)))
      .sortBy(_._1)
    val z = counts.map { case (_, n) => math.pow(n.toDouble, alpha) }.sum
    // α-weights rounded to 12 dp (the sel_key 6-dp convention, at
    // weight precision): z here is a DRIVER fold in sorted-group order,
    // while an oracle replay sums in its engine's own aggregation
    // order — a last-ulp association difference in z could flip
    // floor(rate·65536) for a rate landing exactly on a 1/65536
    // boundary. Rounding both sides onto the same decimal grid before
    // the rate arithmetic removes the boundary sensitivity.
    // BigDecimal.valueOf = Double.toString semantics, matching Spark's
    // own Round expression.
    val weights = counts.map { case (g, n) =>
      g -> java.math.BigDecimal
        .valueOf(math.pow(n.toDouble, alpha) / z)
        .setScale(12, java.math.RoundingMode.HALF_UP).doubleValue()
    }.toMap
    // hand the counts back as a LOCAL relation (original group TYPE
    // preserved) so the input lineage is not recomputed a second time
    // inside the mixture filter
    val localCounts = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), countsDf.schema)
    rebalanceMixtureWithCounts(df, groupCol, key, weights, targetTotal,
      localCounts)
  }

  /** Token-window chunking: split each document into word chunks of at
    * most `maxTokens` with `overlap` words of context carried between
    * consecutive chunks — the standard long-document → training-sample
    * step. Pure row-local array arithmetic (split → sequence of starts →
    * posexplode of slices): chunking is a scan, no shuffle; output order
    * within a doc is the deterministic chunk index. A null `textCol`
    * yields NO chunks (the null token array posexplodes to zero rows) —
    * the document drops from the chunked corpus; coalesce upstream if
    * null docs must survive as empty chunks. */
  def chunk(df: DataFrame, idCol: String, textCol: String,
      maxTokens: Int, overlap: Int = 0): DataFrame = {
    require(maxTokens > overlap,
      "maxTokens must exceed overlap or chunking can't advance")
    val step = maxTokens - overlap
    val ws = split(trim(lower(col(textCol))), "\\s+")
    df.select(col(idCol), ws.as("__ws"))
      .select(col(idCol),
        posexplode(transform(
          sequence(lit(0), size(col("__ws")) - 1, lit(step)),
          start => slice(col("__ws"), start + 1, lit(maxTokens))))
          .as(Seq("chunk_id", "__chunk")))
      .select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        concat_ws(" ", col("__chunk")).as("chunk_text"),
        size(col("__chunk")).cast("long").as("n_tokens"))
  }

  /** Corpus-unigram log-probability quality score: each document's mean
    * ln P(word), P from the corpus' own unigram frequencies — the cheap
    * LM-quality proxy (gibberish and boilerplate score far from the
    * corpus mean). Two aggregations over the exploded words:
    * vocab counts, then a per-doc mean after joining counts back.
    *
    * Skew design: word frequencies are Zipfian, so the words⋈vocab
    * equi-join would hash every "the" into one reducer. `headVocab` > 0
    * splits the join: the top-`headVocab` words by count — which cover
    * almost all TOKEN mass — broadcast (map-side join, no shuffle for
    * the heavy keys); only the long tail, whose per-key cardinality is
    * tiny by construction, takes the shuffled join. Exact at any
    * setting; 0 disables the split (fine below ~1B docs). */
  /** Join an exploded key stream against its own counts with the
    * Zipf-head split: the top-`headVocab` keys by count broadcast
    * (map-side join for the heavy keys), the long tail — tiny per-key
    * by construction — takes the shuffled join. Exact at any setting;
    * `headVocab` ≤ 0 is a plain shuffled join. Output = stream + `c`. */
  private def headSplitCounts(stream: DataFrame, k: String,
      headVocab: Int): DataFrame = {
    val counts = stream.groupBy(col(k)).agg(count(lit(1)).as("c"))
    if (headVocab <= 0) stream.join(counts, k)
    else {
      val head = broadcast(
        counts.orderBy(col("c").desc, col(k)).limit(headVocab))
      stream.join(head, k).unionByName(
        stream.join(head.select(col(k)), Seq(k), "left_anti")
          .join(counts, k))
    }
  }

  def unigramLogProb(docs: DataFrame, idCol: String, textCol: String,
      headVocab: Int = 0): DataFrame = {
    val words = docs.select(col(idCol),
      explode(split(trim(lower(col(textCol))), "\\s+")).as("w"))
    val total = words.agg(count(lit(1)).as("tot"))
    headSplitCounts(words, "w", headVocab)
      .crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg(round(avg(log(col("c").cast("double") /
        col("tot").cast("double"))), 3).as("avg_lp"))
  }

  /** Bigram language-model quality score: per document, the mean
    * log-probability of its bigrams under the corpus's own bigram LM,
    * avg log P(w₂|w₁) = (Σ log c₂(w₁w₂) − Σ log c₁(w₁)) / n_bigrams
    * — the next step up from [[unigramLogProb]] for incoherent-text
    * detection (word salad has plausible unigrams but improbable
    * bigrams). Documents with fewer than two tokens carry no bigram
    * and are excluded.
    *
    * The difference-of-sums form scores the prefix stream and the
    * bigram stream INDEPENDENTLY, so each join gets its own
    * Zipf-head split ([[headSplitCounts]], shared with
    * [[unigramLogProb]]). Both streams come from the SAME tokenizer —
    * the native shingle kernel (`word_shingles(text, 1)` is the token
    * array, `word_shingles(text, 2)` its bigrams), so prefix counts
    * and bigram counts align on every input, including texts with
    * control whitespace where a separate regex split would disagree
    * with the kernel's normalization. */
  def bigramLogProb(docs: DataFrame, idCol: String, textCol: String,
      headVocab: Int = 0): DataFrame = {
    val base = docs
      .select(col(idCol),
        graft.functions.Text.word_shingles(col(textCol), 1).as("ws"),
        graft.functions.Text.word_shingles(col(textCol), 2).as("bs"))
      .filter(size(col("ws")) >= 2)
    val pref = base.select(col(idCol),
      explode(slice(col("ws"), lit(1), size(col("ws")) - 1)).as("w"))
    val bg = base.select(col(idCol), explode(col("bs")).as("b"))
    val s1 = headSplitCounts(pref, "w", headVocab).groupBy(col(idCol))
      .agg(sum(log(col("c").cast("double"))).as("sl1"),
        count(lit(1)).as("n_bg"))
    val s2 = headSplitCounts(bg, "b", headVocab).groupBy(col(idCol))
      .agg(sum(log(col("c").cast("double"))).as("sl2"))
    s1.join(s2, idCol)
      .select(col(idCol),
        round((col("sl2") - col("sl1")) / col("n_bg"), 3).as("avg_lp2"))
  }

  /** CCNet-style perplexity buckets: per `groupCol` (language), rank
    * documents by LM quality — [[unigramLogProb]]'s rounded avg_lp,
    * best (highest log-prob = lowest perplexity) first, ties by id —
    * and cut EXACT equal-depth buckets: head / middle / tail is THE
    * published CCNet curation signal (downstreams train on head+middle
    * or reweight by bucket).
    *
    * Exact global ranks per group WITHOUT a per-group window (a
    * `Window.partitionBy(lang)` puts each language in ONE task — dead
    * on a mono-lingual 100 TB corpus): one range exchange over the
    * total key (group, -score, id) via the shared two-phase prefix sum
    * ([[Pack.cumBefore]] — the [[shuffleWithPositions]] machinery),
    * then per-group rank = global position − group offset, where the
    * offsets come from a group-count aggregate that is BOUNDED by
    * `maxGroups` (languages, sources — never corpus-scale; the collect
    * fails fast past the cap rather than pulling an unbounded set).
    * The bucket is integer arithmetic on (rank, group size), so the
    * cut replays exactly in an oracle.
    *
    * Driver-side group ordering compares UTF-8 BYTES (unsigned), not
    * Java Strings — Spark's binary string ordering; a UTF-16
    * comparison would disagree on supplementary-plane group names and
    * mis-offset every group after the disagreement. */
  def perplexityBuckets(docs: DataFrame, idCol: String, textCol: String,
      groupCol: String, buckets: Int = 3,
      labels: Seq[String] = Seq("head", "middle", "tail"),
      headVocab: Int = 0, maxGroups: Int = 10000): DataFrame = {
    require(buckets >= 1 && labels.size == buckets,
      s"perplexityBuckets: need one label per bucket " +
        s"(got ${labels.size} labels for $buckets buckets)")
    require(!docs.columns.contains("__cum"),
      "perplexityBuckets: input must not carry the internal __cum name")
    require(docs.schema(groupCol).dataType ==
      org.apache.spark.sql.types.StringType,
      s"perplexityBuckets: group column '$groupCol' must be a string " +
        "(the driver-side offset ordering is defined on UTF-8 bytes)")
    val lp = unigramLogProb(docs, idCol, textCol, headVocab)
    // doc-keyed shuffle join: both sides key on the id, no skew
    val scored = docs.select(col(idCol), col(groupCol)).join(lp, idCol)
    // total order (group asc, score desc, id asc) → one range
    // exchange; the fold adds the 0-based global position. Run the
    // prefix sum FIRST: its eager localCheckpoint materializes the
    // whole LM-scoring DAG once, and the group-stats pass below then
    // reads the checkpoint instead of recomputing the scoring (the
    // stats-first draft ran the corpus scoring twice — measured ~2x
    // on the full query)
    val pos = Pack.cumBefore(scored, struct(col(groupCol),
      negate(col("avg_lp")), col(idCol)),
      partitions = 0, weightCol = None, outCol = "__cum")
    // group sizes: a tiny aggregate (≤ maxGroups rows after partial
    // agg) — the ONLY driver collect, fail-fast bounded
    val statRows = pos.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"))
      .limit(maxGroups + 1).collect()
    require(statRows.length <= maxGroups,
      s"perplexityBuckets: more than $maxGroups groups in '$groupCol' — " +
        "bucket keys must be dimension-sized (languages, sources); " +
        "raise maxGroups only if the driver can hold the offsets")
    // offsets in SPARK's string order: unsigned UTF-8 byte comparison
    val byUtf8: Ordering[String] = (a: String, b: String) => {
      val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
      var i = 0
      var c = 0
      while (c == 0 && i < x.length && i < y.length) {
        c = (x(i) & 0xff) - (y(i) & 0xff)
        i += 1
      }
      if (c != 0) c else x.length - y.length
    }
    // a null group would NPE in the byte comparator below (and the
    // final inner offsets join would silently drop its docs) — name
    // the contract instead, same convention as cumBefore's null-weight
    // guard
    require(statRows.forall(!_.isNullAt(0)),
      s"perplexityBuckets: null value in group column '$groupCol' — " +
        "bucket keys must be non-null (coalesce or filter upstream)")
    val sorted = statRows.map(r => r.getString(0) -> r.getLong(1))
      .sortBy(_._1)(byUtf8)
    var acc = 0L
    val offs = sorted.map { case (g, n) =>
      val o = (g, acc, n); acc += n; o
    }
    val spark = docs.sparkSession
    import spark.implicits._
    val offsets = broadcast(
      offs.toSeq.toDF(groupCol, "__off", "__n"))
    pos.join(offsets, groupCol)
      .withColumn("bucket",
        expr(s"CAST(((__cum - __off) * $buckets) DIV __n AS BIGINT)"))
      .withColumn("plabel",
        element_at(array(labels.map(lit): _*),
          (col("bucket") + 1).cast("int")))
      .select(col(idCol), col(groupCol), col("avg_lp"), col("bucket"),
        col("plabel"))
  }

  /** Top-k DISTINCTIVE terms per group (c-TF-IDF keyword extraction —
    * the corpus-analysis primitive behind topic/source labeling):
    * score(w, g) = tf(w, g) · ln((1 + |groups|) / (1 + gdf(w))) where
    * gdf is the number of groups containing w. High score = frequent
    * HERE, rare elsewhere.
    *
    * Scale shape: one (group, word) count shuffle, one word-level
    * group-document-frequency aggregate joined back BROADCAST (the
    * word-level table is vocabulary-sized), a 1-row group-count
    * broadcast, and a WindowGroupLimit top-k. Ranking uses the score
    * ROUNDED to 6 dp (ties → word asc): raw doubles differ across
    * engines in the last ulp of ln, and the rounded key makes the
    * cut deterministic and oracle-replayable. */
  def distinctiveTerms(docs: DataFrame, groupCol: String, textCol: String,
      k: Int): DataFrame = {
    val words = docs.select(col(groupCol),
      explode(split(trim(lower(col(textCol))), "\\s+")).as("w"))
    val tf = words.groupBy(col(groupCol), col("w"))
      .agg(count(lit(1)).as("tf"))
    val gdf = tf.groupBy(col("w")).agg(count(lit(1)).as("gdf"))
    val nGroups = docs.agg(
      countDistinct(col(groupCol)).as("n_groups"))
    val scored = tf
      .join(broadcast(gdf), "w")
      .crossJoin(broadcast(nGroups))
      .withColumn("score", round(col("tf") *
        log((lit(1) + col("n_groups")) / (lit(1) + col("gdf"))), 6))
    capPerGroup(scored, groupCol,
      Seq(col("score").desc, col("w").asc), k)
      .select(col(groupCol), col("w").as("term"), col("tf"),
        col("gdf"), round(col("score"), 3).as("score"))
  }

  /** Frequency-ranked vocabulary over whitespace tokens of the
    * lowercased corpus: (word, n, id) with id = 1-based rank by
    * (count desc, word asc) — the deterministic tie-break makes the
    * vocabulary identical across engines and reruns. The global count
    * is one map-side-combined aggregate; the top-V cut is a
    * TakeOrdered (per-partition heaps + driver merge, never a global
    * sort of the full vocabulary); ranks are assigned by folding the
    * ≤V survivors into ONE array row — sorted row-locally, then
    * posexploded back out — so the plan has no WindowExec at all
    * (a `row_number()` over an unpartitioned window here, even though
    * equally bounded by V, plans a single-partition WindowExec and
    * floods the log with `No Partition Defined` warnings). The array
    * is bounded by the requested vocabulary size, not the corpus. */
  /** Global `(word, n)` frequencies of `textCol` under the corpus-wide
    * normalization contract (trim, lower, \s+ split) — the shared
    * prefix of [[buildVocab]] and [[Bpe.train]]; one explode+groupBy
    * shuffle with map-side partial counts. (No empty-token filter here:
    * buildVocab's oracle counts the '' token of blank docs too —
    * callers that want it gone filter on top.) */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(split(trim(lower(col(textCol))), "\\s+")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))

  def buildVocab(docs: DataFrame, textCol: String, vocabSize: Int)
      : DataFrame = {
    wordCounts(docs, textCol)
      .orderBy(col("n").desc, col("word").asc)
      .limit(vocabSize)
      // struct(-n, word) sorts lexicographically as (n desc, word asc)
      .agg(array_sort(collect_list(struct((-col("n")).as("negn"),
        col("word")))).as("vs"))
      .select(posexplode(col("vs")).as(Seq("pos", "v")))
      .select(col("v.word").as("word"), (-col("v.negn")).as("n"),
        (col("pos") + 1).cast("long").as("id"))
  }

  /** Vocabulary coverage curve — the vocab-size design table: for each
    * of the top-k words (frequency rank order), the cumulative fraction
    * of ALL corpus tokens the vocabulary up to that rank covers. Read
    * off "95% token coverage needs N words" before fixing a tokenizer
    * budget. Scale shape: one word-count exchange with map-side partial
    * counts (shared with [[buildVocab]]), a TakeOrdered top-k, ONE
    * one-row scalar crossJoin for the token total, and the prefix sums
    * computed in the ARRAY domain on the single collected top-k row
    * (k-bounded O(k²) element adds — buildVocab's trick, avoiding a
    * single-partition WindowExec). Nothing driver-side, nothing
    * corpus-sized past the first exchange. */
  def vocabCoverage(docs: DataFrame, textCol: String, k: Int)
      : DataFrame = {
    require(k > 0 && k <= 65536,
      s"vocabCoverage: k must be in (0, 65536], got $k — the prefix " +
        "sums run O(k²) element adds in the array domain; a curve " +
        "past 64k ranks stops being a design table")
    val counts = wordCounts(docs, textCol)
    val total = counts.agg(sum(col("n")).cast("double").as("__total"))
    counts.orderBy(col("n").desc, col("word").asc).limit(k)
      .agg(array_sort(collect_list(struct((-col("n")).as("negn"),
        col("word")))).as("vs"))
      .crossJoin(broadcast(total))
      .select(col("__total"), posexplode(col("vs")).as(Seq("pos", "v")),
        col("vs"))
      .select(col("v.word").as("word"), (-col("v.negn")).as("n"),
        (col("pos") + 1).cast("long").as("rank"),
        round(aggregate(slice(col("vs"), lit(1), col("pos") + 1), lit(0L),
          (a, x) => a - x.getField("negn")).cast("double") / col("__total"),
          4).as("cum_frac"))
  }

  /** Encode each document as its vocabulary-id sequence
    * (out-of-vocabulary → 0), preserving token order. The lookup is a
    * BROADCAST hash join against the exploded (id, pos, token) stream —
    * O(1) per token inside codegen, where a map-literal `element_at`
    * would linear-scan the vocabulary per token. Re-assembly shuffles
    * (id, pos, token_id) rows — ~16 bytes per token, never the text —
    * then sorts within each document row-locally. */
  def encodeTokens(docs: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame, outCol: String = "token_ids"): DataFrame = {
    // null text encodes like empty text ([0], the OOV id) — posexplode
    // of a null array emits no rows, which would silently DROP the
    // document from the encoded corpus
    val toks = docs.select(col(idCol),
      posexplode(split(trim(lower(coalesce(col(textCol), lit("")))),
        "\\s+")).as(Seq("pos", "tok")))
    toks
      .join(broadcast(vocab.select(col("word"), col("id"))),
        toks("tok") === col("word"), "left")
      .select(col(idCol), col("pos"),
        coalesce(col("id"), lit(0L)).as("tid"))
      .groupBy(col(idCol))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("tid")))),
        s => s.getField("tid")).as(outCol))
  }
}
