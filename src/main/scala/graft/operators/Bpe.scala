package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType, StructField, StructType}

import java.util.Locale
import scala.collection.mutable

/** Byte-pair-encoding tokenizer training + encoding (Sennrich et al.
  * 2016 — the subword vocabulary scheme used by most LLM tokenizers).
  *
  * Scale shape: the ONLY corpus-sized work is stage 1's word-frequency
  * count — one explode+groupBy shuffle (the exact plan
  * [[Corpus.buildVocab]] already ships; both call the shared
  * [[Corpus.wordCounts]] prefix) cut to the top `maxWords` words by
  * TakeOrdered. Everything after operates on that bounded dictionary:
  * this is how production BPE trainers work — the merge loop runs over
  * word COUNTS, not the raw text, so a 100 TB corpus and a 100 MB corpus
  * cost the same once the dictionary is built. The merge loop itself is
  * inherently sequential (merge i+1's pair statistics depend on merge
  * i's rewrite), so it is driver-side by design, bounded by
  * `maxWords × avgWordLen` symbols — NOT a disguised corpus collect.
  *
  * Encoding is map-only: the learned merge ranks broadcast (numMerges
  * entries), each partition keeps a word→pieces memo so Zipf repetition
  * makes the greedy merge loop amortize to ~once per distinct word per
  * partition. No shuffle, no driver round-trip.
  */
object Bpe {

  /** Word-final marker: a private-use-area codepoint no real text
    * spells, so [[decode]]'s boundary detection cannot be spoofed by
    * corpus content (a "</w>"-style marker can be assembled by merges
    * over HTML-ish text). The rare input that DOES contain U+E000 has
    * it stripped during normalization on both the train and encode
    * sides — losslessness is modulo that strip, by construction. */
  val EndOfWord = "\uE000"

  /** A learned BPE model: the ordered merge list. Rank = merge index —
    * lower rank merges apply first during encoding (classic greedy
    * lowest-rank-first). */
  final case class BpeModel(merges: IndexedSeq[(String, String)]) {
    /** (left, right) → rank. */
    lazy val ranks: Map[(String, String), Int] = merges.zipWithIndex.toMap

    /** Token strings the model can emit: every merge product, in merge
      * order. (Base characters of unseen words pass through as
      * single-char pieces, so the emittable set is open — this is the
      * LEARNED vocabulary only.) */
    def mergedTokens: IndexedSeq[String] = merges.map { case (a, b) => a + b }
  }

  /** Train `numMerges` BPE merges on the word-frequency dictionary of
    * `docs(textCol)` (whitespace pre-tokenization, lowercased — same
    * normalization as [[Corpus.buildVocab]]).
    *
    * @param maxWords  dictionary bound: train on the `maxWords` most
    *                  frequent words (ties broken word-asc). This is the
    *                  standard trainer cap, not an approximation knob you
    *                  have to apologise for — rare-word tails contribute
    *                  ~nothing to pair statistics.
    * @param minCount  drop dictionary words rarer than this before the
    *                  loop (2+ recommended at corpus scale).
    *
    * Deterministic: pair argmax ties break lexicographically on the
    * (left, right) pair, and the dictionary cut is (count desc, word
    * asc) — same corpus, any partitioning or layout → identical merges.
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
      maxWords: Int = 1 << 16, minCount: Long = 1L): BpeModel = {
    require(numMerges >= 0, "numMerges must be >= 0")
    require(maxWords > 0, "maxWords must be positive")

    // Stage 1 (distributed, the only corpus-sized pass): top-maxWords
    // word counts via the shared buildVocab prefix. orderBy+limit =
    // TakeOrdered — no global sort, driver receives exactly maxWords
    // rows.
    val raw: Array[(String, Long)] = Corpus.wordCounts(docs, textCol)
      .filter(length(col("word")) > 0)
      .filter(col("n") >= minCount)
      .orderBy(col("n").desc, col("word").asc)
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))

    // Sentinel-proof the dictionary (driver-side, bounded): strip any
    // literal EndOfWord codepoints from the words, re-merging counts of
    // words the strip collapses (deterministic: fold in (n desc, word
    // asc) arrival order, re-sort after).
    val wordCounts: Array[(String, Long)] = raw
      .map { case (w, n) => (w.replace(EndOfWord, ""), n) }
      .filter(_._1.nonEmpty)
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toArray
      .sortBy { case (w, n) => (-n, w) }

    BpeModel(trainOnCounts(wordCounts, numMerges))
  }

  /** A word's base symbol sequence: its Unicode CODEPOINTS (an astral
    * character — emoji, rare CJK — is one symbol, never an unpaired
    * surrogate half) plus the trailing [[EndOfWord]] marker. */
  private[graft] def baseSymbols(word: String): Array[String] = {
    val out = new mutable.ArrayBuffer[String](word.length + 1)
    var i = 0
    while (i < word.length) {
      val n = Character.charCount(word.codePointAt(i))
      out += word.substring(i, i + n)
      i += n
    }
    out += EndOfWord
    out.toArray
  }

  /** Persist a trained merge list as (rank, a, b) parquet rows at
    * `path/merges` — train once, every encode (and any external
    * replayer: the strict q_tokens_bpe oracle) reads the same merges.
    * Training is deterministic, but the persisted list is the
    * contract; an encode that must be replayable runs with
    * [[readMerges]]' copy. */
  def writeMerges(spark: org.apache.spark.sql.SparkSession,
      model: BpeModel, path: String): Unit = {
    import spark.implicits._
    model.merges.zipWithIndex
      .map { case ((a, b), r) => (r.toLong, a, b) }
      .toDF("rank", "a", "b")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/merges")
  }

  /** Load a [[writeMerges]] store (driver-side; numMerges rows). An
    * EMPTY store is a legitimate model, not a torn one: a degenerate
    * corpus where no pair ever repeats trains zero merges, and encode
    * handles that fine (every word stays base symbols) — only
    * non-contiguous ranks signal corruption. */
  def readMerges(spark: org.apache.spark.sql.SparkSession,
      path: String): BpeModel = {
    val rows = spark.read.parquet(s"$path/merges")
      .select(col("rank"), col("a"), col("b")).collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getString(2))))
      .sortBy(_._1)
    require(rows.map(_._1).toSeq == (0L until rows.length).toSeq,
      s"readMerges: ranks at $path are not contiguous from 0 — torn store?")
    BpeModel(rows.map(_._2).toIndexedSeq)
  }

  /** The sequential merge loop over a bounded word-count dictionary.
    * Incremental pair statistics: one full scan up front, then each
    * merge rescans only the words that actually contain the merged pair
    * (tracked by an inverted pair→wordIdx index) — the classic
    * efficient-BPE bookkeeping, O(affected words) per merge instead of
    * O(dictionary). */
  private[operators] def trainOnCounts(wordCounts: Array[(String, Long)],
      numMerges: Int): IndexedSeq[(String, String)] = {
    val symbols: Array[Array[String]] =
      wordCounts.map { case (w, _) => baseSymbols(w) }
    val freqs: Array[Long] = wordCounts.map(_._2)

    val pairCounts = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.Set[Int]]

    def addWord(idx: Int, sign: Long): Unit = {
      val syms = symbols(idx)
      var i = 0
      while (i < syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        val n = pairCounts.getOrElse(p, 0L) + sign * freqs(idx)
        if (n <= 0L) { pairCounts.remove(p); pairWords.remove(p) }
        else {
          pairCounts(p) = n
          if (sign > 0)
            pairWords.getOrElseUpdate(p, mutable.Set.empty) += idx
        }
        i += 1
      }
    }
    symbols.indices.foreach(addWord(_, 1L))

    val merges = IndexedSeq.newBuilder[(String, String)]
    var m = 0
    while (m < numMerges && pairCounts.nonEmpty) {
      // argmax by count; ties lexicographic on (left, right) — the
      // determinism contract.
      var best: (String, String) = null
      var bestN = 0L
      pairCounts.foreach { case (p, n) =>
        if (n > bestN || (n == bestN && (best == null ||
            Ordering[(String, String)].lt(p, best)))) {
          best = p; bestN = n
        }
      }
      // Sennrich's stop: no pair occurs twice → nothing left to learn.
      if (bestN < 2L) m = numMerges
      else {
        merges += best
        val joined = best._1 + best._2
        val affected = pairWords.get(best).map(_.toArray).getOrElse(Array.empty)
        affected.foreach { idx =>
          addWord(idx, -1L) // retract this word's old pair stats
          val old = symbols(idx)
          val out = new mutable.ArrayBuffer[String](old.length)
          var i = 0
          while (i < old.length) {
            if (i < old.length - 1 && old(i) == best._1 &&
                old(i + 1) == best._2) { out += joined; i += 2 }
            else { out += old(i); i += 1 }
          }
          symbols(idx) = out.toArray
          addWord(idx, 1L)
        }
        m += 1
      }
    }
    merges.result()
  }

  /** One compiled whitespace pattern for the hot encode path —
    * String.split(regex) recompiles per call (the per-row cost
    * `plans/TextExpressions` documents for its own kernels). */
  private val WS = java.util.regex.Pattern.compile("\\s+")

  /** Pre-tokenize one text the way training's `wordCounts` does
    * (trim, ROOT-locale lowercase, \s+ split — Locale.ROOT because
    * Spark's `lower()` is locale-independent and a Turkish-locale JVM
    * would otherwise dot-swap 'I'), plus the sentinel strip. */
  private[graft] def splitWords(text: String): Array[String] =
    if (text == null) Array.empty[String]
    else WS.split(text.trim.toLowerCase(Locale.ROOT))
      .map(_.replace(EndOfWord, ""))
      .filter(_.nonEmpty)

  /** Greedy BPE encode of one pre-tokenized word: repeatedly merge the
    * lowest-rank adjacent pair present until none remains ranked. */
  private[graft] def encodeWord(word: String,
      ranks: Map[(String, String), Int]): Array[String] = {
    var syms: Array[String] = baseSymbols(word)
    var done = false
    while (!done && syms.length > 1) {
      var bestIdx = -1
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        ranks.get((syms(i), syms(i + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; bestIdx = i }
        }
        i += 1
      }
      if (bestIdx < 0) done = true
      else {
        // merge EVERY adjacent occurrence of this exact pair left-to-
        // right (matches how training's rewrite collapses the pair)
        val a = syms(bestIdx)
        val b = syms(bestIdx + 1)
        val out = new mutable.ArrayBuffer[String](syms.length)
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
            out += (a + b); j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.toArray
      }
    }
    syms
  }

  /** Encode `docs(textCol)` into BPE pieces: `(idCol, pieces
    * array<string>)`, the id column passing through with its ORIGINAL
    * type and nullability (string/UUID/null ids all survive — nothing
    * is cast). Map-only — merge ranks broadcast, per-partition
    * word→pieces memo (Zipf makes the loop run ~once per distinct word
    * per partition). Null/empty text → empty pieces (row kept). */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      model: BpeModel): DataFrame = {
    val spark = docs.sparkSession
    val outSchema = StructType(Seq(docs.schema(idCol),
      StructField("pieces", ArrayType(StringType, containsNull = false),
        nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    val bc = spark.sparkContext.broadcast(model.ranks)
    docs.select(col(idCol), col(textCol).cast("string"))
      .mapPartitions { it =>
        val ranks = bc.value
        val memo = mutable.HashMap.empty[String, Array[String]]
        it.map { r =>
          val words = splitWords(if (r.isNullAt(1)) null else r.getString(1))
          val pieces = words.flatMap(w =>
            memo.getOrElseUpdate(w, encodeWord(w, ranks)))
          Row(r.get(0), pieces.toSeq)
        }
      }(enc)
  }

  /** Inverse of [[encode]] for round-trip checks: pieces → the
    * normalized (trimmed, lowercased, single-spaced, sentinel-
    * stripped) pre-tokenized text. Lossless because every word's piece
    * sequence ends in a symbol carrying [[EndOfWord]], and normalized
    * input cannot contain the sentinel itself. */
  def decode(pieces: Seq[String]): String = {
    val sb = new StringBuilder
    pieces.foreach { p =>
      if (p.endsWith(EndOfWord)) {
        sb.append(p.dropRight(EndOfWord.length)); sb.append(' ')
      } else sb.append(p)
    }
    sb.toString.trim
  }
}
