package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Byte-pair-encoding tokenizer training + encoding (Sennrich et al.
  * 2016 — the subword vocabulary scheme used by most LLM tokenizers).
  *
  * Scale shape: the ONLY corpus-sized work is stage 1's word-frequency
  * count — one explode+groupBy shuffle (the exact plan
  * [[Corpus.buildVocab]] already ships) cut to the top `maxWords` words
  * by TakeOrdered. Everything after operates on that bounded dictionary:
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

  /** Word-final marker symbol (a separate trailing symbol, so merges
    * can distinguish "st" mid-word from "st" at word end). */
  val EndOfWord = "</w>"

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
    // word counts. orderBy+limit = TakeOrdered — no global sort, driver
    // receives exactly maxWords rows.
    val wordCounts: Array[(String, Long)] = docs
      .select(explode(split(trim(lower(col(textCol))), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
      .orderBy(col("n").desc, col("word").asc)
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))

    BpeModel(trainOnCounts(wordCounts, numMerges))
  }

  /** The sequential merge loop over a bounded word-count dictionary.
    * Incremental pair statistics: one full scan up front, then each
    * merge rescans only the words that actually contain the merged pair
    * (tracked by an inverted pair→wordIdx index) — the classic
    * efficient-BPE bookkeeping, O(affected words) per merge instead of
    * O(dictionary). */
  private[operators] def trainOnCounts(wordCounts: Array[(String, Long)],
      numMerges: Int): IndexedSeq[(String, String)] = {
    // Mutable word representations: symbol arrays, initially per-char
    // with the end-of-word marker as a separate trailing symbol.
    val symbols: Array[Array[String]] = wordCounts.map { case (w, _) =>
      w.map(_.toString).toArray :+ EndOfWord
    }
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

  /** Greedy BPE encode of one pre-tokenized word: repeatedly merge the
    * lowest-rank adjacent pair present until none remains ranked. */
  private[graft] def encodeWord(word: String,
      ranks: Map[(String, String), Int]): Array[String] = {
    var syms: Array[String] = word.map(_.toString).toArray :+ EndOfWord
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
    * array<string>)`. Map-only — merge ranks broadcast, per-partition
    * word→pieces memo (Zipf makes the loop run ~once per distinct word
    * per partition). Null/empty text → empty pieces (row kept). */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      model: BpeModel): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model.ranks)
    docs.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val ranks = bc.value
        val memo = mutable.HashMap.empty[String, Array[String]]
        it.map { case (id, text) =>
          val words =
            if (text == null) Array.empty[String]
            else text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
          val pieces = words.flatMap(w =>
            memo.getOrElseUpdate(w, encodeWord(w, ranks)))
          (id, pieces)
        }
      }
      .toDF(idCol, "pieces")
  }

  /** Inverse of [[encode]] for round-trip checks: pieces → the
    * normalized (trimmed, lowercased, single-spaced) pre-tokenized
    * text. Lossless because every word's piece sequence ends in a
    * symbol carrying [[EndOfWord]]. */
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
