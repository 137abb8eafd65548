package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bpe
import graft.operators.Bpe.{EndOfWord => W}

/** Value-level pins for the BPE trainer/encoder: the merge sequence on
  * Sennrich's classic dictionary is hand-derivable, so the whole
  * train→encode→decode chain is checked against worked-by-hand truth
  * (the query surface is rows-only — no iterative-merge SQL exists). */
class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** The classic dictionary: low×5, lower×2, newest×6, widest×3.
    * One doc per occurrence — layout must not matter. */
  private def corpus = {
    val words =
      Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
  }

  /** Hand-computed first 8 merges (count argmax, ties lexicographic):
    * es(9) → est(9) → est⟨/w⟩(9) → lo(7) → low(7) → ew(6) →
    * ew+est⟨/w⟩(6) → n+ewest⟨/w⟩(6). */
  private val expectedMerges = IndexedSeq(
    ("e", "s"), ("es", "t"), ("est", W), ("l", "o"), ("lo", "w"),
    ("e", "w"), ("ew", "est" + W), ("n", "ewest" + W))

  test("train recovers the hand-computed merge sequence") {
    val model = Bpe.train(corpus, "text", numMerges = 8)
    assert(model.merges == expectedMerges)
  }

  test("training is partitioning- and layout-independent") {
    val m1 = Bpe.train(corpus.repartition(7), "text", 8)
    val m2 = Bpe.train(corpus.coalesce(1), "text", 8)
    val m3 = Bpe.train(corpus.orderBy($"text".desc), "text", 8)
    assert(m1.merges == expectedMerges)
    assert(m2.merges == expectedMerges)
    assert(m3.merges == expectedMerges)
  }

  test("greedy encode generalizes to unseen words via learned subwords") {
    val model = Bpe.BpeModel(expectedMerges)
    // "lowest" never appears in training, but low + est</w> do.
    assert(Bpe.encodeWord("lowest", model.ranks).toSeq ==
      Seq("low", "est" + W))
    // fully merged training word
    assert(Bpe.encodeWord("newest", model.ranks).toSeq ==
      Seq("newest" + W))
    // wholly unseen characters fall back to single-char pieces
    assert(Bpe.encodeWord("xyz", model.ranks).toSeq ==
      Seq("x", "y", "z", W))
  }

  test("encode is a map-only pass; decode round-trips normalized text") {
    val model = Bpe.train(corpus, "text", 8)
    val docs = Seq(
      (1L, "Newest  LOWEST"), // case + multi-space normalize
      (2L, null.asInstanceOf[String]),
      (3L, "   ")
    ).toDF("doc_id", "text")
    val out = Bpe.encode(docs, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L) == Seq("newest" + W, "low", "est" + W))
    assert(out(2L).isEmpty) // null text → empty pieces, row kept
    assert(out(3L).isEmpty)
    assert(Bpe.decode(out(1L)) == "newest lowest")
    // no shuffle: encode's physical plan has no Exchange
    val plan = Bpe.encode(docs, "doc_id", "text", model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("id column passes through with its original type, nulls intact") {
    val model = Bpe.BpeModel(expectedMerges)
    val docs = Seq(
      ("doc-a", "newest"),
      (null.asInstanceOf[String], "lowest")
    ).toDF("key", "text")
    val out = Bpe.encode(docs, "key", "text", model).collect()
      .map(r => Option(r.getString(0)) -> r.getSeq[String](1)).toMap
    assert(out(Some("doc-a")) == Seq("newest" + W))
    assert(out(None) == Seq("low", "est" + W))
  }

  test("astral characters stay whole symbols — never surrogate halves") {
    // U+1F600 (😀) is two UTF-16 chars; a code-unit split would emit
    // two invalid lone-surrogate pieces
    assert(Bpe.baseSymbols("😀a").toSeq == Seq("😀", "a", W))
    val docs = Seq((1L, "😀a 😀a")).toDF("doc_id", "text")
    val model = Bpe.train(docs, "text", 4)
    val pieces = Bpe.encodeWord("😀a", model.ranks).toSeq
    assert(pieces == Seq("😀a" + W)) // fully merged, surrogates intact
    assert(Bpe.decode(pieces) == "😀a")
  }

  test("a literal end-of-word sentinel in input text cannot spoof decode") {
    // text smuggling U+E000 normalizes to the same words as without it
    val spoofed = Seq((1L, s"new${W}est low$W")).toDF("doc_id", "text")
    val clean = Seq((1L, "newest low")).toDF("doc_id", "text")
    val model = Bpe.BpeModel(expectedMerges)
    val a = Bpe.encode(spoofed, "doc_id", "text", model)
      .collect().head.getSeq[String](1)
    val b = Bpe.encode(clean, "doc_id", "text", model)
      .collect().head.getSeq[String](1)
    assert(a == b)
    assert(Bpe.decode(a) == "newest low")
  }

  test("merge loop stops when no pair repeats; maxWords caps the dictionary") {
    // every word unique → all pair counts 1 → zero merges learned
    val unique = Seq((1L, "ab"), (2L, "cd"), (3L, "ef")).toDF("doc_id", "text")
    assert(Bpe.train(unique, "text", 10).merges.isEmpty)
    // dictionary capped to the 2 most frequent words: "widest"(3) and
    // "lower"(2) drop when maxWords = 2 keeps newest(6) + low(5), so
    // the w/i/d pairs never enter the statistics
    val capped = Bpe.train(corpus, "text", 50, maxWords = 2)
    assert(capped.merges.nonEmpty)
    assert(!capped.merges.exists { case (a, b) =>
      (a + b).contains("i") || (a + b).contains("d") })
  }

  test("merge store round-trips the model exactly") {
    // the strict q_tokens_bpe oracle replays the ENCODE from the
    // persisted merges — the store must lose neither merge content nor
    // rank ORDER (rank is the greedy loop's priority)
    val docs = Seq((1L, "low lower lowest low low")).toDF("id", "text")
    val m = Bpe.train(docs, "text", numMerges = 6, maxWords = 100,
      minCount = 1L)
    val p = java.nio.file.Files.createTempDirectory("bpestore").toString
    Bpe.writeMerges(spark, m, p)
    val r = Bpe.readMerges(spark, p)
    assert(r.merges == m.merges)
    assert(r.ranks == m.ranks)
  }

  test("mergedTokens lists merge products in rank order") {
    val model = Bpe.BpeModel(expectedMerges)
    assert(model.mergedTokens.take(3) == Seq("es", "est", "est" + W))
  }
}
