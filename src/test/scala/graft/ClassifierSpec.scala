package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextClassifier

/** Laws for the hashed-feature logistic quality classifier (rows-only on
  * the query surface — gradient descent has no DuckDB replay). */
class ClassifierSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // linearly separable planted corpus: prose vocabulary vs spam vocabulary
  private def planted = {
    val good = Seq(
      "the committee reviewed the annual report in detail",
      "researchers published the updated survey results today",
      "the library catalog lists every archived manuscript",
      "engineers documented the revised bridge specifications",
      "students discussed the assigned chapters after class")
    val bad = Seq(
      "win free casino bonus click here now",
      "cheap pills discount offer click subscribe now",
      "winner winner free prize claim casino bonus",
      "click now free offer cheap bonus pills",
      "casino prize winner claim discount subscribe")
    (good.zipWithIndex.map { case (t, i) => (i.toLong, t, 1) } ++
      bad.zipWithIndex.map { case (t, i) => (100L + i, t, 0) })
      .toDF("doc_id", "text", "y")
  }

  test("separates planted prose from spam at 100% on the training set") {
    val df = planted
    val w = TextClassifier.train(df, "doc_id", "text", "y",
      k = 128, iters = 40, lr = 2.0)
    assert(w.length == 129)
    val scores = TextClassifier.score(df, "doc_id", "text", w, k = 128)
      .join(df.select("doc_id", "y"), Seq("doc_id"))
      .collect().map(r => (r.getAs[Double]("score"), r.getAs[Int]("y")))
    assert(scores.nonEmpty)
    assert(scores.forall { case (s, y) => (s >= 0.5) == (y == 1) },
      s"misclassified: ${scores.filter { case (s, y) => (s >= 0.5) != (y == 1) }.mkString(",")}")
  }

  test("predicted labels are partition-layout independent") {
    val df = planted
    val w = TextClassifier.train(df, "doc_id", "text", "y",
      k = 128, iters = 20, lr = 2.0)
    def preds(d: org.apache.spark.sql.DataFrame) =
      TextClassifier.score(d, "doc_id", "text", w, k = 128)
        .collect().map(r => r.getLong(0) -> (r.getDouble(1) >= 0.5)).toMap
    assert(preds(df) == preds(df.repartition(7)))
  }

  test("generalizes to unseen docs from the same vocabularies") {
    val w = TextClassifier.train(planted, "doc_id", "text", "y",
      k = 128, iters = 40, lr = 2.0)
    val unseen = Seq(
      (200L, "the archived survey results documented the revised catalog"),
      (201L, "free casino pills click now winner bonus")).toDF("doc_id", "text")
    val s = TextClassifier.score(unseen, "doc_id", "text", w, k = 128)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(s(200L) > 0.5, s"prose-like doc scored ${s(200L)}")
    assert(s(201L) < 0.5, s"spam-like doc scored ${s(201L)}")
  }

  test("gate keeps high-quality rows with all columns intact") {
    val df = planted
    val w = TextClassifier.train(df, "doc_id", "text", "y",
      k = 128, iters = 40, lr = 2.0)
    val kept = TextClassifier.gate(df, "doc_id", "text", w, k = 128)
    assert(kept.columns.toSeq == df.columns.toSeq)
    val ids = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == df.filter(col("y") === 1).collect()
      .map(_.getLong(0)).toSet)
  }

  test("all-one-label training drives the bias toward that label") {
    val onlySpam = planted.filter(col("y") === 0)
    val w = TextClassifier.train(onlySpam, "doc_id", "text", "y",
      k = 64, iters = 20, lr = 2.0)
    // an out-of-vocabulary doc hits only the bias — must predict 0
    val s = TextClassifier.score(
      Seq((1L, "zzz qqq xxx")).toDF("doc_id", "text"),
      "doc_id", "text", w, k = 64)
      .head().getDouble(1)
    assert(s < 0.5, s"bias should pull unseen docs to the only label, got $s")
  }

  test("kernel bucket matches Dsir.bucket's md5 arithmetic exactly") {
    val words = Seq("the", "vector", "ngram", "", "ünïcode-wörd", "a b",
      "été", "0", "zzz")
    for (k <- Seq(1, 7, 256, 65536)) {
      val viaCol = words.toDF("w")
        .select(col("w"), graft.operators.Dsir.bucket(col("w"), k).as("b"))
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      for (w <- words)
        assert(graft.plans.ClassifierKernels.bucket(w, k) == viaCol(w),
          s"bucket mismatch for '$w' at k=$k")
    }
  }

  test("kernel margin equals the triples margin (feature modes × ngrams)") {
    val df = planted
    for (tf <- Seq(true, false); ng <- Seq(1, 2)) {
      val w = TextClassifier.train(df, "doc_id", "text", "y",
        k = 128, iters = 10, lr = 1.0, tf = tf, ngrams = ng)
      // triples replay: sum of x·w over the doc's buckets + bias
      val triples = TextClassifier
        .features(df, "doc_id", "text", 128, tf, ng)
        .collect().groupBy(_.getLong(0)).map { case (id, rows) =>
          id -> (rows.map(r => r.getDouble(2) * w(r.getInt(1))).sum + w(128))
        }
      val kernel = df.select(col("doc_id"),
        graft.plans.ClassifierExprs.hashed_logit(col("text"), w.toSeq, tf, ng)
          .as("m")).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      for ((id, m) <- kernel)
        assert(math.abs(m - triples(id)) < 1e-9,
          s"margin mismatch doc $id tf=$tf ngrams=$ng: " +
            s"kernel=$m triples=${triples(id)}")
    }
  }

  test("wordNgrams=2 separates word-order classes a bag of words cannot") {
    // every doc has the SAME unigram multiset — only bigram order
    // distinguishes the classes, fastText's wordNgrams motivation
    val df = (Seq.tabulate(8)(i => (i.toLong, "dog bites man here", 1)) ++
      Seq.tabulate(8)(i => (100L + i, "man bites dog here", 0)))
      .toDF("doc_id", "text", "y")
    val w2 = TextClassifier.train(df, "doc_id", "text", "y",
      k = 128, iters = 30, lr = 2.0, tf = false, ngrams = 2)
    val acc2 = TextClassifier.score(df, "doc_id", "text", w2,
        k = 128, tf = false, ngrams = 2)
      .join(df.select("doc_id", "y"), Seq("doc_id"))
      .collect().count(r =>
        (r.getAs[Double]("score") >= 0.5) == (r.getAs[Int]("y") == 1))
    assert(acc2 == 16, s"bigram model must fully separate, got $acc2/16")
    // the unigram model provably cannot: identical features per class
    val w1 = TextClassifier.train(df, "doc_id", "text", "y",
      k = 128, iters = 30, lr = 2.0, tf = false, ngrams = 1)
    val scores1 = TextClassifier.score(df, "doc_id", "text", w1,
        k = 128, tf = false, ngrams = 1)
      .collect().map(_.getDouble(1)).distinct
    assert(scores1.length == 1,
      s"unigram scores must be identical for all docs: $scores1")
  }

  test("bad hyperparameters and weight shapes are rejected") {
    val df = planted
    intercept[IllegalArgumentException] {
      TextClassifier.train(df, "doc_id", "text", "y", k = 0)
    }
    intercept[IllegalArgumentException] {
      TextClassifier.score(df, "doc_id", "text", new Array[Double](5), k = 128)
    }
  }

  test("weight store round-trips; a torn store (gap in the index grid) " +
      "is rejected, not silently read as weight 0.0") {
    val w = Array(0.5, -1.25, 3.0, 0.0, 42.0)
    val p = java.nio.file.Files.createTempDirectory("clfw").toString
    TextClassifier.writeWeights(spark, w, p)
    assert(TextClassifier.readWeights(spark, p).toSeq == w.toSeq)
    // simulate the torn copy: drop one interior row and rewrite
    spark.read.parquet(s"$p/model").filter(col("i") =!= 2L)
      .write.mode("overwrite").parquet(s"$p/torn/model")
    val e = intercept[IllegalArgumentException] {
      TextClassifier.readWeights(spark, s"$p/torn")
    }
    assert(e.getMessage.contains("torn store"))
  }
}
