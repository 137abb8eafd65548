package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dsir

/** Value-level pins for DSIR importance resampling (the DuckDB oracle
  * replays the full en-vs-rest query; these pin the arithmetic on
  * hand-computable corpora and the selection laws). */
class DsirSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def mnat(tc: Long, tTot: Long, rc: Long, rTot: Long, k: Int): Long =
    math.round(1e6 * (math.log((tc + 1).toDouble / (tTot + k)) -
      math.log((rc + 1).toDouble / (rTot + k))))

  test("logRatios matches hand-computed smoothed micro-nats") {
    // k=1: every shingle lands in bucket 0, so the table is one row
    // whose counts are the raw shingle totals — target "a b c" has
    // bigrams [a b, b c] (2), raw "x y" is one whole-text shingle (1).
    val target = Seq((1L, "a b c")).toDF("doc_id", "text")
    val raw = Seq((2L, "x y")).toDF("doc_id", "text")
    val out = Dsir.logRatios(target, raw, "text", n = 2, k = 1)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out == Map(0 -> mnat(2, 2, 1, 1, 1)))
  }

  test("dense ratio table: a new batch probing a bucket the fit never " +
      "saw scores the smoothed ratio, not a neutral 0") {
    val target = Seq((1L, "a b c")).toDF("doc_id", "text")
    val raw = Seq((2L, "x y")).toDF("doc_id", "text")
    val k = 64
    val ratios = Dsir.logRatios(target, raw, "text", n = 2, k = k)
    assert(ratios.count() == k, "table must be dense over all k buckets")
    // premise: the new doc's single shingle "q z" hashes to a bucket
    // neither corpus observed (md5 is fixed, so this is deterministic —
    // if it ever collides after a k change, pick different tokens)
    val bucketOf = Seq("a b", "b c", "x y", "q z").toDF("s")
      .select(Dsir.bucket(col("s"), k)).collect().map(_.getInt(0))
    assert(!bucketOf.take(3).contains(bucketOf(3)),
      s"test premise broken: 'q z' bucket ${bucketOf(3)} was observed")
    // fit totals: target 2 bigrams, raw 1 whole-text shingle
    val unseenMnat = mnat(0, 2, 0, 1, k)
    assert(unseenMnat != 0L, "smoothed unseen ratio is not neutral here")
    val w = Dsir.importanceWeights(
      Seq((9L, "q z")).toDF("doc_id", "text"), "doc_id", "text",
      ratios, n = 2, k = k).head().getLong(1)
    assert(w == unseenMnat,
      s"unseen-bucket doc scored $w, expected smoothed $unseenMnat")
  }

  test("importanceWeights: target-looking docs outscore raw-looking docs") {
    val target = Seq.tabulate(20)(i =>
      (i.toLong, "curated encyclopedia article text")).toDF("doc_id", "text")
    val raw = Seq(
      (100L, "curated encyclopedia article text"),   // = target distribution
      (101L, "spam casino pills winner click"),      // raw-only mass
      (102L, "spam casino pills winner click"),
      (103L, "spam casino pills winner click")
    ).toDF("doc_id", "text")
    val ratios = Dsir.logRatios(target, raw, "text", n = 2, k = 64)
    val w = Dsir.importanceWeights(raw, "doc_id", "text", ratios, n = 2, k = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w.keySet == Set(100L, 101L, 102L, 103L))
    assert(w(100L) > w(101L),
      s"target-like doc must outweigh raw-only doc: $w")
    assert(w(101L) == w(102L) && w(102L) == w(103L),
      "identical docs must get identical weights")
  }

  test("weights are partition-layout independent (integer-exact sums)") {
    val docs = Q.t(spark, "/root/testdata/sf0.001", "documents")
    val target = docs.filter(col("lang") === "en")
    val raw = docs.filter(col("lang") =!= "en")
    val ratios = Dsir.logRatios(target, raw, "text", n = 2, k = 128)
    def run(df: org.apache.spark.sql.DataFrame) =
      Dsir.importanceWeights(df, "doc_id", "text", ratios, n = 2, k = 128)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(raw) == run(raw.repartition(7)))
  }

  test("select: bounded, a subset of raw, deterministic, seed-sensitive") {
    val docs = Q.t(spark, "/root/testdata/sf0.001", "documents")
    val target = docs.filter(col("lang") === "en")
    val raw = docs.filter(col("lang") =!= "en")
    def ids(seed: Long) = Dsir.select(raw, "doc_id", "text", target,
      topN = 20, n = 2, k = 128, seed = seed)
      .collect().map(_.getLong(0)).toSet
    val rawIds = raw.select("doc_id").collect().map(_.getLong(0)).toSet
    val a = ids(7L)
    assert(a.size == 20 && a.subsetOf(rawIds))
    assert(a == ids(7L), "same seed must replay the same subset")
    assert(a != ids(8L), "a different seed is a different draw")
  }

  test("incremental count store: two appended batches ≡ one-shot fit") {
    val docs = Q.t(spark, "/root/testdata/sf0.001", "documents")
    val target = docs.filter(col("lang") === "en")
    val raw = docs.filter(col("lang") =!= "en")
    val path = Q.tempDir("dsir-stats") + "/counts"
    import graft.operators.Dsir
    // target arrives whole; raw arrives as two disjoint ingest batches
    Dsir.appendBucketCounts(target, "text", "target", path,
      n = 2, k = 128, overwrite = true)
    Dsir.appendBucketCounts(raw.filter(col("doc_id") % 2 === 0), "text",
      "raw", path, n = 2, k = 128)
    Dsir.appendBucketCounts(raw.filter(col("doc_id") % 2 =!= 0), "text",
      "raw", path, n = 2, k = 128)
    val inc = Dsir.logRatiosFromStats(spark, path, n = 2, k = 128)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val oneShot = Dsir.logRatios(target, raw, "text", n = 2, k = 128)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(inc == oneShot,
      "integer counts fold exactly — the tables must be identical")
    // a store missing one side is rejected with a clear message
    val path2 = Q.tempDir("dsir-stats2") + "/counts"
    Dsir.appendBucketCounts(target, "text", "target", path2,
      n = 2, k = 128, overwrite = true)
    val e = intercept[IllegalArgumentException] {
      Dsir.logRatiosFromStats(spark, path2, n = 2, k = 128)
    }
    assert(e.getMessage.contains("both"))
  }

  test("select at vanishing temperature is the deterministic weight top-N") {
    val docs = Q.t(spark, "/root/testdata/sf0.001", "documents")
    val target = docs.filter(col("lang") === "en")
    val raw = docs.filter(col("lang") =!= "en")
    val ratios = Dsir.logRatios(target, raw, "text", n = 2, k = 128)
    val byWeight = Dsir
      .importanceWeights(raw, "doc_id", "text", ratios, n = 2, k = 128)
      .orderBy(col("w_mnat").desc, col("doc_id"))
      .limit(10).collect().map(_.getLong(0)).toSet
    // w/1e6/temp at temp=1e-4 spans ~1e7 per unit weight — Gumbel noise
    // (±~10) cannot reorder it
    val greedy = Dsir.select(raw, "doc_id", "text", target,
      topN = 10, n = 2, k = 128, seed = 3L, temperature = 1e-4)
      .collect().map(_.getLong(0)).toSet
    assert(greedy == byWeight)
  }
}
