package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** Laws for the FLAT ANN layouts' append path (the hier twins live in
  * CoarseSpec): append never re-fits — batches are assigned with the
  * persisted centroids and encoded with the persisted codebooks — so
  * probes of an appended store must be row-identical to a store built
  * over the union with the same quantizer/codebooks; drifted batches
  * refuse BEFORE any mutation; every append logs its distortion. */
class AnnAppendSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def em = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("flat IVF: append ≡ rebuild probes; appends log; pre-meta " +
      "store refused") {
    val a = em.filter(col("vec_id") < 400)
    val b = em.filter(col("vec_id") >= 400)
    val p1 = java.nio.file.Files.createTempDirectory("ivfApp").toString
    val p2 = java.nio.file.Files.createTempDirectory("ivfReb").toString
    Similarity.writeIvfIndex(a, p1, nlist = 8)
    val cents = Similarity.readCentroids(spark, p1)
    val dist = Similarity.appendIvfIndex(b, p1)
    assert(dist > 0.0 && !dist.isNaN)
    Similarity.writeIvfIndex(em, p2, nlist = 8, centroids = Some(cents))
    val queries = em.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    def probe(p: String) = Similarity.ivfTopKFromIndex(spark, p,
        queries, 5, nprobe = 3)
      .select("qid", "rank", "vec_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val appended = probe(p1)
    assert(appended == probe(p2), "flat IVF append ≡ rebuild broke")
    assert(appended.exists(_._3 >= 400L), "appended rows not searchable")
    val log = Similarity.readAppendLog(spark, p1).collect()
    assert(log.length == 1 && log.head.getAs[Long]("n_rows") == 100L)
    // a REBUILD invalidates append history: rebuilding in place
    // clears the log (the flow the drift refusal itself instructs),
    // so the audit trail never mixes dead-store rows
    Similarity.writeIvfIndex(em, p1, nlist = 8, centroids = Some(cents))
    intercept[Exception] { // log path gone entirely
      Similarity.readAppendLog(spark, p1).collect()
    }
    Similarity.appendIvfIndex(b, p1)
    assert(Similarity.readAppendLog(spark, p1).count() == 1,
      "rebuilt store's log must start fresh")
    // a pre-append-era store (no meta) refuses the append loudly
    val old = java.nio.file.Files.createTempDirectory("ivfOld").toString
    Similarity.writeIvfIndex(a, old, nlist = 8)
    def rmr(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmr)); f.delete(); ()
    }
    rmr(new java.io.File(s"$old/meta"))
    val e = intercept[IllegalArgumentException] {
      Similarity.appendIvfIndex(b, old)
    }
    assert(e.getMessage.contains("meta"))
  }

  test("zero-distortion (bootstrap-sized) build: the multiplicative " +
      "drift gate has no scale, so it warns and admits instead of " +
      "refusing every real batch forever") {
    // 8 distinct vectors, 8 cells: every vector is its own centroid,
    // base_distortion persists as exactly 0.0
    val tiny = em.filter(col("vec_id") < 8)
    val p = java.nio.file.Files.createTempDirectory("ivfBoot").toString
    Similarity.writeIvfIndex(tiny, p, nlist = 8)
    val meta = spark.read.parquet(s"$p/meta").head()
    assert(meta.getAs[Double]("base_distortion") == 0.0)
    val d = Similarity.appendIvfIndex(
      em.filter(col("vec_id") >= 8 && col("vec_id") < 40), p)
    assert(d > 0.0, "realistic batch must append despite a zero base")
    assert(Similarity.readAppendLog(spark, p).count() == 1)
  }

  test("flat PQ: append ≡ rebuild (persisted codebooks); ADC-self-" +
      "distortion drift gate refuses a scaled batch untouched") {
    val a = em.filter(col("vec_id") < 400)
    val b = em.filter(col("vec_id") >= 400)
    val p1 = java.nio.file.Files.createTempDirectory("pqApp").toString
    val p2 = java.nio.file.Files.createTempDirectory("pqReb").toString
    Similarity.writePqIndex(a, p1, m = 8, ncodes = 16)
    Similarity.appendPqIndex(b, p1)
    val cb = Similarity.readPqCodebooks(spark, p1)
    Similarity.writePqIndex(em, p2, m = 8, ncodes = 16,
      codebooks = Some(cb))
    val queries = em.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    def probe(p: String) = Similarity.pqTopKFromIndex(spark, p,
        queries, 5)
      .select("qid", "rank", "vec_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val appended = probe(p1)
    assert(appended == probe(p2), "flat PQ append ≡ rebuild broke")
    assert(appended.exists(_._3 >= 400L))
    // drift: a 5×-scaled batch reconstructs ~25× worse under the SAME
    // codebooks — refused, and the store is untouched
    val drifted = b.select(col("vec_id"),
      transform(col("embedding"), x => x * lit(5.0f)).as("embedding"))
    val e = intercept[IllegalArgumentException] {
      Similarity.appendPqIndex(drifted, p1)
    }
    assert(e.getMessage.contains("drifted"))
    assert(probe(p1) == appended, "refused append mutated the store")
  }

  test("flat IVF-PQ (residual): append ≡ rebuild with shared " +
      "centroids AND codebooks; log + meta survive the append") {
    val a = em.filter(col("vec_id") < 400)
    val b = em.filter(col("vec_id") >= 400)
    val cp = java.nio.file.Files.createTempDirectory("ivfC").toString
    Similarity.writeIvfIndex(a, cp, nlist = 8)
    val cents = Similarity.readCentroids(spark, cp)
    val p1 = java.nio.file.Files.createTempDirectory("ivfpqApp").toString
    val p2 = java.nio.file.Files.createTempDirectory("ivfpqReb").toString
    Similarity.writeIvfPqIndex(a, p1, cents, m = 8, ncodes = 16,
      residual = true)
    Similarity.appendIvfPqIndex(b, p1)
    assert(Similarity.readIvfPqMeta(spark, p1), "residual flag survived")
    val cb = Similarity.readPqCodebooks(spark, p1)
    Similarity.writeIvfPqIndex(em, p2, cents, m = 8, ncodes = 16,
      residual = true, codebooks = Some(cb))
    val queries = em.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    def probe(p: String) = Similarity.ivfPqTopKFromIndex(spark, p,
        queries, 5, nprobe = 3)
      .select("qid", "rank", "vec_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val appended = probe(p1)
    assert(appended == probe(p2), "flat IVF-PQ append ≡ rebuild broke")
    assert(appended.exists(_._3 >= 400L))
    val log = Similarity.readAppendLog(spark, p1).collect()
    assert(log.length == 1 &&
      log.head.getAs[Double]("base_distortion") > 0.0)
  }
}
