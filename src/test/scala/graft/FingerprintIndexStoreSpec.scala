package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Corpus, Dedup}
import graft.sinks.FingerprintIndexStore

/** Lifecycle pins for the persisted fingerprint-index store: roundtrip
  * probe parity, append advance, torn-write rejection, kind mismatch. */
class FingerprintIndexStoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString + "/idx"

  test("write/load roundtrip: keys + sidecar drive the bloom probe " +
      "to plain-probe parity") {
    val corpus = Seq((1L, "alpha\nbeta"), (2L, "beta\nrho"))
      .toDF("doc_id", "text")
    val batch = Seq((10L, "beta\ngamma"), (11L, "rho\nalpha"))
      .toDF("doc_id", "text")
    val dir = tmp("fpidx")
    FingerprintIndexStore.write(
      Corpus.unitIndex(corpus, "text", "doc_id"), dir)
    val loaded = FingerprintIndexStore.load(spark, dir, "ufp")
    assert(loaded.nKeys == 3L && loaded.bloom != null)
    def out(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val viaStore = out(Corpus.dedupKeepFirstAgainstIndexBloom(
      batch, loaded.keys, "text", "doc_id", loaded.bloom))
    val plain = out(Corpus.dedupKeepFirstAgainstIndex(
      batch, Corpus.unitIndex(corpus, "text", "doc_id"),
      "text", "doc_id"))
    assert(viaStore == plain)
    assert(viaStore == Map(10L -> "gamma"))
  }

  test("append distinct-compacts the advance and refreshes the " +
      "sidecar; manifest count tracks") {
    val dir = tmp("fpidx-app")
    FingerprintIndexStore.write(
      Corpus.unitIndex(Seq((1L, "a\nb")).toDF("doc_id", "text"),
        "text", "doc_id"), dir)
    // overlap on "b": distinct-union must not double-count
    FingerprintIndexStore.append(
      Corpus.unitIndex(Seq((2L, "b\nc")).toDF("doc_id", "text"),
        "text", "doc_id"), dir)
    val loaded = FingerprintIndexStore.load(spark, dir, "ufp")
    assert(loaded.nKeys == 3L)
    assert(loaded.keys.distinct().count() == 3L)
    // the refreshed sidecar answers for the appended key
    val hit = Corpus.dedupKeepFirstAgainstIndexBloom(
      Seq((9L, "c")).toDF("doc_id", "text"), loaded.keys, "text",
      "doc_id", loaded.bloom)
    assert(hit.count() == 0L, "appended unit must strip")
  }

  test("torn store (no manifest) and kind mismatch fail loudly; " +
      "empty store loads a null sidecar") {
    val dir = tmp("fpidx-torn")
    val idx = Corpus.unitIndex(
      Seq((1L, "x")).toDF("doc_id", "text"), "text", "doc_id")
    FingerprintIndexStore.write(idx, dir)
    val e1 = intercept[IllegalArgumentException] {
      FingerprintIndexStore.load(spark, dir, "afp")
    }
    assert(e1.getMessage.contains("key_col") ||
      e1.getMessage.contains("fingerprints"))
    // simulate the torn write: manifest gone, data present
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/params"), true)
    val e2 = intercept[IllegalArgumentException] {
      FingerprintIndexStore.load(spark, dir, "ufp")
    }
    assert(e2.getMessage.contains("torn") ||
      e2.getMessage.contains("manifest"))
    // multi-column frames are not an index
    intercept[IllegalArgumentException] {
      FingerprintIndexStore.write(
        Seq((1L, "x")).toDF("doc_id", "text"), tmp("fpidx-bad"))
    }
    // empty index: loadable, null sidecar (the probes' documented
    // degenerate contract)
    val emptyDir = tmp("fpidx-empty")
    FingerprintIndexStore.write(idx.filter(lit(false)), emptyDir)
    val empty = FingerprintIndexStore.load(spark, emptyDir, "ufp")
    assert(empty.nKeys == 0L && empty.bloom == null)
    // doc-fingerprint kind works end-to-end too
    val fpDir = tmp("fpidx-fp")
    val corpus = Seq((1L, "same doc"), (2L, "other doc"))
      .toDF("doc_id", "text")
    FingerprintIndexStore.write(
      Dedup.fingerprintIndex(corpus, "text"), fpDir)
    val fpLoaded = FingerprintIndexStore.load(spark, fpDir, "fp")
    val survivors = Dedup.dedupAgainstIndexBloom(
      Seq((9L, "same doc"), (10L, "brand new")).toDF("doc_id", "text"),
      fpLoaded.keys, "text", "doc_id", fpLoaded.bloom)
    assert(survivors.select("doc_id").collect()
      .map(_.getLong(0)).toSeq == Seq(10L))
  }
}
