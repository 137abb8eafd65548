package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Corpus, Dedup, GraftCaches}

/** The cache-lifecycle contract, closed: every caller-lifecycle
  * persist (winnow fingerprints/eligible, bloom-probe accepted
  * slivers, line-dedup frequent set) registers with [[GraftCaches]],
  * and one release() between increments leaves the session's
  * CacheManager EMPTY — the assertion a long-lived incremental driver
  * relies on instead of Scaladoc prose. */
class GraftCachesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def cacheEmpty: Boolean =
    org.apache.spark.sql.graft.bridge.cacheManagerIsEmpty(spark)

  test("winnow caches nothing (r17 bucket shape); line-dedup leaves " +
      "caches behind; release() drains them and the CacheManager is " +
      "empty") {
    // a clean slate regardless of suite ordering (other suites may
    // have left caller-owned caches)
    spark.catalog.clearCache()
    GraftCaches.release()
    assert(cacheEmpty)
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "lambda mu nu xi omicron pi rho sigma tau upsilon"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "lambda mu nu xi omicron pi rho sigma tau upsilon"),
      (3L, "totally different text with no shared windows at all here " +
        "and some more words to cross the winnow window threshold ok"))
      .toDF("doc_id", "text")
    // a winnow run is cache-free since the r17 bucket restructure
    val pairs = Dedup.winnowOverlapPairs(docs, "text", "doc_id")
    assert(pairs.count() >= 1)
    assert(GraftCaches.liveCount == 0)
    assert(cacheEmpty)
    // a line-dedup run on the frequent-set JOIN path still persists
    // (maxLiteral* = 0 forces the join fallback, whose returned plan
    // reads the freqStrings cache — the caller-lifecycle case)
    val lines = (1 to 40).map(i =>
      (i.toLong, "common line\nunique " + i)).toDF("doc_id", "text")
    assert(Corpus.dedupLines(lines, "text", delim = "\n",
      maxOccurrences = 3, maxLiteralLines = 0,
      maxLiteralBytes = 0).count() > 0)
    assert(GraftCaches.liveCount >= 1)
    assert(!cacheEmpty)
    GraftCaches.release()
    assert(GraftCaches.liveCount == 0)
    assert(cacheEmpty, "a graft cache survived release()")
    // idempotent
    GraftCaches.release()
    assert(cacheEmpty)
  }

  test("an incremental bloom-probe cycle leaves nothing cached after " +
      "release()") {
    spark.catalog.clearCache()
    GraftCaches.release()
    val hist = (1 to 30).map(i => (i.toLong, s"doc number $i unique"))
      .toDF("doc_id", "text")
    val idx = Dedup.fingerprintIndex(hist, "text")
    val store = java.nio.file.Files
      .createTempDirectory("gcache-idx").toString
    graft.sinks.FingerprintIndexStore.write(idx, store)
    val loaded = graft.sinks.FingerprintIndexStore.load(spark, store, "fp")
    val batch = (25 to 40).map(i => (1000L + i, s"doc number $i unique"))
      .toDF("doc_id", "text")
    val out = Dedup.dedupAgainstIndexBloom(batch, loaded.keys, "text",
      "doc_id", loaded.bloom)
    // 25..30 repeat history; 31..40 are novel
    assert(out.count() == 10)
    val mine = GraftCaches.liveCount
    assert(mine >= 1, "sliver persist not registered")
    // a FOREIGN session's release must be a no-op on this session's
    // caches — the exact cross-pipeline drop the overload exists to
    // prevent (a regression to clear-everything would pass a
    // single-session test silently)
    GraftCaches.release(spark.newSession())
    assert(GraftCaches.liveCount == mine,
      "a foreign session's release dropped this session's caches")
    assert(!cacheEmpty)
    // and this session's scoped release drains them
    GraftCaches.release(spark)
    assert(GraftCaches.liveCount == 0)
    assert(cacheEmpty, "bloom sliver cache survived release(spark)")
  }
}
