package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.{Catalog, ResultStore}
import graft.streaming.Incremental
import java.time.{Duration, Instant}

/** Incremental semantics (I1/I2/I5), fragment sink (K4/I6), catalog
  * (§3.4), distribution pick (W3). */
class IncrementalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("watermark: absent/stale/expired state forces full scan (I1+I2)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-state").toString
    val now = Instant.parse("2024-06-01T00:00:00Z")
    assert(Incremental.effectiveWatermark(dir, "nvd", now).isEmpty)

    Incremental.writeState(dir,
      Incremental.RunState("nvd", Instant.parse("2024-05-01T00:00:00Z"), stale = false))
    assert(Incremental.effectiveWatermark(dir, "nvd", now)
      .contains(Instant.parse("2024-05-01T00:00:00Z")))

    // stale flag → full scan
    Incremental.writeState(dir,
      Incremental.RunState("nvd", Instant.parse("2024-05-01T00:00:00Z"), stale = true))
    assert(Incremental.effectiveWatermark(dir, "nvd", now).isEmpty)

    // 120-day expiry → full scan
    Incremental.writeState(dir,
      Incremental.RunState("nvd", Instant.parse("2024-01-01T00:00:00Z"), stale = false))
    assert(Incremental.effectiveWatermark(dir, "nvd", now,
      Duration.ofDays(120)).isEmpty)
  }

  test("processing set = fresh source keys ∪ changed-dimension keys (I5)") {
    val source = Seq(
      ("cve-1", "2024-05-10"), ("cve-2", "2024-04-01"), ("cve-3", "2024-03-01")
    ).toDF("id", "d").withColumn("modified", col("d").cast("timestamp")).drop("d")
    val changedDims = Seq("cve-3").toDF("id")
    val wm = Some(Instant.parse("2024-05-01T00:00:00Z"))
    val got = Incremental.processingSet(source, "id", "modified", wm, changedDims)
      .select("id").as[String].collect().toSet
    // cve-1 fresh, cve-3 dimension-driven, cve-2 skipped
    assert(got == Set("cve-1", "cve-3"))
  }

  test("fragment sink overwrites only touched partitions (K4/I6)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-frag").toString + "/frags"
    val full = Seq(("a", "eco1", "v1"), ("b", "eco2", "v1"))
      .toDF("identifier", "eco", "item")
    ResultStore.writeFragments(full, dir, "eco")
    // second write touches only eco1 — eco2 must stay frozen
    val delta = Seq(("a", "eco1", "v2")).toDF("identifier", "eco", "item")
    ResultStore.writeFragments(delta, dir, "eco")
    val out = spark.read.parquet(dir)
      .select("identifier", "eco", "item").as[(String, String, String)]
      .collect().toSet
    assert(out == Set(("a", "eco1", "v2"), ("b", "eco2", "v1")))
  }

  test("catalog status lists committed stores with digests (§3.4)") {
    val root = java.nio.file.Files.createTempDirectory("graft-cat").toString
    val env = Seq(("x", "s", "1")).toDF("identifier", "schema", "item")
    ResultStore.commit(spark, env, s"$root/wolfi")
    ResultStore.commit(spark, env.union(env.withColumn("identifier", lit("y"))),
      s"$root/alpine")
    val rows = Catalog.status(spark, root).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(rows == Map("alpine" -> 2L, "wolfi" -> 1L))
  }

  test("distribution: latest entry per schema version (W3)") {
    val listing = Seq(
      ("1", "2024-01-01", "u1", "c1"), ("1", "2024-03-01", "u2", "c2"),
      ("2", "2024-02-01", "u3", "c3")
    ).toDF("schema_version", "built", "url", "checksum")
    val got = Catalog.latestPerVersion(listing).collect()
      .map(r => r.getString(0) -> r.getAs[String]("url")).toMap
    assert(got == Map("1" -> "u2", "2" -> "u3"))
  }

  test("I7 retry policy: RETRY(n) succeeds on a later attempt") {
    import graft.streaming.JobControl
    var calls = 0
    val out = JobControl.run(JobControl.Retry(3)) { () =>
      calls += 1
      if (calls < 3) sys.error("transient")
      "ok"
    }
    assert(out.result.contains("ok") && out.attempts == 3)
  }

  test("I7 retry policy: exhaustion falls back to SKIP with disposal") {
    import graft.streaming.JobControl
    var disposed = false
    val out = JobControl.run(
      JobControl.Retry(2, onExhausted = JobControl.Skip),
      dispose = () => disposed = true) { () =>
      sys.error("permanent"): String
    }
    assert(!out.succeeded && out.attempts == 3 && disposed)
    assert(out.error.exists(_.getMessage == "permanent"))
  }

  test("I7 retry policy: FAIL propagates after disposal") {
    import graft.streaming.JobControl
    var disposed = false
    val e = intercept[RuntimeException] {
      JobControl.run(JobControl.Fail, dispose = () => disposed = true) {
        () => sys.error("boom"): String
      }
    }
    assert(e.getMessage == "boom" && disposed)
  }

  test("S11 repo scan: recursive glob read over a worktree layout") {
    import graft.sources.Sources
    val root = java.nio.file.Files.createTempDirectory("repo").toFile
    val sub = new java.io.File(root, "osv/cve/2023"); sub.mkdirs()
    java.nio.file.Files.writeString(
      new java.io.File(sub, "CVE-2023-1.json").toPath,
      """{"id":"CVE-2023-1","summary":"a"}""")
    java.nio.file.Files.writeString(
      new java.io.File(root, "osv/cve/README.md").toPath, "not json")
    java.nio.file.Files.writeString(
      new java.io.File(sub, "CVE-2023-2.json").toPath,
      """{"id":"CVE-2023-2","summary":"b"}""")
    val df = Sources.repoJson(spark, root.getAbsolutePath)
    val rows = df.select("id").collect().map(_.getString(0)).sorted
    assert(rows.toSeq == Seq("CVE-2023-1", "CVE-2023-2"))
    assert(df.columns.contains("source_path"))
  }
}
