package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.providers.{EchoProvider, Registry}

/** Echo pipeline (reference `providers/echo/parser.py` — a
  * package→cve map-of-maps, NOT secdb): pivot to per-CVE records,
  * TEMP- skip, dpkg FixedIn with verbatim versions. */
class EchoSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private lazy val env = {
    val s = spark
    import s.implicits._
    // first-observed dimension → Available in the golden bytes
    val fixdates = Seq(
      ("CVE-2025-7001", "openssl", "3.0.15-1", "2025-05-02",
        "first-observed")
    ).toDF("vuln", "pkg", "version", "date", "kind")
    EchoProvider.envelopes(spark,
      getClass.getResource("/fixtures/echo_data.json").getPath,
      Some(fixdates)).cache()
  }

  private def item(id: String): String =
    env.filter(col("identifier") === id).head().getAs[String]("item")

  test("registry maps echo to its own map-pivot family, not secdb") {
    val spec = Registry.byName("echo")
    assert(spec.family == "echo" && spec.source == "pkg-cve-map-json")
  }

  test("map pivots to per-CVE records; TEMP ids skipped") {
    import spark.implicits._
    val ids = env.select("identifier").as[String].collect().toSet
    assert(ids == Set("echo:rolling/cve-2025-7001",
      "echo:rolling/cve-2025-7002", "echo:rolling/cve-2025-7003"))
  }

  test("multi-package CVE: FixedIn per package, canonical order, min-pkg severity") {
    val it = item("echo:rolling/cve-2025-7001")
    assert(it.contains("\"Name\":\"openssl\"") && it.contains("\"Name\":\"curl\""))
    assert(it.indexOf("\"curl\"") < it.indexOf("\"openssl\""))
    assert(it.contains("\"Version\":\"3.0.15-1\"") &&
      it.contains("\"Version\":\"8.9.0-2\""))
    assert(it.contains("\"VersionFormat\":\"dpkg\""))
    // severity from min package name (curl) — Critical
    assert(it.contains("\"Severity\":\"Critical\""))
    assert(it.contains(
      "\"Link\":\"https://www.cve.org/CVERecord?id=CVE-2025-7001\""))
  }

  test("unfixed entries keep the verbatim empty version; defaults apply") {
    val it = item("echo:rolling/cve-2025-7002")
    assert(it.contains("\"Version\":\"\""))
    val bare = item("echo:rolling/cve-2025-7003")
    assert(bare.contains("\"Severity\":\"Unknown\"") &&
      bare.contains("\"Version\":\"\""))
  }

  test("golden snapshots byte-match") {
    Golden.assertSnapshots("echo", env)
  }
}
