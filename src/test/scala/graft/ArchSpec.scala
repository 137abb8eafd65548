package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.providers.{ArchProvider, Registry}

/** Arch security-tracker pipeline (reference `providers/arch/parser.py`
  * — flat AVG JSON, NOT OSV): Not-affected skip, identity severity map,
  * pacman FixedIn, earliest-ASA-date fix availability, CVE/advisory
  * metadata. */
class ArchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def res(p: String) = getClass.getResource(p).getPath

  private lazy val env = ArchProvider.envelopes(spark,
    res("/fixtures/arch_all.json"),
    res("/fixtures/arch_asa_dates.json")).cache()

  private def item(id: String): String =
    env.filter(col("identifier") === id).head().getAs[String]("item")

  test("registry maps arch to its own tracker family, not osv") {
    val spec = Registry.byName("arch")
    assert(spec.family == "arch" && spec.source == "tracker-json")
  }

  test("Not-affected and nameless records are skipped") {
    import spark.implicits._
    val ids = env.select("identifier").as[String].collect().toSet
    assert(ids == Set("arch:rolling/avg-1001", "arch:rolling/avg-1003",
      "arch:rolling/avg-1004"))
  }

  test("fixed record: pacman FixedIn per package, earliest ASA date wins") {
    val it = item("arch:rolling/avg-1001")
    assert(it.contains("\"Name\":\"openssl\"") &&
      it.contains("\"Name\":\"openssl-libs\""))
    assert(it.contains("\"VersionFormat\":\"pacman\"") &&
      it.contains("\"Version\":\"3.2.1-1\""))
    // min(2025-01-20, 2025-01-18) across the record's advisories
    assert(it.contains("\"Date\":\"2025-01-18\"") &&
      it.contains("\"Kind\":\"advisory\""))
    // metadata: CVE links + advisory ids
    assert(it.contains(
      "\"Link\":\"https://nvd.nist.gov/vuln/detail/CVE-2025-1111\""))
    assert(it.contains("\"Advisories\":[\"ASA-202501-1\",\"ASA-202501-2\"]"))
    assert(it.contains("\"Severity\":\"High\""))
    assert(it.contains(
      "\"Link\":\"https://security.archlinux.org/AVG-1001\""))
  }

  test("unfixed record: None sentinel, unknown severity, description fallback") {
    val it = item("arch:rolling/avg-1003")
    assert(it.contains("\"Version\":\"None\""))
    assert(!it.contains("Available"))
    assert(it.contains("\"Severity\":\"Unknown\""))
    assert(it.contains("\"Description\":\"Arch vulnerability AVG-1003\""))
    // no issues/advisories → metadata fields dropped entirely
    assert(!it.contains("Advisories") && !it.contains("\"CVE\""))
  }

  test("fixed but no ASA date staged: no Available; empty package filtered") {
    val it = item("arch:rolling/avg-1004")
    assert(it.contains("\"Version\":\"8.6.0-1\""))
    assert(!it.contains("Available"))
    // the "" entry in packages never becomes a FixedIn
    assert(it.split("\"Name\":\"curl\"").length == 2)
    assert(!it.contains("\"Name\":\"\""))
  }

  test("golden snapshots byte-match") {
    Golden.assertSnapshots("arch", env)
  }
}
