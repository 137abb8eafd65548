package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.providers.{PhotonProvider, Registry}

/** Photon OS pipeline (reference `providers/photon/parser.py` —
  * per-version CVE JSON + PHSA wiki markdown, NOT OSV): BDSA skip,
  * Not-Affected drop, res_ver sentinel, CVSS-threshold severity,
  * earliest-advisory-wins wiki join. */
class PhotonSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def res(p: String) = getClass.getResource(p).getPath

  private lazy val env = PhotonProvider.envelopes(spark,
    res("/fixtures/photon") + "/cve_data_photon*.json",
    res("/fixtures/photon/wiki")).cache()

  private def item(id: String): String =
    env.filter(col("identifier") === id).head().getAs[String]("item")

  test("registry maps photon to its own family, not osv") {
    val spec = Registry.byName("photon")
    assert(spec.family == "photon" && spec.source == "json+wiki-md")
  }

  test("records: BDSA skipped, all-dropped CVEs absent, versions from filenames") {
    import spark.implicits._
    val ids = env.select("identifier").as[String].collect().toSet
    assert(ids == Set(
      "photon:4.0/cve-2025-0101", "photon:4.0/cve-2025-0202",
      "photon:4.0/cve-2025-0404", "photon:5.0/cve-2025-0101"))
  }

  test("multi-package CVE: NA sentinel, advisory decorates only fixed entries") {
    val it = item("photon:4.0/cve-2025-0101")
    assert(it.contains("\"Name\":\"openssl\"") &&
      it.contains("\"Name\":\"openssl-fips\""))
    assert(it.contains("\"Version\":\"3.0.1-1\"") &&
      it.contains("\"Version\":\"None\""))
    assert(it.contains("\"VersionFormat\":\"rpm\""))
    // wiki advisory: VendorAdvisory + Available + Metadata.Issued
    assert(it.contains("\"ID\":\"PHSA-2025-4.0-0500\""))
    assert(it.contains(
      "https://github.com/vmware/photon/wiki/Security-Updates-4.0-500"))
    assert(it.contains("\"Date\":\"2025-02-01\"") &&
      it.contains("\"Kind\":\"advisory\""))
    assert(it.contains("\"Issued\":\"2025-02-01\""))
    // the unfixed (None) entry never gains an Available date
    val fips = it.substring(it.indexOf("\"Name\":\"openssl-fips\"") - 200,
      it.indexOf("\"Name\":\"openssl-fips\""))
    assert(!fips.contains("Available"))
    assert(it.contains("\"Severity\":\"Critical\""))
    assert(it.contains(
      "\"Link\":\"https://www.cve.org/CVERecord?id=CVE-2025-0101\""))
  }

  test("no advisory: defaulted VendorAdvisory, no Available/Issued; " +
      "score thresholds") {
    val it = item("photon:4.0/cve-2025-0202")
    // the FixedIn dataclass defaults VendorAdvisory to the no-advisory
    // stub even when no advisory exists (`utils/vulnerability.py:100-103`)
    assert(it.contains(
      "\"VendorAdvisory\":{\"AdvisorySummary\":[],\"NoAdvisory\":false}"))
    assert(!it.contains("Available") && !it.contains("\"Issued\""))
    assert(it.contains("\"Metadata\":{}"))
    assert(it.contains("\"Severity\":\"Medium\""))
    val neg = item("photon:4.0/cve-2025-0404")
    assert(neg.contains("\"Severity\":\"Negligible\""))
  }

  test("earliest advisory wins per (version, cve); null score → Unknown") {
    val it = item("photon:5.0/cve-2025-0101")
    assert(it.contains("\"ID\":\"PHSA-2025-5.0-0002\""))
    assert(it.contains("\"Date\":\"2025-03-05\""))
    assert(it.contains("\"Severity\":\"Unknown\""))
    assert(it.contains("\"NamespaceName\":\"photon:5.0\""))
  }

  test("wiki gates: non-advisory filenames and id-less pages ignored") {
    val adv = PhotonProvider.advisories(spark, res("/fixtures/photon/wiki"))
    import spark.implicits._
    val ids = adv.select(col("advisory").getField("advisory_id"))
      .as[String].collect().toSet
    // Home.md (bad filename) and Security-Updates-4.0-999.md (no id) out
    assert(ids == Set("PHSA-2025-4.0-0500", "PHSA-2025-5.0-0002"))
  }

  test("golden snapshots byte-match") {
    Golden.assertSnapshots("photon", env)
  }
}
