package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.providers.{Registry, SlesProvider}

/** SLES OVAL pipeline (reference `providers/sles/parser.py` +
  * `utils/oval_v2.py` criteria traversal): impact groups, per-version
  * namespace resolution, sles-release-over-ltss conflict resolution,
  * not-affected NAK emission, CVSS extraction from advisory cve
  * attributes. */
class SlesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def fixture =
    getClass.getResource("/fixtures/sles_oval.xml").getPath

  private lazy val env = {
    val s = spark
    import s.implicits._
    // first-observed dimension → Available in the golden bytes
    val fixdates = Seq(
      ("CVE-2025-5353", "curl", "8.0.1-1.1", "2025-06-14",
        "first-observed")
    ).toDF("vuln", "pkg", "version", "date", "kind")
    SlesProvider.envelopes(spark, fixture, "15", Some(fixdates)).cache()
  }

  private def item(id: String): String =
    env.filter(col("identifier") === id).head().getAs[String]("item")

  test("registry maps sles through the oval family") {
    assert(Registry.byName("sles").family == "oval")
  }

  test("impact groups resolve to per-version namespaces; major filter applies") {
    import spark.implicits._
    val ids = env.select("identifier").as[String].collect().toSet
    // def1 lands on 15.4 (sles-release) AND 15.1 (ltss); its 12.5 group
    // is outside the major; def2 resolves its 15.4 conflict; def3's
    // 3-child group is skipped whole (the reference's bail-out)
    assert(ids == Set("sles:15.4/cve-2025-4242", "sles:15.1/cve-2025-4242",
      "sles:15.4/cve-2025-5353"))
  }

  test("affected + not-affected: fix EVR FixedIn plus version-0 NAK") {
    val it = item("sles:15.4/cve-2025-4242")
    assert(it.contains("\"Name\":\"sqlite3\"") &&
      it.contains("\"Version\":\"3.36.0-3.12.1\""))
    assert(it.contains("\"Name\":\"sqlite3-doc\"") &&
      it.contains("\"Version\":\"0\""))
    assert(it.contains("\"VersionFormat\":\"rpm\""))
    assert(it.contains("\"Severity\":\"High\""))
    assert(it.contains("\"NamespaceName\":\"sles:15.4\""))
    assert(it.contains(
      "\"Link\":\"https://www.suse.com/security/cve/CVE-2025-4242/\""))
    // description trimmed
    assert(it.contains("\"Description\":\"Buffer overflow in sqlite3.\""))
    // the LTSS sibling namespace carries the same artifact set
    val ltss = item("sles:15.1/cve-2025-4242")
    assert(ltss.contains("\"NamespaceName\":\"sles:15.1\"") &&
      ltss.contains("\"Version\":\"3.36.0-3.12.1\""))
  }

  test("CVSS from cvss3 attributes: score prefix stripped, malformed dropped") {
    val it = item("sles:15.4/cve-2025-4242")
    assert(it.contains(
      "\"vector_string\":\"CVSS:3.1/AV:N/AC:L/PR:N/UI:N/S:U/C:H/I:N/A:N\""))
    assert(it.contains("\"base_score\":7.5") &&
      it.contains("\"base_severity\":\"High\"") &&
      it.contains("\"version\":\"3.1\""))
    assert(it.contains("\"status\":\"N/A\""))
    // exactly one CVSS record — the bogus vector was dropped
    assert(it.split("\"vector_string\"").length == 2)
  }

  test("release resolver: sles-release beats sles-ltss-release on conflict") {
    val it = item("sles:15.4/cve-2025-5353")
    // the winning feed carries the sles-release group's artifact
    assert(it.contains("\"Version\":\"8.0.1-1.1\""))
    assert(!it.contains("7.9.9-0.9"))
    assert(it.contains("\"Severity\":\"Medium\""))
    // no valid vectors → empty CVSS list
    assert(it.contains("\"CVSS\":[]"))
  }

  test("golden snapshots byte-match") {
    Golden.assertSnapshots("sles", env)
  }
}
