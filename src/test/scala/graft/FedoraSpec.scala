package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.providers.{FedoraProvider, Registry}

/** Fedora Bodhi pipeline (VERDICT r2 item 8; reference
  * `providers/fedora/parser.py` — Bodhi REST, NOT OSV): severity map,
  * security-bug CVE extraction with display_name fallback, NVR parse,
  * per-CVE records merged across updates. */
class FedoraSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fixture =
    getClass.getResource("/fixtures/fedora_bodhi.json").getPath

  private lazy val env = FedoraProvider.envelopes(spark, fixture).cache()

  private def item(id: String): String =
    env.filter(col("identifier") === id).head().getAs[String]("item")

  test("registry maps fedora to its own bodhi family, not osv") {
    val spec = Registry.byName("fedora")
    assert(spec.family == "fedora" && spec.source == "bodhi-json")
  }

  test("advisory validity: aliasless, non-numeric release, packageless dropped") {
    val adv = FedoraProvider.advisories(spark, fixture)
    val ids = adv.select("advisory_id").as[String].collect().toSet
    assert(ids == Set("FEDORA-2025-aaa1111111", "FEDORA-2025-bbb2222222",
      "FEDORA-2025-ccc3333333"))
    val ids2 = env.select("identifier").as[String].collect().toSet
    assert(ids2 == Set("fedora:40/cve-2025-1234", "fedora:40/cve-2025-5678",
      "fedora:40/fedora-2025-ccc3333333"))
  }

  test("CVEs from security bugs only; non-security bug titles ignored") {
    // CVE-2025-9999 appears only in a security=false bug → no record
    assert(env.filter(col("identifier").contains("9999")).isEmpty)
    val it = item("fedora:40/cve-2025-1234")
    assert(it.contains("\"Name\":\"CVE-2025-1234\""))
  }

  test("same-CVE records merge FixedIn across updates, first alias wins attrs") {
    val it = item("fedora:40/cve-2025-1234")
    // python3-docs (from aaa) AND curl (from bbb, display_name fallback)
    assert(it.contains("\"Name\":\"python3-docs\"") &&
      it.contains("\"Name\":\"curl\""))
    // aaa's FixedIn precedes bbb's (alias order)
    assert(it.indexOf("python3-docs") < it.indexOf("\"curl\""))
    // attributes from the first (lowest) alias: moderate → Medium
    assert(it.contains("\"Severity\":\"Medium\""))
    assert(it.contains("FEDORA-2025-aaa1111111"))
    // missing epoch → 0: NVR parse with dashes in name
    assert(it.contains("\"Version\":\"0:3.12.9-1.fc40\""))
    // Available from date_stable (advisory candidate)
    assert(it.contains("\"Date\":\"2025-01-15\"") &&
      it.contains("\"Kind\":\"advisory\""))
    // non-rpm module build never becomes a package
    assert(!it.contains("nodejs"))
  }

  test("urgent → Critical on the single-CVE record") {
    val it = item("fedora:40/cve-2025-5678")
    assert(it.contains("\"Severity\":\"Critical\""))
    assert(it.contains("\"Version\":\"0:8.6.0-2.fc40\""))
  }

  test("no CVEs anywhere → advisory-id record, empty severity → Unknown") {
    val it = item("fedora:40/fedora-2025-ccc3333333")
    assert(it.contains("\"Name\":\"FEDORA-2025-ccc3333333\""))
    assert(it.contains("\"Severity\":\"Unknown\""))
    // null url → synthesized bodhi link
    assert(it.contains(
      "https://bodhi.fedoraproject.org/updates/FEDORA-2025-ccc3333333"))
    // empty date_stable → no Available
    assert(!it.contains("Available"))
  }
}
