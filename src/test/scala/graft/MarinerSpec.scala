package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.providers.{MarinerProvider, Registry}

/** CBL-Mariner pipeline (reference `providers/mariner/parser.py` — its
  * own prefixed OVAL dialect): patchable gate, VulnerableRange
  * synthesis from EVR bounds, last-less-than fixed version, advisory
  * date availability. */
class MarinerSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def fixture =
    getClass.getResource("/fixtures/mariner_oval.xml").getPath

  private lazy val env =
    MarinerProvider.envelopes(spark, fixture, "2.0").cache()

  private def item(id: String): String =
    env.filter(col("identifier") === id).head().getAs[String]("item")

  test("registry maps mariner to its own dialect family") {
    assert(Registry.byName("mariner").family == "mariner")
  }

  test("patchable Not Applicable and severity-less definitions are skipped") {
    import spark.implicits._
    val ids = env.select("identifier").as[String].collect().toSet
    assert(ids == Set("mariner:2.0/cve-2025-8101",
      "mariner:2.0/cve-2025-8303", "mariner:2.0/cve-2025-8404"))
  }

  test("range bounds: descending order, less-than bound becomes the fix") {
    val it = item("mariner:2.0/cve-2025-8101")
    assert(it.contains(
      "\"VulnerableRange\":\"> 0:1.19.0.cm2, < 0:1.20.7-1.cm2\""))
    assert(it.contains("\"Version\":\"0:1.20.7-1.cm2\""))
    assert(it.contains("\"Name\":\"golang\""))
    assert(it.contains("\"VersionFormat\":\"rpm\""))
    // no advisory_date → no Available (first-observed composes later)
    assert(!it.contains("Available"))
    assert(it.contains("\"Severity\":\"Critical\""))
  }

  test("advisory date becomes the Available candidate when fixed") {
    val it = item("mariner:2.0/cve-2025-8303")
    assert(it.contains("\"Date\":\"2025-05-03\"") &&
      it.contains("\"Kind\":\"advisory\""))
    assert(it.contains("\"Version\":\"0:8.0.33-1.cm2\""))
  }

  test("only a less-than-or-equal bound: Version None, no Available") {
    val it = item("mariner:2.0/cve-2025-8404")
    assert(it.contains("\"VulnerableRange\":\"<= 0:9.16.33-1.cm2\""))
    assert(it.contains("\"Version\":\"None\""))
    assert(!it.contains("Available"))
  }

  test("golden snapshots byte-match") {
    Golden.assertSnapshots("mariner", env)
  }
}
