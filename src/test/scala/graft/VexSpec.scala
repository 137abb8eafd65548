package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.providers.VexProvider

class VexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fixture(name: String): String =
    getClass.getResource(s"/fixtures/$name").getPath

  test("CSAF-VEX product_status flattens into (cve, product, status) rows") {
    val rows = VexProvider.csafStatusRows(spark, fixture("csaf_vex.json"))
      .collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(3))).toSet
    assert(rows == Set(
      ("CVE-2024-1111", "pkg-a-1.2.3", "fixed"),
      ("CVE-2024-1111", "pkg-b-2.0.0", "fixed"),
      ("CVE-2024-1111", "pkg-c-0.9.0", "known_affected"),
      ("CVE-2024-1111", "pkg-d-3.1.4", "known_not_affected"),
      ("CVE-2024-2222", "pkg-a-1.2.3", "under_investigation")))
  }

  test("OpenVEX statements flatten per product") {
    val rows = VexProvider.openVexRows(spark, fixture("openvex.json"))
      .collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(3))).toSet
    assert(rows == Set(
      ("CVE-2024-1111", "pkg:maven/org.example/lib-a@1.0", "not_affected"),
      ("CVE-2024-2222", "pkg:maven/org.example/lib-a@1.0", "affected"),
      ("CVE-2024-2222", "pkg:maven/org.example/lib-b@2.0", "affected")))
  }

  test("wont-fix overlay stamps only VEX-marked (cve, product) pairs (J5)") {
    val facts = Seq(
      ("CVE-2024-1111", "pkg:maven/org.example/lib-a@1.0"),
      ("CVE-2024-2222", "pkg:maven/org.example/lib-a@1.0"),
      ("CVE-2024-3333", "pkg:maven/org.example/lib-c@1.0")
    ).toDF("cve", "product")
    val vex = VexProvider.openVexRows(spark, fixture("openvex.json"))
      .select(col("vuln").as("cve"), col("product"), col("status"))
    val stamped = VexProvider.stampWontFix(facts, vex).collect()
      .map(r => (r.getString(0), r.getBoolean(r.fieldIndex("wont_fix")))).toMap
    assert(stamped == Map(
      "CVE-2024-1111" -> true,   // not_affected in VEX
      "CVE-2024-2222" -> false,  // affected, not a wont-fix mark
      "CVE-2024-3333" -> false)) // not in VEX at all
  }
}
