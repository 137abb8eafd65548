package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.providers.GhsaProvider

class GhsaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def fixture = getClass.getResource("/fixtures/ghsa.json").getPath
  private lazy val rows = GhsaProvider.advisories(spark, fixture).collect()

  test("S3 cursor step: endCursor while hasNextPage, None at last page") {
    assert(GhsaProvider.nextCursor(spark, fixture)
      .contains("Y3Vyc29yOjEwMA=="))
    assert(GhsaProvider.nextCursor(spark,
      getClass.getResource("/fixtures/ghsa_lastpage.json").getPath).isEmpty)
  }

  test("ecosystem allow-list: mapped kept, unmapped (ERLANG) dropped") {
    val ecos = rows.map(_.getAs[String]("ecosystem")).toSet
    assert(ecos == Set("npm", "python"))
    assert(!rows.exists(_.getAs[String]("pkg") == "some-lib"))
  }

  test("severity MODERATE → Medium; CVE id extracted when present") {
    val lodash = rows.find(_.getAs[String]("pkg") == "lodash").get
    assert(lodash.getAs[String]("severity") == "Medium")
    assert(lodash.getAs[String]("cve") == "CVE-2023-7777")
    // advisory with no CVE identifier → null cve, still emitted
    val req = rows.find(_.getAs[String]("pkg") == "requests").get
    assert(req.getAs[String]("cve") == null)
    assert(req.getAs[String]("severity") == "Critical")
  }

  test("CVSS scored from vector (trailing slash tolerated); empty → null") {
    val lodash = rows.find(_.getAs[String]("pkg") == "lodash").get
    val cvss = lodash.getAs[org.apache.spark.sql.Row]("cvss")
    assert(cvss.getAs[Double]("baseScore") == 6.5)
    assert(cvss.getAs[String]("baseSeverity") == "Medium")
    val req = rows.find(_.getAs[String]("pkg") == "requests").get
    assert(req.getAs[org.apache.spark.sql.Row]("cvss") == null)
  }

  test("CVSS v4 pass-through: validated vector kept (trailing slash " +
      "stripped), malformed → null, no score computed") {
    val lodash = rows.find(_.getAs[String]("pkg") == "lodash").get
    val v4 = lodash.getAs[org.apache.spark.sql.Row]("cvss_v4")
    assert(v4.getAs[String]("version") == "4.0")
    assert(v4.getAs[String]("vector") ==
      "CVSS:4.0/AV:N/AC:L/AT:N/PR:N/UI:N/VC:L/VI:L/VA:N/SC:N/SI:N/SA:N")
    val req = rows.find(_.getAs[String]("pkg") == "requests").get
    assert(req.getAs[org.apache.spark.sql.Row]("cvss_v4") == null)
  }

  test("range + fixed version surfaced per package") {
    val lodash = rows.find(_.getAs[String]("pkg") == "lodash").get
    // comma stripped at parse, matching the reference record shape
    // (`providers/github/parser.py:730`)
    assert(lodash.getAs[String]("range") == ">= 1.0.0 < 4.17.21")
    assert(lodash.getAs[String]("fixed_in") == "4.17.21")
    val req = rows.find(_.getAs[String]("pkg") == "requests").get
    assert(req.getAs[String]("fixed_in") == null)
  }
}
