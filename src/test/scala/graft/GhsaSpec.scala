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

  test("ecosystem allow-list: reference map applied (MAVEN→java), " +
      "unmapped future enum values dropped") {
    val ecos = rows.map(_.getAs[String]("ecosystem")).toSet
    assert(ecos == Set("npm", "java", "python"))
    assert(!rows.exists(_.getAs[String]("pkg") == "some-lib"),
      "FUTURE_ECO is not in the parser.py:42-55 map — its row drops")
  }

  test("severity MODERATE → Medium; CVE alias list by value prefix") {
    val lodash = rows.find(_.getAs[String]("pkg") == "lodash").get
    assert(lodash.getAs[String]("severity") == "Medium")
    assert(lodash.getSeq[String](lodash.fieldIndex("cves"))
      == Seq("CVE-2023-7777"))
    // advisory whose only identifier is the GHSA id → EMPTY list (the
    // reference emits "CVE": []), still emitted
    val req = rows.find(_.getAs[String]("pkg") == "requests").get
    assert(req.getSeq[String](req.fieldIndex("cves")).isEmpty)
    assert(req.getAs[String]("severity") == "Critical")
  }

  test("CVSS v3 scored from cvssSeverities vector (trailing slash " +
      "stripped); empty vector → null") {
    val lodash = rows.find(_.getAs[String]("pkg") == "lodash").get
    val cvss = lodash.getAs[org.apache.spark.sql.Row]("cvss")
    assert(cvss.getAs[Double]("baseScore") == 6.5)
    assert(cvss.getAs[String]("baseSeverity") == "Medium")
    assert(lodash.getAs[String]("v3_vector")
      == "CVSS:3.1/AV:N/AC:L/PR:N/UI:N/S:U/C:L/I:L/A:N")
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

  test("classification default GENERAL; MALWARE and withdrawn carried") {
    val lodash = rows.find(_.getAs[String]("pkg") == "lodash").get
    assert(lodash.getAs[String]("classification") == "GENERAL")
    assert(lodash.getAs[String]("withdrawn") == null)
    val req = rows.find(_.getAs[String]("pkg") == "requests").get
    assert(req.getAs[String]("classification") == "MALWARE")
    assert(req.getAs[String]("withdrawn") == "2023-04-01T00:00:00Z")
  }

  test("envelope: Advisory wrapper with reference record keys; one " +
      "envelope per (advisory, ecosystem); MAVEN lands in github:java") {
    import spark.implicits._
    val env = GhsaProvider.envelopes(GhsaProvider.advisories(spark, fixture))
      .collect().map(r => r.getAs[String]("identifier")
        -> r.getAs[String]("item")).toMap
    assert(env.keySet == Set(
      "github:npm/ghsa-aaaa-bbbb-cccc",
      "github:java/ghsa-aaaa-bbbb-cccc",
      "github:python/ghsa-dddd-eeee-ffff"))
    val npm = env("github:npm/ghsa-aaaa-bbbb-cccc")
    assert(npm.contains("\"Advisory\"") && npm.contains("\"Vulnerability\":{}"))
    // lower-case FixedIn record keys, per-ecosystem filter applied
    assert(npm.contains("\"name\":\"lodash\"")
      && !npm.contains("lodash-shim"))
    assert(npm.contains("\"namespace\":\"github:npm\""))
    assert(npm.contains("\"identifier\":\"4.17.21\""))
    // CVE list + Metadata duplicate, legacy CVSS object, v3+v4 summary
    assert(npm.contains("\"CVE\":[\"CVE-2023-7777\"]")
      && npm.contains("\"Metadata\":{\"CVE\":[\"CVE-2023-7777\"]}"))
    assert(npm.contains("\"base_score\":6.5")
      && npm.contains("\"status\":\"N/A\""))
    assert(npm.contains("\"cvss_severities\"")
      && npm.contains("\"version\":\"3.1\"")
      && npm.contains("\"version\":\"4.0\""))
    val java = env("github:java/ghsa-aaaa-bbbb-cccc")
    assert(java.contains("lodash-shim")
      && java.contains("\"namespace\":\"github:java\""))
    // no-CVE advisory: empty lists, no legacy CVSS, withdrawn carried
    val py = env("github:python/ghsa-dddd-eeee-ffff")
    assert(py.contains("\"CVE\":[]"))
    assert(!py.contains("\"CVSS\":{"))
    assert(py.contains("\"identifier\":\"None\""))
    assert(py.contains("\"withdrawn\":\"2023-04-01T00:00:00Z\""))
    assert(py.contains("\"Classification\":\"MALWARE\""))
  }

  test("fix-date dimension attaches available {date, kind} to the " +
      "matched FixedIn row only; unfixed rows never match") {
    import spark.implicits._
    val fixdates = Seq(
      ("GHSA-aaaa-bbbb-cccc", "lodash", "npm", "4.17.21",
        "2023-02-03", "first-observed"),
      // requests has no published fix (identifier None) → finder
      // semantics say no date even if a row exists
      ("GHSA-dddd-eeee-ffff", "requests", "python", "None",
        "2023-03-05", "advisory")
    ).toDF("vuln", "pkg", "ecosystem", "version", "date", "kind")
    val env = GhsaProvider.envelopes(
      GhsaProvider.advisories(spark, fixture), Some(fixdates))
      .collect().map(r => r.getAs[String]("identifier")
        -> r.getAs[String]("item")).toMap
    val npm = env("github:npm/ghsa-aaaa-bbbb-cccc")
    assert(npm.contains(
      "\"available\":{\"date\":\"2023-02-03\",\"kind\":\"first-observed\"}"),
      s"available record missing: $npm")
    assert(!env("github:java/ghsa-aaaa-bbbb-cccc").contains("available"),
      "the java ecosystem's row has its own (absent) date")
    assert(!env("github:python/ghsa-dddd-eeee-ffff").contains("available"),
      "a None fix version must not gain a date (finder.py:149-151)")
  }
}
