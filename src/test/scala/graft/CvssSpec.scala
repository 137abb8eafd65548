package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Cvss

/** CVSS v3.1 base-score arithmetic against published scored vectors
  * (values verifiable against the FIRST calculator / NVD entries). */
class CvssSpec extends AnyFunSuite {

  // (vector, base, exploitability(0.1q), impact(0.1q), severity)
  val cases = Seq(
    ("CVSS:3.1/AV:N/AC:L/PR:N/UI:N/S:U/C:H/I:H/A:H", 9.8, 3.9, 5.9, "Critical"),
    ("CVSS:3.1/AV:N/AC:L/PR:N/UI:N/S:C/C:H/I:H/A:H", 10.0, 3.9, 6.0, "Critical"),
    ("CVSS:3.1/AV:L/AC:L/PR:L/UI:N/S:U/C:H/I:H/A:H", 7.8, 1.8, 5.9, "High"),
    ("CVSS:3.1/AV:N/AC:L/PR:N/UI:R/S:C/C:L/I:L/A:N", 6.1, 2.8, 2.7, "Medium"),
    ("CVSS:3.1/AV:N/AC:H/PR:N/UI:N/S:U/C:L/I:N/A:N", 3.7, 2.2, 1.4, "Low"),
    ("CVSS:3.1/AV:N/AC:L/PR:N/UI:N/S:U/C:N/I:N/A:N", 0.0, 3.9, 0.0, "None"),
    ("CVSS:3.0/AV:N/AC:L/PR:N/UI:N/S:U/C:H/I:H/A:H", 9.8, 3.9, 5.9, "Critical"),
    // trailing slash stripped (reference removesuffix behavior)
    ("CVSS:3.1/AV:N/AC:L/PR:N/UI:N/S:U/C:H/I:H/A:H/", 9.8, 3.9, 5.9, "Critical"),
  )

  test("base/exploitability/impact scores match published values") {
    for ((vec, base, esc, isc, sev) <- cases) {
      val s = Cvss.score(vec)
      assert(s != null, vec)
      assert(s.baseScore == base, s"$vec base: got ${s.baseScore}")
      assert(s.exploitabilityScore == esc, s"$vec esc: got ${s.exploitabilityScore}")
      assert(s.impactScore == isc, s"$vec isc: got ${s.impactScore}")
      assert(s.baseSeverity == sev, s"$vec sev: got ${s.baseSeverity}")
    }
  }

  test("malformed vectors yield null (log-and-skip semantics)") {
    assert(Cvss.score(null) == null)
    assert(Cvss.score("") == null)
    assert(Cvss.score("CVSS:2.0/AV:N") == null)
    assert(Cvss.score("CVSS:3.1/AV:N/AC:L") == null)          // missing metrics
    assert(Cvss.score("CVSS:3.1/AV:X/AC:L/PR:N/UI:N/S:U/C:H/I:H/A:H") == null)
  }

  test("version string is parsed from the prefix") {
    assert(Cvss.score("CVSS:3.1/AV:N/AC:L/PR:N/UI:N/S:U/C:H/I:H/A:H").version == "3.1")
    assert(Cvss.score("CVSS:3.0/AV:N/AC:L/PR:N/UI:N/S:U/C:H/I:H/A:H").version == "3.0")
  }

  test("cvss4 validation enforces the enumerated optional metrics") {
    import org.apache.spark.sql.functions.col
    val spark = SparkTestSession.spark
    import spark.implicits._
    val base = "CVSS:4.0/AV:N/AC:L/AT:N/PR:N/UI:N" +
      "/VC:H/VI:H/VA:H/SC:N/SI:N/SA:N"
    val vectors = Seq(
      base -> true,                       // mandatory-only
      s"$base/" -> true,                  // trailing slash stripped
      s"$base/E:P/CR:H/MAV:A/MSI:S/U:Amber" -> true, // canonical optionals
      s"$base/ZZ:qq" -> false,            // unknown metric code
      s"$base/E:Z" -> false,              // invalid value for E
      s"$base/E:P/E:U" -> false,          // duplicate metric
      s"$base/U:Purple" -> false,         // invalid supplemental value
      base.replace("AV:N", "AV:Z") -> false) // invalid mandatory value
    val got = vectors.map(_._1).toDF("v")
      .select(Cvss.cvss4_validate(col("v")).as("s"))
      .collect().map(r => !r.isNullAt(0))
    vectors.zip(got).foreach { case ((v, expect), ok) =>
      assert(ok == expect, s"vector $v: got ${if (ok) "valid" else "null"}")
    }
  }
}
