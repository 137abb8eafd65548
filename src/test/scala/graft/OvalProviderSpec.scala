package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.providers.OvalProvider
import graft.sources.ChangeDetect

class OvalProviderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fixture = getClass.getResource("/fixtures/oval.xml").getPath

  test("OVAL envelopes: severity mapped, less-than EVR becomes FixedIn") {
    val env = OvalProvider.envelopes(
      OvalProvider.resolvedRows(spark, fixture), "sles:15.5")
    val rows = env.collect()
    assert(rows.map(_.getAs[String]("identifier")).toSet ==
      Set("sles:15.5/cve-2023-1000", "sles:15.5/cve-2023-2000",
        "sles:15.5/cve-2023-3000", "sles:15.5/cve-2023-4000"))
    // def:4 drills the real-feed criteria shapes: TWO criterion
    // children (one nested a criteria level down), and CVE picked from
    // a multi-reference metadata by source — both packages must
    // resolve into the one envelope
    val e4 = rows.find(_.getAs[String]("identifier") == "sles:15.5/cve-2023-4000")
      .get.getAs[String]("item")
    assert(e4.contains("\"Name\":\"libmulti\"") &&
      e4.contains("\"Version\":\"0:3.1-1\""))
    assert(e4.contains("\"Name\":\"libnest\"") &&
      e4.contains("\"Version\":\"0:4.0-2\""))
    assert(!e4.contains("ELSA-2023-4000"),
      "CVE-sourced reference must win over the advisory reference")
    val e1 = rows.find(_.getAs[String]("identifier") == "sles:15.5/cve-2023-1000")
      .get.getAs[String]("item")
    assert(e1.contains("\"Severity\":\"High\""))      // Important → High
    assert(e1.contains("\"Version\":\"0:1.2-3\""))
    assert(e1.contains("\"VersionFormat\":\"rpm\""))
    val e2 = rows.find(_.getAs[String]("identifier") == "sles:15.5/cve-2023-2000")
      .get.getAs[String]("item")
    assert(e2.contains("\"Severity\":\"Medium\""))    // Moderate → Medium
  }

  test("oracle ksplice guard drops the fix but keeps the record") {
    val rows = OvalProvider.resolvedRows(spark, fixture)
    val kept = OvalProvider.envelopes(rows, "ol:7")
      .filter(org.apache.spark.sql.functions.col("identifier") ===
        "ol:7/cve-2023-3000").head().getAs[String]("item")
    assert(kept.contains("\"Version\":\"1:1.0.2k-2.ksplice1.el7\""))
    val filtered = OvalProvider.envelopes(rows, "ol:7", dropKsplice = true)
    val item = filtered.filter(org.apache.spark.sql.functions.col("identifier") ===
      "ol:7/cve-2023-3000").head().getAs[String]("item")
    // parent record survives with an empty FixedIn (parser.py:167-172)
    assert(item.contains("\"FixedIn\":[]"))
    // non-ksplice fixes untouched
    val other = filtered.filter(org.apache.spark.sql.functions.col("identifier") ===
      "ol:7/cve-2023-1000").head().getAs[String]("item")
    assert(other.contains("\"Version\":\"0:1.2-3\""))
  }

  private def elsaFixture =
    getClass.getResource("/fixtures/elsa_oval.xml").getPath

  test("ELSA rows: platform branches, comment-extracted packages, " +
      "advisory metadata") {
    val rows = OvalProvider.elsaRows(spark, elsaFixture).collect()
    // def 1: one platform, two packages (the signed-with criteria are
    // not package bounds)
    val d1 = rows.filter(_.getAs[String]("name") == "ELSA-2023-1000")
    assert(d1.map(r => (r.getAs[String]("ns"), r.getAs[String]("pkg"),
      r.getAs[String]("evr"))).toSet == Set(
      ("ol:9", "libfoo", "0:1.2-3.el9"),
      ("ol:9", "libfoo-devel", "0:1.2-3.el9")))
    assert(d1.head.getAs[String]("issued") == "2023-04-12")
    assert(d1.head.getAs[String]("ref_id") == "ELSA-2023-1000")
    // def 2: an OR of per-platform groups — each package bound stays in
    // ITS platform's branch (the reference's _process_criteria walk)
    val d2 = rows.filter(r => r.getAs[String]("name") == "ELSA-2023-2000"
      && r.getAs[String]("def_version") == "502")
    assert(d2.map(r => (r.getAs[String]("ns"), r.getAs[String]("evr")))
      .toSet == Set(
      ("ol:8", "2:4.18.0-80.el8"),
      ("ol:9", "2:5.1.0-10.el9"),
      ("ol:9", "2:5.1.0-10.ksplice1.el9")))
  }

  test("ELSA walk: module and arch inherit from the enclosing branch " +
      "at real-feed nesting depth") {
    val rows = OvalProvider.elsaRows(spark, elsaFixture).collect()
      .filter(_.getAs[String]("name") == "ELSA-2023-3000")
    val tuples = rows.map(r => (r.getAs[String]("pkg"),
      r.getAs[String]("evr"), r.getAs[String]("module"),
      r.getAs[String]("arch"))).toSet
    // kernel bounds are 5 criteria levels deep (platform AND > arch OR
    // > arch AND > pkg OR > pkg AND) and the podman module bounds 7 —
    // both beyond the old depth-4 schema, which silently dropped them
    assert(tuples == Set(
      ("kernel", "0:5.4.17-2136.320.7.el8", null, "x86_64"),
      ("kernel", "0:5.4.17-2136.320.7.1.el8", null, "aarch64"),
      ("podman", "2:4.4.1-1.module+el8", "container-tools:ol8", "x86_64"),
      ("podman", "2:4.4.1-1.module+el8", "container-tools:ol8", "aarch64")))
  }

  test("ELSA FixedIn: arch emitted only when versions differ per arch; " +
      "module carried; one row per version otherwise") {
    val env = OvalProvider
      .elsaEnvelopes(OvalProvider.elsaRows(spark, elsaFixture))
      .filter(col("identifier") === "ol:8/elsa-2023-3000")
      .head().getAs[String]("item")
    // kernel was respun later on aarch64 → arch DISCRIMINATES → one
    // FixedIn per (version, arch) with Arch set
    assert(env.contains("\"Arch\":\"x86_64\"") &&
      env.contains("\"Version\":\"0:5.4.17-2136.320.7.el8\""))
    assert(env.contains("\"Arch\":\"aarch64\"") &&
      env.contains("\"Version\":\"0:5.4.17-2136.320.7.1.el8\""))
    // podman: same version on every arch → arch-less single row with
    // the module stream attached (`oval_parser.py:281-327`)
    assert(env.contains("\"Module\":\"container-tools:ol8\""))
    assert(env.indexOf("\"Name\":\"podman\"") ==
      env.lastIndexOf("\"Name\":\"podman\""), s"podman duplicated: $env")
    // oracle alone pins os-schema 1.1.1 for the Arch field
    val schema = OvalProvider
      .elsaEnvelopes(OvalProvider.elsaRows(spark, elsaFixture))
      .head().getAs[String]("schema")
    assert(schema.contains("os/schema-1.1.1.json"))
  }

  test("ELSA envelopes: advisory-keyed record, Metadata CVE/Issued/" +
      "RefId, ksplice dropped, def-version dedupe") {
    val env = OvalProvider
      .elsaEnvelopes(OvalProvider.elsaRows(spark, elsaFixture))
      .collect().map(r => r.getAs[String]("identifier")
        -> r.getAs[String]("item")).toMap
    assert(env.keySet == Set("ol:9/elsa-2023-1000",
      "ol:8/elsa-2023-2000", "ol:9/elsa-2023-2000",
      "ol:8/elsa-2023-3000"))
    val e1 = env("ol:9/elsa-2023-1000")
    assert(e1.contains("\"Vulnerability\":{"))
    assert(e1.contains("\"Name\":\"ELSA-2023-1000\""))
    assert(e1.contains("\"Severity\":\"High\""))
    assert(e1.contains("\"RefId\":\"ELSA-2023-1000\"")
      && e1.contains("\"Issued\":\"2023-04-12\""))
    assert(e1.contains("\"CVE\":[{\"Name\":\"CVE-2023-1000\""))
    assert(e1.contains(
      "\"Available\":{\"Date\":\"2023-04-12\",\"Kind\":\"advisory\"}"))
    assert(e1.contains(
      "\"Link\":\"https://linux.example.invalid/errata/ELSA-2023-1000.html\""))
    // the ol:9 record for ELSA-2023-2000 must come from the RESPIN
    // definition (version 503 > 502 lexicographically) and must not
    // carry the ksplice bound the older definition had
    val e2 = env("ol:9/elsa-2023-2000")
    assert(e2.contains("\"Version\":\"2:5.1.0-11.el9\""),
      s"respin fix bound expected: $e2")
    assert(!e2.contains("ksplice"))
    // the ol:8 record keeps the 502 definition (the respin only names
    // Oracle Linux 9)
    assert(env("ol:8/elsa-2023-2000")
      .contains("\"Version\":\"2:4.18.0-80.el8\""))
  }

  test("two-tier change detection partitions ids into fetch/skip/delete (S4)") {
    val api = Seq(
      ("CVE-1", "2023-01-01", "High"),   // unchanged
      ("CVE-2", "2023-02-02", "Low"),    // changed content
      ("CVE-3", "2023-03-01", "Medium")  // new
    ).toDF("id", "modified", "sev")
    val cached = Seq(
      ("CVE-1", "2023-01-01", "High"),
      ("CVE-2", "2023-01-15", "Low"),
      ("CVE-9", "2022-12-01", "High")    // gone from api → delete
    ).toDF("id", "modified", "sev")
    val plan = ChangeDetect.plan(api, cached, "id").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(plan == Map("CVE-1" -> "skip", "CVE-2" -> "fetch",
      "CVE-3" -> "fetch", "CVE-9" -> "delete"))
  }
}
