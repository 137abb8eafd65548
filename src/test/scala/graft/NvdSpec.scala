package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.providers.{NvdProvider, OsvProvider}

/** NVD override join (J2) + cpeMatch fix extraction, and the ubuntu
  * Pro→base inference (J7). */
class NvdSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fixture = getClass.getResource("/fixtures/nvd_page.json").getPath
  private lazy val cves = NvdProvider.cves(spark, fixture)

  test("page scan explodes per-CVE rows") {
    assert(cves.select("id").as[String].collect().toSet ==
      Set("CVE-2023-1234", "CVE-2023-5678", "CVE-2023-9999"))
  }

  test("S1 pagination plan mirrors the api loop, incl. trailing even page") {
    // api.py:134-147: pages = total // per_page, offsets rpp·1…rpp·pages
    assert(NvdProvider.remainingPageOffsets(4500, 2000) == Seq(2000L, 4000L))
    // even division requests the reference's trailing empty page
    assert(NvdProvider.remainingPageOffsets(4000, 2000) == Seq(2000L, 4000L))
    assert(NvdProvider.remainingPageOffsets(1500, 2000).isEmpty)
    assert(NvdProvider.remainingPageOffsets(0, 2000).isEmpty)
    assert(NvdProvider.remainingPageOffsets(4500, 0).isEmpty)
    // fixture page: totalResults=3 at rpp=3 → exactly the even trailing page
    assert(NvdProvider.remainingPageOffsets(spark, fixture) == Seq(3L))
  }

  test("override join: configurations replaced, references unioned by url") {
    // build an override for 1234: new configurations + one dup url + one new
    val ov = cves.filter(col("id") === "CVE-2023-5678")
      .select(lit("CVE-2023-1234").as("id"),
        col("configurations"),
        array(
          struct(lit("https://a.example/1").as("url"), lit("ov").as("source")),
          struct(lit("https://override.example/x").as("url"), lit("ov").as("source")))
          .as("references"))
    val out = NvdProvider.applyOverrides(cves, ov)
    val r1234 = out.filter(col("id") === "CVE-2023-1234").head()
    // configurations replaced by override's (which came from 5678: other:lib)
    val cfg = r1234.getSeq[org.apache.spark.sql.Row](
      r1234.fieldIndex("configurations"))
    assert(cfg.toString.contains("other:lib"))
    // references: original url kept once, new override url appended
    val urls = r1234.getSeq[org.apache.spark.sql.Row](
      r1234.fieldIndex("references")).map(_.getAs[String]("url"))
    assert(urls == Seq("https://a.example/1", "https://override.example/x"))
    // untouched CVE passes through
    val r5678 = out.filter(col("id") === "CVE-2023-5678").head()
    assert(r5678.getSeq[org.apache.spark.sql.Row](
      r5678.fieldIndex("references"))
      .map(_.getAs[String]("url")) == Seq("https://b.example/1"))
  }

  test("cpeMatch fix rows: vulnerable + versionEndExcluding only") {
    val fixes = NvdProvider.cpeFixRows(cves).collect()
    assert(fixes.length == 1)
    assert(fixes.head.getAs[String]("id") == "CVE-2023-1234")
    assert(fixes.head.getAs[String]("fix_version") == "1.4.3")
  }

  test("Pro→base inference synthesizes base wont-fix rows (J7)") {
    val affected = Seq(
      // pro-only fix → base row must be synthesized
      ("CVE-1", "High", "2023-01-01", "pkgA", "ubuntu:20.04+esm",
        Seq("1.2-3esm1"), false),
      // fix on both channels → no synthesis
      ("CVE-2", "Low", "2023-01-01", "pkgB", "ubuntu:20.04+esm",
        Seq("2.0esm1"), false),
      ("CVE-2", "Low", "2023-01-01", "pkgB", "ubuntu:20.04", Seq("2.0"), false)
    ).toDF("cve", "severity", "published", "pkg", "namespace",
      "fixed_versions", "wont_fix")
    val out = OsvProvider.proToBaseInference(affected)
    val synth = out.filter(col("cve") === "CVE-1" &&
      col("namespace") === "ubuntu:20.04").collect()
    assert(synth.length == 1)
    assert(synth.head.getAs[Boolean]("wont_fix"))
    assert(synth.head.getSeq[String](
      synth.head.fieldIndex("fixed_versions")).isEmpty)
    assert(out.filter(col("cve") === "CVE-2").count() == 2) // unchanged
    // synthesized row flows to FixedIn as Version=None/NoAdvisory=true
    val fi = OsvProvider.fixedInRows(out,
      Seq.empty[(String, String, String, String, String)]
        .toDF("cve", "pkg", "version", "date", "kind"))
    val nak = fi.filter(col("cve") === "CVE-1" &&
      col("namespace") === "ubuntu:20.04").head()
    assert(nak.getAs[String]("version") == "None")
    assert(nak.getAs[Boolean]("no_advisory"))
  }
}
