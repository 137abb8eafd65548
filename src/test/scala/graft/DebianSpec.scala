package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.providers.DebianProvider

/** Debian provider: tracker scan, DSA join (J4), severity max-merge
  * (A3), metrics rollup (A10), sentinel FixedIn semantics. */
class DebianSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fixture =
    getClass.getResource("/fixtures/debian_tracker.json").getPath
  private lazy val rows = DebianProvider.packageRows(spark, fixture)
  private lazy val dsas = Seq(
    ("DSA-5343-1", "https://www.debian.org/security/2023/dsa-5343",
      "bullseye", "openssl", "CVE-2023-0286", "2023-02-08")
  ).toDF("dsa", "link", "rel", "pkg", "cve", "date")
  private lazy val joined = DebianProvider.withAdvisories(rows, dsas)

  test("tracker scan: temp ids and undetermined/unmapped releases dropped") {
    val got = rows.select("relno", "cve", "pkg").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(!got.exists(_._2.startsWith("TEMP")))
    assert(!got.exists(_._1 == "unstable")) // sid row was undetermined
    assert(got.contains(("11", "CVE-2023-0286", "openssl")))
    assert(got.contains(("10", "CVE-2023-0286", "openssl"))) // open → Version None
  }

  test("DSA join: matched advisory list, nodsa flag, NAK empty list (J4)") {
    val ossl11 = joined.filter(col("relno") === "11" &&
      col("pkg") === "openssl" && col("cve") === "CVE-2023-0286").head()
    val va = ossl11.getAs[org.apache.spark.sql.Row]("vendor_advisory")
    assert(!va.getAs[Boolean]("NoAdvisory"))
    assert(va.getSeq[org.apache.spark.sql.Row](va.fieldIndex("AdvisorySummary"))
      .map(_.getAs[String]("ID")) == Seq("DSA-5343-1"))
    // DSA date flows into Available for fixed rows
    assert(ossl11.getAs[java.sql.Date]("available_date").toString == "2023-02-08")
    // nodsa → NoAdvisory=true
    val zlib = joined.filter(col("pkg") === "zlib" && col("relno") === "11").head()
    assert(zlib.getAs[org.apache.spark.sql.Row]("vendor_advisory")
      .getAs[Boolean]("NoAdvisory"))
    // NAK "0" → empty advisory summary, no advisory date
    val nak = joined.filter(col("cve") === "CVE-2021-9999").head()
    val nakVa = nak.getAs[org.apache.spark.sql.Row]("vendor_advisory")
    assert(!nakVa.getAs[Boolean]("NoAdvisory"))
    assert(nakVa.getSeq[org.apache.spark.sql.Row](
      nakVa.fieldIndex("AdvisorySummary")).isEmpty)
  }

  test("severity max-merge across packages (A3) + envelope assembly") {
    val env = DebianProvider.envelopes(joined)
    val e11 = env.filter(col("identifier") === "debian:11/cve-2023-0286")
      .head().getAs[String]("item")
    // openssl high beats zlib low
    assert(e11.contains("\"Severity\":\"High\""))
    assert(e11.contains("\"openssl\"") && e11.contains("\"zlib\""))
    assert(e11.contains("\"Date\":\"2023-02-08\""))
    // open release → Version None
    val e10 = env.filter(col("identifier") === "debian:10/cve-2023-0286")
      .head().getAs[String]("item")
    assert(e10.contains("\"Version\":\"None\""))
    // NAK envelope keeps Version 0
    val nak = env.filter(col("identifier") === "debian:11/cve-2021-9999")
      .head().getAs[String]("item")
    assert(nak.contains("\"Version\":\"0\""))
  }

  test("legacy records: Vectors-null strip, fixdate patch, severity " +
      "override, legacy-wins merge") {
    val legacyPath =
      getClass.getResource("/fixtures/debian_legacy.json").getPath
    val fixdates = Seq(
      ("CVE-2011-7777", "libdemo", "debian:7", "1.2-3+deb7u1",
        "2012-02-01", "first-observed")
    ).toDF("vuln", "pkg", "ecosystem", "version", "date", "kind")
    val legacy = DebianProvider.legacyEnvelopes(spark, legacyPath,
      Some(fixdates))
    val byId = legacy.collect()
      .map(r => r.getAs[String]("identifier") -> r.getAs[String]("item"))
      .toMap
    // CVSSv2 Vectors: null key deleted (`parser.py:579-583`), Score kept
    assert(byId("debian:7/cve-2004-9999").contains("\"Score\":6.4"))
    assert(!byId("debian:7/cve-2004-9999").contains("Vectors"))
    // fixdater patch lands on the undated FixedIn entry
    assert(byId("debian:7/cve-2011-7777").contains(
      "\"Available\":{\"Date\":\"2012-02-01\",\"Kind\":\"first-observed\"}"))
    // pinned severity override escapes to Unknown
    assert(byId("debian:7/cve-2023-4863").contains("\"Severity\":\"Unknown\""))
    // legacy WINS over the fresh normalization for a shared identifier
    val current = DebianProvider.envelopes(joined)
    val merged = DebianProvider.withLegacy(current, legacy)
    val kept = merged.filter(col("identifier") === "debian:11/cve-2021-9999")
      .head().getAs[String]("item")
    assert(kept.contains("legacy copy wins"))
    assert(merged.count() == current.count() + legacy.count() - 1)
  }

  test("advisory metrics rollup (A10)") {
    val m = DebianProvider.advisoryMetrics(joined).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2),
        r.getString(3)), r.getLong(4))).toMap
    assert(m(("debian:11", "High", "dsa", "fixed")) == 1L)
    assert(m(("debian:11", "Low", "nodsa", "notfixed")) == 1L)
    assert(m(("debian:10", "Medium", "neither", "notfixed")) == 1L)
    // NAK rows excluded from metrics
    assert(!m.keySet.exists(_._2 == "Negligible"))
  }
}
