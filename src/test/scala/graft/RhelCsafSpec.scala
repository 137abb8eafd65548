package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.providers.RhelCsafJoin
import graft.operators.Decorators
import graft.sources.Sources

/** J3 Hydra×CSAF fix join semantics + KEV/EPSS decorators. */
class RhelCsafSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val hydra = Seq(
    ("CVE-2024-1", "RHSA-2024:0001", "webkit2gtk3", "cpe:/a:redhat:enterprise_linux:9"),
    ("CVE-2024-1", "RHSA-2024:0001", "glibc", "cpe:/o:redhat:enterprise_linux:7"),
    ("CVE-2024-2", "RHSA-2024:0002", "tomcat", "cpe:/a:redhat:enterprise_linux:8")
  ).toDF("cve", "rhsa_id", "pkg", "platform_cpe")

  private lazy val fpis = Seq(
    // two FPIs shipping the SAME webkit build on GA and EUS channels
    ("RHSA-2024:0001", "CVE-2024-1", "AppStream-9.4.0.GA:webkit2gtk3-0:2.44.3-2.el9.x86_64",
      "cpe:/a:redhat:enterprise_linux:9::appstream", null, "webkit2gtk3", "0:2.44.3-2.el9"),
    ("RHSA-2024:0001", "CVE-2024-1", "AppStream-9.4.0.Z.EUS:webkit2gtk3-0:2.44.3-2.el9.x86_64",
      "cpe:/a:redhat:enterprise_linux:9::appstream", null, "webkit2gtk3", "0:2.44.3-2.el9"),
    // glibc: only an "ael" alternative build matches → backup pick
    ("RHSA-2024:0001", "CVE-2024-1", "Server-7.1.Z:glibc-0:1.4.7-3.ael7b_1.x86_64",
      "cpe:/o:redhat:enterprise_linux:7::server", null, "glibc", "0:1.4.7-3.ael7b_1"),
    // tomcat FPI exists but for a DIFFERENT platform prefix → no match
    ("RHSA-2024:0002", "CVE-2024-2", "AppStream-9.2.0.GA:tomcat-0:9.0.62-27.el9.x86_64",
      "cpe:/a:redhat:enterprise_linux:9::appstream", null, "tomcat", "0:9.0.62-27.el9")
  ).toDF("rhsa_id", "cve", "fpi", "plat_cpe", "module", "name", "version")

  private lazy val out = RhelCsafJoin.fixInfo(hydra, fpis).collect()

  test("CPE-prefix theta match resolves version + FPI; channels unioned") {
    val webkit = out.find(_.getAs[String]("pkg") == "webkit2gtk3").get
    assert(webkit.getAs[String]("version") == "0:2.44.3-2.el9")
    assert(webkit.getAs[String]("product_id")
      == "AppStream-9.4.0.GA:webkit2gtk3-0:2.44.3-2.el9.x86_64")
    // GA + EUS FPIs ship the same build → both channels recognized
    assert(webkit.getSeq[String](webkit.fieldIndex("channels")).toList
      == List("eus", "ga"))
  }

  test("ael alternative build used only as backup") {
    val glibc = out.find(_.getAs[String]("pkg") == "glibc").get
    assert(glibc.getAs[String]("version") == "0:1.4.7-3.ael7b_1")
  }

  test("platform-prefix mismatch yields no fix info") {
    val tomcat = out.find(_.getAs[String]("pkg") == "tomcat").get
    assert(tomcat.getAs[String]("version") == null)
    assert(tomcat.getSeq[String](tomcat.fieldIndex("channels")).isEmpty)
  }

  test("KEV + EPSS decorators annotate via broadcast left joins") {
    val rows = Seq("CVE-2024-1", "CVE-2024-2", "CVE-2024-3").toDF("cve")
    val kev = Seq("CVE-2024-1").toDF("cve")
    val epss = Sources.epss(spark,
      getClass.getResource("/fixtures/epss.csv").getPath)
      .withColumnRenamed("cve", "cve")
    val decorated = Decorators.withEpss(
      Decorators.withKev(rows, kev),
      epss.select(col("cve"), col("epss"), col("percentile")))
    val m = decorated.collect()
      .map(r => r.getAs[String]("cve") -> r.getAs[Boolean]("known_exploited"))
      .toMap
    assert(m == Map("CVE-2024-1" -> true, "CVE-2024-2" -> false,
      "CVE-2024-3" -> false))
  }

  test("EOL decorator annotates distro namespaces via broadcast left join") {
    val rows = Seq(
      ("ubuntu:18.04", "CVE-2024-1"), ("ubuntu:22.04", "CVE-2024-2"),
      ("alpine:3.19", "CVE-2024-3"), ("rhel:9", "CVE-2024-4")
    ).toDF("namespace", "cve")
    val cycles = graft.providers.AuxProviders.eolCycles(spark,
      getClass.getResource("/fixtures/eol.json").getPath)
    val out = Decorators.withEol(rows, cycles).collect()
      .map(r => r.getAs[String]("namespace") ->
        Option(r.getAs[java.lang.Boolean]("is_eol"))).toMap
    assert(out == Map(
      "ubuntu:18.04" -> Some(java.lang.Boolean.TRUE),
      "ubuntu:22.04" -> Some(java.lang.Boolean.FALSE),
      "alpine:3.19" -> Some(java.lang.Boolean.FALSE),
      "rhel:9" -> None)) // unmatched namespace keeps nulls
  }

  test("aux scans tolerate degenerate upstream shapes") {
    import graft.providers.AuxProviders
    val tmp = java.nio.file.Files.createTempDirectory("auxedge")
    // EPSS dump missing the score_date comment header: rows still
    // parse, the date passthrough is null (upstream promises the
    // header; its absence must not throw)
    val csv = tmp.resolve("epss.csv")
    java.nio.file.Files.writeString(csv,
      "cve,epss,percentile\nCVE-2024-1,0.5,0.9\n")
    val env = AuxProviders.epssEnvelopes(spark, csv.toString).collect()
    assert(env.length == 1 &&
      env.head.getAs[String]("identifier") == "cve-2024-1")
    assert(!env.head.getAs[String]("item").contains("\"date\""))
    // EOL product with an empty releases array contributes no cycles
    // (and no rows for the decorator join) without failing the scan
    val eol = tmp.resolve("eol.json")
    java.nio.file.Files.writeString(eol,
      """{"result": [
        |{"name": "emptyware", "identifiers": [], "releases": []},
        |{"name": "one", "identifiers": [],
        | "releases": [{"name": "1.0", "isEol": false,
        |   "eolFrom": "2030-01-01", "isMaintained": true}]}]}"""
        .stripMargin)
    val cycles = AuxProviders.eolCycles(spark, eol.toString).collect()
    assert(cycles.length == 1 &&
      cycles.head.getAs[String]("product") == "one")
    val envs = AuxProviders.eolEnvelopes(spark, eol.toString).collect()
    assert(envs.map(_.getAs[String]("identifier")).toSeq == Seq("one:1.0"))
  }
}
