package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.providers.OsvProvider

/** OSV→OS downconvert (F20) + fix-date patch (F19) semantics, pinned to
  * the reference's documented encoding rules. */
class OsvSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fixture = getClass.getResource("/fixtures/osv.json").getPath
  private lazy val osv = OsvProvider.read(spark, fixture)
  private lazy val fixdates = Seq(
    ("CVE-2023-1111", "openssl", "3.0.2-0ubuntu1.9", "2023-03-15", "first-observed")
  ).toDF("cve", "pkg", "version", "date", "kind")

  test("ecosystem mapping: base, plain Pro→+esm, FIPS dropped") {
    val rows = OsvProvider.affectedRows(osv).collect()
    val ecos = rows.map(r => (r.getAs[String]("cve"), r.getAs[String]("namespace"))).toSet
    assert(ecos.contains(("CVE-2023-1111", "ubuntu:22.04")))
    assert(ecos.contains(("CVE-2023-1111", "ubuntu:18.04+esm")))
    // FIPS variant must not appear
    assert(!rows.exists(_.getAs[String]("namespace").contains("fips")))
    assert(rows.count(_.getAs[String]("cve") == "CVE-2023-1111") == 2)
  }

  test("withdrawn and non-CVE records are dropped") {
    val cves = OsvProvider.affectedRows(osv).select("cve").as[String].collect().toSet
    assert(!cves.contains("CVE-2023-4444")) // withdrawn
    assert(cves == Set("CVE-2023-1111", "CVE-2023-2222", "CVE-2023-3333"))
  }

  test("FixedIn encoding: released / wont-fix / no-fix / +esm-suppression") {
    val fi = OsvProvider.fixedInRows(OsvProvider.affectedRows(osv), fixdates)
      .collect()
    // released with fixdate join hit → accurate date
    val rel = fi.find(r => r.getAs[String]("cve") == "CVE-2023-1111" &&
      r.getAs[String]("namespace") == "ubuntu:22.04").get
    assert(rel.getAs[String]("version") == "3.0.2-0ubuntu1.9")
    assert(rel.getAs[String]("available_date") == "2023-03-15")
    assert(rel.getAs[String]("available_kind") == "first-observed")
    // released without fixdate hit → published-date fallback, kind=advisory
    val esm = fi.find(r => r.getAs[String]("namespace") == "ubuntu:18.04+esm").get
    assert(esm.getAs[String]("available_date") == "2023-03-01")
    assert(esm.getAs[String]("available_kind") == "advisory")
    // wont-fix → Version None + NoAdvisory=true
    val wf = fi.find(r => r.getAs[String]("cve") == "CVE-2023-2222" &&
      r.getAs[String]("namespace") == "ubuntu:24.10").get
    assert(wf.getAs[String]("version") == "None")
    assert(wf.getAs[Boolean]("no_advisory"))
    // Pro channel with NO fix emits nothing (+esm suppression)
    assert(!fi.exists(r => r.getAs[String]("namespace") == "ubuntu:24.10+esm"))
    // no-fix, no wont-fix → Version None, NoAdvisory=false
    val nf = fi.find(r => r.getAs[String]("cve") == "CVE-2023-3333").get
    assert(nf.getAs[String]("version") == "None" && !nf.getAs[Boolean]("no_advisory"))
  }

  test("envelopes: identifier shape, severity mapping, canonical item") {
    val env = OsvProvider.envelopes(
      OsvProvider.fixedInRows(OsvProvider.affectedRows(osv), fixdates))
    val rows = env.collect()
    val ids = rows.map(_.getAs[String]("identifier")).toSet
    assert(ids.contains("ubuntu:22.04/cve-2023-1111"))
    assert(ids.contains("ubuntu:18.04+esm/cve-2023-1111"))
    val item = rows.find(_.getAs[String]("identifier") == "ubuntu:22.04/cve-2023-1111")
      .get.getAs[String]("item")
    assert(item.contains("\"Severity\":\"Medium\""))
    assert(item.contains("\"Date\":\"2023-03-15\""))
    // untriaged → Unknown
    val wf = rows.find(_.getAs[String]("identifier") == "ubuntu:24.10/cve-2023-2222")
      .get.getAs[String]("item")
    assert(wf.contains("\"Severity\":\"Unknown\""))
    assert(wf.contains("\"Version\":\"None\""))
  }

  // ---- passthrough family: raw-record fidelity ----------------------

  test("json_records splits arrays, single objects, and JSONL") {
    import graft.plans.JsonExpressions.json_records
    val rows = Seq(
      """[{"id":"A-1"},{"id":"A-2"}]""",          // bulk array
      """{"id":"B-1","nested":{"k":[1,2]}}""",    // one object per file
      "{\"id\":\"C-1\"}\n{\"id\":\"C-2\"}",       // JSONL
      "not json at all"                            // malformed → null
    ).toDF("value")
      .select(col("value"), json_records(col("value")).as("recs"))
      .collect()
    assert(rows(0).getSeq[String](1) ==
      Seq("""{"id":"A-1"}""", """{"id":"A-2"}"""))
    assert(rows(1).getSeq[String](1).head.contains("\"nested\""))
    assert(rows(2).getSeq[String](1).map(r =>
      r.contains("C-1") || r.contains("C-2")) == Seq(true, true))
    assert(rows(3).isNullAt(1))
  }

  test("json_records salvages valid records ahead of a malformed tail") {
    import graft.plans.JsonExpressions.json_records
    val rows = Seq(
      // two good records, then a truncated third: the good ones survive
      "{\"id\":\"D-1\"}\n{\"id\":\"D-2\"}\n{\"id\":\"D-3\",\"x\":",
      // garbage from byte one: still null
      "{{{"
    ).toDF("value")
      .select(json_records(col("value")).as("recs"))
      .collect()
    assert(rows(0).getSeq[String](0) ==
      Seq("""{"id":"D-1"}""", """{"id":"D-2"}"""))
    assert(rows(1).isNullAt(0))
  }

  test("readPassthrough line mode parallelizes a JSONL dump") {
    val dir = java.nio.file.Files.createTempDirectory("osvjsonl")
    val f = dir.resolve("dump.jsonl")
    java.nio.file.Files.writeString(f,
      "{\"id\":\"L-1\"}\n\n{\"id\":\"L-2\"}\n{\"noid\":true}\n")
    val out = OsvProvider.readPassthrough(spark, f.toString,
      wholeFile = false).collect()
    assert(out.map(_.getAs[String]("id")).toSet == Set("L-1", "L-2"))
  }

  test("patchFixDates preserves foreign database_specific keys and " +
      "skips empty-string fixed events (osv.py falsy-skip)") {
    val raw =
      """{"id":"X-1","published":"2024-01-10T00:00:00Z","affected":[
        |{"package":{"ecosystem":"Go","name":"p1"},
        | "ranges":[{"type":"SEMVER",
        |   "database_specific":{"keep":"me"},
        |   "events":[{"introduced":"0"},{"fixed":"1.2.3"}]}]},
        |{"package":{"ecosystem":"Go","name":"p2"},
        | "ranges":[{"type":"SEMVER",
        |   "events":[{"introduced":"0"},{"fixed":""}]}]}]}"""
        .stripMargin.replace("\n", "")
    val records = Seq(("X-1", raw)).toDF("id", "raw")
    val fixdates = Seq(("X-1", "go", "p1", "1.2.3", "2024-01-05",
      "first-observed")).toDF(
      "vuln_id", "ecosystem", "pkg", "version", "date", "kind")
    val out = OsvProvider.patchFixDates(records, fixdates)
      .collect().head.getAs[String]("raw")
    // dated fix attached, existing database_specific key preserved
    assert(out.contains("\"keep\":\"me\""))
    assert(out.contains(
      "\"fixes\":[{\"version\":\"1.2.3\",\"date\":\"2024-01-05\"," +
        "\"kind\":\"first-observed\"}]"))
    // the empty-string fixed event got NO fixes entry (p2's range is
    // untouched — no anchore block anywhere after its package)
    val p2 = out.substring(out.indexOf("\"p2\""))
    assert(!p2.contains("anchore"))
  }

  test("patchFixDates reproduces finder.best(): an accurate store date " +
      "caps candidates, published wins under the cap, an inaccurate " +
      "store date is the last resort") {
    def affected(pkg: String) =
      s"""{"package":{"ecosystem":"Go","name":"$pkg"},
         |"ranges":[{"type":"SEMVER",
         |"events":[{"introduced":"0"},{"fixed":"1.0.0"}]}]}"""
        .stripMargin.replace("\n", "")
    val records = Seq(
      ("Y-1", s"""{"id":"Y-1","published":"2024-01-10T00:00:00Z",""" +
        s""""affected":[${affected("pA")},${affected("pB")},""" +
        s"""${affected("pC")}]}"""),
      ("Y-2", s"""{"id":"Y-2","affected":[${affected("pD")}]}"""))
      .toDF("id", "raw")
    val fixdates = Seq(
      // accurate store BEFORE published: cap discards published → store
      ("Y-1", "go", "pA", "1.0.0", "2024-01-05", "first-observed", true),
      // accurate store AFTER published: published passes the cap → wins
      ("Y-1", "go", "pB", "1.0.0", "2024-01-20", "first-observed", true),
      // INACCURATE store: candidates win outright even though earlier
      ("Y-1", "go", "pC", "1.0.0", "2024-01-01", "first-observed", false),
      // inaccurate store, record has no published date: last resort
      ("Y-2", "go", "pD", "1.0.0", "2024-01-01", "first-observed", false))
      .toDF("vuln_id", "ecosystem", "pkg", "version", "date", "kind",
        "accurate")
    val out = OsvProvider.patchFixDates(records, fixdates).collect()
      .map(r => r.getAs[String]("id") -> r.getAs[String]("raw")).toMap
    def fix(raw: String, pkg: String): String = {
      val seg = raw.substring(raw.indexOf(s""""$pkg""""))
      seg.substring(seg.indexOf("\"fixes\""),
        seg.indexOf("]", seg.indexOf("\"fixes\"")) + 1)
    }
    assert(fix(out("Y-1"), "pA").contains(
      "\"date\":\"2024-01-05\",\"kind\":\"first-observed\""))
    assert(fix(out("Y-1"), "pB").contains(
      "\"date\":\"2024-01-10\",\"kind\":\"advisory\""))
    assert(fix(out("Y-1"), "pC").contains(
      "\"date\":\"2024-01-10\",\"kind\":\"advisory\""))
    assert(fix(out("Y-2"), "pD").contains(
      "\"date\":\"2024-01-01\",\"kind\":\"first-observed\""))
  }

  test("passthrough envelopes skip records with an incompatible " +
      "schema major version") {
    val records = Seq(
      ("OK-1", """{"id":"OK-1","schema_version":"1.4.0","affected":[]}"""),
      ("NO-1", """{"id":"NO-1","schema_version":"2.0.0","affected":[]}"""))
      .toDF("id", "raw")
    val fixdates = Seq.empty[(String, String, String, String, String, String)]
      .toDF("vuln_id", "ecosystem", "pkg", "version", "date", "kind")
    val env = OsvProvider.passthroughEnvelopes(records, fixdates).collect()
    assert(env.map(_.getAs[String]("identifier")).toSeq == Seq("ok-1"))
    assert(env.head.getAs[String]("schema").endsWith("schema-1.4.0.json"))
  }
}
