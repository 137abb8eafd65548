package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.FixDate
import graft.providers.SecdbProvider

/** Fix-date best() resolution (W2/J1) + alpine rejections NAK (J9). */
class FixDateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fixture(name: String): String =
    getClass.getResource(s"/fixtures/$name").getPath

  // dimension rows: vuln_id, pkg, fix_version, date, kind, rank,
  // accurate_first_observed
  private def dim(rows: Seq[(String, String, String, String, String, Int, String)]) =
    rows.toDF("vuln_id", "pkg", "fix_version", "date", "kind", "rank",
      "accurate_first_observed")

  private def resolve(rows: Seq[(String, String, String)],
      d: org.apache.spark.sql.DataFrame) =
    FixDate.enrich(rows.toDF("vuln_id", "pkg", "fix_version"), d)
      .select(col("vuln_id"), col("available.date").as("date"),
        col("available.kind").as("kind"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))

  test("quality rank order: accurate candidate beats strategy beats fallback") {
    val d = dim(Seq(
      ("CVE-1", "p", "1.0", "2023-02-01", "strategy", 1, null),
      ("CVE-1", "p", "1.0", "2023-03-01", "usn", 0, null),
      ("CVE-1", "p", "1.0", "2023-01-01", "advisory", 2, null)))
    assert(resolve(Seq(("CVE-1", "p", "1.0")), d).head ==
      ("CVE-1", "2023-03-01", "usn"))
  }

  test("accurate first-observed discards later candidates, wins when none survive") {
    // candidate after the accurate first-observed date → discarded →
    // first-observed itself returned
    val d = dim(Seq(
      ("CVE-2", "p", "1.0", "2023-06-01", "strategy", 1, "2023-04-01")))
    assert(resolve(Seq(("CVE-2", "p", "1.0")), d).head ==
      ("CVE-2", "2023-04-01", "first-observed"))
    // candidate before first-observed → kept
    val d2 = dim(Seq(
      ("CVE-3", "p", "1.0", "2023-03-01", "strategy", 1, "2023-04-01")))
    assert(resolve(Seq(("CVE-3", "p", "1.0")), d2).head ==
      ("CVE-3", "2023-03-01", "strategy"))
  }

  test("sentinel versions None/0 never resolve; unmatched rows yield null") {
    val d = dim(Seq(("CVE-4", "p", "None", "2023-01-01", "strategy", 1, null)))
    val got = resolve(Seq(("CVE-4", "p", "None"), ("CVE-5", "q", "2.0")), d)
    assert(got.toSet == Set(("CVE-4", null, null), ("CVE-5", null, null)))
  }

  test("alpine rejections: secfix suppressed and replaced by NAK (J9)") {
    val rejections = Seq(("busybox", "CVE-2022-30065")).toDF("pkg_name", "vuln_id")
    val env = SecdbProvider.envelopes(spark, fixture("secdb.json"),
      "alpine:3.18", rejections = Some(rejections))
    val item = env.filter(col("identifier") === "alpine:3.18/cve-2022-30065")
      .head().getAs[String]("item")
    // busybox entry becomes a NAK ("0") — the regex BINDS Version "0"
    // to the busybox struct (no `}` between), so a mis-targeted NAK
    // on some other entry cannot pass; openssl keeps its real fix
    assert("\"Name\":\"busybox\"[^}]*\"Version\":\"0\"".r
      .findFirstIn(item).isDefined,
      "busybox entry must carry the NAK Version \"0\"")
    assert("\"Name\":\"openssl\"[^}]*\"Version\":\"3\\.0\\.8-r0\"".r
      .findFirstIn(item).isDefined,
      "openssl entry must keep its real fix version")
  }

  test("secdb fixdates dimension: matched fix gains Available; the " +
      "\"0\" NAK sentinel never matches") {
    val fixdates = Seq(
      ("CVE-2022-30065", "busybox", "1.35.0-r3", "2022-06-10", "advisory"),
      // a row targeting the "0" sentinel must be ignored
      ("CVE-2021-9999", "openssl", "0", "2021-01-01", "advisory")
    ).toDF("vuln", "pkg", "version", "date", "kind")
    val env = SecdbProvider.envelopes(spark, fixture("secdb.json"),
      "alpine:3.18", fixdates = Some(fixdates))
    val hit = env.filter(col("identifier") === "alpine:3.18/cve-2022-30065")
      .head().getAs[String]("item")
    assert(hit.contains(
      "\"Available\":{\"Date\":\"2022-06-10\",\"Kind\":\"advisory\"}"),
      s"matched fix must carry Available: $hit")
    val nak = env.filter(col("identifier") === "alpine:3.18/cve-2021-9999")
      .head().getAs[String]("item")
    assert(!nak.contains("Available"),
      "a \"0\" NAK row must never gain a fix date")
  }

  test("echo and sles fixdates dimensions attach Available to matched " +
      "fixes only") {
    val echoFd = Seq(("CVE-2025-7001", "curl", "8.9.0-2", "2025-02-01",
      "first-observed")).toDF("vuln", "pkg", "version", "date", "kind")
    val echoEnv = graft.providers.EchoProvider.envelopes(
      graft.providers.EchoProvider.entries(spark, fixture("echo_data.json")),
      Some(echoFd))
    val e = echoEnv.filter(col("identifier") === "echo:rolling/cve-2025-7001")
      .head().getAs[String]("item")
    assert(e.contains(
      "\"Available\":{\"Date\":\"2025-02-01\",\"Kind\":\"first-observed\"}"))
    // an envelope the dimension doesn't name carries no Available
    val other = echoEnv
      .filter(col("identifier") === "echo:rolling/cve-2025-7002")
      .head().getAs[String]("item")
    assert(!other.contains("Available"))

    val slesFd = Seq(("CVE-2025-5353", "curl", "8.0.1-1.1", "2025-03-03",
      "advisory")).toDF("vuln", "pkg", "version", "date", "kind")
    val slesEnv = graft.providers.SlesProvider.envelopes(spark,
      fixture("sles_oval.xml"), majorVersion = "15",
      fixdates = Some(slesFd))
    val sl = slesEnv.filter(col("identifier") === "sles:15.4/cve-2025-5353")
      .head().getAs[String]("item")
    assert(sl.contains(
      "\"Available\":{\"Date\":\"2025-03-03\",\"Kind\":\"advisory\"}"),
      s"sles matched fix must carry Available: $sl")
    // the fixdated plan must be row-identical to the undated one
    // everywhere else (same FixedIn set, just enriched)
    val undated = graft.providers.SlesProvider.envelopes(spark,
      fixture("sles_oval.xml"), majorVersion = "15")
      .select("identifier").collect().map(_.getString(0)).toSet
    assert(slesEnv.select("identifier").collect().map(_.getString(0)).toSet
      == undated)
  }
}
