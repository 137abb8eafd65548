package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.providers.RhelProvider

/** RHEL end-to-end envelope assembly (VERDICT r2 item 7; reference
  * `providers/rhel/parser.py:440-1000`): Hydra×CSAF fix resolution,
  * multi-stream VulnerableRange + Advisories, package_state trumping,
  * EUS/ELS base-platform inference, namespace emission rules. */
class RhelSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fixture =
    getClass.getResource("/fixtures/rhel_hydra.json").getPath

  private lazy val hydra = RhelProvider.hydraScan(spark, fixture)

  private lazy val fpis = RhelFixtures.webkitFpis(spark)

  private lazy val env = RhelProvider.envelopes(hydra, fpis).cache()

  private def item(id: String): String =
    env.filter(col("identifier") === id).head().getAs[String]("item")

  test("package-string name/version split: epoch-first, epoch-mid, plain") {
    assert(RhelProvider.nameVersion("webkit2gtk3-0:2.46.1-2.el9_5")
      == ("webkit2gtk3", "0:2.46.1-2.el9_5"))
    assert(RhelProvider.nameVersion("1:foo-bar-2.3.4-5.el6_7.8")
      == ("foo-bar", "1:2.3.4-5.el6_7.8"))
    assert(RhelProvider.nameVersion("tomcat-1:9.0.62-27.el8")
      == ("tomcat", "1:9.0.62-27.el8"))
    assert(RhelProvider.nameVersion("foo-bar:rhel8-12345") == ("foo-bar", null))
    assert(RhelProvider.nameVersion("glibc-2.17-55.el7")
      == ("glibc", "2.17-55.el7"))
    assert(RhelProvider.nameVersion("nameonly") == ("nameonly", null))
  }

  test("platform parse + base-platform inference rules") {
    assert(RhelProvider.parsePlatform("Red Hat Enterprise Linux 9") == "9")
    assert(RhelProvider.parsePlatform(
      "Red Hat Enterprise Linux 8.6 Extended Update Support") == "8.6+eus")
    assert(RhelProvider.parsePlatform(
      "Red Hat Enterprise Linux 6 Extended Lifecycle Support") == "6+els")
    assert(RhelProvider.parsePlatform("Red Hat OpenShift Container Platform 4")
      == null)
    assert(RhelProvider.basePlatform("8.6+eus") == "8")
    assert(RhelProvider.basePlatform("6+els") == "6")
    assert(RhelProvider.basePlatform("8") == null)
  }

  test("multi-stream fix: VulnerableRange + per-stream Advisories (J3+A2)") {
    val it = item("rhel:9/cve-2024-1111")
    // canonical = newest base's fix
    assert(it.contains("\"Version\":\"0:2.46.1-2.el9_5\""))
    assert(it.contains("\"VulnerableRange\":\"< 0:2.44.3-2.el9_4.5 || " +
      ">= 0:2.46.1, < 0:2.46.1-2.el9_5\""))
    // per-stream advisories newest first, FPI minor + channels
    assert(it.indexOf("RHSA-2024:0001") < it.indexOf("RHSA-2024:0002"))
    assert(it.contains("\"Minor\":5") && it.contains("\"Minor\":4"))
    assert(it.contains("\"Channels\":[\"ga\"]") &&
      it.contains("\"Channels\":[\"eus\"]"))
    // folded advisory summary carries both RHSAs
    assert(it.contains(
      "https://access.redhat.com/errata/RHSA-2024:0001") &&
      it.contains("https://access.redhat.com/errata/RHSA-2024:0002"))
    // cvss: hydra base score + vector-derived sub-scores
    assert(it.contains("\"base_score\":9.8") &&
      it.contains("\"base_severity\":\"Critical\"") &&
      it.contains("\"version\":\"3.1\""))
    assert(it.contains("\"Severity\":\"High\"")) // important → High
    assert(it.contains("WebKitGTK use-after-free")) // details[-1]
  }

  test("EUS namespace emitted; base platform inferred as wont-fix") {
    val eus = item("rhel:8.6+eus/cve-2024-1111")
    assert(eus.contains("\"Version\":\"0:2.40.0-1.el8_6\""))
    assert(eus.contains("RHSA-2024:0003"))
    // inferred base record: wont-fix None, no advisory summary
    val base = item("rhel:8/cve-2024-1111")
    assert(base.contains("\"Version\":\"None\""))
    assert(base.contains("\"NoAdvisory\":true"))
    assert(!base.contains("AdvisorySummary"))
  }

  test("els platform never emitted, but infers its base namespace") {
    assert(env.filter(col("identifier").contains("+els")).isEmpty)
    val six = item("rhel:6/cve-2024-1111")
    assert(six.contains("\"NoAdvisory\":true") &&
      six.contains("\"Version\":\"None\""))
  }

  test("package_state: wont-fix, flatpak skip, Not affected NAK (A4)") {
    val seven = item("rhel:7/cve-2024-1111")
    assert(seven.contains("\"NoAdvisory\":true"))
    // flatpak module rows are skipped everywhere
    assert(env.filter(col("item").contains("flatpak")).isEmpty)
    // Not affected → Version "0", advisory present-but-empty
    val nine = item("rhel:9/cve-2024-2222")
    assert(nine.contains("\"Version\":\"0\""))
    assert(nine.contains("\"AdvisorySummary\":[]"))
  }

  test("Affected package_state trumps a same-bucket fix; Hydra fallback") {
    val eight = item("rhel:8/cve-2024-2222")
    // httpd fix suppressed by the Affected state → Version None
    assert(eight.contains("\"Name\":\"httpd\",\"NamespaceName\"") &&
      eight.contains("\"Version\":\"None\""))
    assert(!eight.contains("2.4.37"))
    // tomcat has no CSAF row → Hydra-parsed version survives (epoch-mid)
    assert(eight.contains("\"Version\":\"1:9.0.62-27.el8\""))
    // single stream: no VulnerableRange, no Advisories table
    assert(!eight.contains("VulnerableRange") && !eight.contains("\"Advisories\""))
    assert(eight.contains("RHSA-2024:0010"))
    // no cvss3 in doc → empty CVSS array
    assert(eight.contains("\"CVSS\":[]"))
  }

  test("skip_namespaces drops both direct and inferred namespaces") {
    val skipped = RhelProvider.envelopes(hydra, fpis,
      skipNamespaces = Set("rhel:7", "rhel:6"))
    val ids = skipped.select("identifier").as[String].collect().toSet
    assert(!ids.exists(i => i.startsWith("rhel:7/") || i.startsWith("rhel:6/")))
    assert(ids.contains("rhel:9/cve-2024-1111"))
  }
}
