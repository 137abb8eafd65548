package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.{ResultStore, SchemaGate}

/** Output schema-validation gate (VERDICT r2 item 5, mirroring
  * `src/vunnel/schema.py:23-36` + the os/schema-1.1.0 required lists):
  * malformed envelopes are quarantined, valid ones ship unchanged.
  */
class SchemaGateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val ok =
    """{"Vulnerability":{"Name":"CVE-2024-1","NamespaceName":"wolfi:rolling",
      |"Description":"d","Severity":"High","Link":"https://x",
      |"FixedIn":[{"Name":"busybox","NamespaceName":"wolfi:rolling",
      |"Version":"1.36.1-r0","VersionFormat":"apk"}],
      |"CVSS":[{"version":"3.1","vector_string":"CVSS:3.1/AV:N",
      |"status":"N/A","base_metrics":{"base_score":7.5,
      |"base_severity":"High","exploitability_score":3.9,
      |"impact_score":3.6}}]}}""".stripMargin.replaceAll("\n", "")

  private def env(id: String, item: String, schema: String = Envelope.OsSchema) =
    (id, schema, item)

  test("os schema: required-field and required-element violations quarantine") {
    val rows = Seq(
      env("good", ok),
      // missing required Severity
      env("no-sev", """{"Vulnerability":{"Name":"C","NamespaceName":"n","Description":"d","Link":"l"}}"""),
      // flat record without the Vulnerability wrapper: quarantined
      env("no-wrapper", """{"Name":"C","NamespaceName":"n","Description":"d","Severity":"Low","Link":"l"}"""),
      // FixedIn entry missing Version
      env("bad-fix", """{"Vulnerability":{"Name":"C","NamespaceName":"n","Description":"d",
        |"Severity":"Low","Link":"l","FixedIn":[{"Name":"p",
        |"NamespaceName":"n","VersionFormat":"apk"}]}}""".stripMargin.replaceAll("\n", "")),
      // CVSS entry missing base_metrics.impact_score
      env("bad-cvss", """{"Vulnerability":{"Name":"C","NamespaceName":"n","Description":"d",
        |"Severity":"Low","Link":"l","CVSS":[{"version":"3.1",
        |"vector_string":"v","status":"N/A","base_metrics":{
        |"base_score":1.0,"base_severity":"Low",
        |"exploitability_score":1.0}}]}}""".stripMargin.replaceAll("\n", "")),
      // not JSON at all
      env("garbage", "not json")
    ).toDF("identifier", "schema", "item")

    val (good, bad) = SchemaGate.validate(rows)
    assert(good.select("identifier").as[String].collect().toSet == Set("good"))
    assert(bad.select("identifier").as[String].collect().toSet ==
      Set("no-sev", "no-wrapper", "bad-fix", "bad-cvss", "garbage"))
    // valid rows ship byte-identical
    assert(good.select("item").as[String].head() == ok)
  }

  test("empty FixedIn/CVSS arrays and absent optionals are valid") {
    val rows = Seq(
      env("min", """{"Vulnerability":{"Name":"C","NamespaceName":"n","Description":"d",
        |"Severity":"Unknown","Link":"l"}}""".stripMargin.replaceAll("\n", "")),
      env("empty-arrays", """{"Vulnerability":{"Name":"C","NamespaceName":"n","Description":"d",
        |"Severity":"Low","Link":"l","FixedIn":[],"CVSS":[]}}"""
        .stripMargin.replaceAll("\n", ""))
    ).toDF("identifier", "schema", "item")
    val (good, bad) = SchemaGate.validate(rows)
    assert(bad.isEmpty && good.count() == 2)
  }

  test("schema version matrix: a field newer than the declared version " +
      "quarantines; the right version ships it") {
    def fixedIn(extra: String) =
      s"""{"Vulnerability":{"Name":"C","NamespaceName":"rhel:9","Description":"d",
        |"Severity":"Low","Link":"l","FixedIn":[{"Name":"p",
        |"NamespaceName":"rhel:9","Version":"0:1-1.el9",
        |"VersionFormat":"rpm"$extra}]}}""".stripMargin.replaceAll("\n", "")
    val vrange = fixedIn(""","VulnerableRange":"< 0:1-1.el9"""")
    val issued = fixedIn(""","Issued":"2024-01-01"""")
    val avail = fixedIn(
      ""","Available":{"Date":"2024-01-01","Kind":"first-observed"}""")
    val arch = fixedIn(""","Arch":"aarch64"""")
    val advisories = fixedIn(
      ""","Advisories":[{"Advisory":"RHSA-2024:1","Version":"0:1-1.el9",
        |"Minor":2,"Channels":["eus"]}]""".stripMargin.replaceAll("\n", ""))
    val rows = Seq(
      // 1.0.0 accepts none of the later fields
      env("v100-range", vrange, Envelope.osSchema("1.0.0")),
      env("v100-plain", fixedIn(""), Envelope.osSchema("1.0.0")),
      // VulnerableRange arrived in 1.0.1
      env("v101-range", vrange, Envelope.osSchema("1.0.1")),
      // Issued is 1.0.2-only: valid there, gone in 1.1.0
      env("v102-issued", issued, Envelope.osSchema("1.0.2")),
      env("v110-issued", issued, Envelope.osSchema("1.1.0")),
      // Available (1.1.0), Arch (1.1.1), Advisories (1.1.2)
      env("v110-avail", avail, Envelope.osSchema("1.1.0")),
      env("v102-avail", avail, Envelope.osSchema("1.0.2")),
      env("v111-arch", arch, Envelope.osSchema("1.1.1")),
      env("v110-arch", arch, Envelope.osSchema("1.1.0")),
      env("v112-advisories", advisories, Envelope.osSchema("1.1.2")),
      env("v110-advisories", advisories, Envelope.osSchema("1.1.0")),
      // 1.1.2 Advisories entries still require Advisory+Version
      env("v112-bad-advisory", fixedIn(
        ""","Advisories":[{"Minor":2}]"""), Envelope.osSchema("1.1.2"))
    ).toDF("identifier", "schema", "item")
    val (good, bad) = SchemaGate.validate(rows)
    assert(good.select("identifier").as[String].collect().toSet == Set(
      "v100-plain", "v101-range", "v102-issued", "v110-avail",
      "v111-arch", "v112-advisories"))
    assert(bad.select("identifier").as[String].collect().toSet == Set(
      "v100-range", "v110-issued", "v102-avail", "v110-arch",
      "v110-advisories", "v112-bad-advisory"))
  }

  test("rhel envelopes carrying 1.1.2 Advisories pass the gate under " +
      "their pinned schema URL") {
    import graft.providers.RhelProvider
    val hydra = RhelProvider.hydraScan(spark,
      getClass.getResource("/fixtures/rhel_hydra.json").getPath)
    val fpis = Seq(
      ("RHSA-2024:0001", "CVE-2024-1111",
        "AppStream-9.5.0.Z.MAIN:webkit2gtk3-0:2.46.1-2.el9_5.x86_64",
        "cpe:/a:redhat:enterprise_linux:9::appstream", null, "webkit2gtk3",
        "0:2.46.1-2.el9_5"),
      ("RHSA-2024:0002", "CVE-2024-1111",
        "AppStream-9.4.0.Z.EUS:webkit2gtk3-0:2.44.3-2.el9_4.5.x86_64",
        "cpe:/a:redhat:enterprise_linux:9::appstream", null, "webkit2gtk3",
        "0:2.44.3-2.el9_4.5")
    ).toDF("rhsa_id", "cve", "fpi", "plat_cpe", "module", "name", "version")
    val envs = RhelProvider.envelopes(hydra, fpis)
    val (good, bad) = SchemaGate.validate(envs)
    assert(bad.isEmpty,
      "rhel envelopes quarantined: " +
        bad.select("identifier").as[String].collect().mkString(", "))
    // the fixture's two rhel:9 fix streams must actually exercise the
    // Advisories path — otherwise this test pins nothing
    import org.apache.spark.sql.functions.col
    assert(good.filter(col("item").contains("\"Advisories\"")).count() > 0)
  }

  test("unregistered schema family: parseable JSON object passes, junk fails") {
    val rows = Seq(
      env("nvd-ok", """{"anything":{"nested":true}}""", Envelope.NvdSchema),
      env("nvd-bad", "][", Envelope.NvdSchema)
    ).toDF("identifier", "schema", "item")
    val (good, bad) = SchemaGate.validate(rows)
    assert(good.select("identifier").as[String].collect().toSeq == Seq("nvd-ok"))
    assert(bad.select("identifier").as[String].collect().toSeq == Seq("nvd-bad"))
  }

  test("commitValidated: quarantine sidecar + clean store; strict throws") {
    val dir = java.nio.file.Files.createTempDirectory("graft-gate").toString
    val dest = s"$dir/results"
    val rows = Seq(env("good", ok), env("bad", "{}"))
      .toDF("identifier", "schema", "item")

    val (digest, quarantined) = ResultStore.commitValidated(spark, rows, dest)
    assert(digest.startsWith("xxh64:") && quarantined == 1)
    assert(ResultStore.read(spark, dest)
      .select("identifier").as[String].collect().toSeq == Seq("good"))
    assert(spark.read.parquet(s"$dest.quarantine")
      .select("identifier").as[String].collect().toSeq == Seq("bad"))

    val err = intercept[IllegalArgumentException] {
      ResultStore.commitValidated(spark, rows, s"$dir/strict", strict = true)
    }
    assert(err.getMessage.contains("schema validation"))

    // all-valid input: no quarantine dir, zero count
    val cleanDest = s"$dir/clean"
    val (_, zero) = ResultStore.commitValidated(spark,
      Seq(env("good", ok)).toDF("identifier", "schema", "item"), cleanDest)
    assert(zero == 0)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$cleanDest.quarantine")))

    // a clean re-run CLEARS the previous run's quarantine sidecar —
    // stale quarantine parquet would read as "still failing"
    val (_, zeroAgain) = ResultStore.commitValidated(spark,
      Seq(env("good", ok), env("bad", ok))
        .toDF("identifier", "schema", "item"), dest)
    assert(zeroAgain == 0)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dest.quarantine")),
      "stale quarantine sidecar must be deleted on a clean run")
  }
}
