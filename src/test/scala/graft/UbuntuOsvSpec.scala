package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.providers.UbuntuProvider

/** The ubuntu OSV-native pipeline (`providers/ubuntu/parser.py`):
  * per-ecosystem slicing, VEX won't-fix stamping, Pro→base inference
  * synthesis, and the USN-first fix-date patch. */
class UbuntuOsvSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def recs = UbuntuProvider.records(spark,
    getClass.getResource("/fixtures/ubuntu_osv").getPath)
  private def vex = spark.read.option("multiLine", "true")
    .json(getClass.getResource("/fixtures/ubuntu_vex.json").getPath)
  private def usn = UbuntuProvider.usnFixDates(
    spark.read.option("multiLine", "true")
      .json(getClass.getResource("/fixtures/ubuntu_usn.json").getPath))

  private lazy val env = UbuntuProvider.envelopes(recs, Some(vex),
    fixdates = Some(Seq(
      // the store's first-observed date for the same openssl tuple is
      // LATER than the USN publish — the USN candidate must win
      ("CVE-2023-1111", "Ubuntu:22.04:LTS", "openssl",
        "3.0.2-0ubuntu1.9", "2023-05-09", "first-observed"),
      ("CVE-2023-5555", "Ubuntu:Pro:16.04:LTS", "libarchive",
        "3.1.2-11ubuntu0.16.04.8+esm2", "2023-05-20", "first-observed")
    ).toDF("vuln_id", "ecosystem", "pkg", "version", "date", "kind")),
    usnDates = Some(usn)).cache()

  private def item(id: String): String =
    env.filter(col("identifier") === id).head().getAs[String]("item")

  test("slicing: one fragment per ecosystem, slug identifiers, record " +
      "schema version") {
    val ids = env.select("identifier").collect().map(_.getString(0)).toSet
    assert(ids == Set(
      "ubuntu-22.04-lts/ubuntu-cve-2023-1111",
      "ubuntu-pro-22.04-lts/ubuntu-cve-2023-1111",
      "ubuntu-pro-fips-22.04-lts/ubuntu-cve-2023-1111",
      "ubuntu-pro-16.04-lts/ubuntu-cve-2023-5555",
      "ubuntu-16.04-lts/ubuntu-cve-2023-5555"))
    assert(env.select("schema").head().getString(0)
      .contains("osv/schema-1.7.0.json"))
  }

  test("VEX wont-fix stamps the matching base entry only (source-arch " +
      "purl, affected status, wont-fix opening)") {
    val base = item("ubuntu-22.04-lts/ubuntu-cve-2023-1111")
    // curl: stamped (affected + decided-not-to-fix statement)
    assert(base.contains("\"name\":\"curl\""))
    assert(base.matches("(?s).*curl.*wont-fix.*"))
    // openssl: its statement has status "fixed" → NOT stamped
    assert(!base.matches("(?s).*openssl[^}]*wont-fix.*"))
  }

  test("Pro→base inference: missing package synthesized with provenance; " +
      "shared package not duplicated") {
    val base = item("ubuntu-22.04-lts/ubuntu-cve-2023-1111")
    // dietlibc exists only in the Pro slice → synthesized into base
    assert(base.contains("\"name\":\"dietlibc\""))
    assert(base.contains("\"kind\":\"pro-only-fix\""))
    assert(base.contains("\"source_ecosystems\":[\"Ubuntu:Pro:22.04:LTS\"]"))
    // the synthetic entry: base ecosystem, introduced-only range, purl
    // dropped, binaries carried
    assert(base.contains("\"ecosystem\":\"Ubuntu:22.04:LTS\",\"name\":\"dietlibc\""))
    assert(!base.contains("esm-apps/jammy"))
    assert(base.contains("\"binary_name\":\"dietlibc-dev\""))
    // openssl exists in base → exactly one base openssl entry
    assert(base.split("\"name\":\"openssl\"").length == 2)
    // the FIPS sub-tier never infers into base
    assert(!base.contains("openssl-fips"))
  }

  test("CVE with no base slice gets a synthetic base envelope from the " +
      "Pro template") {
    val synth = item("ubuntu-16.04-lts/ubuntu-cve-2023-5555")
    assert(synth.contains("\"id\":\"UBUNTU-CVE-2023-5555\""))
    assert(synth.contains("\"ecosystem\":\"Ubuntu:16.04:LTS\""))
    assert(synth.contains("\"status\":\"wont-fix\""))
    assert(synth.contains("\"source_ecosystems\":[\"Ubuntu:Pro:16.04:LTS\"]"))
    // top-level fields inherited from the Pro record
    assert(synth.contains("\"details\":\"Out-of-bounds read"))
    // and the Pro fragment itself still emits verbatim with its own fix
    val pro = item("ubuntu-pro-16.04-lts/ubuntu-cve-2023-5555")
    assert(pro.contains("\"fixed\":\"3.1.2-11ubuntu0.16.04.8+esm2\""))
    assert(pro.contains("esm-infra/xenial"))
  }

  test("fix-date patch: USN publish date beats the first-observed " +
      "store; upstream CVE keys the lookup") {
    val base = item("ubuntu-22.04-lts/ubuntu-cve-2023-1111")
    // USN-9999-1 published 2023-03-20 wins over the store's 2023-05-09
    assert(base.contains(
      "\"fixes\":[{\"version\":\"3.0.2-0ubuntu1.9\"," +
        "\"date\":\"2023-03-20\",\"kind\":\"advisory\"}]"), base)
    // the Pro slice's esm fix tuple also matches its USN row
    val pro = item("ubuntu-pro-22.04-lts/ubuntu-cve-2023-1111")
    assert(pro.contains("\"date\":\"2023-03-20\""))
    // store-only tuple (no USN coverage, store date BEFORE the record's
    // published date so the published candidate fails best()'s <= cap)
    // falls back to first-observed — proves the lookup keys by upstream
    // CVE, not the UBUNTU-CVE id
    val xenial = item("ubuntu-pro-16.04-lts/ubuntu-cve-2023-5555")
    assert(xenial.contains("\"date\":\"2023-05-20\"") &&
      xenial.contains("\"kind\":\"first-observed\""))
  }

  test("golden snapshots byte-match") {
    Golden.assertSnapshots("ubuntu_osv", env)
  }

  test("fragment freeze (K4): a run without an ecosystem leaves its " +
      "last fragment untouched") {
    val dir = java.nio.file.Files.createTempDirectory("ubuntu_frag")
      .toString
    UbuntuProvider.writeFragments(env, dir)
    val full = spark.read.parquet(dir).count()
    // second run: a feed where 16.04 has gone EOL (only the 2023-1111
    // record remains) — its fragments must survive the rewrite
    val survivors = UbuntuProvider.envelopes(
      recs.filter(col("rec.id") === "UBUNTU-CVE-2023-1111"), Some(vex))
    UbuntuProvider.writeFragments(survivors, dir)
    val after = spark.read.parquet(dir)
    assert(after.count() == full)
    val ecos = after.select("eco_slug").distinct().collect()
      .map(_.getString(0)).toSet
    assert(ecos.contains("ubuntu-16.04-lts") &&
      ecos.contains("ubuntu-pro-16.04-lts"), s"frozen EOL lost: $ecos")
  }
}
