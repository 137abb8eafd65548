package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.providers.{DebianProvider, FedoraProvider, GhsaProvider, RhelProvider, SecdbProvider}

/** Golden-snapshot byte-equality over full provider pipelines
  * (VERDICT r2 item 6; reference `tests/conftest.py:204-244` +
  * `tests/unit/providers/alpine/test_alpine.py:217-240`): same fixture
  * in → byte-identical canonical envelope out, failing on missing AND
  * unasserted snapshot files. Snapshots live in
  * `src/test/resources/snapshots/<provider>/`; re-record with
  * GRAFT_SNAPSHOT_UPDATE=1.
  */
class GoldenSnapshotSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fixture(name: String): String =
    getClass.getResource(s"/fixtures/$name").getPath

  test("secdb (wolfi) envelopes match committed snapshots byte-for-byte") {
    // first-observed dimension → Available in the committed bytes
    val fixdates = Seq(
      ("CVE-2022-30065", "busybox", "1.35.0-r3",
        "2022-06-10", "first-observed")
    ).toDF("vuln", "pkg", "version", "date", "kind")
    Golden.assertSnapshots("secdb",
      SecdbProvider.envelopes(spark, fixture("secdb.json"), "wolfi:rolling",
        fixdates = Some(fixdates)))
  }

  test("debian envelopes match committed snapshots byte-for-byte") {
    val rows = DebianProvider.packageRows(spark, fixture("debian_tracker.json"))
    val dsas = Seq(
      ("DSA-5343-1", "https://www.debian.org/security/2023/dsa-5343",
        "bullseye", "openssl", "CVE-2023-0286", "2023-02-08")
    ).toDF("dsa", "link", "rel", "pkg", "cve", "date")
    // legacy normalized-cve-data leg: Vectors-null strip, fixdater
    // Available patch, severity override, legacy-wins merge — all in
    // the committed bytes
    val legacyFixdates = Seq(
      ("CVE-2011-7777", "libdemo", "debian:7", "1.2-3+deb7u1",
        "2012-02-01", "first-observed")
    ).toDF("vuln", "pkg", "ecosystem", "version", "date", "kind")
    Golden.assertSnapshots("debian",
      DebianProvider.withLegacy(
        DebianProvider.envelopes(DebianProvider.withAdvisories(rows, dsas)),
        DebianProvider.legacyEnvelopes(spark, fixture("debian_legacy.json"),
          Some(legacyFixdates))))
  }

  test("ghsa envelopes match committed snapshots byte-for-byte") {
    // fix-date dimension → lower-case available {date, kind} record in
    // the committed bytes (`github/parser.py:740-751`)
    val fixdates = Seq(
      ("GHSA-aaaa-bbbb-cccc", "lodash", "npm", "4.17.21",
        "2021-02-20", "first-observed")
    ).toDF("vuln", "pkg", "ecosystem", "version", "date", "kind")
    Golden.assertSnapshots("ghsa",
      GhsaProvider.envelopes(
        GhsaProvider.advisories(spark, fixture("ghsa.json")),
        Some(fixdates)))
  }

  test("rhel envelopes match committed snapshots byte-for-byte") {
    val hydra = RhelProvider.hydraScan(spark, fixture("rhel_hydra.json"))
    // first-observed dimension exercises the fixdater Available leg —
    // rhel alone writes the lowercase {date, kind} pair
    val fixdates = Seq(
      ("CVE-2024-1111", "webkit2gtk3", "rhel:9", "0:2.46.1-2.el9_5",
        "2024-01-05", "first-observed")
    ).toDF("vuln", "pkg", "ecosystem", "version", "date", "kind")
    Golden.assertSnapshots("rhel",
      RhelProvider.envelopes(hydra, RhelFixtures.webkitFpis(spark),
        fixdates = Some(fixdates)))
  }

  test("fedora envelopes match committed snapshots byte-for-byte") {
    Golden.assertSnapshots("fedora",
      FedoraProvider.envelopes(spark, fixture("fedora_bodhi.json")))
  }

  test("amazon envelopes match committed snapshots byte-for-byte") {
    val html = scala.io.Source.fromFile(fixture("alas.html")).mkString
    // pubDate present → every FixedIn carries the advisory-kind
    // Available, the reference's always-accurate default candidate
    val pages = Seq(
      ("ALAS-2023-1726", "important",
        Seq("CVE-2023-1000", "CVE-2023-2000"), html,
        "https://alas.aws.amazon.com/AL2/ALAS-2023-1726.html",
        "2023-02-17 22:51:00")
    ).toDF("alas_id", "severity", "cves", "html", "url", "date")
    Golden.assertSnapshots("amazon",
      graft.providers.AmazonProvider.envelopes(pages, "amzn:2"))
  }

  test("chainguard OSV-leg envelopes match committed snapshots " +
      "byte-for-byte") {
    import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
    import java.util.zip.GZIPOutputStream
    // the feed is a tar.gz of per-advisory OSV files; a member whose
    // basename is not a well-formed CGA id must be skipped
    val rec1 =
      """{"id":"CGA-23cf-gh45-jm67","schema_version":"1.7.0",
        |"modified":"2026-02-21T00:00:00Z","published":"2026-02-20T00:00:00Z",
        |"summary":"syncthing relay RCE","severity":[{"type":"CVSS_V3",
        |"score":"CVSS:3.1/AV:N/AC:L/PR:N/UI:N/S:U/C:H/I:H/A:H"}],
        |"affected":[{"package":{"ecosystem":"Chainguard","name":"syncthing",
        |"purl":"pkg:apk/chainguard/syncthing?arch=x86_64"},
        |"ranges":[{"type":"ECOSYSTEM","events":[{"introduced":"0"},
        |{"fixed":"2.0.14-r1"}]}],
        |"ecosystem_specific":{"components":[{"advisory_id":"CGA-23cf-gh45-0001",
        |"component_location":"/usr/bin/syncthing","component_name":"syncthing",
        |"component_purl":"pkg:golang/github.com/syncthing/syncthing@v2.0.13",
        |"component_type":"go-module","component_version":"2.0.13",
        |"note":"Upgraded to 2.0.14","status":"fixed",
        |"justification":"component_present"}]}}],
        |"upstream":["CVE-2026-99999"],
        |"references":[{"type":"ADVISORY",
        |"url":"https://advisories.example.invalid/CGA-23cf-gh45-jm67"}],
        |"database_specific":{"severity":"High",
        |"cpes":["cpe:2.3:a:syncthing:syncthing:*:*:*:*:*:*:*:*"]}}"""
        .stripMargin.replace("\n", "")
    val rec2 =
      """{"id":"CGA-pqrv-wx23-4567","schema_version":"1.7.0",
        |"modified":"2026-03-01T00:00:00Z","published":"2026-02-28T00:00:00Z",
        |"summary":"zlib header overread","withdrawn":"2026-03-05T00:00:00Z",
        |"affected":[{"package":{"ecosystem":"Chainguard","name":"zlib",
        |"purl":"pkg:apk/chainguard/zlib?arch=x86_64"},
        |"ranges":[{"type":"ECOSYSTEM","events":[{"introduced":"0"}]}]}]}"""
        .stripMargin.replace("\n", "")
    val dir = java.nio.file.Files.createTempDirectory("cg_osv")
    val tarPath = dir.resolve("chainguard.tar.gz")
    val tar = new TarArchiveOutputStream(new GZIPOutputStream(
      java.nio.file.Files.newOutputStream(tarPath)))
    def add(name: String, content: String): Unit = {
      val b = content.getBytes("UTF-8")
      val e = new TarArchiveEntry(name)
      e.setSize(b.length.toLong)
      tar.putArchiveEntry(e); tar.write(b); tar.closeArchiveEntry()
    }
    add("CGA-23cf-gh45-jm67.json", rec1)
    add("CGA-pqrv-wx23-4567.json", rec2)
    add("notes.json", """{"id":"CGA-2222-3333-4444"}""") // bad member name
    tar.close()
    val fixdates = Seq(
      ("CGA-23cf-gh45-jm67", "Chainguard", "syncthing", "2.0.14-r1",
        "2026-02-20", "advisory")
    ).toDF("vuln_id", "ecosystem", "pkg", "version", "date", "kind")
    val env = graft.providers.ChainguardProvider.osvEnvelopes(spark,
      tarPath.toString, Some(fixdates))
    // invalid member skipped, ids keep their case
    assert(env.count() == 2)
    Golden.assertSnapshots("chainguard_osv", env)
  }

  test("nvd passthrough envelopes match committed snapshots byte-for-byte") {
    // the vulnerable cpeMatch with versionEndExcluding 1.4.3 gains the
    // in-place fix {version, date, kind} object (`manager.py:341-394`)
    val fixdates = Seq(
      ("CVE-2023-1234", "cpe:2.3:a:vendor:product:*:*:*:*:*:*:*:*",
        "1.4.3", "2023-04-30", "first-observed")
    ).toDF("vuln", "cpe", "version", "date", "kind")
    Golden.assertSnapshots("nvd",
      graft.providers.NvdProvider.envelopes(spark, fixture("nvd_page.json"),
        Some(fixdates)))
  }

  test("hummingbird (csaf-vex) envelopes match committed snapshots " +
      "byte-for-byte") {
    Golden.assertSnapshots("hummingbird",
      graft.providers.VexProvider.envelopes(spark, fixture("csaf_vex.json")))
  }

  test("ubuntu envelopes (Pro→base inference in the bytes) match " +
      "committed snapshots byte-for-byte") {
    import graft.providers.OsvProvider
    val osv = OsvProvider.read(spark, fixture("osv.json"))
    val fixdates = Seq(
      ("CVE-2023-1111", "openssl", "3.0.2-0ubuntu1.9", "2023-03-15",
        "first-observed")
    ).toDF("cve", "pkg", "version", "date", "kind")
    val env = OsvProvider.envelopes(OsvProvider.fixedInRows(
      OsvProvider.proToBaseInference(OsvProvider.affectedRows(osv)),
      fixdates))
    Golden.assertSnapshots("ubuntu", env)
    // J7 visible in the snapshot bytes: CVE-2023-1111 is fixed ONLY on
    // the Pro 18.04 channel in the fixture, so a synthesized base
    // wont-fix envelope must exist with Version None + NoAdvisory true
    val inferred = java.nio.file.Files.readString(
      Golden.root.resolve("ubuntu/ubuntu_18.04/cve-2023-1111.json"))
    assert(inferred.contains("\"Version\": \"None\""))
    assert(inferred.contains("\"NoAdvisory\": true"))
    // ...alongside the real Pro-channel fix envelope
    val pro = java.nio.file.Files.readString(
      Golden.root.resolve("ubuntu/ubuntu_18.04+esm/cve-2023-1111.json"))
    assert(pro.contains("\"Version\": \"1.1.1-1ubuntu2.1+esm1\""))
  }

  test("rocky passthrough envelopes match committed snapshots " +
      "byte-for-byte") {
    import graft.providers.OsvProvider
    val recs = OsvProvider.readPassthrough(spark, fixture("rocky_osv.json"))
    // store date BEFORE the record's 2023-08-08 published date: the
    // published candidate fails best()'s <= cap, so the accurate
    // first-observed date itself wins for rocky:8
    val fixdates = Seq(
      ("RLSA-2023:4523", "rocky:8", "open-vm-tools", "12.1.5-2.el8_8.3",
        "2023-08-07", "first-observed")
    ).toDF("vuln_id", "ecosystem", "pkg", "version", "date", "kind")
    Golden.assertSnapshots("rocky", OsvProvider.passthroughEnvelopes(
      recs, fixdates, OsvProvider.rockyEcosystem))
    // F19 in the bytes, with each date BOUND to its range (four
    // substring-presence checks would survive a swap regression
    // straight into a blind re-record): walk the snapshot's affected[]
    // and map ecosystem → (date, kind) of its range's anchore fixes
    val patched = java.nio.file.Files.readString(
      Golden.root.resolve("rocky/rlsa-2023_4523.json"))
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(patched)
    val byEco = root.get("item").get("affected").elements()
    val bound = scala.collection.mutable.Map.empty[String, (String, String)]
    while (byEco.hasNext) {
      val a = byEco.next()
      val eco = a.get("package").get("ecosystem").asText()
      val fix = a.get("ranges").get(0).get("database_specific")
        .get("anchore").get("fixes").get(0)
      bound(eco) = (fix.get("date").asText(), fix.get("kind").asText())
    }
    assert(bound("Rocky Linux:8") == (("2023-08-07", "first-observed")),
      s"rocky:8 must carry the accurate store date, got $bound")
    assert(bound("Rocky Linux:9") == (("2023-08-08", "advisory")),
      s"rocky:9 must fall back to the advisory date, got $bound")
  }

  test("govulndb passthrough envelopes match committed snapshots " +
      "byte-for-byte") {
    import graft.providers.OsvProvider
    val recs = OsvProvider.readPassthrough(spark,
      fixture("govulndb_osv.json"))
    val fixdates = Seq.empty[(String, String, String, String, String, String)]
      .toDF("vuln_id", "ecosystem", "pkg", "version", "date", "kind")
    Golden.assertSnapshots("govulndb",
      OsvProvider.passthroughEnvelopes(recs, fixdates))
    // multi-event range: BOTH fixed versions get the published-date
    // fallback, event order preserved
    val go = java.nio.file.Files.readString(
      Golden.root.resolve("govulndb/go-2023-1558.json"))
    assert(go.indexOf("\"version\": \"1.19.6\"") >= 0 &&
      go.indexOf("\"version\": \"1.19.6\"") <
        go.indexOf("\"version\": \"1.20.1\""))
    // raw-record fidelity (r7 ADVICE): record-level database_specific,
    // credits, and affected-level ecosystem_specific survive to the
    // bytes — and the envelope schema carries the record's OWN version
    assert(go.contains("\"url\": \"https://pkg.go.dev/vuln/GO-2023-1558\""))
    assert(go.contains("\"credits\""))
    assert(go.contains("\"imports\""))
    assert(go.contains("schema-1.3.1.json"))
  }

  test("bitnami passthrough envelopes match committed snapshots " +
      "byte-for-byte") {
    import graft.providers.OsvProvider
    val recs = OsvProvider.readPassthrough(spark,
      fixture("bitnami_osv.json"))
    // store date BEFORE the record's 2023-10-18 published date so the
    // accurate first-observed date survives best()'s candidate cap
    val fixdates = Seq(
      ("BIT-redis-2023-45145", "bitnami", "redis", "7.2.2",
        "2023-10-17", "first-observed")
    ).toDF("vuln_id", "ecosystem", "pkg", "version", "date", "kind")
    Golden.assertSnapshots("bitnami",
      OsvProvider.passthroughEnvelopes(recs, fixdates))
    // the `versions` passthrough field and the dated fix both survive
    val redis = java.nio.file.Files.readString(
      Golden.root.resolve("bitnami/bit-redis-2023-45145.json"))
    assert(redis.contains("\"7.2.0\"") &&
      redis.contains("\"date\": \"2023-10-17\""))
  }

  // The secdb VARIANTS are config-differentiated runs of the same
  // family (reference chainguard/minimos/secureos reusing the wolfi
  // parser with their own namespace+URL): each gets its OWN golden dir
  // AND its own fixture with a distinguishing package/version shape
  // (r9: previously all three replayed the shared secdb.json, so a
  // family-specific regression could hide behind identical input
  // bytes — VERDICT r8 item 7).
  test("chainguard envelopes match committed snapshots byte-for-byte") {
    import spark.implicits._
    val fixdates = Seq(
      ("CVE-2023-4911", "glibc", "2.38-r10", "2023-10-03",
        "first-observed")
    ).toDF("vuln", "pkg", "version", "date", "kind")
    Golden.assertSnapshots("chainguard",
      SecdbProvider.envelopes(spark, fixture("secdb_chainguard.json"),
        "chainguard:rolling", fixdates = Some(fixdates)))
    val one = java.nio.file.Files.readString(Golden.root.resolve(
      "chainguard/chainguard_rolling/cve-2023-4911.json"))
    assert(one.contains("\"NamespaceName\": \"chainguard:rolling\""))
  }

  test("minimos envelopes match committed snapshots byte-for-byte") {
    import spark.implicits._
    val fixdates = Seq(
      ("CVE-2024-0684", "coreutils", "9.4-r1", "2024-01-12",
        "first-observed")
    ).toDF("vuln", "pkg", "version", "date", "kind")
    Golden.assertSnapshots("minimos",
      SecdbProvider.envelopes(spark, fixture("secdb_minimos.json"),
        "minimos:rolling", fixdates = Some(fixdates)))
  }

  test("secureos envelopes match committed snapshots byte-for-byte") {
    // apkVulnerableRange: the rqlite-client respins pin the per-stream
    // ">=<base>-r0, <fix>" ranges (and the 9.3.10 > 9.3.2 numeric sort)
    val fixdates = Seq(
      ("CVE-2023-46218", "curl", "8.5.0-r2", "2023-12-07",
        "first-observed")
    ).toDF("vuln", "pkg", "version", "date", "kind")
    Golden.assertSnapshots("secureos",
      SecdbProvider.envelopes(spark, fixture("secdb_secureos.json"),
        "secureos:rolling", fixdates = Some(fixdates),
        apkVulnerableRange = true))
  }

  test("alpine envelopes (rejection NAKs in the bytes) match committed " +
      "snapshots byte-for-byte") {
    import spark.implicits._
    val rejections = Seq(("busybox", "CVE-2022-30065")).toDF("pkg_name", "vuln_id")
    val fixdates = Seq(
      ("CVE-2023-0286", "openssl", "3.0.8-r0", "2023-02-09",
        "first-observed")
    ).toDF("vuln", "pkg", "version", "date", "kind")
    Golden.assertSnapshots("alpine",
      SecdbProvider.envelopes(spark, fixture("secdb.json"), "alpine:3.18",
        rejections = Some(rejections), fixdates = Some(fixdates)))
    // J9 visible in the bytes: the rejected secfix is replaced by a
    // not-affected NAK row (Version "0"), not silently dropped
    val nak = java.nio.file.Files.readString(Golden.root.resolve(
      "alpine/alpine_3.18/cve-2022-30065.json"))
    assert(nak.contains("\"Version\": \"0\""))
  }

  test("oracle ELSA envelopes (advisory-keyed, ksplice guard) match " +
      "committed snapshots byte-for-byte") {
    import graft.providers.OvalProvider
    Golden.assertSnapshots("oracle_elsa",
      OvalProvider.elsaEnvelopes(
        OvalProvider.elsaRows(spark, fixture("elsa_oval.xml"))))
  }

  test("oracle envelopes (ksplice guard active) match committed " +
      "snapshots byte-for-byte") {
    import graft.providers.OvalProvider
    val rows = OvalProvider.resolvedRows(spark, fixture("oval.xml"))
    Golden.assertSnapshots("oracle",
      OvalProvider.envelopes(rows, "ol:9", dropKsplice = true))
  }

  test("chainguard_libraries annotated-openvex envelopes match " +
      "committed snapshots byte-for-byte") {
    import graft.providers.VexProvider
    Golden.assertSnapshots("chainguard_libraries",
      VexProvider.libraryEnvelopes(spark,
        fixture("chainguard_openvex.json"), "maven"))
    // product filtering in the bytes: the non-cgr maven artifact and
    // the npm artifact are gone; the advisory-timestamp fix date is in
    val m = java.nio.file.Files.readString(Golden.root.resolve(
      "chainguard_libraries/chainguard-libraries_maven/CVE-2024-31573.json"))
    assert(m.contains("2.10.0.cgr.1") && !m.contains("@2.9.1"))
    assert(m.contains("\"date\": \"2024-05-02\"") &&
      m.contains("\"kind\": \"advisory\""))
    // the non-fixed statement is quarantined, not emitted
    assert(!java.nio.file.Files.exists(Golden.root.resolve(
      "chainguard_libraries/chainguard-libraries_maven/CVE-2024-50000.json")))
    // a statement with NO products array still emits, with
    // products: []/fixes: [] — the reference assigns
    // statement["products"] = new_products unconditionally
    // (openvex_parser.py:247-257); null fields here would make
    // canonicalJson drop both keys
    val empty = java.nio.file.Files.readString(Golden.root.resolve(
      "chainguard_libraries/chainguard-libraries_maven/CVE-2024-60000.json"))
    assert(empty.contains("\"products\": []") &&
      empty.contains("\"fixes\": []"))
  }

  test("kev passthrough envelopes match committed snapshots byte-for-byte") {
    Golden.assertSnapshots("kev",
      graft.providers.AuxProviders.kevEnvelopes(spark, fixture("kev.json")))
    // record passthrough: the cwes array and ransomware flag survive
    val one = java.nio.file.Files.readString(
      Golden.root.resolve("kev/kev_cve-2023-1000.json"))
    assert(one.contains("\"CWE-77\"") && one.contains("\"CWE-78\""))
    assert(one.contains("\"knownRansomwareCampaignUse\": \"Known\""))
    assert(one.contains("\"identifier\": \"kev:cve-2023-1000\""))
  }

  test("epss envelopes match committed snapshots byte-for-byte") {
    Golden.assertSnapshots("epss",
      graft.providers.AuxProviders.epssEnvelopes(spark, fixture("epss.csv")))
    // the comment-header score_date lands as the day-part date field
    val one = java.nio.file.Files.readString(
      Golden.root.resolve("epss/cve-2022-30065.json"))
    assert(one.contains("\"date\": \"2024-02-07\""))
    assert(one.contains("\"epss\": 0.00388"))
  }

  test("eol envelopes match committed snapshots byte-for-byte") {
    Golden.assertSnapshots("eol",
      graft.providers.AuxProviders.eolEnvelopes(spark, fixture("eol.json")))
    // passthrough fidelity: product + identifiers merged into the
    // release record; keys a product never carries (isEoas for python)
    // are ABSENT, not null — the reference's dict shape
    val ub = java.nio.file.Files.readString(
      Golden.root.resolve("eol/ubuntu_18.04.json"))
    assert(ub.contains("\"isEoas\": true") &&
      ub.contains("\"product\": \"ubuntu\""))
    val py = java.nio.file.Files.readString(
      Golden.root.resolve("eol/python_3.6.json"))
    assert(!py.contains("isEoas") && py.contains("\"isEol\": true"))
  }

  test("a drifted envelope is caught as a byte mismatch") {
    assume(!Golden.update, "negative checks don't apply while re-recording")
    val good = SecdbProvider.envelopes(spark, fixture("secdb.json"), "wolfi:rolling")
    import org.apache.spark.sql.functions._
    val drifted = good.withColumn("item",
      regexp_replace(col("item"), "\"Severity\":\"Unknown\"",
        "\"Severity\":\"Critical\""))
    val err = intercept[AssertionError] {
      Golden.assertSnapshots("secdb", drifted)
    }
    assert(err.getMessage.contains("byte mismatches"))
  }

  test("an extra committed snapshot (unasserted) fails the run") {
    assume(!Golden.update, "negative checks don't apply while re-recording")
    val extra = Golden.root.resolve("secdb/zz-unasserted.json")
    java.nio.file.Files.writeString(extra, "{}\n")
    try {
      val err = intercept[AssertionError] {
        Golden.assertSnapshots("secdb",
          SecdbProvider.envelopes(spark, fixture("secdb.json"), "wolfi:rolling"))
      }
      assert(err.getMessage.contains("not asserted"))
    } finally java.nio.file.Files.delete(extra)
  }
}
