package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.QualityGate

/** The match-quality gate analog (reference
  * `tests/quality/config.yaml:1-7`) run against two providers' BUILT
  * envelopes: labeled (package, installed-version) → expected-CVE
  * matches, failing on any false negative. */
class QualityGateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val alpineEnv = graft.providers.SecdbProvider.envelopes(
    spark, getClass.getResource("/fixtures/secdb.json").getPath,
    "alpine:3.18")

  private lazy val debianEnv = {
    import graft.providers.DebianProvider
    val rows = DebianProvider.packageRows(spark,
      getClass.getResource("/fixtures/debian_tracker.json").getPath)
    val dsas = Seq(
      ("DSA-5343-1", "https://www.debian.org/security/2023/dsa-5343",
        "bullseye", "openssl", "CVE-2023-0286", "2023-02-08")
    ).toDF("dsa", "link", "rel", "pkg", "cve", "date")
    DebianProvider.envelopes(DebianProvider.withAdvisories(rows, dsas))
  }

  test("alpine: labeled vulnerable installs all match (0 false negatives)") {
    val labels = Seq(
      // below the fix version → must match
      ("busybox", "1.34.0-r0", "CVE-2022-30065"),
      ("busybox", "1.35.0-r3", "CVE-2023-1111"), // fixed only in 1.36.0-r0
      ("openssl", "3.0.7-r0", "CVE-2023-0286"),
      // "0" fix sentinel: vulnerable at ANY version
      ("openssl", "99.0.0-r0", "CVE-2021-9999"),
      ("zlib", "1.2.11-r0", "CVE-2022-37434")
    ).toDF("pkg", "version", "expected_vuln")
    QualityGate.assertNoFalseNegatives(alpineEnv, labels)
  }

  test("alpine: a dropped fix surfaces as an itemized false negative") {
    // installed ABOVE the fix → correctly not vulnerable → the gate
    // reports it, proving the comparator actually gates
    val labels = Seq(("busybox", "1.36.0-r0", "CVE-2023-1111"))
      .toDF("pkg", "version", "expected_vuln")
    val err = intercept[AssertionError] {
      QualityGate.assertNoFalseNegatives(alpineEnv, labels)
    }
    assert(err.getMessage.contains("busybox"))
    // and an expectation for a CVE the provider never emitted
    val missing = Seq(("busybox", "1.0.0-r0", "CVE-1999-0000"))
      .toDF("pkg", "version", "expected_vuln")
    assert(QualityGate.falseNegatives(alpineEnv, missing).count() == 1)
  }

  test("debian: labeled vulnerable installs all match (0 false negatives)") {
    val labels = Seq(
      ("openssl", "1.1.1n-0+deb11u3", "CVE-2023-0286"),
      // status "open" on bullseye → not-fixed sentinel, any version matches
      ("zlib", "1.2.11-1", "CVE-2023-0286")
    ).toDF("pkg", "version", "expected_vuln")
    QualityGate.assertNoFalseNegatives(debianEnv, labels)
  }

  private lazy val rhelEnv = {
    import graft.providers.RhelProvider
    val hydra = RhelProvider.hydraScan(spark,
      getClass.getResource("/fixtures/rhel_hydra.json").getPath)
    RhelProvider.envelopes(hydra, RhelFixtures.webkitFpis(spark))
  }

  test("rhel: labeled vulnerable installs all match under EVR " +
      "comparison (0 false negatives)") {
    val labels = Seq(
      // release-segment compare: el9_5 release 1 < fix release 2
      ("rhel:9", "webkit2gtk3", "0:2.46.1-1.el9_5", "CVE-2024-1111"),
      // dist-tag compare: el9_4 < el9_5 at equal version
      ("rhel:9", "webkit2gtk3", "0:2.46.1-2.el9_4", "CVE-2024-1111"),
      // EUS channel fix gates its own namespace
      ("rhel:8.6+eus", "webkit2gtk3", "0:2.39.0-1.el8_6", "CVE-2024-1111"),
      // A4 not-fixed-trumps-fixed: the base rhel:8 row is Version None
      // even though 8.6+eus ships a fix — an install ABOVE every
      // published fix version must still match on the base channel
      ("rhel:8", "webkit2gtk3", "0:2.99.0-1.el8", "CVE-2024-1111"),
      // epoch-ful fix, same epoch, release below
      ("rhel:8", "tomcat", "1:9.0.62-26.el8", "CVE-2024-2222"),
      // epoch precedence: installed epoch 0 < fix epoch 1, so a HIGHER
      // upstream version is still vulnerable
      ("rhel:8", "tomcat", "0:9.99.99-1.el8", "CVE-2024-2222"),
      // "0" sentinel on rhel:9 tomcat: any version matches
      ("rhel:9", "tomcat", "5:1.0.0-1", "CVE-2024-2222")
    ).toDF("namespace", "pkg", "version", "expected_vuln")
    QualityGate.assertNoFalseNegatives(rhelEnv, labels)
  }

  test("rhel: EVR boundary and namespace misses are itemized") {
    // installed == fix version exactly → not vulnerable → reported
    val atFix = Seq(
      ("rhel:9", "webkit2gtk3", "0:2.46.1-2.el9_5", "CVE-2024-1111"))
      .toDF("namespace", "pkg", "version", "expected_vuln")
    assert(QualityGate.falseNegatives(rhelEnv, atFix).count() == 1)
    // epoch at fix: 1:9.0.62-27.el8 == fix → not vulnerable
    val atEpochFix = Seq(
      ("rhel:8", "tomcat", "1:9.0.62-27.el8", "CVE-2024-2222"))
      .toDF("namespace", "pkg", "version", "expected_vuln")
    assert(QualityGate.falseNegatives(rhelEnv, atEpochFix).count() == 1)
    // namespace-scoped: the rhel:9 fix cannot satisfy a label pinned to
    // a namespace with no matching row at that version
    val wrongNs = Seq(
      ("rhel:6", "tomcat", "1:9.0.62-26.el8", "CVE-2024-2222"))
      .toDF("namespace", "pkg", "version", "expected_vuln")
    assert(QualityGate.falseNegatives(rhelEnv, wrongNs).count() == 1)
  }

  private lazy val slesEnv = graft.providers.SlesProvider.envelopes(
    spark, getClass.getResource("/fixtures/sles_oval.xml").getPath,
    majorVersion = "15")

  test("sles (oval family): labeled installs match per release " +
      "(0 false negatives)") {
    val labels = Seq(
      // rpm release compare below the fix, per-minor namespaces
      ("sles:15.1", "sqlite3", "3.36.0-3.12.0", "CVE-2025-4242"),
      ("sles:15.4", "sqlite3", "3.35.0-1.1", "CVE-2025-4242"),
      // "0" sentinel row (sqlite3-doc): any installed version matches
      ("sles:15.1", "sqlite3-doc", "99.0-0.1", "CVE-2025-4242"),
      ("sles:15.4", "curl", "8.0.1-1.0", "CVE-2025-5353")
    ).toDF("namespace", "pkg", "version", "expected_vuln")
    QualityGate.assertNoFalseNegatives(slesEnv, labels)
    // boundary: installed exactly at the fix → reported, not matched
    val atFix = Seq(("sles:15.4", "curl", "8.0.1-1.1", "CVE-2025-5353"))
      .toDF("namespace", "pkg", "version", "expected_vuln")
    assert(QualityGate.falseNegatives(slesEnv, atFix).count() == 1)
    // a release the OVAL never lists for this CVE
    val wrongRel = Seq(("sles:15.1", "curl", "7.0.0-1.0", "CVE-2025-5353"))
      .toDF("namespace", "pkg", "version", "expected_vuln")
    assert(QualityGate.falseNegatives(slesEnv, wrongRel).count() == 1)
  }

  private lazy val ubuntuEnv = {
    import graft.providers.OsvProvider
    val osv = OsvProvider.read(spark,
      getClass.getResource("/fixtures/osv.json").getPath)
    val fixdates = Seq(
      ("CVE-2023-1111", "openssl", "3.0.2-0ubuntu1.9", "2023-03-15",
        "first-observed")
    ).toDF("cve", "pkg", "version", "date", "kind")
    OsvProvider.envelopes(OsvProvider.fixedInRows(
      OsvProvider.proToBaseInference(OsvProvider.affectedRows(osv)),
      fixdates))
  }

  test("ubuntu (osv family): labeled installs match across downconvert " +
      "and Pro→base inference (0 false negatives)") {
    val labels = Seq(
      // F20 downconvert fixed row: installed below the fix → match
      ("ubuntu:22.04", "openssl", "3.0.2-0ubuntu1.8", "CVE-2023-1111"),
      // older upstream version entirely
      ("ubuntu:22.04", "openssl", "3.0.1-9ubuntu9", "CVE-2023-1111"),
      // the Pro channel's own fix gates the +esm namespace: release
      // segment 1ubuntu2.1 < 1ubuntu2.1+esm1
      ("ubuntu:18.04+esm", "openssl", "1.1.1-1ubuntu2.1", "CVE-2023-1111"),
      // J7 Pro→base inference: the fix exists ONLY on Pro 18.04, so the
      // synthesized base-channel wont-fix row (Version None) must match
      // an install ABOVE every published fix version
      ("ubuntu:18.04", "openssl", "9.9.9-9", "CVE-2023-1111"),
      // VEX wont-fix status → Version None on the base channel
      ("ubuntu:24.10", "zlib", "1.3.dfsg-3.1ubuntu2", "CVE-2023-2222"),
      // no fix yet (no fixed events, no wont-fix marker) → Version None
      ("ubuntu:22.04", "bash", "5.1-6ubuntu1", "CVE-2023-3333")
    ).toDF("namespace", "pkg", "version", "expected_vuln")
    QualityGate.assertNoFalseNegatives(ubuntuEnv, labels)
  }

  test("ubuntu: boundary, namespace, and withdrawn misses are itemized") {
    // installed exactly at the fix → not vulnerable → reported
    val atFix = Seq(
      ("ubuntu:22.04", "openssl", "3.0.2-0ubuntu1.9", "CVE-2023-1111"))
      .toDF("namespace", "pkg", "version", "expected_vuln")
    assert(QualityGate.falseNegatives(ubuntuEnv, atFix).count() == 1)
    // the 22.04 fix cannot satisfy a label pinned to a release the OSV
    // record never mentions
    val wrongNs = Seq(
      ("ubuntu:24.04", "openssl", "1.0.0-1", "CVE-2023-1111"))
      .toDF("namespace", "pkg", "version", "expected_vuln")
    assert(QualityGate.falseNegatives(ubuntuEnv, wrongNs).count() == 1)
    // withdrawn OSV records produce no envelope at all → reported
    val withdrawn = Seq(
      ("ubuntu:22.04", "curl", "7.0.0-1", "CVE-2023-4444"))
      .toDF("namespace", "pkg", "version", "expected_vuln")
    assert(QualityGate.falseNegatives(ubuntuEnv, withdrawn).count() == 1)
  }

  // ---- breadth: the remaining OS-schema families the reference gates
  // (`tests/quality/config.yaml` providers list — amazon, arch, fedora,
  // mariner, photon, echo, oracle, and the wolfi/chainguard/minimos/
  // secureos secdb variants). OSV-passthrough (alma), NVD, and the VEX
  // legs (hummingbird, chainguard-libraries) gate through their own
  // shape-specific rules further down (r10). ----

  private def fx(name: String): String =
    getClass.getResource(s"/fixtures/$name").getPath

  test("amazon: labeled vulnerable installs match (0 false negatives)") {
    val html = scala.io.Source.fromFile(fx("alas.html")).mkString
    val pages = Seq(
      ("ALAS-2023-1726", "important",
        Seq("CVE-2023-1000", "CVE-2023-2000"), html)
    ).toDF("alas_id", "severity", "cves", "html")
    val env = graft.providers.AmazonProvider.envelopes(pages, "amzn:2")
    val labels = Seq(
      ("kernel", "4.14.300-227.531.amzn2", "CVE-2023-1000"),
      ("kernel-doc", "4.14.299-1.amzn2", "CVE-2023-2000")
    ).toDF("pkg", "version", "expected_vuln")
    QualityGate.assertNoFalseNegatives(env, labels)
  }

  test("arch: labeled installs match incl. the unfixed None sentinel") {
    val env = graft.providers.ArchProvider.envelopes(spark,
      fx("arch_all.json"), fx("arch_asa_dates.json"))
    val labels = Seq(
      ("openssl", "3.2.0-1", "AVG-1001"),
      ("curl", "8.5.0-1", "AVG-1004"),
      ("bar", "99.0-1", "AVG-1003") // unfixed: any version matches
    ).toDF("pkg", "version", "expected_vuln")
    QualityGate.assertNoFalseNegatives(env, labels)
  }

  test("fedora: labeled installs match (0 false negatives)") {
    val env = graft.providers.FedoraProvider.envelopes(spark,
      fx("fedora_bodhi.json"))
    val labels = Seq(
      ("curl", "0:8.5.0-1.fc40", "CVE-2025-5678"),
      ("python3-docs", "0:3.12.8-1.fc40", "CVE-2025-1234")
    ).toDF("pkg", "version", "expected_vuln")
    QualityGate.assertNoFalseNegatives(env, labels)
  }

  test("mariner: labeled installs match incl. the range-only None row") {
    val env = graft.providers.MarinerProvider.envelopes(spark,
      fx("mariner_oval.xml"), "2.0")
    val labels = Seq(
      ("golang", "0:1.20.0-1.cm2", "CVE-2025-8101"),
      ("bind", "0:9.16.0-1.cm2", "CVE-2025-8404") // <=-bound: None
    ).toDF("pkg", "version", "expected_vuln")
    QualityGate.assertNoFalseNegatives(env, labels)
  }

  test("photon: labeled installs match across both releases") {
    val env = graft.providers.PhotonProvider.envelopes(spark,
      fx("photon") + "/cve_data_photon*.json", fx("photon/wiki"))
    val labels = Seq(
      ("openssl", "3.0.0-1", "CVE-2025-0101", "photon:4.0"),
      ("openssl", "3.0.1-1", "CVE-2025-0101", "photon:5.0"),
      ("zlib", "1.2.9-1", "CVE-2025-0404", "photon:4.0")
    ).toDF("pkg", "version", "expected_vuln", "namespace")
    QualityGate.assertNoFalseNegatives(env, labels)
  }

  test("echo: labeled installs match incl. the verbatim-empty version") {
    val env = graft.providers.EchoProvider.envelopes(spark,
      fx("echo_data.json"))
    val labels = Seq(
      ("curl", "8.8.0-1", "CVE-2025-7001"),
      ("openssl", "99.0-1", "CVE-2025-7002") // "": vulnerable at any
    ).toDF("pkg", "version", "expected_vuln")
    QualityGate.assertNoFalseNegatives(env, labels)
  }

  test("oracle (oval family): labeled installs match with ksplice guard " +
      "active") {
    import graft.providers.OvalProvider
    val env = OvalProvider.envelopes(
      OvalProvider.resolvedRows(spark, fx("oval.xml")), "ol:9",
      dropKsplice = true)
    val labels = Seq(
      ("libfoo", "0:1.1-1", "CVE-2023-1000"),
      ("libbar", "0:1.9-1", "CVE-2023-2000")
    ).toDF("pkg", "version", "expected_vuln")
    QualityGate.assertNoFalseNegatives(env, labels)
  }

  test("oracle ELSA records: CVE labels match advisory-keyed records " +
      "via Metadata aliases; ksplice fix never satisfies") {
    import graft.providers.OvalProvider
    val env = OvalProvider.elsaEnvelopes(
      OvalProvider.elsaRows(spark, fx("elsa_oval.xml")))
    val labels = Seq(
      // record Name is ELSA-2023-1000 — the CVE matches through
      // Metadata.CVE aliases
      ("libfoo", "0:1.2-2.el9", "CVE-2023-1000", "ol:9"),
      ("libfoo-devel", "0:1.1-1.el9", "ELSA-2023-1000", "ol:9"),
      ("libbar", "2:4.18.0-79.el8", "CVE-2023-2000", "ol:8"),
      // ol:9 fix comes from the respin definition bound
      ("libbar", "2:5.1.0-10.el9", "CVE-2023-2000", "ol:9")
    ).toDF("pkg", "version", "expected_vuln", "namespace")
    QualityGate.assertNoFalseNegatives(env, labels)
    // the dropped ksplice bound must not satisfy anything: an install
    // at the respin fix is not vulnerable, even though it is below the
    // (dropped) ksplice EVR's epoch-release ordering
    val atFix = Seq(("libbar", "2:5.1.0-11.el9", "CVE-2023-2000", "ol:9"))
      .toDF("pkg", "version", "expected_vuln", "namespace")
    assert(QualityGate.falseNegatives(env, atFix).count() == 1)
  }

  test("secdb variants: each namespace wiring satisfies its own labels") {
    import graft.providers.SecdbProvider
    // r9: each variant parses its OWN fixture (distinct packages and
    // versions per family), so a label can only be satisfied by the
    // variant that actually shipped the fix
    val env = Seq(
      ("chainguard:rolling", "secdb_chainguard.json"),
      ("minimos:rolling", "secdb_minimos.json"),
      ("secureos:rolling", "secdb_secureos.json"),
      ("wolfi:rolling", "secdb.json"))
      .map { case (ns, f) => SecdbProvider.envelopes(spark, fx(f), ns) }
      .reduce(_ unionByName _)
    val labels = Seq(
      ("glibc", "2.38-r9", "CVE-2023-4911", "chainguard:rolling"),
      // "0" sentinel: vulnerable at any version
      ("openssl", "99.0.0-r0", "CVE-2023-50781", "chainguard:rolling"),
      ("coreutils", "9.4-r0", "CVE-2024-0684", "minimos:rolling"),
      ("mini-init", "0.9.0-r5", "CVE-2025-1111", "minimos:rolling"),
      ("curl", "8.5.0-r1", "CVE-2023-46219", "secureos:rolling"),
      ("libxml2", "2.12.3-r0", "CVE-2024-25062", "secureos:rolling"),
      ("openssl", "3.0.7-r0", "CVE-2023-0286", "wolfi:rolling")
    ).toDF("pkg", "version", "expected_vuln", "namespace")
    QualityGate.assertNoFalseNegatives(env, labels)
    // a namespace-pinned label is NOT satisfied by another variant —
    // and a package that only exists in one variant's fixture cannot
    // satisfy a label pinned to a sibling variant
    val wrongNs = Seq(
      ("openssl", "3.0.7-r0", "CVE-2023-0286", "alpine:3.19"),
      ("glibc", "2.38-r9", "CVE-2023-4911", "minimos:rolling"))
      .toDF("pkg", "version", "expected_vuln", "namespace")
    assert(QualityGate.falseNegatives(env, wrongNs).count() == 2)
  }

  private lazy val ghsaEnv = graft.providers.GhsaProvider.envelopes(
    graft.providers.GhsaProvider.advisories(spark, fx("ghsa.json")))

  test("github (ghsa): labeled installs match vulnerableVersionRange " +
      "under semver (0 false negatives)") {
    val labels = Seq(
      // two-sided range ">= 1.0.0 < 4.17.21" (comma stripped per the
      // reference parser): inside, lower boundary inclusive, and the
      // CVE alias resolves as well as the GHSA id
      ("lodash", "4.17.20", "CVE-2023-7777"),
      ("lodash", "1.0.0", "GHSA-aaaa-bbbb-cccc"),
      // semver precedence: the 4.17.21 pre-release is BELOW the fix
      ("lodash", "4.17.21-alpha.1", "GHSA-aaaa-bbbb-cccc"),
      // one-sided "< 2.31.0", no patched version published
      ("requests", "2.30.0", "GHSA-dddd-eeee-ffff")
    ).toDF("pkg", "version", "expected_vuln")
    graft.tools.QualityGate.assertNoFalseNegativesGhsa(ghsaEnv, labels)
    // namespace-pinned variants
    val ns = Seq(
      ("lodash", "4.17.20", "CVE-2023-7777", "github:npm"),
      ("requests", "2.30.0", "GHSA-dddd-eeee-ffff", "github:python")
    ).toDF("pkg", "version", "expected_vuln", "namespace")
    graft.tools.QualityGate.assertNoFalseNegativesGhsa(ghsaEnv, ns)
  }

  test("github (ghsa): range boundaries, unmapped ecosystems, and " +
      "wrong namespaces are itemized") {
    import graft.tools.QualityGate
    // installed exactly at the excluded upper bound → not vulnerable
    val atFix = Seq(("lodash", "4.17.21", "CVE-2023-7777"))
      .toDF("pkg", "version", "expected_vuln")
    assert(QualityGate.falseNegativesGhsa(ghsaEnv, atFix).count() == 1)
    // below the inclusive lower bound → not vulnerable
    val below = Seq(("lodash", "0.9.9", "GHSA-aaaa-bbbb-cccc"))
      .toDF("pkg", "version", "expected_vuln")
    assert(QualityGate.falseNegativesGhsa(ghsaEnv, below).count() == 1)
    // P7: the FUTURE_ECO row was dropped at parse (not in the
    // reference ecosystem map), so no label can match it
    val unmapped = Seq(("some-lib", "1.0.0", "GHSA-dddd-eeee-ffff"))
      .toDF("pkg", "version", "expected_vuln")
    assert(QualityGate.falseNegativesGhsa(ghsaEnv, unmapped).count() == 1)
    // namespace pin excludes the other ecosystem's rows
    val wrongNs = Seq(
      ("lodash", "4.17.20", "CVE-2023-7777", "github:python"))
      .toDF("pkg", "version", "expected_vuln", "namespace")
    assert(QualityGate.falseNegativesGhsa(ghsaEnv, wrongNs).count() == 1)
  }

  // ---- r10: the final four reference-gated families (config.yaml
  // providers nvd/alma/hummingbird/chainguard-libraries), each through
  // the gate matching its emitted shape. ----

  test("nvd: cpe labels match version ranges, and the fix enrichment " +
      "is load-bearing (0 false negatives)") {
    import graft.providers.NvdProvider
    val fixdates = Seq(
      ("CVE-2023-1234", "cpe:2.3:a:vendor:product:*:*:*:*:*:*:*:*",
        "1.4.3", "2023-05-15", "first-observed")
    ).toDF("vuln", "cpe", "version", "date", "kind")
    val env = NvdProvider.envelopes(spark, fx("nvd_page.json"),
      Some(fixdates))
    val labels = Seq(
      // inside [1.0.0, 1.4.3), and the label demands the enriched fix
      // date — it can only pass if F19's in-place cpeMatch rebuild
      // attached {version, date, kind} to the RIGHT match
      ("cpe:2.3:a:vendor:product", "1.2.0", "CVE-2023-1234",
        Some("2023-05-15")),
      // start bound is inclusive
      ("cpe:2.3:a:vendor:product", "1.0.0", "CVE-2023-1234",
        Some("2023-05-15")),
      // bound-less criteria with version *: any installed version
      ("cpe:2.3:a:other:lib", "99.0", "CVE-2023-5678", None)
    ).toDF("cpe", "version", "expected_vuln", "expected_fix_date")
    QualityGate.assertNoFalseNegativesNvd(env, labels)
    // boundary / vulnerable-flag / enrichment misses are itemized
    val misses = Seq(
      ("cpe:2.3:a:vendor:product", "1.4.3", "CVE-2023-1234", None),
      ("cpe:2.3:a:vendor:product", "0.9.9", "CVE-2023-1234", None),
      // the os row is vulnerable:false — its range must not satisfy
      ("cpe:2.3:o:vendor:os", "9.0", "CVE-2023-1234", None),
      // right range, wrong expected fix date: enrichment is checked,
      // not just presence
      ("cpe:2.3:a:vendor:product", "1.2.0", "CVE-2023-1234",
        Some("1999-01-01")),
      // a record with no configurations at all
      ("cpe:2.3:a:any:thing", "1.0", "CVE-2023-9999", None)
    ).toDF("cpe", "version", "expected_vuln", "expected_fix_date")
    assert(QualityGate.falseNegativesNvd(env, misses).count() == 5)
    // WITHOUT the fixdates dimension the dated label is a false
    // negative — the gate exercises the enrichment end-to-end, not the
    // raw parse
    val unenriched = NvdProvider.envelopes(spark, fx("nvd_page.json"))
    val dated = Seq(("cpe:2.3:a:vendor:product", "1.2.0",
      "CVE-2023-1234", Some("2023-05-15")))
      .toDF("cpe", "version", "expected_vuln", "expected_fix_date")
    assert(QualityGate.falseNegativesNvd(unenriched, dated).count() == 1)
  }

  test("alma (osv passthrough): labels match through related-CVE " +
      "aliases, library-gap clones, and modular epochs") {
    val env = graft.providers.AlmaProvider.envelopes(spark,
      fx("alma") + "/advisories/almalinux*/*.json")
    val labels = Seq(
      // related[] CVE alias, installed release below the fix
      ("pacemaker", "2.0.4-5.el8", "CVE-2020-25654", "AlmaLinux:8"),
      // advisory id direct
      ("pacemaker-libs", "2.0.3-1.el8", "ALSA-2020:5487", "AlmaLinux:8"),
      // the library-gap libgcc CLONE (absent from the raw record) must
      // gate exactly like its base package
      ("libgcc", "11.2.1-9.el9", "ALSA-2021:4386", "AlmaLinux:9"),
      // modular fix with epoch 1: an epoch-0 install at a HIGHER
      // upstream version is still vulnerable
      ("nodejs", "0:99.0.0-1.module_el9", "CVE-2024-0001", "AlmaLinux:9")
    ).toDF("pkg", "version", "expected_vuln", "namespace")
    QualityGate.assertNoFalseNegativesOsv(env, labels)
    val misses = Seq(
      // installed exactly at the fix
      ("gcc", "11.2.1-9.4.el9.alma", "ALSA-2021:4386", "AlmaLinux:9"),
      // namespace pinned to the release the advisory never shipped for
      ("pacemaker", "2.0.4-5.el8", "CVE-2020-25654", "AlmaLinux:9")
    ).toDF("pkg", "version", "expected_vuln", "namespace")
    assert(QualityGate.falseNegativesOsv(env, misses).count() == 2)
  }

  test("hummingbird (csaf-vex): affected labels match; fixed and " +
      "not-affected statuses never satisfy") {
    val env = graft.providers.VexProvider.envelopes(spark,
      fx("csaf_vex.json"))
    val labels = Seq(
      ("pkg-c-0.9.0", "CVE-2024-1111"), // known_affected
      ("pkg-a-1.2.3", "CVE-2024-2222") // under_investigation
    ).toDF("product", "expected_vuln")
    QualityGate.assertNoFalseNegativesVex(env, labels)
    val misses = Seq(
      ("pkg-a-1.2.3", "CVE-2024-1111"), // fixed → suppressed
      ("pkg-d-3.1.4", "CVE-2024-1111"), // known_not_affected
      ("pkg-z-1.0.0", "CVE-2024-1111") // never listed
    ).toDF("product", "expected_vuln")
    assert(QualityGate.falseNegativesVex(env, misses).count() == 3)
  }

  test("chainguard-libraries: purl-versioned fix labels match, with " +
      "the available-date annotation load-bearing") {
    val env = graft.providers.VexProvider.libraryEnvelopes(spark,
      fx("chainguard_openvex.json"), "java")
    val labels = Seq(
      // maven .cgr. artifact: upstream 2.10.0 sorts below 2.10.0.cgr.1
      ("xmlunit-core", "2.10.0", "CVE-2024-31573", Some("2024-05-02")),
      // the GHSA alias resolves too
      ("xmlunit-core", "2.9.0", "GHSA-chfm-68vv-pvw5", None),
      // pypi +cgr. artifact
      ("example-lib", "1.4.2", "CVE-2024-40000", Some("2024-06-11"))
    ).toDF("pkg", "version", "expected_vuln", "expected_fix_date")
    QualityGate.assertNoFalseNegativesLibraries(env, labels)
    val misses = Seq(
      // installed exactly at the chainguard fix artifact
      ("xmlunit-core", "2.10.0.cgr.1", "CVE-2024-31573", None),
      // the under_investigation statement was quarantined at parse
      ("other-lib", "1.0.0", "CVE-2024-50000", None),
      // the product-less statement has no fixes[] to satisfy anything
      ("anything", "1.0", "CVE-2024-60000", None),
      // right fix, wrong expected date
      ("example-lib", "1.4.2", "CVE-2024-40000", Some("1999-01-01"))
    ).toDF("pkg", "version", "expected_vuln", "expected_fix_date")
    assert(QualityGate.falseNegativesLibraries(env, misses).count() == 4)
  }

  test("osv gate: a null-events range next to a real fixed range must " +
      "not become the vulnerable-at-any-version sentinel") {
    // regression: flatten over [null, [1.2]] is null, and the old
    // size()>0 fallback replaced the real fix with a null row that
    // silently satisfied every label for the package
    val item = """{"id":"CVE-2030-1","affected":[{"package":
      {"ecosystem":"AlmaLinux:9","name":"widget"},"ranges":[
      {"type":"GIT","repo":"https://example.invalid/r.git"},
      {"type":"ECOSYSTEM","events":[{"introduced":"0"},
      {"fixed":"1.2"}]}]}]}""".stripMargin.replaceAll("\n\\s*", "")
    val env = Seq(item).toDF("item")
    val rows = QualityGate.osvFixRows(env).collect()
    assert(rows.map(_.getAs[String]("fix_version")).toSeq == Seq("1.2"))
    // installed at the fix: the gate must REPORT it, not pass it
    val atFix = Seq(("widget", "1.2", "CVE-2030-1", "AlmaLinux:9"))
      .toDF("pkg", "version", "expected_vuln", "namespace")
    assert(QualityGate.falseNegativesOsv(env, atFix).count() == 1)
    // below the fix still matches
    val below = Seq(("widget", "1.1", "CVE-2030-1", "AlmaLinux:9"))
      .toDF("pkg", "version", "expected_vuln", "namespace")
    QualityGate.assertNoFalseNegativesOsv(env, below)
  }

  test("library gate: a fix purl with qualifiers still yields its " +
      "version") {
    // regression: the anchored @([^?#]+)$ extracted "" from a purl
    // with ?qualifiers, turning every label for the fix into a
    // phantom false negative
    val item = """{"document":{"vulnerability":{"name":"CVE-2030-2",
      "aliases":[]}},"fixes":[{"available":{"date":"2030-01-01",
      "kind":"advisory"},"product":
      "pkg:maven/org.x/x-core@2.10.0.cgr.1?type=jar"}]}"""
      .replaceAll("\n\\s*", "")
    val env = Seq(item).toDF("item")
    val row = QualityGate.libraryFixRows(env).collect().head
    assert(row.getAs[String]("pkg") == "x-core")
    assert(row.getAs[String]("fix_version") == "2.10.0.cgr.1")
    val labels = Seq(("x-core", "2.10.0", "CVE-2030-2"))
      .toDF("pkg", "version", "expected_vuln")
    QualityGate.assertNoFalseNegativesLibraries(env, labels)
  }

  test("gate match rule is namespace-agnostic but version-exact") {
    // same package name across the two providers' envelopes must not
    // cross-satisfy a version that only one namespace fixes: combine
    // both envelope sets, then check a version vulnerable in alpine
    // but fixed in debian still matches (any namespace match passes)
    val all = alpineEnv.unionByName(debianEnv)
    val labels = Seq(("openssl", "3.0.7-r0", "CVE-2023-0286"))
      .toDF("pkg", "version", "expected_vuln")
    QualityGate.assertNoFalseNegatives(all, labels)
  }
}
