package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.providers._

/** The whole-registry integration run — the `vunnel run <every
  * provider>` analog (reference `providers/__init__.py:44-74` catalog ×
  * `provider.py` run loop): every registered name flows
  * fixture → envelopes → checksummed result store IN ONE SESSION, and
  * the spec asserts (a) the registry and the wiring table cannot drift
  * apart, (b) every family lands its pinned envelope count, (c) the
  * store digest is deterministic — committing the same envelopes twice
  * yields byte-identical manifests, the canonical-serialization
  * contract at the integration seam no single-provider spec covers.
  *
  * Per-provider wall times are printed for SCALE.md's
  * whole-registry-run table.
  */
class RegistryRunSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fx(name: String): String =
    getClass.getResource(s"/fixtures/$name").getPath

  private def emptyFd = UbuntuProvider.emptyFixdates(spark)

  /** name → envelope builder, the same wiring each family's own spec
    * drives (fix-date dimensions included where the family uses one). */
  private lazy val wiring: Map[String, () => DataFrame] = Map(
    "alma" -> (() => AlmaProvider.envelopes(spark,
      fx("alma") + "/advisories/almalinux*/*.json")),
    "alpine" -> (() => SecdbProvider.envelopes(spark, fx("secdb.json"),
      "alpine:3.18",
      rejections = Some(Seq(("busybox", "CVE-2022-30065"))
        .toDF("pkg_name", "vuln_id")))),
    "amazon" -> (() => {
      val html = scala.io.Source.fromFile(fx("alas.html")).mkString
      AmazonProvider.envelopes(Seq(
        ("ALAS-2023-1726", "important",
          Seq("CVE-2023-1000", "CVE-2023-2000"), html,
          "https://alas.aws.amazon.com/AL2/ALAS-2023-1726.html",
          "2023-02-17 22:51:00"))
        .toDF("alas_id", "severity", "cves", "html", "url", "date"),
        "amzn:2")
    }),
    "arch" -> (() => ArchProvider.envelopes(spark, fx("arch_all.json"),
      fx("arch_asa_dates.json"))),
    "bitnami" -> (() => OsvProvider.passthroughEnvelopes(
      OsvProvider.readPassthrough(spark, fx("bitnami_osv.json")), emptyFd)),
    "chainguard" -> (() => SecdbProvider.envelopes(spark,
      fx("secdb_chainguard.json"), "chainguard:rolling")),
    "chainguard_libraries" -> (() => VexProvider.libraryEnvelopes(spark,
      fx("chainguard_openvex.json"), "maven")),
    "debian" -> (() => {
      val rows = DebianProvider.packageRows(spark, fx("debian_tracker.json"))
      val dsas = Seq(
        ("DSA-5343-1", "https://www.debian.org/security/2023/dsa-5343",
          "bullseye", "openssl", "CVE-2023-0286", "2023-02-08"))
        .toDF("dsa", "link", "rel", "pkg", "cve", "date")
      DebianProvider.withLegacy(
        DebianProvider.envelopes(DebianProvider.withAdvisories(rows, dsas)),
        DebianProvider.legacyEnvelopes(spark, fx("debian_legacy.json"), None))
    }),
    "echo" -> (() => EchoProvider.envelopes(spark, fx("echo_data.json"))),
    "fedora" -> (() => FedoraProvider.envelopes(spark,
      fx("fedora_bodhi.json"))),
    "github" -> (() => GhsaProvider.envelopes(
      GhsaProvider.advisories(spark, fx("ghsa.json")))),
    "govulndb" -> (() => OsvProvider.passthroughEnvelopes(
      OsvProvider.readPassthrough(spark, fx("govulndb_osv.json")), emptyFd)),
    "hummingbird" -> (() => VexProvider.envelopes(spark, fx("csaf_vex.json"))),
    "mariner" -> (() => MarinerProvider.envelopes(spark,
      fx("mariner_oval.xml"), "2.0")),
    "minimos" -> (() => SecdbProvider.envelopes(spark,
      fx("secdb_minimos.json"), "minimos:rolling")),
    "nvd" -> (() => NvdProvider.envelopes(spark, fx("nvd_page.json"),
      Some(Seq(("CVE-2023-1234", "cpe:2.3:a:vendor:product:*:*:*:*:*:*:*:*",
        "1.4.3", "2023-04-30", "first-observed"))
        .toDF("vuln", "cpe", "version", "date", "kind")))),
    "oracle" -> (() => OvalProvider.envelopes(
      OvalProvider.resolvedRows(spark, fx("oval.xml")), "ol:9",
      dropKsplice = true)),
    "photon" -> (() => PhotonProvider.envelopes(spark,
      fx("photon") + "/cve_data_photon*.json", fx("photon/wiki"))),
    "rhel" -> (() => RhelProvider.envelopes(
      RhelProvider.hydraScan(spark, fx("rhel_hydra.json")),
      RhelFixtures.webkitFpis(spark))),
    "rocky" -> (() => OsvProvider.passthroughEnvelopes(
      OsvProvider.readPassthrough(spark, fx("rocky_osv.json")), emptyFd,
      OsvProvider.rockyEcosystem)),
    "secureos" -> (() => SecdbProvider.envelopes(spark,
      fx("secdb_secureos.json"), "secureos:rolling",
      apkVulnerableRange = true)),
    "sles" -> (() => SlesProvider.envelopes(spark, fx("sles_oval.xml"),
      majorVersion = "15")),
    "ubuntu" -> (() => UbuntuProvider.envelopes(
      UbuntuProvider.records(spark, fx("ubuntu_osv")),
      Some(spark.read.option("multiLine", "true")
        .json(fx("ubuntu_vex.json"))),
      usnDates = Some(UbuntuProvider.usnFixDates(
        spark.read.option("multiLine", "true")
          .json(fx("ubuntu_usn.json")))))),
    "wolfi" -> (() => SecdbProvider.envelopes(spark, fx("secdb.json"),
      "wolfi:rolling")),
    "kev" -> (() => AuxProviders.kevEnvelopes(spark, fx("kev.json"))),
    "epss" -> (() => AuxProviders.epssEnvelopes(spark, fx("epss.csv"))),
    "eol" -> (() => AuxProviders.eolEnvelopes(spark, fx("eol.json"))))

  test("the registry and the integration wiring cannot drift apart") {
    assert(Registry.providers.map(_.name).toSet == wiring.keySet,
      "every registered provider needs an integration-run wiring " +
        "(and vice versa)")
  }

  test("whole-registry run: every provider commits its pinned envelope " +
      "count with a deterministic store digest") {
    val rootA = java.nio.file.Files.createTempDirectory("registry_a")
    val rootB = java.nio.file.Files.createTempDirectory("registry_b")
    val results = Registry.providers.map(_.name).map { name =>
      val t0 = System.nanoTime()
      val env = wiring(name)().cache()
      val digestA = graft.sinks.ResultStore.commit(spark, env,
        s"$rootA/$name")
      val digestB = graft.sinks.ResultStore.commit(spark, env,
        s"$rootB/$name")
      val rows = graft.sinks.ResultStore.manifestRows(s"$rootA/$name")
        .getOrElse(0L)
      env.unpersist()
      val secs = (System.nanoTime() - t0) / 1e9
      info(f"$name%-22s $rows%5d envelopes  $secs%6.2f s  $digestA")
      assert(digestA == digestB,
        s"$name: same envelopes, different store digests")
      name -> rows
    }.toMap
    // pinned counts cross-checked against each family's committed
    // golden snapshot file count
    val expected = Map(
      "alma" -> 3L, "alpine" -> 6L, "amazon" -> 1L, "arch" -> 3L,
      "bitnami" -> 2L, "chainguard" -> 5L, "chainguard_libraries" -> 3L,
      "debian" -> 7L, "echo" -> 3L, "fedora" -> 3L, "github" -> 3L,
      "govulndb" -> 2L, "hummingbird" -> 2L, "mariner" -> 3L,
      "minimos" -> 3L, "nvd" -> 3L, "oracle" -> 4L, "photon" -> 4L,
      "rhel" -> 7L, "rocky" -> 2L, "secureos" -> 7L, "sles" -> 3L,
      "ubuntu" -> 5L, "wolfi" -> 6L, "kev" -> 3L, "epss" -> 3L,
      "eol" -> 5L)
    assert(results == expected,
      s"per-provider envelope counts drifted: ${
        results.toSeq.sorted.diff(expected.toSeq.sorted)}")
  }
}
