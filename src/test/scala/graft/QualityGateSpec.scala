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
