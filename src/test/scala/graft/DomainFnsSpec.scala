package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Constraints, ProductId, Purl}

/** Purl / product-id / constraint semantics pinned to the reference's
  * own documented examples. */
class DomainFnsSpec extends AnyFunSuite {

  test("purl parse: full form") {
    val p = Purl.parse("pkg:rpm/redhat/ruby@2.5?rpmmod=ruby:3.1:8090020240311122605:a75119d5")
    assert(p.purlType == "rpm" && p.namespace == "redhat" && p.name == "ruby")
    assert(p.version == "2.5")
    assert(p.qualifiers("rpmmod") == "ruby:3.1:8090020240311122605:a75119d5")
  }

  test("purl module resolution: old rpmmod type and new qualifier forms") {
    // old: pkg:rpmmod/redhat/ruby@2.5:8090020230627084142:b46abd14 → ruby:2.5
    val old = Purl.parse("pkg:rpmmod/redhat/ruby@2.5:8090020230627084142:b46abd14")
    assert(Purl.isRpmModulePurl(old))
    assert(Purl.resolveModuleName(old) == "ruby:2.5")
    // new: rpmmod qualifier → name:stream from the qualifier
    val nw = Purl.parse("pkg:rpm/redhat/ruby@2.5?rpmmod=ruby:3.1:8090020240311122605:a75119d5")
    assert(Purl.isRpmModulePurl(nw))
    assert(Purl.resolveModuleName(nw) == "ruby:3.1")
    // plain rpm purl: not a module
    val plain = Purl.parse("pkg:rpm/redhat/openssl@3.0.7-1.el9")
    assert(!Purl.isRpmModulePurl(plain))
    assert(Purl.resolveModuleName(plain) == null)
  }

  test("purl: ubuntu src/distro extraction and malformed inputs") {
    val u = Purl.parse("pkg:deb/ubuntu/openssl@3.0.2-0ubuntu1?distro=jammy")
    assert(Purl.ubuntuSrcAndDistro(u) == ("openssl", "jammy"))
    assert(Purl.parse("not-a-purl") == null)
    assert(Purl.parse("pkg:rpm") == null)
  }

  test("product id: old-format FPI examples from the reference doc") {
    import ProductId.parseProductId
    assert(parseProductId("AppStream-9.5.0.GA:webkit2gtk3-0:2.44.3-2.el9.x86_64")
      == ProductId.Info(Some(5), Some("ga")))
    assert(parseProductId("AppStream-8.2.0.Z.EUS:bind-32:9.11.13-6.el8_2.3.x86_64")
      == ProductId.Info(Some(2), Some("eus")))
    assert(parseProductId("BaseOS-9.4.0.Z.MAIN.EUS:glibc-0:2.34-100.el9_4.x86_64")
      == ProductId.Info(Some(4), Some("eus")))
    assert(parseProductId("AppStream-9.5.Z:foo-0:1-1.el9_5.x86_64")
      == ProductId.Info(Some(5), Some("ga")))
    assert(parseProductId("AppStream-8.4.0.Z.AUS:bar-0:1-1.el8_4.x86_64")
      == ProductId.Info(Some(4), Some("aus")))
    // unknown marker → channel null, never assumed GA
    assert(parseProductId("AppStream-8.8.0.Z.ENS:foo-0:1-1.el8_8.x86_64")
      == ProductId.Info(Some(8), None))
    // major-only ELS
    assert(parseProductId("7Server-ELS:webkitgtk4-0:2.48.3-2.el7_9.x86_64")
      == ProductId.Info(None, Some("els")))
    assert(parseProductId("6Server-ELS.EXTENSION:bind-32:9.8.2-0.68.rc1.el6_10.17.x86_64")
      == ProductId.Info(None, Some("els")))
  }

  test("product id: new-format FPI examples") {
    import ProductId.parseProductId
    assert(parseProductId("rhel-9.5::appstream:webkit2gtk3-0:2.44.3-2.el9")
      == ProductId.Info(Some(5), Some("ga")))
    assert(parseProductId("rhel-8.6-eus::appstream:foo-0:1-1.el8_6")
      == ProductId.Info(Some(6), Some("eus")))
    assert(parseProductId("") == ProductId.Info(None, None))
    assert(parseProductId("garbage") == ProductId.Info(None, None))
  }

  test("dist-tag minor fallback") {
    import ProductId.minorFromDistTag
    assert(minorFromDistTag("0:2.34-60.el9_2.7").contains(2))
    assert(minorFromDistTag("perl-App-cpm-0:1.0-1.module+el8.1.0+2928+e34b251a").contains(1))
    assert(minorFromDistTag("0:2.34-100.el9").isEmpty)  // bare GA: no minor
    assert(minorFromDistTag("7.2-3.el7.1").isEmpty)     // respin counter, not minor
    assert(minorFromDistTag(null).isEmpty)
  }

  test("vulnerable range: the reference's python3.9 example") {
    // < 0:3.9.18-3.el9_4.5 || >= 0:3.9.19, < 0:3.9.19-8.el9
    val got = Constraints.vulnerableRange(
      Seq("0:3.9.18-3.el9_4.5", "0:3.9.19-8.el9"))
    assert(got == "< 0:3.9.18-3.el9_4.5 || >= 0:3.9.19, < 0:3.9.19-8.el9")
    // fewer than 2 bases → null (caller falls back to "< fix")
    assert(Constraints.vulnerableRange(Seq("0:3.9.19-8.el9")) == null)
    assert(Constraints.vulnerableRange(Nil) == null)
  }

  test("version base drops release, keeps epoch (reference examples)") {
    assert(Constraints.versionBase("0:3.9.19-8.el9") == "0:3.9.19")
    assert(Constraints.versionBase("3.9.18-3.el9_4.5") == "3.9.18")
    assert(Constraints.versionBase("1:2.27-34.base.el7") == "1:2.27")
  }

  test("advisory link synthesis") {
    assert(Constraints.advisoryLink("RHSA-2023:1234")
      == "https://access.redhat.com/errata/RHSA-2023:1234")
    assert(Constraints.advisoryLink(null) == null)
  }

  test("semverCmp: semver.org §11 precedence") {
    import Constraints.semverCmp
    assert(semverCmp("1.0.0", "2.0.0") < 0)
    assert(semverCmp("2.0.0", "2.1.0") < 0)
    assert(semverCmp("2.1.0", "2.1.1") < 0)
    assert(semverCmp("1.9.0", "1.10.0") < 0, "numeric, not lexical")
    assert(semverCmp("1.0", "1.0.0") == 0, "missing segment = 0")
    assert(semverCmp("v1.2.3", "1.2.3") == 0, "leading v stripped")
    assert(semverCmp("1.2.3+build5", "1.2.3") == 0, "build metadata ignored")
    // pre-release below the release, and the §11 identifier ladder
    assert(semverCmp("1.0.0-alpha", "1.0.0") < 0)
    assert(semverCmp("1.0.0-alpha", "1.0.0-alpha.1") < 0)
    assert(semverCmp("1.0.0-alpha.1", "1.0.0-alpha.beta") < 0)
    assert(semverCmp("1.0.0-beta.2", "1.0.0-beta.11") < 0)
    assert(semverCmp("1.0.0-rc.1", "1.0.0") < 0)
  }

  test("versionInRange: GHSA range grammar, fail-closed on junk") {
    import Constraints.versionInRange
    assert(versionInRange("4.17.20", ">= 1.0.0 < 4.17.21"))
    assert(versionInRange("1.0.0", ">= 1.0.0 < 4.17.21"), "lower inclusive")
    assert(!versionInRange("4.17.21", ">= 1.0.0 < 4.17.21"), "upper exclusive")
    assert(versionInRange("2.30.0", "< 2.31.0"))
    assert(versionInRange("1.0.0", "= 1.0.0") &&
      !versionInRange("1.0.1", "= 1.0.0"))
    // comma-form (pre-strip GitHub shape) accepted too
    assert(versionInRange("1.2.0", ">= 1.2.0, < 1.4.3"))
    // the || OR form Constraints.vulnerableRange synthesizes
    val r = "< 1.5.0 || >= 2.0.0 < 2.3.0"
    assert(versionInRange("1.4.9", r) && versionInRange("2.2.0", r))
    assert(!versionInRange("1.7.0", r) && !versionInRange("2.3.0", r))
    // fail closed
    assert(!versionInRange("1.0.0", null))
    assert(!versionInRange("1.0.0", ""))
    assert(!versionInRange("1.0.0", "~> 1.0"), "unknown op never matches")
    assert(!versionInRange(null, "< 2.0"))
  }
}
