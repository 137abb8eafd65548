package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Version-range constraint synthesis (the `VulnerableRange` DSL,
  * vunnel `providers/rhel/parser.py:1090-1152`).
  */
object Constraints extends Serializable {

  /** epoch:version portion of an EVR, release dropped — the unit for
    * deciding whether two fixes belong to different upstream streams
    * (`_get_version_base`, parser.py:1090-1105). */
  def versionBase(version: String): String = {
    val (epoch, ver, _) = RpmVersion.splitFullVersion(version)
    if (ver == null) version
    else if (epoch != null) s"$epoch:$ver" else ver
  }

  /** OR'd grype constraint from per-base fixes sorted ascending by base
    * (`_build_vulnerable_range`, parser.py:1120-1152):
    *
    *   < v1 || >= base2, < v2 || ...
    *
    * None (null) when fewer than two distinct bases — callers fall back
    * to the single "< fix" form. */
  def vulnerableRange(sortedBaseFixes: Seq[String]): String = {
    if (sortedBaseFixes == null || sortedBaseFixes.length < 2) return null
    val head = s"< ${sortedBaseFixes.head}"
    val tail = sortedBaseFixes.tail.map(v => s">= ${versionBase(v)}, < $v")
    (head +: tail).mkString(" || ")
  }

  /** Advisory synthesis from an RHSA id (`_advisory_from_rhsa`,
    * parser.py:1108-1117). */
  def advisoryLink(rhsaId: String): String =
    if (rhsaId == null || rhsaId.isEmpty) null
    else s"https://access.redhat.com/errata/$rhsaId"

  // ---- range EVALUATION (the gate's grype-match analog) ---------------

  /** Semver precedence compare (semver.org §11): dot-split numeric-
    * aware main compare, release > pre-release at equal main, numeric
    * pre-release identifiers below alphanumeric ones, build metadata
    * (`+...`) ignored. This is the gate's comparator for the GHSA
    * registry ecosystems (npm/pip/maven/...), where grype applies
    * per-ecosystem semver-family logic — exact for semver-shaped
    * versions, a documented approximation for the long tail (maven
    * qualifiers, PEP 440 epochs), same stance as the gate's dpkg note. */
  def semverCmp(a: String, b: String): Int = {
    def split(v: String): (Array[String], Array[String]) = {
      val noBuild = v.trim.stripPrefix("v").takeWhile(_ != '+')
      val i = noBuild.indexOf('-')
      val (main, pre) =
        if (i < 0) (noBuild, "") else (noBuild.take(i), noBuild.drop(i + 1))
      (main.split('.'), if (pre.isEmpty) Array.empty[String] else pre.split('.'))
    }
    def isNum(s: String) = s.nonEmpty && s.forall(_.isDigit)
    def cmpIds(x: String, y: String): Int =
      if (isNum(x) && isNum(y)) BigInt(x).compare(BigInt(y))
      else if (isNum(x)) -1 // numeric identifiers sort below alphanumeric
      else if (isNum(y)) 1
      else x.compareTo(y)
    val (ma, pa) = split(a); val (mb, pb) = split(b)
    var i = 0
    while (i < math.max(ma.length, mb.length)) {
      val x = if (i < ma.length) ma(i) else "0"
      val y = if (i < mb.length) mb(i) else "0"
      val c = cmpIds(x, y)
      if (c != 0) return c
      i += 1
    }
    // equal mains: a release outranks any pre-release
    if (pa.isEmpty && pb.isEmpty) return 0
    if (pa.isEmpty) return 1
    if (pb.isEmpty) return -1
    i = 0
    while (i < math.min(pa.length, pb.length)) {
      val c = cmpIds(pa(i), pb(i))
      if (c != 0) return c
      i += 1
    }
    pa.length.compare(pb.length)
  }

  /** Does `installed` satisfy a GHSA-style vulnerable-version-range
    * expression? Grammar (the shapes GitHub emits, post the reference's
    * comma-strip at `providers/github/parser.py:730`, plus the `||`
    * OR form [[vulnerableRange]] synthesizes): `||`-separated groups,
    * each an AND of `op version` pairs with op ∈ {<, <=, >, >=, =, ==}.
    * Null/empty/malformed ranges match nothing (fail closed: a range
    * the evaluator cannot read must surface as a gate miss, not a
    * silent pass). */
  def versionInRange(installed: String, range: String): Boolean = {
    if (installed == null || range == null || range.trim.isEmpty) return false
    range.split("\\|\\|").exists { grp =>
      val toks = grp.replace(",", " ").trim.split("\\s+").filter(_.nonEmpty)
      if (toks.isEmpty || toks.length % 2 != 0) false
      else toks.grouped(2).forall { case Array(op, v) =>
        val c = semverCmp(installed, v)
        op match {
          case "<" => c < 0
          case "<=" => c <= 0
          case ">" => c > 0
          case ">=" => c >= 0
          case "=" | "==" => c == 0
          case _ => false
        }
      }
    }
  }

  // ---- Column API ------------------------------------------------------
  private val rangeUdf = udf((vs: Seq[String]) => Option(vulnerableRange(vs)))
  private val baseUdf = udf((v: String) => versionBase(v))
  private val inRangeUdf = udf((v: String, r: String) => versionInRange(v, r))

  def vulnerable_range(sortedFixes: Column): Column = rangeUdf(sortedFixes)
  def version_base(v: Column): Column = baseUdf(v)
  def version_in_range(installed: Column, range: Column): Column =
    inRangeUdf(installed, range)
}
