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

  // ---- Column API ------------------------------------------------------
  private val rangeUdf = udf((vs: Seq[String]) => Option(vulnerableRange(vs)))
  private val baseUdf = udf((v: String) => versionBase(v))

  def vulnerable_range(sortedFixes: Column): Column = rangeUdf(sortedFixes)
  def version_base(v: Column): Column = baseUdf(v)
}
