package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Down-scaled analog of the reference's match-quality gate
  * (`tests/quality/config.yaml:1-7`): the reference builds a grype DB
  * from provider output, scans labeled container images, and fails on
  * any NEW false negative (`max_new_false_negatives: 0`). Container
  * scanning isn't portable into this engine, but the gate's core
  * contract is — every labeled (package, installed-version) must match
  * its expected vulnerability in the BUILT envelopes, so a provider
  * regression that drops or mis-versions a fix surfaces as a concrete
  * false negative instead of a silently smaller output.
  *
  * Match rule (the grype fixed-version semantics): a label matches
  * when some envelope carries the expected vulnerability id with a
  * FixedIn row for the package whose fix version is either the
  * not-fixed sentinel ("", "0", or null — vulnerable at any version)
  * or strictly greater than the installed version under EVR
  * comparison. EVR ordering is exact for rpm/apk-style versions and a
  * documented approximation for dpkg (no `~` pre-release semantics) —
  * fine for the gate's curated labels.
  *
  * Scale shape: labels are a curated test list (thousands at most) →
  * broadcast; envelopes stream through one projection + explode with
  * no shuffle on the corpus side.
  */
object QualityGate {

  /** The minimal slice of the `{"Vulnerability": {...}}` payload the
    * gate needs. Metadata.CVE covers both alias encodings the
    * reference emits: [{Name, Link}] objects (amazon/fedora/oracle/
    * arch) — a bare-string list would parse as null and simply carry
    * no aliases. */
  val matchSchema: StructType = StructType.fromDDL(
    "Vulnerability STRUCT<Name: STRING, NamespaceName: STRING, " +
      "Metadata: STRUCT<CVE: ARRAY<STRUCT<Name: STRING, Link: STRING>>>, " +
      "FixedIn: ARRAY<STRUCT<Name: STRING, NamespaceName: STRING, " +
      "VersionFormat: STRING, Version: STRING>>>")

  /** (vuln, aliases, namespace, pkg, fix_version) rows from assembled
    * envelopes — parses the canonical-JSON `item` column. `aliases`
    * carries Metadata.CVE names so an advisory-keyed record (amazon's
    * ALAS-..., fedora's FEDORA-...) still satisfies CVE labels. */
  def fixRows(envelopes: DataFrame): DataFrame =
    envelopes
      .select(from_json(col("item"), matchSchema).getField("Vulnerability")
        .as("v"))
      .select(col("v.Name").as("vuln"),
        coalesce(transform(col("v.Metadata.CVE"), c => c.getField("Name")),
          array().cast("array<string>")).as("aliases"),
        explode(col("v.FixedIn")).as("f"))
      .select(col("vuln"), col("aliases"),
        col("f.NamespaceName").as("namespace"),
        col("f.Name").as("pkg"), col("f.Version").as("fix_version"))

  /** Labels with NO matching envelope — the gate's false negatives.
    * `labels` columns: (pkg, version, expected_vuln) plus an optional
    * `namespace` column — when present, the label only matches fixes in
    * that namespace (the per-image analog of the reference's gate: each
    * labeled image is one distro release, so a base-channel not-fixed
    * row can't be satisfied by another channel's fix). Empty = gate
    * passes. */
  def falseNegatives(envelopes: DataFrame, labels: DataFrame): DataFrame = {
    val fixes = fixRows(envelopes)
    val vulnerable =
      // not-fixed sentinels: "" / "0" (secdb NAK) / "None" (the
      // reference's Python str(None) for open releases) / null
      fixes("fix_version").isNull ||
        fixes("fix_version").isin("", "0", "None") ||
        graft.functions.RpmVersion
          .rpm_ver_cmp(labels("version"), fixes("fix_version")) < 0
    val keyed = labels("pkg") === fixes("pkg") &&
      (labels("expected_vuln") === fixes("vuln") ||
        array_contains(fixes("aliases"), labels("expected_vuln"))) &&
      vulnerable
    val cond =
      if (labels.columns.contains("namespace"))
        keyed && labels("namespace") === fixes("namespace")
      else keyed
    labels.join(fixes, cond, "left_anti")
  }

  /** Throws with the itemized misses when any label fails to match —
    * the `max_new_false_negatives: 0` bar. */
  def assertNoFalseNegatives(envelopes: DataFrame, labels: DataFrame): Unit =
    assertEmpty(falseNegatives(envelopes, labels))

  // ---- GHSA (registry-ecosystem) gate ---------------------------------

  /** The GHSA envelope slice the range gate needs (the
    * github-security-advisory schema's Advisory payload: FixedIn
    * carries a RANGE expression, not an EVR fix version, under
    * lower-case record keys). */
  val ghsaMatchSchema: StructType = StructType.fromDDL(
    "Advisory STRUCT<CVE: ARRAY<STRING>, ghsaId: STRING, " +
      "namespace: STRING, " +
      "FixedIn: ARRAY<STRUCT<ecosystem: STRING, identifier: STRING, " +
      "name: STRING, namespace: STRING, range: STRING>>>")

  /** (vuln ids, namespace, pkg, range) rows from GHSA envelopes. */
  def ghsaRangeRows(envelopes: DataFrame): DataFrame =
    envelopes
      .select(from_json(col("item"), ghsaMatchSchema).as("v"))
      .select(col("v.Advisory.ghsaId").as("ghsa"),
        col("v.Advisory.CVE").as("cves"),
        col("v.Advisory.namespace").as("namespace"),
        explode(col("v.Advisory.FixedIn")).as("f"))
      .select(col("ghsa"), col("cves"), col("namespace"),
        col("f.name").as("pkg"), col("f.range").as("range"))

  /** GHSA labels with NO matching envelope. `labels` columns:
    * (pkg, version, expected_vuln) — expected_vuln accepts either the
    * GHSA id or any of its CVE aliases — plus optional `namespace`
    * (`github:<ecosystem>`). A label matches when some advisory's
    * FixedIn row for the package has a vulnerable range the installed
    * version satisfies under [[graft.functions.Constraints
    * .versionInRange]] (grype's registry-ecosystem match analog). */
  def falseNegativesGhsa(envelopes: DataFrame, labels: DataFrame): DataFrame = {
    val fixes = ghsaRangeRows(envelopes)
    val keyed = labels("pkg") === fixes("pkg") &&
      (labels("expected_vuln") === fixes("ghsa") ||
        array_contains(fixes("cves"), labels("expected_vuln"))) &&
      graft.functions.Constraints
        .version_in_range(labels("version"), fixes("range"))
    val cond =
      if (labels.columns.contains("namespace"))
        keyed && labels("namespace") === fixes("namespace")
      else keyed
    labels.join(fixes, cond, "left_anti")
  }

  def assertNoFalseNegativesGhsa(envelopes: DataFrame,
      labels: DataFrame): Unit =
    assertEmpty(falseNegativesGhsa(envelopes, labels))

  private def assertEmpty(fn: DataFrame): Unit = {
    val rows = fn.collect()
    if (rows.nonEmpty) throw new AssertionError(
      "quality gate: new false negatives:\n" +
        rows.map(r => s"  ${r.mkString(" / ")}").mkString("\n"))
  }
}
