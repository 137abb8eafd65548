package graft.tools

import org.apache.spark.sql.{Column, DataFrame}
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
  def falseNegatives(envelopes: DataFrame, labels: DataFrame): DataFrame =
    unmatched(fixRows(envelopes), labels)

  /** The shared EVR anti-join: labels against (vuln, aliases,
    * namespace, pkg, fix_version) rows, whatever family produced
    * them. */
  private def unmatched(fixes: DataFrame, labels: DataFrame): DataFrame = {
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

  // ---- OSV passthrough-family gate (alma/rocky shape) -----------------

  /** The OSV slice of a passthrough item: id + every alias channel the
    * family uses (alma `related`, generic OSV `aliases`, ubuntu
    * `upstream`), and affected[] down to the fixed events. */
  val osvMatchSchema: StructType = StructType.fromDDL(
    "id STRING, related ARRAY<STRING>, aliases ARRAY<STRING>, " +
      "upstream ARRAY<STRING>, affected ARRAY<STRUCT<" +
      "package: STRUCT<ecosystem: STRING, name: STRING>, " +
      "ranges: ARRAY<STRUCT<type: STRING, events: ARRAY<STRUCT<" +
      "introduced: STRING, fixed: STRING>>>>>>")

  /** (vuln, aliases, namespace=ecosystem, pkg, fix_version) rows from
    * OSV-passthrough envelopes. An affected entry whose ranges carry NO
    * fixed event yields one null-version row — introduced-only means
    * vulnerable at any installed version, same as the OS-schema
    * not-fixed sentinel. */
  def osvFixRows(envelopes: DataFrame): DataFrame = {
    val v = from_json(col("item"), osvMatchSchema)
    def arr(c: Column): Column = coalesce(c, array().cast("array<string>"))
    // each range's fixed-event list is coalesced to empty BEFORE the
    // flatten: one null `events` (a GIT range next to a real ECOSYSTEM
    // range) would otherwise null the whole flatten and replace the
    // entry's real fixed versions with the vulnerable-at-any-version
    // sentinel — silently satisfying labels the gate should flag
    val fixVersions = flatten(transform(col("a.ranges"), r =>
      coalesce(
        filter(transform(r.getField("events"), e => e.getField("fixed")),
          f => f.isNotNull),
        array().cast("array<string>"))))
    envelopes
      .select(v.getField("id").as("vuln"),
        concat(arr(v.getField("related")), arr(v.getField("aliases")),
          arr(v.getField("upstream"))).as("aliases"),
        explode(v.getField("affected")).as("a"))
      .select(col("vuln"), col("aliases"),
        col("a.package.ecosystem").as("namespace"),
        col("a.package.name").as("pkg"),
        explode(when(size(fixVersions) > 0, fixVersions)
          .otherwise(array(lit(null).cast("string")))).as("fix_version"))
  }

  /** OSV-passthrough labels with NO matching envelope. Same label
    * contract as [[falseNegatives]]; `namespace` pins the OSV package
    * ecosystem (e.g. "AlmaLinux:8"). */
  def falseNegativesOsv(envelopes: DataFrame, labels: DataFrame): DataFrame =
    unmatched(osvFixRows(envelopes), labels)

  def assertNoFalseNegativesOsv(envelopes: DataFrame,
      labels: DataFrame): Unit =
    assertEmpty(falseNegativesOsv(envelopes, labels))

  // ---- NVD (cpe-range) gate -------------------------------------------

  /** The NVD slice: vulnerable cpeMatch ranges plus the in-place `fix`
    * object the fix-date enrichment attaches
    * (`NvdProvider.envelopes`). */
  val nvdMatchSchema: StructType = StructType.fromDDL(
    "cve STRUCT<id: STRING, configurations: ARRAY<STRUCT<nodes: ARRAY<" +
      "STRUCT<cpeMatch: ARRAY<STRUCT<criteria: STRING, " +
      "vulnerable: BOOLEAN, versionStartIncluding: STRING, " +
      "versionStartExcluding: STRING, versionEndIncluding: STRING, " +
      "versionEndExcluding: STRING, " +
      "fix: STRUCT<version: STRING, date: STRING, kind: STRING>>>>>>>>")

  /** One row per VULNERABLE cpeMatch: (vuln, criteria, four bounds,
    * fix). Records without configurations contribute nothing (explode
    * of null). */
  def nvdCpeRows(envelopes: DataFrame): DataFrame =
    envelopes
      .select(from_json(col("item"), nvdMatchSchema).getField("cve")
        .as("c"))
      .select(col("c.id").as("vuln"), explode(col("c.configurations"))
        .as("cfg"))
      .select(col("vuln"), explode(col("cfg.nodes")).as("n"))
      .select(col("vuln"), explode(col("n.cpeMatch")).as("m"))
      .filter(col("m.vulnerable"))
      .select(col("vuln"), col("m.criteria").as("criteria"),
        col("m.versionStartIncluding").as("vsi"),
        col("m.versionStartExcluding").as("vse"),
        col("m.versionEndIncluding").as("vei"),
        col("m.versionEndExcluding").as("vee"),
        col("m.fix").as("fix"))

  /** NVD labels with NO matching envelope — the grype cpe-match analog.
    * `labels` columns: (cpe, version, expected_vuln) where `cpe` is the
    * criteria prefix through the product field
    * (`cpe:2.3:a:vendor:product`), plus an optional `expected_fix_date`
    * — when present the matching cpeMatch must ALSO carry the enriched
    * `fix` object with that date, so a mis-attached or dropped
    * enrichment (F19's in-place cpeMatch rebuild) fails the gate, not
    * just a diff. Version bounds compare under EVR ordering; a
    * bound-less criteria matches on its own version field (`*` = any).
    */
  def falseNegativesNvd(envelopes: DataFrame, labels: DataFrame): DataFrame = {
    val rows = nvdCpeRows(envelopes)
    def cmp(a: Column, b: Column): Column =
      graft.functions.RpmVersion.rpm_ver_cmp(a, b)
    val v = labels("version")
    val noBounds = rows("vsi").isNull && rows("vse").isNull &&
      rows("vei").isNull && rows("vee").isNull
    val criteriaVer = element_at(split(rows("criteria"), ":"), 6)
    val inBounds =
      (rows("vsi").isNull || cmp(v, rows("vsi")) >= 0) &&
        (rows("vse").isNull || cmp(v, rows("vse")) > 0) &&
        (rows("vei").isNull || cmp(v, rows("vei")) <= 0) &&
        (rows("vee").isNull || cmp(v, rows("vee")) < 0) &&
        (!noBounds || criteriaVer === "*" || criteriaVer === v)
    val keyed = rows("vuln") === labels("expected_vuln") &&
      startswith(rows("criteria"), concat(labels("cpe"), lit(":"))) &&
      inBounds
    val cond =
      if (labels.columns.contains("expected_fix_date"))
        keyed && (labels("expected_fix_date").isNull ||
          rows("fix").getField("date") === labels("expected_fix_date"))
      else keyed
    labels.join(rows, cond, "left_anti")
  }

  def assertNoFalseNegativesNvd(envelopes: DataFrame,
      labels: DataFrame): Unit =
    assertEmpty(falseNegativesNvd(envelopes, labels))

  // ---- CSAF-VEX (hummingbird) gate ------------------------------------

  /** (vuln, product, status) rows from CSAF-VEX passthrough envelopes
    * (the whole document rides in `item`, so every envelope of one
    * document yields the full status set — harmless duplication for an
    * anti-join). */
  def vexStatusRows(envelopes: DataFrame): DataFrame = {
    def slice(field: String): Column =
      transform(coalesce(col(s"v.product_status.$field"),
        array().cast("array<string>")),
        p => struct(p.as("product"), lit(field).as("status")))
    envelopes
      .select(from_json(col("item"),
        graft.providers.VexProvider.csafSchema).as("d"))
      .select(explode(col("d.vulnerabilities")).as("v"))
      .select(col("v.cve").as("vuln"),
        explode(concat(slice("fixed"), slice("known_affected"),
          slice("known_not_affected"), slice("under_investigation")))
          .as("ps"))
      .select(col("vuln"), col("ps.product").as("product"),
        col("ps.status").as("status"))
      .distinct()
  }

  /** CSAF-VEX labels with NO matching envelope. `labels` columns:
    * (product, expected_vuln) — a label is satisfied only by a
    * known_affected / under_investigation status row: a `fixed` or
    * `known_not_affected` product must NOT satisfy a vulnerable label
    * (that suppression IS the point of VEX). */
  def falseNegativesVex(envelopes: DataFrame, labels: DataFrame): DataFrame = {
    val rows = vexStatusRows(envelopes)
    labels.join(rows,
      labels("expected_vuln") === rows("vuln") &&
        labels("product") === rows("product") &&
        rows("status").isin("known_affected", "under_investigation"),
      "left_anti")
  }

  def assertNoFalseNegativesVex(envelopes: DataFrame,
      labels: DataFrame): Unit =
    assertEmpty(falseNegativesVex(envelopes, labels))

  // ---- chainguard-libraries (annotated-openvex) gate ------------------

  val libraryMatchSchema: StructType = StructType.fromDDL(
    "document STRUCT<vulnerability: STRUCT<name: STRING, " +
      "aliases: ARRAY<STRING>>>, " +
      "fixes ARRAY<STRUCT<available: STRUCT<date: STRING, kind: STRING>, " +
      "product: STRING>>")

  /** (vuln, aliases, pkg, fix_version, fix_date) rows from
    * chainguard-libraries envelopes — pkg and version pulled from the
    * fix's product purl. */
  def libraryFixRows(envelopes: DataFrame): DataFrame =
    envelopes
      .select(from_json(col("item"), libraryMatchSchema).as("d"))
      .select(col("d.document.vulnerability.name").as("vuln"),
        coalesce(col("d.document.vulnerability.aliases"),
          array().cast("array<string>")).as("aliases"),
        explode(col("d.fixes")).as("f"))
      .select(col("vuln"), col("aliases"),
        regexp_extract(col("f.product"), "/([^/@]+)@", 1).as("pkg"),
        // unanchored: a purl with qualifiers or a subpath
        // (`...@2.10.0?type=jar`) must still yield "2.10.0" — the
        // anchored form returned "" there, turning every label for
        // that fix into a phantom false negative
        regexp_extract(col("f.product"), "@([^?#]+)", 1)
          .as("fix_version"),
        col("f.available.date").as("fix_date"))

  /** Library labels with NO matching envelope. `labels` columns:
    * (pkg, version, expected_vuln) plus optional `expected_fix_date`
    * (the statement-timestamp `available.date` annotation). Fix
    * versions are chainguard artifact versions (`2.10.0.cgr.1`,
    * `1.4.2+cgr.2`); EVR segment ordering ranks them correctly against
    * plain upstream versions (the `.cgr.N` / `+cgr.N` suffix sorts
    * above its base), a documented approximation of full
    * maven/pep440 ordering. */
  def falseNegativesLibraries(envelopes: DataFrame,
      labels: DataFrame): DataFrame = {
    val rows = libraryFixRows(envelopes)
    val keyed = labels("pkg") === rows("pkg") &&
      (labels("expected_vuln") === rows("vuln") ||
        array_contains(rows("aliases"), labels("expected_vuln"))) &&
      graft.functions.RpmVersion
        .rpm_ver_cmp(labels("version"), rows("fix_version")) < 0
    val cond =
      if (labels.columns.contains("expected_fix_date"))
        keyed && (labels("expected_fix_date").isNull ||
          rows("fix_date") === labels("expected_fix_date"))
      else keyed
    labels.join(rows, cond, "left_anti")
  }

  def assertNoFalseNegativesLibraries(envelopes: DataFrame,
      labels: DataFrame): Unit =
    assertEmpty(falseNegativesLibraries(envelopes, labels))

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
