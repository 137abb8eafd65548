package graft.providers

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.Envelope
import graft.functions.{Constraints, Cvss, ProductId}
import graft.plans.RpmExpressions

/** RHEL end-to-end envelope assembly (vunnel `providers/rhel/parser.py:
  * 440-1000`): Hydra full-CVE docs × the CSAF FPI dimension → one
  * `rhel:N/cve-…` OS-schema envelope per (CVE, platform), carrying
  * VulnerableRange + per-stream Advisories for multi-stream fixes.
  *
  * Spark shape (one pass, two grouping shuffles):
  *  1. explode `affected_release` / `package_state` (A1);
  *  2. resolve fix versions against the broadcast CSAF dimension
  *     ([[RhelCsafJoin.fixInfo]], J3) with Hydra-version fallback;
  *  3. reduce each (cve, platform, pkg, module) bucket relationally:
  *     `array_sort(collect_list(...))` keyed by the NATIVE rpm sort key
  *     (never lexical, never input order — SURVEY §7.4.3), then
  *     higher-order array ops for the per-base / per-stream reductions
  *     (`parser.py:577-667`) — adjacent-run dedup instead of the
  *     reference's O(n²) compare-at-insert;
  *  4. package_state trumps fixes (A4 anti-join, `parser.py:846-875`),
  *     EUS/ELS base platforms inferred as wont-fix records
  *     (`parser.py:882-904`), "+els" namespaces never emitted;
  *  5. group to envelopes with FixedIn sorted by (Name, Version).
  */
object RhelProvider {

  val hydraSchema: StructType = StructType.fromDDL(
    "name STRING, threat_severity STRING, details ARRAY<STRING>, " +
      "cvss3 STRUCT<cvss3_scoring_vector: STRING, cvss3_base_score: STRING, " +
      "status: STRING>, " +
      "affected_release ARRAY<STRUCT<product_name: STRING, advisory: STRING, " +
      "cpe: STRING, package: STRING>>, " +
      "package_state ARRAY<STRUCT<product_name: STRING, fix_state: STRING, " +
      "package_name: STRING>>")

  private val summaryDdl = "array<struct<ID:string,Link:string>>"
  private val advisoriesDdl =
    "array<struct<Advisory:string,Channels:array<string>,Minor:int,Version:string>>"
  private val errataPrefix = "https://access.redhat.com/errata/"

  // ---- scalar parses (`parser.py:754-797,394-438`) ----------------------

  private val releaseRe = "^Red Hat Enterprise Linux\\s*(\\d+)$".r
  private val eusRe =
    "^Red Hat Enterprise Linux (\\d+\\.\\d+) Extended Update Support".r
  private val elsRe =
    "^Red Hat Enterprise Linux (\\d+) Extended Lifecycle Support".r

  /** product_name → platform ("9", "8.6+eus", "7+els"), null = unmapped. */
  def parsePlatform(productName: String): String = {
    if (productName == null) return null
    releaseRe.findFirstMatchIn(productName).map(_.group(1))
      .orElse(eusRe.findFirstMatchIn(productName).map(_.group(1) + "+eus"))
      .orElse(elsRe.findFirstMatchIn(productName).map(_.group(1) + "+els"))
      .orNull
  }

  /** "8.6+eus" → "8"; "6+els" → "6"; base platform already → null
    * (`_get_base_platform`, parser.py:843-856). */
  def basePlatform(platform: String): String =
    if (platform == null) null
    else if (platform.contains("+eus")) platform.split("\\.")(0)
    else if (platform.contains("+els")) platform.replace("+els", "")
    else null

  /** python-style rsplit: at most `max` splits from the right. */
  private def rsplit(s: String, sep: Char, max: Int): Array[String] = {
    var rest = s
    var parts = List.empty[String]
    var n = 0
    var i = rest.lastIndexOf(sep)
    while (n < max && i >= 0) {
      parts = rest.substring(i + 1) :: parts
      rest = rest.substring(0, i)
      n += 1
      i = rest.lastIndexOf(sep)
    }
    (rest :: parts).toArray
  }

  /** Best-effort (name, version) from a Hydra package string — epoch
    * first / epoch mid / app-stream colon / plain forms
    * (`_get_name_version`, parser.py:394-438). */
  def nameVersion(pkg: String): (String, String) = {
    if (pkg == null || pkg.isEmpty) return (null, null)
    if (pkg.contains(":")) {
      val colon = pkg.split(":", 2)
      if (colon(0).nonEmpty && colon(0).forall(_.isDigit)) {
        // epoch first: 1:foo-bar-2.3.4-5.el6
        val comps = rsplit(colon(1), '-', 2)
        val v = if (comps.length > 1) colon(0) + ":" + comps.drop(1).mkString("-")
                else null
        (comps(0), v)
      } else {
        val nameComps = rsplit(colon(0), '-', 1)
        if (nameComps.length > 1 && nameComps(1).nonEmpty &&
          nameComps(1).forall(_.isDigit))
          // epoch mid: foo-bar-1:2.3.4-5.el6
          (nameComps(0), nameComps(1) + ":" + colon(1))
        else (colon(0), null) // app stream: name best guess, CSAF lookup
      }
    } else if (pkg.count(_ == '-') >= 2) {
      val comps = rsplit(pkg, '-', 2)
      (comps(0), comps.drop(1).mkString("-"))
    } else (pkg, null)
  }

  private val platformUdf = udf((s: String) => Option(parsePlatform(s)))
  private val basePlatformUdf = udf((s: String) => Option(basePlatform(s)))
  private val nameVersionUdf = udf((s: String) => nameVersion(s))

  // ---- scan + explode ----------------------------------------------------

  def hydraScan(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "true").schema(hydraSchema).json(path)

  /** One row per affected release: (cve, platform, platform_cpe, rhsa_id,
    * pkg, hydra_version). Unmapped platforms and nameless packages are
    * dropped (`parser.py:556-560` "futile"; the never-taken
    * missing-package RHSA guess of parser.py:516-545 is omitted). */
  def affectedReleaseRows(hydra: DataFrame): DataFrame =
    hydra.select(col("name").as("cve"), explode(col("affected_release")).as("ar"))
      .select(col("cve"),
        platformUdf(col("ar.product_name")).as("platform"),
        col("ar.cpe").as("platform_cpe"),
        col("ar.advisory").as("rhsa_id"),
        nameVersionUdf(col("ar.package")).as("nv"))
      .select(col("cve"), col("platform"), col("platform_cpe"),
        col("rhsa_id"), col("nv._1").as("pkg"),
        col("nv._2").as("hydra_version"))
      .filter(col("platform").isNotNull && col("pkg").isNotNull)

  /** package_state rows → not-fixed FixedIns (`_parse_package_state`,
    * parser.py:700-752): state map incl. "Not affected" → "0", flatpak
    * modules skipped, module split from "module/pkg". */
  def packageStateRows(hydra: DataFrame): DataFrame =
    hydra.select(col("name").as("cve"), explode(col("package_state")).as("ps"))
      .select(col("cve"),
        platformUdf(col("ps.product_name")).as("platform"),
        col("ps.fix_state").as("fix_state"),
        col("ps.package_name").as("package_name"))
      .filter(col("platform").isNotNull && col("package_name").isNotNull)
      .withColumn("module",
        when(col("package_name").contains("/"),
          split(col("package_name"), "/").getItem(0)).cast("string"))
      .withColumn("pkg",
        when(col("package_name").contains("/"),
          split(col("package_name"), "/").getItem(1))
          .otherwise(col("package_name")))
      .filter(col("module").isNull || !col("module").endsWith(":flatpak"))
      .withColumn("version",
        when(col("fix_state") === "Not affected", "0")
          .when(col("fix_state").isin(
            "Affected", "Fix deferred", "Will not fix", "Out of support scope"),
            "None"))
      .filter(col("version").isNotNull) // New / Under investigation skipped
      .select(col("cve"), col("platform"), col("pkg"), col("module"),
        col("version"),
        col("fix_state").isin("Will not fix", "Out of support scope")
          .as("wont_fix"),
        lit(null).cast("string").as("vulnerable_range"),
        array().cast(summaryDdl).as("summary"),
        array().cast(advisoriesDdl).as("advisories"))

  // ---- fix resolution + bucket reduction ---------------------------------

  /** Resolve versions against the CSAF dimension (J3) with Hydra-version
    * fallback, then precompute the per-row reduction keys. */
  private def resolvedFixes(ars: DataFrame, fpis: DataFrame): DataFrame =
    RhelCsafJoin.fixInfo(ars, fpis)
      .withColumn("version", coalesce(col("version"), col("hydra_version")))
      .filter(col("version").isNotNull)
      .withColumn("base", Constraints.version_base(col("version")))
      .withColumn("minor", coalesce(
        ProductId.product_id_info(col("product_id")).getField("_1").cast("int"),
        ProductId.dist_tag_minor(col("version"))))
      .withColumn("sort_key", RpmExpressions.rpm_sort_key(col("version")))

  /** Reduce each (cve, platform, pkg, module) bucket (`parser.py:577-667`):
    * rpm-ascending sort → adjacent dedup of compare-equal versions → last
    * fix per upstream base → canonical = newest base's fix; 2+ bases →
    * VulnerableRange + folded advisory summary (newest first, distinct);
    * 2+ distinct builds → per-stream Advisories with FPI minor (dist-tag
    * fallback) and channel sets. */
  def reduceBuckets(rows: DataFrame): DataFrame =
    rows.groupBy("cve", "platform", "pkg", "module")
      .agg(array_sort(collect_list(struct(
        col("sort_key"), col("version"), col("base"), col("rhsa_id"),
        col("minor"), col("channels")))).as("all_ars"))
      // compare-equal versions share a sort key and are adjacent: keep first
      .withColumn("ars", filter(col("all_ars"), (x, i) =>
        i === 0 || get(col("all_ars"), i - 1).getField("sort_key") =!=
          x.getField("sort_key")))
      // same-base runs are adjacent too (base = epoch:version prefix of the
      // sort order): keep the LAST (= highest fix) of each run
      .withColumn("base_fixes", filter(col("ars"), (x, i) => {
        val next = get(col("ars"), i + 1)
        next.isNull || next.getField("base") =!= x.getField("base")
      }))
      .withColumn("canonical", element_at(col("base_fixes"), -1))
      .withColumn("vulnerable_range", when(size(col("base_fixes")) > 1,
        Constraints.vulnerable_range(
          transform(col("base_fixes"), x => x.getField("version")))))
      .withColumn("advisories", when(size(col("ars")) > 1,
        transform(reverse(col("ars")), x => struct(
          coalesce(x.getField("rhsa_id"), lit("")).as("Advisory"),
          x.getField("channels").as("Channels"),
          x.getField("minor").as("Minor"),
          x.getField("version").as("Version"))))
        .otherwise(array().cast(advisoriesDdl)))
      .withColumn("summary", when(size(col("base_fixes")) > 1,
        transform(
          array_distinct(filter(
            transform(reverse(col("ars")), x => x.getField("rhsa_id")),
            id => id.isNotNull)),
          id => struct(id.as("ID"), concat(lit(errataPrefix), id).as("Link"))))
        .otherwise(when(col("canonical").getField("rhsa_id").isNotNull,
          array(struct(col("canonical").getField("rhsa_id").as("ID"),
            concat(lit(errataPrefix), col("canonical").getField("rhsa_id"))
              .as("Link"))))
          .otherwise(array().cast(summaryDdl))))
      .select(col("cve"), col("platform"), col("pkg"), col("module"),
        col("canonical").getField("version").as("version"),
        lit(false).as("wont_fix"),
        col("vulnerable_range"), col("summary"), col("advisories"))

  // ---- assembly -----------------------------------------------------------

  private def severityWord(ts: Column): Column = {
    val l = lower(ts)
    when(l === "critical", "Critical").when(l === "important", "High")
      .when(l === "moderate", "Medium").when(l === "low", "Low")
      .otherwise("Unknown")
  }

  /** Per-CVE attributes: severity word, last `details` entry as the
    * description, normalized CVSS3 (Hydra base score + vector-derived
    * sub-scores, `RHELCVSS3.normalize`, parser.py:1165-1176). */
  private def cveAttrs(hydra: DataFrame): DataFrame = {
    val scores = Cvss.cvss3_score(col("cvss3.cvss3_scoring_vector"))
    hydra.select(col("name").as("cve"),
      severityWord(col("threat_severity")).as("severity"),
      coalesce(try_element_at(col("details"), lit(-1)), lit(""))
        .as("description"),
      when(scores.isNotNull &&
        col("cvss3.cvss3_base_score").cast("double").isNotNull,
        array(struct(
          struct(
            col("cvss3.cvss3_base_score").cast("double").as("base_score"),
            scores.getField("baseSeverity").as("base_severity"),
            scores.getField("exploitabilityScore").as("exploitability_score"),
            scores.getField("impactScore").as("impact_score"))
            .as("base_metrics"),
          col("cvss3.status").as("status"),
          col("cvss3.cvss3_scoring_vector").as("vector_string"),
          scores.getField("version").as("version"))))
        .otherwise(array().cast("array<struct<base_metrics:struct<" +
          "base_score:double,base_severity:string,exploitability_score:double," +
          "impact_score:double>,status:string,vector_string:string," +
          "version:string>>"))
        .as("cvss"))
  }

  /** Full pipeline: Hydra docs + CSAF FPI dimension → OS-schema
    * envelopes. `fpis`: (rhsa_id, cve, fpi, plat_cpe, module, name,
    * version) as for [[RhelCsafJoin.fixInfo]]. */
  def envelopes(hydra: DataFrame, fpis: DataFrame,
      skipNamespaces: Set[String] = Set.empty,
      fixdates: Option[DataFrame] = None): DataFrame = {
    val notSkipped = (df: DataFrame) =>
      if (skipNamespaces.isEmpty) df
      else df.filter(!concat(lit("rhel:"), col("platform"))
        .isin(skipNamespaces.toSeq: _*))

    val fins = notSkipped(
      reduceBuckets(resolvedFixes(affectedReleaseRows(hydra), fpis)))
    val nfins = notSkipped(packageStateRows(hydra))

    // A4: a package_state row for the same (platform, pkg, module) trumps
    // any partial fix (`parser.py:866-875`); null-safe on module
    val n = nfins.select(col("cve").as("n_cve"), col("platform").as("n_plat"),
      col("pkg").as("n_pkg"), col("module").as("n_mod"))
    val finsKept = fins.join(n,
      col("cve") === col("n_cve") && col("platform") === col("n_plat") &&
        col("pkg") === col("n_pkg") && col("module") <=> col("n_mod"),
      "left_anti")

    val artifacts = nfins.unionByName(finsKept)

    // EUS/ELS base-platform inference (`parser.py:882-904`): extended
    // channels with no base-platform record synthesize wont-fix Nones
    val platformSet = artifacts.select("cve", "platform").distinct()
    val inferred = artifacts
      .withColumn("base_platform", basePlatformUdf(col("platform")))
      .filter(col("base_platform").isNotNull)
      .join(platformSet
          .withColumnRenamed("platform", "base_platform"),
        Seq("cve", "base_platform"), "left_anti")
      .filter(if (skipNamespaces.isEmpty) lit(true)
        else !concat(lit("rhel:"), col("base_platform"))
          .isin(skipNamespaces.toSeq: _*))
      .select(col("cve"), col("base_platform").as("platform"), col("pkg"),
        col("module"), lit("None").as("version"), lit(true).as("wont_fix"),
        lit(null).cast("string").as("vulnerable_range"),
        array().cast(summaryDdl).as("summary"),
        array().cast(advisoriesDdl).as("advisories"))
      .distinct()

    val emitted = graft.operators.FixDate.available(
      artifacts.unionByName(inferred)
        .filter(!col("platform").contains("+els")), // `parser.py:907-908`
      fixdates, col("cve"), col("pkg"), col("version"),
      ecosystem = Some(concat(lit("rhel:"), col("platform"))))

    val fi = struct(
      when(size(col("advisories")) > 0, col("advisories")).as("Advisories"),
      // the fixdater's first-observed verdict (`parser.py:990-994`) —
      // rhel alone writes the lowercase {date, kind} key pair
      when(col("available_date").isNotNull, struct(
        col("available_date").as("date"),
        col("available_kind").as("kind"))).as("Available"),
      col("module").as("Module"),
      col("pkg").as("Name"),
      concat(lit("rhel:"), col("platform")).as("NamespaceName"),
      when(col("wont_fix"),
        struct(lit(null).cast(summaryDdl).as("AdvisorySummary"),
          lit(true).as("NoAdvisory")))
        .otherwise(struct(col("summary").as("AdvisorySummary"),
          lit(false).as("NoAdvisory"))).as("VendorAdvisory"),
      col("version").as("Version"),
      lit("rpm").as("VersionFormat"),
      col("vulnerable_range").as("VulnerableRange"))

    emitted
      .groupBy(col("cve"), col("platform"))
      // O3: FixedIn in canonical (Name, Version) order via explicit keys
      .agg(array_sort(collect_list(struct(
        col("pkg").as("_n"), col("version").as("_v"), fi.as("fi"))))
        .as("sorted_fi"))
      .join(cveAttrs(hydra), Seq("cve"))
      .select(Envelope.assemble(
        concat(lit("rhel:"), col("platform"), lit("/"), lower(col("cve"))),
        // rhel pins os-schema 1.1.2, NOT the 1.1.0 default — it emits
        // the per-stream FixedIn.Advisories table, a 1.1.2-only field
        // the version-gated SchemaGate would quarantine under 1.1.0
        // (reference: `providers/rhel/__init__.py:48`)
        Envelope.osSchema("1.1.2"),
        Envelope.osPayload(struct(
          col("cvss").as("CVSS"),
          col("description").as("Description"),
          transform(col("sorted_fi"), x => x.getField("fi")).as("FixedIn"),
          concat(lit("https://access.redhat.com/security/cve/"), col("cve"))
            .as("Link"),
          Envelope.emptyMetadata.as("Metadata"),
          col("cve").as("Name"),
          concat(lit("rhel:"), col("platform")).as("NamespaceName"),
          col("severity").as("Severity")))): _*)
  }
}
