package graft.providers

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.Envelope

/** VMware Photon OS provider (vunnel `providers/photon/parser.py` —
  * per-version flat CVE JSON + a wiki of PHSA advisory markdown, NOT
  * OSV).
  *
  * Semantics mirrored:
  *  - per-version `cve_data_photonX.Y.json` staged files; the version
  *    comes from the filename (`parser.py:221-228`) — here via
  *    `input_file_name`, so all versions parse in one scan
  *  - BDSA records skipped; "Not Affected" entries produce no FixedIn;
  *    CVEs whose entries all drop yield no record (`parser.py:266-282`)
  *  - `res_ver` "NA"/empty → the "None" sentinel (`parser.py:65-69`);
  *    VersionFormat "rpm"
  *  - severity from the CVSS score thresholds (`cvss_to_severity`,
  *    `parser.py:51-62`) — the reference takes the first entry with a
  *    score in file order; made deterministic here as the max score
  *    across the CVE's entries (same bucket unless a CVE's own entries
  *    disagree on score, which file order would resolve arbitrarily)
  *  - advisory wiki: `Security-Updates-<ver>-<n>.md` filename gate,
  *    Advisory Id / Issue date / CVE regexes, earliest advisory wins
  *    per (version, cve) (`parser.py:37-40,72-140`); matched advisories
  *    become VendorAdvisory + Metadata.Issued + the fix-availability
  *    date (`parser.py:230-253,311-338`); the git clone of the wiki is
  *    driver-side fetch (S11), the staged worktree is scanned here
  *  - Link = cve.org record link (`build_reference_links`,
  *    `utils/vulnerability.py:149-154`)
  */
object PhotonProvider {

  val cveSchema: StructType = StructType.fromDDL(
    "cve_id STRING, pkg STRING, res_ver STRING, cve_score DOUBLE, " +
      "status STRING")

  private val wikiBase = "https://github.com/vmware/photon/wiki"
  // anchored like the reference's `.match()` on the basename
  private val fileRe = "^Security-Updates?-(\\d+\\.\\d+)-\\d+\\.md$"
  private val advisoryIdRe =
    "Advisory\\s+(?:Id|ID)\\s*:\\s*(PHSA-\\d{4}-(?:\\d+\\.\\d+-)?0*\\d+)"
  private val issueDateRe =
    "(?:Issue\\s+date|Issued\\s+on)\\s*:\\s*(\\d{4}-\\d{2}-\\d{2})"
  private val cveRe = "CVE-\\d{4}-\\d+"

  /** (version, cve_id) → earliest advisory (advisory_id, date, url)
    * from a staged wiki worktree of PHSA markdown files. */
  def advisories(spark: SparkSession, wikiDir: String): DataFrame = {
    val raw = spark.read.option("wholetext", "true")
      .text(s"$wikiDir/*.md")
      .withColumn("file",
        element_at(split(input_file_name(), "/"), -1))
      .filter(col("file").rlike(fileRe))
      .select(
        regexp_extract(col("file"), fileRe, 1).as("version"),
        regexp_extract(col("value"), advisoryIdRe, 1).as("advisory_id"),
        regexp_extract(col("value"), issueDateRe, 1).as("date"),
        array_distinct(regexp_extract_all(col("value"), lit(cveRe), lit(0)))
          .as("cves"),
        concat(lit(s"$wikiBase/"),
          regexp_replace(col("file"), "\\.md$", "")).as("url"))
      // unparseable advisories are skipped whole (`parser.py:87-99`)
      .filter(col("advisory_id") =!= "" && col("date") =!= "" &&
        size(col("cves")) > 0)

    raw.select(col("version"), explode(col("cves")).as("cve_id"),
        col("advisory_id"), col("date"), col("url"))
      .groupBy("version", "cve_id")
      .agg(min_by(struct(col("advisory_id"), col("date"), col("url")),
        struct(col("date"), col("advisory_id"))).as("advisory"))
  }

  /** Affected-package entries from staged per-version CVE files. */
  def records(spark: SparkSession, cveGlob: String): DataFrame =
    spark.read.option("multiLine", "true").schema(cveSchema).json(cveGlob)
      .withColumn("version", regexp_extract(
        element_at(split(input_file_name(), "/"), -1),
        "cve_data_photon(\\d+\\.\\d+)\\.json$", 1))
      .filter(col("version") =!= "" &&
        coalesce(col("cve_id"), lit("")) =!= "" &&
        !lower(col("cve_id")).startsWith("bdsa"))

  /** Envelopes: one per (photon version, CVE) with at least one
    * affected package. */
  def envelopes(records: DataFrame, advisories: DataFrame): DataFrame = {
    val ns = concat(lit("photon:"), col("version"))
    // severity draws on ALL of a CVE's entries (`parser.py:286-290`
    // iterates the unfiltered list); FixedIn drops Not-Affected and
    // package-less entries (`parser.py:231-237`) — so the filter lives
    // inside the collect, not before the groupBy
    val perCve = records
      .groupBy("version", "cve_id")
      .agg(
        max(col("cve_score")).as("score"),
        // canonical package order (the reference keeps file order; O3's
        // deterministic-listing rule applies here)
        array_sort(collect_list(
          when(coalesce(col("status"), lit("")) =!= "Not Affected" &&
            coalesce(col("pkg"), lit("")) =!= "", struct(
            col("pkg").as("pkg"),
            when(coalesce(col("res_ver"), lit("")).isin("", "NA"),
              lit("None")).otherwise(col("res_ver")).as("ver")))))
          .as("pkgs"))
      .filter(size(col("pkgs")) > 0)

    val severity = when(col("score").isNull, lit("Unknown"))
      .when(col("score") >= 9.0, lit("Critical"))
      .when(col("score") >= 7.0, lit("High"))
      .when(col("score") >= 4.0, lit("Medium"))
      .when(col("score") >= 0.1, lit("Low"))
      .otherwise(lit("Negligible"))

    val adv = col("advisory")
    val vendorAdvisory = when(adv.isNotNull, struct(
      array(struct(adv.getField("advisory_id").as("ID"),
        adv.getField("url").as("Link"))).as("AdvisorySummary"),
      lit(false).as("NoAdvisory")))
    val available = when(adv.isNotNull,
      struct(adv.getField("date").as("Date"), lit("advisory").as("Kind")))
    val fixedIn = transform(col("pkgs"), p => struct(
      // fix-availability from the advisory date; unfixed sentinels
      // never resolve (`parser.py:323-337` patch rule — the
      // first-observed fallback composes via FixDate.enrich)
      when(p.getField("ver") =!= "None", available).as("Available"),
      Envelope.defaultModule.as("Module"),
      p.getField("pkg").as("Name"),
      ns.as("NamespaceName"),
      coalesce(vendorAdvisory, Envelope.defaultVendorAdvisory)
        .as("VendorAdvisory"),
      p.getField("ver").as("Version"),
      lit("rpm").as("VersionFormat")))

    perCve
      .join(broadcast(advisories), Seq("version", "cve_id"), "left")
      .select(Envelope.assemble(
        concat(ns, lit("/"), lower(col("cve_id"))),
        Envelope.OsSchema,
        Envelope.osPayload(struct(
          Envelope.emptyCvss.as("CVSS"),
          lit("").as("Description"),
          fixedIn.as("FixedIn"),
          concat(lit("https://www.cve.org/CVERecord?id="), col("cve_id"))
            .as("Link"),
          // a single optional field: null Issued drops, leaving the
          // reference's bare {} for advisory-less records
          struct(when(adv.isNotNull, adv.getField("date")).as("Issued"))
            .as("Metadata"),
          col("cve_id").as("Name"),
          ns.as("NamespaceName"),
          severity.as("Severity")))): _*)
  }

  /** Full pipeline from staged CVE-file glob + wiki worktree dir. */
  def envelopes(spark: SparkSession, cveGlob: String,
      wikiDir: String): DataFrame =
    envelopes(records(spark, cveGlob), advisories(spark, wikiDir))
}
