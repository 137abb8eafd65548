package graft.providers

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.Envelope

/** Fedora Bodhi provider (vunnel `providers/fedora/parser.py` — a Bodhi
  * REST pipeline with its own severity map and record synthesis, NOT
  * OSV). Parse stage over staged Bodhi page payloads; the REST
  * pagination loop is driver-side fetch like NVD/GHSA.
  *
  * Semantics mirrored:
  *  - severity map incl. Bodhi's urgent/unspecified tiers
  *    (`parser.py:27-38`)
  *  - CVE ids from SECURITY bug titles first, display_name/title
  *    fallback, first-seen order (`_extract_cves`, parser.py:243-264`)
  *  - rpm builds only; NVR rsplit into (name, epoch:version-release),
  *    missing epoch → 0 (`_parse_builds`, parser.py:266-283`)
  *  - alias-less updates and non-numeric release versions dropped;
  *    package-less advisories yield nothing (`parser.py:285-307,320`)
  *  - one record per CVE (advisory id when none); same-CVE records from
  *    multiple updates merge by extending FixedIn, first update's
  *    attributes winning — made deterministic here by explicit
  *    min-alias keys instead of file-glob order (`parser.py:382-413`,
  *    SURVEY §7.4.3)
  *  - Available from the date_stable advisory candidate
  *    (`_normalize`, parser.py:324-330` with the default fixdater)
  */
object FedoraProvider {

  val pageSchema: StructType = StructType.fromDDL(
    "updates ARRAY<STRUCT<alias: STRING, severity: STRING, " +
      "display_name: STRING, title: STRING, notes: STRING, url: STRING, " +
      "date_submitted: STRING, date_modified: STRING, date_stable: STRING, " +
      "release: STRUCT<version: STRING>, " +
      "bugs: ARRAY<STRUCT<security: BOOLEAN, title: STRING>>, " +
      "builds: ARRAY<STRUCT<type: STRING, nvr: STRING, epoch: INT>>>>, " +
      "pages INT")

  private val bodhiUrl = "https://bodhi.fedoraproject.org"
  private val cveRe = "CVE-\\d{4}-\\d+"
  private val nvrRe = "^(.*)-([^-]+)-([^-]+)$"

  /** One parsed advisory per valid update: (advisory_id, namespace,
    * severity, link, date_stable, cves, packages). */
  def advisories(spark: SparkSession, path: String): DataFrame = {
    val sevMap = map(Seq(
      "urgent" -> "Critical", "critical" -> "Critical",
      "important" -> "High", "high" -> "High",
      "moderate" -> "Medium", "medium" -> "Medium",
      "low" -> "Low").flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)

    val u = col("u")
    val bugTitles = concat_ws(" ",
      transform(filter(coalesce(u.getField("bugs"),
        array().cast("array<struct<security:boolean,title:string>>")),
        b => coalesce(b.getField("security"), lit(false))),
        b => coalesce(b.getField("title"), lit(""))))
    val bugCves = array_distinct(regexp_extract_all(bugTitles, lit(cveRe), lit(0)))
    val fallbackCves = array_distinct(regexp_extract_all(
      concat_ws(" ", coalesce(u.getField("display_name"), lit("")),
        coalesce(u.getField("title"), lit(""))), lit(cveRe), lit(0)))

    val packages = transform(
      filter(coalesce(u.getField("builds"),
        array().cast("array<struct<type:string,nvr:string,epoch:int>>")),
        b => b.getField("type") === "rpm" &&
          coalesce(b.getField("nvr"), lit("")).rlike(nvrRe)),
      b => struct(
        regexp_extract(b.getField("nvr"), nvrRe, 1).as("name"),
        concat(coalesce(b.getField("epoch"), lit(0)).cast("string"), lit(":"),
          regexp_extract(b.getField("nvr"), nvrRe, 2), lit("-"),
          regexp_extract(b.getField("nvr"), nvrRe, 3)).as("version")))

    spark.read.option("multiLine", "true").schema(pageSchema).json(path)
      .select(explode(col("updates")).as("u"))
      .filter(coalesce(u.getField("alias"), lit("")) =!= "" &&
        coalesce(u.getField("release").getField("version"), lit(""))
          .rlike("^\\d+$"))
      .select(
        u.getField("alias").as("advisory_id"),
        concat(lit("fedora:"), u.getField("release").getField("version"))
          .as("namespace"),
        coalesce(sevMap(lower(coalesce(u.getField("severity"), lit("")))),
          lit("Unknown")).as("severity"),
        coalesce(u.getField("url"),
          concat(lit(s"$bodhiUrl/updates/"), u.getField("alias"))).as("link"),
        coalesce(u.getField("date_stable"), lit("")).as("date_stable"),
        // Metadata sources (`parser.py:276-277`): Issued from
        // date_submitted, Updated from date_modified falling back to
        // date_stable
        coalesce(u.getField("date_submitted"), lit("")).as("date_issued"),
        coalesce(nullif(u.getField("date_modified"), lit("")),
          u.getField("date_stable"), lit("")).as("date_modified"),
        when(size(bugCves) > 0, bugCves).otherwise(fallbackCves).as("cves"),
        packages.as("packages"))
      .filter(size(col("packages")) > 0)
  }

  /** Envelopes: one per (namespace, CVE) — advisory-id records when an
    * update names no CVE; FixedIn merged across same-CVE updates in
    * alias order, attributes from the lowest alias. */
  def envelopes(adv: DataFrame): DataFrame = {
    val perVuln = adv
      .withColumn("vuln",
        explode(when(size(col("cves")) > 0, col("cves"))
          .otherwise(array(col("advisory_id")))))
      .withColumn("fixed_in", transform(col("packages"), p => struct(
        when(col("date_stable") =!= "",
          struct(substring(col("date_stable"), 1, 10).as("Date"),
            lit("advisory").as("Kind"))).as("Available"),
        lit("").as("Module"),
        p.getField("name").as("Name"),
        col("namespace").as("NamespaceName"),
        struct(
          array(struct(col("advisory_id").as("ID"), col("link").as("Link")))
            .as("AdvisorySummary"),
          lit(false).as("NoAdvisory")).as("VendorAdvisory"),
        p.getField("version").as("Version"),
        lit("rpm").as("VersionFormat"))))

    perVuln
      .groupBy(col("namespace"), col("vuln"))
      .agg(
        min_by(col("severity"), col("advisory_id")).as("severity"),
        min_by(col("link"), col("advisory_id")).as("link"),
        min_by(col("date_issued"), col("advisory_id")).as("date_issued"),
        min_by(col("date_modified"), col("advisory_id"))
          .as("date_modified"),
        // FixedIn extended across updates in alias order (`parser.py:404-409`
        // merge, keyed deterministically instead of glob order)
        flatten(transform(
          array_sort(collect_list(struct(col("advisory_id").as("_a"),
            col("fixed_in").as("fi")))),
          x => x.getField("fi"))).as("fixed_in"))
      .select(Envelope.assemble(
        concat(col("namespace"), lit("/"), lower(col("vuln"))),
        Envelope.OsSchema,
        Envelope.osPayload(struct(
          Envelope.emptyCvss.as("CVSS"),
          lit("").as("Description"),
          col("fixed_in").as("FixedIn"),
          col("link").as("Link"),
          // reference Metadata (`parser.py:345-369`): Issued/Updated
          // from the update record, CVE as [{Name, Link}] for CVE-keyed
          // records and [] for advisory-id records
          struct(
            when(col("vuln").startsWith("CVE-"), array(struct(
              concat(lit("https://nvd.nist.gov/vuln/detail/"),
                col("vuln")).as("Link"),
              col("vuln").as("Name"))))
              .otherwise(array().cast(
                "array<struct<Link:string,Name:string>>")).as("CVE"),
            coalesce(col("date_issued"), lit("")).as("Issued"),
            coalesce(col("date_modified"), lit("")).as("Updated"))
            .as("Metadata"),
          col("vuln").as("Name"),
          col("namespace").as("NamespaceName"),
          col("severity").as("Severity")))): _*)
  }

  /** Full pipeline from a staged Bodhi page payload. */
  def envelopes(spark: SparkSession, path: String): DataFrame =
    envelopes(advisories(spark, path))
}
