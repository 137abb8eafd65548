package graft.providers

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Envelope

/** Echo provider (vunnel `providers/echo/parser.py` — NOT secdb: one
  * `data.json` shaped `{package: {cve_id: {severity, fixed_version}}}`).
  *
  * Semantics mirrored:
  *  - the package→cve map-of-maps pivots into one record per CVE with a
  *    FixedIn per contributing package (`parser.py:86-130`)
  *  - Debian temporary ids (`TEMP-…`) are skipped (`parser.py:89-93`)
  *  - Severity from the entry (default Unknown), VersionFormat "dpkg",
  *    Version kept verbatim — the echo feed has no sentinel mapping, an
  *    absent fixed_version stays "" (`parser.py:99,105-113`)
  *  - Link = cve.org record link for CVE ids, "" otherwise
  *    (`build_reference_links`, `utils/vulnerability.py:149-159`)
  *  - the reference appends FixedIn in dict order; canonical package
  *    order here (O3's deterministic-listing rule)
  *  - fix dates: the reference consults only the first-observed DB (no
  *    advisory candidates exist for echo) — pass that table as the
  *    optional `fixdates` dimension to attach Available records
  */
object EchoProvider {

  /** The top level is a dynamic-keyed map (package names), so the doc
    * goes through from_json with a MapType root — the JSON datasource
    * itself only admits struct roots. */
  val dataSchema: MapType = MapType(StringType,
    MapType(StringType, StructType(Seq(
      StructField("severity", StringType),
      StructField("fixed_version", StringType)))))

  private val namespace = "echo:rolling"

  /** One row per (package, cve) from the staged data.json. */
  def entries(spark: SparkSession, path: String): DataFrame =
    spark.read.option("wholetext", "true").text(path)
      .select(from_json(col("value"), dataSchema).as("m"))
      .select(explode(col("m")).as(Seq("pkg", "cves")))
      .select(col("pkg"), explode(col("cves")).as(Seq("cve", "info")))
      .filter(!col("cve").startsWith("TEMP-"))

  /** Envelopes: one per CVE, FixedIn per package. `fixdates` is the
    * optional first-observed fix-date dimension (vuln, pkg, version,
    * date, kind), the reference's fixdater (`parser.py:32-38,114-125`);
    * matched rows gain Available {Date, Kind}; empty/absent fix
    * versions never match. */
  def envelopes(entries: DataFrame,
      fixdates: Option[DataFrame] = None): DataFrame = {
    val withVer = entries.withColumn("__fixver",
      coalesce(col("info").getField("fixed_version"), lit("")))
    val dated = graft.operators.FixDate.available(withVer, fixdates,
      col("cve"), col("pkg"), col("__fixver"))
    dated
      .groupBy("cve")
      .agg(
        // severity from the first package to name the CVE — made
        // deterministic by min package name (the reference takes dict
        // insertion order, `parser.py:94-100`)
        min_by(coalesce(col("info").getField("severity"), lit("Unknown")),
          col("pkg")).as("severity"),
        array_sort(collect_list(struct(
          col("pkg").as("Name"),
          lit(namespace).as("NamespaceName"),
          col("__fixver").as("Version"),
          lit("dpkg").as("VersionFormat"),
          when(col("available_date").isNotNull, struct(
            col("available_date").as("Date"),
            col("available_kind").as("Kind"))).as("Available"))))
          .as("fixed_in"))
      .select(Envelope.assemble(
        concat(lit(s"$namespace/"), lower(col("cve"))),
        Envelope.OsSchema,
        Envelope.osPayload(struct(
          Envelope.emptyCvss.as("CVSS"),
          lit("").as("Description"),
          col("fixed_in").as("FixedIn"),
          when(col("cve").startsWith("CVE-"),
            concat(lit("https://www.cve.org/CVERecord?id="), col("cve")))
            .otherwise(lit("")).as("Link"),
          Envelope.emptyMetadata.as("Metadata"),
          col("cve").as("Name"),
          lit(namespace).as("NamespaceName"),
          col("severity").as("Severity")))): _*)
  }

  /** Full pipeline from the staged advisory file. */
  def envelopes(spark: SparkSession, path: String): DataFrame =
    envelopes(entries(spark, path))

  def envelopes(spark: SparkSession, path: String,
      fixdates: Option[DataFrame]): DataFrame =
    envelopes(entries(spark, path), fixdates)
}
