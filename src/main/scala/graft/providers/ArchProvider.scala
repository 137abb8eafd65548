package graft.providers

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.Envelope

/** Arch Linux security-tracker provider (vunnel
  * `providers/arch/parser.py` — its own flat-JSON shape, not OSV):
  * AVG group records from the staged `all.json`.
  *
  * Semantics mirrored:
  *  - records without a `name` (AVG id) and records with status
  *    "Not affected" are skipped (`parser.py:253-263`)
  *  - severity is the identity map over Critical/High/Medium/Low,
  *    anything else → Unknown (`parser.py:24-29,275`)
  *  - one FixedIn per non-empty package, VersionFormat "pacman",
  *    Version = fixed or the "None" sentinel (`parser.py:215-225`)
  *  - fix availability: the earliest ASA advisory date across the
  *    record's advisories, kind "advisory" (the reference's accurate
  *    fixdater candidate, `parser.py:130-135,192-213`); records without
  *    a fixed version never resolve. The ASA raw-page date prefetch
  *    (`parser.py:96-165`) is driver-side fetch in this design; its
  *    output is the staged (asa_id, date) table joined here. The
  *    first-observed fallback composes via [[graft.operators.FixDate]]
  *    (J1) over the same FixedIn rows.
  *  - Metadata carries CVE links (nvd.nist.gov) and the raw advisory id
  *    list (`parser.py:228-235`); Description falls back to
  *    "Arch vulnerability AVG-…" when `type` is empty (`parser.py:286`)
  */
object ArchProvider {

  val recordSchema: StructType = StructType.fromDDL(
    "name STRING, status STRING, packages ARRAY<STRING>, fixed STRING, " +
      "severity STRING, type STRING, issues ARRAY<STRING>, " +
      "advisories ARRAY<STRING>")

  val asaSchema: StructType = StructType.fromDDL("asa_id STRING, date STRING")

  private val trackerUrl = "https://security.archlinux.org"
  private val ecosystem = "arch:rolling"

  /** Valid AVG records from a staged `all.json` (one row per group). */
  def records(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "true").schema(recordSchema).json(path)
      .withColumn("name", trim(coalesce(col("name"), lit(""))))
      .filter(col("name") =!= "" &&
        trim(coalesce(col("status"), lit(""))) =!= "Not affected")

  /** Envelopes: one per AVG group. `asaDates` is the staged
    * (asa_id, date) lookup; the earliest matching date becomes the
    * fix-availability candidate for fixed records. */
  def envelopes(records: DataFrame, asaDates: DataFrame): DataFrame = {
    // min ASA date per group: explode the advisory list against the
    // (small) staged date table; both sides of this join are
    // dimension-sized — the broadcast keeps the group frame unshuffled
    val asaMin = records
      .select(col("name"), explode(col("advisories")).as("asa"))
      .join(broadcast(asaDates), col("asa") === asaDates("asa_id"))
      .groupBy("name").agg(min(col("date")).as("asa_date"))

    val sevMap = map(Seq("Critical", "High", "Medium", "Low")
      .flatMap(s => Seq(lit(s), lit(s))): _*)

    val fixedVersion = trim(coalesce(col("fixed"), lit("")))
    val available = when(fixedVersion =!= "" && col("asa_date").isNotNull,
      struct(col("asa_date").as("Date"), lit("advisory").as("Kind")))
    val fixedIn = transform(
      filter(coalesce(col("packages"), array().cast("array<string>")),
        p => coalesce(p, lit("")) =!= ""),
      p => struct(
        available.as("Available"),
        // dataclass defaults the reference always writes
        // (`utils/vulnerability.py:91-103`): Module "" and the
        // no-advisory VendorAdvisory stub
        Envelope.defaultModule.as("Module"),
        p.as("Name"),
        lit(ecosystem).as("NamespaceName"),
        Envelope.defaultVendorAdvisory.as("VendorAdvisory"),
        when(fixedVersion =!= "", fixedVersion).otherwise(lit("None"))
          .as("Version"),
        lit("pacman").as("VersionFormat")))

    val issues = coalesce(col("issues"), array().cast("array<string>"))
    val advisories =
      coalesce(col("advisories"), array().cast("array<string>"))
    val metadata = struct(
      when(size(advisories) > 0, advisories).as("Advisories"),
      when(size(issues) > 0, transform(issues, cve => struct(
        concat(lit("https://nvd.nist.gov/vuln/detail/"), cve).as("Link"),
        cve.as("Name")))).as("CVE"))

    records.join(asaMin, Seq("name"), "left")
      .select(Envelope.assemble(
        concat(lit(s"$ecosystem/"), lower(col("name"))),
        Envelope.OsSchema,
        Envelope.osPayload(struct(
          Envelope.emptyCvss.as("CVSS"),
          when(trim(coalesce(col("type"), lit(""))) =!= "",
            trim(col("type")))
            .otherwise(concat(lit("Arch vulnerability "), col("name")))
            .as("Description"),
          fixedIn.as("FixedIn"),
          concat(lit(s"$trackerUrl/"), col("name")).as("Link"),
          metadata.as("Metadata"),
          col("name").as("Name"),
          lit(ecosystem).as("NamespaceName"),
          coalesce(sevMap(trim(coalesce(col("severity"), lit("")))),
            lit("Unknown")).as("Severity")))): _*)
  }

  /** Full pipeline from staged `all.json` + ASA date table paths. */
  def envelopes(spark: SparkSession, allJson: String,
      asaDatesPath: String): DataFrame =
    envelopes(records(spark, allJson),
      spark.read.option("multiLine", "true").schema(asaSchema)
        .json(asaDatesPath))
}
