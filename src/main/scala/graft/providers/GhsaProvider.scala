package graft.providers

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.functions.Cvss

/** GHSA provider parse stage (S3's per-page payload; the GraphQL cursor
  * loop itself is driver-side fetch): advisory nodes → per-package rows
  * with the ecosystem allow-list (P7, `providers/github/parser.py:42-55,
  * 717-756`), severity normalization (`parser.py:595-602`) and CVSS
  * scoring from the vector string (F8, `parser.py:604-628` — trailing
  * '/' stripped, malformed vectors skipped).
  */
object GhsaProvider {

  /** GHSA ecosystem → syft package type; unmapped ecosystems DROPPED. */
  val ecosystemMap: Map[String, String] = Map(
    "COMPOSER" -> "php-composer", "GO" -> "go-module", "MAVEN" -> "java-archive",
    "NPM" -> "npm", "NUGET" -> "dotnet", "PIP" -> "python",
    "PUB" -> "dart-pub", "RUBYGEMS" -> "gem", "RUST" -> "rust-crate",
    "SWIFT" -> "swift")

  val pageSchema: StructType = StructType.fromDDL(
    "data STRUCT<securityAdvisories: STRUCT<" +
      "pageInfo: STRUCT<endCursor: STRING, hasNextPage: BOOLEAN>, " +
      "nodes: ARRAY<STRUCT<" +
      "ghsaId: STRING, severity: STRING, summary: STRING, " +
      "publishedAt: STRING, updatedAt: STRING, " +
      "identifiers: ARRAY<STRUCT<type: STRING, value: STRING>>, " +
      "cvss: STRUCT<vectorString: STRING>, " +
      "cvssSeverities: STRUCT<cvssV4: STRUCT<vectorString: STRING>>, " +
      "vulnerabilities: STRUCT<nodes: ARRAY<STRUCT<" +
      "package: STRUCT<ecosystem: STRING, name: STRING>, " +
      "vulnerableVersionRange: STRING, " +
      "firstPatchedVersion: STRUCT<identifier: STRING>>>>>>>>")

  private def severityWord(raw: Column): Column =
    when(raw === "LOW", "Low").when(raw === "MODERATE", "Medium")
      .when(raw === "HIGH", "High").when(raw === "CRITICAL", "Critical")
      .otherwise("Unknown")

  /** One row per (advisory, package): ecosystem-mapped (unmapped dropped),
    * CVE id extracted when present, CVSS scored from the vector. */
  def advisories(spark: SparkSession, path: String): DataFrame = {
    val ecoMap = map(ecosystemMap.toSeq
      .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    spark.read.option("multiLine", "true").schema(pageSchema).json(path)
      .select(explode(col("data.securityAdvisories.nodes")).as("a"))
      .select(
        col("a.ghsaId").as("ghsa_id"),
        try_element_at(filter(col("a.identifiers"),
          i => i.getField("type") === "CVE"), lit(1)).getField("value")
          .as("cve"),
        severityWord(col("a.severity")).as("severity"),
        col("a.summary").as("summary"),
        col("a.publishedAt").as("published"),
        Cvss.cvss3_score(nullif(col("a.cvss.vectorString"), lit("")))
          .as("cvss"),
        Cvss.cvss4_validate(
          nullif(col("a.cvssSeverities.cvssV4.vectorString"), lit("")))
          .as("cvss_v4"),
        explode(col("a.vulnerabilities.nodes")).as("v"))
      .select(col("ghsa_id"), col("cve"), col("severity"), col("summary"),
        col("published"), col("cvss"), col("cvss_v4"),
        element_at(ecoMap, col("v.package.ecosystem")).as("ecosystem"),
        col("v.package.name").as("pkg"),
        // the reference strips commas from the range before it lands in
        // the record (`providers/github/parser.py:730` — ">= 1.2.0,
        // < 1.4.3" → ">= 1.2.0 < 1.4.3"); keep byte parity
        regexp_replace(col("v.vulnerableVersionRange"), ",", "").as("range"),
        col("v.firstPatchedVersion.identifier").as("fixed_in"))
      .filter(col("ecosystem").isNotNull) // P7: unmapped dropped
  }

  /** Envelope assembly: one record per (advisory, ecosystem) — the
    * reference's GHSA record shape (`providers/github/parser.py:104-184`,
    * namespace `github:<ecosystem>`, null firstPatchedVersion → "None")
    * flattened to a sorted-field payload for canonical JSON. FixedIn is
    * array_sort'ed (struct natural order, leading field Ecosystem then
    * Identifier/Name) — deterministic, never input row order. */
  def envelopes(rows: DataFrame): DataFrame = {
    import graft.Envelope
    rows
      .groupBy(col("ghsa_id"), col("ecosystem"), col("cve"),
        col("severity"), col("summary"), col("published"),
        col("cvss"), col("cvss_v4"))
      .agg(array_sort(collect_list(struct(
        col("ecosystem").as("Ecosystem"),
        coalesce(col("fixed_in"), lit("None")).as("Identifier"),
        col("pkg").as("Name"),
        col("range").as("Range")))).as("fixed_in_list"))
      .select(Envelope.assemble(
        concat(lit("github:"), col("ecosystem"), lit("/"),
          lower(col("ghsa_id"))),
        Envelope.GhsaSchema,
        struct(
          col("cve").as("CVE"),
          when(col("cvss").isNotNull, struct(
            col("cvss.baseScore").as("base_score"),
            col("cvss.baseSeverity").as("base_severity"),
            col("cvss.exploitabilityScore").as("exploitability_score"),
            col("cvss.impactScore").as("impact_score"),
            col("cvss.version").as("version"))).as("CVSS"),
          when(col("cvss_v4").isNotNull, struct(
            col("cvss_v4.vector").as("vector"),
            col("cvss_v4.version").as("version"))).as("CVSS4"),
          col("fixed_in_list").as("FixedIn"),
          col("ghsa_id").as("GhsaID"),
          concat(lit("https://github.com/advisories/"), col("ghsa_id"))
            .as("Link"),
          concat(lit("github:"), col("ecosystem")).as("Namespace"),
          col("published").as("Published"),
          col("severity").as("Severity"),
          col("summary").as("Summary"))): _*)
  }

  /** S3's cursor step (`providers/github/parser.py:215-219`): the next
    * GraphQL `after` cursor — endCursor while hasNextPage, None at the
    * last page. The loop's decision logic; the driver executes each
    * request through [[graft.sources.StagedFetch]]. */
  def nextCursor(page: DataFrame): Option[String] = {
    val r = page.select(
      col("data.securityAdvisories.pageInfo.hasNextPage"),
      col("data.securityAdvisories.pageInfo.endCursor")).head()
    if (!r.isNullAt(0) && r.getBoolean(0)) Option(r.getString(1)) else None
  }

  /** [[nextCursor]] from a staged page document. */
  def nextCursor(spark: SparkSession, path: String): Option[String] =
    nextCursor(spark.read.option("multiLine", "true").schema(pageSchema)
      .json(path))

  /** The full `run github` composition from nothing but a transport:
    * cursor-walk every GraphQL page under the retry envelope
    * ([[graft.sources.FetchLoop.ghsaWalk]]), parse the staged pages as
    * one distributed read, assemble per-(advisory, ecosystem)
    * envelopes, commit to the checksummed store. Returns
    * (result count, store digest). */
  def run(spark: SparkSession, baseUrl: String,
      stageDir: java.nio.file.Path, storeRoot: String,
      transport: graft.sources.StagedFetch.Transport,
      cfg: graft.sources.StagedFetch.Config = graft.sources.StagedFetch.Config(),
      sleeper: Double => Unit = s => Thread.sleep((s * 1000).toLong))
      : (Long, String) = {
    graft.sources.FetchLoop.ghsaWalk(spark, baseUrl, stageDir, transport,
      cfg, sleeper)
    graft.sources.FetchLoop.commitRun(spark,
      envelopes(advisories(spark, s"$stageDir/*.json")), storeRoot,
      "github")
  }
}
