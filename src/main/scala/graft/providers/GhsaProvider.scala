package graft.providers

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.functions.Cvss

/** GHSA provider parse stage (S3's per-page payload; the GraphQL cursor
  * loop itself is driver-side fetch): advisory nodes → per-package rows
  * with the ecosystem allow-list (P7, `providers/github/parser.py:42-55,
  * 717-756`), severity normalization (`parser.py:595-602`), CVSS v3
  * scoring from the vector string (F8, `parser.py:604-628` — trailing
  * '/' stripped, malformed vectors skipped) and v3/v4 `cvss_severities`
  * summaries (`parser.py:630-696`).
  *
  * Record shape matches the reference's github-security-advisory
  * payload (`providers/github/__init__.py:76-99`,
  * `tests/unit/providers/github/test-fixtures/snapshots/`): one
  * envelope per (advisory, ecosystem), item =
  * `{"Advisory": {...}, "Vulnerability": {}}` with lower-case FixedIn
  * record keys, the CVE list duplicated under `Metadata.CVE`, and the
  * per-record `available` fix-date attached when the fix-date dimension
  * resolves one (`parser.py:740-751`). Known divergences, both
  * deliberate: canonical JSON drops null-valued keys (the reference
  * writes `"withdrawn": null` explicitly), and FixedIn is array_sort'ed
  * for determinism where the reference keeps API page order.
  */
object GhsaProvider {

  /** GHSA ecosystem → grype ecosystem (`parser.py:42-55`); unmapped
    * values (future GraphQL enum additions) are DROPPED with the same
    * allow-list stance as the reference's else-branch debug log. */
  val ecosystemMap: Map[String, String] = Map(
    "COMPOSER" -> "composer", "ERLANG" -> "erlang", "GO" -> "go",
    "MAVEN" -> "java", "NPM" -> "npm", "NUGET" -> "nuget",
    "PIP" -> "python", "PUB" -> "dart", "RUBYGEMS" -> "gem",
    "RUST" -> "rust", "SWIFT" -> "swift", "ACTIONS" -> "github-action")

  val pageSchema: StructType = StructType.fromDDL(
    "data STRUCT<securityAdvisories: STRUCT<" +
      "pageInfo: STRUCT<endCursor: STRING, hasNextPage: BOOLEAN>, " +
      "nodes: ARRAY<STRUCT<" +
      "ghsaId: STRING, classification: STRING, severity: STRING, " +
      "summary: STRING, publishedAt: STRING, updatedAt: STRING, " +
      "withdrawnAt: STRING, " +
      "identifiers: ARRAY<STRUCT<type: STRING, value: STRING>>, " +
      "references: ARRAY<STRUCT<url: STRING>>, " +
      "cvssSeverities: STRUCT<" +
      "cvssV3: STRUCT<score: DOUBLE, vectorString: STRING>, " +
      "cvssV4: STRUCT<score: DOUBLE, vectorString: STRING>>, " +
      "vulnerabilities: STRUCT<nodes: ARRAY<STRUCT<" +
      "package: STRUCT<ecosystem: STRING, name: STRING>, " +
      "vulnerableVersionRange: STRING, " +
      "firstPatchedVersion: STRUCT<identifier: STRING>>>>>>>>")

  private def severityWord(raw: Column): Column =
    when(raw === "LOW", "Low").when(raw === "MODERATE", "Medium")
      .when(raw === "HIGH", "High").when(raw === "CRITICAL", "Critical")
      .otherwise("Unknown")

  /** Trailing-'/' strip + empty→null, the reference's
    * `removesuffix("/")` on every vector before use. */
  private def cleanVector(v: Column): Column =
    nullif(regexp_replace(v, "/$", ""), lit(""))

  /** One row per (advisory, package): ecosystem-mapped (unmapped
    * dropped), CVE aliases collected (every identifier whose VALUE
    * doesn't start with "GHSA", `parser.py:779-788`), CVSS scored from
    * the v3 vector, range comma-stripped (`parser.py:730`). */
  def advisories(spark: SparkSession, path: String): DataFrame = {
    val ecoMap = map(ecosystemMap.toSeq
      .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    spark.read.option("multiLine", "true").schema(pageSchema).json(path)
      .select(explode(col("data.securityAdvisories.nodes")).as("a"))
      .select(
        col("a.ghsaId").as("ghsa_id"),
        coalesce(col("a.classification"), lit("GENERAL"))
          .as("classification"),
        // CVE aliases: value-prefix filter, NOT identifier type — the
        // reference keeps any non-GHSA identifier value
        transform(filter(col("a.identifiers"),
          i => !startswith(i.getField("value"), lit("GHSA"))),
          i => i.getField("value")).as("cves"),
        severityWord(col("a.severity")).as("severity"),
        col("a.summary").as("summary"),
        col("a.publishedAt").as("published"),
        col("a.updatedAt").as("updated"),
        col("a.withdrawnAt").as("withdrawn"),
        col("a.references").as("references"),
        cleanVector(col("a.cvssSeverities.cvssV3.vectorString"))
          .as("v3_vector"),
        Cvss.cvss3_score(
          cleanVector(col("a.cvssSeverities.cvssV3.vectorString")))
          .as("cvss"),
        Cvss.cvss4_validate(
          nullif(col("a.cvssSeverities.cvssV4.vectorString"), lit("")))
          .as("cvss_v4"),
        // the reference SETS cvss_severities (possibly []) whenever the
        // payload carried a cvssSeverities object and omits the key only
        // when it was absent (`parser.py:690-696`). Known edge: a
        // literal {} is falsy in the reference (key omitted) but
        // indistinguishable from {cvssV3: null, cvssV4: null} (truthy,
        // key set) after the typed parse — the GraphQL API always
        // returns the sub-keys, so only the latter occurs in practice.
        col("a.cvssSeverities").isNotNull.as("has_cvss_sev"),
        explode(col("a.vulnerabilities.nodes")).as("v"))
      .select(col("ghsa_id"), col("classification"), col("cves"),
        col("severity"), col("summary"), col("published"), col("updated"),
        col("withdrawn"), col("references"), col("v3_vector"),
        col("cvss"), col("cvss_v4"), col("has_cvss_sev"),
        element_at(ecoMap, col("v.package.ecosystem")).as("ecosystem"),
        col("v.package.name").as("pkg"),
        // the reference strips commas from the range before it lands in
        // the record (`parser.py:730` — ">= 1.2.0, < 1.4.3" →
        // ">= 1.2.0 < 1.4.3")
        regexp_replace(col("v.vulnerableVersionRange"), ",", "").as("range"),
        col("v.firstPatchedVersion.identifier").as("fixed_in"))
      .filter(col("ecosystem").isNotNull) // P7: unmapped dropped
  }

  /** Envelope assembly: one record per (advisory, ecosystem) with the
    * reference's Advisory payload (`__init__.py:76-99` — FixedIn
    * filtered to the ecosystem, namespace `github:<ecosystem>`,
    * identifier `github:<ecosystem>/<ghsa id, lowered>`). `fixdates` is
    * the optional fix-date dimension `(vuln, pkg, ecosystem, version,
    * date, kind)` — broadcast (curated metadata, never corpus-scale);
    * matched rows gain the `available: {date, kind}` record the
    * reference's fixdater attaches (`parser.py:740-751`); rows with no
    * published fix ("None"/"0"/null) never match, like
    * `fixdate/finder.py:149-151`. */
  def envelopes(rows: DataFrame,
      fixdates: Option[DataFrame] = None): DataFrame = {
    import graft.Envelope
    val withDates = graft.operators.FixDate.available(rows, fixdates,
      col("ghsa_id"), col("pkg"), col("fixed_in"),
      ecosystem = Some(col("ecosystem")))
    withDates
      .groupBy(col("ghsa_id"), col("ecosystem"), col("classification"),
        col("cves"), col("severity"), col("summary"), col("published"),
        col("updated"), col("withdrawn"), col("references"),
        col("v3_vector"), col("cvss"), col("cvss_v4"),
        col("has_cvss_sev"))
      .agg(array_sort(collect_list(struct(
        when(col("available_date").isNotNull, struct(
          col("available_date").as("date"),
          col("available_kind").as("kind"))).as("available"),
        col("ecosystem").as("ecosystem"),
        coalesce(col("fixed_in"), lit("None")).as("identifier"),
        col("pkg").as("name"),
        concat(lit("github:"), col("ecosystem")).as("namespace"),
        col("range").as("range")))).as("fixed_in_list"))
      .select(Envelope.assemble(
        concat(lit("github:"), col("ecosystem"), lit("/"),
          lower(col("ghsa_id"))),
        Envelope.GhsaSchema,
        struct(
          struct(
            col("cves").as("CVE"),
            // legacy v3 object (`parser.py:604-628`): absent when the
            // vector is missing or failed to score
            when(col("cvss").isNotNull, struct(
              struct(
                col("cvss.baseScore").as("base_score"),
                col("cvss.baseSeverity").as("base_severity"),
                col("cvss.exploitabilityScore").as("exploitability_score"),
                col("cvss.impactScore").as("impact_score"))
                .as("base_metrics"),
              lit("N/A").as("status"),
              col("v3_vector").as("vector_string"),
              col("cvss.version").as("version"))).as("CVSS"),
            col("classification").as("Classification"),
            col("fixed_in_list").as("FixedIn"),
            struct(col("cves").as("CVE")).as("Metadata"),
            col("severity").as("Severity"),
            col("summary").as("Summary"),
            // v3-then-v4 {vector, version} summaries
            // (`parser.py:667-688`): a vector that fails to parse is
            // dropped from the list (the v3 entry requires a scored
            // vector, not just a present one), and the key itself is
            // present — possibly as [] — whenever the payload carried a
            // cvssSeverities object
            when(col("has_cvss_sev"),
              filter(array(
                when(col("cvss").isNotNull, struct(
                  col("v3_vector").as("vector"),
                  col("cvss.version").as("version"))),
                when(col("cvss_v4").isNotNull, struct(
                  col("cvss_v4.vector").as("vector"),
                  col("cvss_v4.version").as("version")))),
                x => x.isNotNull)).as("cvss_severities"),
            col("ghsa_id").as("ghsaId"),
            concat(lit("github:"), col("ecosystem")).as("namespace"),
            col("published").as("published"),
            col("references").as("references"),
            col("updated").as("updated"),
            concat(lit("https://github.com/advisories/"), col("ghsa_id"))
              .as("url"),
            col("withdrawn").as("withdrawn")).as("Advisory"),
          map().cast("map<string,string>").as("Vulnerability"))): _*)
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
