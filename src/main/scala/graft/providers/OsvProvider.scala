package graft.providers

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Envelope

/** OSV family (ubuntu/rocky/alma/bitnami/govulndb shape): pass-through
  * records with fix-date enrichment (F19, `utils/osv.py:9-108`) and the
  * OSV→OS downconvert (F20, `providers/ubuntu/os_downconvert.py:61-266`).
  *
  * The reference mutates nested JSON in place (walk affected[].ranges[]
  * .events[], attach database_specific.anchore.fixes). Spark-first, the
  * same output is produced relationally: explode to affected-level rows,
  * broadcast-join the fix-date dimension (J1), and re-assemble structs at
  * emit — no nested surgery, one narrow explode + one broadcast join +
  * one group-merge shuffle regardless of corpus size.
  */
object OsvProvider {

  val osvSchema: StructType = StructType.fromDDL(
    "id STRING, published STRING, withdrawn STRING, " +
      "upstream ARRAY<STRING>, " +
      "severity ARRAY<STRUCT<type: STRING, score: STRING>>, " +
      "affected ARRAY<STRUCT<" +
      "package: STRUCT<name: STRING, ecosystem: STRING>, " +
      "ranges: ARRAY<STRUCT<type: STRING, " +
      "events: ARRAY<STRUCT<introduced: STRING, fixed: STRING>>>>, " +
      "database_specific: STRUCT<anchore: STRUCT<status: STRING>>>>")

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "true").schema(osvSchema).json(path)

  /** OSV ecosystem → `ubuntu:X.YY[+esm]` namespace (os_downconvert.py:
    * 61-85): base releases map, plain Pro maps to +esm, FIPS/Realtime/
    * BlueField variants yield null. */
  def ecosystemToNamespace(eco: Column, includeEsm: Boolean = true): Column = {
    val base = regexp_extract(eco, "^Ubuntu:([0-9]+\\.[0-9]+)(?::LTS)?$", 1)
    val pro = regexp_extract(eco, "^Ubuntu:Pro:([0-9]+\\.[0-9]+)(?::LTS)?$", 1)
    when(base =!= "", concat(lit("ubuntu:"), base))
      .when(lit(includeEsm) && pro =!= "", concat(lit("ubuntu:"), pro, lit("+esm")))
      .otherwise(lit(null).cast("string"))
  }

  /** Ubuntu priority → Severity word (os_downconvert.py:88-110):
    * severity[type=Ubuntu].score capitalized; untriaged/unknown → Unknown. */
  def severityFromOsv(severityArr: Column): Column = {
    // try_element_at: ANSI mode makes element_at throw on an empty array
    val ubuntuScore = try_element_at(
      filter(severityArr, s => s.getField("type") === "Ubuntu"), lit(1))
      .getField("score")
    val cap = concat(upper(substring(trim(ubuntuScore), 1, 1)),
      lower(substring(trim(ubuntuScore), 2, 100)))
    when(cap.isin("Negligible", "Low", "Medium", "High", "Critical"), cap)
      .otherwise(lit("Unknown"))
  }

  /** One row per affected[] entry: (cve, namespace, severity, pkg,
    * fixed_versions[], wont_fix). Withdrawn records and records without
    * an upstream CVE are dropped (os_downconvert.py:215-223). */
  def affectedRows(osv: DataFrame, includeEsm: Boolean = true): DataFrame = {
    osv
      .filter(col("withdrawn").isNull)
      .filter(size(coalesce(col("upstream"), array())) > 0)
      .select(
        element_at(col("upstream"), 1).as("cve"),
        severityFromOsv(coalesce(col("severity"),
          array().cast("array<struct<type:string,score:string>>"))).as("severity"),
        col("published"),
        explode(col("affected")).as("aff"))
      .filter(col("aff.package.name").isNotNull)
      .select(
        col("cve"), col("severity"), col("published"),
        col("aff.package.name").as("pkg"),
        ecosystemToNamespace(col("aff.package.ecosystem"), includeEsm)
          .as("namespace"),
        // all `fixed` events across ranges (os_downconvert.py:118-131)
        filter(
          flatten(transform(coalesce(col("aff.ranges"),
            array().cast("array<struct<type:string,events:array<struct<introduced:string,fixed:string>>>>")),
            r => transform(r.getField("events"), e => e.getField("fixed")))),
          v => v.isNotNull).as("fixed_versions"),
        (col("aff.database_specific.anchore.status") === "wont-fix")
          .as("wont_fix"))
      .filter(col("namespace").isNotNull)
  }

  /** F19+F20: FixedIn rows with fix-date enrichment. `fixdates` is the
    * broadcast dimension (vuln_id, pkg, fix_version, date, kind);
    * missing dates fall back to the advisory published date, marked
    * kind='advisory' (osv.py:78-90's inaccurate-candidate rule). */
  def fixedInRows(affected: DataFrame, fixdates: DataFrame): DataFrame = {
    val released = affected.filter(size(col("fixed_versions")) > 0)
      .select(col("cve"), col("namespace"), col("severity"), col("pkg"),
        col("published"), explode(col("fixed_versions")).as("version"))
      .join(broadcast(fixdates),
        Seq("cve", "pkg", "version"), "left")
      .select(col("cve"), col("namespace"), col("severity"), col("pkg"),
        col("version"), lit(false).as("no_advisory"),
        coalesce(col("date"), substring(col("published"), 1, 10)).as("available_date"),
        coalesce(col("kind"), lit("advisory")).as("available_kind"))
    // wont-fix / no-fix rows: Version "None"; +esm channels emit nothing
    // unfixed (the base record already discloses it)
    val unfixed = affected.filter(size(col("fixed_versions")) === 0)
      .filter(!col("namespace").endsWith("+esm"))
      .select(col("cve"), col("namespace"), col("severity"), col("pkg"),
        lit("None").as("version"), col("wont_fix").as("no_advisory"),
        lit(null).cast("string").as("available_date"),
        lit(null).cast("string").as("available_kind"))
    released.unionByName(unfixed)
  }

  /** J7: ubuntu Pro→base inference (`providers/ubuntu/parser.py:95-158,
    * 427-521`): a (cve, pkg) fixed ONLY on the Pro (+esm) channel implies
    * the base release won't see a fix → synthesize a base wont-fix row.
    * Anti-join of Pro rows vs base rows on (cve, base-namespace, pkg),
    * mapped to synthetic unfixed rows, unioned back. */
  def proToBaseInference(affected: DataFrame): DataFrame = {
    val pro = affected.filter(col("namespace").endsWith("+esm"))
      .withColumn("base_ns",
        regexp_replace(col("namespace"), "\\+esm$", ""))
    val base = affected.filter(!col("namespace").endsWith("+esm"))
    val missing = pro.join(base
        .select(col("cve").as("b_cve"), col("namespace").as("b_ns"),
          col("pkg").as("b_pkg")),
        col("cve") === col("b_cve") && col("base_ns") === col("b_ns") &&
          col("pkg") === col("b_pkg"),
        "left_anti")
    val synthesized = missing.select(
      col("cve"), col("severity"), col("published"), col("pkg"),
      col("base_ns").as("namespace"),
      array().cast("array<string>").as("fixed_versions"),
      lit(true).as("wont_fix"))
    affected.unionByName(synthesized)
  }

  /** Group per (namespace, cve) into OS-schema envelopes. */
  def envelopes(fixedIn: DataFrame): DataFrame = {
    fixedIn
      .groupBy(col("namespace"), col("cve"))
      .agg(
        first(col("severity")).as("severity"),
        array_sort(collect_list(struct(
          col("pkg").as("Name"),
          col("namespace").as("NamespaceName"),
          lit("dpkg").as("VersionFormat"),
          col("version").as("Version"),
          struct(col("no_advisory").as("NoAdvisory")).as("VendorAdvisory"),
          when(col("available_date").isNotNull,
            struct(col("available_date").as("Date"),
              col("available_kind").as("Kind"))).as("Available"))))
          .as("fixed_in"))
      .filter(size(col("fixed_in")) > 0)
      .select(Envelope.assemble(
        concat(col("namespace"), lit("/"), lower(col("cve"))),
        Envelope.OsSchema,
        struct(
          col("cve").as("Name"),
          col("namespace").as("NamespaceName"),
          lit("").as("Description"),
          col("severity").as("Severity"),
          concat(lit("https://ubuntu.com/security/"), col("cve")).as("Link"),
          col("fixed_in").as("FixedIn"))): _*)
  }
}
