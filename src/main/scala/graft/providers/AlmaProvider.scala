package graft.providers

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.Envelope

/** AlmaLinux provider (vunnel `providers/alma/parser.py` — OSV
  * pass-through records from the osv-database git checkout, with three
  * in-place enrichments the reference applies before emit):
  *
  *  1. **rpm modularity from the summary** (`parser.py:138-166`): the
  *     token between the first and second space of
  *     "Moderate: mariadb:10.3 security update" — valid only when it
  *     carries an interior ":" — lands on every affected entry as
  *     `ecosystem_specific.rpm_modularity`.
  *  2. **known library-gap patching** (`parser.py:16-25,68-101`): for a
  *     static list of ALSAs whose advisories omit a library package,
  *     the base package's affected entry is cloned under the library
  *     name (purl untouched, exactly like the reference's dict copy)
  *     unless an entry with that name already exists.
  *  3. **advisory record-type stamp** (`parser.py:129-134`):
  *     `database_specific.anchore.record_type = "advisory"`.
  *
  * The reference mutates parsed JSON in place; here each record is one
  * typed row and the patches are pure column transforms — no driver
  * loop, the whole git-checkout corpus patches in one distributed
  * projection. Identifier = `almalinux<v>/<id>` with the version taken
  * from the checkout's per-release directory (`parser.py:56-66,136`).
  */
object AlmaProvider {

  /** `_known_library_gaps_` (`parser.py:16-25`). */
  val libraryGaps: Seq[(String, String, String)] = Seq(
    ("ALSA-2019:3706", "lua", "lua-libs"),
    ("ALSA-2020:5487", "pacemaker", "pacemaker-libs"),
    ("ALSA-2021:4386", "gcc", "libgcc"),
    ("ALSA-2021:4393", "cups", "cups-libs"),
    ("ALSA-2021:4489", "rpm-build", "rpm-build-libs"),
    ("ALSA-2021:4587", "gcc", "libgcc"),
    ("ALSA-2022:0368", "rpm-build", "rpm-build-libs"),
    ("ALSA-2022:7928", "device-mapper-multipath",
      "device-mapper-multipath-libs"))

  val almaSchema: StructType = StructType.fromDDL(
    "id STRING, schema_version STRING, summary STRING, published STRING, " +
      "modified STRING, related ARRAY<STRING>, " +
      "severity ARRAY<STRUCT<type: STRING, score: STRING>>, " +
      "references ARRAY<STRUCT<type: STRING, url: STRING>>, " +
      "affected ARRAY<STRUCT<" +
      "package: STRUCT<ecosystem: STRING, name: STRING, purl: STRING>, " +
      "ranges: ARRAY<STRUCT<type: STRING, " +
      "events: ARRAY<STRUCT<introduced: STRING, fixed: STRING>>>>, " +
      "ecosystem_specific: STRUCT<rpm_modularity: STRING>>>, " +
      "database_specific STRUCT<anchore: STRUCT<record_type: STRING>>")

  /** Records from the staged osv-database checkout; the release version
    * comes from the `advisories/almalinux<v>/` path segment. */
  def records(spark: SparkSession, glob: String): DataFrame =
    spark.read.option("multiLine", "true").schema(almaSchema).json(glob)
      .withColumn("version",
        regexp_extract(input_file_name(), "almalinux(\\d+)/", 1))
      .filter(col("version") =!= "" && coalesce(col("id"), lit("")) =!= "")

  /** The summary-token modularity rule: token between the first and
    * second space, valid only with an interior colon. */
  def modularityFromSummary(summary: Column): Column = {
    val token = regexp_extract(coalesce(summary, lit("")),
      "^[^ ]+ ([^ ]+) ", 1)
    when(token.contains(":") && !token.startsWith(":") &&
      !token.endsWith(":"), token).otherwise(lit(null).cast("string"))
  }

  private def affectedStruct(a: Column, name: Column,
      modularity: Column): Column = struct(
    struct(coalesce(modularity,
      a.getField("ecosystem_specific").getField("rpm_modularity"))
      .as("rpm_modularity")).as("ecosystem_specific"),
    struct(
      a.getField("package").getField("ecosystem").as("ecosystem"),
      name.as("name"),
      // the reference's dict copy renames only `name` — purl stays the
      // base package's (`parser.py:95-97`)
      a.getField("package").getField("purl").as("purl")).as("package"),
    a.getField("ranges").as("ranges"))

  /** Patched pass-through envelopes. */
  def envelopes(records: DataFrame): DataFrame = {
    val modularity = modularityFromSummary(col("summary"))
    val base = transform(
      coalesce(col("affected"), array().cast(almaSchema("affected").dataType)),
      a => affectedStruct(a, a.getField("package").getField("name"),
        modularity))

    // library-gap clones: at most one gap rule matches per record (the
    // map is keyed by ALSA id), guarded by presence of the base package
    // and absence of the library package
    val clones = libraryGaps.map { case (alsa, baseName, libName) =>
      when(col("id") === alsa &&
        exists(base, p => p.getField("package").getField("name") === baseName) &&
        !exists(base, p => p.getField("package").getField("name") === libName),
        transform(
          filter(base, p => p.getField("package").getField("name") === baseName),
          p => affectedStruct(p, lit(libName), modularity)))
        .otherwise(slice(base, 1, 0)) // empty array of the patched type
    }
    val patched = concat(base +: clones: _*)

    records.select(Envelope.assemble(
      concat(lit("almalinux"), col("version"), lit("/"), col("id")),
      // like the passthrough families, the envelope is labeled with
      // the record's OWN schema_version (alma `__init__.py:66`
      // compatible_schema(vuln_schema_version); default "1.7.0",
      // parser.py:110) — a fixed 1.6.1 label next to a 1.7.0 payload
      // was internally inconsistent
      Envelope.osvSchemaCol(
        coalesce(col("schema_version"), lit("1.7.0"))),
      struct(
        patched.as("affected"),
        struct(struct(lit("advisory").as("record_type")).as("anchore"))
          .as("database_specific"),
        col("id").as("id"),
        col("modified").as("modified"),
        col("published").as("published"),
        col("references").as("references"),
        col("related").as("related"),
        // payload schema_version passes through UNTOUCHED — the
        // "1.7.0" default above parameterizes only the envelope label;
        // _normalize never injects the key into the record (a null
        // here is dropped by canonicalJson, matching a record that
        // never carried it)
        col("schema_version").as("schema_version"),
        col("severity").as("severity"),
        col("summary").as("summary"))): _*)
  }

  /** Full pipeline from a staged checkout glob over the per-release
    * advisory directories. */
  def envelopes(spark: SparkSession, glob: String): DataFrame =
    envelopes(records(spark, glob))
}
