package graft.providers

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.Envelope

/** CBL-Mariner / Azure Linux provider (vunnel
  * `providers/mariner/parser.py` — its own flat OVAL dialect, one
  * definition per (CVE, package) with range criteria):
  *
  *  - definitions without a severity and those marked
  *    `patchable = Not Applicable` are skipped (`parser.py:208-214`,
  *    IGNORED_PATCHABLE_VALUES)
  *  - each definition's criterion tests resolve to one package (the
  *    first test's object) and a set of EVR bounds; "less than" bounds
  *    print as `< v` AND become the fixed version, "greater than" as
  *    `> v`, "less than or equal" as `<= v`; the range string is the
  *    bounds sorted descending, comma-joined — `VulnerableRange`
  *    (`parser.py:125-163`); definitions with no usable bound or no
  *    package yield nothing
  *  - no "less than" bound → Version "None" (required by the schema)
  *  - fix availability: the advisory_date's date part as the accurate
  *    "advisory" candidate when fixed (`parser.py:164-185`); the
  *    first-observed fallback composes via
  *    [[graft.operators.FixDate.enrich]]
  *  - namespace = `mariner:<version>` from the per-version staged file
  *    (`parser.py:95-96`)
  */
object MarinerProvider {

  val defSchema: StructType = StructType.fromDDL(
    "_id STRING, " +
      "metadata STRUCT<title: STRING, description: STRING, " +
      "severity: STRING, patchable: STRING, advisory_date: STRING, " +
      "advisory_id: STRING, reference: STRUCT<_ref_id: STRING, " +
      "_ref_url: STRING, _source: STRING>>, " +
      "criteria STRUCT<_operator: STRING, " +
      "criterion ARRAY<STRUCT<_comment: STRING, _test_ref: STRING>>>")

  /** (test_id, pkg, evr value, evr op) — mariner states carry the
    * operation that drives the range rendering. Mariner's OVAL uses
    * `linux-def:`-prefixed element names (unlike SUSE/Oracle feeds),
    * so the rowTags and child fields carry the prefix verbatim. */
  def testCatalog(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.types._
    def f(n: String, t: DataType) = StructField(n, t)
    def s(fields: StructField*) = StructType(fields)
    val tests = spark.read.format("xml")
      .option("rowTag", "linux-def:rpminfo_test")
      .schema(s(f("_id", StringType),
        f("linux-def:object", s(f("_object_ref", StringType))),
        f("linux-def:state", s(f("_state_ref", StringType)))))
      .load(path)
      .select(col("_id").as("test_id"),
        col("`linux-def:object`._object_ref").as("object_ref"),
        col("`linux-def:state`._state_ref").as("state_ref"))
    val objs = spark.read.format("xml")
      .option("rowTag", "linux-def:rpminfo_object")
      .schema(s(f("_id", StringType), f("linux-def:name", StringType)))
      .load(path)
      .select(col("_id").as("obj_id"), col("`linux-def:name`").as("pkg"))
    val states = spark.read.format("xml")
      .option("rowTag", "linux-def:rpminfo_state")
      .schema(s(f("_id", StringType), f("linux-def:evr",
        s(f("_VALUE", StringType), f("_operation", StringType)))))
      .load(path)
      .select(col("_id").as("state_id"),
        col("`linux-def:evr`._VALUE").as("evr"),
        col("`linux-def:evr`._operation").as("op"))
    tests
      .join(objs, col("object_ref") === col("obj_id"))
      .join(states, col("state_ref") === col("state_id"))
      .select("test_id", "pkg", "evr", "op")
  }

  def envelopes(spark: SparkSession, path: String,
      marinerVersion: String): DataFrame = {
    val ns = s"mariner:$marinerVersion"
    val defs = spark.read.format("xml").option("rowTag", "definition")
      .schema(defSchema).load(path)
      .filter(col("metadata.severity").isNotNull &&
        coalesce(col("metadata.patchable"), lit("")) =!= "Not Applicable" &&
        col("metadata.reference._ref_id").isNotNull)
      .select(
        col("_id").as("def_id"),
        col("metadata.reference._ref_id").as("cve"),
        col("metadata.severity").as("severity"),
        coalesce(col("metadata.description"), lit("")).as("description"),
        coalesce(col("metadata.reference._ref_url"), lit("")).as("link"),
        substring(col("metadata.advisory_date"), 1, 10).as("advisory_date"),
        posexplode(col("criteria.criterion")).as(Seq("pos", "crit")))
      .select(col("def_id"), col("cve"), col("severity"),
        col("description"), col("link"),
        col("advisory_date"), col("pos"),
        col("crit._test_ref").as("test_id"))

    val resolved = defs
      .join(broadcast(testCatalog(spark, path)), Seq("test_id"))
      .filter(col("evr").isNotNull && col("pkg").isNotNull)

    val bound = when(col("op") === "less than", concat(lit("< "), col("evr")))
      .when(col("op") === "greater than", concat(lit("> "), col("evr")))
      .when(col("op") === "less than or equal",
        concat(lit("<= "), col("evr")))

    val perDef = resolved
      .withColumn("bound", bound)
      .filter(col("bound").isNotNull)
      // per-DEFINITION group (the reference yields one Vulnerability
      // per definition, parser.py:227): def_id keys the group — two
      // same-CVE definitions with identical metadata must NOT merge
      // their packages/bounds into one record (the metadata columns
      // ride along; def_id determines them)
      .groupBy(col("def_id"), col("cve"), col("severity"),
        col("description"), col("link"), col("advisory_date"))
      .agg(
        // the reference takes objects[0].name (`parser.py:133`)
        min_by(col("pkg"), col("pos")).as("pkg"),
        // descending bounds: "> lower" reads after "< upper" is sorted
        // away — `vulnerability_range.sort(reverse=True)` (parser.py:157)
        array_join(reverse(array_sort(collect_list(col("bound")))), ", ")
          .as("range"),
        // the reference's loop overwrites fixed_version per less-than
        // state in test order → the LAST less-than wins; non-less-than
        // rows rank below every criterion position (`parser.py:142-146`)
        max_by(when(col("op") === "less than", col("evr")),
          when(col("op") === "less than", col("pos")).otherwise(lit(-1)))
          .as("fixed"))

    val fixedVersion = coalesce(col("fixed"), lit("None"))
    val available = when(col("fixed").isNotNull &&
      col("advisory_date").isNotNull,
      struct(col("advisory_date").as("Date"), lit("advisory").as("Kind")))

    perDef.select(Envelope.assemble(
      concat(lit(s"$ns/"), lower(col("cve"))),
      Envelope.OsSchema,
      Envelope.osPayload(struct(
        Envelope.emptyCvss.as("CVSS"),
        col("description").as("Description"),
        array(struct(
          available.as("Available"),
          Envelope.defaultModule.as("Module"),
          col("pkg").as("Name"),
          lit(ns).as("NamespaceName"),
          Envelope.defaultVendorAdvisory.as("VendorAdvisory"),
          fixedVersion.as("Version"),
          lit("rpm").as("VersionFormat"),
          col("range").as("VulnerableRange"))).as("FixedIn"),
        col("link").as("Link"),
        Envelope.emptyMetadata.as("Metadata"),
        col("cve").as("Name"),
        lit(ns).as("NamespaceName"),
        col("severity").as("Severity")))): _*)
  }
}
