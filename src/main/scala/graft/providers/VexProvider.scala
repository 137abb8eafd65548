package graft.providers

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.Envelope

/** VEX pass-through families:
  *
  *  - CSAF-VEX (hummingbird, vunnel `providers/hummingbird/`): one row
  *    per (cve, product_id, status) from `vulnerabilities[].
  *    product_status` — the four status buckets flattened.
  *  - OpenVEX (chainguard_libraries): `statements[]` flattened to
  *    (vuln, product, status).
  *
  * Both are annotation dimensions: downstream they broadcast-join onto
  * vulnerability rows (the ubuntu VEX wont-fix overlay J5 is exactly a
  * left-semi against the `known_not_affected`/`not_affected` slice).
  */
object VexProvider {

  val csafSchema: StructType = StructType.fromDDL(
    "document STRUCT<title: STRING, tracking: STRUCT<id: STRING>>, " +
      "vulnerabilities ARRAY<STRUCT<cve: STRING, " +
      "product_status: STRUCT<fixed: ARRAY<STRING>, " +
      "known_affected: ARRAY<STRING>, known_not_affected: ARRAY<STRING>, " +
      "under_investigation: ARRAY<STRING>>>>")

  /** CSAF product-status rows: (doc_id, cve, product_id, status). */
  def csafStatusRows(spark: SparkSession, path: String): DataFrame = {
    val doc = spark.read.option("multiLine", "true").schema(csafSchema)
      .json(path)
    val base = doc.select(col("document.tracking.id").as("doc_id"),
      explode(col("vulnerabilities")).as("v"))
    def slice(status: String, field: String) = base.select(
      col("doc_id"), col("v.cve").as("cve"),
      explode(coalesce(col(s"v.product_status.$field"),
        array().cast("array<string>"))).as("product_id"),
      lit(status).as("status"))
    slice("fixed", "fixed")
      .unionByName(slice("known_affected", "known_affected"))
      .unionByName(slice("known_not_affected", "known_not_affected"))
      .unionByName(slice("under_investigation", "under_investigation"))
  }

  val openVexSchema: StructType = StructType.fromDDL(
    "`@id` STRING, statements ARRAY<STRUCT<" +
      "vulnerability: STRUCT<name: STRING>, " +
      "products: ARRAY<STRUCT<`@id`: STRING>>, status: STRING>>")

  /** OpenVEX statement rows: (doc_id, vuln, product, status). */
  def openVexRows(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "true").schema(openVexSchema).json(path)
      .select(col("`@id`").as("doc_id"), explode(col("statements")).as("s"))
      .select(col("doc_id"), col("s.vulnerability.name").as("vuln"),
        explode(col("s.products")).as("p"), col("s.status").as("status"))
      .select(col("doc_id"), col("vuln"), col("p.`@id`").as("product"),
        col("status"))

  /** J5: the wont-fix overlay — stamp rows whose (cve, product) appears
    * in the VEX not-affected/wont-fix slice (ubuntu
    * `parser.py:203-234`). */
  /** Hummingbird passthrough envelopes (S13): one per (document, CVE)
    * with the WHOLE CSAF-VEX document as payload — the reference
    * writes `(namespace/cve_id, CSAFVEXSchema, csaf_doc)` verbatim
    * (`providers/hummingbird/__init__.py:64-70`). */
  def envelopes(spark: SparkSession, path: String,
      namespace: String = "hummingbird"): DataFrame =
    spark.read.option("multiLine", "true").json(path)
      .select(struct(col("*")).as("doc"))
      .select(col("doc"), explode(col("doc.vulnerabilities.cve")).as("cve"))
      .select(graft.Envelope.assemble(
        concat(lit(namespace), lit("/"), lower(col("cve"))),
        graft.Envelope.VexSchema, col("doc")): _*)

  val annotatedOpenVexSchema: StructType = StructType.fromDDL(
    "`@context` STRING, `@id` STRING, statements ARRAY<STRUCT<" +
      "vulnerability: STRUCT<`@id`: STRING, aliases: ARRAY<STRING>, " +
      "name: STRING>, " +
      "timestamp: STRING, last_updated: STRING, status: STRING, " +
      "products: ARRAY<STRUCT<`@id`: STRING, " +
      "identifiers: STRUCT<purl: STRING>>>>>")

  /** chainguard_libraries annotated-openvex envelopes
    * (`providers/chainguard_libraries/openvex_parser.py:140-235`,
    * `__init__.py:70-82`): statements filtered to chainguard artifacts
    * — pypi purls whose version carries `+cgr.`, maven purls carrying
    * `.cgr.` — then wrapped as `{document, fixes}` where each kept
    * product gains an `available {date, kind: advisory}` from the
    * statement timestamp. One deviation, deliberate: the reference
    * RAISES on a non-`fixed` status (`openvex_parser.py:180-186`);
    * a distributed scan drops such statements instead — quarantine,
    * not abort. All product filtering/annotation runs through
    * higher-order array functions (filter/transform), no UDF.
    * An external fix-date index can overlay the advisory dates
    * downstream via [[graft.operators.FixDate]]. */
  def libraryEnvelopes(spark: SparkSession, path: String,
      ecosystem: String): DataFrame = {
    // reference _get_purl: identifiers.purl, falling back to @id
    def purlOf(p: Column) = coalesce(p.getField("identifiers")
      .getField("purl"), p.getField("@id"))
    def chainguardArtifact(p: Column) = {
      val purl = purlOf(p)
      val ptype = regexp_extract(purl, "^pkg:([^/]+)/", 1)
      val version = regexp_extract(purl, "@([^?#]+)", 1)
      (version =!= "") && (
        (ptype === "pypi" && version.contains("+cgr.")) ||
        (ptype === "maven" && version.contains(".cgr.")))
    }
    spark.read.option("multiLine", "true").schema(annotatedOpenVexSchema)
      .json(path)
      .select(explode(col("statements")).as("s"))
      .filter(col("s.vulnerability.name").isNotNull &&
        (col("s.status").isNull || lower(col("s.status")) === "fixed"))
      .select(col("s"),
        // a statement WITHOUT a products array still emits — the
        // reference assigns statement["products"] = [] and wraps it
        // (openvex_parser.py:247-257), so null must become [] here or
        // canonicalJson drops the products/fixes keys entirely
        filter(coalesce(col("s.products"), array().cast(
          "array<struct<`@id`:string,identifiers:struct<purl:string>>>")),
          chainguardArtifact _).as("kept"),
        graft.functions.Norm.fuzzy_to_date(col("s.timestamp")).as("fix_date"))
      .select(Envelope.assemble(
        concat(lit("chainguard-libraries:"),
          lit(ecosystem.toLowerCase(java.util.Locale.ROOT)),
          lit("/"), col("s.vulnerability.name")),
        Envelope.AnnotatedOpenVexSchema,
        // struct fields in sorted order — the canonicalJson contract
        struct(
          struct(
            // the reference wraps the WHOLE statement as `document`
            // (`openvex_parser.py:256` mutates in place) — the upstream
            // feed's last_updated and the vulnerability's @id/aliases
            // ride through; absent keys drop via canonical JSON
            col("s.last_updated").as("last_updated"),
            col("kept").as("products"),
            col("s.status").as("status"),
            col("s.timestamp").as("timestamp"),
            col("s.vulnerability").as("vulnerability")).as("document"),
          when(col("fix_date").isNotNull,
            transform(col("kept"), p => struct(
              struct(
                date_format(col("fix_date"), "yyyy-MM-dd").as("date"),
                lit("advisory").as("kind")).as("available"),
              purlOf(p).as("product"))))
            .otherwise(array().cast(
              "array<struct<available:struct<date:string,kind:string>," +
                "product:string>>"))
            .as("fixes"))): _*)
  }

  def stampWontFix(rows: DataFrame, vexStatus: DataFrame,
      cveCol: String = "cve", productCol: String = "product"): DataFrame = {
    val marks = broadcast(vexStatus
      .filter(col("status").isin("known_not_affected", "not_affected",
        "wont-fix"))
      .select(col(cveCol), col(productCol)).distinct()
      .withColumn("wont_fix", lit(true)))
    rows.join(marks, Seq(cveCol, productCol), "left")
      .withColumn("wont_fix", coalesce(col("wont_fix"), lit(false)))
  }
}
