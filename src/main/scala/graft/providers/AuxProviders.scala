package graft.providers

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.Envelope
import graft.sources.Sources

/** The auxiliary decorator providers (reference kev/epss/eol — tagged
  * "auxiliary" in the registry): passthrough envelope emitters whose
  * records ANNOTATE vulnerability rows rather than describe new ones.
  * The decoration joins themselves live in
  * [[graft.operators.Decorators]]; this object is the result-store
  * surface — one envelope per upstream record, same canonical-JSON
  * contract as every other provider family.
  *
  * Scale: all three datasets are dimension-sized (KEV ≈ 1k, EPSS ≈
  * 250k, EOL ≈ 10k cycles) — single-stage scans, no shuffle; the
  * explodes are map-side.
  */
object AuxProviders {

  /** KEV catalog passthrough (`providers/kev/manager.py:38-41`,
    * `__init__.py:58-62`): one envelope per `vulnerabilities[]` record,
    * the record verbatim as payload, identifier `kev:{cveID,lower}`. */
  def kevEnvelopes(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "true").json(path)
      .select(explode(col("vulnerabilities")).as("v"))
      .select(Envelope.assemble(
        concat(lit("kev:"), lower(col("v.cveID"))),
        Envelope.KevSchema,
        col("v")): _*)

  /** EPSS score passthrough (`providers/epss/manager.py:64-98`,
    * `__init__.py:81-86`): the typed CSV scan (S9) keyed by lowercased
    * CVE; payload = {cve, epss, percentile, date} where date is the
    * day part of the comment header's score_date. */
  def epssEnvelopes(spark: SparkSession, path: String): DataFrame =
    Sources.epss(spark, path)
      .select(Envelope.assemble(
        lower(col("cve")),
        Envelope.EpssSchema,
        struct(
          col("cve"),
          substring_index(col("score_date"), "T", 1).as("date"),
          col("epss"),
          col("percentile"))): _*)

  /** The `{product}:{cycle}` namespace key shared by the envelope
    * identifiers and the [[graft.operators.Decorators.withEol]] join. */
  def eolNamespace(product: Column, cycle: Column): Column =
    lower(concat(product, lit(":"), cycle))

  /** EOL cycles scan (`providers/eol/manager.py:32-55`): one row per
    * (product, release cycle), the release struct kept whole in `rel`
    * plus the product name and product-level identifiers. */
  def eolCycles(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "true").json(path)
      .select(explode(col("result")).as("prod"))
      .select(
        col("prod.name").as("product"),
        col("prod.identifiers").as("identifiers"),
        explode(col("prod.releases")).as("rel"))

  /** EOL passthrough envelopes (`providers/eol/__init__.py:54-62`):
    * identifier `{product}:{cycle}` lowercased; payload = the release
    * record with `product` and `identifiers` merged in — exactly the
    * reference's cycle_data dict. Fields a product's releases don't
    * carry (e.g. isEoas) are nulls from the schema union and drop out
    * of the canonical JSON, matching the reference's absent keys. */
  def eolEnvelopes(spark: SparkSession, path: String): DataFrame = {
    val cycles = eolCycles(spark, path)
    val relFields = cycles.schema("rel").dataType
      .asInstanceOf[StructType].fieldNames.toSeq
    val payload: Seq[(String, Column)] =
      (relFields.map(f => f -> col(s"rel.`$f`")) ++
        Seq("product" -> col("product"),
          "identifiers" -> col("identifiers"))).sortBy(_._1)
    cycles.select(Envelope.assemble(
      eolNamespace(col("product"), col("rel.name")),
      Envelope.EolSchema,
      struct(payload.map { case (n, c) => c.as(n) }: _*)): _*)
  }
}
