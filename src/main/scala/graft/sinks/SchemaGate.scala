package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Envelope

/** Output schema-validation gate, mirroring the reference's per-envelope
  * JSON-Schema check (`src/vunnel/schema.py:23-36`; required lists from
  * `schema/vulnerability/os/schema-1.1.0.json`): every envelope names
  * its payload schema, and a payload that does not satisfy the named
  * schema's structural requirements must not ship silently.
  *
  * The check is a pure Column predicate: `from_json` against the
  * family's typed shape (PERMISSIVE — a type-mismatched or missing
  * field parses to null) plus required-field/required-element
  * conditions, so validation is codegen'd row-local work with no extra
  * pass over the data. One deviation from the reference layout is
  * inherited from Envelope.scala: the payload IS the Vulnerability
  * object (no outer {"Vulnerability": ...} wrapper, Metadata not
  * carried), so the required list applies to the flattened object.
  */
object SchemaGate {

  // Typed shape of the OS-vulnerability payload: only the fields the
  // schema constrains. Extra payload fields are ignored by from_json
  // (additionalProperties are allowed, as in draft-04 by default).
  private val fixedInType = ArrayType(StructType(Seq(
    StructField("Name", StringType),
    StructField("NamespaceName", StringType),
    StructField("Version", StringType),
    StructField("VersionFormat", StringType))))

  private val cvssType = ArrayType(StructType(Seq(
    StructField("version", StringType),
    StructField("vector_string", StringType),
    StructField("status", StringType),
    StructField("base_metrics", StructType(Seq(
      StructField("base_score", DoubleType),
      StructField("base_severity", StringType),
      StructField("exploitability_score", DoubleType),
      StructField("impact_score", DoubleType)))))))

  private val osType = StructType(Seq(
    StructField("Name", StringType),
    StructField("NamespaceName", StringType),
    StructField("Description", StringType),
    StructField("Severity", StringType),
    StructField("Link", StringType),
    StructField("FixedIn", fixedInType),
    StructField("CVSS", cvssType)))

  /** OS-schema validity (required: Name, NamespaceName, Description,
    * Severity, Link; every FixedIn entry: Name, NamespaceName, Version,
    * VersionFormat; every CVSS entry: version, vector_string, status,
    * base_metrics with all four scores). */
  def osValid(item: Column): Column = {
    val p = from_json(item, osType)
    val fixedInOk = p.getField("FixedIn").isNull ||
      forall(p.getField("FixedIn"), f =>
        f.getField("Name").isNotNull &&
          f.getField("NamespaceName").isNotNull &&
          f.getField("Version").isNotNull &&
          f.getField("VersionFormat").isNotNull)
    val cvssOk = p.getField("CVSS").isNull ||
      forall(p.getField("CVSS"), c =>
        c.getField("version").isNotNull &&
          c.getField("vector_string").isNotNull &&
          c.getField("status").isNotNull &&
          c.getField("base_metrics").isNotNull &&
          c.getField("base_metrics").getField("base_score").isNotNull &&
          c.getField("base_metrics").getField("base_severity").isNotNull &&
          c.getField("base_metrics")
            .getField("exploitability_score").isNotNull &&
          c.getField("base_metrics").getField("impact_score").isNotNull)
    p.isNotNull &&
      p.getField("Name").isNotNull &&
      p.getField("NamespaceName").isNotNull &&
      p.getField("Description").isNotNull &&
      p.getField("Severity").isNotNull &&
      p.getField("Link").isNotNull &&
      fixedInOk && cvssOk
  }

  /** Registered structural validators by schema url. */
  val validators: Map[String, Column => Column] =
    Map(Envelope.OsSchema -> (osValid _))

  /** Per-row validity: a registered family gets its structural check;
    * an unregistered family only requires a parseable JSON object
    * (the reference likewise validates only known schemas). */
  def rowValid(schemaCol: Column, itemCol: Column): Column = {
    val fallback = itemCol.isNotNull &&
      from_json(itemCol, MapType(StringType, StringType)).isNotNull
    validators.foldLeft(when(lit(false), lit(false))) {
      case (acc, (url, v)) => acc.when(schemaCol === url, v(itemCol))
    }.otherwise(fallback)
  }

  /** Split envelopes into (valid, quarantined) — the §7.4.7 pattern:
    * malformed records are routed aside, never shipped and never a job
    * failure. */
  def validate(df: DataFrame): (DataFrame, DataFrame) = {
    val marked = df.withColumn("__ok", rowValid(col("schema"), col("item")))
      .cache()
    (marked.filter(col("__ok")).drop("__ok"),
      marked.filter(!col("__ok")).drop("__ok"))
  }
}
