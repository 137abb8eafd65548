package graft.providers

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Envelope
import graft.sources.Sources

/** OVAL family provider (sles/oracle/mariner share the shape): the S6
  * 4-element scan joined J8-style into OS-schema envelopes (vunnel
  * `providers/sles/parser.py:131-170,301-341`, severity map
  * `utils/oval_v2.py:54`).
  *
  * Scale: definitions/tests/objects/states are all dimension-sized
  * relative to a full corpus — tests/objects/states broadcast; the only
  * shuffle is the final per-CVE group.
  */
object OvalProvider {

  /** OVAL severity words → canonical (Important→High, Moderate→Medium). */
  private def ovalSeverity(raw: org.apache.spark.sql.Column) =
    when(lower(raw) === "critical", "Critical")
      .when(lower(raw) === "important", "High")
      .when(lower(raw) === "moderate", "Medium")
      .when(lower(raw) === "low", "Low")
      .otherwise("Unknown")

  /** J8: definition → test → (object, state) chained equi-joins.
    * One row per (cve, pkg) with the fix EVR and comparison operator. */
  def resolvedRows(spark: SparkSession, path: String): DataFrame = {
    val defs = Sources.ovalDefinitions(spark, path)
      .select(col("metadata.reference._ref_id").as("cve"),
        ovalSeverity(col("metadata.severity")).as("severity"),
        col("criteria.criterion._test_ref").as("test_ref"))
    val tests = Sources.ovalTests(spark, path)
      .select(col("_id").as("test_id"),
        col("object._object_ref").as("object_ref"),
        col("state._state_ref").as("state_ref"))
    val objs = Sources.ovalObjects(spark, path)
      .select(col("_id").as("obj_id"), col("name").as("pkg"))
    val states = Sources.ovalStates(spark, path)
      .select(col("_id").as("state_id"), col("evr._VALUE").as("evr"),
        col("evr._operation").as("op"))
    defs
      .join(broadcast(tests), col("test_ref") === col("test_id"))
      .join(broadcast(objs), col("object_ref") === col("obj_id"))
      .join(broadcast(states), col("state_ref") === col("state_id"))
      .select("cve", "severity", "pkg", "evr", "op")
  }

  /** Envelopes per cve: "less than EVR" criteria become FixedIn entries
    * (the fix is the excluded bound); other operations yield unfixed
    * rows. A7-style FixedIn concat with canonical ordering.
    *
    * `dropKsplice` is oracle's false-positive guard
    * (`providers/oracle/parser.py:145-201`): FixedIn entries whose rpm
    * RELEASE matches `.*ksplice.*` are dropped while the parent record
    * stays — possibly with an empty FixedIn list, which is what lets
    * downstream syncs retract earlier matches. */
  def envelopes(rows: DataFrame, namespace: String,
      dropKsplice: Boolean = false): DataFrame = {
    val fixedInStruct = struct(
      col("pkg").as("Name"),
      lit(namespace).as("NamespaceName"),
      lit("rpm").as("VersionFormat"),
      when(col("op") === "less than", col("evr")).otherwise("None")
        .as("Version"))
    val kspliceHit = coalesce(
      graft.functions.RpmVersion.rpm_release(col("evr")), lit(""))
      .rlike("ksplice")
    rows
      .groupBy(col("cve"))
      .agg(
        max_by(col("severity"),
          graft.functions.Norm.severity_rank(col("severity"))).as("severity"),
        array_sort(collect_list(
          if (dropKsplice) when(!kspliceHit, fixedInStruct)
          else fixedInStruct)).as("fixed_in"))
      .select(Envelope.assemble(
        concat(lit(namespace), lit("/"), lower(col("cve"))),
        Envelope.OsSchema,
        struct(
          col("cve").as("Name"),
          lit(namespace).as("NamespaceName"),
          lit("").as("Description"),
          col("severity").as("Severity"),
          graft.functions.Norm.ref_link_for_id(col("cve")).as("Link"),
          col("fixed_in").as("FixedIn"))): _*)
  }
}
