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

  private val critDDL = "ARRAY<STRUCT<_test_ref: STRING>>"

  /** Explicit definition schema — criterion is ALWAYS an array and the
    * criteria tree is walked three levels deep (the depth real
    * oracle/SLES feeds use; [[SlesProvider.defSchema]] models the same
    * shape). Schema inference over a feed where some definition has
    * two criterion children (package test + ksplice variant) or a
    * nested criteria block would flip the inferred type per corpus and
    * break the join; an explicit schema reads every shape the same
    * way, and a 1-element XML sequence still parses as a 1-element
    * array. References are likewise an array: real metadata carries
    * CVE + advisory references together. */
  val defSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType.fromDDL(
      "metadata STRUCT<severity: STRING, " +
        "reference: ARRAY<STRUCT<_ref_id: STRING, _source: STRING>>>, " +
      "criteria STRUCT<" +
        s"criterion $critDDL, " +
        "criteria ARRAY<STRUCT<" +
        s"criterion $critDDL, " +
        s"criteria ARRAY<STRUCT<criterion $critDDL>>>>>")

  /** J8: definition → test → (object, state) chained equi-joins.
    * One row per (cve, pkg) with the fix EVR and comparison operator. */
  def resolvedRows(spark: SparkSession, path: String): DataFrame = {
    // prefer the CVE-sourced reference, fall back to the first (defs
    // 1-3 in the committed fixture carry a single unsourced ref)
    val refs = col("metadata.reference")
    val cveRefs = filter(refs, r =>
      upper(coalesce(r.getField("_source"), lit(""))) === "CVE")
    // try_element_at: ANSI mode makes plain element_at THROW on an
    // empty array (a def with no CVE-sourced reference)
    val cve = coalesce(
      try_element_at(cveRefs, lit(1)).getField("_ref_id"),
      try_element_at(refs, lit(1)).getField("_ref_id"))
    // every criterion at any depth contributes a test_ref row. Each
    // level coalesces per-BLOCK (transform + coalesce inside the
    // flatten): a bare flatten over blocks where one nested-only block
    // has a null criterion array would null the whole level and drop
    // its non-null siblings.
    val emptyRefs = array().cast("array<string>")
    val l1 = coalesce(col("criteria.criterion._test_ref"), emptyRefs)
    val l2blocks = coalesce(col("criteria.criteria"), array().cast(
      "array<struct<criterion: array<struct<_test_ref: string>>, " +
        "criteria: array<struct<criterion: " +
        "array<struct<_test_ref: string>>>>>>"))
    val l2 = flatten(transform(l2blocks, b =>
      coalesce(b.getField("criterion"),
        array().cast("array<struct<_test_ref: string>>"))))
      .getField("_test_ref")
    val l3blocks = flatten(transform(l2blocks, b =>
      coalesce(b.getField("criteria"), array().cast(
        "array<struct<criterion: array<struct<_test_ref: string>>>>"))))
    val l3 = flatten(transform(l3blocks, b =>
      coalesce(b.getField("criterion"),
        array().cast("array<struct<_test_ref: string>>"))))
      .getField("_test_ref")
    val defs = Sources.ovalDefinitions(spark, path, Some(defSchema))
      .select(cve.as("cve"),
        ovalSeverity(col("metadata.severity")).as("severity"),
        explode(concat(l1, l2, l3)).as("test_ref"))
      .filter(col("test_ref").isNotNull)
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
        Envelope.osPayload(struct(
          col("cve").as("Name"),
          lit(namespace).as("NamespaceName"),
          lit("").as("Description"),
          col("severity").as("Severity"),
          graft.functions.Norm.ref_link_for_id(col("cve")).as("Link"),
          Envelope.emptyCvss.as("CVSS"),
          col("fixed_in").as("FixedIn"),
          Envelope.emptyMetadata.as("Metadata")))): _*)
  }
}
