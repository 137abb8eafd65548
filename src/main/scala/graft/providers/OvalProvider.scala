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

  // ---- oracle ELSA records ---------------------------------------------

  /** Definition schema for the ELSA path: advisory metadata (title,
    * description, severity, issued date, CVE list, elsa reference) plus
    * the criteria tree WITH comments and operators to depth 4 — the
    * reference's oracle parser extracts packages from criterion COMMENT
    * text ("X is earlier than Y"), never from the test chain
    * (`providers/oracle/parser.py:24-31` patterns), and groups them per
    * platform branch. */
  private val critC = "ARRAY<STRUCT<_test_ref: STRING, _comment: STRING>>"
  val elsaDefSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType.fromDDL(
      "_version STRING, " +
      "metadata STRUCT<title: STRING, description: STRING, " +
        "affected: STRUCT<platform: ARRAY<STRING>>, " +
        "reference: ARRAY<STRUCT<_ref_id: STRING, _source: STRING, " +
          "_ref_url: STRING>>, " +
        "advisory: STRUCT<severity: STRING, " +
          "issued: STRUCT<_date: STRING>, " +
          "cve: ARRAY<STRUCT<_VALUE: STRING, _href: STRING>>>>, " +
      "criteria STRUCT<_operator: STRING, " +
        s"criterion $critC, " +
        "criteria ARRAY<STRUCT<_operator: STRING, " +
        s"criterion $critC, " +
        "criteria ARRAY<STRUCT<_operator: STRING, " +
        s"criterion $critC, " +
        s"criteria ARRAY<STRUCT<criterion $critC>>>>>>>")

  private val isInstalledRx =
    java.util.regex.Pattern.compile("Oracle Linux (\\d+).*is installed")
  private val earlierThanRx =
    java.util.regex.Pattern.compile("(.*) is earlier than (.*)")

  /** The reference's criteria walk (`oracle/oval_parser.py:209-277`) on
    * the to_json'd criteria tree: the outermost criteria is either one
    * platform group (operator AND) or an OR of per-platform groups;
    * within a group, the namespace comes from the "Oracle Linux N is
    * installed" criterion and packages from "X is earlier than Y"
    * comments — version "None" never appears here (an ELSA def always
    * states the fix bound). Jackson recursion handles any depth the
    * schema captured. Returns (ns, pkg, evr) triples. */
  private[providers] def walkCriteria(json: String)
      : Seq[(String, String, String)] = {
    if (json == null || json.isEmpty) return Seq.empty
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(json)
    def comments(n: com.fasterxml.jackson.databind.JsonNode)
        : Seq[String] = {
      val own = Option(n.get("criterion")).toSeq
        .flatMap(a => (0 until a.size).map(a.get))
        .flatMap(c => Option(c.get("_comment")).map(_.asText()))
      val nested = Option(n.get("criteria")).toSeq
        .flatMap(a => (0 until a.size).map(a.get))
        .flatMap(comments)
      own ++ nested
    }
    val groups =
      if (root.path("_operator").asText("").equalsIgnoreCase("or"))
        Option(root.get("criteria")).toSeq
          .flatMap(a => (0 until a.size).map(a.get))
      else Seq(root)
    groups.flatMap { g =>
      val cs = comments(g)
      val ns = cs.iterator
        .map(isInstalledRx.matcher)
        .collectFirst { case m if m.matches => s"ol:${m.group(1)}" }
      ns.toSeq.flatMap(n => cs.flatMap { c =>
        val m = earlierThanRx.matcher(c)
        if (m.matches) Some((n, m.group(1).trim, m.group(2).trim)) else None
      })
    }
  }

  private val walkUdf = udf((j: String) => walkCriteria(j))

  /** One row per (definition, platform-namespace, package): the ELSA
    * advisory metadata joined to its per-branch package fixes. */
  def elsaRows(spark: SparkSession, path: String): DataFrame = {
    val elsaRef = try_element_at(filter(col("metadata.reference"),
      r => r.getField("_source") === "elsa"), lit(1))
    Sources.ovalDefinitions(spark, path, Some(elsaDefSchema))
      .select(
        col("_version").as("def_version"),
        // name = title up to ": " (`oval_parser.py:140-141`)
        trim(regexp_extract(col("metadata.title"), "^([^:]*):", 1))
          .as("name"),
        trim(coalesce(col("metadata.description"), lit("")))
          .as("description"),
        ovalSeverity(col("metadata.advisory.severity")).as("severity"),
        col("metadata.advisory.issued._date").as("issued"),
        elsaRef.getField("_ref_id").as("ref_id"),
        elsaRef.getField("_ref_url").as("link"),
        coalesce(transform(col("metadata.advisory.cve"), c => struct(
          c.getField("_VALUE").as("Name"),
          c.getField("_href").as("Link"))),
          array().cast("array<struct<Name:string,Link:string>>"))
          .as("cves"),
        explode(walkUdf(to_json(col("criteria")))).as("aff"))
      .filter(col("name") =!= "")
      .select(col("def_version"), col("name"), col("description"),
        col("severity"), col("issued"), col("ref_id"), col("link"),
        col("cves"), col("aff._1").as("ns"), col("aff._2").as("pkg"),
        col("aff._3").as("evr"))
  }

  /** Oracle's record assembly (`oracle/oval_parser.py:160-206`,
    * snapshot shape `tests/unit/providers/oracle/test-fixtures/
    * snapshots/`): one ELSA-keyed envelope per (definition, platform),
    * Metadata {Issued, RefId, CVE[{Name, Link}]}, FixedIn rows carrying
    * Available {Date: issued, Kind: advisory} for real fix bounds, and
    * lexicographic def-version dedupe per (name, namespace). ksplice
    * fixes are dropped (the guard [[envelopes]] documents) while the
    * record stays. */
  def elsaEnvelopes(rows: DataFrame,
      dropKsplice: Boolean = true): DataFrame = {
    val kspliceHit = coalesce(
      graft.functions.RpmVersion.rpm_release(col("evr")), lit(""))
      .rlike("ksplice")
    val fixedInStruct = struct(
      when(col("evr") =!= "None" && col("issued").isNotNull, struct(
        col("issued").as("Date"), lit("advisory").as("Kind")))
        .as("Available"),
      col("pkg").as("Name"),
      col("ns").as("NamespaceName"),
      col("evr").as("Version"),
      lit("rpm").as("VersionFormat"))
    rows
      .groupBy(col("name"), col("ns"), col("def_version"),
        col("description"), col("severity"), col("issued"),
        col("ref_id"), col("link"), col("cves"))
      .agg(array_sort(collect_list(
        if (dropKsplice) when(!kspliceHit, fixedInStruct)
        else fixedInStruct)).as("fixed_in"))
      // duplicate (name, ns) across definitions: the lexicographically
      // HIGHEST def version wins (`oval_parser.py:187-206`)
      .groupBy(col("name"), col("ns"))
      .agg(max_by(struct(col("description"), col("severity"),
        col("issued"), col("ref_id"), col("link"), col("cves"),
        col("fixed_in")), col("def_version")).as("r"))
      .select(Envelope.assemble(
        concat(col("ns"), lit("/"), lower(col("name"))),
        Envelope.OsSchema,
        Envelope.osPayload(struct(
          Envelope.emptyCvss.as("CVSS"),
          col("r.description").as("Description"),
          col("r.fixed_in").as("FixedIn"),
          col("r.link").as("Link"),
          struct(
            when(size(col("r.cves")) > 0, col("r.cves")).as("CVE"),
            col("r.issued").as("Issued"),
            col("r.ref_id").as("RefId")).as("Metadata"),
          col("name").as("Name"),
          col("ns").as("NamespaceName"),
          col("r.severity").as("Severity")))): _*)
  }
}
