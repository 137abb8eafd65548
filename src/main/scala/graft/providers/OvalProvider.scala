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
  /** Criteria-tree DDL to `depth` nested levels. Real ELSA OVAL nests
    * package bounds up to platform AND > arch OR > arch AND > pkg OR >
    * pkg AND (5 levels), and module-stream advisories add one more; the
    * schema declares 8 so a deeper-than-fixture feed cannot silently
    * drop criteria that `from_json` never captured. */
  private def critDdl(depth: Int): String =
    if (depth <= 1) s"STRUCT<_operator: STRING, criterion $critC>"
    else s"STRUCT<_operator: STRING, criterion $critC, " +
      s"criteria ARRAY<${critDdl(depth - 1)}>>"
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
      s"criteria ${critDdl(8)}")

  private val isInstalledRx =
    java.util.regex.Pattern.compile("Oracle Linux (\\d+).*is installed")
  private val earlierThanRx =
    java.util.regex.Pattern.compile("(.*) is earlier than (.*)")
  private val moduleRx =
    java.util.regex.Pattern.compile("Module (.*) is enabled")
  private val archRx =
    java.util.regex.Pattern.compile("Oracle Linux arch is (\\S+)")

  /** The reference's criteria walk (`oracle/oval_parser.py:209-277`) on
    * the to_json'd criteria tree: the outermost criteria is either one
    * platform group (operator AND) or an OR of per-platform groups;
    * within a group, the namespace comes from the "Oracle Linux N is
    * installed" criterion and packages from "X is earlier than Y"
    * comments — version "None" never appears here (an ELSA def always
    * states the fix bound). A package bound INHERITS the module
    * ("Module X is enabled") and architecture ("Oracle Linux arch is
    * A") of the nearest enclosing branch that set them
    * (`_collect_affected`), so per-arch respins stay attributed to
    * their arch. Duplicate tuples repeated across branches collapse
    * (the reference accumulates into a set). Jackson recursion handles
    * any depth the schema captured. Returns (ns, pkg, evr, module,
    * arch) tuples, module/arch null when no branch set them. */
  private[providers] def walkCriteria(json: String)
      : Seq[(String, String, String, Option[String], Option[String])] = {
    if (json == null || json.isEmpty) return Seq.empty
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(json)
    type Aff = (String, String, Option[String], Option[String])
    def collect(n: com.fasterxml.jackson.databind.JsonNode,
        arch: Option[String], module: Option[String])
        : (Option[String], Seq[Aff]) = {
      var ns: Option[String] = None
      var localArch = arch
      var localModule = module
      val versions = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      // scan this level's criterions FIRST (the reference's loop), so
      // sibling package bounds pick up a module/arch criterion wherever
      // it sits in the element
      Option(n.get("criterion")).toSeq
        .flatMap(a => (0 until a.size).map(a.get))
        .flatMap(c => Option(c.get("_comment")).map(_.asText()))
        .foreach { c =>
          val mv = earlierThanRx.matcher(c)
          val mi = isInstalledRx.matcher(c)
          val mm = moduleRx.matcher(c)
          val ma = archRx.matcher(c)
          if (mv.matches) versions += ((mv.group(1).trim, mv.group(2).trim))
          else if (mi.matches) ns = Some(s"ol:${mi.group(1)}")
          else if (mm.matches) localModule = Some(mm.group(1))
          else if (ma.matches) localArch = Some(ma.group(1))
        }
      val own: Seq[Aff] =
        versions.toSeq.map { case (p, v) => (p, v, localModule, localArch) }
      val fromChildren = Option(n.get("criteria")).toSeq
        .flatMap(a => (0 until a.size).map(a.get))
        .map(collect(_, localArch, localModule))
      val childNs = fromChildren.flatMap(_._1).lastOption
      (childNs.orElse(ns), own ++ fromChildren.flatMap(_._2))
    }
    val groups =
      if (root.path("_operator").asText("").equalsIgnoreCase("or"))
        Option(root.get("criteria")).toSeq
          .flatMap(a => (0 until a.size).map(a.get))
      else Seq(root)
    groups.flatMap { g =>
      val (ns, affected) = collect(g, None, None)
      ns.toSeq.flatMap(n =>
        affected.distinct.map { case (p, v, m, a) => (n, p, v, m, a) })
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
        col("aff._3").as("evr"), col("aff._4").as("module"),
        col("aff._5").as("arch"))
  }

  private[providers] case class ElsaAvail(Date: String, Kind: String)
  private[providers] case class ElsaFix(Arch: Option[String],
    Available: Option[ElsaAvail], Module: Option[String], Name: String,
    NamespaceName: String, Version: String, VersionFormat: String)

  /** `.*ksplice.*` against the rpm RELEASE segment
    * (`parser.py:146-162` splits the full EVR first, so a version
    * string containing "ksplice" elsewhere never false-positives). */
  private def isKspliceEvr(v: String): Boolean = {
    val (_, _, release) = graft.functions.RpmVersion.splitFullVersion(
      if (v == null) "" else v)
    release != null && release.contains("ksplice")
  }

  /** FixedIn assembly (`oracle/oval_parser.py:281-327` _build_fixed_in
    * + `parser.py:163-199` KspliceFilterer): per (package, module) the
    * architecture is emitted only when different fix versions cover
    * different architecture sets — the common one-version-all-arches
    * advisory stays arch-less (historical shape), while a per-arch
    * respin gets one row per (version, arch) so a fix for one arch
    * never over-matches another. Available {Date: issued, Kind:
    * advisory} on real fix bounds; ksplice releases dropped after the
    * filterer's (Name, Version) re-sort. Runs per advisory over the
    * collected bounded package list — a deterministic in-row transform,
    * never a corpus shuffle. */
  private[providers] def buildFixedIn(
      tuples: Seq[(String, String, Option[String], Option[String])],
      ns: String, issued: Option[String],
      dropKsplice: Boolean): Seq[ElsaFix] = {
    val entries = tuples.distinct.groupBy(t => (t._1, t._3)).toSeq
      .flatMap { case ((pkg, module), ts) =>
        val versionArches = ts.map(t => (t._2, t._4)).distinct
        val archesByVersion = versionArches.groupBy(_._1)
          .view.mapValues(_.map(_._2).toSet).toMap
        val discriminates = archesByVersion.values.toSet.size > 1
        val picked =
          if (discriminates)
            versionArches.sortBy(va => (va._1, va._2.getOrElse("")))
          else archesByVersion.keys.toSeq.sorted
            .map(v => (v, None: Option[String]))
        picked.map { case (version, arch) =>
          val avail =
            if (version != "None" && issued.exists(_.nonEmpty))
              Some(ElsaAvail(issued.get, "advisory"))
            else None
          ElsaFix(arch, avail, module, pkg, ns, version, "rpm")
        }
      }
    val kept =
      if (dropKsplice) entries.filterNot(e => isKspliceEvr(e.Version))
      else entries
    kept.sortBy(e => (e.Name, e.Version, e.Arch.getOrElse("")))
  }

  private val buildFixedInUdf = udf(
    (ts: Seq[(String, String, Option[String], Option[String])],
     ns: String, issued: String, dropKsplice: Boolean) =>
      buildFixedIn(ts, ns, Option(issued), dropKsplice))

  /** Oracle's record assembly (`oracle/oval_parser.py:160-206`,
    * snapshot shape `tests/unit/providers/oracle/test-fixtures/
    * snapshots/`): one ELSA-keyed envelope per (definition, platform),
    * Metadata {Issued, RefId, CVE[{Name, Link}]}, FixedIn built by
    * [[buildFixedIn]] (module/arch aware, Available on real fix
    * bounds, ksplice guard), and lexicographic def-version dedupe per
    * (name, namespace). Pinned to os-schema 1.1.1 — like the
    * reference, oracle alone advertises it for the Arch field
    * (`oracle/__init__.py:30-32`). */
  def elsaEnvelopes(rows: DataFrame,
      dropKsplice: Boolean = true): DataFrame = {
    rows
      .groupBy(col("name"), col("ns"), col("def_version"),
        col("description"), col("severity"), col("issued"),
        col("ref_id"), col("link"), col("cves"))
      .agg(collect_list(struct(col("pkg"), col("evr"), col("module"),
        col("arch"))).as("affected"))
      .withColumn("fixed_in", buildFixedInUdf(col("affected"),
        col("ns"), col("issued"), lit(dropKsplice)))
      // duplicate (name, ns) across definitions: the lexicographically
      // HIGHEST def version wins — the reference's own comparison is
      // string-lexicographic (`oval_parser.py:187-206`)
      .groupBy(col("name"), col("ns"))
      .agg(max_by(struct(col("description"), col("severity"),
        col("issued"), col("ref_id"), col("link"), col("cves"),
        col("fixed_in")), col("def_version")).as("r"))
      .select(Envelope.assemble(
        concat(col("ns"), lit("/"), lower(col("name"))),
        Envelope.osSchema("1.1.1"),
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
