package graft.providers

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}
import graft.Envelope
import graft.functions.Cvss

/** SLES OVAL provider (vunnel `providers/sles/parser.py` — the
  * shape-specific half on top of the generic [[OvalProvider]] 4-way
  * join):
  *
  *  - **impact groups** (`utils/oval_v2.py:140-272`): the definition's
  *    criteria tree is an OR of AND-groups, each group exactly two
  *    subgroups — platforms and artifacts, a subgroup being a criterion
  *    or an OR of criterions. Groups with a different child count are
  *    skipped, exactly like the reference's bail-out. The reference
  *    splits platform/artifact positionally (child 0/1); here the split
  *    is by the same comment regexes the reference then applies — on
  *    SUSE data these are equivalent (platform comments are the only
  *    ones matching the platform pattern) and it keeps the whole parse
  *    one relational projection.
  *  - **namespace resolution** (`parser.py:300-333`): each platform
  *    criterion resolves through test→object/state to (release_name,
  *    release_version); versions outside the major being processed are
  *    dropped; feed namespace = `sles:<version>`.
  *  - **release resolver** (`parser.py:197-246`): one feed object per
  *    version — a lone release name wins as-is, conflicts prefer
  *    sles-release over sles-ltss-release, anything else is skipped.
  *  - **not-affected NAK** (`parser.py:380-421`): criteria marked
  *    " is not affected" emit Version "0" entries when their state
  *    requires version 0, deduplicated against affected entries.
  *  - **CVSS** (`parser.py:171-196,296-298`): advisory cve elements
  *    carry `cvss3="<score>/CVSS:3.x/…"`; the score prefix is stripped,
  *    malformed vectors are dropped, scores recomputed (F8) into the
  *    reference's CVSS record shape.
  *
  * Fix-availability (the reference's fixdater call with the advisory
  * issued-date candidate, `parser.py:349-362`) composes via
  * [[graft.operators.FixDate.enrich]] over the emitted FixedIn rows.
  *
  * Scale: definitions and the test/object/state catalogs are all
  * dimension-sized; the catalogs broadcast and the only shuffles are
  * the two per-vulnerability groups.
  */
object SlesProvider {

  private val critDDL = "ARRAY<STRUCT<_comment: STRING, _test_ref: STRING>>"
  private val critType = DataType.fromDDL(critDDL)

  val defSchema: StructType = StructType.fromDDL(
    "metadata STRUCT<title: STRING, description: STRING, " +
      "advisory: STRUCT<severity: STRING, issued: STRUCT<_date: STRING>, " +
      "cve: ARRAY<STRUCT<_cvss3: STRING, _href: STRING, _VALUE: STRING>>>, " +
      "reference: ARRAY<STRUCT<_source: STRING, _ref_id: STRING, " +
      "_ref_url: STRING>>>, " +
      "criteria STRUCT<_operator: STRING, " +
      s"criterion $critDDL, " +
      "criteria ARRAY<STRUCT<_operator: STRING, " +
      s"criterion $critDDL, " +
      "criteria ARRAY<STRUCT<_operator: STRING, " +
      s"criterion $critDDL>>>>>")

  private val platformRe = "SUSE Linux Enterprise Server \\d+.* is installed"
  private val notAffectedRe = " is not affected"
  private val installedRe = " is installed"

  private val severityMap = Map(
    "low" -> "Low", "moderate" -> "Medium", "medium" -> "Medium",
    "high" -> "High", "important" -> "High", "critical" -> "Critical")

  def definitions(spark: SparkSession, path: String): DataFrame =
    spark.read.format("xml").option("rowTag", "definition")
      .schema(defSchema).load(path)

  /** States read with an explicit string schema: release versions like
    * "15.4" and the not-affected sentinel "0" must stay verbatim text
    * (inference would type them numeric). */
  val stateSchema: StructType = StructType.fromDDL(
    "_id STRING, " +
      "evr STRUCT<_VALUE: STRING, _operation: STRING, _datatype: STRING>, " +
      "version STRUCT<_VALUE: STRING, _operation: STRING>")

  /** (test_id, name, value) via the J8 chain — value is the state's evr
    * or version text (`utils/oval_v2.py:354-377`). */
  def testCatalog(spark: SparkSession, path: String): DataFrame = {
    import graft.sources.Sources
    Sources.ovalTests(spark, path)
      .select(col("_id").as("test_id"),
        col("object._object_ref").as("object_ref"),
        col("state._state_ref").as("state_ref"))
      .join(Sources.ovalObjects(spark, path)
        .select(col("_id").as("obj_id"), col("name")),
        col("object_ref") === col("obj_id"))
      .join(spark.read.format("xml").option("rowTag", "rpminfo_state")
        .schema(stateSchema).load(path)
        .select(col("_id").as("state_id"),
          coalesce(col("evr._VALUE"), col("version._VALUE")).as("value")),
        col("state_ref") === col("state_id"))
      .select("test_id", "name", "value")
  }

  // --- CVSS records from advisory cve attributes ------------------------

  final case class SlesBaseMetrics(base_score: Double, base_severity: String,
      exploitability_score: Double, impact_score: Double)
  final case class SlesCvss(base_metrics: SlesBaseMetrics, status: String,
      vector_string: String, version: String)

  private val cvssListUdf = udf { vs: Seq[String] =>
    Option(vs).getOrElse(Seq.empty).flatMap { raw =>
      // "7.5/CVSS:3.1/…" → strip the score prefix (`parser.py:525-531`)
      val vector =
        if (raw == null) null
        else if (raw.startsWith("CVSS")) raw
        else raw.split("/", 2) match {
          case Array(_, v) => v
          case _ => null
        }
      Option(Cvss.score(vector)).map(s => SlesCvss(
        SlesBaseMetrics(s.baseScore, s.baseSeverity,
          s.exploitabilityScore, s.impactScore),
        "N/A", vector, s.version))
    }
  }

  // --- impact extraction ------------------------------------------------

  /** One row per (definition, platform criterion): vulnerability fields
    * + the group's affected / not-affected test-ref arrays. */
  def impacts(defs: DataFrame): DataFrame = {
    val emptyCrit = array().cast(critType)
    // normalized group: direct criterions + one-level-nested criterions
    def norm(direct: Column, nested: Column) = struct(
      coalesce(direct, emptyCrit).as("direct"),
      transform(coalesce(nested, array()),
        c => coalesce(c.getField("criterion"), emptyCrit)).as("nested"))

    val outer = col("criteria")
    val groups = when(
      upper(coalesce(outer.getField("_operator"), lit(""))) === "OR",
      transform(coalesce(outer.getField("criteria"), array()),
        g => norm(g.getField("criterion"), g.getField("criteria"))))
      .otherwise(array(norm(outer.getField("criterion"),
        outer.getField("criteria"))))

    val sevMap = map(severityMap.toSeq
      .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    val suseRef = try_element_at(filter(
      coalesce(col("metadata.reference"),
        array().cast(defSchema("metadata").dataType
          .asInstanceOf[StructType]("reference").dataType)),
      r => r.getField("_source") === "SUSE CVE"), lit(1))

    val g = col("g")
    val crits = concat(g.getField("direct"), flatten(g.getField("nested")))
    val comment = (c: Column) => coalesce(c.getField("_comment"), lit(""))
    val platform = filter(crits, c => comment(c).rlike(platformRe))
    val notAffected = filter(crits, c => comment(c).rlike(notAffectedRe))
    val affected = filter(crits, c => comment(c).rlike(installedRe) &&
      !comment(c).rlike(platformRe))

    defs
      .filter(col("metadata.title").isNotNull &&
        suseRef.getField("_ref_url").isNotNull)
      .select(
        col("metadata.title").as("name"),
        coalesce(sevMap(lower(coalesce(col("metadata.advisory.severity"),
          lit("")))), lit("Unknown")).as("severity"),
        trim(coalesce(col("metadata.description"), lit("")))
          .as("description"),
        suseRef.getField("_ref_url").as("link"),
        cvssListUdf(transform(coalesce(col("metadata.advisory.cve"), array()
          .cast(defSchema("metadata").dataType.asInstanceOf[StructType]
            ("advisory").dataType.asInstanceOf[StructType]("cve").dataType)),
          c => c.getField("_cvss3"))).as("cvss"),
        explode(groups).as("g"))
      // the reference bails on groups without exactly two subgroups
      .filter(size(g.getField("direct")) + size(g.getField("nested")) === 2)
      .filter(size(platform) > 0 &&
        size(affected) + size(notAffected) > 0)
      .select(col("name"), col("severity"), col("description"), col("link"),
        col("cvss"),
        transform(affected, c => c.getField("_test_ref"))
          .as("affected_refs"),
        transform(notAffected, c => c.getField("_test_ref"))
          .as("not_affected_refs"),
        explode(transform(platform, c => c.getField("_test_ref")))
          .as("ns_ref"))
  }

  /** Envelopes for one major version. `fixdates` is the optional
    * fix-date dimension (vuln, pkg, version, date, kind) — the
    * reference sles parser wires a fixdater
    * (`providers/sles/parser.py:75-81,350-373`); matched FixedIn rows
    * gain Available {Date, Kind}; NAK sentinel rows never match. */
  def envelopes(impacts: DataFrame, catalog: DataFrame,
      majorVersion: String,
      fixdates: Option[DataFrame] = None): DataFrame = {
    val ns = catalog.select(col("test_id").as("ns_ref"),
      col("name").as("release_name"), col("value").as("release_version"))
    val placed = impacts.join(broadcast(ns), Seq("ns_ref"))
      .filter(col("release_version").startsWith(majorVersion))

    // affected + not-affected package rows through the same catalog
    val pkgCat = broadcast(catalog.select(col("test_id"),
      col("name").as("pkg"), col("value").as("pkg_version")))
    val aff = placed
      .select(col("name"), col("release_name"), col("release_version"),
        col("severity"), col("description"), col("link"), col("cvss"),
        explode(col("affected_refs")).as("test_id"), lit(false).as("nak"))
    val nak = placed
      .select(col("name"), col("release_name"), col("release_version"),
        col("severity"), col("description"), col("link"), col("cvss"),
        explode(col("not_affected_refs")).as("test_id"), lit(true).as("nak"))
    val rows = aff.unionByName(nak).join(pkgCat, Seq("test_id"))
      // a not-affected criterion must reference a version-0 state
      // (`parser.py:398-410` defensive skip)
      .filter(!col("nak") || col("pkg_version") === "0")

    // two definitions CAN share a title (the same CVE in more than one
    // patch definition): first() would pick per-run-nondeterministic
    // metadata. One winner definition is selected by (severity rank,
    // description) — every metadata column with the SAME key, so the
    // fields stay mutually consistent.
    val selKey = struct(
      graft.functions.Norm.severity_rank(col("severity")),
      col("description"))
    val perRelease = rows
      .groupBy("name", "release_version", "release_name")
      .agg(
        max_by(col("severity"), selKey).as("severity"),
        max_by(col("description"), selKey).as("description"),
        max_by(col("link"), selKey).as("link"),
        max_by(col("cvss"), selKey).as("cvss"),
        collect_list(when(!col("nak"),
          struct(col("pkg").as("pkg"), col("pkg_version").as("ver"))))
          .as("aff"),
        collect_set(when(col("nak"), col("pkg"))).as("nak_pkgs"))
      // NAK entries deduplicate against affected names (`parser.py:380-421`)
      .withColumn("fixed_in", array_sort(concat(col("aff"),
        transform(
          filter(col("nak_pkgs"), p => !exists(col("aff"),
            a => a.getField("pkg") === p)),
          p => struct(p.as("pkg"), lit("0").as("ver"))))))

    // release resolver: one feed object per (name, version)
    val ranked = perRelease.withColumn("rank",
      when(col("release_name") === "sles-release", 3)
        .when(col("release_name") === "sles-ltss-release", 2)
        .otherwise(lit(1)))
    val resolved = ranked
      .groupBy("name", "release_version")
      .agg(count(lit(1)).as("n"),
        max_by(struct(col("rank"), col("release_name"), col("severity"),
          col("description"), col("link"), col("cvss"), col("fixed_in")),
          struct(col("rank"), col("release_name"))).as("pick"))
      .filter(col("n") === 1 || col("pick.rank") >= 2)

    // both paths produce fi2: (pkg, ver, ad, ak) — the fixdated
    // variant explodes, broadcast-joins the dimension, and regroups
    // (exactly one pick per (name, release_version) after resolution)
    val withFi = fixdates match {
      case None => resolved.withColumn("fi2",
        transform(col("pick.fixed_in"), f => struct(
          f.getField("pkg").as("pkg"), f.getField("ver").as("ver"),
          lit(null).cast("string").as("ad"),
          lit(null).cast("string").as("ak"))))
      case Some(fd) =>
        graft.operators.FixDate.available(
          resolved.select(col("name"), col("release_version"),
            col("pick"), explode_outer(col("pick.fixed_in")).as("f")),
          fixdates, col("name"), col("f.pkg"), col("f.ver"))
          .groupBy(col("name"), col("release_version"))
          .agg(first(col("pick")).as("pick"),
            // collect_list skips the null struct an empty fixed_in's
            // explode_outer row produces
            array_sort(collect_list(when(col("f").isNotNull, struct(
              col("f.pkg").as("pkg"), col("f.ver").as("ver"),
              col("available_date").as("ad"),
              col("available_kind").as("ak"))))).as("fi2"))
    }
    val feedNs = concat(lit("sles:"), col("release_version"))
    withFi.select(Envelope.assemble(
      concat(feedNs, lit("/"), lower(col("name"))),
      Envelope.OsSchema,
      Envelope.osPayload(struct(
        col("pick.cvss").as("CVSS"),
        col("pick.description").as("Description"),
        transform(col("fi2"), f => struct(
          Envelope.defaultModule.as("Module"),
          f.getField("pkg").as("Name"),
          feedNs.as("NamespaceName"),
          Envelope.defaultVendorAdvisory.as("VendorAdvisory"),
          f.getField("ver").as("Version"),
          lit("rpm").as("VersionFormat"),
          when(f.getField("ad").isNotNull, struct(
            f.getField("ad").as("Date"), f.getField("ak").as("Kind")))
            .as("Available"))).as("FixedIn"),
        col("pick.link").as("Link"),
        Envelope.emptyMetadata.as("Metadata"),
        col("name").as("Name"),
        feedNs.as("NamespaceName"),
        col("pick.severity").as("Severity")))): _*)
  }

  /** Full pipeline from a staged per-major OVAL document. */
  def envelopes(spark: SparkSession, path: String,
      majorVersion: String): DataFrame =
    envelopes(spark, path, majorVersion, None)

  def envelopes(spark: SparkSession, path: String, majorVersion: String,
      fixdates: Option[DataFrame]): DataFrame =
    envelopes(impacts(definitions(spark, path)),
      testCatalog(spark, path), majorVersion, fixdates)
}
