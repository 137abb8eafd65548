package graft.providers

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window
import graft.Envelope

/** Ubuntu's OSV-native pipeline (vunnel `providers/ubuntu/parser.py`):
  * Canonical's OSV CVE feed is sliced per ecosystem, annotated with
  * won't-fix dispositions from the OpenVEX feed, enriched with
  * Pro→base inference entries (a CVE fixed only in plain Ubuntu Pro
  * implies the same vulnerable code shipped on base), and emitted as
  * per-ecosystem OSV fragments with the fix-date patch — USN publish
  * dates as the authoritative candidate. This is the default (OSV)
  * emission shape; the OS-schema downconvert stays in [[OsvProvider]]
  * (F20) as the reference's compatibility switch.
  *
  * Spark-first: records load once with full schema inference (every
  * input field survives), slicing and annotation are explode → join →
  * ordered regroup, synthesis rebuilds typed structs with the runtime
  * element type, and the fix-date patch reuses
  * [[OsvProvider.patchFixDates]]'s positional map + row-local kernel.
  */
object UbuntuProvider {

  /** ecosystem → filesystem-safe slug (`parser.py:35-43`). */
  def ecosystemToSlug(eco: Column): Column =
    lower(regexp_replace(eco, ":", "-"))

  /** Plain Ubuntu Pro (ESM) → base ecosystem; null for base, sub-tier
    * (FIPS/Realtime) and adjacent product lines (`parser.py:48-93` —
    * only `Ubuntu:Pro:<v>[:LTS]` qualifies). */
  def proToBaseEcosystem(eco: Column): Column = {
    val rx = "^Ubuntu:Pro:(\\d+\\.\\d+)(:LTS)?$"
    val v = regexp_extract(eco, rx, 1)
    when(v =!= "", concat(lit("Ubuntu:"), v, regexp_extract(eco, rx, 2)))
  }

  /** deb-PURL pulls (`vex_overlay.py:52-83`). */
  def purlDistroLabel(purl: Column): Column =
    nullif(regexp_extract(purl, "distro=([^&]+)", 1), lit(""))
  def purlSourcePackage(purl: Column): Column =
    nullif(regexp_extract(purl, "^pkg:deb/ubuntu/([^@?]+)", 1), lit(""))

  private val wontFixPrefixes = Seq(
    "This package (for the given release) is vulnerable to the CVE, " +
      "the problem is understood, but the Ubuntu Security Team decided " +
      "to not fix it",
    "This package (for the given release) is no longer supported")

  /** Won't-fix triples (cve, distro, pkg) from the OpenVEX statements
    * frame (`vex_overlay.py:118-153`): status "affected", an
    * action_statement opening with one of Canonical's two won't-fix
    * phrasings, product PURLs restricted to `arch=source`. `vexRecords`
    * is the parsed vex/cve tree frame with a `statements` array. */
  def vexWontFix(vexRecords: DataFrame): DataFrame = {
    val isWontFix = wontFixPrefixes
      .map(p => startswith(col("s.action_statement"), lit(p)))
      .reduce(_ || _)
    vexRecords
      .select(explode(col("statements")).as("s"))
      .filter(col("s.status") === "affected" && isWontFix)
      .select(col("s.vulnerability.name").as("cve"),
        explode(col("s.products")).as("p"))
      .withColumn("purl", col("p.@id"))
      .filter(col("purl").contains("arch=source"))
      .select(col("cve"), purlDistroLabel(col("purl")).as("distro"),
        purlSourcePackage(col("purl")).as("pkg"))
      .filter(col("cve").isNotNull && col("distro").isNotNull &&
        col("pkg").isNotNull)
      .distinct()
  }

  /** `(ecosystem, pkg, version) → earliest USN published date`
    * (`usn_fixdate_overlay.py:86-117`): every fixed event of every USN
    * record, earliest because follow-up USNs re-ship the same tuple.
    * Returns the [[OsvProvider.patchFixDates]] `usnDates` dimension. */
  def usnFixDates(usnRecords: DataFrame): DataFrame =
    usnRecords
      .select(substring(col("published"), 1, 10).as("date"),
        explode(col("affected")).as("aff"))
      .filter(col("date").isNotNull && col("date") =!= "")
      .select(col("date"), col("aff.package.ecosystem").as("ecosystem"),
        col("aff.package.name").as("pkg"),
        explode(col("aff.ranges")).as("rng"))
      .select(col("date"), col("ecosystem"), col("pkg"),
        explode(col("rng.events")).as("ev"))
      .filter(col("ev.fixed").isNotNull && col("ev.fixed") =!= "" &&
        col("ecosystem").isNotNull && col("pkg").isNotNull)
      .groupBy(col("ecosystem"), col("pkg"),
        col("ev.fixed").as("version"))
      .agg(min(col("date")).as("date"))

  // ---- typed struct surgery ------------------------------------------

  /** Build a struct of exactly `t`, taking named values where supplied
    * and null-typed fields otherwise. */
  private def buildStruct(t: StructType,
      values: Map[String, Column]): Column =
    struct(t.fields.toSeq.map(f =>
      values.getOrElse(f.name, lit(null).cast(f.dataType)).as(f.name)): _*)

  private val inferenceType = StructType(Seq(
    StructField("kind", StringType),
    StructField("source_ecosystems", ArrayType(StringType))))

  /** Upgrade the inferred affected element type so
    * `database_specific.anchore.{status, inference}` exist — input
    * records never carry them, so inference alone would give the
    * annotation steps nowhere to write. Existing sibling fields are
    * preserved; new fields sort into place alphabetically. */
  private def upgradeAffType(affT: StructType): StructType = {
    def upgraded(anchoreT: StructType): StructType = {
      val kept = anchoreT.fields.filterNot(f =>
        f.name == "status" || f.name == "inference")
      StructType((kept.toSeq :+ StructField("inference", inferenceType) :+
        StructField("status", StringType)).sortBy(_.name))
    }
    val dbT = affT.fields.find(_.name == "database_specific")
      .map(_.dataType.asInstanceOf[StructType])
      .getOrElse(StructType(Nil))
    val anchoreT = dbT.fields.find(_.name == "anchore")
      .map(_.dataType.asInstanceOf[StructType])
      .getOrElse(StructType(Nil))
    val dbUp = StructType((dbT.fields.filterNot(_.name == "anchore").toSeq :+
      StructField("anchore", upgraded(anchoreT))).sortBy(_.name))
    StructType((affT.fields.filterNot(_.name == "database_specific").toSeq :+
      StructField("database_specific", dbUp)).sortBy(_.name))
  }

  /** Rebuild one affected entry at the upgraded type: all original
    * fields copied, `database_specific.anchore.status` /
    * `.inference` set from the given columns (falling back to whatever
    * the entry already carried). The database_specific struct stays
    * NULL — and therefore absent from the emitted JSON — unless the
    * entry had one or an annotation lands. */
  private def rebuildAff(aff: Column, affT: StructType, affUp: StructType,
      status: Column, inference: Column): Column = {
    val dbUp = affUp("database_specific").dataType.asInstanceOf[StructType]
    val anchoreUp = dbUp("anchore").dataType.asInstanceOf[StructType]
    val hadDb = affT.fieldNames.contains("database_specific")
    val oldDb = if (hadDb) aff.getField("database_specific")
      else lit(null)
    val oldDbT = if (hadDb)
      affT("database_specific").dataType.asInstanceOf[StructType]
      else StructType(Nil)
    val hadAnchore = oldDbT.fieldNames.contains("anchore")
    val oldAnchore = if (hadAnchore) oldDb.getField("anchore") else lit(null)
    val oldAnchoreT = if (hadAnchore)
      oldDbT("anchore").dataType.asInstanceOf[StructType]
      else StructType(Nil)
    val statusOut = coalesce(
      Seq(status) ++ (if (oldAnchoreT.fieldNames.contains("status"))
        Seq(oldAnchore.getField("status")) else Nil): _*)
    val inferenceOut =
      if (oldAnchoreT.fieldNames.contains("inference"))
        coalesce(inference, oldAnchore.getField("inference")
          .cast(inferenceType))
      else inference
    val anchoreOut = buildStruct(anchoreUp,
      oldAnchoreT.fieldNames.filterNot(n => n == "status" || n == "inference")
        .map(n => n -> oldAnchore.getField(n)).toMap ++
        Map("status" -> statusOut, "inference" -> inferenceOut))
    val keepAnchore = statusOut.isNotNull || inferenceOut.isNotNull ||
      (if (hadAnchore) oldAnchore.isNotNull else lit(false))
    val dbOut = buildStruct(dbUp,
      oldDbT.fieldNames.filterNot(_ == "anchore")
        .map(n => n -> oldDb.getField(n)).toMap ++
        Map("anchore" -> when(keepAnchore, anchoreOut)))
    val keepDb = keepAnchore ||
      (if (hadDb) oldDb.isNotNull else lit(false))
    buildStruct(affUp,
      affT.fieldNames.filterNot(_ == "database_specific")
        .map(n => n -> aff.getField(n)).toMap ++
        Map("database_specific" -> when(keepDb, dbOut)))
  }

  /** A synthesized base affected entry from a Pro template
    * (`parser.py:105-159`): source package renamed to the base
    * ecosystem with the Pro-codename purl dropped, an introduced-only
    * ECOSYSTEM range, binaries carried when the template has them,
    * status wont-fix plus the pro-only-fix inference provenance. */
  private def synthAff(aff: Column, affT: StructType, affUp: StructType,
      baseEco: Column, proEco: Column): Column = {
    val pkgT = affUp("package").dataType.asInstanceOf[StructType]
    val pkgOut = buildStruct(pkgT,
      pkgT.fieldNames.filterNot(n => n == "ecosystem" || n == "purl")
        .map(n => n -> aff.getField("package").getField(n)).toMap ++
        Map("ecosystem" -> baseEco))
    val rangesT = affUp("ranges").dataType.asInstanceOf[ArrayType]
    val rangeT = rangesT.elementType.asInstanceOf[StructType]
    val eventT = rangeT("events").dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
    val rangesOut = array(buildStruct(rangeT, Map(
      "type" -> lit("ECOSYSTEM"),
      "events" -> array(buildStruct(eventT, Map("introduced" -> lit("0")))))))
    // the reference ALWAYS emits ecosystem_specific on a synthesized
    // entry — {} when the template had no binaries (`parser.py:141-158`,
    // reference snapshot ubuntu-14.04-lts carries the bare {})
    val ecoSpec =
      if (!affUp.fieldNames.contains("ecosystem_specific")) Map.empty[String, Column]
      else {
        val esT = affUp("ecosystem_specific").dataType.asInstanceOf[StructType]
        val binaries =
          if (esT.fieldNames.contains("binaries"))
            Map("binaries" -> aff.getField("ecosystem_specific")
              .getField("binaries"))
          else Map.empty[String, Column]
        Map("ecosystem_specific" -> buildStruct(esT, binaries))
      }
    val dbUp = affUp("database_specific").dataType.asInstanceOf[StructType]
    val anchoreUp = dbUp("anchore").dataType.asInstanceOf[StructType]
    buildStruct(affUp, Map(
      "package" -> pkgOut,
      "ranges" -> rangesOut,
      "database_specific" -> buildStruct(dbUp, Map(
        "anchore" -> buildStruct(anchoreUp, Map(
          "status" -> lit("wont-fix"),
          "inference" -> struct(lit("pro-only-fix").as("kind"),
            when(proEco.isNotNull, array(proEco))
              .otherwise(array().cast(ArrayType(StringType)))
              .as("source_ecosystems"))))))) ++ ecoSpec)
  }

  // ---- pipeline ------------------------------------------------------

  /** Slice each record per ecosystem (`parser.py:161-180`) and stamp
    * the VEX won't-fix disposition per entry (`parser.py:203-236` —
    * join key (upstream CVE, purl distro label, purl source package)).
    * Returns (eco, rec) rows where rec.affected holds only that
    * ecosystem's entries (order preserved), at the upgraded type. */
  def slicedWithWontFix(records: DataFrame,
      vex: Option[DataFrame]): DataFrame = {
    val recT = records.schema("rec").dataType.asInstanceOf[StructType]
    val affT = recT("affected").dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
    val affUp = upgradeAffType(affT)
    val hasUpstream = recT.fieldNames.contains("upstream")
    val upstream0 =
      if (hasUpstream) try_element_at(col("rec.upstream"), lit(1))
      else lit(null).cast(StringType)
    val exploded = records
      .select(col("rec"), upstream0.as("cve"),
        posexplode(col("rec.affected")).as(Seq("pos", "aff")))
      .withColumn("eco", col("aff.package.ecosystem"))
      .filter(col("eco").isNotNull)
    val stamped = vex match {
      case None => exploded
        .withColumn("wf_hit", lit(null).cast(StringType))
      case Some(v) =>
        val wf = broadcast(vexWontFix(v)
          .select(col("cve").as("wf_cve"), col("distro").as("wf_distro"),
            col("pkg").as("wf_pkg"), lit("wont-fix").as("wf_hit")))
        exploded.join(wf,
          col("cve") === col("wf_cve") &&
            purlDistroLabel(col("aff.package.purl")) === col("wf_distro") &&
            purlSourcePackage(col("aff.package.purl")) === col("wf_pkg"),
          "left_outer")
          .drop("wf_cve", "wf_distro", "wf_pkg")
    }
    // regroup ONLY the slim slice rows (id, eco, pos, entry) — the
    // record must not ride the exchange once per affected entry — then
    // join the folded slices back to the distinct records by id, so the
    // full record crosses the wire exactly once however many ecosystems
    // it spans (ids are unique: the feed is one file per CVE)
    val slices = stamped
      .withColumn("aff2", rebuildAff(col("aff"), affT, affUp,
        col("wf_hit"), lit(null).cast(inferenceType)))
      .groupBy(col("rec.id").as("rid"), col("eco"))
      .agg(transform(array_sort(collect_list(struct(col("pos"),
        col("aff2").as("a")))), x => x.getField("a")).as("affs"))
    records.join(slices, col("rec.id") === col("rid"))
      .select(col("eco"),
        col("rec").withField("affected", col("affs")).as("rec"))
  }

  /** Pro→base inference merge (`parser.py:427-523`): for each plain-Pro
    * slice, every source package absent from the base slice of the same
    * CVE gains a synthesized base entry; CVEs with no base slice at all
    * get a synthetic envelope built from the Pro record's top fields.
    * Pro and sub-tier slices themselves pass through untouched. */
  def withProInference(sliced: DataFrame): DataFrame = {
    val recT = sliced.schema("rec").dataType.asInstanceOf[StructType]
    val affUp = recT("affected").dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
    val base = sliced.filter(proToBaseEcosystem(col("eco")).isNull)
    val pro = sliced.filter(proToBaseEcosystem(col("eco")).isNotNull)
    // one candidate per (cve, base eco, source package): first Pro
    // slice in (eco, position) order, like the reference's seen-set
    val proCands = pro
      .select(col("eco").as("pro_eco"),
        proToBaseEcosystem(col("eco")).as("base_eco"),
        col("rec").as("pro_rec"),
        posexplode(col("rec.affected")).as(Seq("pos", "aff")))
      .filter(col("aff.package.name").isNotNull)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("pro_rec.id"), col("base_eco"),
          col("aff.package.name"))
          .orderBy(col("pro_eco"), col("pos"))))
      .filter(col("__rn") === 1)
      .select(col("pro_eco"), col("base_eco"), col("pro_rec"), col("pos"),
        col("aff.package.name").as("pkg"),
        synthAff(col("aff"), affUp, affUp, col("base_eco"),
          col("pro_eco")).as("synth"))
    // drop candidates whose package already exists in the base slice,
    // then fold the survivors per (cve, base eco)
    val baseKeys = base.select(col("rec.id").as("b_id"),
      col("eco").as("b_eco"), explode(col("rec.affected")).as("b_aff"))
      .select(col("b_id"), col("b_eco"),
        col("b_aff.package.name").as("b_pkg"))
    val survivors = proCands.join(baseKeys,
      col("pro_rec.id") === col("b_id") && col("base_eco") === col("b_eco")
        && col("pkg") === col("b_pkg"), "left_anti")
    val synthByCve = survivors
      .groupBy(col("pro_rec.id").as("s_id"), col("base_eco"))
      .agg(transform(array_sort(collect_list(struct(col("pro_eco"),
        col("pos"), col("synth").as("a")))), x => x.getField("a"))
        .as("synth_affs"),
        min_by(col("pro_rec"), col("pro_eco")).as("template"))
    // append to an existing base slice...
    val enriched = base.join(synthByCve,
      col("rec.id") === col("s_id") && col("eco") === col("base_eco"),
      "left_outer")
      .select(col("eco"),
        when(col("synth_affs").isNotNull,
          col("rec").withField("affected",
            concat(col("rec.affected"), col("synth_affs"))))
          .otherwise(col("rec")).as("rec"))
    // ...or make a synthetic envelope where no base slice exists
    val baseIds = base.select(col("rec.id").as("b_id"),
      col("eco").as("b_eco")).distinct()
    val synthetic = synthByCve.join(baseIds,
      col("s_id") === col("b_id") && col("base_eco") === col("b_eco"),
      "left_anti")
      .select(col("base_eco").as("eco"),
        col("template").withField("affected", col("synth_affs")).as("rec"))
    enriched.unionByName(synthetic).unionByName(pro)
  }

  /** Full OSV-native emission: slice → wont-fix → inference → fix-date
    * patch (lookup keyed by the upstream CVE, USN dates authoritative)
    * → per-ecosystem fragment envelopes `<slug>/<id lower>` under the
    * record's own OSV schema version (default 1.6.1,
    * `schema.py:15,94`). */
  def envelopes(records: DataFrame, vex: Option[DataFrame] = None,
      fixdates: Option[DataFrame] = None,
      usnDates: Option[DataFrame] = None): DataFrame = {
    val flowed = withProInference(slicedWithWontFix(records, vex))
    val hasSv = records.schema("rec").dataType.asInstanceOf[StructType]
      .fieldNames.contains("schema_version")
    // every slice of one CVE shares the record id, so the patch joins
    // on the (slug, id) fragment key — otherwise one slice's positional
    // fix map would land on its siblings
    val raw = flowed.select(col("eco"),
      concat(ecosystemToSlug(col("eco")), lit("/"), col("rec.id"))
        .as("id"),
      (if (hasSv) coalesce(col("rec.schema_version"), lit("1.6.1"))
       else lit("1.6.1")).as("sv"),
      to_json(col("rec"), Map("ignoreNullFields" -> "true")).as("raw"))
    val patched = fixdates match {
      case None if usnDates.isEmpty => raw
      case _ =>
        OsvProvider.patchFixDates(raw,
          fixdates.getOrElse(emptyFixdates(raw.sparkSession)),
          ecosystemNormalizer = e => e,
          lookupId = coalesce(
            get_json_object(col("raw"), "$.upstream[0]"),
            get_json_object(col("raw"), "$.id")),
          usnDates = usnDates)
    }
    patched.select(
      lower(col("id")).as("identifier"),
      Envelope.osvSchemaCol(col("sv")).as("schema"),
      col("raw").as("item"))
  }

  /** The empty first-observed dimension, used when only the USN overlay
    * is supplied — schema matches [[OsvProvider.patchFixDates]]'s
    * `fixdates` contract. */
  def emptyFixdates(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("vuln_id", StringType),
        StructField("ecosystem", StringType),
        StructField("pkg", StringType),
        StructField("version", StringType),
        StructField("date", StringType),
        StructField("kind", StringType))))

  /** Read Canonical OSV CVE records (a directory/glob of JSON files or
    * the staged tar's extracted members) with full schema inference —
    * the passthrough contract: every input field survives. */
  def records(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "true").json(path)
      .select(struct(col("*")).as("rec"))
      .filter(col("rec.id").isNotNull)

  /** K4's ubuntu lifecycle (`parser.py:307-373` + the README's freeze
    * strategy): fragments partition by ecosystem slug, and a run
    * replaces ONLY the ecosystems present in today's feed — releases
    * that have gone EOL and dropped out of the tarball keep their last
    * known fragment indefinitely. Dynamic partition overwrite is
    * exactly that contract. */
  def writeFragments(envelopes: DataFrame, destDir: String): Unit =
    graft.sinks.ResultStore.writeFragments(
      envelopes.withColumn("eco_slug",
        substring_index(col("identifier"), "/", 1)),
      destDir, "eco_slug")
}
