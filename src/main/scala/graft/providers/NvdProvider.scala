package graft.providers

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** NVD pipeline pieces (SURVEY §3.1): the override join (J2,
  * `providers/nvd/manager.py:304-339`) and the cpeMatch fix enrichment
  * (`manager.py:354-392`), relational.
  */
object NvdProvider {

  val pageSchema: StructType = StructType.fromDDL(
    "vulnerabilities ARRAY<STRUCT<cve: STRUCT<" +
      "id: STRING, lastModified: STRING, vulnStatus: STRING, " +
      "descriptions: ARRAY<STRUCT<lang: STRING, value: STRING>>, " +
      "configurations: ARRAY<STRUCT<nodes: ARRAY<STRUCT<operator: STRING, " +
      "cpeMatch: ARRAY<STRUCT<vulnerable: BOOLEAN, criteria: STRING, " +
      "versionEndExcluding: STRING>>>>>>, " +
      "references: ARRAY<STRUCT<url: STRING, source: STRING>>>>>")

  val pageMetaSchema: StructType = StructType.fromDDL(
    "totalResults BIGINT, resultsPerPage BIGINT, startIndex BIGINT")

  /** S1's pagination plan (`providers/nvd/api.py:122-147`): given the
    * first page's totalResults/resultsPerPage, every remaining
    * startIndex the loop would request — including the reference's
    * trailing empty page when totalResults divides evenly (pages =
    * total // per_page, offsets per_page·1 … per_page·pages). The
    * decision logic lives here; the driver executes the requests
    * through [[graft.sources.StagedFetch]]. */
  def remainingPageOffsets(totalResults: Long, resultsPerPage: Long): Seq[Long] =
    if (totalResults <= 0 || resultsPerPage <= 0) Seq.empty
    else (1L to totalResults / resultsPerPage).map(_ * resultsPerPage)

  /** [[remainingPageOffsets]] from a staged first-page document. */
  def remainingPageOffsets(spark: SparkSession, path: String): Seq[Long] = {
    val r = spark.read.option("multiLine", "true").schema(pageMetaSchema)
      .json(path).select("totalResults", "resultsPerPage").head()
    def l(i: Int) = if (r.isNullAt(i)) 0L else r.getLong(i)
    remainingPageOffsets(l(0), l(1))
  }

  /** One row per CVE from an API page document. */
  def cves(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "true").schema(pageSchema).json(path)
      .select(explode(col("vulnerabilities")).as("v"))
      .select(col("v.cve.id").as("id"),
        col("v.cve.lastModified").as("last_modified"),
        col("v.cve.configurations").as("configurations"),
        col("v.cve.references").as("references"))

  /** Passthrough result envelopes: identifier `<year>/cve-…` (lowered,
    * the reference's hierarchical storage id, `providers/nvd/manager
    * .py:398-405`); payload is the page's whole `{"cve": record}`
    * wrapper object exactly as written by `manager.py:249`. Read
    * SCHEMA-LESS on purpose: [[pageSchema]] projects the six fields
    * the relational operators need, but a passthrough must carry
    * every field the record has (metrics, weaknesses, published, …) —
    * inference keeps them all. */
  def envelopes(spark: SparkSession, path: String): DataFrame =
    envelopes(spark, path, None)

  /** Passthrough envelopes with the optional fix-date enrichment
    * (`manager.py:341-394` `_apply_fix_dates`): every VULNERABLE
    * cpeMatch carrying a `versionEndExcluding` looks up
    * `(cve, criteria, fix version)` in the first-observed dimension
    * `(vuln, cpe, version, date, kind)` and, when dated, gains the
    * structured `fix: {version, date, kind}` object in place.
    *
    * Spark-first: the reference mutates each record's dict walk-style;
    * here the (cpos, npos, mpos) explode feeds one broadcast join, the
    * verdicts fold back to a tiny per-record position map, and the
    * record struct is rebuilt with nested `transform`/`withField` —
    * all sibling fields of the inferred schema survive, and the only
    * shuffle is the per-record map fold. */
  def envelopes(spark: SparkSession, path: String,
      fixdates: Option[DataFrame]): DataFrame = {
    val raw = spark.read.option("multiLine", "true").json(path)
      .select(explode(col("vulnerabilities")).as("v"))
      .select(col("v.cve").as("cve"))
    val hasConfigs = raw.select("cve.*").columns.contains("configurations")
    val patched = fixdates match {
      case None => raw
      case Some(_) if !hasConfigs => raw
      case Some(fd) =>
        val dim = broadcast(fd
          .groupBy(col("vuln").as("fd_v"), col("cpe").as("fd_c"),
            col("version").as("fd_ver"))
          .agg(min(struct(col("date"), col("kind"))).as("b"))
          .select(col("fd_v"), col("fd_c"), col("fd_ver"),
            col("b.date").as("fd_date"), col("b.kind").as("fd_kind")))
        // 1e6 stride per level: a config with up to a million nodes or
        // a node with a million cpeMatches keys uniquely (a pathological
        // record beyond that would collide, but NVD configs carry tens)
        def key(c: org.apache.spark.sql.Column,
            n: org.apache.spark.sql.Column,
            m: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
          c.cast("long") * 1000000000000L + n.cast("long") * 1000000L + m
        val matches = raw
          .select(col("cve.id").as("id"),
            posexplode(col("cve.configurations")).as(Seq("cpos", "c")))
          .select(col("id"), col("cpos"),
            posexplode(col("c.nodes")).as(Seq("npos", "n")))
          .select(col("id"), col("cpos"), col("npos"),
            posexplode(col("n.cpeMatch")).as(Seq("mpos", "m")))
          .filter(col("m.vulnerable") &&
            col("m.versionEndExcluding").isNotNull &&
            startswith(col("m.criteria"), lit("cpe:")))
          .select(col("id"), col("cpos"), col("npos"), col("mpos"),
            col("m.criteria").as("cpe"),
            col("m.versionEndExcluding").as("fixver"))
        val fixmap = matches
          .join(dim, col("id") === col("fd_v") && col("cpe") === col("fd_c")
            && col("fixver") === col("fd_ver"), "inner")
          // re-staged pages can carry one CVE twice (overlapping
          // lastModified windows): collapse per position key first, or
          // map_from_entries throws on the duplicate
          .groupBy(col("id"),
            key(col("cpos"), col("npos"), col("mpos").cast("long"))
              .as("key"))
          .agg(min(struct(col("fd_ver").as("version"),
            col("fd_date").as("date"),
            col("fd_kind").as("kind"))).as("value"))
          .groupBy("id")
          .agg(map_from_entries(collect_list(struct(
            col("key"), col("value")))).as("fixmap"))
        // the withField chain applies unconditionally so both map-hit
        // and miss rows share one struct type; a missing entry yields a
        // null fix, dropped by canonical serialization
        raw.join(fixmap, col("cve.id") === fixmap("id"), "left").drop("id")
          .withColumn("cve", col("cve").withField("configurations",
            transform(col("cve.configurations"), (c, ci) =>
              c.withField("nodes", transform(c.getField("nodes"),
                (n, ni) => n.withField("cpeMatch",
                  transform(n.getField("cpeMatch"), (m, mi) =>
                    m.withField("fix", element_at(col("fixmap"),
                      key(ci, ni, mi.cast("long")))))))))))
          .drop("fixmap")
    }
    patched.select(graft.Envelope.assemble(
      lower(concat(split(col("cve.id"), "-").getItem(1), lit("/"),
        col("cve.id"))),
      graft.Envelope.NvdSchema,
      struct(col("cve").as("cve"))): _*)
  }

  /** The full `run nvd` composition from NOTHING but a transport: walk
    * every API page through the retry envelope
    * ([[graft.sources.FetchLoop.nvdWalk]]), parse the staged pages as
    * one distributed read, assemble passthrough envelopes, and commit
    * them to the checksummed result store — the reference's
    * `vunnel run nvd` end-to-end (`providers/nvd/__init__.py` +
    * `manager.py:220-254`), with HTTP injected so the engine itself
    * stays I/O-free. Returns (result count, store digest). */
  def run(spark: SparkSession, baseUrl: String,
      stageDir: java.nio.file.Path, storeRoot: String,
      transport: graft.sources.StagedFetch.Transport,
      cfg: graft.sources.StagedFetch.Config = graft.sources.StagedFetch.Config(),
      sleeper: Double => Unit = s => Thread.sleep((s * 1000).toLong))
      : (Long, String) = {
    graft.sources.FetchLoop.nvdWalk(spark, baseUrl, stageDir, transport,
      cfg, sleeper)
    graft.sources.FetchLoop.commitRun(spark,
      envelopes(spark, s"$stageDir/*.json"), storeRoot, "nvd")
  }

  /** J2: override join — override's configurations REPLACE the record's;
    * references are unioned BY URL (first occurrence wins, original
    * order preserved then override-only urls appended) —
    * `manager.py:304-339`. Overrides are a small dimension → broadcast. */
  def applyOverrides(cves: DataFrame, overrides: DataFrame): DataFrame = {
    val ov = overrides.select(
      col("id").as("ov_id"),
      col("configurations").as("ov_configurations"),
      col("references").as("ov_references"))
    cves.join(broadcast(ov), col("id") === col("ov_id"), "left")
      .select(
        col("id"), col("last_modified"),
        coalesce(col("ov_configurations"), col("configurations"))
          .as("configurations"),
        // union by url: originals, then override refs whose url is
        // new. A base record with NO references key (null array) takes
        // the override's refs whole — concat(null, …) would null the
        // output and LOSE them (manager.py:304-339 appends to a fresh
        // list)
        when(col("ov_references").isNotNull && col("references").isNull,
          col("ov_references"))
          .when(col("ov_references").isNotNull,
            concat(col("references"),
              filter(col("ov_references"),
                r => !array_contains(
                  transform(col("references"), o => o.getField("url")),
                  r.getField("url")))))
          .otherwise(col("references")).as("references"))
  }

  /** cpeMatch fix extraction: one row per (cve, criteria) where the match
    * is vulnerable AND carries versionEndExcluding — the fix version used
    * for the fixdate join (`manager.py:354-392`). */
  def cpeFixRows(cves: DataFrame): DataFrame =
    cves.select(col("id"), explode(col("configurations")).as("c"))
      .select(col("id"), explode(col("c.nodes")).as("n"))
      .select(col("id"), explode(col("n.cpeMatch")).as("m"))
      .filter(col("m.vulnerable") && col("m.versionEndExcluding").isNotNull)
      .select(col("id"), col("m.criteria").as("cpe"),
        col("m.versionEndExcluding").as("fix_version"))
}
