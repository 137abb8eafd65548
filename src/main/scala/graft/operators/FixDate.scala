package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fix-date resolution (J1+W2, vunnel `tool/fixdate/finder.py:137-203`):
  * pick the best fix date for (vuln_id, package, fix_version) from
  * quality-ranked candidate sources.
  *
  * The reference does LRU-cached SQLite point lookups per record; here
  * the fixdate database is a broadcast dimension and `best` is a pure
  * column computation over the joined candidate array — no per-row I/O,
  * no cache, fully distributed (SURVEY J1's "broadcast left join +
  * rank-sort resolution").
  *
  * Candidate ranks (lower = better, mirroring result-list order):
  *   0 accurate caller candidates → 1 strategy results →
  *   2 inaccurate caller candidates → 3 first-observed (fallback only).
  *
  * Selection rule (finder.py:170-202): when an ACCURATE first-observed
  * date exists, candidates dated after it are discarded; if none survive,
  * the first-observed date itself wins. Without an accurate
  * first-observed, first-observed dates join the pool as last resort.
  */
object FixDate {

  /** Candidate struct builder: (rank, date 'YYYY-MM-DD', kind). */
  def candidate(rank: Column, date: Column, kind: Column): Column =
    struct(rank.cast("int").as("rank"), date.as("date"), kind.as("kind"))

  /** Resolve best date from an array<struct<rank,date,kind>> column and
    * an optional accurate first-observed date column.
    * Returns struct<date,kind> or null. `fixVersion` gates the sentinel
    * rule: "None"/"0"/null versions never resolve (finder.py:150-152). */
  def best(candidates: Column, accurateFirstObserved: Column,
      fixVersion: Column): Column = {
    val sorted = array_sort(filter(candidates, c => c.getField("date").isNotNull))
    val eligible = when(accurateFirstObserved.isNotNull,
      filter(sorted, c => c.getField("date") <= accurateFirstObserved))
      .otherwise(sorted)
    val pick = try_element_at(eligible, lit(1))
    val resolved = when(pick.isNotNull,
      struct(pick.getField("date").as("date"), pick.getField("kind").as("kind")))
      .when(accurateFirstObserved.isNotNull,
        struct(accurateFirstObserved.as("date"),
          lit("first-observed").as("kind")))
      .otherwise(lit(null).cast("struct<date:string,kind:string>"))
    when(fixVersion.isNull || fixVersion.isin("None", "0"),
      lit(null).cast("struct<date:string,kind:string>"))
      .otherwise(resolved)
  }

  /** Attach first-observed Available columns from a curated fix-date
    * dimension `(vuln, pkg[, ecosystem], version, date, kind)`:
    * broadcast (the dimension is curated metadata, never corpus-scale)
    * left-outer join on the caller's key columns, adding
    * `available_date` / `available_kind` (null when unmatched). The
    * sentinel rule — fix versions "", "0", "None" and null never
    * resolve a date (`fixdate/finder.py:149-151`) — lives HERE so the
    * provider call sites (secdb, echo, ghsa, sles) cannot drift. */
  def available(rows: DataFrame, fixdates: Option[DataFrame],
      vuln: Column, pkg: Column, version: Column,
      ecosystem: Option[Column] = None): DataFrame = fixdates match {
    case None =>
      rows.withColumn("available_date", lit(null).cast("string"))
        .withColumn("available_kind", lit(null).cast("string"))
    case Some(fd) =>
      // ONE dimension row per key (the reference's best() returns a
      // single result): earliest date wins, kind rides the tie-break —
      // a doubled store row would otherwise duplicate FixedIn entries
      // after the caller's collect_list
      val keyCols = Seq(col("vuln").as("__fd_v"), col("pkg").as("__fd_p"),
        col("version").as("__fd_ver")) ++
        ecosystem.map(_ => col("ecosystem").as("__fd_e"))
      val dim = fd
        .groupBy(keyCols: _*)
        .agg(graft.plans.ArgExtremumAgg
          .obj_min(struct(col("date"), col("kind"))).as("__best"))
        .withColumn("available_date", col("__best.date"))
        .withColumn("available_kind", col("__best.kind"))
        .drop("__best")
      val base = vuln === col("__fd_v") && pkg === col("__fd_p") &&
        version === col("__fd_ver") &&
        !coalesce(version, lit("")).isin("", "0", "None")
      val cond = ecosystem
        .map(e => base && e === col("__fd_e")).getOrElse(base)
      rows.join(broadcast(dim), cond, "left_outer")
        .drop("__fd_v", "__fd_p", "__fd_ver", "__fd_e")
  }

  /** Full enrichment join: left-broadcast-join `rows` (keyed by vuln_id,
    * pkg, fix_version) against the fixdate dimension and resolve.
    * Dimension columns: (vuln_id, pkg, fix_version, date, kind, rank,
    * accurate_first_observed). */
  def enrich(rows: DataFrame, fixdates: DataFrame,
      vulnCol: String = "vuln_id", pkgCol: String = "pkg",
      verCol: String = "fix_version"): DataFrame = {
    val dim = fixdates.groupBy(col(vulnCol), col(pkgCol), col(verCol))
      .agg(
        collect_list(candidate(col("rank"), col("date"), col("kind")))
          .as("__cands"),
        max(col("accurate_first_observed")).as("__afo"))
    rows.join(broadcast(dim), Seq(vulnCol, pkgCol, verCol), "left")
      .withColumn("available",
        best(coalesce(col("__cands"),
          array().cast("array<struct<rank:int,date:string,kind:string>>")),
          col("__afo"), col(verCol)))
      .drop("__cands", "__afo")
  }
}
