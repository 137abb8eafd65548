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
