package graft.sources

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** S4: the two-tier change-detection scan plan (vunnel rhel
  * `parser.py:149-209,319-346`): compare the API's minimal-summary list
  * against the cached minimal records and decide, per id, whether the
  * full record must be (re)fetched, can be skipped, or must be deleted.
  *
  * The reference walks files and diffs JSON per CVE in a thread pool;
  * here it is one full-outer join on the id with a content-hash
  * equality test (J10) plus the reconcile anti-joins (J11/T2) — a single
  * shuffle producing the fetch/delete/skip partition of the id space.
  */
object ChangeDetect {

  /** `api` and `cached` must share (idCol + the minimal content columns).
    * Returns one row per id with action ∈ fetch|skip|delete:
    *  - id only in api                       → fetch (new)
    *  - in both, content hash differs        → fetch (changed)
    *  - in both, content hash equal          → skip
    *  - id only in cache                     → delete (reconcile)
    */
  def plan(api: DataFrame, cached: DataFrame, idCol: String): DataFrame = {
    val contentCols = api.columns.filter(_ != idCol).sorted
    require(contentCols.sameElements(cached.columns.filter(_ != idCol).sorted),
      "api and cached must share minimal-record columns")
    def hashed(df: DataFrame, side: String) = df.select(
      col(idCol).as(s"${side}_id"),
      xxhash64(contentCols.toIndexedSeq.map(col): _*).as(s"${side}_hash"))
    hashed(api, "api")
      .join(hashed(cached, "cache"),
        col("api_id") === col("cache_id"), "full_outer")
      .select(
        coalesce(col("api_id"), col("cache_id")).as(idCol),
        when(col("cache_id").isNull, "fetch")
          .when(col("api_id").isNull, "delete")
          .when(col("api_hash") =!= col("cache_hash"), "fetch")
          .otherwise("skip").as("action"))
  }
}
