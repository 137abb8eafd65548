package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{Norm, Text}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full SURVEY §2 operator inventory expressed over the
  * driver's test tables; `oracleSql` carries the DuckDB-equivalent SQL for
  * every SQL-expressible entry (hash-compared at sf0.01).
  */
object SparkEntry {

  /** Flagship: the vunnel §7.2 minimum vertical slice re-shaped onto the
    * documents table — scan → explode (secdb secfixes shape) → filter →
    * group-merge (A1) → envelope struct assembly → canonical JSON — the
    * full provider pipeline in one plan.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val mentions = docs.select(
      col("source").as("namespace"),
      col("doc_id"),
      explode(split(trim(col("text")), "\\s+")).as("token"))
      .filter(length(col("token")) > 3)
    mentions
      .groupBy(col("namespace"), col("token"))
      .agg(
        sort_array(collect_set(col("doc_id"))).as("doc_ids"),
        count(lit(1)).as("n_mentions"))
      .select(
        concat(col("namespace"), lit("/"), col("token")).as("identifier"),
        lit("https://example.invalid/graft/mention/schema-1.0.0.json")
          .as("schema"),
        to_json(struct(col("namespace"), col("token"), col("doc_ids"),
          col("n_mentions"))).as("item"))
  }

  private val registry: Seq[(String, Q.Entry)] =
    QueriesRelational.entries ++ QueriesPipeline.entries ++
      QueriesDomain.entries

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (name, e) => name -> e.fn }.toMap

  /** DuckDB-equivalent ANSI SQL per query (omitted → rows-only check). */
  def oracleSql: Map[String, String] =
    registry.collect { case (name, Q.Entry(_, Some(sql))) => name -> sql }.toMap
}
