package graft

import org.apache.spark.sql.SparkSession

/** The engine's performance-critical session configs, in ONE place.
  *
  * These are engine semantics-of-performance, not harness tuning: a
  * session missing them silently degrades the physical plans the
  * operators were built against (r16 shipped them scattered across
  * Bench/Verify/StageProfile, so a production `Cli` session got
  * neither — the ObjectHashAggregate work fell back to sort-based
  * aggregation at 128 distinct keys there). Every graft entry point
  * (Bench, Verify, Cli, StageProfile, ExplainDump, the test session)
  * routes its builder through [[tuned]]; EngineConfSpec pins the set
  * and asserts a [[tuned]]-built session reports each value.
  */
object EngineConf {

  /** The config set, env-overridable where a cluster profile needs a
    * different value. Values are LOCAL-MODE defaults chosen to also be
    * correct at scale — see each entry's note. */
  def settings: Seq[(String, String)] = Seq(
    // ObjectHashAggregate (every TypedImperativeAggregate: top_k_agg,
    // rpm_stream_reduce, cms_topk, obj_min_by/obj_max_by) falls back
    // to SORT-based aggregation after 128 distinct keys per partition
    // by default — a full per-partition sort for any real group
    // count. 4M keys keeps the hash path; the buffers here are small
    // bounded objects, so the memory cost is the key map itself.
    "spark.sql.objectHashAggregate.sortBased.fallbackThreshold" ->
      sys.env.getOrElse("SPARK_GRAFT_OBJ_HASH_FALLBACK",
        (1 << 22).toString),
    // AQE's coalesce FLOOR, not its target: the default 1 MB floor
    // collapses any post-shuffle stage under ~1 MB×cores to ONE task,
    // which single-threads compute-heavy small-data stages (LSH
    // candidate expansion, dHash banding — measured 0.6-0.8 s
    // single-task stages at sf0.1). 64k keeps those parallel while
    // remaining irrelevant at production shuffle sizes, where the
    // 64 MB advisory target and parallelismFirst govern.
    "spark.sql.adaptive.coalescePartitions.minPartitionSize" ->
      sys.env.getOrElse("SPARK_GRAFT_AQE_MIN_PARTITION", "64k"),
    // Cross-engine determinism (oracle compares assume UTC).
    "spark.sql.session.timeZone" -> "UTC",
  ) ++ extraConf

  /** Free-form overrides for cluster profiles and local experiments:
    * `SPARK_GRAFT_EXTRA_CONF="k=v;k2=v2"`. Applied last, so they win
    * over the defaults above. */
  private def extraConf: Seq[(String, String)] =
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").toSeq
      .flatMap(_.split(";").toSeq)
      .map(_.trim).filter(_.contains("="))
      .map { kv =>
        val i = kv.indexOf('=')
        kv.substring(0, i).trim -> kv.substring(i + 1).trim
      }

  /** Apply [[settings]] to a session builder. */
  def tuned(b: SparkSession.Builder): SparkSession.Builder =
    settings.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }
}
