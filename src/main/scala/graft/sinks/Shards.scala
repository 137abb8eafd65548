package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-shard writer: the last mile of a curation pipeline — the
  * deterministically shuffled, token-packed, shard-partitioned layout
  * a trainer's data loader actually reads.
  *
  * Composition of audited pieces, no new distributed machinery:
  *   1. deterministic permutation key (the md5("id:seed") trick of
  *      [[graft.operators.Corpus.shuffleDeterministic]] — rerun-stable,
  *      layout-independent, a different seed is an independent epoch);
  *   2. [[graft.operators.Pack.sequencePack]] over that key: the
  *      two-phase distributed prefix sum assigns every document a
  *      consecutive token bin with ONE range exchange and a
  *      |partitions|-bounded driver scan;
  *   3. `partitionBy(shard)` parquet write, shard = bin / binsPerShard —
  *      dynamic partition overwrite semantics, so shards land as
  *      self-contained directories a loader can claim one at a time.
  *
  * At 100 TB every step is the scale shape already measured elsewhere:
  * the only corpus-moving exchange is the range partition of step 2
  * (the write inherits it — no extra shuffle), and shard sizes are
  * governed by token budget, not row counts, so skewed document
  * lengths cannot produce pathological shards.
  */
object Shards {

  /** Write `docs` as training shards under `outPath`; returns the
    * per-shard manifest (shard, n_docs, n_tokens), shard-ordered —
    * deterministic for a given (corpus, seed, budgets), provided ids
    * are unique (duplicate ids share a permutation key, and their
    * relative order is then layout-dependent). Null text packs as 0
    * tokens; null ids sort like the empty string. The write is a
    * STATIC overwrite (the whole tree is replaced even if the session
    * runs dynamic partition overwrite — a rerun producing fewer shards
    * must not leave stale shard dirs for a loader to train on). */
  def writeTrainingShards(docs: DataFrame, idCol: String, textCol: String,
      outPath: String, tokensPerBin: Long = 4096,
      binsPerShard: Long = 256, seed: Long = 0L): DataFrame = {
    require(tokensPerBin > 0 && binsPerShard > 0, "positive budgets")
    val keyed = docs
      .withColumn("__ord", graft.operators.Corpus.shuffleKey(
        col(idCol), seed))
      .withColumn("__tok", coalesce(
        graft.functions.Text.token_count(col(textCol)).cast("long"),
        lit(0L)))
    val packed = graft.operators.Pack
      .sequencePack(keyed, "__ord", "__tok", tokensPerBin)
      .withColumn("shard", floor(col("seq_id") / binsPerShard).cast("long"))
      .drop("__ord", "cum_before")
    packed.write.mode("overwrite")
      .option("partitionOverwriteMode", "static")
      .partitionBy("shard").parquet(outPath)
    // explicit schema: an all-filtered-out corpus writes zero data
    // files, where schema inference would throw instead of returning
    // an empty manifest (and it keeps `shard` long — partition-column
    // inference narrows shard=N dirs to int)
    manifestAgg(docs.sparkSession.read.schema(packed.schema)
      .parquet(outPath))
  }

  /** Per-shard manifest of a written shard tree: (shard, n_docs,
    * n_tokens, n_bins), shard-ordered. Reads only the written layout,
    * so it can audit any prior run. */
  def manifest(spark: SparkSession, outPath: String): DataFrame =
    manifestAgg(spark.read.parquet(outPath))

  private def manifestAgg(written: DataFrame): DataFrame =
    written
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__tok")).as("n_tokens"),
        countDistinct(col("seq_id")).as("n_bins"))
      .orderBy(col("shard"))
}
