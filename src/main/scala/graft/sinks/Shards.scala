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
    * deterministic for a given (corpus, seed, budgets). */
  def writeTrainingShards(docs: DataFrame, idCol: String, textCol: String,
      outPath: String, tokensPerBin: Long = 4096,
      binsPerShard: Long = 256, seed: Long = 0L): DataFrame = {
    require(tokensPerBin > 0 && binsPerShard > 0, "positive budgets")
    val keyed = docs
      .withColumn("__ord", md5(concat_ws(":",
        col(idCol).cast("string"), lit(seed.toString))))
      .withColumn("__tok",
        graft.functions.Text.token_count(col(textCol)).cast("long"))
    val packed = graft.operators.Pack
      .sequencePack(keyed, "__ord", "__tok", tokensPerBin)
      .withColumn("shard", floor(col("seq_id") / binsPerShard).cast("long"))
      .drop("__ord", "cum_before")
    packed.write.mode("overwrite").partitionBy("shard").parquet(outPath)
    manifest(docs.sparkSession, outPath)
  }

  /** Per-shard manifest of a written shard tree: (shard, n_docs,
    * n_tokens, n_bins), shard-ordered. Reads only the written layout,
    * so it can audit any prior run. */
  def manifest(spark: SparkSession, outPath: String): DataFrame =
    spark.read.parquet(outPath)
      // partition-column type inference narrows shard=N dirs to int
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__tok")).as("n_tokens"),
        countDistinct(col("seq_id")).as("n_bins"))
      .orderBy(col("shard"))
}
