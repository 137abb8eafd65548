package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sequence packing for training-data pipelines: assign documents, in a
  * deterministic key order, to consecutive fixed-token-budget bins
  * (`seq_id`) — the batching step before concatenate-and-truncate
  * tokenization. A document's bin is `floor(cum_tokens_before / budget)`
  * over the running token total, so bins are contiguous spans of the
  * key order and the assignment is exactly reproducible in SQL (the
  * DuckDB oracle replays the same window arithmetic).
  *
  * Scale: the naive formulation is a GLOBAL ordered window — one
  * partition, one task, dead at 100 TB. This is the standard two-phase
  * distributed prefix sum instead:
  *
  *   1. range-repartition by the key so partitions are ordered spans
  *      (the ONLY row-moving exchange), sort within partitions;
  *   2. per-partition token totals — map-side partial aggregation, so
  *      only |partitions| rows shuffle — prefix-summed driver-side into
  *      per-partition offsets;
  *   3. each partition folds its own running sum in one ordered pass
  *      (mapPartitions — a window partitioned by partition id would
  *      force a second full exchange, Catalyst can't see that range
  *      partitioning already co-locates it).
  *
  * The ranged input is localCheckpoint-materialized so the totals pass
  * and the fold see byte-identical partitions (range-bound sampling is
  * not stable across recomputed jobs) — which also means the corpus is
  * ranged once, not twice.
  */
object Pack {

  /** One row per input row: input columns + (cum_before, seq_id).
    * `budget` is the per-sequence token budget; `tokensCol` must be
    * integral. */
  def sequencePack(df: DataFrame, idCol: String, tokensCol: String,
      budget: Long, partitions: Int = 0): DataFrame = {
    require(budget > 0, "budget must be positive")
    val n = if (partitions > 0) partitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val prepped = df.withColumn(tokensCol, col(tokensCol).cast(LongType))
    // materialize the range partitioning ONCE, with the partition id
    // frozen INTO the data: the totals pass and the fold must agree on
    // partition identity, and neither task-partition-id nor
    // spark_partition_id is stable downstream — when a later plan
    // unions this frame (exceptAll, union) the fused stage renumbers
    // its partitions, shifting the second child's ids. A data column
    // written at checkpoint time is immune.
    val ranged = prepped.repartitionByRange(n, col(idCol))
      .sortWithinPartitions(col(idCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()

    // phase 2: per-partition totals — partial agg means |partitions|
    // rows through the shuffle; the driver scan is bounded by cluster
    // config, not data size
    val totals = ranged
      .groupBy(col("__pid")).agg(sum(col(tokensCol)).as("__t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offsets: Map[Int, Long] = totals.map { case (pid, t) =>
      val o = pid -> acc; acc += t; o
    }.toMap

    // phase 3: one ordered fold per partition, fully parallel; the
    // partition's offset comes from its rows' frozen __pid
    val outSchema = ranged.schema
      .add("cum_before", LongType, nullable = false)
      .add("seq_id", LongType, nullable = false)
    val tokIdx = ranged.schema.fieldIndex(tokensCol)
    val pidIdx = ranged.schema.fieldIndex("__pid")
    ranged.mapPartitions { it =>
      var cum = 0L
      var first = true
      it.map { r =>
        if (first) { cum = offsets.getOrElse(r.getInt(pidIdx), 0L); first = false }
        val before = cum
        cum += r.getLong(tokIdx)
        Row.fromSeq(r.toSeq :+ before :+ (before / budget))
      }
    }(RowEncoder.encoderFor(outSchema)).drop("__pid")
  }

  /** Per-sequence summary: (seq_id, n_docs, sum_tokens). */
  def sequenceStats(packed: DataFrame, tokensCol: String): DataFrame =
    packed.groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokensCol)).as("sum_tokens"))
}
