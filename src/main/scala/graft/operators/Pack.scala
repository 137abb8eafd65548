package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
  *   1. range-repartition by the key so partitions are ordered spans;
  *   2. per-partition token totals — a tiny aggregate, collected
  *      driver-side (|partitions| longs, the legitimate bounded
  *      collect) and prefix-summed into per-partition offsets;
  *   3. each partition computes its LOCAL running sum in parallel
  *      (window partitioned by partition id) and adds its offset.
  *
  * Every row moves once (the range exchange); the only serial work is
  * the |partitions|-length scan on the driver.
  */
object Pack {

  /** One row per input row: (idCol, tokensCol..., seq_id, cum_before).
    * `budget` is the per-sequence token budget. */
  def sequencePack(df: DataFrame, idCol: String, tokensCol: String,
      budget: Long, partitions: Int = 0): DataFrame = {
    val n = if (partitions > 0) partitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = df.repartitionByRange(n, col(idCol))
      .withColumn("__pid", spark_partition_id())

    // phase 2: per-partition totals → driver prefix sum → offset map.
    // |partitions| rows — bounded by cluster config, not data size.
    val totals = ranged.groupBy(col("__pid"))
      .agg(sum(col(tokensCol)).as("__t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offsets = totals.map { case (pid, t) =>
      val o = pid -> acc; acc += t; o
    }
    val offsetCol = offsets.foldLeft(lit(0L)) { case (e, (pid, off)) =>
      when(col("__pid") === pid, lit(off)).otherwise(e)
    }

    // phase 3: local running sums in parallel, one window per partition
    val w = Window.partitionBy(col("__pid")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged
      .withColumn("cum_before",
        coalesce(sum(col(tokensCol)).over(w), lit(0L)) + offsetCol)
      .withColumn("seq_id", floor(col("cum_before") / budget))
      .drop("__pid")
  }

  /** Per-sequence summary: (seq_id, n_docs, sum_tokens). */
  def sequenceStats(packed: DataFrame, tokensCol: String): DataFrame =
    packed.groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokensCol)).as("sum_tokens"))
}
