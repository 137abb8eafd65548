package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
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

  /** The shared two-phase distributed prefix sum behind
    * [[sequencePack]] and [[Corpus.shuffleWithPositions]]: append to
    * each row the running total of `weightCol` (or of 1 when None —
    * i.e. the 0-based global row position) over the `key` order, as
    * `outCol`.
    *
    * Protocol (every subtlety lives HERE, once):
    *  - range-repartition by `key` so partitions are ordered spans
    *    (the ONLY row-moving exchange), sort within partitions;
    *  - freeze partition identity INTO the data and localCheckpoint:
    *    range split points are sampled per job, so the totals pass and
    *    the fold must see byte-identical partitions — and neither
    *    task-partition-id nor spark_partition_id is stable downstream
    *    (a later union/exceptAll fuses stages and renumbers). The
    *    checkpoint deliberately trades fault tolerance for
    *    fail-loudness: lineage recompute through a RE-sampled range
    *    exchange would silently mis-sum; at cluster scale a reliable
    *    checkpoint dir is the escape hatch if the query outlives
    *    executor churn.
    *  - per-partition totals: map-side partial aggregation, so only
    *    |partitions| rows shuffle, and the driver collect is bounded
    *    by cluster config, not data size;
    *  - one ordered fold per partition, fully parallel (a window
    *    partitioned by partition id would force a second full
    *    exchange — Catalyst can't see the range partitioning already
    *    co-locates it).
    *
    * `dropBeforeFold`: columns (e.g. a wide synthetic sort key) are
    * projected away AFTER the checkpoint but BEFORE the object
    * round-trip — a narrow map over checkpointed partitions preserves
    * identity and order, and the ser/deser then pays for data columns
    * only. */
  private[operators] def cumBefore(df: DataFrame, key: Column,
      partitions: Int, weightCol: Option[String],
      dropBeforeFold: Seq[String] = Nil,
      outCol: String = "cum_before"): DataFrame = {
    require(!df.columns.contains("__pid") && !df.columns.contains(outCol),
      s"cumBefore: input must not carry __pid or the output column " +
        s"'$outCol'")
    val n = if (partitions > 0) partitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = df.repartitionByRange(n, key)
      .sortWithinPartitions(key)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val weightAgg = weightCol.map(c => sum(col(c)))
      .getOrElse(count(lit(1))).as("__t")
    val totals = ranged
      .groupBy(col("__pid")).agg(weightAgg)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offsets: Map[Int, Long] = totals.map { case (pid, t) =>
      val o = pid -> acc; acc += t; o
    }.toMap
    val slim = ranged.drop(dropBeforeFold: _*)
    val outSchema = slim.schema.add(outCol, LongType, nullable = false)
    // hoist the Option out of the per-row loop: an Option.map +
    // boxed-Long per row is real allocation pressure in the one
    // ordered fold this operator exists to keep cheap
    val wIdx = weightCol.map(slim.schema.fieldIndex).getOrElse(-1)
    val pidIdx = slim.schema.fieldIndex("__pid")
    slim.mapPartitions { it =>
      var cum = 0L
      var first = true
      it.map { r =>
        if (first) { cum = offsets.getOrElse(r.getInt(pidIdx), 0L); first = false }
        val before = cum
        // a null weight would NPE deep in the fold (and the driver
        // totals above would have skipped it via sum()) — name the
        // contract instead of crashing obscurely mid-task
        if (wIdx >= 0 && r.isNullAt(wIdx)) throw new IllegalArgumentException(
          s"cumBefore: null weight in '${weightCol.get}' — the weight " +
            "column must be non-null (coalesce upstream)")
        cum += (if (wIdx >= 0) r.getLong(wIdx) else 1L)
        Row.fromSeq(r.toSeq :+ before)
      }
    }(RowEncoder.encoderFor(outSchema)).drop("__pid")
  }

  /** One row per input row: input columns + (cum_before, seq_id).
    * `budget` is the per-sequence token budget; `tokensCol` must be
    * integral. */
  def sequencePack(df: DataFrame, idCol: String, tokensCol: String,
      budget: Long, partitions: Int = 0): DataFrame = {
    require(budget > 0, "budget must be positive")
    val prepped = df.withColumn(tokensCol, col(tokensCol).cast(LongType))
    cumBefore(prepped, col(idCol), partitions, Some(tokensCol))
      // `div`: exact long integer division (a double round-trip via
      // floor() would wobble past 2^53 cumulative tokens)
      .withColumn("seq_id", expr(s"cum_before div ${budget}L"))
  }

  /** Per-sequence summary: (seq_id, n_docs, sum_tokens). */
  def sequenceStats(packed: DataFrame, tokensCol: String): DataFrame =
    packed.groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokensCol)).as("sum_tokens"))
}
