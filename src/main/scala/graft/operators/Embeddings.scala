package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Embedding-column aggregation operators for training-data pipelines:
  * per-group centroids and centroid-similarity (outlier) scoring.
  *
  * Scale design:
  *  - the centroid is a typed [[Aggregator]] whose buffer is one
  *    (sum[dims], count) pair — map-side partial aggregation means each
  *    executor contributes ONE 8·dims-byte row per group to the shuffle,
  *    never the vectors themselves. 100 TB of embeddings with k groups
  *    shuffles k·partitions tiny rows.
  *  - scoring joins the finished centroids back by group key; group
  *    cardinality is assumed small (labels, sources, clusters), so the
  *    join is a broadcast and the corpus never shuffles.
  *  - sums are doubles regardless of the (usually float) storage type:
  *    summing a 100M-row group in float32 loses ~3 decimal digits to
  *    accumulated rounding; the extra 4 bytes/dim only exist in the
  *    aggregation buffer, not in storage.
  */
object Embeddings {

  /** (sum per dimension, element count) running buffer. */
  final case class VecAcc(sum: Array[Double], n: Long)

  /** Typed mean-vector Aggregator over float-array embeddings.
    * Null/empty-safe: null inputs are skipped; groups with no non-null
    * vector yield an empty array. */
  val meanAggregator: Aggregator[Seq[Float], VecAcc, Seq[Double]] =
    new Aggregator[Seq[Float], VecAcc, Seq[Double]] {
      override def zero: VecAcc = VecAcc(Array.emptyDoubleArray, 0L)
      private def add(acc: VecAcc, v: Seq[Float]): VecAcc =
        if (v == null) acc
        else if (acc.n == 0L) {
          val s = new Array[Double](v.length)
          var i = 0
          while (i < v.length) { s(i) = v(i).toDouble; i += 1 }
          VecAcc(s, 1L)
        } else {
          require(v.length == acc.sum.length,
            s"embedding length drift: ${v.length} vs ${acc.sum.length}")
          var i = 0
          while (i < v.length) { acc.sum(i) += v(i).toDouble; i += 1 }
          VecAcc(acc.sum, acc.n + 1L)
        }
      override def reduce(acc: VecAcc, v: Seq[Float]): VecAcc = add(acc, v)
      override def merge(a: VecAcc, b: VecAcc): VecAcc =
        if (a.n == 0L) b
        else if (b.n == 0L) a
        else {
          require(a.sum.length == b.sum.length,
            s"embedding length drift: ${b.sum.length} vs ${a.sum.length}")
          var i = 0
          while (i < a.sum.length) { a.sum(i) += b.sum(i); i += 1 }
          VecAcc(a.sum, a.n + b.n)
        }
      override def finish(acc: VecAcc): Seq[Double] =
        if (acc.n == 0L) Seq.empty
        else acc.sum.map(_ / acc.n).toSeq
      override def bufferEncoder: Encoder[VecAcc] = Encoders.product[VecAcc]
      override def outputEncoder: Encoder[Seq[Double]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
    }

  /** The mean aggregator as an untyped column function. */
  def vector_mean: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(meanAggregator)

  /** Per-group mean embedding: (groupCol, centroid array<double>). */
  def centroids(df: DataFrame, groupCol: String, vecCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(vector_mean(col(vecCol)).as("centroid"))

  /** Symmetric int8 quantization of an embedding column — the standard
    * 4-bytes-per-dim → 1 storage/IO reduction for 100 TB embedding
    * tables (cosine after dequantization degrades < 1e-3 at 64-256
    * dims; spec-pinned). Per-vector scale = max|v| / 127; elements are
    * `floor(v / scale + 0.5)` — written as floor(+0.5), not round(),
    * because Java and DuckDB disagree on round-half of NEGATIVE values
    * (Math.round(-2.5) = -2, DuckDB -3) and the oracle replays this
    * arithmetic exactly. Zero vectors quantize to zeros (scale 1 guard).
    * Pure projection — quantization is a scan, no shuffle. */
  def quantize(df: DataFrame, vecCol: String,
      qCol: String = "qvec", scaleCol: String = "scale"): DataFrame = {
    val maxAbs = array_max(transform(col(vecCol), x => abs(x)))
      .cast("double")
    val scale = when(maxAbs === 0.0 || maxAbs.isNull, lit(1.0))
      .otherwise(maxAbs / 127.0)
    df.withColumn(scaleCol, scale)
      .withColumn(qCol,
        transform(col(vecCol), x =>
          floor(x.cast("double") / col(scaleCol) + 0.5).cast("tinyint")))
  }

  /** Inverse of [[quantize]]: q · scale as array<float>. */
  def dequantize(qCol: Column, scaleCol: Column): Column =
    transform(qCol, b => (b.cast("double") * scaleCol).cast("float"))

  /** Cosine similarity of every vector to its own group's centroid —
    * the outlier-scoring primitive of semantic-cluster cleaning (low
    * similarity = candidate mislabel/noise). Centroids broadcast; the
    * corpus is scored in place with zero vector shuffle. */
  def centroidSims(df: DataFrame, groupCol: String, vecCol: String)
      : DataFrame =
    df.join(broadcast(centroids(df, groupCol, vecCol)), groupCol)
      .withColumn("centroid_sim",
        Similarity.cosine(col(vecCol).cast("array<double>"), col("centroid")))
}
