package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Embeddings

/** Value pins for the embedding-centroid operators (q_embed_centroid's
  * DuckDB oracle checks the full surface; these pin the Aggregator's
  * reduce/merge arithmetic on hand-computable vectors and partitions). */
class EmbeddingsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("vector mean aggregator: hand-computed centroid per group") {
    val df = Seq(
      (0, Seq(1.0f, 0.0f)), (0, Seq(0.0f, 1.0f)),
      (1, Seq(2.0f, 2.0f))
    ).toDF("label", "embedding")
    val out = Embeddings.centroids(df, "label", "embedding")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(out(0) == Seq(0.5, 0.5))
    assert(out(1) == Seq(2.0, 2.0))
  }

  test("merge across many partitions equals single-partition result") {
    val vecs = (1 to 257).map(i => (i % 3, Seq(i.toFloat, (2 * i).toFloat)))
    val one = Embeddings.centroids(
      vecs.toDF("label", "embedding").coalesce(1), "label", "embedding")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val many = Embeddings.centroids(
      vecs.toDF("label", "embedding").repartition(13), "label", "embedding")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    for (l <- 0 to 2)
      (one(l), many(l)).zipped.foreach((a, b) =>
        assert(math.abs(a - b) < 1e-9, s"label $l drifted"))
  }

  test("null vectors are skipped, not poisoning the group") {
    val df = Seq(
      (0, Option(Seq(4.0f, 0.0f))), (0, Option.empty[Seq[Float]])
    ).toDF("label", "embedding")
    val out = Embeddings.centroids(df, "label", "embedding")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(out(0) == Seq(4.0, 0.0))
  }

  test("centroid similarity: member of a tight cluster scores near 1") {
    val df = Seq(
      (1L, 0, Seq(1.0f, 0.01f)), (2L, 0, Seq(1.0f, -0.01f)),
      (3L, 1, Seq(0.0f, 1.0f))
    ).toDF("vec_id", "label", "embedding")
    val sims = Embeddings.centroidSims(df, "label", "embedding")
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Double]("centroid_sim")).toMap
    assert(sims(1L) > 0.999 && sims(2L) > 0.999)
    assert(sims(3L) > 0.999999) // singleton cluster: centroid = itself
  }

  test("int8 quantize: codes bounded, roundtrip cosine ≥ 0.9999") {
    import org.apache.spark.sql.functions._
    val em = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = Embeddings.quantize(em, "embedding")
    val checked = q.select(
      graft.operators.Similarity.cosine(
        Embeddings.dequantize(col("qvec"), col("scale"))
          .cast("array<double>"),
        col("embedding").cast("array<double>")).as("rt"),
      array_max(transform(col("qvec"), x => abs(x.cast("int")))).as("mx"))
      .agg(min(col("rt")), max(col("mx")), count(lit(1))).head()
    assert(checked.getDouble(0) >= 0.9999,
      s"worst roundtrip cosine ${checked.getDouble(0)}")
    assert(checked.getInt(1) <= 127) // int8 range, scale saturates at max
    assert(checked.getLong(2) == 500L)
  }

  test("int8 quantize: zero vector survives via the scale guard") {
    val df = Seq((1L, Seq(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val r = Embeddings.quantize(df, "embedding").head()
    assert(r.getAs[Double]("scale") == 1.0)
    assert(r.getSeq[Byte](r.fieldIndex("qvec")).toList == List(0, 0, 0))
  }
}
