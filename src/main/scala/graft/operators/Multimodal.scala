package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed batch-wise per partition.
  *
  * The Spark-side machinery (schema, partition-parallel batch transform,
  * output shape) is real; the codec itself is a deterministic STUB —
  * media libraries aren't in this container. Swap `decodeStub` for an
  * actual decoder (JNI/FFI or subprocess) and nothing else changes: the
  * batch loop, schema contract, and partitioning are the production
  * shape (equivalent of a Pandas `mapInPandas` UDF, done Scala-side
  * with mapPartitions so each task amortizes codec init across its
  * whole partition — at 100 TB that init cost dominates if paid per row).
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),   // image|audio|video
    StructField("content", BinaryType, nullable = false),
    StructField("meta_width", IntegerType, nullable = true),
    StructField("meta_height", IntegerType, nullable = true)))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("feature", ArrayType(FloatType), nullable = false)))

  /** STUB decode/feature-extract: deterministic 8-dim "embedding" from
    * byte histogram moments. A real build replaces ONLY this function. */
  private[operators] def decodeStub(kind: String, content: Array[Byte]): Array[Float] = {
    val hist = new Array[Long](8)
    var i = 0
    while (i < content.length) { hist((content(i) & 0xFF) >> 5) += 1; i += 1 }
    val n = math.max(content.length, 1).toFloat
    hist.map(_ / n)
  }

  /** Synthesize a media table from the documents table (binary payloads
    * derived from text bytes — stands in for real image/audio blobs). */
  def syntheticMedia(spark: SparkSession, dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("content"),
      length(col("text")).cast("int").as("meta_width"),
      (col("n_chars") % 1080).cast("int").as("meta_height"))
  }

  /** Batch feature extraction over partitions: one codec "session" per
    * partition (the expensive-init amortization point), rows streamed
    * through it. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(featureSchema)
    media.select("media_id", "kind", "content").mapPartitions { it =>
      // real build: initialize decoder/codec ONCE here per partition
      it.map { r =>
        val content = r.getAs[Array[Byte]]("content")
        Row(r.getAs[Long]("media_id"), r.getAs[String]("kind"),
          content.length, decodeStub(r.getAs[String]("kind"), content))
      }
    }(enc)
  }

  /** Frame sampling (video → one row per fixed-size frame slice): the
    * explode happens BEFORE any decode, so per-frame work distributes
    * across the cluster instead of hiding inside one fat row. Pure
    * column ops — `substr` slices the binary payload directly. */
  def sampleFrames(media: DataFrame, frameBytes: Int = 1024): DataFrame = {
    val nFrames = greatest(
      ceil(length(col("content")) / lit(frameBytes.toDouble)).cast("int"),
      lit(1))
    media.filter(col("kind") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0), nFrames - 1)).as("frame_idx"),
        col("content"))
      .select(col("media_id"), col("frame_idx"),
        col("content")
          .substr(col("frame_idx") * frameBytes + 1, lit(frameBytes))
          .as("frame"))
  }

  /** STUB resize: deterministic byte-decimation to ≈`targetBytes` (a real
    * build decodes, scales, re-encodes in this partition loop — only this
    * body changes). Metadata columns are rewritten alongside the payload,
    * which is the actual Spark-side contract being exercised. */
  def resize(media: DataFrame, targetBytes: Int = 256): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaSchema)
    media.select("media_id", "kind", "content", "meta_width", "meta_height")
      .mapPartitions { it =>
        // real build: codec init once per partition
        it.map { r =>
          val content = r.getAs[Array[Byte]]("content")
          val step = math.max(content.length / targetBytes, 1)
          val out = Array.tabulate(
            math.min(targetBytes, content.length))(i => content(i * step))
          Row(r.getAs[Long]("media_id"), r.getAs[String]("kind"), out,
            Option(r.getAs[Integer]("meta_width"))
              .map(w => Integer.valueOf(w / step)).orNull,
            Option(r.getAs[Integer]("meta_height"))
              .map(h => Integer.valueOf(h / step)).orNull)
        }
      }(enc)
  }
}
