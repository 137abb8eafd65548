package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed batch-wise per partition.
  *
  * The Spark-side machinery (schema, partition-parallel batch transform,
  * output shape) is real everywhere. The IMAGE codec is also real: the
  * JDK's built-in `javax.imageio` decodes PNG/JPEG/BMP/GIF with no
  * external dependency, so [[decodeImage]] / [[resizeImages]] do actual
  * raster decode, feature extraction, scaling and PNG re-encode. Audio
  * and video stay behind the deterministic [[decodeStub]] — the JDK
  * ships no audio/video codecs, and this container has no FFI ones;
  * swap only that function when one exists. Either way the batch loop,
  * schema contract, and partitioning are the production shape
  * (equivalent of a Pandas `mapInPandas` UDF, done Scala-side with
  * mapPartitions so each task amortizes codec init across its whole
  * partition — at 100 TB that init cost dominates if paid per row).
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

  /** STUB decode/feature-extract for kinds the JDK can't decode
    * (audio/video): deterministic 8-dim "embedding" from byte histogram
    * moments. A real build replaces ONLY this function. */
  private[operators] def decodeStub(kind: String, content: Array[Byte]): Array[Float] = {
    val hist = new Array[Long](8)
    var i = 0
    while (i < content.length) { hist((content(i) & 0xFF) >> 5) += 1; i += 1 }
    val n = math.max(content.length, 1).toFloat
    hist.map(_ / n)
  }

  /** REAL image decode via `javax.imageio` (JDK built-in). 8-dim
    * feature: [width, height, aspect, mean R, mean G, mean B, mean
    * luma, horizontal edge energy] — means over an ≤64×64 sample grid
    * so cost is bounded per image regardless of resolution. None for
    * bytes no installed reader accepts (caller falls back to the
    * stub). */
  private[graft] def decodeImage(content: Array[Byte])
      : Option[(Int, Int, Array[Float])] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      catch { case _: Exception => null }
    if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      val stepX = math.max(w / 64, 1)
      val stepY = math.max(h / 64, 1)
      var rSum = 0.0; var gSum = 0.0; var bSum = 0.0
      var edge = 0.0; var n = 0
      var y = 0
      while (y < h) {
        var x = 0
        var prevLuma = -1.0
        while (x < w) {
          val p = img.getRGB(x, y)
          val r = (p >> 16) & 0xFF; val g = (p >> 8) & 0xFF; val b = p & 0xFF
          val luma = 0.299 * r + 0.587 * g + 0.114 * b
          rSum += r; gSum += g; bSum += b
          if (prevLuma >= 0) edge += math.abs(luma - prevLuma)
          prevLuma = luma
          n += 1
          x += stepX
        }
        y += stepY
      }
      val nf = math.max(n, 1)
      val meanR = (rSum / nf).toFloat
      val meanG = (gSum / nf).toFloat
      val meanB = (bSum / nf).toFloat
      Some((w, h, Array(
        w.toFloat, h.toFloat, w.toFloat / h.toFloat,
        meanR / 255f, meanG / 255f, meanB / 255f,
        (0.299f * meanR + 0.587f * meanG + 0.114f * meanB) / 255f,
        (edge / nf / 255.0).toFloat)))
    }
  }

  /** Deterministic small PNG for a synthetic image row: dimensions and
    * fill gradient derive from the id, encoded with the JDK encoder. */
  private[graft] def syntheticPng(id: Long): Array[Byte] = {
    val w = 16 + (id % 17).toInt
    val h = 8 + (id % 11).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (((id * 31 + x * 7 + y * 13) & 0xFFFFFF)).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Synthesize a media table from the documents table: image rows get
    * REAL PNG payloads (so the decode path runs distributed); audio /
    * video rows carry text bytes as opaque stand-in blobs. */
  def syntheticMedia(spark: SparkSession, dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val pngUdf = udf((id: Long) => syntheticPng(id))
    val kind = element_at(array(lit("image"), lit("audio"), lit("video")),
      (col("doc_id") % 3 + 1).cast("int"))
    docs.select(
      col("doc_id").as("media_id"),
      kind.as("kind"),
      when(kind === "image", pngUdf(col("doc_id")))
        .otherwise(encode(col("text"), "UTF-8")).as("content"),
      length(col("text")).cast("int").as("meta_width"),
      (col("n_chars") % 1080).cast("int").as("meta_height"))
  }

  /** Batch feature extraction over partitions: one codec "session" per
    * partition (the expensive-init amortization point), rows streamed
    * through it. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(featureSchema)
    media.select("media_id", "kind", "content").mapPartitions { it =>
      // codec init amortized per partition (ImageIO scans its reader
      // registry once per JVM; audio/video codecs would init here)
      it.map { r =>
        val content = r.getAs[Array[Byte]]("content")
        val kind = r.getAs[String]("kind")
        // images: REAL decode when the bytes are a decodable raster;
        // anything else (audio/video, undecodable payloads) takes the
        // deterministic stub so the pipeline never drops rows
        val feature =
          if (kind == "image")
            decodeImage(content).map(_._3)
              .getOrElse(decodeStub(kind, content))
          else decodeStub(kind, content)
        Row(r.getAs[Long]("media_id"), kind, content.length, feature)
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

  /** REAL image resize: decode (javax.imageio), scale the longer side
    * to `maxDim` preserving aspect (never upscale), re-encode PNG, and
    * rewrite the metadata columns from the actual output raster.
    * Non-image rows and undecodable payloads pass through unchanged —
    * the selective-rewrite shape a mixed-modality corpus needs. */
  def resizeImages(media: DataFrame, maxDim: Int = 64): DataFrame = {
    require(maxDim > 0, "maxDim must be positive")
    val enc = RowEncoder.encoderFor(mediaSchema)
    media.select("media_id", "kind", "content", "meta_width", "meta_height")
      .mapPartitions { it =>
        it.map { r =>
          val content = r.getAs[Array[Byte]]("content")
          val kind = r.getAs[String]("kind")
          val resized =
            if (kind != "image") None
            else decodeImage(content).flatMap { case (w, h, _) =>
              if (math.max(w, h) <= maxDim) None // never upscale
              else {
                val scale = maxDim.toDouble / math.max(w, h)
                val nw = math.max((w * scale).toInt, 1)
                val nh = math.max((h * scale).toInt, 1)
                val src = javax.imageio.ImageIO.read(
                  new java.io.ByteArrayInputStream(content))
                val dst = new java.awt.image.BufferedImage(
                  nw, nh, java.awt.image.BufferedImage.TYPE_INT_RGB)
                val g = dst.createGraphics()
                try {
                  g.setRenderingHint(
                    java.awt.RenderingHints.KEY_INTERPOLATION,
                    java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
                  g.drawImage(src, 0, 0, nw, nh, null)
                } finally g.dispose()
                val bos = new java.io.ByteArrayOutputStream()
                javax.imageio.ImageIO.write(dst, "png", bos)
                Some((bos.toByteArray, nw, nh))
              }
            }
          resized match {
            case Some((bytes, nw, nh)) =>
              Row(r.getAs[Long]("media_id"), kind, bytes,
                Integer.valueOf(nw), Integer.valueOf(nh))
            case None =>
              Row(r.getAs[Long]("media_id"), kind, content,
                r.getAs[Integer]("meta_width"),
                r.getAs[Integer]("meta_height"))
          }
        }
      }(enc)
  }

  /** STUB resize for opaque (non-raster) payloads: deterministic
    * byte-decimation to ≈`targetBytes` (an audio/video build decodes,
    * scales, re-encodes in this partition loop — only this body
    * changes). Metadata columns are rewritten alongside the payload,
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
