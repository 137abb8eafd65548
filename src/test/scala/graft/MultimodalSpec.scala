package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

/** Real-image multimodal path: the JDK's javax.imageio decodes actual
  * rasters, so decode/feature/resize are REAL for images (audio/video
  * remain behind the declared deterministic stub). */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("decodeImage extracts real dimensions and channel means") {
    val (w, h, f) = Multimodal.decodeImage(png(40, 20, 0xFF0000)).get
    assert(w == 40 && h == 20)
    assert(f(0) == 40f && f(1) == 20f && f(2) == 2.0f)
    // solid red: mean R = 1, G = B = 0, luma = 0.299, no edges
    assert(math.abs(f(3) - 1.0f) < 1e-6 && f(4) == 0f && f(5) == 0f)
    assert(math.abs(f(6) - 0.299f) < 1e-3)
    assert(f(7) == 0f)
  }

  test("undecodable bytes fall back to the stub, never drop rows") {
    assert(Multimodal.decodeImage("not a png".getBytes).isEmpty)
    val media = Seq(
      (1L, "image", png(10, 10, 0x00FF00), null: Integer, null: Integer),
      (2L, "image", "junk bytes".getBytes, null: Integer, null: Integer),
      (3L, "audio", "waveform-ish".getBytes, null: Integer, null: Integer)
    ).toDF("media_id", "kind", "content", "meta_width", "meta_height")
    val feats = Multimodal.extractFeatures(media).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](3)).toMap
    assert(feats.size == 3)
    assert(feats(1L)(0) == 10f) // real decode: width in slot 0
    assert(feats(2L).length == 8 && feats(3L).length == 8) // stub shape
  }

  test("resizeImages scales the long side, preserves aspect, " +
      "re-encodes decodable PNG; non-images pass through") {
    val media = Seq(
      (1L, "image", png(100, 40, 0x0000FF),
        Integer.valueOf(100), Integer.valueOf(40)),
      (2L, "image", png(30, 20, 0x123456),
        Integer.valueOf(30), Integer.valueOf(20)), // under maxDim: untouched
      (3L, "video", "frames".getBytes, null: Integer, null: Integer)
    ).toDF("media_id", "kind", "content", "meta_width", "meta_height")
    val out = Multimodal.resizeImages(media, maxDim = 50).collect()
      .map(r => r.getLong(0) ->
        ((r.getAs[Array[Byte]]("content"), r.getAs[Integer]("meta_width"),
          r.getAs[Integer]("meta_height")))).toMap
    val (bytes1, w1, h1) = out(1L)
    assert(w1 == 50 && h1 == 20)
    // the payload really is a PNG of the new size
    val (dw, dh, _) = Multimodal.decodeImage(bytes1).get
    assert(dw == 50 && dh == 20)
    // small image untouched (no upscale), non-image untouched
    assert(out(2L)._2 == 30 && out(2L)._3 == 20)
    assert(new String(out(3L)._1) == "frames")
  }

  test("synthetic media image rows are decodable PNGs end-to-end") {
    val dir = "/root/testdata/sf0.001"
    val media = Multimodal.syntheticMedia(spark, dir)
    val imgFeats = Multimodal.extractFeatures(media)
      .filter(col("kind") === "image").collect()
    assert(imgFeats.nonEmpty)
    // every image row decoded for real: slot 0 is a plausible width
    // (16..32 by construction), not a histogram fraction ≤ 1
    assert(imgFeats.forall(r => r.getSeq[Float](3).head >= 16f))
    // deterministic across runs
    val again = Multimodal.extractFeatures(media)
      .filter(col("kind") === "image").collect()
    assert(imgFeats.map(_.toString).sorted.sameElements(
      again.map(_.toString).sorted))
  }
}
