package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Mpeg1, Multimodal}

/** Laws for the pure-JVM MPEG-1 intra decoder: analytic DC-only
  * exactness, encoder→decoder round-trip accuracy bounds, loud
  * refusal of truncated/foreign bitstreams, and the end-to-end seam
  * flow (frames, audit provenance, per-frame hashes, content). */
class Mpeg1Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def planesOf(id: Long, f: Int, w: Int, h: Int)
      : (Array[Int], Array[Int], Array[Int]) = {
    val yP = Array.tabulate(w * h)(i =>
      Multimodal.yuvPlane(id, f, i % w, i / w)._1)
    val cw = w / 2; val ch = h / 2
    val cbP = Array.tabulate(cw * ch)(i =>
      Multimodal.yuvPlane(id, f, (i % cw) * 2, (i / cw) * 2)._2)
    val crP = Array.tabulate(cw * ch)(i =>
      Multimodal.yuvPlane(id, f, (i % cw) * 2, (i / cw) * 2)._3)
    (yP, cbP, crP)
  }

  test("DC-only streams decode EXACTLY: a flat image's every AC " +
      "coefficient quantizes to zero and the DC path (size VLC, " +
      "differential, intra 8x quantizer, IDCT normalization) " +
      "reconstructs the flat value bit-for-bit") {
    val w = 32; val h = 16
    for (gray <- Seq(16, 126, 235)) {
      val es = Mpeg1.encodeIFrame(w, h,
        Array.fill(w * h)(gray),
        Array.fill(w / 2 * (h / 2))(128),
        Array.fill(w / 2 * (h / 2))(128))
      val (dw, dh, yP, cbP, crP) = Mpeg1.decodeIFramePlanes(es).get
      assert(dw == w && dh == h)
      assert(yP.forall(_ == gray), s"flat Y=$gray must survive exactly")
      assert(cbP.forall(_ == 128) && crP.forall(_ == 128))
    }
    // per-block DC prediction: a block-step image (each 8×8 flat at a
    // different level) is also DC-only — exact, and it walks the DC
    // differential across blocks and macroblocks
    val w2 = 32; val h2 = 16
    def step(x: Int, y: Int): Int = 32 + (x / 8) * 40 + (y / 8) * 24
    val es2 = Mpeg1.encodeIFrame(w2, h2,
      Array.tabulate(w2 * h2)(i => step(i % w2, i / w2)),
      Array.fill(w2 / 2 * (h2 / 2))(128),
      Array.fill(w2 / 2 * (h2 / 2))(128))
    val (_, _, y2, _, _) = Mpeg1.decodeIFramePlanes(es2).get
    assert((0 until w2 * h2).forall(i =>
      y2(i) == step(i % w2, i / w2)), "DC prediction chain broke")
  }

  test("encoder→decoder round trip on real (noisy) planes is " +
      "accurate to quantization and deterministic; finer qscale is " +
      "strictly more accurate") {
    val w = 32; val h = 16
    val (yP, cbP, crP) = planesOf(11L, 0, w, h)
    def err(qscale: Int): Double = {
      val es = Mpeg1.encodeIFrame(w, h, yP, cbP, crP, qscale)
      val (_, _, dy, _, _) = Mpeg1.decodeIFramePlanes(es).get
      val e = (0 until w * h).map(i => math.abs(dy(i) - yP(i)))
      assert(e.max <= 16 * qscale,
        s"qscale=$qscale max pixel error ${e.max}")
      e.sum.toDouble / e.length
    }
    val e8 = err(8); val e2 = err(2)
    assert(e2 < e8, s"qscale 2 ($e2) must beat qscale 8 ($e8)")
    assert(e2 < 4.0, s"qscale 2 mean |err| $e2")
    // deterministic: same stream, same pixels
    val es = Mpeg1.encodeIFrame(w, h, yP, cbP, crP)
    val a = Mpeg1.decodeIFramePlanes(es).get._3.toSeq
    assert(a == Mpeg1.decodeIFramePlanes(es).get._3.toSeq)
  }

  test("refusals are loud and allocation-free: truncations at every " +
      "length return None (never throw), non-MPEG bytes refuse, and " +
      "a hostile header declaring huge dimensions with no picture " +
      "refuses before plane allocation") {
    val w = 32; val h = 16
    val (yP, cbP, crP) = planesOf(3L, 1, w, h)
    val es = Mpeg1.encodeIFrame(w, h, yP, cbP, crP)
    assert(Mpeg1.decodeIFramePlanes(es).isDefined)
    var truncated = 0
    (4 until es.length by 7).foreach { n =>
      if (Mpeg1.decodeIFramePlanes(
          java.util.Arrays.copyOf(es, n)).isEmpty) truncated += 1
    }
    // every prefix that lost slice data must refuse (prefixes keeping
    // all slices intact may legitimately still decode)
    assert(truncated >= (es.length - 30) / 7,
      s"only $truncated of ~${es.length / 7} truncations refused")
    assert(Mpeg1.decodeIFramePlanes("not mpeg".getBytes).isEmpty)
    assert(Mpeg1.decodeIFramePlanes(Array.empty[Byte]).isEmpty)
    // flipped bytes must never throw (wrong pixels are impossible to
    // exclude under bit corruption, crashes are not)
    val corrupt = es.clone()
    (10 until corrupt.length by 11).foreach { i =>
      corrupt(i) = (corrupt(i) ^ 0x5A).toByte }
    Mpeg1.decodeIFramePlanes(corrupt) // Option either way — no throw
    // hostile: a sequence header declaring 4032x4032 and nothing else
    val bw = java.nio.ByteBuffer.allocate(16)
    bw.put(Array[Byte](0, 0, 1, 0xB3.toByte))
    // width 4032 = 0xFC0, height 4032: 12+12 bits = FC0FC0
    bw.put(Array[Byte](0xFC.toByte, 0x0F.toByte, 0xC0.toByte))
    bw.put(Array[Byte](0x15, 0x00, 0x00, 0x00, 0x00))
    assert(Mpeg1.decodeIFramePlanes(
      java.util.Arrays.copyOf(bw.array(), bw.position())).isEmpty)
  }

  test("the seam flows MPEG-1 end-to-end: frames with stream " +
      "geometry, ext:mpg1 audit, per-frame dHashes pairing " +
      "consecutive frames, PNG content whose re-hash matches — and " +
      "the bare JDK stays honest") {
    val df = Seq(
      (23L, Multimodal.syntheticMpeg1Avi(23L)), // 3 frames, 32x16
      (9L, Multimodal.syntheticAvi(9L))         // 2 MJPEG frames
    ).toDF("media_id", "content")
    // bare JDK: the MPEG-1 row contributes nothing, audits undecodable
    assert(Multimodal.videoFrames(df).select("media_id")
      .as[Long].collect().toSet == Set(9L))
    assert(Multimodal.videoCodecProfile(df)
      .as[(Long, String)].collect().toMap.apply(23L) == "undecodable")
    val dec = Seq(Mpeg1.Decoder)
    val frames = Multimodal.videoFrames(df, decoders = dec).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4)))
    val m = frames.filter(_._1 == 23L)
    assert(m.length == 3 && m.forall(f => f._3 == 3), s"${m.toSeq}")
    assert(m.forall(f => f._4 == 32 && f._5 == 16),
      "the STREAM's sequence-header geometry must come through")
    assert(Multimodal.videoCodecProfile(df, decoders = dec)
      .as[(Long, String)].collect().toMap.apply(23L) == "ext:mpg1")
    // per-frame dHash + pairing: consecutive MPEG-1 frames are
    // near-identical by construction (yuvPlane's per-frame brightness
    // offset), so they pair intra-video
    val hashes = Multimodal.videoFrameHashes(df, decoders = dec)
    val pairs = Multimodal.imageNearDupsFromHashes(
        hashes.select(col("frame_id"), col("phash")),
        idCol = "frame_id", maxHamming = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.exists { case (a, b) =>
      (a >> 20) == 23L && (b >> 20) == 23L },
      s"consecutive MPEG-1 frames must pair: ${pairs.toSeq}")
    // content: lossless PNG of the decoded raster re-hashes identically
    val phashOf = hashes.collect()
      .map(r => ((r.getLong(0), r.getInt(1)), r.getLong(4))).toMap
    Multimodal.videoFrameContent(df, decoders = dec)
      .filter(col("media_id") === 23L).collect().foreach { r =>
        assert(r.getString(5) == "png")
        assert(Multimodal.imageHash64(r.getAs[Array[Byte]](6)).get ==
          phashOf((r.getLong(0), r.getInt(1))))
      }
  }
}
