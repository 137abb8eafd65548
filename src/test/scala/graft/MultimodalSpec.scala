package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Mpeg1, Multimodal}

/** Real multimodal paths on the bare JDK: javax.imageio decodes actual
  * rasters, javax.sound.sampled decodes actual WAV/PCM samples, and
  * MJPEG-AVI video frame-decodes through the same image codec (each
  * '00dc' chunk is a complete JPEG). Only DCT-codec video remains
  * behind the declared deterministic stub. */
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

  /** Smooth NON-monotone luma scene in normalized coordinates (so a
    * resized copy samples the same underlying function): sinusoid with
    * per-scene frequency/phase. Monotone gradients are useless fixtures
    * here — dHash is a gradient-SIGN hash, and every monotone-in-x
    * image hashes identically (all ones) by design. Amplitude 100
    * leaves headroom so a +24 brightness shift never clamps. */
  private def scenePng(w: Int, h: Int, fx: Double, fy: Double,
      phase: Double): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (128 + 100 * math.sin(2 * math.Pi *
        (fx * x / w + fy * y / h) + phase)).toInt
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)

  test("imageHash64: brightness/resize-invariant, distinct for " +
      "different scenes, None on junk") {
    val base = scenePng(64, 48, 2.3, 0.7, 0.0)
    val h0 = Multimodal.imageHash64(base).get
    // identical raster re-encoded → identical hash
    assert(Multimodal.imageHash64(
      Multimodal.brightnessShift(base, 0)).get == h0)
    // brightness shift: dHash compares neighboring cells, so a global
    // +24 shift (no clamping at this amplitude) barely moves it
    val shifted = Multimodal.imageHash64(
      Multimodal.brightnessShift(base, 24)).get
    assert(ham(h0, shifted) <= 4, s"brightness moved ${ham(h0, shifted)} bits")
    // same scene at half resolution → close hash (grid-boundary
    // rounding costs a few bits — catch resized twins at maxHamming 7,
    // where banding recall is still guaranteed)
    val small = Multimodal.imageHash64(scenePng(32, 24, 2.3, 0.7, 0.0)).get
    assert(ham(h0, small) <= 8, s"resize moved ${ham(h0, small)} bits")
    // a different scene (other frequency + phase) → far hash
    val other = Multimodal.imageHash64(scenePng(64, 48, 3.7, 1.9, 1.3)).get
    assert(ham(h0, other) > 12, s"different scenes only ${ham(h0, other)} apart")
    assert(Multimodal.imageHash64("not an image".getBytes).isEmpty)
  }

  test("imageNearDups pairs perceptual twins, skips undecodables") {
    val rows = Seq(
      (1L, scenePng(64, 48, 2.3, 0.7, 0.0)),
      (2L, Multimodal.brightnessShift(scenePng(64, 48, 2.3, 0.7, 0.0), 24)),
      (3L, scenePng(64, 48, 3.7, 1.9, 1.3)), // different scene
      (4L, "junk".getBytes)                   // undecodable → dropped
    ).toDF("media_id", "content")
    val pairs = Multimodal.imageNearDups(rows, cache = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)),
      s"expected exactly the planted twin pair, got $pairs")
  }

  test("undecodable bytes fall back to the stub, never drop rows") {
    assert(Multimodal.decodeImage("not a png".getBytes).isEmpty)
    assert(Multimodal.decodeAudio("not a wav".getBytes).isEmpty)
    val media = Seq(
      (1L, "image", png(10, 10, 0x00FF00), null: Integer, null: Integer),
      (2L, "image", "junk bytes".getBytes, null: Integer, null: Integer),
      (3L, "audio", "waveform-ish".getBytes, null: Integer, null: Integer),
      (4L, "audio", Multimodal.syntheticWav(4L), null: Integer, null: Integer)
    ).toDF("media_id", "kind", "content", "meta_width", "meta_height")
    val feats = Multimodal.extractFeatures(media).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](3)).toMap
    assert(feats.size == 4)
    assert(feats(1L)(0) == 10f) // real decode: width in slot 0
    assert(feats(2L).length == 8 && feats(3L).length == 8) // stub shape
    assert(feats(4L)(1) == 8000f) // real decode: sample rate in slot 1
  }

  test("decodeAudio extracts real duration, RMS and zero-crossing " +
      "rate from a synthesized sine WAV") {
    // 8 kHz mono sine: 440 Hz at amplitude 0.5 for exactly 8000 samples
    val sampleRate = 8000f
    val freq = 440.0
    val amp = 0.5
    val n = 8000
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val s = (math.sin(2 * math.Pi * freq * i / sampleRate) * amp
        * 32767.0).toInt
      pcm(2 * i) = (s & 0xFF).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
    }
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val fmt = new AudioFormat(sampleRate, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
      AudioFileFormat.Type.WAVE, bos)

    val f = Multimodal.decodeAudio(bos.toByteArray).get
    assert(f.length == 8)
    assert(math.abs(f(0) - 1.0f) < 1e-6)           // duration: 1 s
    assert(f(1) == 8000f && f(2) == 1f)            // rate, channels
    assert(math.abs(f(3) - amp / math.sqrt(2)) < 1e-3) // RMS = A/√2
    // a 440 Hz sine crosses zero 2·f times per second
    assert(math.abs(f(4) - 2 * freq / sampleRate) < 1e-3)
    assert(math.abs(f(6) - amp) < 1e-3)            // peak = A
    assert(math.abs(f(7)) < 1e-3)                  // DC offset ≈ 0
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

  test("synthetic media image rows are decodable PNGs and audio rows " +
      "decodable WAVs end-to-end") {
    val dir = "/root/testdata/sf0.001"
    val media = Multimodal.syntheticMedia(spark, dir)
    val imgFeats = Multimodal.extractFeatures(media)
      .filter(col("kind") === "image").collect()
    assert(imgFeats.nonEmpty)
    // every image row decoded for real: slot 0 is a plausible width
    // (16..32 by construction), not a histogram fraction ≤ 1
    assert(imgFeats.forall(r => r.getSeq[Float](3).head >= 16f))
    // every audio row decoded for real: slot 1 is the WAV's sample
    // rate, not a histogram fraction ≤ 1
    val audFeats = Multimodal.extractFeatures(media)
      .filter(col("kind") === "audio").collect()
    assert(audFeats.nonEmpty)
    assert(audFeats.forall(r => r.getSeq[Float](3)(1) == 8000f))
    // deterministic across runs
    val again = Multimodal.extractFeatures(media)
      .filter(col("kind") === "image").collect()
    assert(imgFeats.map(_.toString).sorted.sameElements(
      again.map(_.toString).sorted))
  }

  test("probeVideo parses real MP4 box structure: duration, tracks, " +
      "dimensions") {
    // id 2 → duration (1500 + 2*250)/1000 = 2.0 s, 480×480 (w: 320 +
    // (2%5)*80, h: 240 + (2%3)*120)
    val f = Multimodal.probeVideo(Multimodal.syntheticMp4(2L)).get
    assert(f(0) == 2.0f)       // duration seconds
    assert(f(1) == 1000f)      // timescale
    assert(f(2) == 1f)         // track count
    assert(f(3) == 480f && f(4) == 480f && f(5) == 1.0f)
    assert(f(6) > 0f)          // mdat fraction
    assert(f(7) == 3f)         // ftyp + moov + mdat
    // non-BMFF bytes refuse cleanly (fall back to stub in the pipeline)
    assert(Multimodal.probeVideo("plain text".getBytes).isEmpty)
    // adversarial box sizes can't hang the walk: a largesize-0 box
    // (size==1, 64-bit size 0 — declared end at its own header) and a
    // plain size-0-before-the-header variant both terminate
    val evil = java.nio.ByteBuffer.allocate(64)
    evil.putInt(20); evil.put("ftyp".getBytes)
    evil.put("isom".getBytes); evil.putInt(0); evil.put("isom".getBytes)
    evil.putInt(1); evil.put("free".getBytes); evil.putLong(0L)
    evil.putInt(8); evil.put("skip".getBytes)
    val evilBytes = java.util.Arrays.copyOf(evil.array(), evil.position())
    assert(Multimodal.probeVideo(evilBytes).isEmpty) // no mvhd, no spin
    // and the pipeline routes video rows through the REAL probes:
    // plain-BMFF rows (doc_id % 24 == 2) read the mvhd timescale in
    // slot 1, MOV Motion-JPEG rows (% 24 == 8) the 16 px JPEG frame
    // width (frame-grade probe outranks the container probe),
    // rawvideo rows (% 24 == 5) the 10 px DIB frame width,
    // seam-decoded MPEG-1 rows (% 24 == 23) their 32 px stream width,
    // MJPEG-AVI and seam-decoded YUV rows the 16 px frame width —
    // never a histogram fraction <= 1 (the stub) with both seam
    // decoders registered
    val media = Multimodal.syntheticMedia(spark, "/root/testdata/sf0.001")
    val vid = Multimodal.extractFeatures(media,
        decoders = Seq(Multimodal.RawVideoDecoder, Mpeg1.Decoder))
      .filter(col("kind") === "video").collect()
    assert(vid.nonEmpty)
    assert(vid.forall { r =>
      val slot1 = r.getSeq[Float](3)(1)
      if (r.getLong(0) % 24 == 2) slot1 == 1000f
      else if (r.getLong(0) % 24 == 5) slot1 == 10f
      else if (r.getLong(0) % 24 == 23) slot1 == 32f
      else slot1 == 16f
    })
    // bare JDK (no decoders): the seam-only rows honestly fall to the
    // stub (first slot a histogram fraction <= 1), everything else as
    // above
    val bare = Multimodal.extractFeatures(media)
      .filter(col("kind") === "video").collect()
    assert(bare.filter(r => Set(14L, 17L, 20L, 23L)(r.getLong(0) % 24))
      .forall(_.getSeq[Float](3).head <= 1f))
  }

  test("MJPEG-AVI frames decode for real: counts, dims, sampling, " +
      "codec fallbacks") {
    // id 7 → 2 + ((7 / 3) % 3) = 4 frames of 16×12 JPEG
    val avi = Multimodal.syntheticAvi(7L)
    val frames = Multimodal.decodeAviMjpegFrames(avi).get
    assert(frames.length == 4)
    frames.foreach { j =>
      assert((j(0) & 0xFF) == 0xFF && (j(1) & 0xFF) == 0xD8) // JPEG SOI
      val (w, h, _) = Multimodal.decodeImage(j).get
      assert(w == 16 && h == 12)
    }
    // frames differ (per-frame fill): features must not be identical
    val f0 = Multimodal.decodeImage(frames(0)).get._3.toSeq
    val f1 = Multimodal.decodeImage(frames(1)).get._3.toSeq
    assert(f0 != f1)
    // non-AVI containers refuse cleanly: BMFF video and plain bytes
    assert(Multimodal.decodeAviMjpegFrames(
      Multimodal.syntheticMp4(7L)).isEmpty)
    assert(Multimodal.decodeAviMjpegFrames("plain text".getBytes).isEmpty)
    // a malformed chunk size cannot hang the walk
    val evil = java.nio.ByteBuffer.allocate(32)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    evil.put("RIFF".getBytes); evil.putInt(24); evil.put("AVI ".getBytes)
    evil.put("LIST".getBytes); evil.putInt(-4); evil.put("movi".getBytes)
    assert(Multimodal.decodeAviMjpegFrames(
      java.util.Arrays.copyOf(evil.array(), evil.position())).isEmpty)
    // the distributed frame-sample: step 2 over 2/3/4-frame videos
    // keeps indices {0}, {0, 2}, {0, 2} and decodes every sampled frame
    val df = Seq(
      (5L, Multimodal.syntheticAvi(5L)),   // 2 + (5/3)%3 = 3 frames
      (7L, Multimodal.syntheticAvi(7L)),   // 4 frames
      (9L, Multimodal.syntheticAvi(9L)),   // 2 frames
      (1L, Multimodal.syntheticMp4(1L))    // no JDK codec → no rows
    ).toDF("media_id", "content")
    val got = Multimodal.videoFrames(df, step = 2)
      .select("media_id", "frame_idx", "n_frames", "width", "height")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4))).toSet
    assert(got == Set(
      (5L, 0, 3, 16, 12), (5L, 2, 3, 16, 12),
      (7L, 0, 4, 16, 12), (7L, 2, 4, 16, 12),
      (9L, 0, 2, 16, 12)))
    // probeAviMjpeg feature: slot 0 is the real frame count
    assert(Multimodal.probeAviMjpeg(avi).get(0) == 4f)
    // the codec-coverage audit frame extraction cannot provide itself:
    // per-row classification over the same mixed table
    val prof = Multimodal.videoCodecProfile(df)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(prof == Map(5L -> "avi_mjpeg", 7L -> "avi_mjpeg",
      9L -> "avi_mjpeg", 1L -> "bmff"))
    val junk = Seq((99L, "not a video".getBytes))
      .toDF("media_id", "content")
    assert(Multimodal.videoCodecProfile(junk).head().getString(1)
      == "undecodable")
  }

  test("rawvideo AVI ('DIB ', BI_RGB 24-bit) frames decode: geometry, " +
      "channel order, stride padding, codec audit") {
    // id 7 → 4 frames of 10×7 raw BGR, stride 32 (padding exercised)
    val avi = Multimodal.syntheticDibAvi(7L)
    val (w, h0, frames) = Multimodal.decodeAviDibFrames(avi).get
    assert(w == 10 && h0 == 7 && frames.length == 4)
    assert(frames.forall(_.length == 32 * 7))
    // pixel (x=2, y=3) of frame 1: the generator's formulas, read back
    // through the bottom-up + BGR normalization
    val img = Multimodal.dibFrameImage(frames(1), w, h0)
    assert(img.getWidth == 10 && img.getHeight == 7)
    val p = img.getRGB(2, 3)
    val id = 7L; val f = 1; val x = 2; val y = 3
    assert(((p >> 16) & 0xFF) == ((id * 37 + f * 53 + x * 11) & 0xFF))
    assert(((p >> 8) & 0xFF) == ((id * 17 + f * 29 + y * 7) & 0xFF))
    assert((p & 0xFF) == ((id + f + x + y) & 0xFF))
    // an MJPEG container never takes the raw path (its frames' byte
    // length cannot match BI_RGB geometry, and its strf says MJPG)
    assert(Multimodal.decodeAviDibFrames(
      Multimodal.syntheticAvi(7L)).isEmpty)
    // frame-sample over a mixed MJPEG + rawvideo + BMFF table: both
    // AVI codecs emit, BMFF stays silent
    val df = Seq(
      (5L, Multimodal.syntheticDibAvi(5L)), // 3 raw frames
      (7L, Multimodal.syntheticAvi(7L)),    // 4 MJPEG frames
      (1L, Multimodal.syntheticMp4(1L))
    ).toDF("media_id", "content")
    val got = Multimodal.videoFrames(df, step = 2)
      .select("media_id", "frame_idx", "n_frames", "width", "height")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4))).toSet
    assert(got == Set(
      (5L, 0, 3, 10, 7), (5L, 2, 3, 10, 7),
      (7L, 0, 4, 16, 12), (7L, 2, 4, 16, 12)))
    val prof = Multimodal.videoCodecProfile(df)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(prof == Map(5L -> "avi_rawvideo", 7L -> "avi_mjpeg",
      1L -> "bmff"))
    // a truncated frame chunk drops that frame, never reads out of
    // bounds: clip the last chunk's payload by rewriting its size
    val clipped = avi.clone()
    // find the final '00db' and shrink the whole container by 8 bytes
    val shorter = java.util.Arrays.copyOf(clipped, clipped.length - 8)
    // RIFF size now overshoots the buffer — the walk clamps; the last
    // frame fails the geometry check and drops
    val res = Multimodal.decodeAviDibFrames(shorter)
    assert(res.forall(_._3.length == 3))
    // the rawvideo feature probe mirrors probeAviMjpeg's layout
    val pf = Multimodal.probeAviDib(avi).get
    assert(pf(0) == 4f && pf(1) == 10f && pf(2) == 7f)
  }

  test("JPEG-in-BMFF (MOV 'jpeg' sample entry) frames decode via the " +
      "sample tables: counts, dims, frame-sample, codec audit, " +
      "corrupt sample refuses the whole stream") {
    val mov = Multimodal.syntheticMovJpeg(8L) // nf = 2 + (8/3)%3 = 4
    val frames = Multimodal.decodeBmffJpegFrames(mov).get
    assert(frames.length == 4)
    frames.foreach { f =>
      val (w, h, _) = Multimodal.decodeImage(f).get
      assert(w == 16 && h == 12)
    }
    // probeVideo reads the mvhd/tkhd metadata from the SAME tree
    val meta = Multimodal.probeVideo(mov).get
    assert(meta(1) == 600f && meta(3) == 16f && meta(4) == 12f)
    // plain MP4 (no jpeg sample entry) and RIFF-AVI bytes refuse
    assert(Multimodal.decodeBmffJpegFrames(
      Multimodal.syntheticMp4(2L)).isEmpty)
    assert(Multimodal.decodeBmffJpegFrames(
      Multimodal.syntheticAvi(7L)).isEmpty)
    // frame-sample + codec audit over a mixed BMFF table
    val df = Seq(
      (8L, Multimodal.syntheticMovJpeg(8L)),
      (2L, Multimodal.syntheticMp4(2L))
    ).toDF("media_id", "content")
    val got = Multimodal.videoFrames(df, step = 2)
      .select("media_id", "frame_idx", "n_frames", "width", "height")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4))).toSet
    assert(got == Set((8L, 0, 4, 16, 12), (8L, 2, 4, 16, 12)))
    val prof = Multimodal.videoCodecProfile(df)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(prof == Map(8L -> "bmff_jpeg", 2L -> "bmff"))
    // a corrupted first sample (offset 28: ftyp is 20 bytes, mdat
    // header 8) fails the SOI check and invalidates the WHOLE stream —
    // half-decoded coverage is the lie the audit exists to prevent
    val bad = mov.clone()
    assert((bad(28) & 0xFF) == 0xFF && (bad(29) & 0xFF) == 0xD8,
      "test premise: first sample starts at byte 28")
    bad(28) = 0
    // a corrupt LATER sample also invalidates the whole stream for
    // BOTH the decoder and the classification probe — firstOnly still
    // walks and validates every sample, so coverage ('bmff_jpeg') and
    // decode share one all-or-nothing bar
    val badLast = mov.clone()
    val lastOff = 28 + frames.take(3).map(_.length).sum
    assert((badLast(lastOff) & 0xFF) == 0xFF)
    badLast(lastOff) = 0
    assert(Multimodal.decodeBmffJpegFrames(badLast).isEmpty)
    assert(Multimodal.firstBmffJpegFrame(badLast).isEmpty)
    // a hostile fixed-size stsz declaring 2^31-1 samples in 12 bytes
    // must refuse (more samples than container bytes), never allocate
    val hostile = mov.clone()
    val pat = "stsz".getBytes("ISO-8859-1")
    val si = (0 until hostile.length - 4).find(i =>
      pat.indices.forall(j => hostile(i + j) == pat(j))).get
    hostile(si + 8) = 0; hostile(si + 9) = 0
    hostile(si + 10) = 0; hostile(si + 11) = 1 // sample_size = 1 (fixed)
    hostile(si + 12) = 0x7F.toByte; hostile(si + 13) = -1
    hostile(si + 14) = -1; hostile(si + 15) = -1 // count = 0x7FFFFFFF
    assert(Multimodal.decodeBmffJpegFrames(hostile).isEmpty)
    assert(Multimodal.decodeBmffJpegFrames(bad).isEmpty)
    // the feature probe mirrors the AVI probes' 8-slot layout
    val pf = Multimodal.probeBmffJpeg(mov).get
    assert(pf(0) == 4f && pf(1) == 16f && pf(2) == 12f)
  }

  test("synthetic media's video rows exercise all four codec classes") {
    val media = Multimodal.syntheticMedia(spark,
      "/root/testdata/sf0.001")
    val codecs = Multimodal.videoCodecProfile(
        media.filter(col("kind") === "video"))
      .select("codec").distinct().collect().map(_.getString(0)).toSet
    assert(Set("avi_mjpeg", "avi_rawvideo", "bmff", "bmff_jpeg")
        .subsetOf(codecs),
      s"missing codec class in synthetic media: $codecs")
    // and extractFeatures gives every frame-decodable codec a REAL
    // (non-stub) feature: the probes lead with the frame count (≥ 2
    // for every synthetic stream), where the stub's head is a
    // byte-histogram fraction ≤ 1
    val frameIds = Multimodal.videoCodecProfile(
        media.filter(col("kind") === "video"))
      .filter(col("codec").startsWith("avi_") ||
        col("codec") === "bmff_jpeg")
      .select("media_id").collect().map(_.getLong(0)).toSet
    val feats = Multimodal.extractFeatures(
        media.filter(col("kind") === "video"))
      .collect()
      .filter(r => frameIds.contains(r.getLong(0)))
      .map(_.getSeq[Float](3))
    assert(feats.nonEmpty && feats.forall(_.head >= 2f))
  }

  /** A fake DCT decoder for the seam spec: claims h264/avc1, decodes
    * every payload to a deterministic 4-dim feature of its bytes —
    * stands in for an FFI-backed codec to prove frames flow
    * end-to-end through the container walkers and the dispatch. */
  private object FakeDctDecoder extends Multimodal.VideoFrameDecoder {
    def name: String = "fake-dct"
    def claims(codec: String): Boolean =
      codec == "h264" || codec == "avc1"
    def decode(codec: String, width: Int, height: Int,
        payload: Array[Byte]): Option[(Int, Int, Array[Float])] =
      if (payload.isEmpty) None
      else Some((if (width > 0) width else 8,
        if (height > 0) height else 8,
        Array(payload.length.toFloat, (payload.head & 0xFF).toFloat,
          (payload.last & 0xFF).toFloat, codec.length.toFloat)))
  }

  test("decoder seam: foreign-codec AVI and BMFF streams flow " +
      "end-to-end through a registered decoder — and WITHOUT one the " +
      "bare-JDK behavior is unchanged (no frames, honest audit)") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val df = Seq(
      (5L, Multimodal.syntheticForeignAvi(5L, "H264")), // 3 frames
      (7L, Multimodal.syntheticForeignMov(7L, "avc1")), // 4 frames
      (9L, Multimodal.syntheticAvi(9L))                 // 2 MJPEG frames
    ).toDF("media_id", "content")
    // bare JDK (no decoders): foreign rows contribute nothing, the
    // MJPEG row is untouched by the seam's existence
    val bare = Multimodal.videoFrames(df)
      .select("media_id").as[Long].collect()
    assert(bare.toSet == Set(9L) && bare.length == 2)
    val bareProfile = Multimodal.videoCodecProfile(df)
      .as[(Long, String)].collect().toMap
    assert(bareProfile(5L) == "undecodable") // AVI container, DCT codec
    assert(bareProfile(7L) == "bmff")        // BMFF metadata only
    assert(bareProfile(9L) == "avi_mjpeg")
    // with the fake DCT decoder registered: frames flow end-to-end
    // with container-derived counts/geometry and decoder features
    val got = Multimodal.videoFrames(df, step = 1,
        decoders = Seq(FakeDctDecoder))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getInt(3), r.getInt(4), r.getSeq[Float](5)))
    val avi = got.filter(_._1 == 5L)
    assert(avi.length == 3 && avi.forall(_._3 == 3),
      s"foreign AVI frames: ${avi.toSeq}")
    assert(avi.forall(f => f._4 == 16 && f._5 == 12),
      "container geometry must reach the decoder")
    assert(avi.forall(f => f._6.length == 4 && f._6.head == 64f),
      "decoder feature must come through unmodified")
    val mov = got.filter(_._1 == 7L)
    assert(mov.length == 4 && mov.forall(_._3 == 4),
      s"foreign BMFF frames: ${mov.toSeq}")
    assert(mov.forall(f => f._4 == 16 && f._5 == 12),
      "the stsd sample entry's declared geometry must reach the decoder")
    assert(mov.forall(f => f._6.length == 4 && f._6.head == 48f))
    assert(got.count(_._1 == 9L) == 2, "MJPEG row must be unaffected")
    // audit: ext:<codec> provenance with the same first-frame bar
    val profile = Multimodal.videoCodecProfile(df,
        decoders = Seq(FakeDctDecoder))
      .as[(Long, String)].collect().toMap
    assert(profile(5L) == "ext:h264")
    assert(profile(7L) == "ext:avc1")
    assert(profile(9L) == "avi_mjpeg")
    // frame sampling is codec-agnostic: step=2 over the 4-frame MOV
    val sampled = Multimodal.videoFrames(df, step = 2,
        decoders = Seq(FakeDctDecoder))
      .filter(col("media_id") === 7L)
      .select("frame_idx").as[Int].collect().sorted
    assert(sampled.toSeq == Seq(0, 2))
  }

  test("hostile raster: a 58-byte BMP declaring 2^30 pixels refuses " +
      "(None) instead of letting ImageIO allocate the raster from the " +
      "lying header; sane images still decode") {
    // minimal BMP: 14-byte file header + 40-byte BITMAPINFOHEADER
    // declaring 32768 x 32768 x 24bpp with 4 bytes of 'pixel' data
    val bb = java.nio.ByteBuffer.allocate(58)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte)
    bb.putInt(58); bb.putInt(0); bb.putInt(54) // size, resv, data offset
    bb.putInt(40)                              // BITMAPINFOHEADER size
    bb.putInt(32768); bb.putInt(32768)         // 2^30 declared pixels
    bb.putShort(1); bb.putShort(24)            // planes, bpp
    bb.putInt(0); bb.putInt(0)                 // BI_RGB, image size
    bb.putInt(0); bb.putInt(0); bb.putInt(0); bb.putInt(0)
    bb.putInt(0)                               // 4 bytes of "pixels"
    assert(Multimodal.decodeImage(bb.array()).isEmpty,
      "hostile BMP dims must refuse before allocation")
    // the bound is a refusal bar, not a decode regression
    assert(Multimodal.decodeImage(Multimodal.syntheticPng(3L)).isDefined)
  }

  test("hostile DIB AVI: a header width crafted so 32-bit stride " +
      "arithmetic would wrap to match a tiny chunk must be " +
      "undecodable, never an allocation from the lying header") {
    // w = 0x55555556: w*3 wraps to 2 in 32-bit, stride would be 4 and
    // want 4*6 = 24 — matching the 24-byte chunk below; long
    // arithmetic makes want ~17 GB and nothing matches
    val w = 0x55555556; val h = 6
    val bb = java.nio.ByteBuffer.allocate(512)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fcc(t: String): Unit = bb.put(t.getBytes("ISO-8859-1"))
    def chunk(t: String)(body: => Unit): Unit = {
      fcc(t); val at = bb.position(); bb.putInt(0); body
      val sz = bb.position() - at - 4
      bb.putInt(at, sz); if ((sz & 1) == 1) bb.put(0.toByte)
    }
    def list(lt: String)(body: => Unit): Unit =
      chunk("LIST") { fcc(lt); body }
    fcc("RIFF"); val rsAt = bb.position(); bb.putInt(0); fcc("AVI ")
    list("hdrl") {
      list("strl") {
        chunk("strh") {
          fcc("vids"); fcc("DIB ")
          (0 until 9).foreach(_ => bb.putInt(0))
          bb.putShort(0); bb.putShort(0)
          bb.putShort(0); bb.putShort(0)
        }
        chunk("strf") {
          bb.putInt(40); bb.putInt(w); bb.putInt(h)
          bb.putShort(1); bb.putShort(24)
          bb.putInt(0) // BI_RGB
          (0 until 5).foreach(_ => bb.putInt(0))
        }
      }
    }
    list("movi") { chunk("00db") { (0 until 6).foreach(_ => bb.putInt(0)) } }
    bb.putInt(rsAt, bb.position() - rsAt - 4)
    val bytes = java.util.Arrays.copyOf(bb.array(), bb.position())
    assert(Multimodal.decodeAviDibFrames(bytes).isEmpty,
      "overflowed stride must not admit a frame")
  }

  test("hostile WAV: a data chunk declaring 2^31-1 bytes over 8 real " +
      "ones completes bounded by the ACTUAL stream (never the header)") {
    val bb = java.nio.ByteBuffer.allocate(52)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fcc(t: String): Unit = bb.put(t.getBytes("ISO-8859-1"))
    fcc("RIFF"); bb.putInt(Int.MaxValue); fcc("WAVE")
    fcc("fmt "); bb.putInt(16)
    bb.putShort(1); bb.putShort(1)       // PCM, mono
    bb.putInt(8000); bb.putInt(16000)    // rate, byte rate
    bb.putShort(2); bb.putShort(16)      // block align, bits
    fcc("data"); bb.putInt(Int.MaxValue) // declared: 2 GB
    bb.putInt(0x12345678); bb.putInt(0x0abcdef0) // actual: 8 bytes
    val got = Multimodal.decodeAudio(
      java.util.Arrays.copyOf(bb.array(), bb.position()))
    // 4 samples of real data — duration must reflect the truncated
    // actual bytes (4/8000 s), proving nothing sized from the header
    assert(got.isDefined && got.get.head <= 0.001f,
      s"duration must come from actual bytes, got ${got.map(_.head)}")
  }

  test("RawVideoDecoder: BT.601 pixel math is exact (constant-gray " +
      "planes), all five layouts of the same logical YUV decode to " +
      "the IDENTICAL raster, and wrong-size/odd-geometry payloads " +
      "refuse") {
    val d = Multimodal.RawVideoDecoder
    // constant Y=126, Cb=Cr=128 (no chroma) → gray 1.164*(126-16)
    val w = 8; val h = 4
    val grayY = 126
    val i420 = Array.fill(w * h)(grayY.toByte) ++
      Array.fill(w / 2 * (h / 2) * 2)(128.toByte)
    val img = d.decodeRaster("i420", w, h, i420).get
    val expect = (1.164 * (grayY - 16) + 0.5).toInt
    for (y <- 0 until h; x <- 0 until w) {
      val p = img.getRGB(x, y)
      assert(((p >> 16) & 0xFF) == expect && ((p >> 8) & 0xFF) == expect
        && (p & 0xFF) == expect, f"pixel ($x,$y) = 0x$p%06x")
    }
    // the five layouts carry the SAME logical planes → identical rasters
    def raster(fourcc: String): IndexedSeq[Int] = {
      val codec = fourcc.trim.toLowerCase
      val avi = Multimodal.syntheticYuvAvi(7L, fourcc)
      val frames = Multimodal.videoFrames(
        Seq((7L, avi)).toDF("media_id", "content"),
        decoders = Seq(d))
      assert(frames.count() > 0, s"$fourcc must frame-decode")
      val content = Multimodal.videoFrameContent(
          Seq((7L, avi)).toDF("media_id", "content"),
          decoders = Seq(d))
        .filter(col("frame_idx") === 0)
        .select("content").collect().head.getAs[Array[Byte]](0)
      val im = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(content))
      for (y <- 0 until im.getHeight; x <- 0 until im.getWidth)
        yield im.getRGB(x, y)
    }
    val base = raster("YUY2")
    for (f <- Seq("UYVY", "I420", "YV12", "NV12"))
      assert(raster(f) == base, s"$f raster differs from YUY2")
    // decoded pixels match the independently computed BT.601 of the
    // generator's yuvPlane formulas
    val avi = Multimodal.syntheticYuvAvi(7L, "I420")
    val content0 = Multimodal.videoFrameContent(
        Seq((7L, avi)).toDF("media_id", "content"),
        decoders = Seq(d))
      .filter(col("frame_idx") === 0)
      .select("content").collect().head.getAs[Array[Byte]](0)
    val im0 = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(content0))
    def clamp(v: Double): Int =
      if (v < 0.5) 0 else if (v > 254.5) 255 else (v + 0.5).toInt
    for (y <- 0 until 12; x <- 0 until 16) {
      val (yy, cb, cr) = Multimodal.yuvPlane(7L, 0, x, y)
      // chroma sites at the even sample, like the decoder reconstructs
      val (cbS, crS) = (Multimodal.yuvPlane(7L, 0, x / 2 * 2, y / 2 * 2)._2,
        Multimodal.yuvPlane(7L, 0, x / 2 * 2, y / 2 * 2)._3)
      assert(cb == cbS && cr == crS) // formula already sites at /2
      val yv = 1.164 * (yy - 16)
      val want = (clamp(yv + 1.596 * (cr - 128)) << 16) |
        (clamp(yv - 0.392 * (cb - 128) - 0.813 * (cr - 128)) << 8) |
        clamp(yv + 2.017 * (cb - 128))
      assert((im0.getRGB(x, y) & 0xFFFFFF) == want,
        f"pixel ($x,$y): got 0x${im0.getRGB(x, y) & 0xFFFFFF}%06x " +
          f"want 0x$want%06x")
    }
    // refusals: truncated payload, odd width (packed), odd height
    // (planar), unclaimed codec
    assert(d.decodeRaster("yuy2", w, h,
      Array.fill(w * h * 2 - 1)(0.toByte)).isEmpty)
    assert(d.decodeRaster("yuy2", 7, 4,
      Array.fill(7 * 4 * 2)(0.toByte)).isEmpty)
    assert(d.decodeRaster("i420", 8, 5,
      Array.fill(60)(0.toByte)).isEmpty)
    assert(!d.claims("h264") && !d.claims("mjpg"))
  }

  test("frame content flows end-to-end: foreign YUV codecs through " +
      "the seam into per-frame dHash near-dup pairing and the " +
      "frame-shard content table; bare JDK stays honest (no frames, " +
      "undecodable audit)") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val df = Seq(
      (3L, Multimodal.syntheticYuvAvi(3L, "YUY2")),  // 3 frames
      (6L, Multimodal.syntheticYuvAvi(6L, "I420")),  // 4 frames
      (9L, Multimodal.syntheticAvi(9L))              // 2 MJPEG frames
    ).toDF("media_id", "content")
    // bare JDK: YUV rows contribute nothing and audit honestly
    assert(Multimodal.videoFrames(df).select("media_id")
      .as[Long].collect().toSet == Set(9L))
    assert(Multimodal.videoFrameHashes(df).select("media_id")
      .as[Long].collect().toSet == Set(9L))
    val bareProfile = Multimodal.videoCodecProfile(df)
      .as[(Long, String)].collect().toMap
    assert(bareProfile(3L) == "undecodable" &&
      bareProfile(6L) == "undecodable")
    // with the REAL decoder: frames, audit provenance, content
    val dec = Seq(Multimodal.RawVideoDecoder)
    val profile = Multimodal.videoCodecProfile(df, decoders = dec)
      .as[(Long, String)].collect().toMap
    assert(profile(3L) == "ext:yuy2" && profile(6L) == "ext:i420" &&
      profile(9L) == "avi_mjpeg")
    val hashes = Multimodal.videoFrameHashes(df, decoders = dec)
    val hs = hashes.collect().map(r => (r.getLong(0), r.getInt(1),
      r.getInt(2), r.getLong(3), r.getLong(4)))
    assert(hs.count(_._1 == 3L) == 3 && hs.count(_._1 == 6L) == 4 &&
      hs.count(_._1 == 9L) == 2, s"frame counts: ${hs.toSeq}")
    assert(hs.forall(h => h._4 == (h._1 << 20) + h._2),
      "frame_id must pack (media_id, frame_idx)")
    // per-frame hashes feed the IMAGE near-dup pairing directly:
    // consecutive frames of one video are near-identical by
    // construction (the Y ramp shifts by 1 per frame)
    val pairs = Multimodal.imageNearDupsFromHashes(
        hashes.select(col("frame_id"), col("phash")),
        idCol = "frame_id", maxHamming = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "consecutive YUV frames must pair")
    assert(pairs.forall { case (a, b) =>
      (a >> 20) == (b >> 20) },
      s"only intra-video frames may pair here: ${pairs.toSeq}")
    // content table: YUV frames land as lossless PNG whose re-decode
    // re-hashes to the SAME phash; MJPEG frames pass through as their
    // ORIGINAL jpeg payloads (no transcode)
    val content = Multimodal.videoFrameContent(df, decoders = dec)
      .collect().map(r => ((r.getLong(0), r.getInt(1)), (r.getInt(3),
        r.getInt(4), r.getString(5), r.getAs[Array[Byte]](6)))).toMap
    val phashOf = hs.map(h => ((h._1, h._2), h._5)).toMap
    assert(content.keySet == phashOf.keySet)
    content.foreach { case ((id, idx), (cw, ch, fmt, bytes)) =>
      assert(cw == 16 && ch == 12)
      assert(fmt == (if (id == 9L) "jpeg" else "png"))
      assert(Multimodal.imageHash64(bytes).get == phashOf((id, idx)),
        s"content round-trip hash mismatch at ($id, $idx)")
    }
    val mjpegPayloads = Multimodal.decodeAviMjpegFrames(
      Multimodal.syntheticAvi(9L)).get
    assert(content((9L, 0))._4.sameElements(mjpegPayloads(0)),
      "jpeg frames must pass through untranscoded")
  }
}
