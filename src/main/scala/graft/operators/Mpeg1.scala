package graft.operators

/** Pure-JVM MPEG-1 Video (ISO/IEC 11172-2) INTRA-frame decoder — the
  * real DCT-codec implementation behind the [[Multimodal.VideoFrameDecoder]]
  * seam, plus the intra-only encoder its fixtures use. Implements the
  * full I-picture pipeline from the published specification: start-code
  * parsing (sequence / GOP / picture / slice), the MSB-first bitstream,
  * the DC-size and AC run/level VLC tables, zigzag scan, intra
  * dequantization with the spec's oddification mismatch control, the
  * 8×8 IDCT, 4:2:0 macroblock assembly and BT.601 limited-range
  * YCbCr→RGB (shared with [[Multimodal.RawVideoDecoder]]'s matrix).
  *
  * Scope, stated honestly:
  *   - I-pictures only. P/B pictures (motion compensation) refuse —
  *     the seam's per-frame contract feeds self-contained payloads,
  *     and an all-intra stream (the editing/archival profile) is the
  *     shape a frame-extraction pipeline meets;
  *   - the AC coefficient table carries every code of ≤ 12 bits plus
  *     the escape form (run 6 bits + level 8/16 bits). The rare
  *     13/14-bit codes (|level| ≥ 12 at run 0, deep run-1 levels)
  *     REFUSE loudly (None) rather than guess — a standard encoder
  *     can also express those coefficients as escapes, which decode
  *     fully here. The fixture encoder emits only table-subset codes
  *     and escapes, so its streams are standard-compliant AND fully
  *     decodable;
  *   - hostile-input bounds: declared dimensions refuse past
  *     max(2²⁶, 256·|bytes|) pixels (the readRaster discipline) and
  *     every bitstream read is bounds-checked — truncation yields
  *     None, never an exception or over-allocation.
  */
object Mpeg1 {

  // ---- bitstream -------------------------------------------------------

  /** MSB-first bit reader. Reads past the end yield -1 sentinels the
    * callers turn into a refusal (never an exception). */
  private final class BitReader(data: Array[Byte], startBit: Long) {
    var pos: Long = startBit
    def bitsLeft: Long = data.length.toLong * 8 - pos
    def read(n: Int): Int = {
      if (n == 0) return 0
      if (bitsLeft < n) { pos = data.length.toLong * 8; return -1 }
      var v = 0
      var i = 0
      while (i < n) {
        val b = data((pos >> 3).toInt)
        v = (v << 1) | ((b >> (7 - (pos & 7)).toInt) & 1)
        pos += 1
        i += 1
      }
      v
    }
    def peek(n: Int): Int = { val p = pos; val v = read(n); pos = p; v }
    def alignByte(): Unit = { pos = (pos + 7) & ~7L }
  }

  /** Next start code (0x000001xx) at or after byte `from`; returns
    * (code byte, byte offset of the 00 00 01 prefix) or None. */
  private def nextStartCode(d: Array[Byte], from: Int): Option[(Int, Int)] = {
    var i = math.max(from, 0)
    while (i + 3 < d.length) {
      if (d(i) == 0 && d(i + 1) == 0 && d(i + 2) == 1)
        return Some((d(i + 3) & 0xFF, i))
      i += 1
    }
    None
  }

  // ---- tables ----------------------------------------------------------

  /** Zigzag scan order: position i of the coefficient stream lands at
    * raster index ZigZag(i). */
  private[operators] val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Default intra quantizer matrix (raster order), ISO 11172-2. */
  private[operators] val DefaultIntraQuant: Array[Int] = Array(
    8, 16, 19, 22, 26, 27, 29, 34,
    16, 16, 22, 24, 27, 29, 34, 37,
    19, 22, 26, 27, 29, 34, 34, 38,
    22, 22, 26, 27, 29, 34, 37, 40,
    22, 26, 27, 29, 32, 35, 40, 48,
    26, 27, 29, 32, 35, 40, 48, 58,
    26, 27, 29, 34, 38, 46, 56, 69,
    27, 29, 35, 38, 46, 56, 69, 83)

  /** dct_dc_size VLCs: (code, bits) per size, luma then chroma
    * (tables 2-B.12 / 2-B.13). */
  private val DcLuma: Array[(Int, Int)] = Array(
    (0x4, 3), (0x0, 2), (0x1, 2), (0x5, 3), (0x6, 3), (0xE, 4),
    (0x1E, 5), (0x3E, 6), (0x7E, 7))
  private val DcChroma: Array[(Int, Int)] = Array(
    (0x0, 2), (0x1, 2), (0x2, 2), (0x6, 3), (0xE, 4), (0x1E, 5),
    (0x3E, 6), (0x7E, 7), (0xFE, 8))

  /** AC run/level VLC entries of ≤ 12 bits (table 2-B.14, without the
    * sign bit): (bits, code, run, level). EOB ('10') and escape
    * ('0000 01') are handled structurally in the decode loop. The
    * '(0,1) first' special case ('1') likewise. */
  private val AcTable: Array[(Int, Int, Int, Int)] = Array(
    (2, 0x3, 0, 1), // "11" — (0,1) as non-first coefficient
    (3, 0x3, 1, 1), // 011
    (4, 0x4, 0, 2), // 0100
    (4, 0x5, 2, 1), // 0101
    (5, 0x5, 0, 3), // 00101
    (5, 0x7, 3, 1), // 00111
    (5, 0x6, 4, 1), // 00110
    (6, 0x6, 1, 2), // 000110
    (6, 0x7, 5, 1), // 000111
    (6, 0x5, 6, 1), // 000101
    (6, 0x4, 7, 1), // 000100
    (7, 0x6, 0, 4), // 0000110
    (7, 0x4, 2, 2), // 0000100
    (7, 0x7, 8, 1), // 0000111
    (7, 0x5, 9, 1), // 0000101
    (8, 0x26, 0, 5), // 0010 0110
    (8, 0x21, 0, 6), // 0010 0001
    (8, 0x25, 1, 3), // 0010 0101
    (8, 0x24, 3, 2), // 0010 0100
    (8, 0x27, 10, 1), // 0010 0111
    (8, 0x23, 11, 1), // 0010 0011
    (8, 0x22, 12, 1), // 0010 0010
    (8, 0x20, 13, 1), // 0010 0000
    (10, 0x0A, 0, 7), // 0000 0010 10
    (10, 0x0C, 1, 4), // 0000 0011 00
    (10, 0x0B, 2, 3), // 0000 0010 11
    (10, 0x0F, 4, 2), // 0000 0011 11
    (10, 0x09, 5, 2), // 0000 0010 01
    (10, 0x0E, 14, 1), // 0000 0011 10
    (10, 0x0D, 15, 1), // 0000 0011 01
    (10, 0x08, 16, 1), // 0000 0010 00
    (12, 0x1D, 0, 8), // 0000 0001 1101
    (12, 0x18, 0, 9), // 0000 0001 1000
    (12, 0x13, 0, 10), // 0000 0001 0011
    (12, 0x10, 0, 11), // 0000 0001 0000
    (12, 0x1B, 1, 5), // 0000 0001 1011
    (12, 0x14, 2, 4), // 0000 0001 0100
    (12, 0x1C, 3, 3), // 0000 0001 1100
    (12, 0x12, 4, 3), // 0000 0001 0010
    (12, 0x1E, 6, 2), // 0000 0001 1110
    (12, 0x15, 7, 2), // 0000 0001 0101
    (12, 0x11, 8, 2), // 0000 0001 0001
    (12, 0x1F, 17, 1), // 0000 0001 1111
    (12, 0x1A, 18, 1), // 0000 0001 1010
    (12, 0x19, 19, 1), // 0000 0001 1001
    (12, 0x17, 20, 1), // 0000 0001 0111
    (12, 0x16, 21, 1)) // 0000 0001 0110

  /** macroblock_address_increment VLCs for increments 1–15 (2-B.1);
    * escape ('0000 0001 000', +33) and stuffing ('0000 0001 111')
    * handled structurally. Larger increments refuse (subset noted in
    * the object doc — the intra fixtures use 1). */
  private val MbIncr: Array[(Int, Int, Int)] = Array(
    (1, 0x1, 1), (3, 0x3, 2), (3, 0x2, 3), (4, 0x3, 4), (4, 0x2, 5),
    (5, 0x3, 6), (5, 0x2, 7), (7, 0x7, 8), (7, 0x6, 9),
    (8, 0xB, 10), (8, 0xA, 11), (8, 0x9, 12), (8, 0x8, 13),
    (8, 0x7, 14), (8, 0x6, 15))

  // ---- decode ----------------------------------------------------------

  private final case class SeqHeader(width: Int, height: Int,
    intraQuant: Array[Int], bodyStartByte: Int)

  /** Parse the sequence header at `off` (byte offset of its 00 00 01
    * prefix). Returns None on truncation or hostile dimensions. */
  private def parseSeqHeader(d: Array[Byte], off: Int): Option[SeqHeader] = {
    val br = new BitReader(d, (off + 4).toLong * 8)
    val w = br.read(12); val h = br.read(12)
    br.read(4); br.read(4) // aspect, frame rate
    br.read(18); br.read(1); br.read(10); br.read(1) // bitrate..constrained
    if (w <= 0 || h <= 0) return None
    val maxPixels = math.max(1L << 26, 256L * d.length)
    if (w.toLong * h > maxPixels) return None
    val iq = new Array[Int](64)
    if (br.read(1) == 1) { // load_intra_quantizer_matrix (zigzag order)
      var i = 0
      while (i < 64) {
        val v = br.read(8)
        if (v <= 0) return None
        iq(ZigZag(i)) = v
        i += 1
      }
    } else System.arraycopy(DefaultIntraQuant, 0, iq, 0, 64)
    if (br.read(1) == 1) { // load_non_intra matrix: present but unused here
      var i = 0
      while (i < 64) { if (br.read(8) < 0) return None; i += 1 }
    }
    if (br.bitsLeft < 0) None
    else Some(SeqHeader(w, h, iq, ((br.pos + 7) / 8).toInt))
  }

  /** One 8×8 intra block: DC (predicted) + AC run/level stream through
    * dequant + oddification into raster order. Returns the new DC
    * predictor, or Int.MinValue on a refusal (truncation / unknown
    * VLC). `out` receives dequantized coefficients (raster order). */
  private def decodeBlock(br: BitReader, out: Array[Int], dcPast: Int,
      luma: Boolean, qscale: Int, iq: Array[Int]): Int = {
    java.util.Arrays.fill(out, 0)
    // DC: size VLC (max 7/8 bits), then the differential bits
    val table = if (luma) DcLuma else DcChroma
    var size = -1
    var bits = 0; var code = 0
    while (size < 0 && bits < 9) {
      code = (code << 1) | { val b = br.read(1); if (b < 0) return Int.MinValue; b }
      bits += 1
      var s = 0
      while (s < table.length && size < 0) {
        if (table(s)._2 == bits && table(s)._1 == code) size = s
        s += 1
      }
    }
    if (size < 0) return Int.MinValue
    val diff =
      if (size == 0) 0
      else {
        val v = br.read(size)
        if (v < 0) return Int.MinValue
        if ((v & (1 << (size - 1))) != 0) v else v - ((1 << size) - 1)
      }
    // predictor lives on the RECONSTRUCTED (x8) scale (reset 1024 =
    // 128*8); the differential on the quantized scale — recon =
    // past + diff*8. Intra DC quantizer is 8; no mismatch control.
    val dc = dcPast + diff * 8
    out(0) = dc
    // AC: run/level until EOB
    var idx = 0
    var done = false
    while (!done) {
      val p2 = br.peek(2)
      if (p2 < 0) return Int.MinValue
      if (p2 == 2) { br.read(2); done = true } // EOB "10"
      else {
        var run = -1; var level = 0
        if (br.peek(6) == 1) { // escape "000001"
          br.read(6)
          run = br.read(6)
          val l8 = br.read(8)
          if (run < 0 || l8 < 0) return Int.MinValue
          if (l8 == 0 || l8 == 128) { // 16-bit form
            val lo = br.read(8)
            if (lo < 0) return Int.MinValue
            level = if (l8 == 0) lo else lo - 256
          } else level = if (l8 < 128) l8 else l8 - 256
          if (level == 0) return Int.MinValue
        } else {
          // longest table code is 12 bits + sign
          var bits2 = 0; var code2 = 0
          while (run < 0 && bits2 < 13) {
            val b = br.read(1)
            if (b < 0) return Int.MinValue
            code2 = (code2 << 1) | b
            bits2 += 1
            var s = 0
            while (s < AcTable.length && run < 0) {
              val e = AcTable(s)
              if (e._1 == bits2 && e._2 == code2) { run = e._3; level = e._4 }
              s += 1
            }
          }
          if (run < 0) return Int.MinValue // 13/14-bit codes: refuse
          val sign = br.read(1)
          if (sign < 0) return Int.MinValue
          if (sign == 1) level = -level
        }
        idx += run + 1
        if (idx > 63) return Int.MinValue
        val raster = ZigZag(idx)
        // intra reconstruction with the spec's oddification mismatch
        // control and [-2048, 2047] saturation
        var r = (2 * level * qscale * iq(raster)) / 16
        if ((r & 1) == 0) r = r - Integer.signum(r)
        if (r > 2047) r = 2047; if (r < -2048) r = -2048
        out(raster) = r
      }
    }
    dc
  }

  /** 8×8 double-precision IDCT, clamped to [0, 255]. */
  private[operators] def idct(coef: Array[Int]): Array[Int] = {
    val out = new Array[Int](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          var u = 0
          while (u < 8) {
            val c = coef(v * 8 + u)
            if (c != 0) {
              val cu = if (u == 0) 0.70710678118654752 else 1.0
              val cv = if (v == 0) 0.70710678118654752 else 1.0
              s += cu * cv * c *
                math.cos((2 * x + 1) * u * math.Pi / 16) *
                math.cos((2 * y + 1) * v * math.Pi / 16)
            }
            u += 1
          }
          v += 1
        }
        val p = math.rint(s / 4.0)
        out(y * 8 + x) =
          if (p < 0) 0 else if (p > 255) 255 else p.toInt
        x += 1
      }
      y += 1
    }
    out
  }

  /** Decode the FIRST I-picture of an MPEG-1 video elementary stream
    * into (width, height, Y plane, Cb plane, Cr plane) — chroma at
    * quarter resolution (4:2:0). None on anything undecodable:
    * truncation, P/B-only streams, VLC codes outside the implemented
    * subset, hostile declared dimensions. */
  private[graft] def decodeIFramePlanes(data: Array[Byte])
      : Option[(Int, Int, Array[Int], Array[Int], Array[Int])] = {
    try {
      val seqOff = Iterator.iterate(nextStartCode(data, 0)) {
        case Some((code, off)) if code != 0xB3 =>
          nextStartCode(data, off + 4)
        case other => other
      }.collectFirst {
        case None => return None
        case Some((0xB3, off)) => off
      }.getOrElse(return None)
      val sh = parseSeqHeader(data, seqOff) match {
        case Some(s) => s
        case None => return None
      }
      val mbW = (sh.width + 15) / 16
      val mbH = (sh.height + 15) / 16
      val lw = mbW * 16; val lh = mbH * 16
      // find the first I-picture BEFORE allocating the planes: a
      // hostile header's declared dimensions must not cost allocation
      // unless the stream actually carries a picture to decode
      var scan = sh.bodyStartByte
      var picStart = -1
      while (picStart < 0) {
        nextStartCode(data, scan) match {
          case Some((0x00, off)) =>
            val br = new BitReader(data, (off + 4).toLong * 8)
            br.read(10) // temporal reference
            val ptype = br.read(3)
            if (ptype == 1) picStart = off
            else if (ptype < 0) return None
            else scan = off + 4 // skip non-I pictures
          case Some((0xB7, _)) => return None // sequence end, no I
          case Some((_, off)) => scan = off + 4
          case None => return None
        }
      }
      val yP = new Array[Int](lw * lh)
      val cbP = new Array[Int](lw / 2 * (lh / 2))
      val crP = new Array[Int](lw / 2 * (lh / 2))
      // slices: start codes 0x01..0xAF after the picture header
      var sliceScan = picStart + 4
      var decodedAny = false
      var continue = true
      while (continue) {
        nextStartCode(data, sliceScan) match {
          case Some((code, off)) if code >= 0x01 && code <= 0xAF =>
            val sliceRow = code - 1
            val br = new BitReader(data, (off + 4).toLong * 8)
            var qscale = br.read(5)
            if (qscale <= 0) return None
            while (br.read(1) == 1) { if (br.read(8) < 0) return None }
            var mbAddr = sliceRow * mbW - 1
            var dcY = 1024; var dcCb = 1024; var dcCr = 1024
            val coef = new Array[Int](64)
            var sliceDone = false
            while (!sliceDone) {
              // macroblock_address_increment (stuffing + escape first)
              var incr = 0
              var more = true
              while (more) {
                if (br.peek(11) == 0xF) { br.read(11); () } // stuffing
                else if (br.peek(11) == 0x8) { br.read(11); incr += 33 }
                else more = false
              }
              var found = -1
              var bits = 0; var code2 = 0
              while (found < 0 && bits < 9) {
                val b = br.read(1)
                if (b < 0) return None
                code2 = (code2 << 1) | b
                bits += 1
                var s = 0
                while (s < MbIncr.length && found < 0) {
                  val e = MbIncr(s)
                  if (e._1 == bits && e._2 == code2) found = e._3
                  s += 1
                }
              }
              if (found < 0) return None
              incr += found
              if (incr > 1) { dcY = 1024; dcCb = 1024; dcCr = 1024 }
              mbAddr += incr
              if (mbAddr >= mbW * mbH) return None
              // macroblock_type, I-picture: 1 = intra, 01 = intra+quant
              val t1 = br.read(1)
              if (t1 < 0) return None
              if (t1 == 0) {
                if (br.read(1) != 1) return None
                val q = br.read(5)
                if (q <= 0) return None
                qscale = q
              }
              val mbx = (mbAddr % mbW) * 16
              val mby = (mbAddr / mbW) * 16
              var blk = 0
              while (blk < 6) {
                val luma = blk < 4
                val dcIn = if (luma) dcY else if (blk == 4) dcCb else dcCr
                val dcOut = decodeBlock(br, coef, dcIn, luma, qscale,
                  sh.intraQuant)
                if (dcOut == Int.MinValue) return None
                if (luma) dcY = dcOut
                else if (blk == 4) dcCb = dcOut else dcCr = dcOut
                val px = idct(coef)
                if (luma) {
                  val bx = mbx + (blk % 2) * 8
                  val by = mby + (blk / 2) * 8
                  var r = 0
                  while (r < 8) {
                    var c = 0
                    while (c < 8) {
                      yP((by + r) * lw + bx + c) = px(r * 8 + c)
                      c += 1
                    }
                    r += 1
                  }
                } else {
                  val plane = if (blk == 4) cbP else crP
                  val bx = mbx / 2; val by = mby / 2
                  var r = 0
                  while (r < 8) {
                    var c = 0
                    while (c < 8) {
                      plane((by + r) * (lw / 2) + bx + c) = px(r * 8 + c)
                      c += 1
                    }
                    r += 1
                  }
                }
                blk += 1
              }
              decodedAny = true
              // end of slice: byte-aligned next start code, or the
              // spec's 23-zero next-start check via peek
              val save = br.pos
              br.alignByte()
              if (br.bitsLeft < 24 || br.peek(24) == 1) sliceDone = true
              else br.pos = save
            }
            sliceScan = off + 4
          case _ => continue = false
        }
      }
      if (!decodedAny) None
      else Some((sh.width, sh.height, yP, cbP, crP))
    } catch { case _: Exception => None }
  }

  /** The seam decoder: claims the MPEG-1 video fourccs, decodes the
    * first I-picture of each frame payload (an all-intra stream's
    * every frame is one). Feature via the shared image kernel over
    * the decoded raster. */
  object Decoder extends Multimodal.VideoFrameDecoder {
    def name: String = "mpeg1-intra"
    private val ids = Set("mpg1", "mpeg", "mpeg1", "m1v", "pim1")
    def claims(codec: String): Boolean = ids(codec)

    def decode(codec: String, width: Int, height: Int,
        payload: Array[Byte]): Option[(Int, Int, Array[Float])] =
      decodeRaster(codec, width, height, payload)
        .map(img => (img.getWidth, img.getHeight,
          Multimodal.imageFeature(img)))

    override def decodeRaster(codec: String, width: Int, height: Int,
        payload: Array[Byte])
        : Option[java.awt.image.BufferedImage] =
      decodeIFramePlanes(payload).map { case (w, h, yP, cbP, crP) =>
        val lw = (w + 15) / 16 * 16
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val yy = 1.164 * (yP(y * lw + x) - 16)
            val cb = cbP(y / 2 * (lw / 2) + x / 2)
            val cr = crP(y / 2 * (lw / 2) + x / 2)
            def c(v: Double): Int =
              if (v < 0.5) 0 else if (v > 254.5) 255 else (v + 0.5).toInt
            img.setRGB(x, y,
              (c(yy + 1.596 * (cr - 128)) << 16) |
                (c(yy - 0.392 * (cb - 128) - 0.813 * (cr - 128)) << 8) |
                c(yy + 2.017 * (cb - 128)))
            x += 1
          }
          y += 1
        }
        img
      }
  }

  // ---- intra encoder (fixtures) ---------------------------------------

  private final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var acc = 0; private var nbits = 0
    def write(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1)
        nbits += 1
        if (nbits == 8) { buf.write(acc); acc = 0; nbits = 0 }
        i -= 1
      }
    }
    def alignZero(): Unit = while (nbits != 0) write(0, 1)
    def bytes: Array[Byte] = { alignZero(); buf.toByteArray }
  }

  private def fdct(block: Array[Double]): Array[Double] = {
    val out = new Array[Double](64)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            s += block(y * 8 + x) *
              math.cos((2 * x + 1) * u * math.Pi / 16) *
              math.cos((2 * y + 1) * v * math.Pi / 16)
            x += 1
          }
          y += 1
        }
        val cu = if (u == 0) 0.70710678118654752 else 1.0
        val cv = if (v == 0) 0.70710678118654752 else 1.0
        out(v * 8 + u) = s * cu * cv / 4.0
        u += 1
      }
      v += 1
    }
    out
  }

  /** Encode one 8×8 block: quantize (intra), DC differential VLC, AC
    * as table-subset VLC or escape, EOB. Returns the new DC
    * predictor. */
  private def encodeBlock(bw: BitWriter, pixels: Array[Double],
      dcPast: Int, luma: Boolean, qscale: Int): Int = {
    val f = fdct(pixels)
    val q = new Array[Int](64)
    q(0) = math.rint(f(0) / 8.0).toInt
    var i = 1
    while (i < 64) {
      val raster = ZigZag(i)
      var lv = math.rint(f(raster) * 16.0 /
        (2.0 * qscale * DefaultIntraQuant(raster))).toInt
      if (lv > 127) lv = 127; if (lv < -127) lv = -127
      q(i) = lv // zigzag-ordered from here on
      i += 1
    }
    // DC
    val diff = q(0) - dcPast
    val size = 32 - Integer.numberOfLeadingZeros(math.abs(diff))
    val table = if (luma) DcLuma else DcChroma
    bw.write(table(size)._1, table(size)._2)
    if (size > 0) {
      val v = if (diff >= 0) diff else diff + ((1 << size) - 1)
      bw.write(v, size)
    }
    // AC: run/level
    var run = 0
    i = 1
    while (i < 64) {
      val lv = q(i)
      if (lv == 0) run += 1
      else {
        val a = math.abs(lv)
        AcTable.find(e => e._3 == run && e._4 == a) match {
          case Some((bits, code, _, _)) =>
            bw.write(code, bits)
            bw.write(if (lv < 0) 1 else 0, 1)
          case None =>
            bw.write(1, 6) // escape
            bw.write(run, 6)
            bw.write(lv & 0xFF, 8) // |lv| <= 127: 8-bit form
        }
        run = 0
      }
      i += 1
    }
    bw.write(2, 2) // EOB
    q(0)
  }

  /** A standard-compliant all-intra MPEG-1 video elementary stream of
    * one I-picture over the given 4:2:0 planes (dimensions must be
    * multiples of 16). Sequence header (default matrices) + picture +
    * one slice per macroblock row + sequence end. */
  private[graft] def encodeIFrame(w: Int, h: Int, yP: Array[Int],
      cbP: Array[Int], crP: Array[Int], qscale: Int = 8): Array[Byte] = {
    require(w % 16 == 0 && h % 16 == 0, "dims must be multiples of 16")
    // slice start codes are 0x01 + row and may not pass 0xAF — a
    // taller image would silently emit reserved/sequence codes as
    // 'slices' (175 macroblock rows = 2800 px, plenty for fixtures)
    require(h <= 2800, "encodeIFrame supports heights up to 2800")
    require(qscale >= 1 && qscale <= 31, "qscale in 1..31")
    val out = new java.io.ByteArrayOutputStream()
    def startCode(c: Int): Unit = {
      out.write(0); out.write(0); out.write(1); out.write(c)
    }
    // sequence header
    startCode(0xB3)
    val sh = new BitWriter
    sh.write(w, 12); sh.write(h, 12)
    sh.write(1, 4) // aspect 1:1
    sh.write(5, 4) // 30 fps
    sh.write(0x3FFFF, 18); sh.write(1, 1) // bitrate variable + marker
    sh.write(0, 10); sh.write(0, 1) // vbv, constrained
    sh.write(0, 1); sh.write(0, 1) // default intra + non-intra matrices
    out.write(sh.bytes)
    // picture header: I-type
    startCode(0x00)
    val ph = new BitWriter
    ph.write(0, 10); ph.write(1, 3); ph.write(0xFFFF, 16)
    ph.write(0, 1) // no extra information
    out.write(ph.bytes)
    val mbW = w / 16
    // one slice per macroblock row
    var row = 0
    while (row < h / 16) {
      startCode(0x01 + row)
      val bw = new BitWriter
      bw.write(qscale, 5)
      bw.write(0, 1) // no slice extra information
      // encoder predictors live on the QUANTIZED scale (reset 128):
      // diff = q0 - past, matching the decoder's past + diff*8
      var dcY = 128; var dcCb = 128; var dcCr = 128
      var mx = 0
      while (mx < mbW) {
        bw.write(1, 1) // address increment 1
        bw.write(1, 1) // macroblock_type: intra
        val block = new Array[Double](64)
        var blk = 0
        while (blk < 6) {
          val luma = blk < 4
          var r = 0
          while (r < 8) {
            var c = 0
            while (c < 8) {
              block(r * 8 + c) =
                if (luma) {
                  val px = mx * 16 + (blk % 2) * 8 + c
                  val py = row * 16 + (blk / 2) * 8 + r
                  yP(py * w + px).toDouble
                } else {
                  val px = mx * 8 + c
                  val py = row * 8 + r
                  (if (blk == 4) cbP else crP)(py * (w / 2) + px).toDouble
                }
              c += 1
            }
            r += 1
          }
          val dcIn = if (luma) dcY else if (blk == 4) dcCb else dcCr
          val dcOut = encodeBlock(bw, block, dcIn, luma, qscale)
          if (luma) dcY = dcOut
          else if (blk == 4) dcCb = dcOut else dcCr = dcOut
          blk += 1
        }
        mx += 1
      }
      out.write(bw.bytes)
      row += 1
    }
    startCode(0xB7) // sequence end
    out.toByteArray
  }
}
