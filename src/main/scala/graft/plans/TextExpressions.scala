package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native shingle generation.
  *
  * The composable form — `transform(sequence(1, len-n+1), i =>
  * substr(norm, i, n))` — hides a quadratic trap: the lambda body's
  * captured subexpression (`norm` = lower+regex-collapse of the text) is
  * re-evaluated for EVERY array element in interpreted eval, so a
  * 300-shingle document runs its regex 300×. Measured: 15 s just to
  * shingle 5k docs at sf0.1. This expression normalizes once and emits
  * all windows in a single pass.
  */
object TextKernels {

  // Pattern.compile once — String.replaceAll/split(regex) recompile the
  // regex on every call, which is per-row cost inside the kernel.
  private val WS = java.util.regex.Pattern.compile("\\s+")

  /** Lowercase + collapse whitespace runs to single spaces. */
  def normalize(s: UTF8String): String =
    WS.matcher(s.toString.trim.toLowerCase(java.util.Locale.ROOT))
      .replaceAll(" ")

  // One Deflater AND one scratch output buffer per executor thread:
  // allocation + native-buffer init per row would dominate the kernel
  // (an 8 KB scratch array per row alone is GB-scale garbage over a
  // real corpus). Task threads are pooled and bounded, so the
  // retained state is |threads| × ~264 KB, not per-row. Raw deflate
  // (nowrap) so the 6-byte zlib envelope doesn't skew short docs.
  private final class DeflateScratch {
    val deflater = new java.util.zip.Deflater(6, true)
    val buf = new Array[Byte](8192)
  }
  private val deflaters =
    ThreadLocal.withInitial[DeflateScratch](() => new DeflateScratch)

  /** Size in bytes of the raw-DEFLATE (level 6) compression of the
    * UTF-8 text — the numerator of the compression-ratio quality
    * signal (Gopher-style: near-incompressible text is noise/binary
    * spill, hyper-compressible text is repeated boilerplate). */
  def deflatedSize(s: UTF8String): Int = {
    val sc = deflaters.get()
    val d = sc.deflater
    d.setInput(s.getBytes)
    d.finish()
    var total = 0
    while (!d.finished()) total += d.deflate(sc.buf)
    // reset AFTER the drain, not (only) before the next call: the
    // Deflater holds a reference to the input array, and this thread
    // may never run the kernel again — without the reset each pooled
    // thread pins its last document's bytes for the executor lifetime
    d.reset()
    total
  }

  def charShingles(s: UTF8String, n: Int): ArrayData = {
    val t = normalize(s)
    if (t.length < n) return new GenericArrayData(Array[Any](UTF8String.fromString(t)))
    val out = new Array[Any](t.length - n + 1)
    var i = 0
    while (i + n <= t.length) {
      out(i) = UTF8String.fromString(t.substring(i, i + n))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Normalized word split (trim, lowercase, whitespace runs). */
  def splitWords(s: UTF8String): Array[String] =
    WS.split(s.toString.trim.toLowerCase(java.util.Locale.ROOT))

  /** Whitespace token count with the EXACT semantics of
    * `size(split(trim(text), "\\s+"))` — including the empty-string
    * edge (`"".split` yields `[""]`, so blank text counts 1) — but as
    * one allocation-free char scan instead of materializing the split
    * array just to take its length. */
  def tokenCount(s: UTF8String): Int = {
    val t = s.toString.trim  // String.trim (c <= 0x20), matching trim()
    if (t.isEmpty) return 1
    @inline def ws(c: Char): Boolean = c == ' ' || c == '\t' ||
      c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
    var count = 0
    var inToken = false
    var i = 0
    while (i < t.length) {
      val w = ws(t.charAt(i))
      if (!w && !inToken) count += 1
      inToken = !w
      i += 1
    }
    count
  }

  /** Multiplicity of the most frequent element of a string array (0 for
    * empty) — one hash-count pass per row. Replaces the composable
    * array_sort + `aggregate`(run-length) form, whose lambda evaluates
    * interpreted per element. */
  def topCount(arr: ArrayData): Int = {
    val n = arr.numElements()
    if (n == 0) return 0
    val counts = new java.util.HashMap[UTF8String, Integer](n * 2)
    var best = 0
    var i = 0
    while (i < n) {
      val k = arr.getUTF8String(i)
      val c = counts.merge(k, 1, (a, b) => a + b)
      if (c > best) best = c
      i += 1
    }
    best
  }

  /** Shared hash-count preamble of the gram char-frac kernels:
    * per-gram multiplicities plus the total gram char mass
    * (Σ count·chars = Σ chars over occurrences). */
  private def gramCounts(arr: ArrayData)
      : (java.util.HashMap[UTF8String, Integer], Long) = {
    val n = arr.numElements()
    val counts = new java.util.HashMap[UTF8String, Integer](n * 2)
    var total = 0L
    var i = 0
    while (i < n) {
      val k = arr.getUTF8String(i)
      counts.merge(k, 1, (a, b) => a + b)
      total += k.numChars()
      i += 1
    }
    (counts, total)
  }

  /** Fraction of gram char mass held by the MOST frequent element:
    * count·chars(top) / Σ count·chars — a generic array-level
    * mode-mass ratio with gram char mass as the denominator (NOT the
    * Gopher table-A1 quantity, which normalizes by text chars — that
    * faithful form lives in [[repetitionNgramFeatures]]; this
    * primitive is self-contained over any string array and always in
    * [0,1]). Ties break by higher count,
    * then longer gram, then binary-ascending gram — a TOTAL rule the
    * oracle replays as ORDER BY c DESC, length(g) DESC, g. One hash
    * pass, row-local. */
  def topGramCharFrac(arr: ArrayData): Double = {
    if (arr.numElements() == 0) return 0.0
    val (counts, total) = gramCounts(arr)
    if (total == 0L) return 0.0
    var bestC = 0
    var bestLen = -1
    var bestKey: UTF8String = null
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue.intValue
      val k = e.getKey
      val l = k.numChars()
      if (c > bestC || (c == bestC && (l > bestLen ||
          (l == bestLen && k.compareTo(bestKey) < 0)))) {
        bestC = c; bestLen = l; bestKey = k
      }
    }
    bestC.toLong * bestLen / total.toDouble
  }

  /** Duplicated-gram char mass over total gram char mass:
    * Σ_{count≥2} count·chars / Σ count·chars — the generic array-level
    * duplicate-mass ratio, same non-Gopher denominator note as
    * [[topGramCharFrac]] (the table-A1-faithful coverage form lives
    * in [[repetitionNgramFeatures]]). */
  def dupGramCharFrac(arr: ArrayData): Double = {
    if (arr.numElements() == 0) return 0.0
    val (counts, total) = gramCounts(arr)
    if (total == 0L) return 0.0
    var dup = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue.intValue
      if (c >= 2) dup += c.toLong * e.getKey.numChars()
    }
    dup.toDouble / total.toDouble
  }

  /** Code-point comparison — identical order to UTF-8 binary
    * comparison ([[UTF8String.compareTo]]) and DuckDB's default
    * collation; a plain String.compareTo (UTF-16 code units) sorts
    * supplementary-plane grams BELOW U+E000..U+FFFF and would break
    * the tie rule's oracle replay on emoji-bearing text. */
  private def cpCompare(a: String, b: String): Int = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return ca - cb
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    (a.length - i) - (b.length - j)
  }

  /** ALL NINE Gopher n-gram repetition fractions in one pass — the
    * text tokenizes ONCE; per gram size the joined gram strings feed
    * one reused hash map, and top (k=2..4) and dup (k=5..10)
    * fractions come off the same counts. RAW (un-rounded) doubles —
    * the Column layer rounds. Fewer than k words → 0.0 for that k.
    *
    * Normalization is TEXT characters, as in Rae et al. table A1 —
    * concretely the total WORD char mass W = Σ codepoints over words
    * (the whitespace-canonical form of "text chars": separators
    * excluded on both sides of every ratio, so the ratios are
    * whitespace-convention-independent):
    *  - top k-gram frac = count(top)·wordChars(top) / W — every
    *    occurrence counted, the published rule's numerator (can
    *    exceed 1 on degenerate overlap, e.g. "ab ab ab ab"; the gate
    *    reads that as extreme repetition, which it is);
    *  - dup k-gram frac = (Σ chars of words COVERED by ≥1 occurrence
    *    of a gram appearing ≥2×) / W — positional coverage, each
    *    covered word counted ONCE (the position-marking formulation;
    *    a mass numerator Σ count·chars would count overlapping
    *    occurrences ~k times and overshoot the paper's units as far
    *    up as gram-mass normalization undershot them). Always ≤ 1.
    * The table-A1 thresholds therefore apply in the paper's own
    * units (see [[graft.functions.Text.repetition_ngram_keep]]).
    * The generic array-level kernels [[topGramCharFrac]] /
    * [[dupGramCharFrac]] keep their self-contained gram-mass
    * semantics — this fused kernel is the Gopher-faithful surface. */
  def repetitionNgramFeatures(s: UTF8String)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val words = splitWords(s)
    val out = new Array[Any](9)
    val wLens = new Array[Int](words.length)
    var wTotal = 0L
    var wi = 0
    while (wi < words.length) {
      val l = words(wi).codePointCount(0, words(wi).length)
      wLens(wi) = l
      wTotal += l
      wi += 1
    }
    val counts = new java.util.HashMap[String, Integer](64)
    var idx = 0
    var k = 2
    while (k <= 10) {
      var frac = 0.0
      if (words.length >= k && wTotal > 0L) {
        counts.clear()
        val nG = words.length - k + 1
        val grams = new Array[String](nG)
        var i = 0
        while (i < nG) {
          val sb = new java.lang.StringBuilder(16 * k)
          var j = 0
          while (j < k) {
            if (j > 0) sb.append(' ')
            sb.append(words(i + j))
            j += 1
          }
          val g = sb.toString
          grams(i) = g
          counts.merge(g, 1, (a, b) => a + b)
          i += 1
        }
        if (k <= 4) {
          var bestC = 0
          var bestLen = -1
          var bestKey: String = null
          val it = counts.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            val c = e.getValue.intValue
            val g = e.getKey
            val l = g.codePointCount(0, g.length)
            if (c > bestC || (c == bestC && (l > bestLen ||
                (l == bestLen && cpCompare(g, bestKey) < 0)))) {
              bestC = c; bestLen = l; bestKey = g
            }
          }
          // word chars of the joined gram = codepoints − (k−1) spaces
          frac = bestC.toLong * (bestLen - (k - 1)) / wTotal.toDouble
        } else {
          val covered = new Array[Boolean](words.length)
          var o = 0
          while (o < nG) {
            if (counts.get(grams(o)).intValue >= 2) {
              var p = o
              val e = o + k
              while (p < e) { covered(p) = true; p += 1 }
            }
            o += 1
          }
          var cov = 0L
          var p = 0
          while (p < words.length) {
            if (covered(p)) cov += wLens(p)
            p += 1
          }
          frac = cov.toDouble / wTotal.toDouble
        }
      }
      out(idx) = frac
      idx += 1
      k += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
  }

  /** Unicode normalization (UAX #15). Two fast paths before the
    * (allocating) `java.text.Normalizer` call: pure-ASCII byte scan —
    * ASCII is normalized under all four forms, and post-HTML-strip web
    * text is overwhelmingly ASCII, so the common row never decodes to
    * a String at all — and the quick-check `isNormalized` pass, which
    * returns the input UTF8String untouched for already-normalized
    * non-ASCII text (no re-encode). Row-local: normalizing a 100 TB
    * corpus is one map-only scan with zero per-executor state. */
  def unicodeNormalize(s: UTF8String, form: java.text.Normalizer.Form)
      : UTF8String = {
    val nb = s.numBytes
    var i = 0
    while (i < nb && s.getByte(i) >= 0) i += 1
    if (i == nb) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, form))
  }

  private val CP1252 = java.nio.charset.Charset.forName("windows-1252")

  /** One round of the classic mojibake inversion: the string's chars
    * map back to the windows-1252 bytes a broken pipeline read them
    * from, and those bytes strict-decode as UTF-8. Null = not mojibake
    * (some char has no cp1252 byte, the bytes aren't valid UTF-8, or
    * the round-trip is the identity — pure single-byte text). REPORT
    * everywhere: String.getBytes would silently '?'-substitute and
    * manufacture a "fix". */
  private def unmojibakeOnce(str: String): String = {
    import java.nio.charset.{CharacterCodingException, CodingErrorAction}
    val enc = CP1252.newEncoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    val bytes =
      try enc.encode(java.nio.CharBuffer.wrap(str))
      catch { case _: CharacterCodingException => return null }
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    val out =
      try dec.decode(bytes).toString
      catch { case _: CharacterCodingException => return null }
    if (out == str) null else out
  }

  /** Mojibake repair (the ftfy `fix_encoding` core case): UTF-8 text
    * that was decoded as windows-1252 somewhere upstream and re-saved,
    * so `é` arrives as `Ã©` and `’` as `â€™`. Whole-string and
    * conservative — the repair applies only when EVERY char round-trips
    * (cp1252-encodable AND the byte string is valid UTF-8 with at least
    * one multibyte sequence), so legitimate `café` (é = 0xE9, never a
    * UTF-8 lead byte for what follows) and CJK/emoji text (not
    * cp1252-encodable) pass through untouched. Fixpoint-iterates ≤3
    * rounds for double/triple-encoded text. ASCII byte-scan fast path
    * returns the input UTF8String unallocated — the 100 TB common path.
    * Row-local: one map-only scan, zero per-executor state.
    *
    * Mixed-damage documents (one mojibake line pasted into clean
    * non-ASCII text) stay untouched at whole-doc granularity by
    * design; to repair per line/paragraph, apply the kernel inside a
    * higher-order transform over the unit split —
    * `array_join(transform(split(t, "\n", -1), u => fix_mojibake(u)),
    * "\n")` — which is still one map-only scan. */
  def fixMojibake(s: UTF8String): UTF8String = {
    val nb = s.numBytes
    var i = 0
    while (i < nb && s.getByte(i) >= 0) i += 1
    if (i == nb) return s
    var cur = s.toString
    var rounds = 0
    var next = unmojibakeOnce(cur)
    while (next != null) {
      cur = next
      rounds += 1
      next = if (rounds < 3) unmojibakeOnce(cur) else null
    }
    if (rounds == 0) s else UTF8String.fromString(cur)
  }

  /** Per-script letter counts in ONE code-point pass — the routing
    * signal of multilingual pipelines (CCNet/mC4 route by script
    * before language ID; a Latin-script langid model is useless on
    * Devanagari). Buckets follow the Unicode Script property
    * (`Character.UnicodeScript`, the same standard RE2's `\p{Xxx}`
    * implements — the oracle cross-checks the two tables): latin,
    * cyrillic, greek, arabic, han, hangul, everything-else. ASCII
    * byte-scan fast path counts [A-Za-z] without ever decoding to a
    * String — the 100 TB common path allocates nothing. */
  def scriptCounts(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val nb = s.numBytes
    var i = 0
    while (i < nb && s.getByte(i) >= 0) i += 1
    if (i == nb) { // pure ASCII: every letter is Latin
      var lat = 0L
      var j = 0
      while (j < nb) {
        val b = s.getByte(j)
        if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) lat += 1
        j += 1
      }
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](lat, lat, 0L, 0L, 0L, 0L, 0L, 0L))
    }
    val str = s.toString
    var nL = 0L; var lat = 0L; var cyr = 0L; var grk = 0L
    var ara = 0L; var han = 0L; var hang = 0L; var oth = 0L
    var p = 0
    while (p < str.length) {
      val cp = str.codePointAt(p)
      if (Character.isLetter(cp)) {
        nL += 1
        import Character.UnicodeScript
        UnicodeScript.of(cp) match {
          case UnicodeScript.LATIN    => lat += 1
          case UnicodeScript.CYRILLIC => cyr += 1
          case UnicodeScript.GREEK    => grk += 1
          case UnicodeScript.ARABIC   => ara += 1
          case UnicodeScript.HAN      => han += 1
          case UnicodeScript.HANGUL   => hang += 1
          case _                      => oth += 1
        }
      }
      p += Character.charCount(cp)
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nL, lat, cyr, grk, ara, han, hang, oth))
  }

  /** Karp-Rabin rolling hashes + winnowing (Schleimer et al. 2003, the
    * MOSS fingerprint): polynomial hashes over every w-codepoint
    * window computed in ONE O(n) rolling pass (each step retires the
    * outgoing codepoint and shifts in the incoming one — the thing
    * "rolling" means; a per-window recompute is O(n·w)), then the
    * winnow: the minimum hash of each k-hash window, distinct, sorted.
    * Winnowing's guarantee: any shared substring of length ≥ w+k−1
    * contributes at least one COMMON fingerprint to both documents, so
    * the fingerprint sets support plagiarism/overlap detection at a
    * ~2/(k+1) sample rate instead of all n hashes. Degenerate inputs
    * keep the guarantee's spirit: text shorter than w yields one hash
    * of the whole text; fewer than k hashes yield their single min.
    * B=257, M=1e9+7 — small enough that DuckDB's 64-bit list_reduce
    * replays the arithmetic exactly. Row-local, zero shuffle. */
  def winnowFingerprints(s: UTF8String, w: Int, k: Int): ArrayData = {
    val M = 1000000007L
    val B = 257L
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    def hashAll(from: Int, until: Int): Long = {
      var h = 0L
      var i = from
      while (i < until) { h = (h * B + cps(i)) % M; i += 1 }
      h
    }
    if (n < w)
      return new GenericArrayData(Array[Any](hashAll(0, n)))
    val nH = n - w + 1
    val hs = new Array[Long](nH)
    hs(0) = hashAll(0, w)
    var pw = 1L // B^(w-1) mod M
    var e = 0
    while (e < w - 1) { pw = pw * B % M; e += 1 }
    var i = 1
    while (i < nH) {
      val dropped = cps(i - 1) % M * pw % M
      hs(i) = ((hs(i - 1) - dropped + M) % M * B + cps(i + w - 1)) % M
      i += 1
    }
    if (nH < k)
      return new GenericArrayData(Array[Any](hs.min))
    val picks = new java.util.TreeSet[java.lang.Long]()
    var p = 0
    while (p <= nH - k) {
      var m = hs(p)
      var j = p + 1
      while (j < p + k) { if (hs(j) < m) m = hs(j); j += 1 }
      picks.add(m)
      p += 1
    }
    val out = new Array[Any](picks.size)
    val it = picks.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next().longValue; o += 1 }
    new GenericArrayData(out)
  }

  def wordShingles(s: UTF8String, n: Int): ArrayData = {
    val words = splitWords(s)
    if (words.length <= n) {
      return new GenericArrayData(
        Array[Any](UTF8String.fromString(words.mkString(" "))))
    }
    val out = new Array[Any](words.length - n + 1)
    var i = 0
    while (i + n <= words.length) {
      val sb = new java.lang.StringBuilder(16 * n)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j)); j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class TokenCountExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_count_native"
  override def nullSafeEval(v: Any): Any =
    TextKernels.tokenCount(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.plans.TextKernels.tokenCount($s)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Row-local, zero-shuffle: compression-ratio scoring of a 100 TB
  * corpus is ONE scan; the per-thread Deflater is the only state.
  * ImplicitCastInputTypes: a non-string argument in the SQL surface
  * coerces (or fails) at ANALYSIS time, not as a mid-query
  * ClassCastException in interpreted eval. */
case class DeflatedSizeExpr(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "deflated_size"
  override def nullSafeEval(v: Any): Any =
    TextKernels.deflatedSize(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.plans.TextKernels.deflatedSize($s)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class TopCountExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "top_count"
  override def nullSafeEval(v: Any): Any =
    TextKernels.topCount(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.plans.TextKernels.topCount($s)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class TopGramCharFracExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "top_gram_char_frac"
  override def nullSafeEval(v: Any): Any =
    TextKernels.topGramCharFrac(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.plans.TextKernels.topGramCharFrac($s)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class DupGramCharFracExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dup_gram_char_frac"
  override def nullSafeEval(v: Any): Any =
    TextKernels.dupGramCharFrac(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.plans.TextKernels.dupGramCharFrac($s)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One-tokenization fused form of the nine Gopher n-gram repetition
  * fractions (see [[TextKernels.repetitionNgramFeatures]]). Field CSE
  * dedupes the nine GetStructField projections of a single kernel
  * call — the EvrSplitExpr precedent. */
case class RepetitionNgramExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = RepetitionNgramExpr.schema
  override def prettyName: String = "repetition_ngram_raw"
  override def nullSafeEval(v: Any): Any =
    TextKernels.repetitionNgramFeatures(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"graft.plans.TextKernels.repetitionNgramFeatures($s)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepetitionNgramExpr {
  val fieldNames: Seq[String] =
    Seq(2, 3, 4).map(k => s"top_${k}gram_char_frac") ++
      (5 to 10).map(k => s"dup_${k}gram_char_frac")
  val schema: StructType = StructType(
    fieldNames.map(StructField(_, DoubleType, nullable = false)))
}

/** Winnowing fingerprints as a codegen'd kernel — see
  * [[TextKernels.winnowFingerprints]]. Complements the whole-doc
  * sha-256 fingerprint (exact dedup) and the shingle MinHash
  * (set-resemblance): winnowing is the POSITIONAL fingerprint — any
  * shared run of ≥ w+k−1 codepoints is guaranteed a common pick, the
  * property plagiarism/overlap detectors need and samplers can't give.
  * Ref: vunnel has only whole-record digests
  * (src/vunnel/utils/hasher.py); the substring-grade fingerprint
  * follows Schleimer et al. */
case class WinnowFingerprintsExpr(child: Expression, w: Int, k: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  require(w > 0 && k > 0, "winnow_fingerprints: w and k must be positive")
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"
  override def nullSafeEval(v: Any): Any =
    TextKernels.winnowFingerprints(v.asInstanceOf[UTF8String], w, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"graft.plans.TextKernels.winnowFingerprints($s, $w, $k)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class ShinglesExpr(child: Expression, n: Int, word: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = if (word) "word_shingles" else "char_shingles"

  override def nullSafeEval(v: Any): Any =
    if (word) TextKernels.wordShingles(v.asInstanceOf[UTF8String], n)
    else TextKernels.charShingles(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (word) "wordShingles" else "charShingles"
    defineCodeGen(ctx, ev, s => s"graft.plans.TextKernels.$fn($s, $n)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Unicode normalization as a codegen'd kernel — the first transform of
  * every published curation pipeline (NFC before tokenization/hashing so
  * that `cafe`+COMBINING-ACUTE and precomposed `café` dedup/shingle
  * identically; NFKC for tokenizer folding of ligatures/fullwidth
  * forms). Composable Spark has no normalizer; a Scala UDF would break
  * the whole-stage-codegen span this sits inside.
  * Ref: vunnel normalizes identifiers per-provider (e.g.
  * src/vunnel/providers/debian/parser.py lowercasing); the corpus-text
  * form follows the published pipelines (Gopher §A.1, C4) instead. */
case class UnicodeNormalizeExpr(child: Expression, form: String)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  require(UnicodeNormalizeExpr.forms.contains(form),
    s"unicode_normalize: form must be one of ${UnicodeNormalizeExpr.forms
        .mkString("/")}, got '$form'")
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = s"unicode_${form.toLowerCase}"
  @transient private lazy val f = java.text.Normalizer.Form.valueOf(form)
  override def nullSafeEval(v: Any): Any =
    TextKernels.unicodeNormalize(v.asInstanceOf[UTF8String], f)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.plans.TextKernels.unicodeNormalize($s, " +
        s"java.text.Normalizer.Form.$form)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeNormalizeExpr {
  val forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")
}

/** Mojibake repair as a codegen'd kernel — see
  * [[TextKernels.fixMojibake]]. Precedes [[UnicodeNormalizeExpr]] in a
  * curation pipeline: encoding damage must be undone before NFC, or the
  * mojibake chars normalize and fossilize.
  * Ref: vunnel ingests vendor feeds as declared-charset HTTP bodies
  * (src/vunnel/utils/http_wrapper.py response.text) and never repairs;
  * web-crawl pipelines (ftfy lineage) must. */
/** Per-script letter counts as a codegen'd struct kernel — see
  * [[TextKernels.scriptCounts]]. Field CSE dedupes the eight
  * GetStructField projections of one kernel call (the
  * RepetitionNgramExpr precedent); derive fractions and the dominant
  * script composably on top ([[graft.functions.Text.scriptFractions]]).
  * Ref: the reference is mono-script metadata (vunnel identifiers);
  * script routing follows the published multilingual pipelines. */
case class ScriptCountsExpr(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ScriptCountsExpr.schema
  override def prettyName: String = "script_counts"
  override def nullSafeEval(v: Any): Any =
    TextKernels.scriptCounts(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.plans.TextKernels.scriptCounts($s)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ScriptCountsExpr {
  /** Canonical bucket order — [[graft.functions.Text.scriptFractions]]'
    * dominant tie-break follows it. */
  val fieldNames: Seq[String] = Seq("n_letters",
    "latin", "cyrillic", "greek", "arabic", "han", "hangul", "other")
  val schema: StructType = StructType(
    fieldNames.map(StructField(_, LongType, nullable = false)))
}

case class FixMojibakeExpr(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "fix_mojibake"
  override def nullSafeEval(v: Any): Any =
    TextKernels.fixMojibake(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.plans.TextKernels.fixMojibake($s)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExpressions {
  import org.apache.spark.sql.graft.bridge.{column, expression}

  def char_shingles(text: Column, n: Int): Column =
    column(ShinglesExpr(expression(text), n, word = false))
  def word_shingles(text: Column, n: Int): Column =
    column(ShinglesExpr(expression(text), n, word = true))
  def token_count(text: Column): Column =
    column(TokenCountExpr(expression(text)))
  def top_count(arr: Column): Column =
    column(TopCountExpr(expression(arr)))
  def top_gram_char_frac(arr: Column): Column =
    column(TopGramCharFracExpr(expression(arr)))
  def dup_gram_char_frac(arr: Column): Column =
    column(DupGramCharFracExpr(expression(arr)))
  def repetition_ngram_raw(text: Column): Column =
    column(RepetitionNgramExpr(expression(text)))
  def deflated_size(text: Column): Column =
    column(DeflatedSizeExpr(expression(text)))
  def unicode_normalize(text: Column, form: String = "NFC"): Column =
    column(UnicodeNormalizeExpr(expression(text), form))
  def fix_mojibake(text: Column): Column =
    column(FixMojibakeExpr(expression(text)))
  def script_counts(text: Column): Column =
    column(ScriptCountsExpr(expression(text)))
  def winnow_fingerprints(text: Column, w: Int = 8, k: Int = 4): Column =
    column(WinnowFingerprintsExpr(expression(text), w, k))
}
