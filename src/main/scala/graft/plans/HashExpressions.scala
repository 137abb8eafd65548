package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native sketch kernels for the dedup operators.
  *
  * The composable form (`transform`/`aggregate` higher-order functions)
  * evaluates its lambda interpreted, per element, with boxing — measured
  * ~20 s for 5k docs × 20 seeds at sf0.1. These expressions do the same
  * math as ONE primitive JVM loop per row inside whole-stage codegen:
  * the entire k-seed MinHash signature (or all 64 SimHash bit-votes) in
  * a single pass over the shingle array. This is the difference between
  * an operator that works and one that survives 100 TB.
  */
object HashKernels {

  /** k-minimum signature: min over shingles of xxh64(xxh64(shingle), seed). */
  def minhash(arr: ArrayData, k: Int): ArrayData = {
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val base = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
          s.numBytes, 42L)
        var j = 0
        while (j < k) {
          val m = XXH64.hashLong(base, j)
          if (m < out(j)) out(j) = m
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Fused normalize→char-shingle→minhash: the whole signature from the
    * raw text in ONE pass, with zero per-shingle allocation on the ASCII
    * fast path (window hashes are computed over byte ranges of the
    * normalized text's UTF-8 buffer). Produces bit-identical output to
    * `minhash(charShingles(text, n), k)` — the composed form allocates a
    * UTF8String per window (~|text| allocations per document), which is
    * the dominant cost of the composed kernel at sf0.1. */
  def minhashText(s: UTF8String, n: Int, k: Int): ArrayData = {
    val t = TextKernels.normalize(s)
    val bytes = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    // Non-ASCII: byte windows != char windows; fall back to the composed
    // path so the output stays identical on every input.
    if (bytes.length != t.length || t.length < n)
      return minhash(TextKernels.charShingles(s, n), k)
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    val off = org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET
    var i = 0
    val last = t.length - n
    while (i <= last) {
      val base = XXH64.hashUnsafeBytes(bytes, off + i, n, 42L)
      var j = 0
      while (j < k) {
        val m = XXH64.hashLong(base, j)
        if (m < out(j)) out(j) = m
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Word n-gram shingles of the normalized text, each hashed to 64 bits,
    * returned sorted + deduped — the representation that makes pairwise
    * exact-Jaccard verification a linear merge instead of per-pair string
    * hash-set builds. Set equality to the string-shingle form holds up to
    * 64-bit hash collisions (~|set|²/2⁶⁴ per document — negligible). */
  def wordShingleHashes(s: UTF8String, n: Int): ArrayData =
    shingleHashesImpl(s, n, md5 = false)

  /** [[wordShingleHashes]] on the md5-prefix basis: sorted distinct
    * 60-bit [[md5Prefix60]] keys over byte-for-byte the same n-gram
    * strings the string path emits — hashed containment with a DuckDB
    * replay (`('0x' || substr(md5(shingle),1,15))::BIGINT`) in place of
    * xxh64. ~2-3× the hash cost per shingle; keys stay 8 bytes. */
  def wordShingleHashesMd5(s: UTF8String, n: Int): ArrayData =
    shingleHashesImpl(s, n, md5 = true)

  /** Shared shingle assembly for BOTH hash bases — one place for the
    * n-gram construction rules (words.length <= n → one whole-text
    * shingle; space-joined blocks otherwise; sorted distinct output),
    * so the xxh64 and md5 bases cannot silently diverge on the strings
    * they hash (CorpusSpec pins the two row-identical). The predictable
    * per-shingle branch costs nothing next to the hash itself. */
  private def shingleHashesImpl(s: UTF8String, n: Int,
      md5: Boolean): ArrayData = {
    def hash(b: Array[Byte]): Long =
      if (md5) md5Prefix60(b)
      else XXH64.hashUnsafeBytes(b,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length, 42L)
    val words = TextKernels.splitWords(s)
    val m = if (words.length <= n) 1 else words.length - n + 1
    val hs = new Array[Long](m)
    if (words.length <= n) {
      hs(0) = hash(words.mkString(" ")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } else {
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i < m) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(words(i + j)); j += 1
        }
        hs(i) = hash(sb.toString
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        i += 1
      }
    }
    java.util.Arrays.sort(hs)
    // in-place dedupe of the sorted array
    var w = 0
    var r = 0
    while (r < m) {
      if (r == 0 || hs(r) != hs(r - 1)) { hs(w) = hs(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, w))
  }

  /** Jaccard of two SORTED DISTINCT long arrays: one linear merge. */
  def sortedJaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements(); val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter).toDouble
  }

  /** Cosine similarity of two equal-length float arrays, double
    * accumulation in index order (bit-identical to the sequential
    * aggregate/zip_with form it replaces). Null on length mismatch. */
  def cosineFloat(a: ArrayData, b: ArrayData): Any = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** [[cosineFloat]] for array<double> inputs — full double precision
    * end-to-end (no narrowing), for callers whose embeddings are stored
    * as doubles. */
  def cosineDouble(a: ArrayData, b: ArrayData): Any = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Random-hyperplane LSH signature: bit i = sign(v · h_i), where
    * h_i[d] = ±1 by the low bit of xxhash64(i, d) — bit-compatible with
    * the composed Column form (seed 42, int-hash chaining) so signatures
    * are stable across engine versions. All `bits` planes in one pass. */
  def hyperplaneSig(vec: ArrayData, bits: Int): Long =
    hyperplaneSig(vec, bits, 0)

  /** Bit i of the result uses global plane index `offset + i`, so a
    * packed w-bit signature's slice [o, o+b) is bit-identical to
    * `hyperplaneSig(vec, b, o)` — bands beyond 64 total planes just
    * raise the offset. */
  def hyperplaneSig(vec: ArrayData, bits: Int, offset: Int): Long = {
    val dim = vec.numElements()
    var sig = 0L
    var i = 0
    while (i < bits) {
      val hi = XXH64.hashInt(offset + i, 42L)
      var dot = 0.0
      var d = 0
      while (d < dim) {
        val h = XXH64.hashInt(d, hi)
        val v = vec.getFloat(d).toDouble
        dot += (if ((h & 1L) == 1L) v else -v)
        d += 1
      }
      if (dot > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  /** All bands' signatures in ONE pass over the vector: band b's bit i
    * uses global plane b·bitsPerBand + i, so element b of the result is
    * bit-identical to `hyperplaneSig(vec, bitsPerBand, b·bitsPerBand)`
    * — but the vector is deserialized once and iterated dims-outer
    * (each element folded into every plane's running dot) instead of
    * once per band. The multi-band LSH path calls this instead of
    * `bands` separate kernel invocations. */
  def hyperplaneBandSigs(vec: ArrayData, bands: Int, bitsPerBand: Int)
      : ArrayData = {
    val dim = vec.numElements()
    val total = bands * bitsPerBand
    val seeds = new Array[Long](total)
    var i = 0
    while (i < total) { seeds(i) = XXH64.hashInt(i, 42L); i += 1 }
    val dots = new Array[Double](total)
    var d = 0
    while (d < dim) {
      val v = vec.getFloat(d).toDouble
      var p = 0
      while (p < total) {
        val h = XXH64.hashInt(d, seeds(p))
        dots(p) += (if ((h & 1L) == 1L) v else -v)
        p += 1
      }
      d += 1
    }
    packBands(dots, bands, bitsPerBand)
  }

  /** [[hyperplaneBandSigs]] for array<double> inputs (no narrowing). */
  def hyperplaneBandSigsDouble(vec: ArrayData, bands: Int, bitsPerBand: Int)
      : ArrayData = {
    val dim = vec.numElements()
    val total = bands * bitsPerBand
    val seeds = new Array[Long](total)
    var i = 0
    while (i < total) { seeds(i) = XXH64.hashInt(i, 42L); i += 1 }
    val dots = new Array[Double](total)
    var d = 0
    while (d < dim) {
      val v = vec.getDouble(d)
      var p = 0
      while (p < total) {
        val h = XXH64.hashInt(d, seeds(p))
        dots(p) += (if ((h & 1L) == 1L) v else -v)
        p += 1
      }
      d += 1
    }
    packBands(dots, bands, bitsPerBand)
  }

  private def packBands(dots: Array[Double], bands: Int, bitsPerBand: Int)
      : ArrayData = {
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var sig = 0L
      var j = 0
      while (j < bitsPerBand) {
        if (dots(b * bitsPerBand + j) > 0) sig |= (1L << j)
        j += 1
      }
      out(b) = sig
      b += 1
    }
    new GenericArrayData(out)
  }

  // md5-basis hyperplane sign matrix, memoized per (totalPlanes, dim):
  // sign(p, d) = +1 iff md5Prefix60("p:d") has its low bit set — the
  // DuckDB-replayable basis, `('0x'||substr(md5(p||':'||d),1,15))
  // ::BIGINT & 1`. The matrix depends only on the config, so the md5
  // work amortizes to a table lookup per row after the first vector.
  private val signCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Boolean]]()
  private def md5Signs(total: Int, dim: Int): Array[Boolean] =
    signCache.computeIfAbsent((total, dim), { _: (Int, Int) =>
      val signs = new Array[Boolean](total * dim)
      var p = 0
      while (p < total) {
        var d = 0
        while (d < dim) {
          signs(p * dim + d) =
            (md5Prefix60(UTF8String.fromString(s"$p:$d")) & 1L) == 1L
          d += 1
        }
        p += 1
      }
      signs
    })

  /** The md5 sign matrix for driver-side matrix builders (the JL sign
    * projection shares the banding's basis through this, so the sign
    * convention has exactly one derivation). Row-major
    * `(plane p, dim d) -> p*dim + d`; true = +1. Returns the memoized
    * array — callers must treat it as read-only. */
  def md5SignMatrix(totalPlanes: Int, dim: Int): Array[Boolean] =
    md5Signs(totalPlanes, dim)

  /** [[hyperplaneSig]] on the md5-prefix basis — same packing, same
    * plane-offset slicing, signs drawn from [[md5Signs]] so the whole
    * signature replays in the oracle. Accumulation is dim-ascending
    * double addition, matching SQL's `list_reduce` left fold
    * bit-for-bit. */
  def hyperplaneSigMd5(vec: ArrayData, bits: Int, offset: Int): Long = {
    val dim = vec.numElements()
    val signs = md5Signs(offset + bits, dim)
    var sig = 0L
    var i = 0
    while (i < bits) {
      val base = (offset + i) * dim
      var dot = 0.0
      var d = 0
      while (d < dim) {
        val v = vec.getFloat(d).toDouble
        dot += (if (signs(base + d)) v else -v)
        d += 1
      }
      if (dot > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  /** [[hyperplaneSigMd5]] for array<double> inputs. */
  def hyperplaneSigMd5Double(vec: ArrayData, bits: Int, offset: Int): Long = {
    val dim = vec.numElements()
    val signs = md5Signs(offset + bits, dim)
    var sig = 0L
    var i = 0
    while (i < bits) {
      val base = (offset + i) * dim
      var dot = 0.0
      var d = 0
      while (d < dim) {
        val v = vec.getDouble(d)
        dot += (if (signs(base + d)) v else -v)
        d += 1
      }
      if (dot > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  /** [[hyperplaneBandSigs]] on the md5-prefix basis: element b
    * bit-identical to `hyperplaneSigMd5(vec, bitsPerBand,
    * b·bitsPerBand)`. Per-plane dots accumulate dim-ascending, so the
    * oracle's left fold reproduces each dot exactly. */
  def hyperplaneBandSigsMd5(vec: ArrayData, bands: Int, bitsPerBand: Int)
      : ArrayData = {
    val dim = vec.numElements()
    val total = bands * bitsPerBand
    val signs = md5Signs(total, dim)
    val dots = new Array[Double](total)
    var d = 0
    while (d < dim) {
      val v = vec.getFloat(d).toDouble
      var p = 0
      while (p < total) {
        dots(p) += (if (signs(p * dim + d)) v else -v)
        p += 1
      }
      d += 1
    }
    packBands(dots, bands, bitsPerBand)
  }

  /** [[hyperplaneBandSigsMd5]] for array<double> inputs. */
  def hyperplaneBandSigsMd5Double(vec: ArrayData, bands: Int,
      bitsPerBand: Int): ArrayData = {
    val dim = vec.numElements()
    val total = bands * bitsPerBand
    val signs = md5Signs(total, dim)
    val dots = new Array[Double](total)
    var d = 0
    while (d < dim) {
      val v = vec.getDouble(d)
      var p = 0
      while (p < total) {
        dots(p) += (if (signs(p * dim + d)) v else -v)
        p += 1
      }
      d += 1
    }
    packBands(dots, bands, bitsPerBand)
  }

  /** [[hyperplaneSig]] for array<double> inputs (no narrowing). */
  def hyperplaneSigDouble(vec: ArrayData, bits: Int): Long =
    hyperplaneSigDouble(vec, bits, 0)

  def hyperplaneSigDouble(vec: ArrayData, bits: Int, offset: Int): Long = {
    val dim = vec.numElements()
    var sig = 0L
    var i = 0
    while (i < bits) {
      val hi = XXH64.hashInt(offset + i, 42L)
      var dot = 0.0
      var d = 0
      while (d < dim) {
        val h = XXH64.hashInt(d, hi)
        val v = vec.getDouble(d)
        dot += (if ((h & 1L) == 1L) v else -v)
        d += 1
      }
      if (dot > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  /** 64-bit SimHash: bit j set iff Σ_tokens ±1 (by bit j of the token
    * hash) is positive. */
  def simhash(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
          s.numBytes, 42L)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 60-bit md5-prefix hash — the engine-portable key basis: numerically
    * equal to DuckDB's `('0x' || substr(md5(s), 1, 15))::BIGINT`
    * (15 hex digits = the digest's first 8 bytes big-endian >>> 4;
    * 60 bits keeps the value signed-positive in both engines). Same
    * convention as [[graft.operators.Dsir.bucket]]'s 16-bit prefix,
    * widened to key width so hashed shuffles replay in the oracle. */
  def md5Prefix60(b: Array[Byte]): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(b)
    var be = 0L
    var i = 0
    while (i < 8) { be = (be << 8) | (d(i) & 0xFFL); i += 1 }
    be >>> 4
  }

  def md5Prefix60(s: UTF8String): Long = md5Prefix60(s.getBytes)

  /** 60-bit SimHash on the md5-prefix basis: bit j set iff Σ_tokens ±1
    * (by bit j of md5Prefix60(token)) is strictly positive. The md5
    * basis makes the WHOLE signature DuckDB-replayable (60 per-bit vote
    * sums over identical hashes), so simhash near-dup queries can face
    * the strict oracle instead of a rows-only check. Null tokens are
    * skipped, as in [[simhash]]. */
  def simhash60Md5(arr: ArrayData): Long = {
    val votes = new Array[Int](60)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val h = md5Prefix60(s)
        var j = 0
        while (j < 60) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 60) { if (votes(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  /** Mean-centered matrix projection (the PCA-transform hot loop):
    * out[r] = Σ_i (v[i] − mean[i]) · mat[r·d + i], k = mat.length/d
    * output rows. One primitive loop per row inside codegen; null (not
    * an exception) on dimension drift so a bad row poisons itself, not
    * the stage. */
  def matProjectFloat(vec: ArrayData, mean: Array[Double],
      mat: Array[Double]): ArrayData = {
    val d = vec.numElements()
    if (d == 0 || d != mean.length || mat.length % d != 0) return null
    val k = mat.length / d
    val out = new Array[Double](k)
    var r = 0
    while (r < k) {
      val base = r * d
      var s = 0.0
      var i = 0
      while (i < d) { s += (vec.getFloat(i) - mean(i)) * mat(base + i); i += 1 }
      out(r) = s
      r += 1
    }
    new GenericArrayData(out)
  }

  /** [[matProjectFloat]] for array<double> inputs (no narrowing). */
  def matProjectDouble(vec: ArrayData, mean: Array[Double],
      mat: Array[Double]): ArrayData = {
    val d = vec.numElements()
    if (d == 0 || d != mean.length || mat.length % d != 0) return null
    val k = mat.length / d
    val out = new Array[Double](k)
    var r = 0
    while (r < k) {
      val base = r * d
      var s = 0.0
      var i = 0
      while (i < d) { s += (vec.getDouble(i) - mean(i)) * mat(base + i); i += 1 }
      out(r) = s
      r += 1
    }
    new GenericArrayData(out)
  }
}

case class MinHashSigExpr(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(v: Any): Any =
    HashKernels.minhash(v.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, arr => s"graft.plans.HashKernels.minhash($arr, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused text→normalize→shingle→minhash signature (see
  * [[HashKernels.minhashText]]). */
case class MinHashTextExpr(child: Expression, n: Int, k: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_text"

  override def nullSafeEval(v: Any): Any =
    HashKernels.minhashText(v.asInstanceOf[UTF8String], n, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.plans.HashKernels.minhashText($t, $n, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Sorted-distinct 64-bit hashes of word n-gram shingles (see
  * [[HashKernels.wordShingleHashes]]). */
case class WordShingleHashesExpr(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_shingle_hashes"

  override def nullSafeEval(v: Any): Any =
    HashKernels.wordShingleHashes(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.plans.HashKernels.wordShingleHashes($t, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Linear-merge Jaccard over two sorted distinct long arrays. */
case class SortedJaccardExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sorted_jaccard"

  override def nullSafeEval(a: Any, b: Any): Any =
    HashKernels.sortedJaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.plans.HashKernels.sortedJaccard($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native cosine over two float- OR double-array columns (nullable on
  * length mismatch, so no defineCodeGen — nullSafeCodeGen with a null
  * check). The kernel is picked by the ANALYZED element type: a double
  * input keeps full double precision (reading a double slot as float
  * silently corrupts similarities, so no implicit narrowing is allowed
  * — any other array type fails analysis and must be cast explicitly). */
case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

  private def isDouble: Boolean = left.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  private def kernel: String =
    if (isDouble) "cosineDouble" else "cosineFloat"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) |
           (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two array<float> or two array<double> " +
          s"arguments, got ${l.sql} / ${r.sql}; cast explicitly")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any =
    if (isDouble)
      HashKernels.cosineDouble(a.asInstanceOf[ArrayData],
        b.asInstanceOf[ArrayData])
    else
      HashKernels.cosineFloat(a.asInstanceOf[ArrayData],
        b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // freshName: cellSims evaluates MANY cosine_sim calls in one
    // projection — fixed locals collide when they share a codegen
    // function and kick the stage to interpreted (found via
    // PqEncodeExpr; whether they share depends only on Spark's
    // code-size splitting, so it's a silent performance cliff)
    val r = ctx.freshName("cosRes")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
      Object $r = graft.plans.HashKernels.$kernel($a, $b);
      if ($r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ((Double) $r).doubleValue(); }
      """
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native mean-centered matrix projection over a float- or double-array
  * column (see [[HashKernels.matProjectFloat]]): the PCA/random-
  * projection transform as one codegen'd primitive loop per row. The
  * basis (mean, row-major k×d matrix) rides the plan as reference
  * objects — broadcast once per executor with the task binary, never
  * per row. Element type is picked at analysis; no implicit narrowing
  * (same rule as [[CosineSimExpr]]). */
case class MatProjectExpr(child: Expression, mean: Seq[Double],
    mat: Seq[Double]) extends UnaryExpression {
  // Seq (value equality) in the case-class signature so two identical
  // projections are semanticEquals — array params would compare by
  // reference and defeat subexpression elimination; primitive arrays
  // for the kernel/codegen hot path.
  private val meanArr: Array[Double] = mean.toArray
  private val matArr: Array[Double] = mat.toArray
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

  private def isDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  private def kernel: String =
    if (isDouble) "matProjectDouble" else "matProjectFloat"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      if (mean.nonEmpty && mat.length % mean.length == 0)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName basis shape: |mat| (${mat.length}) must be a " +
          s"positive multiple of |mean| (${mean.length})")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float> or array<double>, got ${t.sql}; " +
        "cast explicitly")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "mat_project"

  override def nullSafeEval(v: Any): Any =
    if (isDouble)
      HashKernels.matProjectDouble(v.asInstanceOf[ArrayData], meanArr, matArr)
    else
      HashKernels.matProjectFloat(v.asInstanceOf[ArrayData], meanArr, matArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val meanRef = ctx.addReferenceObj("matProjMean", meanArr, "double[]")
    val matRef = ctx.addReferenceObj("matProjMat", matArr, "double[]")
    // freshName: a second kernel call in the same codegen function
    // (two projections in one select) would collide on a fixed local
    // and kick the stage to interpreted (found via PqEncodeExpr)
    val r = ctx.freshName("matProjRes")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
      Object $r = graft.plans.HashKernels.$kernel($c, $meanRef, $matRef);
      if ($r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $r; }
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All-planes-in-one-pass random-hyperplane signature (see
  * [[HashKernels.hyperplaneSig]]). Float and double arrays each get a
  * full-precision kernel; other element types fail analysis (same
  * no-silent-narrowing rule as [[CosineSimExpr]]). Bit i uses global
  * plane `offset + i`, so multi-band signatures can span more than 64
  * planes while each ≤64-bit slice stays bit-identical to the packed
  * form. */
case class HyperplaneSigExpr(child: Expression, bits: Int, offset: Int = 0)
    extends UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

  private def kernel: String = child.dataType match {
    case ArrayType(DoubleType, _) => "hyperplaneSigDouble"
    case _ => "hyperplaneSig"
  }

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<float> or array<double>, got " +
          s"${t.sql}; cast explicitly")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"

  override def nullSafeEval(v: Any): Any =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        HashKernels.hyperplaneSigDouble(v.asInstanceOf[ArrayData], bits, offset)
      case _ =>
        HashKernels.hyperplaneSig(v.asInstanceOf[ArrayData], bits, offset)
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      v => s"graft.plans.HashKernels.$kernel($v, $bits, $offset)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All multi-band hyperplane signatures in one kernel pass (see
  * [[HashKernels.hyperplaneBandSigs]]): array<long> of `bands` keys,
  * element b bit-identical to `hyperplane_sig(vec, bitsPerBand,
  * b·bitsPerBand)`. Same strict element-type rule as
  * [[HyperplaneSigExpr]]. */
case class HyperplaneBandSigsExpr(child: Expression, bands: Int,
    bitsPerBand: Int) extends UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

  private def kernel: String = child.dataType match {
    case ArrayType(DoubleType, _) => "hyperplaneBandSigsDouble"
    case _ => "hyperplaneBandSigs"
  }

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<float> or array<double>, got " +
          s"${t.sql}; cast explicitly")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_band_sigs"

  override def nullSafeEval(v: Any): Any =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        HashKernels.hyperplaneBandSigsDouble(
          v.asInstanceOf[ArrayData], bands, bitsPerBand)
      case _ =>
        HashKernels.hyperplaneBandSigs(
          v.asInstanceOf[ArrayData], bands, bitsPerBand)
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      v => s"graft.plans.HashKernels.$kernel($v, $bands, $bitsPerBand)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** [[HyperplaneSigExpr]] on the md5-prefix sign basis
  * ([[HashKernels.hyperplaneSigMd5]]) — oracle-replayable signatures. */
case class HyperplaneSigMd5Expr(child: Expression, bits: Int,
    offset: Int = 0) extends UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

  private def kernel: String = child.dataType match {
    case ArrayType(DoubleType, _) => "hyperplaneSigMd5Double"
    case _ => "hyperplaneSigMd5"
  }

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<float> or array<double>, got " +
          s"${t.sql}; cast explicitly")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig_md5"

  override def nullSafeEval(v: Any): Any =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        HashKernels.hyperplaneSigMd5Double(
          v.asInstanceOf[ArrayData], bits, offset)
      case _ =>
        HashKernels.hyperplaneSigMd5(v.asInstanceOf[ArrayData], bits, offset)
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      v => s"graft.plans.HashKernels.$kernel($v, $bits, $offset)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** [[HyperplaneBandSigsExpr]] on the md5-prefix sign basis
  * ([[HashKernels.hyperplaneBandSigsMd5]]). */
case class HyperplaneBandSigsMd5Expr(child: Expression, bands: Int,
    bitsPerBand: Int) extends UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

  private def kernel: String = child.dataType match {
    case ArrayType(DoubleType, _) => "hyperplaneBandSigsMd5Double"
    case _ => "hyperplaneBandSigsMd5"
  }

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<float> or array<double>, got " +
          s"${t.sql}; cast explicitly")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_band_sigs_md5"

  override def nullSafeEval(v: Any): Any =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        HashKernels.hyperplaneBandSigsMd5Double(
          v.asInstanceOf[ArrayData], bands, bitsPerBand)
      case _ =>
        HashKernels.hyperplaneBandSigsMd5(
          v.asInstanceOf[ArrayData], bands, bitsPerBand)
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      v => s"graft.plans.HashKernels.$kernel($v, $bands, $bitsPerBand)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class Simhash60Md5Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60_md5"

  override def nullSafeEval(v: Any): Any =
    HashKernels.simhash60Md5(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, arr => s"graft.plans.HashKernels.simhash60Md5($arr)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class WordShingleHashesMd5Expr(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_shingle_hashes_md5"

  override def nullSafeEval(v: Any): Any =
    HashKernels.wordShingleHashesMd5(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      t => s"graft.plans.HashKernels.wordShingleHashesMd5($t, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(v: Any): Any =
    HashKernels.simhash(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, arr => s"graft.plans.HashKernels.simhash($arr)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All unordered id pairs (id1 < id2) of a bucket's id list as
  * array<struct<id1, id2>> — the LSH candidate fan-out. One eval per
  * BUCKET row (thousands, not millions), so CodegenFallback costs
  * nothing while the n·(n-1)/2 inner loop runs as plain JVM code — the
  * composable nested transform(ids×ids) form evaluated its lambdas
  * interpreted per EMITTED PAIR and dominated candidate generation.
  * Long ids take a primitive-array path; any orderable element type
  * falls back to an interpreted ordering. Upstream bucket caps bound
  * the quadratic fan-out exactly as before ([[graft.operators.Dedup
  * .minhashCandidates]] filters to ≤ maxBucket first).
  *
  * `includeMembers = true` ADDITIONALLY emits one (id, null) single
  * per (non-null) bucket member ahead of the pairs — the fused form
  * behind [[graft.operators.Dedup.minhashCandidatesAndIds]], where the
  * pair list and the kept-bucket member-id list must both come out of
  * ONE reader of the bucket aggregation (two readers each re-ran the
  * final collect_list aggregation above the reused exchange). A null
  * id2 marks a member single; real pairs always carry two non-null
  * ids (nulls are dropped before pairing).
  */
case class PairCombosExpr(child: Expression,
    includeMembers: Boolean = false) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

  private lazy val elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if org.apache.spark.sql.catalyst.expressions
        .RowOrdering.isOrderable(t) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects an array of an orderable type, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id1", elemType, nullable = true),
      StructField("id2", elemType, nullable = true))),
    containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String =
    if (includeMembers) "pair_combos_with_members" else "pair_combos"

  override def nullSafeEval(v: Any): Any = {
    val arr0 = v.asInstanceOf[ArrayData]
    // Null elements are DROPPED, as the composable transform+filter
    // form dropped them (a null id compares to nothing): the Long fast
    // path would otherwise unbox them to a phantom id 0, the generic
    // path would NPE in the interpreted ordering.
    val arr: ArrayData = {
      val n0 = arr0.numElements()
      var hasNull = false
      var i = 0
      while (i < n0 && !hasNull) { hasNull = arr0.isNullAt(i); i += 1 }
      if (!hasNull) arr0
      else new GenericArrayData(
        (0 until n0).filterNot(arr0.isNullAt)
          .map(j => arr0.get(j, elemType)).toArray)
    }
    val n = arr.numElements()
    val singles = if (includeMembers) n.toLong else 0L
    val total = singles + n.toLong * (n - 1) / 2
    require(total <= Int.MaxValue, s"$prettyName: bucket of $n ids overflows")
    elemType match {
      case LongType =>
        val ids = arr.toLongArray()
        val out = new Array[Any](total.toInt)
        var w = 0
        if (includeMembers) {
          var m = 0
          while (m < n) {
            val r = new GenericInternalRow(2)
            r.update(0, ids(m)) // field 1 stays null: the member marker
            out(w) = r; w += 1; m += 1
          }
        }
        var i = 0
        while (i < n) {
          var j = i + 1
          while (j < n) {
            val a = ids(i); val b = ids(j)
            if (a != b) {
              val r = new GenericInternalRow(2)
              r.update(0, math.min(a, b)); r.update(1, math.max(a, b))
              out(w) = r; w += 1
            }
            j += 1
          }
          i += 1
        }
        new GenericArrayData(if (w == out.length) out else out.take(w))
      case t =>
        val ord = org.apache.spark.sql.catalyst.util.TypeUtils
          .getInterpretedOrdering(t)
        val vals = Array.tabulate[Any](n)(i => arr.get(i, t))
        val out = new Array[Any](total.toInt)
        var w = 0
        if (includeMembers) {
          var m = 0
          while (m < n) {
            val r = new GenericInternalRow(2)
            r.update(0, vals(m))
            out(w) = r; w += 1; m += 1
          }
        }
        var i = 0
        while (i < n) {
          var j = i + 1
          while (j < n) {
            val c = ord.compare(vals(i), vals(j))
            if (c != 0) {
              val r = new GenericInternalRow(2)
              if (c < 0) { r.update(0, vals(i)); r.update(1, vals(j)) }
              else { r.update(0, vals(j)); r.update(1, vals(i)) }
              out(w) = r; w += 1
            }
            j += 1
          }
          i += 1
        }
        new GenericArrayData(if (w == out.length) out else out.take(w))
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object HashExpressions {
  import org.apache.spark.sql.graft.bridge.{column, expression}

  def minhash_sig(shingles: Column, k: Int): Column =
    column(MinHashSigExpr(expression(shingles), k))
  def minhash_text(text: Column, n: Int, k: Int): Column =
    column(MinHashTextExpr(expression(text), n, k))
  def simhash64(tokens: Column): Column =
    column(SimHash64Expr(expression(tokens)))
  def simhash60_md5(tokens: Column): Column =
    column(Simhash60Md5Expr(expression(tokens)))
  def word_shingle_hashes(text: Column, n: Int): Column =
    column(WordShingleHashesExpr(expression(text), n))
  def word_shingle_hashes_md5(text: Column, n: Int): Column =
    column(WordShingleHashesMd5Expr(expression(text), n))
  def sorted_jaccard(a: Column, b: Column): Column =
    column(SortedJaccardExpr(expression(a), expression(b)))
  def cosine_sim(a: Column, b: Column): Column =
    column(CosineSimExpr(expression(a), expression(b)))
  def hyperplane_sig(vec: Column, bits: Int, offset: Int = 0): Column =
    column(HyperplaneSigExpr(expression(vec), bits, offset))
  def hyperplane_band_sigs(vec: Column, bands: Int, bitsPerBand: Int): Column =
    column(HyperplaneBandSigsExpr(expression(vec), bands, bitsPerBand))
  def hyperplane_sig_md5(vec: Column, bits: Int, offset: Int = 0): Column =
    column(HyperplaneSigMd5Expr(expression(vec), bits, offset))
  def hyperplane_band_sigs_md5(vec: Column, bands: Int,
      bitsPerBand: Int): Column =
    column(HyperplaneBandSigsMd5Expr(expression(vec), bands, bitsPerBand))
  def pair_combos(ids: Column): Column =
    column(PairCombosExpr(expression(ids)))
  def pair_combos_with_members(ids: Column): Column =
    column(PairCombosExpr(expression(ids), includeMembers = true))
  def mat_project(vec: Column, mean: Array[Double], mat: Array[Double])
      : Column =
    column(MatProjectExpr(expression(vec), mean.toIndexedSeq, mat.toIndexedSeq))
}
