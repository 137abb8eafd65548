package graft.plans

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-min sketch + candidate set: the mutable state behind
  * [[CmsTopKExpr]]. The sketch is `depth` rows of `width` long
  * counters; a key's estimate is the min over rows of its hashed
  * cell — an OVERestimate by at most the colliding mass, never an
  * underestimate (standard CMS bound: ≤ ε·N with ε = e/width at
  * depth ln(1/δ)). The candidate map tracks keys seen by THIS buffer
  * with their last-computed estimates, pruned to `cap` whenever it
  * overflows — the classic sketch+heap heavy-hitters layout, so
  * memory stays O(depth·width + cap) through updates AND merges.
  *
  * Hot-path layout: candidates are keyed by a 64-bit hash of the key
  * bytes, so the per-row path is hashes + a primitive-keyed map probe —
  * the java String materializes only the first time a key enters the
  * candidate set (a 2⁻⁶⁴-per-pair key-hash collision conflates two
  * candidates' tracking — far below the sketch's own ε·N noise).
  */
final class CmsBuffer(val depth: Int, val width: Int, val k: Int) {
  final class Cand(val key: String, var est: Long)

  val counts = new Array[Long](depth * width)
  val cand = new java.util.HashMap[java.lang.Long, Cand]()
  val cap: Int = math.max(4 * k, 64)
  private val OFF = org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET

  @inline private def cell(row: Int, bytes: Array[Byte]): Int =
    CmsBuffer.xxh64Cell(bytes, row, width)

  @inline private def keyHash(bytes: Array[Byte]): Long =
    XXH64.hashUnsafeBytes(bytes, OFF, bytes.length, -559038737L)

  /** Min-over-rows estimate WITHOUT incrementing. */
  def estimate(bytes: Array[Byte]): Long = {
    var est = Long.MaxValue
    var r = 0
    while (r < depth) {
      val c = counts(r * width + cell(r, bytes))
      if (c < est) est = c
      r += 1
    }
    est
  }

  def add(u: UTF8String): Unit = {
    val bytes = u.getBytes
    var est = Long.MaxValue
    var r = 0
    while (r < depth) {
      val i = r * width + cell(r, bytes)
      counts(i) += 1L
      if (counts(i) < est) est = counts(i)
      r += 1
    }
    val kh = keyHash(bytes)
    val c = cand.get(kh)
    if (c != null) c.est = est
    else {
      cand.put(kh, new Cand(u.toString, est))
      if (cand.size > cap) { refresh(); prune() }
    }
  }

  /** Union another buffer's candidate KEYS (their estimates are stale
    * against this sketch until [[refresh]]). */
  def unionCandidates(o: CmsBuffer): Unit = {
    val it = o.cand.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (!cand.containsKey(e.getKey))
        cand.put(e.getKey, new Cand(e.getValue.key, 0L))
    }
  }

  /** Re-estimate every candidate against the current sketch. Called
    * before any estimate-ordered decision (prune, top) — NOT per
    * merge, where estimates are write-only (a per-merge refresh would
    * be quadratic in partial count at the final reducer). */
  def refresh(): Unit = {
    val it = cand.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      c.est = estimate(c.key.getBytes(StandardCharsets.UTF_8))
    }
  }

  /** Fold another buffer into this one: counter addition + candidate
    * union, pruned only on overflow (estimates stay write-only here —
    * [[top]] refreshes before any ordered read). The whole of
    * [[CmsTopKExpr.merge]], shared so pure-JVM property tests drive
    * the identical path. */
  def mergeIn(o: CmsBuffer): Unit = {
    var i = 0
    while (i < counts.length) { counts(i) += o.counts(i); i += 1 }
    unionCandidates(o)
    if (cand.size > cap) { refresh(); prune() }
  }

  /** Candidates best-first: (est desc, key asc). */
  private def sortedCands(): java.util.ArrayList[Cand] = {
    val entries = new java.util.ArrayList(cand.values())
    entries.sort { (a: Cand, b: Cand) =>
      val c = java.lang.Long.compare(b.est, a.est)
      if (c != 0) c else a.key.compareTo(b.key)
    }
    entries
  }

  /** Keep the best `cap/2` candidates. Callers must [[refresh]] first
    * if estimates may be stale. */
  def prune(): Unit = {
    val entries = sortedCands()
    cand.clear()
    var i = 0
    while (i < cap / 2 && i < entries.size) {
      val c = entries.get(i)
      cand.put(keyHash(c.key.getBytes(StandardCharsets.UTF_8)), c)
      i += 1
    }
  }

  /** (key, est) pairs, best-first, top k. Refreshes first. */
  def top(): Array[(String, Long)] = {
    refresh()
    val entries = sortedCands()
    val n = math.min(k, entries.size)
    Array.tabulate(n)(i => (entries.get(i).key, entries.get(i).est))
  }
}

object CmsBuffer {
  /** THE XXH64 cell rule — one definition shared by [[CmsBuffer]] and
    * [[CmsSketchExpr]], so sketches built by either are
    * cell-compatible by construction. */
  @inline def xxh64Cell(bytes: Array[Byte], row: Int, width: Int): Int = {
    val h = XXH64.hashUnsafeBytes(bytes,
      org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length,
      row.toLong * 0x9E3779B97F4A7C15L + 42L)
    (((h % width) + width) % width).toInt
  }
}

/** Approximate heavy hitters: count-min sketch + candidate heap as ONE
  * native aggregate — `cms_topk(key, k, depth, width)` returns the top
  * k keys by estimated count as array<struct<key, est>>. This is the
  * 100 TB answer to "top n-grams" when the exact groupBy's key space
  * (billions of distinct shingles) no longer fits a shuffle: state is
  * O(depth·width + 4k) per partial AND per merge (candidates are
  * pruned on overflow at both stages), merge is counter addition, and
  * estimates overcount by at most ε·N (ε ≈ e/width) with probability
  * 1−δ (δ ≈ e^−depth) — never undercount. The exact
  * [[graft.operators.Corpus.buildVocab]] / q_ngram_topk path stays the
  * default where the key space fits; this is the bounded-memory
  * fallback, spec-pinned to agree with exact counts when the sketch is
  * wide enough.
  */
case class CmsTopKExpr(key: Expression, k: Int, depth: Int, width: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmsBuffer] with UnaryLike[Expression]
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  require(k > 0 && depth > 0 && width > 0, "cms_topk needs positive shape")

  override def child: Expression = key
  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def createAggregationBuffer(): CmsBuffer =
    new CmsBuffer(depth, width, k)

  override def update(b: CmsBuffer, input: InternalRow): CmsBuffer = {
    val v = key.eval(input)
    if (v != null) b.add(v.asInstanceOf[UTF8String])
    b
  }

  override def merge(b: CmsBuffer, o: CmsBuffer): CmsBuffer = {
    b.mergeIn(o)
    b
  }

  override def eval(b: CmsBuffer): Any = {
    val top = b.top()
    val rows = new Array[Any](top.length)
    var i = 0
    while (i < top.length) {
      val r = new GenericInternalRow(2)
      r.update(0, UTF8String.fromString(top(i)._1))
      r.update(1, top(i)._2)
      rows(i) = r
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(b: CmsBuffer): Array[Byte] = {
    val keys = new java.util.ArrayList[String]()
    val it = b.cand.values().iterator()
    while (it.hasNext) keys.add(it.next().key)
    var keyBytes = 0
    val bufs = new Array[Array[Byte]](keys.size)
    var i = 0
    while (i < keys.size) {
      bufs(i) = keys.get(i).getBytes(StandardCharsets.UTF_8)
      keyBytes += 4 + bufs(i).length
      i += 1
    }
    val bb = ByteBuffer.allocate(8 + b.counts.length * 8 + keyBytes)
    bb.putInt(b.counts.length)
    i = 0
    while (i < b.counts.length) { bb.putLong(b.counts(i)); i += 1 }
    bb.putInt(keys.size)
    i = 0
    while (i < keys.size) {
      bb.putInt(bufs(i).length); bb.put(bufs(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CmsBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new CmsBuffer(depth, width, k)
    val n = bb.getInt
    var i = 0
    while (i < n) { b.counts(i) = bb.getLong; i += 1 }
    val nk = bb.getInt
    i = 0
    while (i < nk) {
      val len = bb.getInt
      val kb = new Array[Byte](len)
      bb.get(kb)
      val s = new String(kb, StandardCharsets.UTF_8)
      // estimates stay 0 (write-only) until a refresh-guarded decision
      b.cand.put(XXH64.hashUnsafeBytes(kb,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, kb.length,
        -559038737L), new b.Cand(s, 0L))
      i += 1
    }
    b
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("key", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(n: Int): CmsTopKExpr =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): CmsTopKExpr =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): CmsTopKExpr =
    copy(key = c)

  override def prettyName: String = "cms_topk"
}

/** Raw count-min SKETCH (no candidate heap): the depth×width counter
  * matrix, row-major, as array<long>. With `md5Basis` the cell hash is
  * the 60-bit md5 prefix of "key:row" — byte-replayable in any engine
  * as `('0x' || substr(md5(k || ':' || r), 1, 15))::BIGINT % width` —
  * so the sketch ARITHMETIC itself (hash → cell → counter → min-over-
  * rows estimate) is oracle-checkable; the XXH64 basis (identical cell
  * rule to [[CmsBuffer]]) stays the fast production default. State is
  * O(depth·width) per partial and per merge; merge is counter
  * addition. Probes compose from built-ins over the returned array:
  * est(key) = min over r of sk[r·width + bucket_r(key)].
  */
case class CmsSketchExpr(key: Expression, depth: Int, width: Int,
    md5Basis: Boolean,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression]
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  require(depth > 0 && width > 0, "cms_sketch needs positive shape")

  override def child: Expression = key
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  @transient private lazy val suffixes: Array[Array[Byte]] =
    Array.tabulate(depth)(r => s":$r".getBytes(StandardCharsets.UTF_8))

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  private def cell(bytes: Array[Byte], r: Int): Int =
    if (md5Basis) {
      val sfx = suffixes(r)
      val all = java.util.Arrays.copyOf(bytes, bytes.length + sfx.length)
      System.arraycopy(sfx, 0, all, bytes.length, sfx.length)
      // md5Prefix60 is a 60-bit non-negative value: plain % is safe
      (HashKernels.md5Prefix60(all) % width).toInt
    } else CmsBuffer.xxh64Cell(bytes, r, width)

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val v = key.eval(input)
    if (v != null) {
      val bytes = v.asInstanceOf[UTF8String].getBytes
      var r = 0
      while (r < depth) { b(r * width + cell(bytes, r)) += 1L; r += 1 }
    }
    b
  }

  override def merge(b: Array[Long], o: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b.length) { b(i) += o(i); i += 1 }
    b
  }

  override def eval(b: Array[Long]): Any = new GenericArrayData(b.clone())

  override def serialize(b: Array[Long]): Array[Byte] = {
    val buf = ByteBuffer.allocate(8 * b.length)
    var i = 0
    while (i < b.length) { buf.putLong(b(i)); i += 1 }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = ByteBuffer.wrap(bytes)
    val out = new Array[Long](depth * width)
    var i = 0
    while (i < out.length) { out(i) = buf.getLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): CmsSketchExpr =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsSketchExpr =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): CmsSketchExpr =
    copy(key = c)

  override def prettyName: String = "cms_sketch"
}

object CmsAgg {
  import org.apache.spark.sql.graft.bridge.{column, expression}

  /** Approximate heavy hitters of a string key column:
    * array<struct<key, est>>, best-first, ≤ k entries. */
  def cms_topk(k: Int, depth: Int = 4, width: Int = 1 << 16)(key: Column)
      : Column =
    column(CmsTopKExpr(expression(key), k, depth, width)
      .toAggregateExpression())

  /** The raw counter matrix — see [[CmsSketchExpr]]. */
  def cms_sketch(depth: Int, width: Int, md5Basis: Boolean = false)(
      key: Column): Column =
    column(CmsSketchExpr(expression(key), depth, width, md5Basis)
      .toAggregateExpression())
}
