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
  * with their current estimates, pruned to `cap` by estimate whenever
  * it overflows — the classic sketch+heap heavy-hitters layout, so
  * memory is O(depth·width + cap) regardless of cardinality.
  */
final class CmsBuffer(val depth: Int, val width: Int, val k: Int) {
  val counts = new Array[Long](depth * width)
  val cand = new java.util.HashMap[String, Long]()
  val cap: Int = math.max(4 * k, 64)

  @inline private def cell(row: Int, bytes: Array[Byte]): Int = {
    val h = XXH64.hashUnsafeBytes(bytes,
      org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length,
      row.toLong * 0x9E3779B97F4A7C15L + 42L)
    (((h % width) + width) % width).toInt
  }

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

  def add(key: String, inc: Long): Unit = {
    val bytes = key.getBytes(StandardCharsets.UTF_8)
    var est = Long.MaxValue
    var r = 0
    while (r < depth) {
      val i = r * width + cell(r, bytes)
      counts(i) += inc
      if (counts(i) < est) est = counts(i)
      r += 1
    }
    cand.put(key, est)
    if (cand.size > cap) prune()
  }

  /** Re-estimate every candidate against the current sketch (used
    * after a merge, where the union's estimates all change). */
  def refresh(): Unit = {
    val it = cand.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      e.setValue(estimate(e.getKey.getBytes(StandardCharsets.UTF_8)))
    }
  }

  private def prune(): Unit = {
    // keep the best `cap/2` by (est desc, key asc) — amortized O(1)/add
    val entries = new java.util.ArrayList(cand.entrySet())
    entries.sort { (a: java.util.Map.Entry[String, Long],
        b: java.util.Map.Entry[String, Long]) =>
      val c = java.lang.Long.compare(b.getValue, a.getValue)
      if (c != 0) c else a.getKey.compareTo(b.getKey)
    }
    cand.clear()
    var i = 0
    while (i < cap / 2 && i < entries.size) {
      cand.put(entries.get(i).getKey, entries.get(i).getValue)
      i += 1
    }
  }

  /** (key, est) pairs, best-first (est desc, key asc), top k. */
  def top(): Array[(String, Long)] = {
    val entries = new java.util.ArrayList(cand.entrySet())
    entries.sort { (a: java.util.Map.Entry[String, Long],
        b: java.util.Map.Entry[String, Long]) =>
      val c = java.lang.Long.compare(b.getValue, a.getValue)
      if (c != 0) c else a.getKey.compareTo(b.getKey)
    }
    val n = math.min(k, entries.size)
    Array.tabulate(n)(i =>
      (entries.get(i).getKey, entries.get(i).getValue))
  }
}

/** Approximate heavy hitters: count-min sketch + candidate heap as ONE
  * native aggregate — `cms_topk(key, k, depth, width)` returns the top
  * k keys by estimated count as array<struct<key, est>>. This is the
  * 100 TB answer to "top n-grams" when the exact groupBy's key space
  * (billions of distinct shingles) no longer fits a shuffle: state is
  * O(depth·width) per partial regardless of cardinality, merge is
  * counter addition + candidate re-estimation, and estimates
  * overcount by at most ε·N (ε ≈ e/width) with probability 1−δ
  * (δ ≈ e^−depth) — never undercount. The exact
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
    if (v != null) b.add(v.asInstanceOf[UTF8String].toString, 1L)
    b
  }

  override def merge(b: CmsBuffer, o: CmsBuffer): CmsBuffer = {
    var i = 0
    while (i < b.counts.length) { b.counts(i) += o.counts(i); i += 1 }
    val it = o.cand.keySet().iterator()
    while (it.hasNext) b.cand.put(it.next(), 0L)
    b.refresh()
    b
  }

  override def eval(b: CmsBuffer): Any = {
    b.refresh()
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
    val keys = new java.util.ArrayList(b.cand.keySet())
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
      b.cand.put(new String(kb, StandardCharsets.UTF_8), 0L)
      i += 1
    }
    b.refresh()
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

object CmsAgg {
  import org.apache.spark.sql.graft.bridge.{column, expression}

  /** Approximate heavy hitters of a string key column:
    * array<struct<key, est>>, best-first, ≤ k entries. */
  def cms_topk(k: Int, depth: Int = 4, width: Int = 1 << 16)(key: Column)
      : Column =
    column(CmsTopKExpr(expression(key), k, depth, width)
      .toAggregateExpression())
}
