package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types.DataType

/** Single-slot arg-extremum buffer: the (key, value) pair of the best
  * row seen so far, in Catalyst internal format (copied out of the
  * producing row, which operators reuse). */
final class ArgExtremumBuffer {
  var key: Any = null
  var value: Any = null
}

/** Hash-path `min_by`/`max_by` (and, with value = key, `min`/`max`)
  * for keys whose Catalyst type is immutable in an UnsafeRow buffer —
  * struct, string, array.
  *
  * Spark's built-in Min/Max/MaxBy/MinBy are DeclarativeAggregates; a
  * declarative aggregate whose BUFFER holds a struct or string cannot
  * run inside HashAggregateExec (UnsafeRow fixed-width slots only), so
  * the planner silently degrades the whole aggregation to
  * SortAggregate — a full sort of every input row per exchange side.
  * `min(struct(id, pos))` — the keep-first winner rule used across the
  * dedup family — hit exactly this: the plans showed
  * Sort + SortAggregate below AND above the exchange (guide §2:
  * measure where the time goes; the sorts were the stage cost, not the
  * comparison itself).
  *
  * A TypedImperativeAggregate is eligible for ObjectHashAggregateExec
  * (hash-based, no sort, partial map-side aggregation preserved), so
  * this class re-expresses arg-extremum with an object buffer: one
  * (key, value) slot, per-row interpreted compare against the current
  * best. The per-row compare is interpreted rather than codegen, but
  * it replaces a per-row O(log n) sort participation with O(1) probe —
  * measured ~2× on the keep-first dedup family at sf0.1 and removes
  * both Sort operators from the plan at every scale.
  *
  * Tie/NULL semantics match `min(struct(...))` / `max_by` with
  * deterministic keys as used in this repo: NULL keys are skipped
  * (never the extremum — matches Min/Max, and MinBy/MaxBy on non-null
  * keys); on exactly-equal keys the FIRST seen row wins, which is
  * order-dependent in general but every call site uses an injective
  * key (the winner struct contains the full ordering tuple), where
  * equal keys imply equal values. Ordering is
  * [[TypeUtils.getInterpretedOrdering]] — identical to the ordering
  * SortAggregate's Min/Max would use for the same type.
  */
case class ArgExtremumAggExpr(key: Expression, value: Expression,
    isMin: Boolean,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArgExtremumBuffer]
  with BinaryLike[Expression] {

  override def left: Expression = key
  override def right: Expression = value

  @transient private lazy val ordering =
    TypeUtils.getInterpretedOrdering(key.dataType)
  @transient private lazy val serProj =
    UnsafeProjection.create(Array(key.dataType, value.dataType))
  @transient private lazy val serRow = new UnsafeRow(2)

  override def createAggregationBuffer(): ArgExtremumBuffer =
    new ArgExtremumBuffer

  @inline private def beats(a: Any, b: Any): Boolean = {
    val c = ordering.compare(a, b)
    if (isMin) c < 0 else c > 0
  }

  override def update(b: ArgExtremumBuffer, input: InternalRow): ArgExtremumBuffer = {
    val k = key.eval(input)
    if (k != null && (b.key == null || beats(k, b.key))) {
      b.key = InternalRow.copyValue(k)
      val v = value.eval(input)
      b.value = InternalRow.copyValue(v)
    }
    b
  }

  override def merge(b: ArgExtremumBuffer, o: ArgExtremumBuffer): ArgExtremumBuffer = {
    if (o.key != null && (b.key == null || beats(o.key, b.key))) {
      b.key = o.key
      b.value = o.value
    }
    b
  }

  override def eval(b: ArgExtremumBuffer): Any = b.value

  override def serialize(b: ArgExtremumBuffer): Array[Byte] =
    if (b.key == null) Array.emptyByteArray
    else {
      val row = new GenericInternalRow(2)
      row.update(0, b.key)
      row.update(1, b.value)
      serProj.apply(row).getBytes
    }

  override def deserialize(bytes: Array[Byte]): ArgExtremumBuffer = {
    val b = new ArgExtremumBuffer
    if (bytes.nonEmpty) {
      serRow.pointTo(bytes, bytes.length)
      b.key = InternalRow.copyValue(serRow.get(0, key.dataType))
      b.value =
        InternalRow.copyValue(serRow.get(1, value.dataType))
    }
    b
  }

  override def dataType: DataType = value.dataType
  override def nullable: Boolean = true

  override def withNewMutableAggBufferOffset(n: Int): ArgExtremumAggExpr =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ArgExtremumAggExpr =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): ArgExtremumAggExpr = copy(key = l, value = r)

  override def prettyName: String =
    if (isMin) "obj_min_by" else "obj_max_by"
}

/** (id, pos) slot of [[MinLongPairAggExpr]] — flat longs, no boxing. */
final class LongPairBuffer {
  var set = false
  var id = 0L
  var pos = 0L
}

/** Primitive keep-first winner: `min(struct(id, pos))` specialized to
  * integral (id, pos) — the dedup family's universal winner rule. The
  * generic [[ArgExtremumAggExpr]] already moves the aggregation from
  * SortAggregate to ObjectHashAggregate, but pays an interpreted
  * CreateStruct allocation + RowOrdering compare per row; this form
  * evaluates two bound references into two longs and compares them —
  * no allocation on the hot path at all. Output is the same
  * struct<id,pos> (field names set by the caller's alias + getField,
  * types fixed long/long — call sites cast back if their id was int).
  * NULL id/pos rows are skipped, matching min(struct(...)) over
  * non-null inputs (call sites never produce null ids/positions).
  */
case class MinLongPairAggExpr(id: Expression, pos: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongPairBuffer]
  with BinaryLike[Expression]
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def left: Expression = id
  override def right: Expression = pos
  override def inputTypes: Seq[DataType] =
    Seq(org.apache.spark.sql.types.LongType,
      org.apache.spark.sql.types.LongType)

  override def createAggregationBuffer(): LongPairBuffer =
    new LongPairBuffer

  override def update(b: LongPairBuffer, input: InternalRow): LongPairBuffer = {
    val i = id.eval(input)
    val p = pos.eval(input)
    if (i != null && p != null) {
      val iv = i.asInstanceOf[Long]
      val pv = p.asInstanceOf[Long]
      if (!b.set || iv < b.id || (iv == b.id && pv < b.pos)) {
        b.set = true; b.id = iv; b.pos = pv
      }
    }
    b
  }

  override def merge(b: LongPairBuffer, o: LongPairBuffer): LongPairBuffer = {
    if (o.set && (!b.set || o.id < b.id ||
        (o.id == b.id && o.pos < b.pos))) {
      b.set = true; b.id = o.id; b.pos = o.pos
    }
    b
  }

  override def eval(b: LongPairBuffer): Any =
    if (!b.set) null
    else {
      val r = new GenericInternalRow(2)
      r.update(0, b.id)
      r.update(1, b.pos)
      r
    }

  override def serialize(b: LongPairBuffer): Array[Byte] =
    if (!b.set) Array.emptyByteArray
    else {
      val bb = java.nio.ByteBuffer.allocate(16)
      bb.putLong(b.id); bb.putLong(b.pos)
      bb.array()
    }

  override def deserialize(bytes: Array[Byte]): LongPairBuffer = {
    val b = new LongPairBuffer
    if (bytes.nonEmpty) {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      b.set = true; b.id = bb.getLong; b.pos = bb.getLong
    }
    b
  }

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("id",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("pos",
      org.apache.spark.sql.types.LongType, nullable = false)))
  override def nullable: Boolean = true

  override def withNewMutableAggBufferOffset(n: Int): MinLongPairAggExpr =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): MinLongPairAggExpr =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): MinLongPairAggExpr = copy(id = l, pos = r)

  override def prettyName: String = "min_long_pair"
}

object ArgExtremumAgg {
  import org.apache.spark.sql.graft.bridge.{column, expression}

  /** `min(struct(id AS id, pos AS pos))` on the object-hash path with
    * primitive longs — see [[MinLongPairAggExpr]]. */
  def min_long_pair(id: Column, pos: Column): Column =
    column(MinLongPairAggExpr(expression(id), expression(pos))
      .toAggregateExpression())

  /** Hash-path `min_by(value, key)` — value of the row with the least
    * key. Use where the built-in would drag the aggregation onto the
    * SortAggregate path (struct/string key or value). */
  def obj_min_by(value: Column, key: Column): Column =
    column(ArgExtremumAggExpr(expression(key), expression(value),
      isMin = true).toAggregateExpression())

  /** Hash-path `max_by(value, key)`. */
  def obj_max_by(value: Column, key: Column): Column =
    column(ArgExtremumAggExpr(expression(key), expression(value),
      isMin = false).toAggregateExpression())

  /** Hash-path `min(c)` for struct/string-typed c. */
  def obj_min(c: Column): Column = obj_min_by(c, c)

  /** Hash-path `max(c)` for struct/string-typed c. */
  def obj_max(c: Column): Column = obj_max_by(c, c)
}
