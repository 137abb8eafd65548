package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{Constraints, RpmVersion}

/** Mutable per-group state of [[RpmStreamAggExpr]]: upstream base
  * stream → max fix version seen, under RPM-EVR order. */
final class StreamMaxBuffer {
  val m: scala.collection.mutable.HashMap[String, String] =
    scala.collection.mutable.HashMap.empty
  def put(ver: String): Unit = {
    val base = Constraints.versionBase(ver)
    m.get(base) match {
      case Some(cur) if RpmVersion.compareVersions(cur, ver) >= 0 => ()
      case _ => m.update(base, ver)
    }
  }
}

/** A2 (the RHEL grouped stream reduction, `providers/rhel/parser.py:
  * 566-675`) as a native TypedImperativeAggregate — the same per-stream
  * EVR maxima + canonical pick as
  * [[graft.operators.RpmStreamReduce.aggregator]], but the buffer is a
  * plain mutable map serialized only at shuffle boundaries. The
  * typed-udaf form re-encodes its Map buffer through an
  * ExpressionEncoder on EVERY input row (the measured ~µs/row udaf tax);
  * here the per-row path is one eval + one hash probe + an EVR compare.
  * Output struct matches the udaf's Result exactly:
  * (canonical, n_streams, streams sorted by base). */
case class RpmStreamAggExpr(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[StreamMaxBuffer]
  with UnaryLike[Expression]
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def createAggregationBuffer(): StreamMaxBuffer =
    new StreamMaxBuffer

  override def update(b: StreamMaxBuffer, input: InternalRow): StreamMaxBuffer = {
    val v = child.eval(input)
    if (v != null) b.put(v.asInstanceOf[UTF8String].toString)
    b
  }

  override def merge(b: StreamMaxBuffer, o: StreamMaxBuffer): StreamMaxBuffer = {
    o.m.valuesIterator.foreach(b.put)
    b
  }

  override def eval(b: StreamMaxBuffer): Any = {
    val out = new GenericInternalRow(3)
    if (b.m.isEmpty) {
      out.update(0, null)
      out.update(1, 0)
      out.update(2, new GenericArrayData(Array.empty[Any]))
      return out
    }
    val canonical = b.m.valuesIterator.reduce((a, c) =>
      if (RpmVersion.compareVersions(a, c) >= 0) a else c)
    val streams = b.m.toArray.sortBy(_._1)
    val rows = new Array[Any](streams.length)
    var i = 0
    while (i < streams.length) {
      val r = new GenericInternalRow(2)
      r.update(0, UTF8String.fromString(streams(i)._1))
      r.update(1, UTF8String.fromString(streams(i)._2))
      rows(i) = r
      i += 1
    }
    out.update(0, UTF8String.fromString(canonical))
    out.update(1, streams.length)
    out.update(2, new GenericArrayData(rows))
    out
  }

  // length-prefixed UTF-8, NOT writeUTF: writeUTF throws past 64 KB of
  // modified UTF-8, and this function is SQL-registered for arbitrary
  // string input
  private def writeStr(out: DataOutputStream, s: String): Unit = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    out.writeInt(bytes.length)
    out.write(bytes)
  }
  private def readStr(in: DataInputStream): String = {
    val bytes = new Array[Byte](in.readInt())
    in.readFully(bytes)
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }

  override def serialize(b: StreamMaxBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.m.size)
    b.m.foreach { case (k, v) => writeStr(out, k); writeStr(out, v) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): StreamMaxBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new StreamMaxBuffer
    val n = in.readInt()
    var i = 0
    // entries are per-base maxima already — plain insert, no compare
    while (i < n) { b.m.update(readStr(in), readStr(in)); i += 1 }
    b
  }

  override def dataType: DataType = StructType(Seq(
    StructField("canonical", StringType),
    StructField("n_streams", IntegerType, nullable = false),
    StructField("streams", ArrayType(StructType(Seq(
      StructField("base", StringType, nullable = false),
      StructField("version", StringType, nullable = false))),
      containsNull = false))))
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(n: Int): RpmStreamAggExpr =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): RpmStreamAggExpr =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): RpmStreamAggExpr =
    copy(child = c)

  override def prettyName: String = "rpm_stream_reduce"
}

object RpmStreamAgg {
  import org.apache.spark.sql.graft.bridge.{column, expression}

  /** struct(canonical, n_streams, streams) per group — drop-in for
    * `RpmStreamReduce.rpm_stream_reduce(ver)`. */
  def rpm_stream_reduce(ver: Column): Column =
    column(RpmStreamAggExpr(expression(ver)).toAggregateExpression())
}
