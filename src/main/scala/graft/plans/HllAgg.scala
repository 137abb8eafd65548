package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HyperLogLog REGISTERS on the md5-prefix basis — the distinct-count
  * sketch with every step oracle-replayable (unlike the engine
  * built-in `approx_count_distinct`, whose internal hashing no other
  * engine can recompute):
  *
  *   v    = 60-bit md5 prefix of the key
  *          (`('0x' || substr(md5(k), 1, 15))::BIGINT`)
  *   idx  = v % 2^p              (low p bits pick the register)
  *   w    = v // 2^p             (the remaining 60−p bits)
  *   rank = (60−p) + 1 − bitlength(w)   (w = 0 → (60−p)+1)
  *   register[idx] = max(register[idx], rank)
  *
  * Returns the 2^p registers as array<int>; merge is elementwise max
  * (commutative ⇒ partition-invariant), state is 2^p ints per partial.
  * The published HLL estimate (αm·m²/Σ2^−M with the small-range
  * linear-counting branch) composes from built-ins over the array —
  * exactly-replayable because Σ2^−M is computed in EXACT integer
  * arithmetic (Σ2^(R−M) as decimal, R = max rank) before one double
  * division. Duplicate keys are absorbed by the max, so the sketch
  * sees distinct values by construction.
  */
case class HllRegistersExpr(key: Expression, p: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] with UnaryLike[Expression]
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  require(p >= 4 && p <= 16, s"hll_registers: p must be in [4,16], got $p")

  private val m = 1 << p
  private val wBits = 60 - p

  override def child: Expression = key
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Int] = new Array[Int](m)

  override def update(b: Array[Int], input: InternalRow): Array[Int] = {
    val v = key.eval(input)
    if (v != null) {
      val h = HashKernels.md5Prefix60(v.asInstanceOf[UTF8String])
      val idx = (h % m).toInt
      val w = h >>> p
      // bitlength(w) = 64 - nlz(w); rank counts the leading zeros of
      // the (60-p)-bit window plus one
      val rank =
        if (w == 0L) wBits + 1
        else wBits + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rank > b(idx)) b(idx) = rank
    }
    b
  }

  override def merge(b: Array[Int], o: Array[Int]): Array[Int] = {
    var i = 0
    while (i < m) { if (o(i) > b(i)) b(i) = o(i); i += 1 }
    b
  }

  override def eval(b: Array[Int]): Any = new GenericArrayData(b.clone())

  override def serialize(b: Array[Int]): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 * m)
    var i = 0
    while (i < m) { buf.putInt(b(i)); i += 1 }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val buf = ByteBuffer.wrap(bytes)
    val out = new Array[Int](m)
    var i = 0
    while (i < m) { out(i) = buf.getInt(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): HllRegistersExpr =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllRegistersExpr =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): HllRegistersExpr =
    copy(key = c)

  override def prettyName: String = "hll_registers"
}

object HllAgg {
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.graft.bridge.{column, expression}

  def hll_registers(p: Int)(key: Column): Column =
    column(HllRegistersExpr(expression(key), p).toAggregateExpression())

  /** The published α_m bias constant times m² — ONE definition shared
    * by [[hll_estimate]] and any oracle that interpolates the literal
    * (the CmsBuffer.xxh64Cell convention: both sides aligned by
    * construction, not by parallel typing). */
  def alphaMM(p: Int): Double = {
    val m = 1 << p
    // Flajolet et al. publish EXACT α_m for the three smallest register
    // counts and the asymptotic form only for m ≥ 128 — applying the
    // asymptote at m=16 would bias the estimator ~2% low vs the paper
    val a = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    a * m * m
  }

  /** The published HLL estimate over a [[hll_registers]] array, as
    * pure built-in Column arithmetic (so an oracle can replay it):
    * E = α_m·m² / Σ2^−M, computed via the EXACT integer sum
    * Σ2^(R−M) (decimal; R = (60−p)+1 = the max possible rank) and one
    * double division; small-range branch E ≤ 2.5m ∧ V>0 → m·ln(m/V).
    * Rounded to 3 dp — the repo's established ln-parity grain. */
  def hll_estimate(regs: Column, p: Int): Column = {
    val m = 1 << p
    val rMax = (60 - p) + 1
    val aMM = alphaMM(p)
    val dec = DecimalType(38, 0)
    val s = aggregate(regs, lit(0).cast(dec),
      (acc, r) => acc + pow(lit(2.0), lit(rMax) - r).cast(dec))
    val v0 = size(filter(regs, r => r === 0))
    val eRaw = lit(aMM) /
      (s.cast("double") / lit(math.pow(2.0, rMax)))
    round(
      when(eRaw <= lit(2.5 * m) && v0 > 0,
        lit(m.toDouble) * log(lit(m.toDouble) / v0.cast("double")))
        .otherwise(eRaw), 3)
  }
}
