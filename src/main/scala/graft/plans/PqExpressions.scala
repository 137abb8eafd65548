package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels: per-subspace codebook encode and the
  * asymmetric-distance (ADC) probe.
  *
  * PQ is the memory half of web-scale ANN (the FAISS IVF-PQ layout):
  * a d-dim float vector splits into m subvectors of dsub dims; each
  * subvector rounds to its nearest code in a per-subspace codebook of
  * `ncodes` centroids, so the vector at rest is m small ints —
  * m·⌈log₂ ncodes⌉ bits vs 32·d. Queries stay full-precision and
  * score against codes via the asymmetric distance Σₛ‖qₛ − Cₛ[codeₛ]‖²
  * (Jégou et al., "Product Quantization for Nearest Neighbor Search",
  * TPAMI 2011). Both kernels are single primitive JVM loops inside
  * whole-stage codegen with the flat codebook riding the plan as a
  * reference object (the MatProjectExpr pattern) — at 100 TB the
  * encode is one scan of the corpus and the probe is one scan of the
  * (32×-smaller) code table.
  *
  * Arithmetic contract (what an external replayer must reproduce):
  * all math in double (float inputs upcast per element); squared-L2
  * accumulates sequentially over dims, ADC sequentially over
  * subspaces; encode ties break to the LOWEST code (strict `<`).
  */
object PqKernels {

  /** codes(s) = argmin_c Σ_i (x[s·dsub+i] − cb[((s·ncodes)+c)·dsub+i])²,
    * ties to the lowest c. Returns null shape marker (caller maps to
    * SQL null) when |vec| ≠ m·dsub. */
  private def encodeImpl(m: Int, ncodes: Int, dsub: Int,
      cb: Array[Double], x: Int => Double, n: Int): ArrayData = {
    if (n != m * dsub) return null
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bd = Double.MaxValue
      var c = 0
      while (c < ncodes) {
        val base = (s * ncodes + c) * dsub
        var d = 0.0
        var i = 0
        while (i < dsub) {
          val t = x(s * dsub + i) - cb(base + i)
          d += t * t
          i += 1
        }
        if (d < bd) { bd = d; best = c }
        c += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  def pqEncodeFloat(vec: ArrayData, m: Int, ncodes: Int, dsub: Int,
      cb: Array[Double]): ArrayData =
    encodeImpl(m, ncodes, dsub, cb, i => vec.getFloat(i).toDouble,
      vec.numElements())

  def pqEncodeDouble(vec: ArrayData, m: Int, ncodes: Int, dsub: Int,
      cb: Array[Double]): ArrayData =
    encodeImpl(m, ncodes, dsub, cb, vec.getDouble, vec.numElements())

  /** ADC distance Σ_s Σ_i (q[s·dsub+i] − cb[((s·ncodes)+codes[s])·dsub+i])².
    * NaN shape marker (caller maps to SQL null) when |q| ≠ m·dsub,
    * |codes| ≠ m, or a code is out of [0, ncodes). */
  private def adcImpl(m: Int, ncodes: Int, dsub: Int, cb: Array[Double],
      q: Int => Double, nq: Int, codes: ArrayData): Double = {
    if (nq != m * dsub || codes.numElements() != m) return Double.NaN
    var acc = 0.0
    var s = 0
    while (s < m) {
      val c = codes.getInt(s)
      if (c < 0 || c >= ncodes) return Double.NaN
      val base = (s * ncodes + c) * dsub
      var i = 0
      while (i < dsub) {
        val t = q(s * dsub + i) - cb(base + i)
        acc += t * t
        i += 1
      }
      s += 1
    }
    acc
  }

  def pqAdcFloat(q: ArrayData, codes: ArrayData, m: Int, ncodes: Int,
      dsub: Int, cb: Array[Double]): Double =
    adcImpl(m, ncodes, dsub, cb, i => q.getFloat(i).toDouble,
      q.numElements(), codes)

  def pqAdcDouble(q: ArrayData, codes: ArrayData, m: Int, ncodes: Int,
      dsub: Int, cb: Array[Double]): Double =
    adcImpl(m, ncodes, dsub, cb, q.getDouble, q.numElements(), codes)
}

/** PQ encode: array<float|double> of length m·dsub → array<int> of m
  * codes. `cb` is the flat row-major codebook
  * (sub-major, then code, then dim: m·ncodes·dsub doubles) — a Seq in
  * the case-class signature for value equality (semanticEquals /
  * subexpression elimination), a primitive array on the kernel path. */
case class PqEncodeExpr(child: Expression, ncodes: Int, dsub: Int,
    cb: Seq[Double]) extends UnaryExpression {
  private val cbArr: Array[Double] = cb.toArray
  private val m: Int = cb.length / math.max(1, ncodes * dsub)
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

  private def isDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  private def kernel: String =
    if (isDouble) "pqEncodeDouble" else "pqEncodeFloat"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      if (ncodes > 0 && dsub > 0 && cb.nonEmpty &&
          cb.length % (ncodes * dsub) == 0)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName codebook shape: |cb| (${cb.length}) must be a " +
          s"positive multiple of ncodes·dsub (${ncodes * dsub})")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float> or array<double>, got ${t.sql}; " +
        "cast explicitly")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(v: Any): Any =
    if (isDouble)
      PqKernels.pqEncodeDouble(v.asInstanceOf[ArrayData], m, ncodes, dsub, cbArr)
    else
      PqKernels.pqEncodeFloat(v.asInstanceOf[ArrayData], m, ncodes, dsub, cbArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCb", cbArr, "double[]")
    // freshName: two kernel calls can land in ONE codegen function
    // (e.g. nearestCell + pq_encode in the same projection) — a fixed
    // local name would collide and kick the whole stage to interpreted
    val r = ctx.freshName("pqRes")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
      Object $r = graft.plans.PqKernels.$kernel($c, $m, $ncodes, $dsub, $cbRef);
      if ($r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $r; }
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** PQ asymmetric distance: (query array<float|double>, codes array<int>)
  * → double. Same codebook conventions as [[PqEncodeExpr]]. */
case class PqAdcExpr(left: Expression, right: Expression, ncodes: Int,
    dsub: Int, cb: Seq[Double]) extends BinaryExpression {
  private val cbArr: Array[Double] = cb.toArray
  private val m: Int = cb.length / math.max(1, ncodes * dsub)
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

  private def isDouble: Boolean = left.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  private def kernel: String = if (isDouble) "pqAdcDouble" else "pqAdcFloat"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _) | ArrayType(DoubleType, _),
          ArrayType(IntegerType, _)) =>
        if (ncodes > 0 && dsub > 0 && cb.nonEmpty &&
            cb.length % (ncodes * dsub) == 0)
          TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"$prettyName codebook shape: |cb| (${cb.length}) must be a " +
            s"positive multiple of ncodes·dsub (${ncodes * dsub})")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<float|double>, array<int>), got " +
          s"(${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc"

  override def nullSafeEval(q: Any, codes: Any): Any = {
    val d =
      if (isDouble)
        PqKernels.pqAdcDouble(q.asInstanceOf[ArrayData],
          codes.asInstanceOf[ArrayData], m, ncodes, dsub, cbArr)
      else
        PqKernels.pqAdcFloat(q.asInstanceOf[ArrayData],
          codes.asInstanceOf[ArrayData], m, ncodes, dsub, cbArr)
    if (d.isNaN) null else d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqAdcCb", cbArr, "double[]")
    val d = ctx.freshName("pqDist") // see PqEncodeExpr: no fixed locals
    nullSafeCodeGen(ctx, ev, (q, c) => {
      s"""
      double $d = graft.plans.PqKernels.$kernel($q, $c, $m, $ncodes, $dsub, $cbRef);
      if (Double.isNaN($d)) { ${ev.isNull} = true; }
      else { ${ev.value} = $d; }
      """
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqExpressions {
  import org.apache.spark.sql.graft.bridge.{column, expression}
  def pq_encode(vec: Column, ncodes: Int, dsub: Int,
      cb: Array[Double]): Column =
    column(PqEncodeExpr(expression(vec), ncodes, dsub, cb.toIndexedSeq))
  def pq_adc(q: Column, codes: Column, ncodes: Int, dsub: Int,
      cb: Array[Double]): Column =
    column(PqAdcExpr(expression(q), expression(codes), ncodes, dsub,
      cb.toIndexedSeq))
}
