package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Two-level (hierarchical) coarse-quantizer kernels — the IVF cell
  * assignment and probe that stay tractable past the flat quantizer's
  * ceiling.
  *
  * The flat IVF path ([[graft.operators.Similarity.nearestCell]]) folds
  * every centroid into the plan as a LITERAL struct and scores all
  * `nlist` of them per vector: O(nlist·d) per row and an O(nlist)
  * Catalyst expression tree — both fine at nlist ≤ a few thousand,
  * both fatal at the nlist ∝ n sizing a 10⁹-vector corpus implies
  * (nlist ~ 10⁵⁻⁶: the expression tree alone would dwarf the codegen
  * budget, and assignment cost would be a dense scan of the quantizer
  * per vector).
  *
  * The hierarchical shape is the FAISS inverted-multi-index family's
  * answer (Babenko & Lempitsky, "The Inverted Multi-Index", CVPR 2012;
  * FAISS's two-level coarse quantizers): k1 ≈ √nlist level-1 cells,
  * each owning k2 ≈ √nlist sub-centroids; a vector's cell is
  * cell = c1·k2 + c2 where c1 = argmax cosine over the k1 level-1
  * centroids and c2 = argmax cosine over the k2 sub-centroids OF THAT
  * level-1 cell. Assignment cost: k1 + k2 ≈ 2√nlist cosines per
  * vector instead of nlist. Probing opens the `beam` nearest level-1
  * cells and ranks their beam·k2 sub-centroids for the `nprobe` best —
  * the standard multi-index approximation (a true nearest cell hiding
  * under a level-1 cell outside the beam is missed; recall is tuned by
  * `beam`, measured in the spec).
  *
  * Both kernels are single primitive JVM loops inside whole-stage
  * codegen. The centroid tables never appear as literals (the
  * expression tree is O(1) in nlist): l1 — √nlist-sized — rides the
  * plan as a flat double[] REFERENCE OBJECT (the [[PqEncodeExpr]]
  * pattern), while l2 — nlist·dim, the table that reaches GBs at the
  * nlist 10⁵⁻⁶ / d≥512 sizing — ships via an explicit BROADCAST and is
  * unpacked once per executor ([[CoarseTables]]); expression equality
  * keys on a content digest so plan transforms stay O(1) in the table
  * size.
  *
  * Arithmetic contract (what an external replayer must reproduce):
  * cosine in double with sequential accumulation over dims — exactly
  * [[HashKernels.cosineFloat]]'s dot/(√na·√nb) — float inputs upcast
  * per element; argmax keeps the FIRST maximum (strict `>`), i.e. ties
  * break to the LOWEST index at both levels; NaN similarities (a
  * zero-norm vector or centroid) never win, and an all-NaN row lands
  * deterministically in index 0.
  *
  * NaN replay precondition: DuckDB's total order sorts NaN ABOVE all
  * doubles, so an `ORDER BY list_cosine_similarity(...) DESC` replay
  * ranks a zero-norm vector FIRST where these kernels demote it —
  * the strict sim oracles (hier and flat alike) therefore carry a
  * no-zero-norm-vector precondition. That is also the semantic
  * contract: a zero vector has no cosine direction, so index it
  * deliberately or drop it at ingest; the fixture corpus and every
  * staged index satisfy the precondition by construction (a replayer
  * that must tolerate zero vectors wraps each sim in
  * `CASE WHEN isnan(s) THEN -1e308 ELSE s END`).
  */
object CoarseKernels {

  /** Sequential-double cosine of x against the `dim` doubles of `tab`
    * at `base` — the [[HashKernels.cosineFloat]] arithmetic. */
  private def cosAt(x: Int => Double, dim: Int, tab: Array[Double],
      base: Int): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < dim) {
      val a = x(i); val b = tab(base + i)
      dot += a * b; na += a * a; nb += b * b
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Composed cell id c1·k2 + c2 by two-stage argmax-cosine; −1 shape
    * marker (caller maps to SQL null) when |vec| ≠ dim. `l1` is k1×dim
    * flat (cell-major), `l2` is k1×k2×dim flat: sub-centroid (c1, c2)
    * at ((c1·k2)+c2)·dim. */
  private def assignImpl(x: Int => Double, n: Int, k1: Int, k2: Int,
      dim: Int, l1: Array[Double], l2: Array[Double]): Int = {
    if (n != dim) return -1
    var best1 = 0; var bs1 = Double.NegativeInfinity
    var c = 0
    while (c < k1) {
      val s = cosAt(x, dim, l1, c * dim)
      if (s > bs1) { bs1 = s; best1 = c } // NaN never wins; ties → lowest
      c += 1
    }
    var best2 = 0; var bs2 = Double.NegativeInfinity
    var c2 = 0
    while (c2 < k2) {
      val s = cosAt(x, dim, l2, (best1 * k2 + c2) * dim)
      if (s > bs2) { bs2 = s; best2 = c2 }
      c2 += 1
    }
    best1 * k2 + best2
  }

  def assignFloat(vec: ArrayData, k1: Int, k2: Int, dim: Int,
      l1: Array[Double], l2: Array[Double]): Int =
    assignImpl(i => vec.getFloat(i).toDouble, vec.numElements(),
      k1, k2, dim, l1, l2)

  def assignDouble(vec: ArrayData, k1: Int, k2: Int, dim: Int,
      l1: Array[Double], l2: Array[Double]): Int =
    assignImpl(vec.getDouble, vec.numElements(), k1, k2, dim, l1, l2)

  /** The `nprobe` best composed cells (sim desc, composed id asc on
    * ties), searched through the `beam` nearest level-1 cells only.
    * Null shape marker when |vec| ≠ dim. Selection is repeated argmax
    * (beam and nprobe are small — single digits at any sane config),
    * so no allocation beyond the output and two sim scratch arrays. */
  private def probeImpl(x: Int => Double, n: Int, k1: Int, k2: Int,
      dim: Int, l1: Array[Double], l2: Array[Double], nprobe: Int,
      beam: Int): ArrayData = {
    if (n != dim) return null
    val m1 = math.min(beam, k1)
    // NaN sims (zero-norm vector or centroid) sanitize to −∞ at fill
    // time: every later comparison is then total, NaN can never win a
    // slot or poison a running max, and an all-NaN row degrades to the
    // deterministic lowest-index picks
    val s1 = new Array[Double](k1)
    var c = 0
    while (c < k1) {
      val s = cosAt(x, dim, l1, c * dim)
      s1(c) = if (java.lang.Double.isNaN(s)) Double.NegativeInfinity else s
      c += 1
    }
    val picked1 = new Array[Int](m1)
    val taken1 = new Array[Boolean](k1)
    var slot = 0
    while (slot < m1) {
      var best = -1; var bs = Double.NegativeInfinity
      var i = 0
      while (i < k1) {
        // best<0 seeds with the first untaken index; strict > after
        // that keeps the LOWEST index on ties
        if (!taken1(i) && (best < 0 || s1(i) > bs)) {
          bs = s1(i); best = i
        }
        i += 1
      }
      taken1(best) = true; picked1(slot) = best; slot += 1
    }
    val nc = m1 * k2
    val cells = new Array[Int](nc)
    val s2 = new Array[Double](nc)
    var j = 0
    var p = 0
    while (p < m1) {
      val c1 = picked1(p)
      var c2 = 0
      while (c2 < k2) {
        cells(j) = c1 * k2 + c2
        val s = cosAt(x, dim, l2, (c1 * k2 + c2) * dim)
        s2(j) = if (java.lang.Double.isNaN(s)) Double.NegativeInfinity else s
        c2 += 1; j += 1
      }
      p += 1
    }
    val out = new Array[Int](math.min(nprobe, nc))
    val taken2 = new Array[Boolean](nc)
    var o = 0
    while (o < out.length) {
      var best = -1; var bs = Double.NegativeInfinity
      var bc = Int.MaxValue
      var i = 0
      while (i < nc) {
        // ties by sim break to the LOWEST composed cell id — the
        // candidate list is not cell-ordered across level-1 picks, so
        // the tiebreak must compare ids explicitly
        if (!taken2(i) && (best < 0 || s2(i) > bs ||
            (s2(i) == bs && cells(i) < bc))) {
          bs = s2(i); bc = cells(i); best = i
        }
        i += 1
      }
      taken2(best) = true; out(o) = cells(best); o += 1
    }
    new GenericArrayData(out)
  }

  def probeFloat(vec: ArrayData, k1: Int, k2: Int, dim: Int,
      l1: Array[Double], l2: Array[Double], nprobe: Int,
      beam: Int): ArrayData =
    probeImpl(i => vec.getFloat(i).toDouble, vec.numElements(),
      k1, k2, dim, l1, l2, nprobe, beam)

  def probeDouble(vec: ArrayData, k1: Int, k2: Int, dim: Int,
      l1: Array[Double], l2: Array[Double], nprobe: Int,
      beam: Int): ArrayData =
    probeImpl(vec.getDouble, vec.numElements(), k1, k2, dim, l1, l2,
      nprobe, beam)
}

/** The trained quantizer as the kernel expressions carry it — the
  * memory-regime half of the hierarchical design (the fit half is
  * [[graft.operators.Similarity.trainCoarseHierarchical]]):
  *
  *   - `l1` (k1·dim doubles — √nlist-sized, ~1.5 MB even at
  *     nlist=10⁶/d=512) stays a plain array on the expression, riding
  *     each stage as a codegen reference object;
  *   - `l2` (nlist·dim doubles — 0.5–8 GB at the nlist 10⁵⁻⁶ / d≥512
  *     sizing the grouped store layout targets) rides an explicit
  *     `Broadcast`, so it ships to each EXECUTOR once through the
  *     block manager instead of serializing into every stage's task
  *     binary (the round-13 shape put it in the case-class signature:
  *     nlist·dim·8 B per task binary, O(nlist·dim) semanticEquals);
  *   - equality / hashCode key on a content DIGEST computed once at
  *     construction — `semanticEquals`, canonicalization and
  *     subexpression elimination over plans carrying these expressions
  *     are O(1) in nlist·dim. Two tables with equal digests are
  *     value-equal by construction (the digest covers both tables'
  *     bytes and the shape), so CSE across separately-built instances
  *     of the same quantizer remains sound.
  *
  * Lifecycle: the broadcast lives exactly as long as this handle is
  * reachable — Spark's ContextCleaner reference-tracks Broadcast
  * handles and frees the executor blocks once the handle is GC'd, so
  * a dropped quantizer cleans itself up; this is the OPPOSITE regime
  * from persisted frames (strong references in the CacheManager,
  * which is why [[graft.operators.GraftCaches]] exists for those and
  * no release hook is needed here). Callers running many quantizers
  * in one session just let the old ones go out of scope.
  *
  * Regime ceiling, stated honestly: a broadcast still materializes
  * the WHOLE l2 on every executor — measured fine at 0.5 GB
  * (nlist=131k/d=512, SCALE.md r14), and sound to the few-GB range;
  * past nlist ~10⁶ at d≥1024 (8 GB+) the next step is a probe that
  * loads only the beam's OPENED level-1 cells' k2-sized sub-tables
  * from the quantizer sidecar (beam·k2·d doubles per executor — KBs),
  * trading a per-stage sidecar read for the resident table.
  */
final class CoarseTables(
    val l1: Array[Double],
    val l2Len: Int,
    val l2Bc: org.apache.spark.broadcast.Broadcast[Array[Double]],
    val digest: String) extends Serializable {
  /** Executor-local view of the broadcast table (driver: the cached
    * local value — no copy). */
  @transient lazy val l2: Array[Double] = l2Bc.value
  override def equals(o: Any): Boolean = o match {
    case t: CoarseTables => t.digest == digest
    case _ => false
  }
  override def hashCode(): Int = digest.hashCode
  // Expression.toString renders constructor args — keep it O(1), never
  // the tables themselves
  override def toString: String =
    s"coarse_tables(l1=${l1.length}, l2=$l2Len, ${digest.take(12)})"
}

object CoarseTables {
  /** Digest + broadcast construction. The MD5 runs once per trained
    * quantizer (one linear pass over the tables — microseconds next to
    * the fit), never per plan transform. */
  def apply(spark: org.apache.spark.sql.SparkSession, l1: Array[Double],
      l2: Array[Double]): CoarseTables = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val buf = java.nio.ByteBuffer.allocate(8 * 1024)
    def feed(a: Array[Double]): Unit = {
      buf.clear(); buf.putInt(a.length); buf.flip()
      md.update(buf); buf.clear()
      var i = 0
      while (i < a.length) {
        if (buf.remaining() < 8) { buf.flip(); md.update(buf); buf.clear() }
        buf.putDouble(a(i)); i += 1
      }
      buf.flip(); md.update(buf); buf.clear()
    }
    feed(l1); feed(l2)
    val digest = md.digest().map("%02x".format(_)).mkString
    new CoarseTables(l1, l2.length, spark.sparkContext.broadcast(l2),
      digest)
  }
}

/** Shared shape plumbing for the two coarse kernels: array<float|double>
  * child, centroid tables via [[CoarseTables]] (digest equality for
  * semanticEquals / subexpression elimination, broadcast l2, plan-object
  * l1) and primitive double[] on the kernel path. */
sealed trait CoarseQuantExpr extends UnaryExpression {
  def k1: Int
  def k2: Int
  def dim: Int
  def tables: CoarseTables
  protected final def l1Arr: Array[Double] = tables.l1
  protected final def l2Arr: Array[Double] = tables.l2
  protected final def isDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  import org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext
  /** The generated-code terms for the two tables: l1 as a reference
    * object; l2 unpacked from its broadcast ONCE per generated-class
    * instance (executor-side `Broadcast.value` is the block-manager
    * fetch, cached per executor). */
  protected final def genTableRefs(ctx: CodegenContext): (String, String) = {
    val l1Ref = ctx.addReferenceObj("coarseL1", tables.l1, "double[]")
    val bcRef = ctx.addReferenceObj("coarseL2Bc", tables.l2Bc,
      "org.apache.spark.broadcast.Broadcast")
    val l2Tab = ctx.addMutableState("double[]", "coarseL2Tab",
      v => s"$v = (double[]) $bcRef.value();")
    (l1Ref, l2Tab)
  }
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      if (k1 > 0 && k2 > 0 && dim > 0 && tables.l1.length == k1 * dim &&
          tables.l2Len == k1 * k2 * dim)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName quantizer shape: need |l1| = k1·dim " +
          s"(${k1 * dim}, got ${tables.l1.length}) and |l2| = k1·k2·dim " +
          s"(${k1 * k2 * dim}, got ${tables.l2Len})")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float> or array<double>, got ${t.sql}; " +
        "cast explicitly")
  }
  override def nullable: Boolean = true
}

/** Hierarchical cell assignment: array<float|double> → int composed
  * cell id (c1·k2 + c2); null when |vec| ≠ dim. */
case class CoarseAssignExpr(child: Expression, k1: Int, k2: Int,
    dim: Int, tables: CoarseTables) extends CoarseQuantExpr {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "coarse_assign"
  private def kernel: String = if (isDouble) "assignDouble" else "assignFloat"

  override def nullSafeEval(v: Any): Any = {
    val r =
      if (isDouble)
        CoarseKernels.assignDouble(v.asInstanceOf[ArrayData], k1, k2,
          dim, l1Arr, l2Arr)
      else
        CoarseKernels.assignFloat(v.asInstanceOf[ArrayData], k1, k2,
          dim, l1Arr, l2Arr)
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val (l1Ref, l2Ref) = genTableRefs(ctx)
    val r = ctx.freshName("cell")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
      int $r = graft.plans.CoarseKernels.$kernel($c, $k1, $k2, $dim,
        $l1Ref, $l2Ref);
      if ($r < 0) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** Hierarchical probe: array<float|double> → array<int> of the nprobe
  * best composed cells through a beam of level-1 cells; null when
  * |vec| ≠ dim. */
case class CoarseProbeExpr(child: Expression, k1: Int, k2: Int,
    dim: Int, tables: CoarseTables, nprobe: Int,
    beam: Int) extends CoarseQuantExpr {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "coarse_probe"
  private def kernel: String = if (isDouble) "probeDouble" else "probeFloat"

  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  override def checkInputDataTypes(): TypeCheckResult =
    super.checkInputDataTypes() match {
      case TypeCheckResult.TypeCheckSuccess if nprobe <= 0 || beam <= 0 =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs nprobe > 0 and beam > 0")
      case other => other
    }

  override def nullSafeEval(v: Any): Any =
    if (isDouble)
      CoarseKernels.probeDouble(v.asInstanceOf[ArrayData], k1, k2, dim,
        l1Arr, l2Arr, nprobe, beam)
    else
      CoarseKernels.probeFloat(v.asInstanceOf[ArrayData], k1, k2, dim,
        l1Arr, l2Arr, nprobe, beam)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val (l1Ref, l2Ref) = genTableRefs(ctx)
    val r = ctx.freshName("probeRes")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
      Object $r = graft.plans.CoarseKernels.$kernel($c, $k1, $k2, $dim,
        $l1Ref, $l2Ref, $nprobe, $beam);
      if ($r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $r; }
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object CoarseExpressions {
  import org.apache.spark.sql.graft.bridge.{column, expression}

  def coarse_assign(vec: Column, k1: Int, k2: Int, dim: Int,
      tables: CoarseTables): Column =
    column(CoarseAssignExpr(expression(vec), k1, k2, dim, tables))

  def coarse_probe(vec: Column, k1: Int, k2: Int, dim: Int,
      tables: CoarseTables, nprobe: Int, beam: Int): Column =
    column(CoarseProbeExpr(expression(vec), k1, k2, dim, tables,
      nprobe, beam))

  /** Seq-table conveniences (specs, one-off grids): each call digests
    * and broadcasts its l2 — production callers go through
    * [[graft.operators.Similarity.CoarseQuantizer]]'s cached tables so
    * one quantizer is broadcast once per session, not per expression. */
  def coarse_assign(vec: Column, k1: Int, k2: Int, dim: Int,
      l1: Seq[Double], l2: Seq[Double]): Column =
    coarse_assign(vec, k1, k2, dim, CoarseTables(
      org.apache.spark.sql.SparkSession.active, l1.toArray, l2.toArray))

  def coarse_probe(vec: Column, k1: Int, k2: Int, dim: Int,
      l1: Seq[Double], l2: Seq[Double], nprobe: Int, beam: Int): Column =
    coarse_probe(vec, k1, k2, dim, CoarseTables(
      org.apache.spark.sql.SparkSession.active, l1.toArray, l2.toArray),
      nprobe, beam)
}
