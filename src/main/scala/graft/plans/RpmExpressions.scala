package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.RpmVersion

/** Native Catalyst expressions for the RPM-EVR domain (SURVEY §2.9 F1/F2,
  * §7.4 hard part 1) — the hot-path versions of the UDFs in
  * [[graft.functions.RpmVersion]].
  *
  * Both generate code that calls the static comparator directly, so they
  * stay inside whole-stage codegen (no UDF serialization, no Option
  * boxing, null handling inherited from Unary/BinaryExpression's
  * nullSafeCodeGen). `RpmSortKey` emits the byte-comparable encoding, so
  * downstream `orderBy`/`max_by`/`min_by` use plain binary string
  * comparison — sorting never calls back into the comparator.
  */
case class RpmVerCmpExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "rpm_ver_cmp"

  override def nullSafeEval(a: Any, b: Any): Any =
    RpmVersion.compareVersions(a.toString, b.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.RpmVersion.compareVersions($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class RpmSortKeyExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "rpm_sort_key"

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(RpmVersion.sortKey(v.toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.RpmVersion.sortKey($v.toString()))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One-parse EVR split: struct<epoch, version, release> from a single
  * [[RpmVersion.splitFullVersion]] call. The separate
  * rpm_epoch/rpm_version/rpm_release UDFs each re-parsed the string, so
  * a 3-field projection parsed every row three times through the UDF
  * bridge (the q_fn_evr_split hot path); this parses once inside
  * whole-stage codegen and lets the projection pick fields off the
  * struct. Field CSE: identical evr_split subtrees are deduplicated by
  * codegen subexpression elimination, and CollapseProject keeps the
  * struct materialized rather than re-expanding a non-cheap child. */
case class EvrSplitExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = EvrSplitExpr.schema
  override def prettyName: String = "evr_split"

  override def nullSafeEval(v: Any): Any =
    EvrSplitExpr.split(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"graft.plans.EvrSplitExpr.split($v)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object EvrSplitExpr {
  import org.apache.spark.sql.types.{StructField, StructType}

  val schema: StructType = StructType(Seq(
    StructField("epoch", StringType, nullable = true),
    StructField("version", StringType, nullable = true),
    StructField("release", StringType, nullable = true)))

  /** The codegen kernel: ONE splitFullVersion call per row. */
  def split(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val (e, v, r) = RpmVersion.splitFullVersion(s.toString)
    def u(x: String): Any = if (x == null) null else UTF8String.fromString(x)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](u(e), u(v), u(r)))
  }
}

object RpmExpressions {
  import org.apache.spark.sql.graft.bridge.{column, expression}

  /** Codegen'd column API (preferred over RpmVersion's UDFs on hot paths). */
  def rpm_ver_cmp(a: Column, b: Column): Column =
    column(RpmVerCmpExpr(expression(a), expression(b)))
  def rpm_sort_key(v: Column): Column =
    column(RpmSortKeyExpr(expression(v)))
  def evr_split(v: Column): Column =
    column(EvrSplitExpr(expression(v)))

  // SQL registration lives in GraftExtensions.builders — ONE list for
  // every kernel, so the two paths (extensions + post-build register)
  // cannot drift.
}
