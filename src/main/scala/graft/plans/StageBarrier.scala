package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity expression flagged non-deterministic: pins an expensive
  * kernel column to the Project that defines it.
  *
  * The optimizer substitutes Project aliases into filter conditions it
  * pushes down (PushPredicateThroughNonJoin has no cost model), so a
  * `select(kernel(x) as t).filter(p(t))` evaluates the kernel TWICE —
  * once inside the pushed filter (below any exchange, on the unspread
  * scan) and once in the surviving projection. That is the guide's
  * §4.4 duplicated-evaluation trap, and it also defeats Q.spread:
  * the duplicated copy lands below the respread exchange on the
  * single-split test scan. Marking the staged column non-deterministic
  * blocks alias substitution and project collapse; the value itself is
  * a pure pass-through of the child (bit-identical, codegen'd to the
  * child's own code), so results are unchanged at every scale.
  *
  * Use ONLY on genuinely expensive kernels right where they are
  * aliased: the flag also stops legitimate pushdowns of other
  * predicates through that Project (the §4.4 trade-off).
  */
case class StageBarrierExpr(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(
      newChild: Expression): StageBarrierExpr = copy(child = newChild)
  override def prettyName: String = "stage_barrier"
}

object StageBarrier {
  import org.apache.spark.sql.graft.bridge.{column, expression}

  /** Pin `c`'s evaluation to the Project that aliases it (see
    * [[StageBarrierExpr]]). */
  def stage(c: Column): Column = column(StageBarrierExpr(expression(c)))
}
