package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** F8 (CVSS v3.x scoring, reference `providers/rhel/parser.py:1155-1176`
  * / `providers/github/parser.py:604-628`) as a native expression: the
  * ScalaUDF form paid the reflection-encoder round-trip for the Scores
  * case class on every row (~1.3µs/row measured — the scoring arithmetic
  * itself is cents). Parsing/scoring logic is shared with
  * [[graft.functions.Cvss.score]]; null for malformed vectors, matching
  * the reference's log-and-skip. */
case class Cvss3ScoreExpr(child: Expression)
  extends UnaryExpression with CodegenFallback
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = StructType(Seq(
    StructField("version", StringType),
    StructField("baseScore", DoubleType, nullable = false),
    StructField("exploitabilityScore", DoubleType, nullable = false),
    StructField("impactScore", DoubleType, nullable = false),
    StructField("baseSeverity", StringType)))
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val s = graft.functions.Cvss.score(v.asInstanceOf[UTF8String].toString)
    if (s == null) null
    else {
      val r = new GenericInternalRow(5)
      r.update(0, UTF8String.fromString(s.version))
      r.update(1, s.baseScore)
      r.update(2, s.exploitabilityScore)
      r.update(3, s.impactScore)
      r.update(4, UTF8String.fromString(s.baseSeverity))
      r
    }
  }

  override protected def withNewChildInternal(c: Expression): Cvss3ScoreExpr =
    copy(child = c)
  override def prettyName: String = "cvss3_score"
}
