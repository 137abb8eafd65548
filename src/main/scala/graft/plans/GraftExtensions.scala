package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** SparkSessionExtensions entry point: registers every graft custom
  * expression for SQL use plus the [[JaccardLengthPruning]] optimizer
  * rule. Activate with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` or
  * call [[GraftExtensions.register]] on an existing session.
  *
  * (The reference's own surface needs no custom Rule/SparkStrategy —
  * SURVEY §4: its optimizations are source-protocol concerns or
  * join-strategy hints. The optimizer rule here serves the beyond-
  * reference set-similarity operators.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => JaccardLengthPruning)
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("rpm_ver_cmp"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[RpmVerCmpExpr].getName, "rpm_ver_cmp"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          RpmVerCmpExpr(exprs(0), exprs(1))))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("rpm_sort_key"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[RpmSortKeyExpr].getName, "rpm_sort_key"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          RpmSortKeyExpr(exprs.head)))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("simhash64"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[SimHash64Expr].getName, "simhash64"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          SimHash64Expr(exprs.head)))
  }
}

object GraftExtensions {
  /** Register the same functions + optimizer rule on an already-built
    * session (extraOptimizations is the post-build hook for rules). */
  def register(spark: SparkSession): Unit = {
    RpmExpressions.register(spark)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64Expr(exprs.head), "scala_udf")
    if (!spark.experimental.extraOptimizations.contains(JaccardLengthPruning))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ JaccardLengthPruning
  }
}
