package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's private[sql] Column↔Expression conversions (the
  * unified Column of Spark 4 no longer exposes `.expr`/`new Column(e)`
  * publicly). Standard extension-library pattern: one file inside the
  * org.apache.spark.sql package tree, nothing else reaches in.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Observed metrics from an EXECUTED plan, descending through AQE
    * wrappers. `QueryExecution.observedMetrics` comes back empty when
    * the root is AdaptiveSparkPlanExec (the CollectMetricsExec nodes
    * live inside query stages its TreeNode traversal treats as
    * leaves — verified empirically on 4.1.2: the same query reports
    * its metrics with AQE off and Map() with AQE on), so telemetry
    * that must survive the default AQE-on config walks the adaptive
    * plan and the stage-wrapped subtrees itself. */
  def observedMetrics(plan: org.apache.spark.sql.execution.SparkPlan)
      : Map[String, org.apache.spark.sql.Row] = {
    import org.apache.spark.sql.execution.{CollectMetricsExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{
      AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    def nodes(p: SparkPlan): Seq[CollectMetricsExec] = p match {
      case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
      case q: QueryStageExec => nodes(q.plan)
      // a persisted subtree hides its plan behind InMemoryTableScan —
      // without this descent, metrics observed below a .persist() are
      // invisible to the session listener on the action that FILLS
      // the cache (found live: the LSH saturation WARN never fired
      // inside nearDedupUnits because connectedComponents persists
      // the candidate pairs)
      case i: InMemoryTableScanExec => nodes(i.relation.cachedPlan)
      case c: CollectMetricsExec => c +: c.children.flatMap(nodes)
      case other => other.children.flatMap(nodes)
    }
    nodes(plan).map(c => c.name -> c.collectedMetrics).toMap
  }

  /** Whether the session's CacheManager holds no cached plans — the
    * instrument GraftCachesSpec uses to prove no graft-created cache
    * survives an increment cycle. CacheManager is private[sql], hence
    * this bridge. */
  def cacheManagerIsEmpty(spark: org.apache.spark.sql.SparkSession)
      : Boolean =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager.isEmpty

  /** Block until the shared listener bus has dispatched every queued
    * event (QueryExecutionListener callbacks ride an AsyncEventQueue on
    * this bus). The instrument the skew-tally drills use instead of a
    * fixed sleep — a sleep can return while execution events are still
    * in flight and silently undercount. `waitUntilEmpty` is
    * private[spark] in source, hence this bridge. */
  def settleListenerBus(sc: org.apache.spark.SparkContext,
      timeoutMs: Long): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => () }

  /** (numSkewedPartitions, numSkewedSplits) summed over every
    * AQEShuffleRead in an executed adaptive plan — the instrument the
    * 10^8-doc flagship drill uses to record whether AQE's skew-join
    * handling fired (the Zipf mega-unit's rebuild-join partition is
    * the candidate). Same stage-descent as [[observedMetrics]]: the
    * reads live inside query stages the plain TreeNode walk treats as
    * leaves. */
  def skewStats(plan: org.apache.spark.sql.execution.SparkPlan)
      : (Long, Long) = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{
      AdaptiveSparkPlanExec, AQEShuffleReadExec, QueryStageExec}
    def nodes(p: SparkPlan): Seq[AQEShuffleReadExec] = p match {
      case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
      case q: QueryStageExec => nodes(q.plan)
      case r: AQEShuffleReadExec => r +: r.children.flatMap(nodes)
      case other => other.children.flatMap(nodes)
    }
    val rs = nodes(plan)
    def m(r: AQEShuffleReadExec, k: String): Long =
      r.metrics.get(k).map(_.value).getOrElse(0L)
    (rs.map(m(_, "numSkewedPartitions")).sum,
      rs.map(m(_, "numSkewedSplits")).sum)
  }
}
