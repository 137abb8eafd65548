package graft

import org.scalatest.funsuite.AnyFunSuite

/** Regression guards on the physical plans: the scale posture (pushdown,
  * broadcast, pruning) must survive refactors — a query that silently
  * starts shuffling its fact side still passes correctness, so
  * correctness tests alone won't catch it. */
class PlanAssertionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir)
      .queryExecution.executedPlan.toString

  test("q_agg_pricing pushes the shipdate filter into the parquet scan") {
    val p = plan("q_agg_pricing")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
  }

  test("q_agg_pricing prunes to the referenced columns only") {
    val p = plan("q_agg_pricing")
    assert(!p.contains("l_orderkey"), "unreferenced column not pruned")
    assert(!p.contains("l_tax"), "unreferenced column not pruned")
  }

  test("q_join_enrich broadcasts the dimension, never shuffles lineitem") {
    val p = plan("q_join_enrich")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q_join_multiway is a pure broadcast chain") {
    val p = plan("q_join_multiway")
    assert("BroadcastHashJoin".r.findAllIn(p).length == 3)
    assert(!p.contains("SortMergeJoin"))
  }

  test("q_sim_bruteforce broadcasts queries; corpus side stays unshuffled") {
    val p = plan("q_sim_bruteforce")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q_rpm_stream_reduce partial-aggregates before the exchange") {
    val p = plan("q_rpm_stream_reduce")
    // ObjectHashAggregate partial_rpmstreamreduce runs map-side: the
    // aggregate appears below AND above the shuffle
    assert(p.contains("partial_"), s"no partial aggregation:\n$p")
  }
}
