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

  test("JaccardLengthPruning injects the O(1) size guard before the merge") {
    graft.plans.GraftExtensions.register(spark)
    val p = plan("q_dedup_minhash")
    // the guard shape: size(sh) cast to double compared against t*size
    assert(p.contains("size(sh"), s"no length guard in plan:\n$p")
    assert(p.contains("sorted_jaccard"), "kernel disappeared from plan")
  }

  test("JaccardLengthPruning preserves results exactly") {
    import org.apache.spark.sql.functions._
    import graft.plans.HashExpressions._
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d e f g h"), (2L, "a b c d e f g x"),
      (3L, "a b"), (4L, "totally different words here now ok"))
      .toDF("id", "text")
      .select(col("id"), word_shingle_hashes(col("text"), 3).as("sh"))
    val pairs = df.as("l").join(df.as("r"), col("l.id") < col("r.id"))
      .select(col("l.id").as("id1"), col("r.id").as("id2"),
        round(sorted_jaccard(col("l.sh"), col("r.sh")), 3).as("j"))
    val noRule = pairs.filter(col("j") >= 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.plans.GraftExtensions.register(spark)
    val withRule = pairs.filter(col("j") >= 0.4)
    assert(withRule.queryExecution.optimizedPlan.toString.contains("size("),
      "rule did not fire on the guardable filter")
    assert(withRule.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      == noRule)
  }
}
