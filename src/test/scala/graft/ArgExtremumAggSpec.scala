package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The hash-path extremum aggregates must be drop-in equal to the
  * built-ins they replace (min(struct), min_by/max_by), and the plans
  * must actually leave the SortAggregate path — that plan move is the
  * whole point (see ArgExtremumAgg's scaladoc). */
class ArgExtremumAggSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import graft.plans.ArgExtremumAgg._

  private def corpus = {
    import spark.implicits._
    // keys collide across groups, several rows share (g); ids/pos
    // include 0 and negatives to exercise the packed compare
    (0 until 4000).map { i =>
      (s"g${i % 97}", (i * 37 % 211).toLong - 13, (i % 29).toLong,
        s"v${i % 53}")
    }.toDF("g", "id", "pos", "payload")
  }

  test("min_long_pair == min(struct(id, pos)) on every group") {
    val df = corpus
    val a = df.groupBy("g")
      .agg(min(struct(col("id"), col("pos"))).as("f"))
      .select(col("g"), col("f")("id").as("id"), col("f")("pos").as("pos"))
    val b = df.groupBy("g")
      .agg(min_long_pair(col("id"), col("pos")).as("f"))
      .select(col("g"), col("f")("id").as("id"), col("f")("pos").as("pos"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("obj_min_by / obj_max_by == min_by / max_by (string keys)") {
    val df = corpus
    val a = df.groupBy("g").agg(
      min_by(col("payload"), col("payload")).as("lo"),
      max_by(col("payload"), col("payload")).as("hi"))
    val b = df.groupBy("g").agg(
      obj_min_by(col("payload"), col("payload")).as("lo"),
      obj_max_by(col("payload"), col("payload")).as("hi"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("obj_min over struct keys == min(struct)") {
    val df = corpus
    val a = df.groupBy("g")
      .agg(min(struct(col("payload"), col("id"))).as("f"))
    val b = df.groupBy("g")
      .agg(obj_min(struct(col("payload"), col("id"))).as("f"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("null keys are skipped; all-null group yields null (min_by " +
      "semantics)") {
    import spark.implicits._
    val df = Seq(("a", Some(5L), 1L), ("a", None, 0L), ("b", None, 2L))
      .toDF("g", "id", "pos")
    val r = df.groupBy("g")
      .agg(min_long_pair(col("id"), col("pos")).as("f"))
      .select(col("g"), col("f")("id").as("id"))
      .collect().map(x => x.getString(0) ->
        (if (x.isNullAt(1)) null else x.getLong(1))).toMap
    assert(r("a") == 5L)
    assert(r("b") == null)
  }

  test("the aggregates plan as ObjectHashAggregate, not SortAggregate") {
    val df = corpus
    val p = df.groupBy("g")
      .agg(min_long_pair(col("id"), col("pos")).as("f"),
        count(lit(1)).as("c"))
      .queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), p)
    assert(!p.contains("SortAggregate"), p)
  }

  test("merge path: partial buffers survive serialization across an " +
      "exchange (repartitioned input, many partitions)") {
    val df = corpus.repartition(13)
    val a = df.groupBy("g")
      .agg(min(struct(col("id"), col("pos"))).as("f"))
      .select(col("g"), col("f")("id").as("id"))
    val b = df.groupBy("g")
      .agg(min_long_pair(col("id"), col("pos")).as("f"))
      .select(col("g"), col("f")("id").as("id"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("StageBarrier.stage is a bit-identical pass-through that blocks " +
      "filter pushdown through its Project") {
    import graft.plans.StageBarrier.stage
    // parquet-backed input: a LocalRelation would be constant-folded
    // through the barrier at optimize time and prove nothing
    val df = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").cast("string").as("g"),
        col("source").as("payload"))
    val plain = df.select(col("g"), upper(col("payload")).as("t"))
      .filter(length(col("t")) > 1)
    val staged = df.select(col("g"), stage(upper(col("payload"))).as("t"))
      .filter(length(col("t")) > 1)
    assert(plain.exceptAll(staged).isEmpty &&
      staged.exceptAll(plain).isEmpty)
    val op = staged.queryExecution.optimizedPlan.toString
    // the filter must sit ABOVE the project that computes t
    assert(op.indexOf("Filter") < op.indexOf("stage_barrier"), op)
  }
}
