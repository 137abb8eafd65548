package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Pack

/** Sequence packing: the two-phase distributed prefix sum must be
  * bit-identical to the naive global-window formulation at any
  * partition count, and bins must be contiguous doc-order spans. */
class PackSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val docs = {
    val rnd = new scala.util.Random(11)
    (1L to 997L).map(i => (i, 1L + rnd.nextInt(900))).toDF("id", "n")
  }

  private lazy val global = docs
    .withColumn("cum_before", coalesce(sum($"n").over(
      Window.orderBy($"id").rowsBetween(Window.unboundedPreceding, -1)),
      lit(0L)))
    .withColumn("seq_id", floor($"cum_before" / 4096))
    .select("id", "n", "cum_before", "seq_id")

  test("two-phase prefix sum ≡ global window at several partition counts") {
    for (p <- Seq(1, 7, 32)) {
      val packed = Pack.sequencePack(docs, "id", "n", 4096, partitions = p)
        .select("id", "n", "cum_before", "seq_id")
      assert(packed.exceptAll(global).isEmpty &&
        global.exceptAll(packed).isEmpty, s"partitions=$p")
    }
  }

  test("bins are contiguous id spans with bounded token mass") {
    val packed = Pack.sequencePack(docs, "id", "n", 4096)
    val stats = Pack.sequenceStats(packed, "n")
      .orderBy("seq_id").collect()
    // seq ids are consecutive from 0
    assert(stats.map(_.getAs[Long]("seq_id")).toSeq ==
      (0L until stats.length).toSeq)
    // the token-mass bound the title promises: bin k holds the docs
    // whose cum_before lands in [k·budget, (k+1)·budget), so its mass
    // can exceed the budget only by its LAST doc's overflow — i.e.
    // sum_tokens < budget + max doc size — and every bin but possibly
    // the last must reach the budget boundary (non-degenerate fill)
    val maxDoc = docs.agg(max("n")).head().getLong(0)
    stats.foreach { r =>
      assert(r.getAs[Long]("sum_tokens") < 4096L + maxDoc,
        s"bin ${r.getAs[Long]("seq_id")} overfilled")
    }
    stats.dropRight(1).foreach { r =>
      assert(r.getAs[Long]("sum_tokens") + maxDoc > 4096L,
        s"bin ${r.getAs[Long]("seq_id")} underfilled")
    }
    // every bin but the last holds ≥ budget-boundary mass: the first doc
    // of bin k starts before k*budget + its own tokens cross it
    val spans = packed.groupBy("seq_id")
      .agg(min("id").as("lo"), max("id").as("hi"))
      .orderBy("seq_id").collect()
    spans.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("hi") < b.getAs[Long]("lo"), "overlap")
      case _ =>
    }
  }
}
