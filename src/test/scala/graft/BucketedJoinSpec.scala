package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale posture: bucketed tables co-locate a fact-fact join so the
  * join plan has NO shuffle exchange — the pre-partitioning strategy a
  * 100 TB deployment would use for the recurring (identifier-keyed)
  * joins instead of re-shuffling every run. */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("join of two tables bucketed on the key plans without Exchange") {
    // warehouse.dir is a static conf — use the session default (cwd
    // spark-warehouse); tables are dropped in the finally.
    val a = (1 to 1000).map(i => (i.toLong, s"left_$i")).toDF("k", "va")
    val b = (1 to 1000).map(i => (i.toLong, s"right_$i")).toDF("k", "vb")
    a.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("graft_bucket_a")
    b.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("graft_bucket_b")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_bucket_a")
        .join(spark.table("graft_bucket_b"), Seq("k"))
      val physical = joined.queryExecution.executedPlan.toString
      assert(!physical.contains("Exchange"),
        s"bucketed join must not shuffle:\n$physical")
      assert(joined.count() == 1000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_a")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_b")
    }
  }
}
