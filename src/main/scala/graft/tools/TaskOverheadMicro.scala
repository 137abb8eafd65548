package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway micro-probe (r17): where does per-task executorRunTime go
  * on tiny-data stages at local[32]? Runs the same 2000-row
  * shuffle+aggregate at several shuffle-partition counts and reports
  * wall + summed executorRunTime, isolating per-task fixed cost from
  * data-proportional work. */
object TaskOverheadMicro {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.EngineConf.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val taskMs = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null) { taskMs.addAndGet(m.executorRunTime); () }
        }
      })
    def settle(): Unit = org.apache.spark.sql.graft.bridge
      .settleListenerBus(spark.sparkContext, 10000)
    val base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    for (parts <- Seq(1, 8, 32)) {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      def q = base.repartition(parts, col("vec_id"))
        .groupBy(col("vec_id") % 50).agg(count(lit(1)))
      q.queryExecution.toRdd.count() // warm
      settle(); val t0k = taskMs.get(); val t0 = System.nanoTime()
      (1 to 5).foreach(_ => q.queryExecution.toRdd.count())
      val wall = (System.nanoTime() - t0) / 5e9
      settle()
      val task = (taskMs.get() - t0k) / 5e3
      println(f"parts=$parts%3d wall=${wall}%.3f s taskSum=${task}%.3f s")
    }
    // same, but with a 64-dim float array column flowing through
    for (parts <- Seq(1, 8, 32)) {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      def q = base.repartition(parts, col("vec_id"))
        .groupBy(col("vec_id") % 50)
        .agg(count(lit(1)), sum(element_at(col("embedding"), 1)))
      q.queryExecution.toRdd.count()
      settle(); val t0k = taskMs.get(); val t0 = System.nanoTime()
      (1 to 5).foreach(_ => q.queryExecution.toRdd.count())
      val wall = (System.nanoTime() - t0) / 5e9
      settle()
      val task = (taskMs.get() - t0k) / 5e3
      println(f"vec parts=$parts%3d wall=${wall}%.3f s taskSum=${task}%.3f s")
    }
    spark.stop()
  }
}
