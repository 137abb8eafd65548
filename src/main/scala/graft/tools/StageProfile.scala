package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Per-stage wall/task profile of one declared query's warm run —
  * the local stand-in for the Spark UI's stage table (UI is disabled
  * in bench runs). Usage:
  * `sbt "runMain graft.tools.StageProfile <query> [sfDir] [cpus]"` */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val names =
      if (args.isEmpty) Seq("q_corpus_paragraph_dedup")
      else args(0).split(",").toSeq
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = args.lift(2).getOrElse("32")
    // EngineConf mirrors Bench's engine configs — without them the
    // profile single-tasks post-shuffle stages the bench runs parallel
    val spark = graft.EngineConf.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftExtensions.register(spark)

    case class St(var name: String = "", var submitted: Long = 0,
      var completed: Long = 0, var tasks: Int = 0,
      var taskTimeMs: Long = 0, var gcMs: Long = 0,
      var shufReadMB: Double = 0, var shufWriteMB: Double = 0,
      var inputMB: Double = 0, var maxTaskMs: Long = 0)
    val stages = mutable.LinkedHashMap.empty[Int, St]
    var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit = {
        val s = stages.getOrElseUpdate(e.stageInfo.stageId, St())
        s.name = e.stageInfo.name.takeWhile(_ != '\n')
        s.submitted = System.nanoTime()
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val s = stages.getOrElseUpdate(e.stageInfo.stageId, St())
        s.completed = System.nanoTime()
        s.tasks = e.stageInfo.numTasks
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val s = stages.getOrElseUpdate(e.stageId, St())
        val m = e.taskMetrics
        if (m != null) {
          s.taskTimeMs += m.executorRunTime
          s.gcMs += m.jvmGCTime
          s.shufReadMB += m.shuffleReadMetrics.totalBytesRead / 1e6
          s.shufWriteMB += m.shuffleWriteMetrics.bytesWritten / 1e6
          s.inputMB += m.inputMetrics.bytesRead / 1e6
          s.maxTaskMs = math.max(s.maxTaskMs, m.executorRunTime)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    for (name <- names) {
      stages.clear(); jobs = 0
      val fn = graft.SparkEntry.queries(name)
      // mirror Bench's honest-cache contract: every run recomputes
      // its intra-query persists (release OUTSIDE the timed window)
      def force(): Unit = {
        fn(spark, dir).queryExecution.toRdd.count()
        graft.operators.GraftCaches.release(spark)
        spark.catalog.clearCache()
      }
      force(); force() // cold + warm-up
      org.apache.spark.sql.graft.bridge.settleListenerBus(
        spark.sparkContext, 10000)
      stages.clear(); jobs = 0
      val t0 = System.nanoTime()
      force()
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.graft.bridge.settleListenerBus(
        spark.sparkContext, 10000)
      println(f"== $name warm wall ${wall}%.3f s, $jobs jobs, ${stages.size} stages")
      var sumStage = 0.0
      stages.toSeq.sortBy(_._1).foreach { case (id, s) =>
        val dur = (s.completed - s.submitted) / 1e9
        sumStage += math.max(dur, 0)
        println(f"stage $id%3d dur=${dur}%6.3f tasks=${s.tasks}%3d " +
          f"taskSum=${s.taskTimeMs}%5d ms maxTask=${s.maxTaskMs}%5d ms " +
          f"gc=${s.gcMs}%4d in=${s.inputMB}%7.1fMB sr=${s.shufReadMB}%6.1fMB " +
          f"sw=${s.shufWriteMB}%6.1fMB  ${s.name}")
      }
      println(f"stage-wall sum ${sumStage}%.3f s (gaps = driver/planning time)")
    }
    spark.stop()
  }
}
