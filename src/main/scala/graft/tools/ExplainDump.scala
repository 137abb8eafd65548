package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dumps `.explain("formatted")` of declared queries to individual files —
  * the optimization round's before/after plan artifacts.
  *
  * Usage: `sbt "runMain graft.tools.ExplainDump <sfDir> <outDir> <suffix>
  * [names...]"` — no names = every declared query. Suffix is appended as
  * `<query>_<suffix>.txt` (e.g. `before` / `after`).
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("plans/r16")
    val suffix = args.lift(2).getOrElse("before")
    val names =
      if (args.length > 3) args.drop(3).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.EngineConf.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftExtensions.register(spark)
    Files.createDirectories(Paths.get(out))
    for (name <- names) {
      try {
        val df = graft.SparkEntry.queries(name)(spark, dir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        // elide literal vector payloads (IVF centroids) but keep structure
        val trimmed = txt.linesIterator
          .map(l => if (l.length <= 600) l else l.take(600) + " ...[elided]")
          .mkString("\n")
        Files.writeString(Paths.get(s"$out/${name}_$suffix.txt"), trimmed)
        println(s"[explain] $name -> $out/${name}_$suffix.txt")
      } catch { case e: Throwable =>
        println(s"[explain] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
