package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // Optional 3rd arg: comma-separated query names (local iteration).
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // engine performance configs shared with Bench/Cli — see EngineConf
    val spark = EngineConf.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.register(spark)
    new java.io.File(outDir).mkdirs()
    // build the cached staging fixtures concurrently up front (r16):
    // same wall-clock cut as Bench — the staged trees' build chains
    // run on parallel driver threads instead of serializing through
    // whichever query touches each first. Skipped for single-query
    // local iteration (`only`), where staging the world would cost
    // more than it saves.
    if (only.isEmpty)
      try QueriesPipeline.preStageAll(spark, sfDir)
      catch { case e: Throwable =>
        System.err.println(s"[verify] prestage failed: ${e.getMessage}") }
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
          // delete any PREVIOUS run's output for this query: local
          // iteration reuses outDir, and a stale parquet from before
          // the regression would make the compare pass on old data
          try {
            val d = java.nio.file.Paths.get(s"$outDir/$name")
            if (java.nio.file.Files.exists(d))
              java.nio.file.Files.walk(d)
                .sorted(java.util.Comparator.reverseOrder())
                .forEach(f => { java.nio.file.Files.deleteIfExists(f); () })
          } catch { case _: Throwable => () }
        }
        // drop intra-query caches between queries (same lifecycle
        // contract as Bench): each query's output is written above, so
        // nothing lazy still reads them, and 168 queries' persisted
        // frames would otherwise accumulate in the CacheManager
        try {
          graft.operators.GraftCaches.release(spark)
          spark.catalog.clearCache()
        } catch { case _: Throwable => () }
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // {STAGING:tag} → the run's staging dir for that tag: oracles that
    // replay a query against a PERSISTED artifact (IVF centroids) need
    // the same md5-keyed path the query wrote — static SQL can't spell
    // it, so the dump substitutes it per sfDir.
    val stagingPat = "\\{STAGING:([A-Za-z0-9_]+)\\}".r
    def subst(sql: String): String = stagingPat.replaceAllIn(sql,
      m => java.util.regex.Matcher.quoteReplacement(
        Q.stagingDir(sfDir, m.group(1))))
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(subst(v))}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
