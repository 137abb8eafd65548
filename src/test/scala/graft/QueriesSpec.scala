package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = EngineConf.tuned(SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

/** Every registered query runs at sf0.001 and (for the non-candidate-set
  * queries) returns rows; the flagship entry returns envelope rows. */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  // Queries whose correct output may legitimately be small/empty on the
  // tiny smoke SF (candidate-pair generators, filtered joins).
  private val mayBeEmpty = Set("q_join_prefix_theta", "q_set_except")

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs at sf0.001") {
      val df = fn(spark, dir)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry (flagship) returns envelope rows with required columns") {
    val df = SparkEntry.entry(spark)
    assert(df.columns.toSet == Set("identifier", "schema", "item"))
    assert(df.count() > 0)
  }

  test("custom expressions are SQL-callable after registration") {
    graft.plans.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT rpm_ver_cmp('1:2', '1') AS c, rpm_sort_key('1.2-3') AS k, " +
        "simhash64(array('a','b')) AS s").head()
    assert(r.getAs[Int]("c") == 1)
    assert(r.getAs[String]("k").startsWith("E"))
    assert(r.getAs[Long]("s") != 0L)
  }

  test("every oracleSql key exists in queries") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }
}
