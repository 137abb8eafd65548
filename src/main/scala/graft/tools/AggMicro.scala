package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway micro-bench: min(struct) [SortAggregate] vs the
  * object-hash arg-extremum forms, on a synthetic keep-first shape. */
object AggMicro {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(5000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        (1 << 22).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.range(n).select(
      (col("id") % 500000).as("u"),
      (col("id") % 97).as("doc"),
      (col("id") % 1013).cast("int").as("pos"))
      .withColumn("u", md5(col("u").cast("string")))
    df.persist(); df.count()
    def time(tag: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      mk.queryExecution.toRdd.count() // warm
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag%-22s min=${runs.min}%.3f runs=${runs.map(r => f"$r%.3f").mkString(",")}")
    }
    time("min_struct") {
      df.groupBy("u").agg(min(struct(col("doc"), col("pos"))).as("f"))
    }
    time("obj_min_struct") {
      df.groupBy("u").agg(graft.plans.ArgExtremumAgg
        .obj_min(struct(col("doc"), col("pos"))).as("f"))
    }
    time("min_long_pair") {
      df.groupBy("u").agg(graft.plans.ArgExtremumAgg
        .min_long_pair(col("doc"), col("pos")).as("f"))
    }
    time("max_by_string") {
      df.groupBy("doc").agg(max_by(col("u"), col("u")).as("f"))
    }
    time("obj_max_by_string") {
      df.groupBy("doc").agg(graft.plans.ArgExtremumAgg
        .obj_max_by(col("u"), col("u")).as("f"))
    }
    spark.stop()
  }
}
