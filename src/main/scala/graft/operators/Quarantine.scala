package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-record error isolation (SURVEY §7.4.7): the reference
  * logs-and-continues on malformed records (`rhel/parser.py:573-574`,
  * `debian/parser.py:484-485`). In Spark a throwing expression kills
  * the whole task, so fallible transforms are wrapped to yield a
  * (value, error) pair and failing rows are routed to a quarantine
  * DataFrame instead of failing the job.
  */
object Quarantine {

  /** Wrap a fallible String→String function into a struct column
    * `(value, error)` — exactly one side is set. */
  def tryUdf(f: String => String): Column => Column = {
    val u = udf((s: String) =>
      try (f(s), null: String)
      catch { case e: Exception => (null: String, String.valueOf(e.getMessage)) })
    (c: Column) => u(c)
  }

  /** Split a DataFrame on a wrapped try-column: (good rows with `out`,
    * quarantined rows with `error`). One pass each over the cached
    * intermediate — never a job failure. */
  def split(df: DataFrame, tryCol: Column, outName: String)
      : (DataFrame, DataFrame) = {
    val marked = df.withColumn("__try", tryCol).cache()
    val good = marked.filter(col("__try._2").isNull)
      .withColumn(outName, col("__try._1")).drop("__try")
    val bad = marked.filter(col("__try._2").isNotNull)
      .withColumn("error", col("__try._2")).drop("__try")
    (good, bad)
  }
}
