package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for the 100 TB regime.
  *
  * AQE's skew-join splitting covers sort-merge joins at runtime; these
  * cover the aggregation side (a hot grouping key — one CVE touched by
  * millions of records, one boilerplate document duplicated everywhere)
  * where a single reducer would otherwise own the hot key.
  */
object Skew {

  /** Two-stage salted aggregation: groupBy (keys + salt) computes
    * partials across `saltBuckets` reducers, then the salt is dropped
    * and partials combine. `partials` and `combine` must form an
    * associative decomposition of the target aggregate (sum/count/min/
    * max/collect-style all qualify).
    *
    * Example — skew-proof count+sum per key:
    * {{{
    * saltedAgg(df, Seq(col("k")), 16,
    *   Seq(count(lit(1)).as("n"), sum(col("v")).as("s")),
    *   Seq(sum(col("n")).as("n"), sum(col("s")).as("s")))
    * }}}
    */
  def saltedAgg(df: DataFrame, keys: Seq[Column], saltBuckets: Int,
      partials: Seq[Column], combine: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(saltBuckets)))
    salted.groupBy(keys :+ col("__salt"): _*)
      .agg(partials.head, partials.tail: _*)
      .drop("__salt")
      .groupBy(keys: _*)
      .agg(combine.head, combine.tail: _*)
  }

  /** Salted broadcast-side replication for a skewed equi-join: the big
    * side gets a random salt in [0, n); the small side is exploded n× so
    * every (key, salt) pair still matches. Join keys become
    * (key, __salt). Use when one hot key floods a single join task and
    * the small side is broadcastable anyway. */
  def saltJoinSides(big: DataFrame, small: DataFrame, n: Int)
      : (DataFrame, DataFrame) = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(n.toLong)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(n.toLong - 1))))
    (saltedBig, replicated)
  }
}
