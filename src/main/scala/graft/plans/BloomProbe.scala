package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.xxhash64
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.bridge.{column, expression}
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Thin wrappers over Spark's built-in Bloom-filter expressions (the
  * machinery behind runtime row-level join filtering): a distributed
  * sketch build (`BloomFilterAggregate` — a TypedImperativeAggregate,
  * so partials fold map-side and only O(numBits) state crosses the
  * shuffle) and a codegen'd probe (`BloomFilterMightContain`). Both
  * ends key on `xxhash64` longs; the caller applies the same hash on
  * build and probe sides.
  *
  * Spark caps a single sketch at
  * `spark.sql.optimizer.runtime.bloomFilter.maxNumBits` (64M bits =
  * 8 MB default); [[optimalNumBits]] clamps to that cap, which at the
  * default turns saturated once the build side passes ~10M items —
  * past that, raise the conf alongside the driver/executor memory it
  * implies.
  */
object BloomProbe {

  /** Bits for `items` insertions at `fpp`, clamped to Spark's
    * configured per-sketch cap (the aggregate type-checks against it). */
  def optimalNumBits(items: Long, fpp: Double, maxBits: Long): Long =
    math.max(64L,
      math.min(BloomFilter.optimalNumOfBits(math.max(items, 1L), fpp),
        maxBits))

  /** Build one serialized Bloom filter over `key` of `keyed` — the
    * shared sizing + aggregate for every bloom-guarded operator.
    *
    * `expectedItems ≤ 0` counts the frame first (a second scan of the
    * build side — pass the count when a manifest already knows it).
    * Spark SILENTLY clamps the aggregate's estimatedNumItems to
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems` (4M
    * default), so bits are sized for the CLAMPED count to keep the
    * hash-function count optimal: past the cap the filter degrades
    * gracefully (higher fpp → more verify work, never wrong answers)
    * instead of saturating on a bits/items mismatch. Past ~4M build
    * items, raise maxNumItems AND maxNumBits together.
    *
    * Returns null iff `keyed` is empty (the aggregate's empty-input
    * result) — callers must branch, a null literal probe evaluates to
    * null and silently drops every row from BOTH sides of a split. */
  def buildFilter(keyed: DataFrame, key: Column, fpp: Double,
      expectedItems: Long): Array[Byte] = {
    val conf = keyed.sparkSession.conf
    def longConf(k: String, d: Long) =
      conf.getOption(k).map(_.toLong).getOrElse(d)
    val maxBits = longConf(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits", 67108864L)
    val maxItems = longConf(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumItems", 4000000L)
    val counted = if (expectedItems > 0) expectedItems else keyed.count()
    val items = math.min(math.max(counted, 1L), maxItems)
    keyed
      .agg(bloomAgg(xxhash64(key), items,
        optimalNumBits(items, fpp, maxBits)).as("bf"))
      .head.getAs[Array[Byte]]("bf")
  }

  /** Aggregate a LongType column (pre-hashed with `xxhash64`) into one
    * serialized Bloom filter (BinaryType, single row). */
  def bloomAgg(hashed: Column, items: Long, bits: Long): Column =
    column(new BloomFilterAggregate(expression(hashed),
      Literal(math.max(items, 1L)), Literal(bits)).toAggregateExpression())

  /** Filters at or under this size probe through the codegen'd
    * `BloomFilterMightContain` with the bytes as a plan literal. Past
    * it the literal becomes a liability, not a convenience: every
    * optimizer/AQE pass that copies, canonicalizes, or hashes the plan
    * tree walks the full array, every task deserializes its own copy,
    * and a driver holding a multi-stage plan holds several — measured
    * on the ssidx drill, a 13M-item (15.6 MB) literal probe ran the
    * whole incremental-dedup job 5× slower than the un-sketched plain
    * join it was meant to beat. */
  private val literalMaxBytes: Int = 4 << 20

  /** Broadcast envelope for a large filter: the serialized bytes ship
    * once per executor via torrent broadcast and deserialize at most
    * once per executor JVM (transient lazy). */
  private case class BloomHolder(bytes: Array[Byte]) {
    @transient lazy val bf: BloomFilter =
      BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  /** Probe: true iff `hashed` (same `xxhash64` as the build side) MAY
    * be in the serialized filter — no false negatives, `fpp` false
    * positives. Small filters ride the plan as a literal (codegen'd
    * probe, shipped once per stage via the task-binary broadcast);
    * past [[literalMaxBytes]] the bytes move to a torrent broadcast
    * probed by a deserialize-once-per-executor function — off the
    * codegen path, but the probe stage is batch-sized while the plan
    * stays literal-free (an AQE re-plan of a 100 TB job must not copy
    * a filter-sized literal per stage). `hashed` must be non-null
    * (both probes return null on null input, which would drop the row
    * from BOTH branches of a miss/accept split). Each big-filter call
    * registers one Broadcast that lives until the session ends — call
    * once per batch/increment (the probe-function shape), not inside
    * a loop body that builds thousands of plans. */
  def mightContain(filter: Array[Byte], hashed: Column): Column =
    if (filter.length <= literalMaxBytes)
      column(BloomFilterMightContain(Literal(filter, BinaryType),
        expression(hashed)))
    else {
      val bc = org.apache.spark.sql.SparkSession.active.sparkContext
        .broadcast(BloomHolder(filter))
      org.apache.spark.sql.functions
        .udf((h: Long) => bc.value.bf.mightContainLong(h))
        .apply(hashed)
    }
}
