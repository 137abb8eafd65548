package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY §2.10): the reference is batch
  * with incremental watermarks (I1-I5); here the same semantics are also
  * offered as true streams — `Trigger.AvailableNow`-style incremental
  * re-sync is exactly vunnel's "process everything newer than the last
  * run" loop.
  */
object Streams {

  final case class Event(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double)

  final case class SessionUpdate(user_id: Long, n_events: Long,
      total_value: Double)

  /** Streaming read of the events table (ns parquet → µs timestamp, same
    * normalization as the batch path). */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = "event_id BIGINT, ts BIGINT, user_id BIGINT, " +
      "event_type STRING, value DOUBLE, props STRING"
    // FileStreamSource needs a directory base path; the sf dirs keep each
    // table as a single file, so glob-filter events.parquet out of dir.
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Watermarked tumbling-window aggregation (the streaming shape of
    * q_stream_hourly_window): late data beyond 10 minutes dropped. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("total"))

  /** I1 as a true stream: Trigger.AvailableNow drains everything newer
    * than the checkpoint and stops — exactly the reference's
    * "process since last successful run" loop, with the checkpoint dir
    * playing the run-state sidecar's role. Returns the started query;
    * callers awaitTermination. */
  def incrementalResync(events: DataFrame, outPath: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    hourlyCounts(events).writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("parquet").option("path", outPath)
      .start()

  /** Custom keyed state: per-user running session aggregate via
    * mapGroupsWithState — the KeyValueGroupedDataset stateful-op surface
    * (the reference's incremental per-provider state is the batch analog). */
  def userSessions(spark: SparkSession, events: DataFrame): Dataset[SessionUpdate] = {
    import spark.implicits._
    events.select("event_id", "ts", "user_id", "event_type", "value").as[Event]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[Event], state: GroupState[SessionUpdate]) =>
          val prev = state.getOption.getOrElse(SessionUpdate(uid, 0L, 0.0))
          var n = prev.n_events
          var tot = prev.total_value
          it.foreach { e => n += 1; tot += e.value }
          val next = SessionUpdate(uid, n, math.rint(tot * 100) / 100)
          state.update(next)
          next
      }
  }
}
