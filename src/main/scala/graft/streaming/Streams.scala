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

  final case class ClosedSession(user_id: Long,
      session_start: java.sql.Timestamp, session_end: java.sql.Timestamp,
      n_events: Long)

  /** Streaming exact dedup by key: the streaming form of the K2
    * `OR IGNORE` keyed sink / Dedup.exact — first writer wins, and the
    * dedup state is BOUNDED by the watermark horizon (state for keys
    * older than the watermark is dropped), which is what makes this safe
    * on an unbounded 100 TB stream where a plain dropDuplicates would
    * accumulate state forever. */
  def dedupByKey(events: DataFrame, delay: String = "10 minutes",
      keys: Seq[String] = Seq("event_id")): DataFrame =
    events.withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Gap-based sessionization as a true stream: flatMapGroupsWithState
    * with an EVENT-TIME timeout. A session closes (and is emitted, Append
    * mode) when the watermark passes `last_event + gap` — the streaming
    * equivalent of the batch gaps-and-islands query
    * (q_stream_sessionize), with bounded per-user state instead of a
    * global sort. In-batch events are gap-split locally; the timeout
    * closes the trailing session. */
  def gapSessions(spark: SparkSession, events: DataFrame,
      gapMinutes: Int = 30, delay: String = "10 minutes")
      : Dataset[ClosedSession] = {
    import spark.implicits._
    val gapMs = gapMinutes * 60000L
    events.withWatermark("ts", delay)
      .select("event_id", "ts", "user_id", "event_type", "value").as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Long, Long), ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, it: Iterator[Event], state: GroupState[(Long, Long, Long)]) =>
          if (state.hasTimedOut) {
            val (s, e, n) = state.get
            state.remove()
            Iterator(ClosedSession(uid, new java.sql.Timestamp(s),
              new java.sql.Timestamp(e), n))
          } else {
            val out = scala.collection.mutable.ArrayBuffer[ClosedSession]()
            var cur = state.getOption
            // batch events sorted ascending; a late-but-in-watermark event
            // may still precede the open session's start
            it.map(_.ts.getTime).toArray.sorted.foreach { t =>
              cur match {
                case Some((s, e, n)) if t - e > gapMs =>
                  // beyond the gap after the session: close it, start new
                  out += ClosedSession(uid, new java.sql.Timestamp(s),
                    new java.sql.Timestamp(e), n)
                  cur = Some((t, t, 1L))
                case Some((s, e, n)) if s - t > gapMs =>
                  // late outlier more than a gap BEFORE the session
                  // start: its own (already-closable) session
                  out += ClosedSession(uid, new java.sql.Timestamp(t),
                    new java.sql.Timestamp(t), 1L)
                  cur = Some((s, e, n))
                case Some((s, e, n)) =>
                  // within a gap of the open interval: extend either edge
                  cur = Some((math.min(s, t), math.max(e, t), n + 1))
                case None =>
                  cur = Some((t, t, 1L))
              }
            }
            cur.foreach { v =>
              state.update(v)
              // timeout once the watermark passes session end + gap (the
              // max() keeps it legal when replaying old data whose gap
              // horizon is already behind the watermark)
              state.setTimeoutTimestamp(math.max(v._2 + gapMs,
                state.getCurrentWatermarkMs() + 1))
            }
            out.iterator
          }
      }
  }

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
