package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Streams
import graft.operators.Multimodal

/** Structured Streaming semantics driven synchronously over the batch
  * parquet (memory sink + processAllAvailable), plus multimodal batch
  * plumbing. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  test("streaming hourly window agg matches the batch computation") {
    // Complete mode: Append would hold back windows the watermark hasn't
    // closed (the final hours of the fixture) — the batch comparison
    // needs every window emitted.
    val q = Streams.hourlyCounts(Streams.readEvents(spark, dir))
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("hourly_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("hourly_out")
        .select(unix_timestamp(col("hour_start")).as("h"), col("event_type"),
          col("n"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val batch = Q.events(spark, dir)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(unix_timestamp(col("window.start")).as("h"),
          col("event_type"), col("n"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("stateful mapGroupsWithState accumulates per-user sessions") {
    val q = Streams.userSessions(spark, Streams.readEvents(spark, dir))
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("sessions_out").start()
    try {
      q.processAllAvailable()
      val out = spark.table("sessions_out")
      val byUser = out.groupBy("user_id")
        .agg(max("n_events").as("n")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expected = Q.events(spark, dir).groupBy("user_id").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(byUser == expected)
    } finally q.stop()
  }

  test("multimodal: binary columns flow through partition-batch extract") {
    val media = Multimodal.syntheticMedia(spark, dir)
    val feats = Multimodal.extractFeatures(media)
    val rows = feats.collect()
    assert(rows.length == media.count())
    val f = rows.head.getSeq[Float](rows.head.fieldIndex("feature"))
    assert(f.length == 8)
    assert(math.abs(f.sum - 1.0f) < 1e-3) // histogram normalized
    // deterministic across runs
    val again = Multimodal.extractFeatures(media).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](r.fieldIndex("feature")).toList))
      .toMap
    rows.foreach { r =>
      assert(again(r.getLong(0)) ==
        r.getSeq[Float](r.fieldIndex("feature")).toList)
    }
  }
}
