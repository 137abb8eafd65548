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

  test("curation gate runs unchanged as a stream: stream ≡ batch") {
    // The corpus-curation chain (quality gate → deterministic hash
    // sample → PII scrub) is stateless Column work, so the SAME
    // operators compose into readStream with no code changes — the
    // streaming-ingest story for corpus curation.
    import graft.operators.Corpus
    import graft.functions.Text
    def curate(df: org.apache.spark.sql.DataFrame) = df
      .filter(Text.token_count(col("text")) >= 5)
      .filter(Corpus.hashKeep(col("text"), 0.5))
      .select(col("doc_id"),
        Corpus.scrubPii(col("text")).getField("scrubbed").as("scrubbed"))
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    // FileStreamSource wants a directory; stage the single-file table
    val streamDir = java.nio.file.Files.createTempDirectory("graft-curate")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/documents.parquet"),
      streamDir.resolve("part-0.parquet"))
    val q = curate(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(streamDir.toString))
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("curate_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("curate_out")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val batch = curate(spark.read.parquet(s"$dir/documents.parquet"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(streamed == batch && streamed.nonEmpty)
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

  test("userSessions: sub-cent increments accumulate across " +
      "micro-batches (state holds the raw total, rounding is " +
      "emit-only)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[Streams.Event]
    val q = Streams.userSessions(spark, ms.toDF())
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("subcent_out").start()
    try {
      // 10 micro-batches of one 0.004-value event: a state that stored
      // the ROUNDED total would re-round 0.004 to 0.0 every batch and
      // emit 0.0 forever; the raw accumulator reaches 0.04
      (1 to 10).foreach { i =>
        ms.addData(Streams.Event(i.toLong,
          java.sql.Timestamp.valueOf(f"2026-01-01 10:${i}%02d:00"),
          99L, "buy", 0.004))
        q.processAllAvailable()
      }
      val last = spark.table("subcent_out")
        .filter(col("user_id") === 99L)
        .orderBy(col("n_events").desc).head()
      assert(last.getLong(1) == 10L)
      assert(math.abs(last.getDouble(2) - 0.04) < 1e-9,
        s"expected 0.04 accumulated, got ${last.getDouble(2)}")
    } finally q.stop()
  }

  test("streaming dedup drops in-watermark duplicate keys") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[Streams.Event]
    def ev(id: Long, min: Int) = Streams.Event(id,
      java.sql.Timestamp.valueOf(f"2026-01-01 10:$min%02d:00"), 1L, "view", 1.0)
    val q = Streams.dedupByKey(ms.toDF())
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("dedup_out").start()
    try {
      ms.addData(ev(1, 0), ev(1, 1), ev(2, 2), ev(1, 3), ev(3, 4))
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id")
        .collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("streaming trending terms: per-window CMS top-k matches exact " +
      "counts on a skewed stream") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[Streams.Doc]
    def doc(id: Long, hour: Int, text: String) = Streams.Doc(id,
      java.sql.Timestamp.valueOf(f"2026-01-01 $hour%02d:15:00"), text)
    // hour 10: "spark" dominates; hour 11: "flink" dominates
    val q = Streams.trendingTerms(ms.toDF(), k = 2)
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("trend_out").start()
    try {
      ms.addData(
        doc(1, 10, "spark spark spark streams"),
        doc(2, 10, "spark joins and spark aggs"),
        doc(3, 11, "flink flink flink windows"),
        doc(4, 11, "flink state and spark"))
      q.processAllAvailable()
      val got = spark.table("trend_out")
        .collect()
        .map(r => (r.getTimestamp(0).toString.substring(11, 13),
          r.getString(1), r.getLong(2)))
        .groupBy(_._1).view
        .mapValues(_.sortBy(e => (-e._3, e._2)).map(e => (e._2, e._3)).toSeq)
        .toMap
      assert(got("10").head == ("spark", 5L), s"hour 10: ${got("10")}")
      assert(got("11").head == ("flink", 4L), s"hour 11: ${got("11")}")
      assert(got.values.forall(_.size <= 2), "k = 2 violated")
    } finally q.stop()
  }

  test("streaming ingestion dedup: index hits and in-stream dups drop") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val corpus = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon"))
      .toDF("doc_id", "text")
    val index = graft.operators.Dedup.fingerprintIndex(corpus, "text")
    val ms = MemoryStream[Streams.Doc]
    def doc(id: Long, min: Int, text: String) = Streams.Doc(id,
      java.sql.Timestamp.valueOf(f"2026-01-01 10:$min%02d:00"), text)
    val q = Streams.dedupDocsAgainstIndex(ms.toDF(), index)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("ingest_out").start()
    try {
      ms.addData(
        doc(10, 0, "ALPHA   beta gamma"), // normalizes to corpus doc 1 → drop
        doc(11, 1, "brand new content"),  // survives
        doc(12, 2, "brand NEW   content"), // in-stream dup of 11 → drop
        doc(13, 3, "another fresh doc"))  // survives
      q.processAllAvailable()
      val ids = spark.table("ingest_out").select("doc_id")
        .collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(11L, 13L))
      // the fingerprint working column does not leak into the output
      assert(spark.table("ingest_out").columns.toSeq ==
        Seq("doc_id", "ts", "text"))
    } finally q.stop()
  }

  test("streaming embedding hits equal the batch index probe; " +
      "multi-band collisions emit one hit per pair") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val corpus = Seq(
      (1L, Seq(1.0f, 0.2f, 0.1f, 0.0f, 0.3f, 0.1f, 0.0f, 0.2f)),
      (2L, Seq(0.0f, 1.0f, 0.0f, 0.4f, 0.0f, 0.2f, 0.5f, 0.0f)),
      (3L, Seq(0.2f, 0.0f, 1.0f, 0.0f, 0.1f, 0.0f, 0.0f, 0.6f))
    ).toDF("vec_id", "embedding")
    val p = java.nio.file.Files.createTempDirectory("embidx").toString
    graft.operators.Dedup.writeEmbeddingIndex(corpus, p, "vec_id",
      "embedding", bands = 8, bitsPerBand = 12, md5Basis = true)
    def vec(id: Long, min: Int, e: Seq[Float]) = Streams.Vec(id,
      java.sql.Timestamp.valueOf(f"2026-01-01 10:$min%02d:00"), e)
    val batch = Seq(
      // near-identical to corpus 1: shares EVERY band — the pair-dedup
      // state must still emit exactly one hit row
      vec(100L, 0, Seq(1.0f, 0.21f, 0.1f, 0.0f, 0.3f, 0.1f, 0.0f, 0.2f)),
      vec(101L, 1, Seq(-0.9f, 0.1f, -0.8f, 0.7f, -0.2f, 0.9f, -0.5f, 0.1f)))
    val ms = MemoryStream[Streams.Vec]
    val q = Streams.embeddingHitsAgainstIndexStream(spark, p, ms.toDF(),
        threshold = 0.9, md5Basis = true)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("emb_hits").start()
    try {
      ms.addData(batch: _*)
      q.processAllAvailable()
      val got = spark.table("emb_hits")
        .select("batch_id", "corpus_id", "cosine").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val want = graft.operators.Dedup.embeddingNearDupsAgainstIndex(
          spark, p, batch.toDF(), "vec_id", "embedding",
          threshold = 0.9, md5Basis = true)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == want, s"stream $got != batch $want")
      assert(got.map(_._1) == Set(100L), "novel vector must not hit")
      assert(got.size == 1, "one logical hit per pair")
    } finally q.stop()
  }

  test("streaming ANN probe: windowed stream top-k equals the batch " +
      "probe row-for-row; foreachBatch form identical too") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.Similarity
    import org.apache.spark.sql.functions.col
    implicit val sq = spark.sqlContext
    val em = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cq = Similarity.trainCoarseHierarchical(em, "embedding", 9,
      minPointsPerCentroid = 8)
    val p = java.nio.file.Files.createTempDirectory("annstream").toString
    Similarity.writeIvfPqIndexHier(em, p, cq, m = 8, ncodes = 16,
      residual = true) // residual: the stream must rebase like batch
    val qvecs = em.filter(col("vec_id") < 5)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    def vec(id: Long, min: Int, e: Seq[Float]) = Streams.Vec(id,
      java.sql.Timestamp.valueOf(f"2026-01-01 10:$min%02d:00"), e)
    val ms = MemoryStream[Streams.Vec]
    val out = Streams.annTopKStream(spark, p, ms.toDF(), k = 5,
      nprobe = 4, beam = 3, windowDur = "1 minute")
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("ann_stream").start()
    try {
      ms.addData(qvecs.map { case (id, e) => vec(id, 0, e) }: _*)
      q.processAllAvailable()
      // advance the watermark past the 10:00 window + 10 min delay so
      // the append-mode aggregation finalizes and emits
      ms.addData(vec(9999L, 30, qvecs.head._2))
      q.processAllAvailable()
      val got = spark.table("ann_stream")
        .filter(col("qid") < 5)
        .select("qid", "rank", "vec_id")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        .toSet
      val want = Similarity.ivfPqHierTopKFromIndex(spark, p,
          em.filter(col("vec_id") < 5).select(
            col("vec_id").as("qid"), col("embedding").as("qvec")),
          5, nprobe = 4, beam = 3)
        .select("qid", "rank", "vec_id")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        .toSet
      assert(got == want, s"stream ${got.size} != batch ${want.size}")
      assert(got.nonEmpty && got.size == 25, "5 queries × k=5")
    } finally q.stop()
    // the per-batch-pruned foreachBatch form: identical rows
    val acc = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, Int, Long)]()
    val ms2 = MemoryStream[Streams.Vec]
    val q2 = ms2.toDF().writeStream
      .foreachBatch(Streams.annProbeBatch(spark, p,
        sink = b => b.select("qid", "rank", "vec_id").collect()
          .foreach(r => { acc.add((r.getLong(0), r.getInt(1),
            r.getLong(2))); () }),
        k = 5, nprobe = 4, beam = 3))
      .start()
    try {
      ms2.addData(qvecs.map { case (id, e) => vec(id, 0, e) }: _*)
      q2.processAllAvailable()
      val want = Similarity.ivfPqHierTopKFromIndex(spark, p,
          em.filter(col("vec_id") < 5).select(
            col("vec_id").as("qid"), col("embedding").as("qvec")),
          5, nprobe = 4, beam = 3)
        .select("qid", "rank", "vec_id")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        .toSet
      assert(acc.toArray(Array.empty[(Long, Int, Long)]).toSet == want)
    } finally q2.stop()

    // sink-once contract: the compaction-tolerance retry wraps ONLY
    // the probe (materialized before the sink sees it) — a retryable
    // FileNotFound raised by the SINK itself propagates instead of
    // silently re-running probe+sink, so a sink that is not
    // idempotent within one batchId execution never sees duplicates
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val body = Streams.annProbeBatch(spark, p,
      sink = _ => {
        calls.incrementAndGet()
        throw new java.io.FileNotFoundException(
          "sink-side failure — must not re-run the probe")
      }, k = 5, nprobe = 4, beam = 3)
    val batch = em.filter(col("vec_id") < 5)
      .select("vec_id", "embedding")
    intercept[java.io.FileNotFoundException] { body(batch, 0L) }
    assert(calls.get() == 1,
      s"sink must run exactly once per batch, ran ${calls.get()}")
  }

  test("supervised ANN probe stream survives a mid-stream compaction: " +
      "the vanished-file crash is detected, the stream rebuilds on the " +
      "compacted tree without operator action, and post-compaction " +
      "windows still match the batch probe row-for-row") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import graft.operators.Similarity
    import org.apache.spark.sql.functions.col
    implicit val sq = spark.sqlContext
    val em = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cq = Similarity.trainCoarseHierarchical(
      em.filter(col("vec_id") < 300), "embedding", 9,
      minPointsPerCentroid = 8)
    val p = java.nio.file.Files.createTempDirectory("svann").toString
    // BUILD + two APPENDs: per-group file counts > 1, so the
    // compaction genuinely rewrites files under the pinned listing
    Similarity.writeIvfPqIndexHier(
      em.filter(col("vec_id") < 300), p, cq, m = 8, ncodes = 16)
    Similarity.appendIvfPqIndexHier(
      em.filter(col("vec_id") >= 300 && col("vec_id") < 400), p)
    Similarity.appendIvfPqIndexHier(
      em.filter(col("vec_id") >= 400 && col("vec_id") < 500), p)
    val qvecs = em.filter(col("vec_id") < 5)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    def vec(id: Long, min: Int, e: Seq[Float]) = Streams.Vec(id,
      java.sql.Timestamp.valueOf(f"2026-01-01 10:$min%02d:00"), e)
    val ms = MemoryStream[Streams.Vec]
    val acc = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, Int, Long)]()
    val ckpt = java.nio.file.Files.createTempDirectory("svckpt").toString
    val sup = Streams.annTopKStreamSupervised(spark, p, ms.toDF(), 5,
      start = df => df.writeStream.outputMode(OutputMode.Append())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.filter(col("qid") < 5).select("qid", "rank", "vec_id")
            .collect().foreach(r => { acc.add((r.getLong(0),
              r.getInt(1), r.getLong(2))); () })
          ()
        }.start(),
      nprobe = 4, beam = 3)
    try {
      ms.addData(qvecs.map { case (id, e) => vec(id, 0, e) }: _*)
      sup.active.processAllAvailable()
      ms.addData(vec(9999L, 30, qvecs.head._2)) // watermark pusher
      sup.active.processAllAvailable()
      assert(acc.size == 25, s"pre-compaction window: ${acc.size}")
      // COMPACT while the stream runs — rewrites the files its
      // stream-static listing pinned
      Similarity.compactIvfPqIndexHier(spark, p)
      ms.addData(qvecs.map { case (id, e) => vec(id, 45, e) }: _*)
      ms.addData(vec(9998L, 59, qvecs.head._2)) // next pusher
      // the running query crashes on the vanished files; the
      // supervisor rebuilds on the compacted tree and the checkpoint
      // resumes the source — poll for the post-compaction window
      try sup.active.processAllAvailable()
      catch { case _: Exception => () } // the crash face, expected
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (acc.size < 50 && sup.failure.isEmpty &&
          System.nanoTime() < deadline) {
        try sup.active.processAllAvailable()
        catch { case _: Exception => () }
        Thread.sleep(250)
      }
      assert(sup.failure.isEmpty, s"supervisor gave up: ${sup.failure}")
      assert(sup.restarts >= 1,
        "the compaction must have crashed the pinned listing at least " +
          "once — if this never fires the drill is not drilling")
      assert(acc.size == 50, s"post-compaction window missing: ${acc.size}")
      // and the recovered window's rows equal the batch probe on the
      // (compacted, identical-content) store
      val want = Similarity.ivfPqHierTopKFromIndex(spark, p,
          em.filter(col("vec_id") < 5).select(
            col("vec_id").as("qid"), col("embedding").as("qvec")),
          5, nprobe = 4, beam = 3)
        .select("qid", "rank", "vec_id")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        .toSet
      val got = acc.toArray(Array.empty[(Long, Int, Long)])
      assert(got.drop(25).toSet == want,
        "recovered window must match the batch probe")
    } finally sup.stop()
  }

  test("streaming ANN ingestion: microbatch appends equal a batch " +
      "build over the union; probes see appended vectors immediately") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.Similarity
    import org.apache.spark.sql.functions.col
    implicit val sq = spark.sqlContext
    val em = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val head = em.filter(col("vec_id") < 300)
    val cq = Similarity.trainCoarseHierarchical(head, "embedding", 9,
      minPointsPerCentroid = 8)
    val p1 = java.nio.file.Files.createTempDirectory("annIngest").toString
    Similarity.writeIvfPqIndexHier(head, p1, cq, m = 8, ncodes = 16)
    val cb = Similarity.readPqCodebooks(spark, p1)
    // stream the remaining 200 vectors in two microbatches
    def vec(id: Long, e: Seq[Float]) = Streams.Vec(id,
      java.sql.Timestamp.valueOf("2026-01-01 10:00:00"), e)
    val rest = em.filter(col("vec_id") >= 300)
      .select("vec_id", "embedding").collect()
      .map(r => vec(r.getLong(0), r.getSeq[Float](1)))
    val appends = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val ms = MemoryStream[Streams.Vec]
    val q = ms.toDF().writeStream
      .foreachBatch(Streams.annIngestBatch(spark, p1,
        onAppend = (_, n, dist) => {
          assert(dist > 0.0 && !dist.isNaN); appends.add(n); ()
        }))
      .start()
    try {
      ms.addData(rest.take(100).toSeq: _*)
      q.processAllAvailable()
      ms.addData(rest.drop(100).toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(appends.toArray(Array.empty[java.lang.Long])
      .map(_.longValue).sorted.toSeq == Seq(100L, 100L))
    assert(Similarity.readAppendLog(spark, p1).count() == 2)
    // stream-appended store ≡ batch build over the union with the
    // SAME quantizer + codebooks
    val p2 = java.nio.file.Files.createTempDirectory("annIngReb").toString
    Similarity.writeIvfPqIndexHier(em, p2, cq, m = 8, ncodes = 16,
      codebooks = Some(cb))
    val queries = em.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    def probe(p: String) = Similarity.ivfPqHierTopKFromIndex(spark, p,
        queries, 5, nprobe = 4, beam = 3)
      .select("qid", "rank", "vec_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val streamed = probe(p1)
    assert(streamed == probe(p2),
      "stream-ingested store diverged from the batch build")
    assert(streamed.exists(_._3 >= 300L), "appended rows not probed")
    // compaction on the crawl cadence: probes unchanged
    Similarity.compactIvfPqIndexHier(spark, p1)
    assert(probe(p1) == streamed)
  }

  test("embeddingGateBatch drops index hits per microbatch, keeps " +
      "novel vectors") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val corpus = Seq(
      (1L, Seq(1.0f, 0.2f, 0.1f, 0.0f, 0.3f, 0.1f, 0.0f, 0.2f)),
      (2L, Seq(0.0f, 1.0f, 0.0f, 0.4f, 0.0f, 0.2f, 0.5f, 0.0f))
    ).toDF("vec_id", "embedding")
    val p = java.nio.file.Files.createTempDirectory("embgate").toString
    graft.operators.Dedup.writeEmbeddingIndex(corpus, p, "vec_id",
      "embedding", bands = 8, bitsPerBand = 12, md5Basis = true)
    def vec(id: Long, min: Int, e: Seq[Float]) = Streams.Vec(id,
      java.sql.Timestamp.valueOf(f"2026-01-01 10:$min%02d:00"), e)
    val survived = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val ms = MemoryStream[Streams.Vec]
    val q = ms.toDF().writeStream
      .foreachBatch(Streams.embeddingGateBatch(spark, p,
        sink = b => b.select("vec_id").collect()
          .foreach(r => { survived.add(r.getLong(0)); () }),
        threshold = 0.9, md5Basis = true))
      .start()
    try {
      ms.addData(
        vec(100L, 0, Seq(1.0f, 0.21f, 0.1f, 0.0f, 0.3f, 0.1f, 0.0f, 0.2f)),
        vec(101L, 1, Seq(-0.9f, 0.1f, -0.8f, 0.7f, -0.2f, 0.9f, -0.5f, 0.1f)))
      q.processAllAvailable()
      assert(survived.toArray.toSet == Set(101L),
        s"index hit must drop, novel must survive: $survived")
    } finally q.stop()
  }

  test("streaming paragraph keep-first: index units strip, cross-doc " +
      "stream dups keep first arrival, in-doc repeats collapse, docs " +
      "rebuild in order; bloom sidecar row-identical") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val corpus = Seq((1L, "alpha\nbeta")).toDF("doc_id", "text")
    val index = graft.operators.Corpus.unitIndex(corpus, "text", "doc_id")
    def doc(id: Long, min: Int, text: String) = Streams.Doc(id,
      java.sql.Timestamp.valueOf(f"2026-01-01 10:$min%02d:00"), text)
    def run(name: String, bloom: Array[Byte]): Map[Long, String] = {
      val ms = MemoryStream[Streams.Doc]
      val q = Streams.dedupUnitsAgainstIndexStream(ms.toDF(), index,
          delay = "30 minutes", bloom = bloom)
        .writeStream.outputMode(OutputMode.Append())
        .format("memory").queryName(name).start()
      try {
        // batch order IS the keep-first order (the stream's only total
        // order) — separate batches pin cross-doc winners
        ms.addData(doc(10, 0, "beta\ngamma\ngamma")) // beta indexed;
        q.processAllAvailable()                      // gamma² collapses
        ms.addData(doc(11, 1, "gamma\ndelta")) // gamma seen at doc 10
        q.processAllAvailable()
        ms.addData(doc(12, 2, "alpha\nbeta")) // all indexed → vanishes
        q.processAllAvailable()
        // flush: advance the watermark (50 − 30 = :20) past the doc
        // windows so the append-mode rebuild emits
        ms.addData(doc(99, 50, "flush"))
        q.processAllAvailable()
        spark.table(name).collect()
          .map(r => r.getLong(0) -> r.getString(2)).toMap
      } finally q.stop()
    }
    val plain = run("unit_dedup_out", null)
    assert(plain == Map(10L -> "gamma", 11L -> "delta"))
    val bloom = graft.operators.Corpus.unitIndexBloom(index)
    assert(run("unit_dedup_bloom_out", bloom) == plain)
  }

  test("streaming quality gate: trained model filters the stream, " +
      "stream ≡ batch, zero state") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val labeled = Seq(
      (1L, "clean prose article text", 1), (2L, "prose article words", 1),
      (3L, "spam casino click now", 0), (4L, "casino click spam offer", 0)
    ).toDF("doc_id", "text", "y")
    val w = graft.operators.TextClassifier.train(labeled, "doc_id",
      "text", "y", k = 64, iters = 20, lr = 1.0, tf = false)
    val ms = MemoryStream[Streams.Doc]
    def doc(id: Long, min: Int, text: String) = Streams.Doc(id,
      java.sql.Timestamp.valueOf(f"2026-01-01 10:$min%02d:00"), text)
    val q = Streams.qualityGate(ms.toDF(), "text", w, tf = false)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("gate_out").start()
    try {
      val batch = Seq(
        doc(10, 0, "prose article text words"),   // prose-like → keep
        doc(11, 1, "casino spam now click"),      // spam-like → drop
        doc(12, 2, "clean prose text"))           // keep
      ms.addData(batch: _*)
      q.processAllAvailable()
      // the gate is stateless — no stateful operator in the plan
      assert(q.lastProgress.stateOperators.isEmpty)
      val ids = spark.table("gate_out").select("doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(10L, 12L))
      // identical verdicts on the same rows as a batch frame
      val batchIds = Streams.qualityGate(
        batch.toDF(), "text", w, tf = false)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(batchIds == ids)
    } finally q.stop()
  }

  test("streaming normalize gate: mojibake fixed + NFC'd in-flight, " +
      "non-latin docs dropped, stream ≡ batch, zero state") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[Streams.Doc]
    def doc(id: Long, min: Int, text: String) = Streams.Doc(id,
      java.sql.Timestamp.valueOf(f"2026-01-01 10:$min%02d:00"), text)
    val q = Streams.normalizeGate(ms.toDF(), "text")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("norm_out").start()
    try {
      val batch = Seq(
        doc(10, 0, "the cafÃ© menu"),       // mojibake → café, latin keep
        doc(11, 1, "café news"),      // decomposed → NFC, keep
        doc(12, 2, "привет мир тут сейчас"),// cyrillic-dominant → drop
        doc(13, 3, "plain ascii words"))    // fast paths, keep
      ms.addData(batch: _*)
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.isEmpty)
      val out = spark.table("norm_out").select("doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(out.keySet == Set(10L, 11L, 13L))
      assert(out(10L) == "the caf\u00e9 menu") // repaired in-flight
      assert(out(11L) == "caf\u00e9 news") // NFC-composed in-flight
      val batchOut = Streams.normalizeGate(batch.toDF(), "text")
        .select("doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(batchOut == out)
    } finally q.stop()
  }

  test("streaming ingestion dedup with bloom sidecar ≡ plain path") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val corpus = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon"))
      .toDF("doc_id", "text")
    val index = graft.operators.Dedup.fingerprintIndex(corpus, "text")
    // saturated 64-bit sidecar: ~every probe is a false positive, so
    // every row routes through the anti-join — the answer must match
    // the well-sized sidecar AND the plain path
    for ((bloom, tbl) <- Seq(
        (graft.operators.Dedup.indexBloom(index), "ingest_bloom"),
        (graft.operators.Dedup.indexBloom(index, expectedItems = 1L),
          "ingest_bloom_sat"))) {
      val ms = MemoryStream[Streams.Doc]
      def doc(id: Long, min: Int, text: String) = Streams.Doc(id,
        java.sql.Timestamp.valueOf(f"2026-01-01 10:$min%02d:00"), text)
      val q = Streams.dedupDocsAgainstIndex(ms.toDF(), index, bloom = bloom)
        .writeStream.outputMode(OutputMode.Append())
        .format("memory").queryName(tbl).start()
      try {
        ms.addData(
          doc(10, 0, "ALPHA   beta gamma"), // index hit → drop
          doc(11, 1, "brand new content"),  // bloom miss → map-only keep
          doc(12, 2, "brand NEW   content"), // in-stream dup of 11 → drop
          doc(13, 3, "another fresh doc"))  // survives
        q.processAllAvailable()
        val ids = spark.table(tbl).select("doc_id")
          .collect().map(_.getLong(0)).sorted
        assert(ids.toSeq == Seq(11L, 13L), s"$tbl: ${ids.toSeq}")
        assert(spark.table(tbl).columns.toSeq ==
          Seq("doc_id", "ts", "text"))
      } finally q.stop()
    }
  }

  test("gap sessions close via event-time timeout and in-batch splits") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[Streams.Event]
    def at(h: Int, min: Int) =
      java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:$min%02d:00")
    def ev(id: Long, h: Int, min: Int) =
      Streams.Event(id, at(h, min), 7L, "view", 1.0)
    val q = Streams.gapSessions(spark, ms.toDF(), gapMinutes = 30)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("gap_out").start()
    try {
      // session A: 10:00, 10:05; then same-batch gap-split session B at 11:00
      ms.addData(ev(1, 10, 0), ev(2, 10, 5), ev(3, 11, 0))
      q.processAllAvailable()
      // watermark jumps to 13:50 (14:00 - 10m) > 11:00 + 30m → B times out
      ms.addData(ev(4, 14, 0))
      q.processAllAvailable()
      ms.addData(ev(5, 16, 0)) // closes the 14:00 session
      q.processAllAvailable()
      val rows = spark.table("gap_out")
        .select("session_start", "session_end", "n_events").collect()
        .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2))).toSet
      assert(rows.contains((at(10, 0), at(10, 5), 2L)), s"in-batch split: $rows")
      assert(rows.contains((at(11, 0), at(11, 0), 1L)), s"timeout close: $rows")
      assert(rows.contains((at(14, 0), at(14, 0), 1L)), s"second timeout: $rows")
    } finally q.stop()
  }

  test("gap sessions absorb late in-watermark events before session start") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[Streams.Event]
    def at(h: Int, min: Int) =
      java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:$min%02d:00")
    def ev(id: Long, h: Int, min: Int) =
      Streams.Event(id, at(h, min), 3L, "view", 1.0)
    val q = Streams.gapSessions(spark, ms.toDF(), gapMinutes = 30,
        delay = "1 hour")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("gap_late_out").start()
    try {
      ms.addData(ev(1, 10, 0))
      q.processAllAvailable()
      // late event at 09:50 (within the 1h watermark) precedes the open
      // session's start by less than the gap: the session must extend
      // backwards, not report a 10:00 start
      ms.addData(ev(2, 9, 50))
      q.processAllAvailable()
      ms.addData(ev(3, 14, 0)) // advance watermark, close the session
      q.processAllAvailable()
      val rows = spark.table("gap_late_out")
        .select("session_start", "session_end", "n_events").collect()
        .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2))).toSet
      assert(rows.contains((at(9, 50), at(10, 0), 2L)),
        s"late event not absorbed: $rows")
    } finally q.stop()
  }

  test("gap sessions never emit overlapping sessions across batches") {
    // Regression: sessions used to be emitted eagerly on in-batch
    // splits/outliers; a later in-watermark event could then bridge an
    // already-emitted session, yielding overlapping Append output.
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[Streams.Event]
    def at(h: Int, min: Int) =
      java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:$min%02d:00")
    def ev(id: Long, h: Int, min: Int) =
      Streams.Event(id, at(h, min), 5L, "view", 1.0)
    val q = Streams.gapSessions(spark, ms.toDF(), gapMinutes = 30,
        delay = "1 hour")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("gap_bridge_out").start()
    try {
      ms.addData(ev(1, 12, 0))
      q.processAllAvailable()
      // late outlier 50 min BEFORE the open session — its own interval
      ms.addData(ev(2, 11, 10))
      q.processAllAvailable()
      // bridges both: 11:10 .. 11:30 .. 12:00 is one session
      ms.addData(ev(3, 11, 30))
      q.processAllAvailable()
      ms.addData(ev(4, 15, 0)) // advance the watermark past 12:30
      q.processAllAvailable()
      val rows = spark.table("gap_bridge_out")
        .select("session_start", "session_end", "n_events").collect()
        .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2)))
        .toSet
      assert(rows.contains((at(11, 10), at(12, 0), 3L)),
        s"bridged session missing: $rows")
      assert(!rows.exists(r => r._3 < 3L && r._1.getTime < at(13, 0).getTime),
        s"fragment of the bridged session leaked: $rows")
    } finally q.stop()
  }

  test("multimodal: binary columns flow through partition-batch extract") {
    val media = Multimodal.syntheticMedia(spark, dir)
    val feats = Multimodal.extractFeatures(media)
    val rows = feats.collect()
    assert(rows.length == media.count())
    assert(rows.forall(
      _.getSeq[Float](rows.head.fieldIndex("feature")).length == 8))
    // video: REAL MP4 container probe — slot 1 is the mvhd timescale
    val vid = rows.find(_.getString(1) == "video").get
      .getSeq[Float](rows.head.fieldIndex("feature"))
    assert(vid(1) == 1000f)
    // audio: REAL WAV decode — slot 1 is the synthetic sample rate
    val aud = rows.find(_.getString(1) == "audio").get
      .getSeq[Float](rows.head.fieldIndex("feature"))
    assert(aud(1) == 8000f)
    // image: REAL raster decode — slot 0 is the actual pixel width
    val img = rows.find(_.getString(1) == "image").get
      .getSeq[Float](rows.head.fieldIndex("feature"))
    assert(img.head >= 16f)
    // deterministic across runs
    val again = Multimodal.extractFeatures(media).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](r.fieldIndex("feature")).toList))
      .toMap
    rows.foreach { r =>
      assert(again(r.getLong(0)) ==
        r.getSeq[Float](r.fieldIndex("feature")).toList)
    }
  }

  test("multimodal: frame sampling explodes before decode; resize rewrites meta") {
    val media = Multimodal.syntheticMedia(spark, dir)
    val frames = Multimodal.sampleFrames(media, frameBytes = 100)
    val byId = frames.groupBy("media_id")
      .agg(count(lit(1)).as("n"), max(length(col("frame"))).as("max_len"))
      .collect()
    assert(byId.nonEmpty)
    byId.foreach { r => assert(r.getAs[Int]("max_len") <= 100) }
    // frame count = ceil(bytes/100) for each video row
    val video = media.filter(col("kind") === "video")
      .select(col("media_id"), ceil(length(col("content")) / 100.0).as("exp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    byId.foreach { r =>
      assert(r.getAs[Long]("n") == math.max(video(r.getAs[Long]("media_id")), 1L))
    }
    val resized = Multimodal.resize(media, targetBytes = 64).collect()
    assert(resized.length == media.count())
    resized.foreach { r =>
      assert(r.getAs[Array[Byte]]("content").length <= 64)
    }
  }

  test("readEvents defines a stream before any file has landed " +
      "(files-arrive-later)") {
    val empty = java.nio.file.Files.createTempDirectory("noevents")
    // no events.parquet yet: the ts probe must fall back, not throw
    val df = graft.streaming.Streams.readEvents(spark, empty.toString)
    assert(df.isStreaming)
    assert(df.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
  }
}
