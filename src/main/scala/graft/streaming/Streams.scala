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

  /** Streaming read of the events table, same ts normalization as the
    * batch path ([[graft.Q.normalizeEventTs]]). FileStreamSource needs a
    * declared schema, so probe the batch scan once for the physical
    * shape of `ts` (ns-int64 legacy vs µs timestamp). */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // best-effort probe: when the file hasn't landed yet (the normal
    // FileStreamSource files-arrive-later setup) fall back to the
    // ns-int64 generation's shape instead of failing stream definition.
    // ONLY the missing-path case falls back — a corrupt or unreadable
    // file still fails fast here, not mid-microbatch. If the deferred
    // file turns out to be the µs-timestamp generation the first batch
    // will reject the bigint schema; redefine the stream once data
    // exists (the probe then resolves the right shape).
    val tsType =
      try spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getCondition != null &&
              e.getCondition.contains("PATH_NOT_FOUND") => LongType
      }
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", tsType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    // FileStreamSource needs a directory base path; the sf dirs keep each
    // table as a single file, so glob-filter events.parquet out of dir.
    graft.Q.normalizeEventTs(
      spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir))
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

  final case class Doc(doc_id: Long, ts: java.sql.Timestamp, text: String)

  final case class Vec(vec_id: Long, ts: java.sql.Timestamp,
      embedding: Seq[Float])

  /** Streaming embedding near-dup HITS against a persisted
    * [[graft.operators.Dedup.writeEmbeddingIndex]] store — the
    * embedding-modality face of the ingestion-dedup family: each
    * arriving vector bands row-locally (one kernel pass), candidates
    * come from a stream-static inner join against the stored capped
    * band keys, and verification is exact cosine against the
    * DEQUANTIZED stored vector — per-candidate, computed AFTER the
    * join so the int8 store never dequantizes wholesale per
    * microbatch. Emits (batch_id, corpus_id, cosine, ts) hit rows —
    * the quarantine/telemetry stage of a continuous embedding ingest.
    * The only state is the watermark-bounded pair dedup (one logical
    * hit per pair even when it collides on several bands); everything
    * else is stateless, so the stream scales exactly like the batch
    * probe ([[graft.operators.Dedup.embeddingNearDupsAgainstIndex]],
    * which it must match row-for-row on ordered batches — spec-pinned).
    * The DROP-the-hits gate is [[embeddingGateBatch]] (per-batch anti
    * semantics need the stream on the LEFT of an anti-join against its
    * own derived hit set, which append-mode streaming cannot express
    * in one query — `foreachBatch` territory). */

  def embeddingHitsAgainstIndexStream(
      spark: org.apache.spark.sql.SparkSession, path: String,
      vecs: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", threshold: Double = 0.9,
      bands: Int = 8, bitsPerBand: Int = 12, md5Basis: Boolean = false,
      delay: String = "10 minutes"): DataFrame = {
    graft.operators.Dedup.checkIndexParams(spark, path,
      Map("bands" -> bands.toLong, "bitsPerBand" -> bitsPerBand.toLong,
        "md5Basis" -> (if (md5Basis) 1L else 0L)),
      "embeddingHitsAgainstIndexStream")
    val keys =
      if (md5Basis) graft.plans.HashExpressions
        .hyperplane_band_sigs_md5(col(vecCol), bands, bitsPerBand)
      else graft.plans.HashExpressions
        .hyperplane_band_sigs(col(vecCol), bands, bitsPerBand)
    // the batch vector rides the banded rows (cast to float — the
    // cosine kernel refuses mixed float/double pairs) so no stream
    // self-join is ever needed
    val banded = vecs.select(col(idCol).as("batch_id"), col("ts"),
      col(vecCol).cast("array<float>").as("__bv"),
      posexplode(keys).as(Seq("band", "band_hash")))
    val idxBands = spark.read.parquet(s"$path/bands")
    val ivecs = spark.read.parquet(s"$path/vecs")
      .select(col("id").as("corpus_id"), col("qvec"), col("scale"))
    banded
      .join(idxBands, Seq("band", "band_hash"))
      .select(col("batch_id"), col("ts"), col("__bv"),
        col("id").as("corpus_id"))
      .join(ivecs, Seq("corpus_id"))
      .withColumn("cosine", round(graft.plans.HashExpressions
        .cosine_sim(col("__bv"), graft.operators.Embeddings
          .dequantize(col("qvec"), col("scale"))), 3))
      .filter(col("cosine") >= threshold)
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("batch_id", "corpus_id")
      .select(col("batch_id"), col("corpus_id"), col("cosine"), col("ts"))
  }

  /** The DROP-the-hits gate [[embeddingHitsAgainstIndexStream]]'s
    * Scaladoc promises, as real code: a `foreachBatch` body that runs
    * the BATCH probe
    * ([[graft.operators.Dedup.embeddingNearDupsAgainstIndex]]) on each
    * microbatch and anti-joins the hits away — per-batch relational
    * logic (the stream anti-joined against its own derived hit set) is
    * exactly what `foreachBatch` exists for; append-mode streaming
    * cannot express it in one query. Usage:
    * {{{
    * vecs.writeStream.foreachBatch(
    *   Streams.embeddingGateBatch(spark, path, sink = b =>
    *     b.write.mode("append").parquet(out))).start()
    * }}}
    * Within-microbatch novelty only — cross-batch in-stream near-dup
    * needs the hits stream's watermark state; the common composition
    * runs this gate for the index check and refreshes the index from
    * the survivors on the batch cadence. */
  def embeddingGateBatch(
      spark: org.apache.spark.sql.SparkSession, path: String,
      sink: DataFrame => Unit, idCol: String = "vec_id",
      vecCol: String = "embedding", threshold: Double = 0.9,
      bands: Int = 8, bitsPerBand: Int = 12, md5Basis: Boolean = false)
      : (DataFrame, Long) => Unit = { (batch, _) =>
    val hits = graft.operators.Dedup.embeddingNearDupsAgainstIndex(
        spark, path, batch, idCol, vecCol, threshold, bands,
        bitsPerBand, md5Basis)
      .select(col("batch_id").as(idCol)).distinct()
    sink(batch.join(hits, Seq(idCol), "left_anti"))
  }

  /** Streaming ANN top-k against a persisted HIERARCHICAL IVF-PQ store
    * ([[graft.operators.Similarity.writeIvfPqIndexHier]]) — the ANN
    * face of the continuous-ingestion family
    * ([[embeddingHitsAgainstIndexStream]] is the near-dup face): each
    * arriving query vector probes its beam cells ROW-LOCALLY via the
    * coarse kernel (the quantizer rides its executor Broadcast — no
    * per-batch fit, no streaming state), candidates come from a
    * stream-static inner join against the slim code tree on the
    * composed cell, the codegen ADC kernel scores them (codebooks as
    * reference objects), and per-query top-k emits from a
    * watermark-bounded windowed [[graft.plans.TopKAgg]] aggregation
    * once the query's event-time window closes. State is the
    * per-(window, qid) BOUNDED top-k buffer — never candidate sets,
    * never vectors; a pair meeting in several probed cells dedups
    * inside the aggregator exactly like the batch path, so the emitted
    * (qid, rank, vec_id, sim) rows match the batch probe row-for-row
    * (spec-pinned).
    *
    * Scale note — the crossover is now MEASURED, not extrapolated
    * (SCALE.md r15 streamx leg): a stream-static join re-plans the
    * static side per microbatch WITHOUT the batch probe's
    * collect-driven pruning (no literal cell list exists at stream
    * plan time), so each microbatch scans the code tree's slim m-int
    * rows and filters at the join — cost ∝ tree bytes / scan
    * throughput, while the pruned [[annProbeBatch]] form pays a FLAT
    * per-batch overhead (~3 s at local[32]: sidecar reads, probe
    * checkpoint, cell collect, listing) plus |probed cells| I/O.
    * Decision rule: (1) deploy THIS form while tree_bytes /
    * scan_throughput < that flat overhead — at local[32] the tie sits
    * at ≈10⁸ codes (~1 GB slim tree, nlist=65,536, 10-query batches:
    * 3.0 s full vs 3.2 s pruned), and past it [[annProbeBatch]] wins
    * linearly; (2) pruning must actually PRUNE — keep |q|·nprobe ≪
    * nlist per microbatch (nlist ∝ √n gives this), because at
    * nlist=4096 with 100-query batches the probed fraction is ~10%
    * and the pruned form is strictly WORSE at any size (6.7 s vs
    * 0.6 s at 10⁸ codes — the cell isin row filter costs more than
    * the scan it fails to avoid).
    * Residual layouts rebase the query per probed cell exactly like
    * the batch path (broadcast join against the nlist-row centroid
    * table — static, stateless).
    *
    * Staleness under a concurrent [[annIngestBatch]]: the stream-
    * static side snapshots the codes FILE LISTING at stream start, so
    * a running probe stream never observes appended rows — restart it
    * (or use [[annProbeBatch]], which re-reads the store per
    * microbatch) to pick appends up. Appends never tear the store
    * (atomic sidecar protocol), but compaction rewrites files and can
    * crash a running probe stream with missing-file errors — it is a
    * maintenance op for when probe streams quiesce, OR run the stream
    * under [[annTopKStreamSupervised]], which detects that crash and
    * restarts the stream on the compacted tree automatically. */
  def annTopKStream(spark: SparkSession, path: String, vecs: DataFrame,
      k: Int, nprobe: Int = 4, beam: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding",
      delay: String = "10 minutes", windowDur: String = "1 minute")
      : DataFrame = {
    import graft.operators.Similarity
    val cq = Similarity.readCoarseQuantizer(spark, path)
    val cb = Similarity.readPqCodebooks(spark, path)
    val residual = Similarity.readIvfPqHierMeta(spark, path)
    val probes0 = vecs.withWatermark("ts", delay)
      .select(col(idCol).as("qid"), col("ts"), col(vecCol).as("__qv"),
        explode(Similarity.probeCellsHier(col(vecCol), cq, nprobe, beam))
          .as("cell"))
    // the SAME rebase helper as every batch IVF-PQ surface — stream ≡
    // batch holds because the arithmetic has one definition
    val probes =
      if (!residual) probes0
      else graft.operators.Similarity.rebaseByCell(probes0,
        spark.createDataFrame(
            cq.l2.map { case (c1, c2, v) => (c1 * cq.k2 + c2, v.toSeq) })
          .toDF("cell", "centroid"), "__qv", "__qv")
    val codes = spark.read.parquet(s"$path/codes")
    probes.join(codes, Seq("cell"))
      .filter(col(idCol) =!= col("qid"))
      .select(col("qid"), col("ts"), col(idCol),
        (-graft.plans.PqExpressions.pq_adc(col("__qv"), col("codes"),
          cb.ncodes, cb.dsub, cb.flat)).as("sim"))
      .groupBy(window(col("ts"), windowDur), col("qid"))
      .agg(graft.plans.TopKAgg.top_k_agg(k)(
        col("sim"), col(idCol).cast("long")).as("__top"))
      .select(col("window.start").as("win_start"), col("qid"),
        posexplode(col("__top")).as(Seq("__p", "__e")))
      .select(col("win_start"), col("qid"),
        col("__e.id").as(idCol), col("__e.score").as("sim"),
        (col("__p") + 1).cast("int").as("rank"))
  }

  /** A vanished-file failure — the compaction file-rewrite crash, as
    * seen through a streaming-query failure's cause chain. ONE
    * definition, shared with the sidecar retry
    * ([[graft.operators.Similarity.vanishedFileFace]]): a race face
    * discovered by either surface's drills is classified identically
    * by both. */
  private[graft] def isVanishedFileFailure(t: Throwable): Boolean =
    graft.operators.Similarity.vanishedFileFace(t)

  /** A streaming query under restart supervision — what
    * [[annTopKStreamSupervised]] returns. `active` is the live query
    * (it CHANGES across restarts — always go through this handle),
    * `restarts` how many times the supervisor has rebuilt it,
    * `failure` the terminal error if supervision gave up (restart
    * budget exhausted, a non-vanished-file failure, or a rebuild that
    * itself failed). `stop()` ends supervision and the live query. */
  final class SupervisedQuery private[streaming] (
      build: () => DataFrame,
      start: DataFrame => org.apache.spark.sql.streaming.StreamingQuery,
      maxRestarts: Int, budgetResetMs: Long) {
    @volatile private var restartCount = 0
    @volatile private var consecutive = 0
    @volatile private var lastCrashNanos = 0L
    @volatile private var terminal: Option[Throwable] = None
    @volatile private var stopping = false
    @volatile private var live = start(build())
    private val thread = new Thread(() => {
      var done = false
      while (!done) {
        try { live.awaitTermination(); done = true } // clean stop
        catch {
          case e: Throwable =>
            // the restart budget counts CONSECUTIVE failures, not
            // lifetime ones: a stream that ran stably past
            // budgetResetMs since its last crash has proven each
            // earlier restart genuinely recovered, so a later routine
            // compaction gets a fresh budget — only a crash LOOP
            // (a genuinely broken store re-crashing immediately)
            // exhausts it
            val now = System.nanoTime()
            if (now - lastCrashNanos > budgetResetMs * 1000000L)
              consecutive = 0
            lastCrashNanos = now
            consecutive += 1
            if (!stopping && isVanishedFileFailure(e) &&
                consecutive <= maxRestarts) {
              // the store was compacted under the pinned file
              // listing: REBUILDING the stream re-lists the
              // (now-compacted) tree, and the checkpoint resumes
              // offsets — no operator action
              restartCount += 1
              try {
                live = start(build())
                // a stop() that raced the rebuild stopped the OLD
                // query; honor it on the new one instead of leaking
                // a running stream past stop()'s return
                if (stopping) {
                  try live.stop() catch { case _: Exception => () }
                  done = true
                }
              } catch { case e2: Throwable =>
                terminal = Some(e2); done = true }
            } else {
              if (!stopping) terminal = Some(e)
              done = true
            }
        }
      }
    }, "ann-probe-stream-supervisor")
    thread.setDaemon(true)
    thread.start()
    def active: org.apache.spark.sql.streaming.StreamingQuery = live
    def restarts: Int = restartCount
    def failure: Option[Throwable] = terminal
    def stop(): Unit = {
      stopping = true
      try live.stop() catch { case _: Exception => () }
      thread.join(30000)
      // belt-and-braces for the stop-races-restart window: `live` may
      // have been swapped while we stopped the old query
      try live.stop() catch { case _: Exception => () }
    }
  }

  /** [[annTopKStream]] under a restart supervisor — the operational
    * fix for its stream-static snapshot semantics: the codes file
    * listing pins at stream START, so a COMPACTION racing a running
    * probe stream crashes it with vanished-file errors (appends never
    * do — the atomic sidecar protocol — they are merely unobserved).
    * The supervisor watches the query; when it dies with a
    * vanished-file failure it rebuilds the stream (the listing
    * re-pins on the compacted tree, and appends landed so far become
    * visible as a side effect) and restarts it, up to `maxRestarts`
    * CONSECUTIVE failures — the budget refills after the stream runs
    * `budgetResetMs` past its last crash, so routine maintenance
    * compactions over a long lifetime never exhaust it; only a crash
    * LOOP does. Any other failure — and a crash loop past the
    * budget, i.e. a genuinely broken store — surfaces in `failure`.
    *
    * `start` owns the sink/trigger/checkpoint wiring and MUST set a
    * `checkpointLocation` for exactly-once across restarts (the
    * restarted query resumes source offsets and watermark state from
    * it; with no checkpoint a restart reprocesses the source from
    * scratch). The honest semantics note stands: between the crash
    * and the restart the stream emits nothing, and a restarted
    * snapshot is as stream-static as the first — this supervises the
    * documented maintenance-window behavior, it does not change it. */
  def annTopKStreamSupervised(spark: SparkSession, path: String,
      vecs: DataFrame, k: Int,
      start: DataFrame => org.apache.spark.sql.streaming.StreamingQuery,
      nprobe: Int = 4, beam: Int = 2, idCol: String = "vec_id",
      vecCol: String = "embedding", delay: String = "10 minutes",
      windowDur: String = "1 minute", maxRestarts: Int = 3,
      budgetResetMs: Long = 10L * 60 * 1000): SupervisedQuery =
    new SupervisedQuery(
      () => annTopKStream(spark, path, vecs, k, nprobe, beam, idCol,
        vecCol, delay, windowDur),
      start, maxRestarts, budgetResetMs)

  /** The per-batch-pruned streaming ANN form [[annTopKStream]]'s
    * Scaladoc promises — a `foreachBatch` body that runs the BATCH
    * probe ([[graft.operators.Similarity.ivfPqHierTopKFromIndex]],
    * with its collect-driven group/cell pruning) on each microbatch of
    * query vectors and hands the ranked rows to `sink`. Identical
    * results to the batch probe by construction. Deploy when BOTH
    * hold (the measured [[annTopKStream]] decision rule, SCALE.md r15
    * streamx): the slim code tree outgrows the scan budget (past
    * ≈10⁸ codes / ~1 GB at local[32] — this form's flat ~3 s
    * per-batch overhead then beats a scan that grows with the tree)
    * AND the microbatch actually prunes (|q|·nprobe ≪ nlist;
    * otherwise the cell isin filter costs more than the scan it
    * fails to avoid and the full-scan form is strictly better). */
  def annProbeBatch(spark: SparkSession, path: String,
      sink: DataFrame => Unit, k: Int, nprobe: Int = 4, beam: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding")
      : (DataFrame, Long) => Unit = { (batch, _) =>
    // compaction-tolerant: a compaction pass racing this probe can
    // rewrite files between the per-batch listing and the tasks that
    // read them (FAILED_READ_FILE / FileNotFound) — re-running the
    // probe re-lists the store and lands on the compacted tree. The
    // probe MATERIALIZES (|q|·k ranked rows, driver-bounded) inside
    // the retry and the sink runs exactly ONCE on the pinned result:
    // a retry therefore never re-invokes the sink, so a sink that is
    // not idempotent within one batchId execution (append files, push
    // to a queue) never sees duplicated output from this wrapper —
    // and a FileNotFound raised by the SINK itself for an unrelated
    // reason propagates instead of silently re-running it. A
    // genuinely broken store still fails after the bounded retries.
    val ranked = graft.operators.Similarity.retryOnVanishedSidecar {
      graft.operators.Similarity.ivfPqHierTopKFromIndex(spark,
        path, batch.select(col(idCol).as("qid"), col(vecCol).as("qvec")),
        k, nprobe, beam).localCheckpoint(eager = true)
    }
    sink(ranked)
  }

  /** Continuous ANN-index ingestion — the APPEND-side composition of
    * the streaming family ([[annTopKStream]]/[[annProbeBatch]] are the
    * probe side): a `foreachBatch` body that appends each microbatch
    * of vectors to a persisted hierarchical IVF-PQ store with the
    * PERSISTED quantizer and codebooks — never a re-fit. The big
    * sidecars (quantizer l2 is the 0.5–8 GB half at real nlist·dim)
    * are read ONCE here at stream construction and reused by every
    * microbatch via
    * [[graft.operators.Similarity.appendIvfPqIndexHierWith]], so
    * per-microbatch cost is genuinely ∝ |batch| (kernel assign +
    * encode + per-group file adds; only the one-row meta re-reads per
    * batch, and a store re-fit under the live loop fails loudly on
    * the grid-shape check).
    *
    * Concurrency (the r15 store protocol): appends publish meta and
    * the appends log by atomic versioned swap, so the store is NEVER
    * torn mid-append — concurrent [[annProbeBatch]] probes (which
    * re-read the store per microbatch) observe each append as soon as
    * its meta lands, and batch probes racing an append see the old
    * manifest plus a valid subset of the new rows. A concurrent
    * [[annTopKStream]] is different: its stream-static side snapshots
    * the codes FILE LISTING at stream start, so a running probe
    * stream never sees appended rows (restart it to pick them up) —
    * and a compaction pass (which rewrites files) can crash it with
    * missing-file errors; compaction is a maintenance op to run when
    * probe streams quiesce. Single-writer is enforced on the store,
    * so exactly one ingest loop per index.
    *
    * The drift gate FAILS THE STREAM by design when the corpus
    * distribution walks past the quantizer — a restarted query beats
    * a silently degrading index. Batches should be id-novel: the
    * dedup gates ([[embeddingGateBatch]], [[dedupDocsAgainstIndex]])
    * compose upstream of this. `onAppend` observes (batchId, rows,
    * distortion) per append for telemetry. */
  def annIngestBatch(spark: SparkSession, path: String,
      idCol: String = "vec_id", vecCol: String = "embedding",
      refitThreshold: Double = 2.0,
      onAppend: (Long, Long, Double) => Unit = (_, _, _) => ())
      : (DataFrame, Long) => Unit = {
    import graft.operators.Similarity
    val cq = Similarity.readCoarseQuantizer(spark, path)
    val cb = Similarity.readPqCodebooks(spark, path)
    (batch, batchId) => {
      // ONE action decides both the empty-guard and the telemetry count
      // (isEmpty + count would scan the unpersisted microbatch twice
      // before the append's own scan)
      val n = batch.count()
      if (n > 0) {
        val dist = Similarity.appendIvfPqIndexHierWith(
          batch.select(col(idCol), col(vecCol)), path, cq, cb, idCol,
          vecCol, refitThreshold)
        onAppend(batchId, n, dist)
      }
    }
  }

  /** Streaming ingestion dedup — the streaming face of
    * [[graft.operators.Dedup.dedupAgainstIndex]]: arriving documents
    * (a) drop when their content fingerprint is already in the STATIC
    * corpus index (a stream-static left-anti join against the persisted
    * [[graft.operators.Dedup.fingerprintIndex]] table) and (b) dedup
    * first-writer-wins WITHIN the stream by fingerprint under the
    * watermark horizon. Nothing grows with stream length: the join side
    * is |index|, the stream state is bounded by the watermark — the
    * combination a crawl-ingestion pipeline runs continuously while a
    * batch job refreshes the index behind it.
    *
    * `bloom` (optional): an [[graft.operators.Dedup.indexBloom]]
    * sidecar over the same index. The stream-static anti-join probes
    * the index EVERY microbatch; with the sidecar, rows whose
    * fingerprint misses the filter are definitely new and bypass the
    * join map-only — only the re-crawl sliver (+ fpp) touches the
    * index per batch. Results are identical at any fpp (a Bloom miss
    * has no false negatives); refresh the sidecar whenever the batch
    * job refreshes the index. */
  def dedupDocsAgainstIndex(docs: DataFrame, index: DataFrame,
      textCol: String = "text", delay: String = "10 minutes",
      bloom: Array[Byte] = null): DataFrame = {
    val fp = docs
      .withColumn("__fp", graft.functions.Text.fingerprint(col(textCol)))
    val indexed = index.select(col("fp").as("__fp"))
    val checked =
      if (bloom == null) fp.join(indexed, Seq("__fp"), "left_anti")
      else {
        val probed = fp.withColumn("__maybe", graft.plans.BloomProbe
          .mightContain(bloom, xxhash64(col("__fp"))))
        probed.filter(!col("__maybe")).drop("__maybe")
          .unionByName(probed.filter(col("__maybe")).drop("__maybe")
            .join(indexed, Seq("__fp"), "left_anti"))
      }
    checked
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")
  }

  /** Streaming PARAGRAPH keep-first — [[graft.operators.Corpus.dedupKeepFirstAgainstIndex]]'s
    * semantics on a continuous document stream: each arriving doc's
    * units drop when (a) already in the static [[graft.operators.Corpus.unitIndex]]
    * (optionally Bloom-bypassed, identical results at any fpp), or
    * (b) already emitted by the stream within the watermark horizon —
    * first ARRIVAL wins, the only total order a stream has (batch
    * keep-first's (id, pos) rule needs one a stream cannot provide;
    * a within-microbatch cross-doc tie is arbitrary BY THAT SEMANTICS,
    * so tests and replayable pipelines should order their batches).
    * Within-doc repeats collapse FIRST through the row-local
    * first-position filter (deterministic, no state), so stream state
    * only carries cross-doc unit fingerprints. Surviving units rebuild
    * per doc in original unit order once the doc's event-time window
    * passes the watermark.
    *
    * Scale: two chained stateful operators, both bounded — unit-
    * fingerprint dedup state by the watermark horizon, rebuild state
    * by docs in flight inside `windowDur`; the static index joins
    * per microbatch exactly like [[dedupDocsAgainstIndex]] (sliver
    * discipline via the sidecar). Docs whose every unit drops vanish. */
  def dedupUnitsAgainstIndexStream(docs: DataFrame, index: DataFrame,
      textCol: String = "text", delim: String = "\n",
      delay: String = "10 minutes", windowDur: String = "1 minute",
      bloom: Array[Byte] = null): DataFrame = {
    val lines = split(col(textCol),
      java.util.regex.Pattern.quote(delim), -1)
    val firstPos = filter(lines,
      (u, i) => array_position(lines, u) === i.cast("long") + 1L)
    val units = docs.withWatermark("ts", delay)
      .select(col("doc_id"), col("ts"),
        posexplode(firstPos).as(Seq("pos", "u")))
      .withColumn("__ufp", md5(col("u")))
    val indexed = index.select(col("ufp").as("__ufp"))
    val checked =
      if (bloom == null) units.join(indexed, Seq("__ufp"), "left_anti")
      else {
        val probed = units.withColumn("__maybe",
          graft.plans.BloomProbe.mightContain(bloom,
            xxhash64(col("__ufp"))))
        probed.filter(!col("__maybe")).drop("__maybe")
          .unionByName(probed.filter(col("__maybe")).drop("__maybe")
            .join(indexed, Seq("__ufp"), "left_anti"))
      }
    checked
      .dropDuplicatesWithinWatermark("__ufp")
      .groupBy(col("doc_id"), window(col("ts"), windowDur))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("u")))),
          x => x("u")), delim).as(textCol))
      .select(col("doc_id"), col("window.start").as("ts"), col(textCol))
  }

  /** Quality-gate a DOCUMENT STREAM with a trained
    * [[graft.operators.TextClassifier]] model: keep rows whose predicted
    * quality probability ≥ `threshold`. The score is the codegen'd
    * hashed_logit kernel — a pure map with the weight vector riding the
    * plan as a reference object — so the gate adds NO streaming state
    * and composes with any watermark/dedup downstream (the explode+
    * groupBy scoring shape would be a stateful streaming aggregation).
    * Works identically on batch frames. Null-text rows drop (their
    * score is null). */
  def qualityGate(docs: DataFrame, textCol: String,
      weights: Array[Double], threshold: Double = 0.5,
      tf: Boolean = true, ngrams: Int = 1): DataFrame =
    docs.filter(
      (lit(1.0) / (lit(1.0) + exp(-graft.plans.ClassifierExprs
        .hashed_logit(col(textCol), weights.toSeq, tf, ngrams))))
        >= threshold)

  /** The normalization front (mojibake repair → NFC → script-dominance
    * gate, the `q_pipeline_text_normalize` composition) as a STREAM
    * stage: all three are row-local codegen kernels — pure maps with
    * zero per-executor state — so the gate adds NO streaming state and
    * composes with any watermark/dedup downstream. The text column is
    * rewritten in place with the repaired+normalized form (downstream
    * stages must shingle/fingerprint the CLEAN text, not the damaged
    * input). Works identically on batch frames. */
  def normalizeGate(docs: DataFrame, textCol: String,
      keepScript: String = "latin"): DataFrame = {
    import graft.plans.TextExpressions.{fix_mojibake, unicode_normalize,
      script_counts}
    docs
      .withColumn(textCol, unicode_normalize(fix_mojibake(col(textCol))))
      .withColumn("__f", graft.functions.Text
        .scriptFractions(script_counts(col(textCol))))
      .filter(col("__f").getField("dominant") === keepScript)
      .drop("__f")
  }

  /** Per-window trending terms as a true stream: watermarked tumbling
    * windows over a document stream, tokens from the native shingle
    * kernel, and the [[graft.plans.CmsAgg]] count-min heavy-hitter
    * aggregate. Per-window STATE is O(depth·width + 4k) no matter how
    * many distinct terms the window sees — an exact per-term groupBy
    * would grow streaming state with the vocabulary, which is unbounded
    * on an open text stream. Width defaults smaller than the batch
    * aggregate (4096 cells ≈ 128 KB/window in the state store). */
  def trendingTerms(docs: DataFrame, textCol: String = "text",
      win: String = "1 hour", delay: String = "10 minutes",
      k: Int = 10, depth: Int = 4, width: Int = 1 << 12): DataFrame =
    docs
      .withWatermark("ts", delay)
      .select(col("ts"), explode(
        graft.functions.Text.word_shingles(col(textCol), 1)).as("term"))
      // the kernel returns [""] for blank text (same guard as the
      // batch bigram queries) — blank crawl docs must not trend
      .where(col("term") =!= "")
      .groupBy(window(col("ts"), win))
      .agg(graft.plans.CmsAgg.cms_topk(k, depth, width)(col("term"))
        .as("top"))
      .select(col("window.start").as("win_start"),
        explode(col("top")).as("e"))
      .select(col("win_start"), col("e.key").as("term"),
        col("e.est").as("n"))

  /** Gap-based sessionization as a true stream: flatMapGroupsWithState
    * with an EVENT-TIME timeout — the streaming equivalent of the batch
    * gaps-and-islands query (q_stream_sessionize), with bounded per-user
    * state instead of a global sort.
    *
    * A session is emitted (Append mode) ONLY once the watermark passes
    * `session_end + gap`: until then a late-but-in-watermark event can
    * still land within the gap of either edge (or bridge two intervals),
    * so earlier emission could produce overlapping sessions. State is
    * therefore a list of gap-disjoint closed-but-unconfirmed intervals
    * per key — bounded by the watermark horizon (≤ delay/gap + 1
    * intervals), mirroring how Spark's own session_window finalizes. */
  def gapSessions(spark: SparkSession, events: DataFrame,
      gapMinutes: Int = 30, delay: String = "10 minutes")
      : Dataset[ClosedSession] = {
    import spark.implicits._
    val gapMs = gapMinutes * 60000L
    events.withWatermark("ts", delay)
      .select("event_id", "ts", "user_id", "event_type", "value").as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[(Long, Long, Long)], ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, it: Iterator[Event],
            state: GroupState[List[(Long, Long, Long)]]) =>
          // Release every interval whose gap horizon the watermark has
          // passed (no in-watermark event can extend or precede it any
          // more); re-arm the timeout for the earliest survivor.
          def release(intervals: List[(Long, Long, Long)])
              : Iterator[ClosedSession] = {
            val wm = state.getCurrentWatermarkMs()
            val (emit, keep) = intervals.partition(_._2 + gapMs < wm)
            if (keep.isEmpty) state.remove()
            else {
              state.update(keep)
              state.setTimeoutTimestamp(
                math.max(keep.map(_._2 + gapMs).min, wm + 1))
            }
            emit.sortBy(_._1).iterator.map { case (s, e, n) =>
              ClosedSession(uid, new java.sql.Timestamp(s),
                new java.sql.Timestamp(e), n)
            }
          }
          val prev = state.getOption.getOrElse(Nil)
          if (state.hasTimedOut) release(prev)
          else {
            // fold the batch into the interval list: sort by start and
            // merge neighbors within the gap (an event can bridge two
            // previously-separate intervals into one)
            val incoming = it.map { e =>
              val ts = e.ts.getTime; (ts, ts, 1L)
            }.toList
            val merged = (prev ++ incoming).sortBy(_._1)
              .foldLeft(List.empty[(Long, Long, Long)]) {
                case ((s1, e1, n1) :: rest, (s2, e2, n2))
                    if s2 - e1 <= gapMs =>
                  (s1, math.max(e1, e2), n1 + n2) :: rest
                case (acc, iv) => iv :: acc
              }.reverse
            release(merged)
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
          // round ONLY the emitted row, never the persisted
          // accumulator: storing the rounded total re-rounds every
          // micro-batch, so sub-cent increments (0.004/batch) would
          // be discarded forever instead of accumulating
          state.update(SessionUpdate(uid, n, tot))
          SessionUpdate(uid, n, math.rint(tot * 100) / 100)
      }
  }
}
