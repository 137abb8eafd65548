package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** Laws for the r15 ANN store-mutation protocol: atomic versioned
  * sidecars (meta and the appends log are each ONE `v<n>.parquet` file,
  * published by tmp-write + rename, superseded versions swept — so an
  * append NEVER tears the store), single-writer enforcement via the
  * `.writer.lock` file, the zero-base drift-gate re-arm, flat-layout
  * compaction, and the pre-loaded-sidecar append variants the
  * continuous-ingestion loop uses. */
class AnnStoreProtocolSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def em = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def sidecarFiles(dir: String): Array[String] =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(_.getName).sorted

  test("sidecars are single versioned files: N appends leave exactly " +
      "one live meta version and one live log file (old versions " +
      "swept), the log carries all N rows, and the store is readable " +
      "at every step — never torn by an append") {
    val p = tmp("proto")
    Similarity.writeIvfIndexHier(
      em.filter(col("vec_id") < 300), p, 9, minPointsPerCentroid = 8)
    assert(sidecarFiles(s"$p/meta").toSeq == Seq("v0000000000000001.parquet"))
    (0 until 3).foreach { i =>
      Similarity.appendIvfIndexHier(
        em.filter(col("vec_id") >= 300 + i * 50 &&
          col("vec_id") < 350 + i * 50), p)
      // readable immediately after every append, exactly one version
      assert(Similarity.readCoarseQuantizer(spark, p).k1 == 3)
      assert(sidecarFiles(s"$p/meta").length == 1, "meta versions leaked")
      assert(sidecarFiles(s"$p/appends").length == 1,
        "append log must stay ONE file regardless of append count")
      assert(Similarity.readAppendLog(spark, p).count() == i + 1L)
    }
    // versions are monotonic: 1 (build) + 3 (appends) = v4 live
    assert(sidecarFiles(s"$p/meta").head == "v0000000000000004.parquet")
    // the DuckDB-shaped whole-dir glob still sees exactly the live log
    assert(spark.read.parquet(s"$p/appends").count() == 3)
    // readAppendLog MATERIALIZES the versioned log (race-safe local
    // relation): a frame read before a further append stays valid —
    // it must not lazily re-resolve to a swept version file later
    val held = Similarity.readAppendLog(spark, p)
    Similarity.appendIvfIndexHier(
      em.filter(col("vec_id") >= 450 && col("vec_id") < 470), p)
    assert(held.count() == 3, "held log frame must stay readable")
    assert(Similarity.readAppendLog(spark, p).count() == 4)
  }

  test("segmented appends log: the active sidecar seals into an " +
      "immutable segment at the cap (per-append rewrite cost is " +
      "O(segment), flat in store age), every reader — versioned, " +
      "legacy whole-dir glob — sees each row exactly once, and " +
      "compaction merges the segments back to one file") {
    val p = tmp("protoSegLog")
    // 10 synthetic appends at cap 4 → seg-1 (4 rows), seg-2 (4 rows),
    // active v* (2 rows)
    (1 to 10).foreach(i => Similarity.appendLogRowSeg(spark, p,
      i.toLong, 0.1, 0.1, 2.0, segmentRows = 4))
    val f1 = sidecarFiles(s"$p/appends")
    assert(f1.count(_.startsWith("seg-")) == 2, f1.toSeq)
    assert(f1.count(_.startsWith("v")) == 1, f1.toSeq)
    assert(Similarity.readAppendLog(spark, p).count() == 10)
    assert(spark.read.parquet(s"$p/appends").count() == 10,
      "the DuckDB-shaped whole-dir glob must see each row exactly once")
    // the active file is bounded by the cap — THE flat-cost invariant
    assert(spark.read.parquet(s"$p/appends/" +
      f1.find(_.startsWith("v")).get).count() <= 4)
    // appends 11-12 roll a third segment and leave NO active (the
    // sealed segments alone are the complete log in that state)
    (11 to 12).foreach(i => Similarity.appendLogRowSeg(spark, p,
      i.toLong, 0.1, 0.1, 2.0, segmentRows = 4))
    val f2 = sidecarFiles(s"$p/appends")
    assert(f2.count(_.startsWith("seg-")) == 3 &&
      f2.count(_.startsWith("v")) == 0, f2.toSeq)
    assert(Similarity.readAppendLog(spark, p).count() == 12)
    // no row lost or duplicated across the seal/roll lifecycle
    assert(Similarity.readAppendLog(spark, p)
      .agg(sum(col("n_rows"))).collect().head.getLong(0) == 78L)

    // merge-on-compact: a REAL store whose log has sealed segments
    // collapses back to one live version file, rows intact
    val sp = tmp("protoSegMerge")
    Similarity.writeIvfIndexHier(
      em.filter(col("vec_id") < 300), sp, 9, minPointsPerCentroid = 8)
    Similarity.appendIvfIndexHier(
      em.filter(col("vec_id") >= 300 && col("vec_id") < 350), sp)
    (1 to 5).foreach(i => Similarity.appendLogRowSeg(spark, sp,
      100L + i, 0.1, 0.1, 2.0, segmentRows = 2))
    assert(sidecarFiles(s"$sp/appends").count(_.startsWith("seg-")) >= 2)
    val before = Similarity.readAppendLog(spark, sp).count()
    Similarity.compactIvfIndexHier(spark, sp)
    val f3 = sidecarFiles(s"$sp/appends")
    assert(f3.count(_.startsWith("seg-")) == 0 &&
      f3.count(_.startsWith("v")) == 1,
      s"compaction must merge log segments to one live file: ${f3.toSeq}")
    assert(Similarity.readAppendLog(spark, sp).count() == before)
    assert(spark.read.parquet(s"$sp/appends").count() == before)
    // the store still probes after the merge
    val q = em.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    assert(Similarity.ivfHierTopKFromIndex(spark, sp, q, 5)
      .count() > 0)
  }

  test("a merge that crashes between its version publish and its " +
      "segment sweep never bakes a double count: the marker makes " +
      "readers exclude the absorbed segments and the next mutator " +
      "deletes them") {
    val p = tmp("protoMergeCrash")
    (1 to 7).foreach(i => Similarity.appendLogRowSeg(spark, p,
      i.toLong, 0.1, 0.1, 2.0, 2)) // 3 segs (2 rows each) + active (1)
    val dir = new java.io.File(s"$p/appends")
    val segBytes = dir.listFiles().filter(_.getName.startsWith("seg-"))
      .map(f => f.getName ->
        java.nio.file.Files.readAllBytes(f.toPath)).toMap
    assert(segBytes.size == 3)
    Similarity.compactAppendLog(spark, p)
    assert(Similarity.readAppendLog(spark, p).count() == 7)
    // simulate the crash window: resurrect the swept segments and the
    // marker exactly as a JVM death between rename and sweep leaves
    // them (the merged version is live, the old segments linger)
    segBytes.foreach { case (n, b) =>
      java.nio.file.Files.write(new java.io.File(dir, n).toPath, b); () }
    val fs = new org.apache.hadoop.fs.Path(s"$p/appends")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ver = dir.listFiles().map(_.getName)
      .collect { case n if n.startsWith("v") =>
        n.stripPrefix("v").stripSuffix(".parquet").toLong }.max
    val maxSeg = segBytes.keys
      .map(_.stripPrefix("seg-").stripSuffix(".parquet").toLong).max
    Similarity.writeMergeMarker(fs,
      new org.apache.hadoop.fs.Path(s"$p/appends"), maxSeg, ver)
    // whole-dir would now double-count; the reader must NOT
    assert(spark.read.parquet(s"$p/appends").count() == 13,
      "precondition: the crash window really does double rows on disk")
    assert(Similarity.readAppendLog(spark, p).count() == 7,
      "reader must exclude the marker's absorbed segments")
    // the next mutation finishes the recovery: segments gone, marker
    // gone, rows intact
    Similarity.appendLogRowSeg(spark, p, 8L, 0.1, 0.1, 2.0, 2)
    assert(dir.listFiles().count(_.getName.startsWith("seg-")) <= 1)
    assert(!new java.io.File(dir, ".merge.pending").exists())
    assert(Similarity.readAppendLog(spark, p).count() == 8)
    // and a marker whose version was NEVER published (crash before
    // the rename) keeps the segments live and just drops the marker
    val p2 = tmp("protoMergeCrash2")
    (1 to 5).foreach(i => Similarity.appendLogRowSeg(spark, p2,
      i.toLong, 0.1, 0.1, 2.0, 2))
    Similarity.writeMergeMarker(fs,
      new org.apache.hadoop.fs.Path(s"$p2/appends"), 2L, 9999L)
    assert(Similarity.readAppendLog(spark, p2).count() == 5,
      "an unpublished merge must not kill live segments")
    Similarity.appendLogRowSeg(spark, p2, 6L, 0.1, 0.1, 2.0, 2)
    assert(Similarity.readAppendLog(spark, p2).count() == 6)
    assert(!new java.io.File(s"$p2/appends/.merge.pending").exists())
  }

  test("a reader RACING the segmented log never fails and never sees " +
      "a torn count: seals (active→segment rename) and publishes " +
      "(version swap) stay invisible — counts only ever grow") {
    val p = tmp("protoSegRace")
    // prime one row so the reader always has a log to read
    Similarity.appendLogRowSeg(spark, p, 0L, 0.1, 0.1, 2.0, 3)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val reads = new java.util.concurrent.atomic.AtomicInteger(0)
    val appended = new java.util.concurrent.atomic.AtomicInteger(1)
    val reader = new Thread(() => {
      var lastCount = 0L
      while (!stop.get()) {
        try {
          val n = Similarity.readAppendLog(spark, p).count()
          val hi = appended.get() // read AFTER the count: the log may
          // have grown between our snapshot and this bound, never shrunk
          if (n < lastCount)
            failures.add(s"count shrank: $lastCount -> $n")
          if (n > hi) failures.add(s"count $n above appended $hi")
          lastCount = n
          reads.incrementAndGet()
          ()
        } catch { case e: Exception =>
          failures.add(s"reader failed: ${e.getMessage}")
        }
      }
    }, "seg-log-racing-reader")
    reader.start()
    // 59 more appends at cap 3 → ~20 seal renames race the reader
    (1 to 59).foreach { i =>
      Similarity.appendLogRowSeg(spark, p, i.toLong, 0.1, 0.1, 2.0, 3)
      appended.incrementAndGet()
      ()
    }
    stop.set(true)
    reader.join(30000)
    assert(failures.isEmpty, s"racing reader: ${failures.toArray.toSeq}")
    assert(reads.get() > 0, "the reader must actually have raced")
    assert(Similarity.readAppendLog(spark, p).count() == 60)
    val files = sidecarFiles(s"$p/appends")
    assert(files.count(_.startsWith("seg-")) == 20 &&
      files.count(_.startsWith("v")) == 0, files.toSeq)
  }

  test("legacy (pre-protocol) sidecars keep reading: a hand-written " +
      "unversioned meta dir resolves through the whole-dir fallback, " +
      "and the first append upgrades it to a versioned file") {
    val p = tmp("protoLegacy")
    Similarity.writeIvfIndex(em.filter(col("vec_id") < 300), p, nlist = 8)
    // rewrite meta the legacy way (plain part files + _SUCCESS)
    val base = spark.read.parquet(s"$p/meta").head().getDouble(0)
    def rmr(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmr)); f.delete(); ()
    }
    rmr(new java.io.File(s"$p/meta"))
    Seq(base).toDF("base_distortion")
      .coalesce(1).write.mode("overwrite").parquet(s"$p/meta")
    assert(sidecarFiles(s"$p/meta").exists(_.startsWith("part-")))
    Similarity.appendIvfIndex(
      em.filter(col("vec_id") >= 300 && col("vec_id") < 400), p)
    val after = sidecarFiles(s"$p/meta")
    assert(after.length == 1 && after.head.startsWith("v0"),
      s"append must upgrade legacy meta to the versioned protocol: $after")
  }

  test("single-writer enforcement: a held lock refuses every mutator " +
      "loudly (append, compact, rebuild) and probes stay unaffected; " +
      "releaseWriterLock recovers") {
    val p = tmp("protoLock")
    Similarity.writeIvfIndexHier(
      em.filter(col("vec_id") < 400), p, 9, minPointsPerCentroid = 8)
    val queries = em.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val before = Similarity.ivfHierTopKFromIndex(spark, p, queries, 5)
      .collect().length
    assert(new java.io.File(s"$p/.writer.lock").createNewFile())
    val batch = em.filter(col("vec_id") >= 400)
    val e1 = intercept[IllegalArgumentException] {
      Similarity.appendIvfIndexHier(batch, p)
    }
    assert(e1.getMessage.contains("writer lock"))
    val e2 = intercept[IllegalArgumentException] {
      Similarity.compactIvfIndexHier(spark, p)
    }
    assert(e2.getMessage.contains("writer lock"))
    val e3 = intercept[IllegalArgumentException] {
      Similarity.writeIvfIndexHier(batch, p, 9, minPointsPerCentroid = 8)
    }
    assert(e3.getMessage.contains("writer lock"))
    // probes never take the lock
    assert(Similarity.ivfHierTopKFromIndex(spark, p, queries, 5)
      .collect().length == before)
    Similarity.releaseWriterLock(spark, p)
    assert(Similarity.appendIvfIndexHier(batch, p) > 0.0)
    // the lock is released after a successful mutation...
    assert(!new java.io.File(s"$p/.writer.lock").exists())
    // ...and after a REFUSED one (drift refusal must not wedge the store)
    val drifted = batch.select(col("vec_id"),
      transform(col("embedding"), x => x * lit(5.0f)).as("embedding"))
    intercept[IllegalArgumentException] {
      Similarity.appendIvfIndexHier(drifted, p)
    }
    assert(!new java.io.File(s"$p/.writer.lock").exists(),
      "a refused append must release the writer lock")
  }

  test("a failure AFTER mutation begins keeps the writer lock (the " +
      "next mutator must refuse — a streaming retry must not blindly " +
      "re-append a half-landed batch), while pure refusals before " +
      "mutation release it") {
    val p = tmp("protoMidFail")
    Similarity.writeIvfIndexHier(
      em.filter(col("vec_id") < 400), p, 9, minPointsPerCentroid = 8)
    // sabotage the data tree AFTER the drift gate will pass: replace
    // the index dir with a plain file so the per-group append write
    // itself fails mid-mutation
    def rmr(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmr)); f.delete(); ()
    }
    rmr(new java.io.File(s"$p/index"))
    assert(new java.io.File(s"$p/index").createNewFile())
    val batch = em.filter(col("vec_id") >= 400)
    intercept[Exception] { Similarity.appendIvfIndexHier(batch, p) }
    assert(new java.io.File(s"$p/.writer.lock").exists(),
      "a mid-mutation failure must RETAIN the lock")
    val e = intercept[IllegalArgumentException] {
      Similarity.appendIvfIndexHier(batch, p)
    }
    assert(e.getMessage.contains("writer lock"),
      "the next mutator must refuse the possibly-partial store")
    // stale-lock forensics: the refusal names the dead holder (op,
    // pid, acquire time) and the lock's age, so an operator can tell
    // a live writer from a corpse before releaseWriterLock
    assert(e.getMessage.contains("op=appendIvfIndexHier"),
      s"refusal must name the holding op: ${e.getMessage}")
    assert(e.getMessage.contains(
        s"pid=${java.lang.ProcessHandle.current().pid()}"),
      s"refusal must name the holder pid: ${e.getMessage}")
    assert(e.getMessage.contains("acquired=") &&
        e.getMessage.contains("lock age:"),
      s"refusal must carry acquire time and age: ${e.getMessage}")
    Similarity.releaseWriterLock(spark, p)
    assert(!new java.io.File(s"$p/.writer.lock").exists())
  }

  test("a lock file with no holder metadata (pre-forensics, or " +
      "created out-of-band) still refuses, flagged as such") {
    val p = tmp("protoLockBare")
    Similarity.writeIvfIndexHier(
      em.filter(col("vec_id") < 400), p, 9, minPointsPerCentroid = 8)
    assert(new java.io.File(s"$p/.writer.lock").createNewFile())
    val e = intercept[IllegalArgumentException] {
      Similarity.appendIvfIndexHier(em.filter(col("vec_id") >= 400), p)
    }
    assert(e.getMessage.contains("no holder metadata"),
      s"an empty lock must be flagged pre-forensics: ${e.getMessage}")
    Similarity.releaseWriterLock(spark, p)
  }

  test("zero-base re-arm: a bootstrap-sized build (base 0) admits the " +
      "first batch and persists ITS distortion as the new base, so a " +
      "drifted second batch is refused instead of the gate staying " +
      "disabled forever") {
    val p = tmp("protoRearm")
    // 8 distinct vectors, 8 cells: base_distortion persists as 0.0
    Similarity.writeIvfIndex(em.filter(col("vec_id") < 8), p, nlist = 8)
    assert(spark.read.parquet(s"$p/meta").head()
      .getAs[Double]("base_distortion") == 0.0)
    val d1 = Similarity.appendIvfIndex(
      em.filter(col("vec_id") >= 8 && col("vec_id") < 40), p)
    assert(d1 > 0.0)
    val rearmed = spark.read.parquet(s"$p/meta").head()
      .getAs[Double]("base_distortion")
    assert(rearmed == d1, "admitted batch's distortion must become the base")
    // the gate is live now: a 5x-scaled batch refuses
    val drifted = em.filter(col("vec_id") >= 40 && col("vec_id") < 80)
      .select(col("vec_id"),
        transform(col("embedding"), x => x * lit(5.0f)).as("embedding"))
    val e = intercept[IllegalArgumentException] {
      Similarity.appendIvfIndex(drifted, p)
    }
    assert(e.getMessage.contains("drifted"))
    // a sane second batch appends and the base does NOT drift with it
    assert(Similarity.appendIvfIndex(
      em.filter(col("vec_id") >= 40 && col("vec_id") < 80), p) > 0.0)
    assert(spark.read.parquet(s"$p/meta").head()
      .getAs[Double]("base_distortion") == rearmed)
  }

  test("flat compaction: appended hive trees collapse to one file per " +
      "cell, the cell-less PQ table to one file, probes identical " +
      "before and after; a second compact is a no-op") {
    val a = em.filter(col("vec_id") < 400)
    val b = em.filter(col("vec_id") >= 400)
    val queries = em.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    def cellMaxFiles(p: String, sub: String): Int =
      new java.io.File(s"$p/$sub").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("cell="))
        .map(_.listFiles().count(f2 => f2.isFile &&
          f2.getName.endsWith(".parquet"))).max

    // flat IVF
    val p1 = tmp("protoCompIvf")
    Similarity.writeIvfIndex(a, p1, nlist = 8)
    Similarity.appendIvfIndex(b, p1)
    def probeIvf() = Similarity.ivfTopKFromIndex(spark, p1, queries, 5,
        nprobe = 3).select("qid", "rank", "vec_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val wantIvf = probeIvf()
    assert(cellMaxFiles(p1, "index") >= 2, "append did not fragment")
    Similarity.compactIvfIndex(spark, p1)
    assert(cellMaxFiles(p1, "index") == 1, "compaction left fragments")
    assert(probeIvf() == wantIvf, "flat IVF compaction changed probes")
    val metaV = sidecarFiles(s"$p1/meta").head
    Similarity.compactIvfIndex(spark, p1) // no-op: nothing fragmented
    assert(sidecarFiles(s"$p1/meta").head == metaV,
      "no-op compact must not republish meta")

    // flat IVF-PQ (residual)
    val cents = Similarity.readCentroids(spark, p1)
    val p2 = tmp("protoCompIvfPq")
    Similarity.writeIvfPqIndex(a, p2, cents, m = 8, ncodes = 16,
      residual = true)
    Similarity.appendIvfPqIndex(b, p2)
    def probeIvfPq() = Similarity.ivfPqTopKFromIndex(spark, p2, queries,
        5, nprobe = 3).select("qid", "rank", "vec_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val wantIvfPq = probeIvfPq()
    Similarity.compactIvfPqIndex(spark, p2)
    assert(cellMaxFiles(p2, "codes") == 1)
    assert(probeIvfPq() == wantIvfPq, "IVF-PQ compaction changed probes")
    assert(Similarity.readIvfPqMeta(spark, p2),
      "compaction must restore the residual flag byte-identically")

    // cell-less flat PQ: whole-table rewrite
    val p3 = tmp("protoCompPq")
    Similarity.writePqIndex(a, p3, m = 8, ncodes = 16)
    Similarity.appendPqIndex(b, p3)
    def probePq() = Similarity.pqTopKFromIndex(spark, p3, queries, 5)
      .select("qid", "rank", "vec_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val wantPq = probePq()
    assert(sidecarFiles(s"$p3/codes").length > 1)
    Similarity.compactPqIndex(spark, p3, maxFiles = 1)
    assert(sidecarFiles(s"$p3/codes").length == 1)
    assert(probePq() == wantPq, "flat PQ compaction changed probes")
  }

  test("pre-loaded-sidecar append (the ingest-loop shape) is " +
      "row-identical to the self-loading append, and a store re-fit " +
      "under a live loop fails the shape check loudly") {
    val a = em.filter(col("vec_id") < 400)
    val b = em.filter(col("vec_id") >= 400)
    val cq = Similarity.trainCoarseHierarchical(a, "embedding", 9,
      minPointsPerCentroid = 8)
    val p1 = tmp("protoPre1")
    val p2 = tmp("protoPre2")
    Similarity.writeIvfPqIndexHier(a, p1, cq, m = 8, ncodes = 16)
    val cb = Similarity.readPqCodebooks(spark, p1)
    Similarity.writeIvfPqIndexHier(a, p2, cq, m = 8, ncodes = 16,
      codebooks = Some(cb))
    // p1: pre-loaded variant; p2: self-loading variant
    val preCq = Similarity.readCoarseQuantizer(spark, p1)
    Similarity.appendIvfPqIndexHierWith(b, p1, preCq, cb)
    Similarity.appendIvfPqIndexHier(b, p2)
    val queries = em.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    def probe(p: String) = Similarity.ivfPqHierTopKFromIndex(spark, p,
        queries, 5, nprobe = 4, beam = 3)
      .select("qid", "rank", "vec_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(probe(p1) == probe(p2),
      "pre-loaded append diverged from the self-loading append")
    // re-fit the store to a DIFFERENT grid under the "live" loop: the
    // stale pre-loaded quantizer must be refused by the shape check
    Similarity.writeIvfPqIndexHier(em, p1,
      Similarity.trainCoarseHierarchical(em, "embedding", 16,
        minPointsPerCentroid = 8), m = 8, ncodes = 16)
    val e = intercept[IllegalArgumentException] {
      Similarity.appendIvfPqIndexHierWith(b, p1, preCq, cb)
    }
    assert(e.getMessage.contains("no longer matches"))
  }
}
