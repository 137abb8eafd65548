package graft.sinks

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Training-shard writer: the last mile of a curation pipeline — the
  * deterministically shuffled, token-packed, shard-partitioned layout
  * a trainer's data loader actually reads.
  *
  * Composition of audited pieces, no new distributed machinery:
  *   1. deterministic permutation key (the md5("id:seed") trick of
  *      [[graft.operators.Corpus.shuffleDeterministic]] — rerun-stable,
  *      layout-independent, a different seed is an independent epoch);
  *   2. [[graft.operators.Pack.sequencePack]] over that key: the
  *      two-phase distributed prefix sum assigns every document a
  *      consecutive token bin with ONE range exchange and a
  *      |partitions|-bounded driver scan;
  *   3. `partitionBy(shard)` parquet write, shard = bin / binsPerShard —
  *      dynamic partition overwrite semantics, so shards land as
  *      self-contained directories a loader can claim one at a time.
  *
  * At 100 TB every step is the scale shape already measured elsewhere:
  * the only corpus-moving exchange is the range partition of step 2
  * (the write inherits it — no extra shuffle), and shard sizes are
  * governed by token budget, not row counts, so skewed document
  * lengths cannot produce pathological shards.
  */
object Shards {

  /** Write `docs` as training shards under `outPath`; returns the
    * per-shard manifest (shard, n_docs, n_tokens), shard-ordered —
    * deterministic for a given (corpus, seed, budgets), provided ids
    * are unique (duplicate ids share a permutation key, and their
    * relative order is then layout-dependent). Null text packs as 0
    * tokens; null ids sort like the empty string. The write is a
    * STATIC overwrite (the whole tree is replaced even if the session
    * runs dynamic partition overwrite — a rerun producing fewer shards
    * must not leave stale shard dirs for a loader to train on). */
  def writeTrainingShards(docs: DataFrame, idCol: String, textCol: String,
      outPath: String, tokensPerBin: Long = 4096,
      binsPerShard: Long = 256, seed: Long = 0L): DataFrame = {
    require(tokensPerBin > 0 && binsPerShard > 0, "positive budgets")
    val keyed = docs
      .withColumn("__ord", graft.operators.Corpus.shuffleKey(
        col(idCol), seed))
      .withColumn("__tok", coalesce(
        graft.functions.Text.token_count(col(textCol)).cast("long"),
        lit(0L)))
    val packed = graft.operators.Pack
      .sequencePack(keyed, "__ord", "__tok", tokensPerBin)
      .withColumn("shard", floor(col("seq_id") / binsPerShard).cast("long"))
      .drop("__ord", "cum_before")
    packed.write.mode("overwrite")
      .option("partitionOverwriteMode", "static")
      .partitionBy("shard").parquet(outPath)
    // explicit schema: an all-filtered-out corpus writes zero data
    // files, where schema inference would throw instead of returning
    // an empty manifest (and it keeps `shard` long — partition-column
    // inference narrows shard=N dirs to int)
    manifestAgg(docs.sparkSession.read.schema(packed.schema)
      .parquet(outPath))
  }

  /** Per-shard manifest of a written shard tree: (shard, n_docs,
    * n_tokens, n_bins), shard-ordered. Reads only the written layout,
    * so it can audit any prior run. */
  def manifest(spark: SparkSession, outPath: String): DataFrame =
    manifestAgg(spark.read.parquet(outPath))

  private def manifestAgg(written: DataFrame): DataFrame =
    written
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__tok")).as("n_tokens"),
        countDistinct(col("seq_id")).as("n_bins"))
      .orderBy(col("shard"))

  /** WebDataset-style tar shards for multimodal training export: each
    * shard is ONE `.tar` under `outPath`, each sample a run of members
    * sharing the key as basename (`<key>.<ext>` per payload column) —
    * the layout streaming data loaders read sequentially.
    *
    * Scale shape — the payload bytes (the expensive thing: images,
    * audio) move through exactly ONE exchange:
    *   1. a SLIM (ord, bytes) projection runs the
    *      [[graft.operators.Pack.sequencePack]] prefix sum under a
    *      byte budget — only ~50 B/row shuffles here, payloads stay
    *      put;
    *   2. the per-shard upper ord bounds collect to the driver —
    *      bounded by the OUTPUT shard count (total_bytes ÷
    *      bytesPerShard; ~10⁵ at 100 TB / 1 GB shards), the file count
    *      any driver has to track anyway — and broadcast;
    *   3. each payload row binary-searches its shard in the broadcast
    *      bounds (map-only; a scala udf by choice — the work is two
    *      string compares per row against a driver-bounded array, not
    *      worth a codegen Expression) and ONE
    *      `repartition(shard)` gives every shard a single writer task;
    *      `sortWithinPartitions(shard, ord)` makes member order
    *      deterministic.
    * Entry mtimes are pinned to epoch and writes go through a temp
    * file + atomic rename, so RERUNS ARE BYTE-IDENTICAL per shard
    * (sha256 in the manifest proves it) and a failed task never leaves
    * a half-written shard visible. Budget note: shard byte budgets are
    * exact when keys are unique (duplicate keys share an ord and
    * collapse into the earlier shard).
    *
    * Evaluating the returned manifest IS the write (one row per shard:
    * shard, path, n_samples, n_bytes, sha256). Null payload cells skip
    * that member; null keys write as "". Local/NFS path semantics —
    * on an object store, swap the output-stream provider.
    */
  def writeTarShards(samples: DataFrame, keyCol: String,
      payload: Seq[(String, String)], outPath: String,
      bytesPerShard: Long = 1L << 30, seed: Long = 0L): DataFrame = {
    require(payload.nonEmpty, "at least one payload column")
    require(bytesPerShard > 0, "positive shard budget")
    val spark = samples.sparkSession

    // tar cost of one sample: 512 B header + content rounded up to the
    // 512 B block, per non-null entry
    val entryCost = payload.map { case (c, _) =>
      expr(s"CASE WHEN `$c` IS NULL THEN 0L ELSE 512L + " +
        s"((length(cast(`$c` AS binary)) + 511L) div 512L) * 512L END")
    }.reduce(_ + _)

    val ord = graft.operators.Corpus.shuffleKey(col(keyCol), seed)

    // slim pack: shard boundaries WITHOUT moving payload bytes
    val bounds: Array[(String, Long)] = graft.operators.Pack
      .sequencePack(
        samples.select(ord.as("__ord"), entryCost.as("__bytes")),
        "__ord", "__bytes", bytesPerShard)
      .groupBy(col("seq_id").as("shard"))
      .agg(max(col("__ord")).as("hi"))
      .orderBy(col("hi"))
      .collect().map(r => (r.getString(1), r.getLong(0)))
    val boundsB = spark.sparkContext.broadcast(bounds)
    val shardOf = udf { o: String =>
      val b = boundsB.value
      // first hi >= o (b is hi-ascending; o <= last hi by construction)
      var lo = 0
      var hi = b.length - 1
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (b(mid)._1 < o) lo = mid + 1 else hi = mid
      }
      b(lo)._2
    }

    val projected = samples.select(
      Seq(shardOf(ord).as("shard"), ord.as("__ord"),
        coalesce(col(keyCol).cast("string"), lit("")).as("__key")) ++
        payload.map { case (c, _) => col(c).cast("binary").as(s"__p_$c") }: _*)

    val exts = payload.map(_._2)
    val manifestSchema = StructType(Seq(
      StructField("shard", LongType, nullable = false),
      StructField("path", StringType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("n_bytes", LongType, nullable = false),
      StructField("sha256", StringType, nullable = false)))
    val enc = RowEncoder.encoderFor(manifestSchema)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outPath))

    val manifest =
      if (bounds.isEmpty) spark.createDataFrame(
        new java.util.ArrayList[Row](), manifestSchema)
      else projected
        .repartition(math.min(bounds.length,
          spark.sessionState.conf.numShufflePartitions), col("shard"))
        .sortWithinPartitions(col("shard"), col("__ord"))
        .mapPartitions { it =>
          import java.nio.file.{Files, Paths, StandardCopyOption}
          import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
          val done = scala.collection.mutable.ArrayBuffer.empty[Row]
          var shard = -1L
          var tmp: java.nio.file.Path = null
          var digest: java.security.MessageDigest = null
          var tout: TarArchiveOutputStream = null
          var nSamples = 0L
          def closeShard(): Unit = if (tout != null) {
            tout.finish(); tout.close()
            val fin = Paths.get(outPath, f"shard-$shard%06d.tar")
            val nBytes = Files.size(tmp)
            Files.move(tmp, fin, StandardCopyOption.REPLACE_EXISTING,
              StandardCopyOption.ATOMIC_MOVE)
            done += Row(shard, fin.toString, nSamples, nBytes,
              digest.digest().map("%02x".format(_)).mkString)
            tout = null; tmp = null; digest = null; nSamples = 0L
          }
          it.foreach { r =>
            val s = r.getLong(0)
            if (s != shard) {
              closeShard()
              shard = s
              tmp = Files.createTempFile(
                Paths.get(outPath), ".tmp-shard-", ".tar")
              digest = java.security.MessageDigest.getInstance("SHA-256")
              tout = new TarArchiveOutputStream(
                new java.security.DigestOutputStream(
                  new java.io.BufferedOutputStream(
                    Files.newOutputStream(tmp), 1 << 16), digest))
              tout.setLongFileMode(TarArchiveOutputStream.LONGFILE_POSIX)
            }
            val key = r.getString(2)
            var i = 0
            while (i < exts.length) {
              if (!r.isNullAt(3 + i)) {
                val bytes = r.getAs[Array[Byte]](3 + i)
                val e = new TarArchiveEntry(s"$key.${exts(i)}")
                e.setSize(bytes.length.toLong)
                e.setModTime(0L) // pinned mtime → byte-identical reruns
                tout.putArchiveEntry(e)
                tout.write(bytes)
                tout.closeArchiveEntry()
              }
              i += 1
            }
            nSamples += 1
          }
          closeShard()
          done.iterator
        }(enc)
    manifest.orderBy(col("shard"))
  }
}
