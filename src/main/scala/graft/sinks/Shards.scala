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

  /** Gzip-JSONL training shards — the wire format LLM data releases
    * actually ship (Dolma/RedPajama lineage: one gzipped
    * JSON-object-per-line file tree, shard-partitioned). Identical
    * packing discipline to [[writeTrainingShards]] — deterministic md5
    * shuffle order, token-budget sequence packing, `shard` from the
    * bin id — so the two writers produce THE SAME manifest for the
    * same (input, seed); only the bytes-at-rest format differs.
    * Spark-native: `DataFrameWriter.json` already writes
    * object-per-line with per-file gzip (`compression=gzip`), so the
    * 100 TB write is the same one-exchange plan as the parquet path
    * with codec work on the writer tasks. Returns the manifest read
    * back from the WRITTEN tree (explicit schema: an all-filtered-out
    * corpus writes zero files, where inference would throw). */
  def writeJsonlShards(docs: DataFrame, idCol: String, textCol: String,
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
      .option("compression", "gzip")
      .partitionBy("shard").json(outPath)
    manifestAgg(docs.sparkSession.read.schema(packed.schema)
      .json(outPath))
  }

  /** Per-shard manifest of a written shard tree: (shard, n_docs,
    * n_tokens, n_bins), shard-ordered. Reads only the written layout,
    * so it can audit any prior run. */
  def manifest(spark: SparkSession, outPath: String): DataFrame =
    manifestAgg(spark.read.parquet(outPath))

  /** [[manifest]] for a [[writeJsonlShards]] tree. Schema inference is
    * fine here (unlike the writers' explicit-schema read-back): the
    * auditor's contract is a tree that HAS shards — a zero-file tree
    * is a caller error, not an empty manifest. */
  def manifestJsonl(spark: SparkSession, outPath: String): DataFrame =
    manifestAgg(spark.read.json(outPath))

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
    * Entry mtimes are pinned to epoch, names are UTF-8, and writes go
    * through a temp file + atomic rename, so RERUNS ARE BYTE-IDENTICAL
    * per shard (sha256 in the manifest proves it; the pack order
    * tie-breaks duplicate keys by full payload content, so only rows
    * identical in every byte can swap — which leaves the tar bytes
    * unchanged) and a failed task never leaves a half-written shard
    * visible. Shard byte budgets are exact (modulo the tar's trailing
    * record padding) for ≤100-byte ASCII member names; longer or
    * non-ASCII names get an estimated PAX-header surcharge.
    *
    * The write is EAGER (like [[writeTrainingShards]]): the call
    * clears stale `shard-*.tar`/`.tmp-shard-*` files from a previous
    * run of the same outPath — a rerun producing fewer shards must not
    * leave old shards for a loader's glob — runs the job, and returns
    * the manifest (one row per shard: shard, path, n_samples, n_bytes,
    * sha256). Null payload cells skip that member; null keys write as
    * "". Local/NFS path semantics — on an object store, swap the
    * output-stream provider.
    */
  def writeTarShards(samples: DataFrame, keyCol: String,
      payload: Seq[(String, String)], outPath: String,
      bytesPerShard: Long = 1L << 30, seed: Long = 0L): DataFrame = {
    require(payload.nonEmpty, "at least one payload column")
    require(bytesPerShard > 0, "positive shard budget")
    val spark = samples.sparkSession

    // tar cost of one sample, per non-null entry: 512 B header +
    // content rounded up to the 512 B block + (for names over 100
    // bytes or containing non-ASCII, which commons-compress promotes
    // to PAX) an extended header of 512 B + the "<len> path=<name>\n"
    // record rounded up to a block
    val keyStr = s"coalesce(cast(`$keyCol` AS string), '')"
    val entryCost = payload.map { case (c, ext) =>
      val nameBytes =
        s"(octet_length($keyStr) + ${ext.getBytes("UTF-8").length + 1}L)"
      val paxNeeded =
        s"($nameBytes > 100L OR octet_length($keyStr) <> char_length($keyStr))"
      val paxCost =
        s"CASE WHEN $paxNeeded THEN 512L + (($nameBytes + 543L) div 512L) * 512L ELSE 0L END"
      expr(s"CASE WHEN `$c` IS NULL THEN 0L ELSE 512L + " +
        s"((length(cast(`$c` AS binary)) + 511L) div 512L) * 512L + " +
        s"$paxCost END")
    }.reduce(_ + _)

    // Pack-order key: the deterministic shuffle position, tie-broken
    // by the full payload content — duplicate keys with different
    // payloads still order deterministically, and rows identical in
    // every byte are interchangeable without changing the tar bytes.
    val contentFp = md5(concat_ws(":", payload.map { case (c, _) =>
      // per-column digest first: a null payload ('0' — not a possible
      // 32-hex digest) can never collide with any real content
      coalesce(md5(col(c).cast("binary")), lit("0"))
    }: _*))
    val ord = concat(
      graft.operators.Corpus.shuffleKey(col(keyCol), seed),
      lit(":"), contentFp)

    // slim pack: shard boundaries WITHOUT moving payload bytes
    val rawBounds: Array[(String, Long)] = graft.operators.Pack
      .sequencePack(
        samples.select(ord.as("__ord"), entryCost.as("__bytes")),
        "__ord", "__bytes", bytesPerShard)
      .groupBy(col("seq_id").as("shard"))
      .agg(max(col("__ord")).as("hi"))
      .collect().map(r => (r.getString(1), r.getLong(0)))
    // Fully identical rows straddling a boundary can give two shards
    // the same hi: keep the lower shard id (its first-match wins in
    // the search below; the other shard simply receives no rows) and
    // sort driver-side so the executor's Java-string binary search
    // sees the exact ordering it compares with. (Java UTF-16 vs Spark
    // UTF-8 ordering can only diverge for strings equal through the
    // md5-hex prefix — i.e. never for distinct ords.)
    val bounds: Array[(String, Long)] = rawBounds
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toArray
      .sortBy(_._1)
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

    // Pre-clean: stale shards from a previous run of this outPath (a
    // rerun producing fewer shards must not leave old tars for a
    // loader's glob) and stranded temps from a previous failed task.
    val outDir = java.nio.file.Paths.get(outPath)
    java.nio.file.Files.createDirectories(outDir)
    val stale = java.nio.file.Files.newDirectoryStream(outDir)
    try {
      stale.forEach { p =>
        val n = p.getFileName.toString
        if ((n.startsWith("shard-") && n.endsWith(".tar")) ||
            n.startsWith(".tmp-shard-"))
          java.nio.file.Files.delete(p)
      }
    } finally stale.close()

    val rows: Array[Row] =
      if (bounds.isEmpty) Array.empty
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
          try {
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
                      Files.newOutputStream(tmp), 1 << 16), digest),
                  "UTF-8") // portable member names, any executor locale
                tout.setLongFileMode(TarArchiveOutputStream.LONGFILE_POSIX)
                tout.setAddPaxHeadersForNonAsciiNames(true)
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
          } catch {
            case t: Throwable =>
              // failed task: release the fd, remove the half-written
              // temp — retries re-clean via createTempFile uniqueness
              // + the driver's pre-clean on the next full run
              if (tout != null) {
                try tout.close() catch { case _: Throwable => () }
                try Files.deleteIfExists(tmp)
                catch { case _: Throwable => () }
              }
              throw t
          }
          done.iterator
        }(enc)
        .collect() // EAGER: the write happens here, once

    spark.createDataFrame(
      java.util.Arrays.asList(rows.sortBy(_.getLong(0)): _*),
      manifestSchema)
  }
}
