package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared query-surface plumbing.
  *
  * Every operator from SURVEY §2 is demonstrated as a named query over the
  * driver's test tables, with (where SQL-expressible) a DuckDB oracle that
  * must hash-match. Cross-engine determinism rules used throughout:
  *
  *  - money/double sums go through exact integer cents:
  *    `sum(floor(x*100 + 0.5)::bigint)` — both engines do the identical
  *    IEEE multiply/floor, then exact integer addition (no FP
  *    associativity drift), divided by 100.0 at the end.
  *  - double→int conversions always use an explicit `floor` (Spark casts
  *    truncate, DuckDB casts round — never rely on cast behavior).
  *  - timestamps are emitted as dates or epoch-second bigints (the events
  *    table is ns-precision parquet; Spark truncates to µs, DuckDB keeps
  *    ns — raw timestamp output would hash-mismatch).
  *  - every aggregate/computed column is aliased identically on both
  *    sides (the driver sorts columns by name before hashing).
  */
object Q {
  final case class Entry(
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  /** Per-(session, table) memo of the ANALYZED base DataFrame: the
    * r17 cold-path fix. Each `spark.read.parquet` call builds a fresh
    * InMemoryFileIndex (a driver-side listing job) and re-reads the
    * footer schema — per QUERY per RUN, that was 168 × 3 rebuilds of
    * identical metadata per bench pass (guide §6 "file listing").
    * The memo shares one LogicalRelation (file index + schema — plan
    * METADATA, never row data: every run still scans the parquet
    * bytes, so this is not result caching) across all queries of a
    * session. Keyed weakly on the session so a stopped session's
    * relations are collectable; the contract is the engine's usual
    * one-shot-JVM shape — testdata is immutable while a session runs. */
  private val tableMemo =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, DataFrame]]()

  def t(s: SparkSession, dir: String, name: String): DataFrame = {
    val per = tableMemo.synchronized {
      var m = tableMemo.get(s)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
        tableMemo.put(s, m)
      }
      m
    }
    per.computeIfAbsent(s"$dir/$name", _ =>
      if (name == "events") events(s, dir)
      else s.read.parquet(s"$dir/$name.parquet"))
  }

  /** tmp-staging dir for a cached per-corpus artifact (persisted
    * dedup/ANN indexes, synthesized media): keyed by md5 of the
    * CANONICAL corpus dir plus a caller tag naming the artifact's
    * parameters/generation. A 32-bit `dir.hashCode` key (the r8 draft)
    * can collide two corpora into one staging dir, where the callers'
    * mtime guards would then serve the WRONG corpus's artifact with no
    * error. */
  /** Per-invocation temp dir, deleted on JVM exit (recursively, via a
    * shutdown hook — File.deleteOnExit is non-recursive). For query
    * artifacts that MUST be invocation-private (concurrent bench +
    * shell runs would race a shared store) but are read lazily, so
    * they can't be deleted before the caller materializes: without
    * the hook each bench/verify session leaks corpus-sized trees into
    * java.io.tmpdir forever. */
  def tempDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try {
        java.nio.file.Files.walk(p)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(f => { java.nio.file.Files.deleteIfExists(f); () })
      } catch { case _: java.io.IOException => () }))
    p.toString
  }

  /** The per-corpus staging key ([[stagingDir]]'s md5 suffix) — also
    * how Bench detects whether fixtures were already staged by a prior
    * JVM (its `prestage_hit` provenance field). */
  def stagingKey(dir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(new java.io.File(dir).getCanonicalPath.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  def stagingDir(dir: String, tag: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_${tag}_${stagingKey(dir)}"

  /** The events table's `ts` has shipped in two physical shapes across
    * driver testdata generations: ns-precision INT64 (the vectorized
    * reader rejects ns → read the epoch as long via the legacy conf,
    * then exact integer µs arithmetic — the ns epoch exceeds 2^53, so
    * float division would corrupt it) and plain µs timestamp (reads as
    * TIMESTAMP_NTZ). Normalize both to µs TimestampType; the session
    * timezone is UTC, so the NTZ cast is instant-preserving and both
    * shapes yield identical values. */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(s.read.parquet(s"$dir/events.parquet"))
  }

  /** ts-shape normalization shared by the batch and streaming readers. */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  /** Conditional round-robin respread for per-row-kernel stages (same
    * contract as Similarity.spread): the driver's test parquet has ONE
    * row group per table, so scan parallelism is 1 task no matter the
    * split config — a scan→kernel query runs single-threaded. A
    * repartition ahead of the kernel costs one small exchange at test
    * SF and is a NO-OP at scale (a real corpus's scan already has ≥
    * defaultParallelism splits), so plans at the design point are
    * unchanged. Apply only where the per-row kernel dominates the
    * query — not on plain aggregations, where the added exchange would
    * shuffle raw rows that partial aggregation would have collapsed. */
  def spread(df: DataFrame): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < want) df.repartition(want) else df
  } // Similarity.spread delegates here — ONE copy of the heuristic

  /** [[spread]] keyed by existing columns instead of round-robin. Two
    * wins over the keyless form where a suitable key exists: no
    * sortBeforeRepartition pass (round-robin locally SORTS its input
    * for retry determinism — measured ~0.6 s on the 600k-row lineitem
    * respread, the dominant cost of the exchange), and when the key is
    * the downstream grouping key the aggregation REUSES the
    * partitioning, so the whole query pays one exchange total. Key
    * choice is the caller's skew responsibility (guide §2.5): use the
    * grouping key when grouped, any high-cardinality column when
    * map-only. Same at-scale contract as [[spread]]: a well-split scan
    * makes this a no-op. */
  def spreadBy(df: DataFrame, keys: Column*): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < want) df.repartition(want, keys: _*)
    else df
  }

  /** Exact cents encoding of a double money value. */
  def cents(c: Column): Column = floor(c * 100 + lit(0.5)).cast("long")

  /** Deterministic cross-engine sum of a money column, in units. */
  def moneySum(c: Column): Column = sum(cents(c)) / 100.0

  /** SQL-side equivalent of [[moneySum]]. */
  def sqlMoneySum(x: String): String =
    s"sum(cast(floor(($x)*100 + 0.5) as bigint))/100.0"
}
