package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** A loaded fingerprint index: the key frame, its pre-built Bloom
  * sidecar (null iff the store is empty — the probe functions'
  * documented empty-index contract), and the manifest key count. */
case class LoadedFingerprintIndex(keys: DataFrame, bloom: Array[Byte],
    nKeys: Long)

/** Persisted store + Bloom-sidecar lifecycle for the single-column
  * fingerprint indexes behind the incremental dedup family —
  * [[graft.operators.Dedup.fingerprintIndex]] (`fp`, whole-document),
  * [[graft.operators.Corpus.unitIndex]] (`ufp`, paragraph units) and
  * [[graft.operators.Corpus.substringAnchorIndex]] (`afp`, k-gram
  * anchors). The probe Scaladocs promise "the sidecar a 100 TB
  * ingestion pipeline persists NEXT TO the index and refreshes on
  * append"; this is that store.
  *
  * Layout under `dir`:
  *   - `keys/`  — parquet, exactly the index's single fingerprint column
  *   - `bloom/` — parquet, one binary row: the serialized sidecar,
  *     built by RE-READING `keys/` so the filter answers for the bytes
  *     on disk, not for whatever upstream frame produced them
  *   - `params/` — (param, value) manifest: `key_col`, `n_keys`,
  *     `fpp_bp` (false-positive rate in basis points). Written LAST
  *     and deleted FIRST on append, per the torn-write contract the
  *     near-dup index stores established (`Dedup.writeIndexParams`): a
  *     crash mid-write leaves data-without-manifest — which [[load]]
  *     rejects loudly — never a fresh manifest blessing stores whose
  *     contents don't match it.
  *
  * [[append]] is the per-increment advance: union the batch's novel
  * fingerprints, distinct-compact, swap, rebuild the sidecar. Its cost
  * is one distinct-shuffle over |index|+|batch| — the same O(|index|)
  * a compaction inherently pays — so schedule appends per crawl batch,
  * not per document. */
object FingerprintIndexStore {

  def write(index: DataFrame, dir: String, fpp: Double = 0.01): Unit = {
    val keyCol = singleColumnOf(index, "write")
    index.write.mode("overwrite").parquet(s"$dir/keys")
    finishStore(index.sparkSession, dir, keyCol, fpp)
  }

  /** Load a store written by [[write]]/[[append]]. Fails loudly on a
    * missing/torn manifest or a key-column mismatch (probing a unit
    * index with anchor fingerprints would silently match nothing). */
  def load(spark: SparkSession, dir: String,
      expectedKeyCol: String): LoadedFingerprintIndex = {
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    require(fs.exists(new Path(s"$dir/params")),
      s"FingerprintIndexStore: no manifest at $dir/params — either " +
        "not a fingerprint-index store or a torn write; rebuild with " +
        "write()")
    val params = spark.read.parquet(s"$dir/params")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    require(params.get("key_col").contains(expectedKeyCol),
      s"FingerprintIndexStore: store at $dir holds " +
        s"'${params.getOrElse("key_col", "?")}' fingerprints but was " +
        s"loaded expecting '$expectedKeyCol' — mixed-up index kinds " +
        "never match and would silently keep every duplicate")
    val nKeys = params("n_keys").toLong
    val bloom =
      if (nKeys == 0L) null
      else spark.read.parquet(s"$dir/bloom")
        .head.getAs[Array[Byte]]("bf")
    LoadedFingerprintIndex(
      spark.read.parquet(s"$dir/keys"), bloom, nKeys)
  }

  /** Advance the store by a batch of fingerprints (same single column;
    * typically `unitIndex(batch)` / `substringAnchorIndex(batch)` /
    * `fingerprintIndex(batch)` output): distinct-union into `keys/`,
    * rebuild the sidecar, rewrite the manifest. The manifest is
    * deleted before any data moves, so a crash at ANY later point
    * leaves a store [[load]] rejects instead of one that silently
    * under-reports history. */
  def append(batch: DataFrame, dir: String,
      fpp: Double = 0.01): Unit = {
    val spark = batch.sparkSession
    val keyCol = singleColumnOf(batch, "append")
    val existing = load(spark, dir, keyCol)
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // invalidate first: from here to the final manifest write the
    // store is formally torn, and load() says so
    fs.delete(new Path(s"$dir/params"), true)
    // materialize the merge AWAY from keys/ (Spark cannot overwrite a
    // path it is reading), then swap
    existing.keys.unionByName(batch).distinct()
      .write.mode("overwrite").parquet(s"$dir/keys_next")
    fs.delete(new Path(s"$dir/keys"), true)
    require(fs.rename(new Path(s"$dir/keys_next"),
        new Path(s"$dir/keys")),
      s"FingerprintIndexStore: rename of $dir/keys_next failed")
    finishStore(spark, dir, keyCol, fpp)
  }

  /** The shared back half of [[write]]/[[append]]: sidecar from a
    * re-read of `keys/`, then the manifest, strictly last. */
  private def finishStore(spark: SparkSession, dir: String,
      keyCol: String, fpp: Double): Unit = {
    import spark.implicits._
    val keys = spark.read.parquet(s"$dir/keys")
    val n = keys.count()
    val bloom = graft.plans.BloomProbe
      .buildFilter(keys, col(keyCol), fpp, expectedItems = n)
    Option(bloom).toSeq.toDF("bf")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/bloom")
    Seq("key_col" -> keyCol, "n_keys" -> n.toString,
        "fpp_bp" -> math.round(fpp * 10000).toString)
      .toDF("param", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/params")
  }

  private def singleColumnOf(df: DataFrame, op: String): String = {
    require(df.columns.length == 1,
      s"FingerprintIndexStore.$op: expected a single-fingerprint-" +
        s"column frame (got ${df.columns.mkString(", ")}) — pass " +
        "fingerprintIndex/unitIndex/substringAnchorIndex output")
    df.columns.head
  }
}
