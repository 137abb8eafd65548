package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
  * arXiv:2302.03169): pick raw-corpus documents whose hashed-n-gram
  * distribution looks like a small high-quality TARGET corpus — the
  * standard pretraining-mixture curation step between dedup and
  * sampling. Beyond-the-reference training-data surface (the reference
  * engine has no data-selection stage).
  *
  * Method: hash every word n-gram into one of `k` buckets, fit smoothed
  * bag-of-buckets unigram models p (target) and q (raw), weight each raw
  * doc by log p(doc) − log q(doc) = Σ_b count_b · ln(p_b/q_b), then draw
  * the training subset WITHOUT replacement ∝ exp(weight/temperature) via
  * the Gumbel top-k trick.
  *
  * Scale design:
  *  - Both model fits collapse to ≤ k rows via map-side partial
  *    aggregation — the 100 TB corpus never shuffles, only (bucket,
  *    partial-count) pairs do. The merged count table folds on the
  *    driver (k-bounded), so totals and ratios cost nothing more.
  *  - Scoring is ONE codegen'd MAP over the raw corpus: the ratio
  *    table densifies to a long[k] reference object and the per-doc
  *    weight is the native `hashed_ngram_sum` kernel — zero shuffle.
  *  - Selection is a TakeOrdered (driver memory bounded by `topN`),
  *    not a global sort.
  *  - Everything is engine-portable arithmetic (md5 prefixes, integer
  *    micro-nat weights), so the selection replays exactly in DuckDB
  *    and reruns are byte-stable — no `rand()`, no partition-layout
  *    dependence.
  *
  * Exactness contract: per-bucket log ratios are rounded to BIGINT
  * micro-nats FIRST, so per-doc weights are integer sums — exact and
  * summation-order-independent (a float Σ would drift ~1e-13 between
  * engines/partitionings and can flip a strict hash compare; integer
  * sums cannot). The only residual cross-engine hazard is an ln() ulp
  * landing a ratio exactly on a 0.5 micro-nat rounding boundary —
  * probability ~1e-9 per bucket, k-bounded, not corpus-bounded.
  */
object Dsir {

  /** Hashed n-gram bucket id in [0, k): 16-bit md5 prefix mod k.
    * Engine-portable (DuckDB: `('0x' || substr(md5(s),1,4))::INT % k`). */
  def bucket(s: Column, k: Int): Column = {
    require(k > 0 && k <= 65536, "k must be in [1, 65536]")
    conv(substring(md5(s), 1, 4), 16, 10).cast("int") % k
  }

  /** Raw (not per-doc-distinct: DSIR models token frequency) hashed
    * n-gram occurrence counts of a corpus — at most k rows out, via
    * map-side combine. Null texts contribute nothing. */
  def bucketCounts(docs: DataFrame, textCol: String, n: Int,
      k: Int): DataFrame =
    docs
      .select(explode(graft.plans.TextExpressions
        .word_shingles(col(textCol), n)).as("s"))
      .select(bucket(col("s"), k).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))

  /** The micro-nat contract in ONE place (shared by [[logRatios]] and
    * [[logRatiosFromStats]] so the ≡-one-shot and DuckDB-replay
    * guarantees cannot drift apart): smoothed log ratio scaled 1e6,
    * ties rounded AWAY from zero (Spark round()/DuckDB semantics;
    * scala math.round would round -2.5 toward +∞). */
  private def mnatOf(tCnt: Long, rCnt: Long, tTotal: Long, rTotal: Long,
      k: Int): Long = {
    val x = 1e6 *
      (math.log((tCnt + 1).toDouble / (tTotal + k).toDouble) -
       math.log((rCnt + 1).toDouble / (rTotal + k).toDouble))
    (if (x >= 0) math.floor(x + 0.5) else math.ceil(x - 0.5)).toLong
  }

  /** Per-bucket importance log-ratio table (≤ k rows):
    * `mnat = round(1e6 · (ln p_b − ln q_b))` as BIGINT, where
    * p_b = (target_b + 1)/(T + k) and q_b = (raw_b + 1)/(R + k)
    * (add-one smoothing over the k-bucket space). DENSE: all k buckets
    * are emitted, including those observed in neither corpus — their
    * smoothed ratio is ln((R+k)/(T+k)), NOT zero, and a LATER batch
    * scored against this fit (the incremental workflow) can probe a
    * bucket the fit never saw; a sparse table would silently score such
    * buckets as neutral. Same-fit scoring never probes them, so
    * densifying changes no existing oracle. */
  def logRatios(target: DataFrame, raw: DataFrame, textCol: String,
      n: Int = 2, k: Int = 4096): DataFrame = {
    // Tag-union the two count tables instead of full-outer-joining them
    // (the naive two-agg + full-outer + two-totals shape shingled the
    // target corpus twice and the raw corpus three times), then COLLECT
    // the merged ≤k-row table and finish driver-side: each corpus is
    // scanned exactly once, totals are exact integer sums, and nothing
    // stays pinned in the cache manager (an earlier persist()-based
    // draft leaked one cached table per call — the dedupLines lesson).
    // The collect is bounded by the constant k, never by data; the
    // driver ln is the same java.lang.Math.log Spark's codegen calls,
    // so the micro-nat contract is unchanged. NOTE: this makes the
    // call EAGER (it runs the two count jobs immediately).
    val spark = target.sparkSession
    import spark.implicits._
    val tc = bucketCounts(target, textCol, n, k)
      .select(col("bucket"), col("cnt").as("t_cnt"), lit(0L).as("r_cnt"))
    val rc = bucketCounts(raw, textCol, n, k)
      .select(col("bucket"), lit(0L).as("t_cnt"), col("cnt").as("r_cnt"))
    val merged = tc.unionByName(rc).groupBy("bucket")
      .agg(sum("t_cnt").as("t_cnt"), sum("r_cnt").as("r_cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val tTotal = merged.map(_._2).sum
    val rTotal = merged.map(_._3).sum
    val obs = merged.map(t => t._1 -> ((t._2, t._3))).toMap
    (0 until k).map { bucket =>
      val (tCnt, rCnt) = obs.getOrElse(bucket, (0L, 0L))
      (bucket, mnatOf(tCnt, rCnt, tTotal, rTotal, k))
    }.toDF("bucket", "mnat")
  }

  /** [[logRatios]] when target and raw are the two sides of ONE frame
    * split by a boolean predicate (the common curation shape:
    * lang === target vs lang =!= target): a single tagged scan
    * computes both count tables, so the shared upstream subtree —
    * which for a gated/deduped corpus is itself a shuffle and a
    * window — is evaluated ONCE instead of once per side (guide
    * §1.2: don't recompute what you already read). Rows where
    * `isTarget` is NULL belong to neither corpus and are excluded,
    * exactly like the two null-rejecting filters they replace.
    * Counts are the same integer sums in the same k-bucket space, so
    * the (bucket, mnat) table is IDENTICAL to the two-scan form, not
    * merely close. Eager, like [[logRatios]]. */
  def logRatiosTagged(docs: DataFrame, isTarget: Column, textCol: String,
      n: Int = 2, k: Int = 4096): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // NO respread here: a respread was measured at sf0.1 and LOST —
    // the tagged fit is usually one of several eager passes over the
    // same subtree, and each pass re-pays the exchange (the
    // multi-pass-consumer regression pattern). The win of this form
    // is evaluating the shared upstream subtree once, not kernel
    // parallelism.
    val merged = docs
      .select(isTarget.as("__t"), col(textCol))
      .filter(col("__t").isNotNull)
      .select(col("__t"), explode(graft.plans.TextExpressions
        .word_shingles(col(textCol), n)).as("s"))
      .select(col("__t"), bucket(col("s"), k).as("bucket"))
      .groupBy("bucket")
      .agg(sum(when(col("__t"), 1L).otherwise(0L)).as("t_cnt"),
        sum(when(col("__t"), 0L).otherwise(1L)).as("r_cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val tTotal = merged.map(_._2).sum
    val rTotal = merged.map(_._3).sum
    val obs = merged.map(t => t._1 -> ((t._2, t._3))).toMap
    (0 until k).map { bucket =>
      val (tCnt, rCnt) = obs.getOrElse(bucket, (0L, 0L))
      (bucket, mnatOf(tCnt, rCnt, tTotal, rTotal, k))
    }.toDF("bucket", "mnat")
  }

  /** (idCol, w_mnat) integer importance weight per raw doc: the sum of
    * its shingles' bucket log-ratios in micro-nats, as ONE codegen'd
    * map over the corpus — the ≤k-row ratio table densifies to a long[k]
    * riding the plan as a reference object (`hashed_ngram_sum`), so
    * scoring 100 TB is a scan with ZERO shuffle (the earlier explode →
    * broadcast join → groupBy moved a row per token). Integer
    * accumulation keeps the strict-hash contract bit-exact. Docs whose
    * text is null drop (they have no n-gram mass to weigh). `ratios`
    * must come from [[logRatios]]/[[logRatiosFromStats]] with the same
    * (n, k) — those tables are DENSE over all k buckets, so a new batch
    * probing a bucket the fit never observed still gets the smoothed
    * ln((R+k)/(T+k)) ratio, not a neutral 0 (a hand-built sparse table
    * would re-introduce that bias: absent rows default to 0 here).
    * NOTE: eager — the ratio table collects here. */
  def importanceWeights(raw: DataFrame, idCol: String, textCol: String,
      ratios: DataFrame, n: Int = 2, k: Int = 4096): DataFrame = {
    val dense = new Array[Long](k)
    ratios.collect().foreach { r =>
      val b = r.getInt(0)
      require(b >= 0 && b < k, s"ratio bucket $b outside [0, $k)")
      dense(b) = r.getLong(1)
    }
    // NO respread before the kernel: measured at sf0.1 as a net loss —
    // the (id, text) exchange outweighs the scoring kernel, which is a
    // single cheap pass over each text (unlike the shingle-explode
    // paths where Q.spread wins)
    raw
      .filter(col(textCol).isNotNull)
      .select(col(idCol), graft.plans.ClassifierExprs
        .hashed_ngram_sum(col(textCol), dense.toSeq, n).as("w_mnat"))
  }

  /** Append one ingested batch's hashed-n-gram bucket counts to a
    * persisted count store (≤k rows per batch, tagged by side) — counts
    * are ADDITIVE, so the DSIR models of a growing corpus never rescan
    * old batches: each ingest appends one tiny row set and
    * [[logRatiosFromStats]] folds however many have accumulated. Same
    * incremental pattern as the dedup fingerprint index and the PCA
    * moment store. `side` must be "target" or "raw". The (n, k) shape
    * is persisted with every row so a mismatched read fails loudly
    * instead of silently changing the smoothing denominators. WARNING:
    * `overwrite = true` resets the WHOLE store — both sides, all
    * batches — not just the side being written; use it only to start a
    * store, never to refresh one side. */
  def appendBucketCounts(batch: DataFrame, textCol: String, side: String,
      path: String, n: Int = 2, k: Int = 4096,
      overwrite: Boolean = false): Unit = {
    require(side == "target" || side == "raw",
      s"side must be 'target' or 'raw', got '$side'")
    bucketCounts(batch, textCol, n, k)
      .select(lit(side).as("side"), col("bucket"), col("cnt"),
        lit(n).as("n"), lit(k).as("k"))
      .write.mode(if (overwrite) "overwrite" else "append").parquet(path)
  }

  /** [[logRatios]] from the persisted count store: reads ≤k rows per
    * appended batch (bounded by batch count × k, not corpus size),
    * folds the additive counts per side, and emits the same
    * (bucket, mnat) table a one-shot fit over the unioned corpora
    * would — integer counts fold exactly, so the result is IDENTICAL,
    * not merely close. Both sides must be present. */
  def logRatiosFromStats(spark: org.apache.spark.sql.SparkSession,
      path: String, n: Int = 2, k: Int = 4096): DataFrame = {
    import spark.implicits._
    val store = spark.read.parquet(path)
    // every stored batch must have been appended with the SAME (n, k)
    // this read assumes — a k mismatch would silently change the
    // smoothing denominators and break the ≡-one-shot contract
    val shapes = store.select("n", "k").distinct()
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    require(shapes.toSeq == Seq((n, k)),
      s"count store at $path was appended with shapes " +
        s"${shapes.mkString(",")} but read with (n=$n, k=$k)")
    val folded = store
      .groupBy("side", "bucket").agg(sum("cnt").as("cnt"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    require(folded.exists(_._1 == "target") && folded.exists(_._1 == "raw"),
      s"count store at $path needs both 'target' and 'raw' rows")
    val t = folded.filter(_._1 == "target").map(x => x._2 -> x._3).toMap
    val r = folded.filter(_._1 == "raw").map(x => x._2 -> x._3).toMap
    val tTotal = t.values.sum
    val rTotal = r.values.sum
    // dense over all k buckets, like [[logRatios]]: a future batch can
    // probe a bucket no stored batch has seen, and its smoothed ratio
    // is ln((R+k)/(T+k)), not the 0 a sparse table would imply
    (0 until k).map { bucket =>
      (bucket, mnatOf(t.getOrElse(bucket, 0L), r.getOrElse(bucket, 0L),
        tTotal, rTotal, k))
    }.toDF("bucket", "mnat")
  }

  /** Gumbel top-`topN` selection without replacement ∝
    * exp(weight / temperature): rank key = w_nats/temperature + g where
    * g = −ln(−ln(u)) and u is a seeded md5 uniform in (0,1) — rerun-
    * and engine-stable where `rand()` is neither. The key is rounded to
    * 6 dp with an id tiebreak so the top-N CUT replays cross-engine
    * despite ln ulp drift (the distinctiveTerms precedent). Returns the
    * selected (idCol, w_mnat) rows; order carries no information. */
  def select(raw: DataFrame, idCol: String, textCol: String,
      target: DataFrame, topN: Int, n: Int = 2, k: Int = 4096,
      seed: Long = 0L, temperature: Double = 1.0): DataFrame = {
    require(topN > 0, "topN must be positive")
    require(temperature > 0, "temperature must be positive")
    val ratios = logRatios(target, raw, textCol, n, k)
    gumbelTopN(importanceWeights(raw, idCol, textCol, ratios, n, k),
      idCol, topN, seed, temperature)
  }

  /** [[select]] over one predicate-split frame: fits the models with
    * the single tagged scan ([[logRatiosTagged]]) — target = rows
    * where `isTarget`, raw = rows where NOT `isTarget`, null-tag rows
    * in neither, exactly the two filters the two-frame form takes.
    * Same weights, same Gumbel keys, same selection. */
  def select(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, topN: Int, n: Int, k: Int,
      seed: Long, temperature: Double): DataFrame = {
    require(topN > 0, "topN must be positive")
    require(temperature > 0, "temperature must be positive")
    val ratios = logRatiosTagged(docs, isTarget, textCol, n, k)
    gumbelTopN(
      importanceWeights(docs.filter(!isTarget), idCol, textCol, ratios,
        n, k),
      idCol, topN, seed, temperature)
  }

  /** The shared Gumbel top-`topN` tail of both [[select]] forms (see
    * the two-frame overload for the full contract). */
  private def gumbelTopN(w: DataFrame, idCol: String, topN: Int,
      seed: Long, temperature: Double): DataFrame = {
    // null ids hash like the empty string (the Corpus.shuffleKey
    // precedent) — concat_ws alone would silently SKIP a null id and
    // hash bare ":seed", diverging from the documented DuckDB replay
    val u16 = conv(substring(
      md5(concat_ws(":", coalesce(col(idCol).cast("string"), lit("")),
        lit(seed.toString))),
      1, 4), 16, 10).cast("double")
    val u = (u16 + 0.5) / 65536.0
    val gumbel = -log(-log(u))
    val key = round(col("w_mnat").cast("double") / 1e6 / temperature + gumbel, 6)
    w.withColumn("sel_key", key)
      .orderBy(col("sel_key").desc, col(idCol))
      .limit(topN)
      .select(col(idCol), col("w_mnat"))
  }
}
