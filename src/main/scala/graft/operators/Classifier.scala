package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed bag-of-words logistic-regression text classifier — the
  * fastText-style quality filter of the GPT-3/CCNet curation lineage:
  * train on a small labeled set (curated-vs-crawl), then gate the whole
  * corpus on the predicted quality probability. Beyond-the-reference
  * training-data surface, sibling of [[Dsir]] (DSIR reweights by
  * distribution match; this learns a discriminative boundary).
  *
  * Features: unigram counts hashed into `k` buckets ([[Dsir.bucket]] —
  * the same md5 arithmetic), L1-normalized per doc (term frequency) or
  * binarized to presence, plus an implicit bias. Model: dense
  * `Array[Double]` of length k+1 — driver-resident and broadcast,
  * bounded by k, never by data.
  *
  * Scale design:
  *  - The labeled set's features materialize ONCE as slim (id, bucket,
  *    x) triples and persist; each of the `iters` full-batch steps is a
  *    kernel-scored margin map over the cached labeled set, one slim
  *    join-aggregate for the Newton statistics, and a ≤k+1-row driver
  *    collect. Nothing in the loop scales with the unlabeled corpus.
  *  - [[score]] is ONE MAP over the target corpus — the codegen'd
  *    [[graft.plans.ClassifierKernels.hashedLogit]] kernel with the
  *    weight vector riding the plan as a reference object. No explode,
  *    no shuffle, legal inside a Structured Streaming plan
  *    ([[graft.streaming.Streams.qualityGate]]).
  *  - Training is deterministic up to float partial-sum order (weights
  *    init at 0, no sampling); predicted LABELS on separable data are
  *    layout-stable, exact weight bits are not — callers persisting a
  *    model should persist the trained array, not retrain per run.
  */
object TextClassifier {

  /** (id, bucket, x) hashed feature triples: term frequency (count /
    * feature-count — fastText-style averaging) when `tf`, bucket
    * PRESENCE (x = 1) otherwise. `ngrams = 2` adds word-bigram buckets
    * to the unigram set (fastText's wordNgrams — style/collocation
    * signal a bag of words can't see); sub-2-token docs contribute no
    * bigram. Presence features give marker-word tasks crisp unit-scale
    * margins; tf keeps long docs from dominating. Duplicate features
    * collapse before leaving the map side (groupBy id+bucket). */
  def features(docs: DataFrame, idCol: String, textCol: String,
      k: Int, tf: Boolean = true, ngrams: Int = 1): DataFrame = {
    require(ngrams >= 1 && ngrams <= 2, "ngrams must be 1 or 2")
    val uni = graft.plans.TextExpressions.word_shingles(col(textCol), 1)
    val tc = graft.plans.TextExpressions.token_count(col(textCol))
    val featArr =
      if (ngrams >= 2) concat(uni,
        when(tc >= 2,
          graft.plans.TextExpressions.word_shingles(col(textCol), 2))
          .otherwise(array().cast("array<string>")))
      else uni
    // feature count derived ARITHMETICALLY from the allocation-free
    // token_count kernel (tc unigrams + tc−1 bigrams when tc ≥ 2 —
    // word_shingles' ≤n whole-text edge makes a 2-token doc's bigram
    // list exactly 1 long, so the formula holds at every tc) instead
    // of size(featArr), which would evaluate the shingle array a
    // second time alongside the explode
    val featCount =
      if (ngrams >= 2)
        (tc + when(tc >= 2, tc - 1).otherwise(lit(0))).cast("double")
      else tc.cast("double")
    docs
      .select(col(idCol).as("__id"),
        featCount.as("__n"),
        explode(featArr).as("__w"))
      .select(col("__id"), col("__n"), Dsir.bucket(col("__w"), k).as("__b"))
      .groupBy("__id", "__b")
      .agg((if (tf) count(lit(1)) / first("__n") else lit(1.0)).as("__x"))
  }

  /** Train logistic weights on (idCol, textCol, labelCol∈{0,1}) rows by
    * full-batch gradient descent. Returns length k+1 (bias last). */
  /** Persist a trained weight vector as (i, w) parquet rows at
    * `path/model` — the Scaladoc's "persist the trained array, not
    * retrain per run" made real code: training is deterministic only
    * up to float partial-sum order, so a scoring pass that must be
    * externally replayable (the strict q_quality_classifier oracle)
    * runs with the doubles read BACK from this store. */
  def writeWeights(spark: org.apache.spark.sql.SparkSession,
      weights: Array[Double], path: String): Unit = {
    import spark.implicits._
    weights.toSeq.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("i", "w")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/model")
  }

  /** Load a [[writeWeights]] store (driver-side; k+1 doubles).
    * Torn-store validation mirrors readPqCodebooks/readMerges: a
    * missing (i, w) row must fail here, not silently score with that
    * weight at 0.0 — the store is a contiguous 0..k index grid by
    * construction, so any gap or duplicate means a partial copy. */
  def readWeights(spark: org.apache.spark.sql.SparkSession,
      path: String): Array[Double] = {
    val rows = spark.read.parquet(s"$path/model")
      .select(col("i"), col("w")).collect()
    require(rows.nonEmpty, s"readWeights: empty model at $path")
    val maxI = rows.iterator.map(_.getLong(0)).max.toInt
    require(rows.length == maxI + 1 &&
        rows.iterator.map(_.getLong(0)).toSet.size == rows.length,
      s"readWeights: ${rows.length} rows at $path but max index $maxI " +
        "— gaps or duplicates in the weight grid (torn store?)")
    val out = new Array[Double](maxI + 1)
    rows.foreach(r => out(r.getLong(0).toInt) = r.getDouble(1))
    out
  }

  def train(labeled: DataFrame, idCol: String, textCol: String,
      labelCol: String, k: Int = 1024, iters: Int = 30,
      lr: Double = 1.0, l2: Double = 0.0,
      tf: Boolean = true, ngrams: Int = 1): Array[Double] = {
    require(k > 0 && k <= 65536, "k must be in [1, 65536]")
    require(iters > 0 && lr > 0 && l2 >= 0, "bad hyperparameters")
    val spark = labeled.sparkSession
    import spark.implicits._
    // text rides the cached labeled set so per-iteration margins are a
    // pure map over it (the hashed_logit kernel) instead of a broadcast
    // join over the triples — labeled sets are bounded, so is the cache
    val labels = labeled
      .select(col(idCol).as("__id"), col(textCol).as("__t"),
        col(labelCol).cast("double").as("__y"))
      .persist()
    // bias folded in as sentinel bucket k with x = 1.0 for every doc:
    // gradients then cover it in the SAME aggregate, and no-token docs
    // still train the bias
    val feats = features(labeled, idCol, textCol, k, tf, ngrams)
      .unionByName(labels.select(col("__id"), lit(k).as("__b"),
        lit(1.0).as("__x")))
      .persist()
    val n = labels.count().toDouble
    require(n > 0, "empty labeled set")
    // enforce the documented {0,1} label domain up front: a null label
    // would null the residual while leaving curvature non-null — an
    // NPE in the stats collect at best, a silently damped fit at worst
    val badLabels = labels
      .filter(col("__y").isNull || (col("__y") =!= 0.0 && col("__y") =!= 1.0))
      .count()
    require(badLabels == 0,
      s"$badLabels rows have labels outside {0,1} (or null)")
    val w = new Array[Double](k + 1)
    try {
      for (_ <- 0 until iters) {
        // per-doc residual r = σ(m) − y and curvature s = σ(m)(1 − σ(m));
        // the margin is the native hashed_logit kernel over the cached
        // text — a pure map, no join, no shuffle. A null text has no
        // kernel margin but DOES carry the sentinel bias feature, so it
        // scores at the bare bias, same as its triples would give.
        val margin = coalesce(
          graft.plans.ClassifierExprs.hashed_logit(col("__t"), w.toSeq, tf,
            ngrams),
          lit(w(k)))
        val resid = labels
          .select(col("__id"),
            (lit(1.0) / (lit(1.0) + exp(-margin))).as("__p"),
            col("__y"))
          .select(col("__id"), (col("__p") - col("__y")).as("__r"),
            (col("__p") * (lit(1.0) - col("__p"))).as("__s"))
        // Per-bucket Newton statistics in ONE aggregate (≤k+1 rows
        // collected): gradient g = Σxr, bias coupling c = Σxs (the
        // sentinel has x = 1), curvature d = Σx²s. Text features
        // co-occur almost completely — every doc shares the common
        // vocabulary — so plain grad steps zig-zag along the shared
        // direction and plain Jacobi-Newton overshoots it (both
        // measured at chance accuracy on a 40-word-pool corpus). The
        // dominant shared direction IS the bias, so solve the
        // ARROWHEAD system (diagonal + bias row/column) exactly in
        // O(k) via the Schur complement on the bias coordinate.
        val stats = feats.join(resid, Seq("__id"))
          .groupBy("__b").agg(
            sum(col("__x") * col("__r")).as("__g"),
            sum(col("__x") * col("__s")).as("__c"),
            sum(col("__x") * col("__x") * col("__s")).as("__d"))
          .collect()
          .map(r => r.getInt(0) -> ((r.getDouble(1), r.getDouble(2),
            r.getDouble(3)))).toMap
        val ridge = 1e-3 * n
        def dOf(b: Int) =
          stats.get(b).map(_._3).getOrElse(0.0) + ridge
        val (gBias, _, dBias) = stats.getOrElse(k, (0.0, 0.0, 0.0))
        var schurNum = gBias
        var schurDen = dBias + ridge
        for ((b, (g, c, _)) <- stats if b != k) {
          schurNum -= c * g / dOf(b)
          schurDen -= c * c / dOf(b)
        }
        val dBiasStep = if (schurDen > 1e-12) schurNum / schurDen else 0.0
        // trust region: near separation the logistic curvature s → 0
        // and raw Newton steps explode (measured: a −219 bias step on
        // iteration 2) — clamp each coordinate to ±1 per iteration,
        // the standard IRLS stabilization
        def clamp(s: Double) = math.max(-1.0, math.min(1.0, s))
        var b = 0
        while (b <= k) {
          val step =
            if (b == k) dBiasStep
            else {
              val (g, c, _) = stats.getOrElse(b, (0.0, 0.0, 0.0))
              (g - c * dBiasStep) / dOf(b)
            }
          // standard practice: the bias is not regularized
          val reg = if (b < k) l2 * w(b) else 0.0
          w(b) -= lr * clamp(step) + lr * reg
          b += 1
        }
      }
    } finally { feats.unpersist(); labels.unpersist() }
    w
  }

  /** Predicted quality probability per doc as a PURE MAP — one corpus
    * scan through the codegen'd hashed_logit kernel, zero shuffle (an
    * earlier draft explode+joined+grouped, which is a streaming-illegal
    * aggregation and a per-doc shuffle the kernel makes unnecessary).
    * Returns every (idCol, score) row; null text → null score. */
  def score(docs: DataFrame, idCol: String, textCol: String,
      weights: Array[Double], k: Int = 1024,
      tf: Boolean = true, ngrams: Int = 1): DataFrame = {
    require(k > 0 && k <= 65536, "k must be in [1, 65536]")
    require(weights.length == k + 1,
      s"weights must be k+1=${k + 1} long, got ${weights.length}")
    docs.select(col(idCol),
      (lit(1.0) / (lit(1.0) + exp(-graft.plans.ClassifierExprs
        .hashed_logit(col(textCol), weights.toSeq, tf, ngrams))))
        .as("score"))
  }

  /** Keep-gate: rows of `docs` whose predicted quality ≥ threshold.
    * All original columns survive. Scores with the same codegen'd
    * hashed_logit kernel as `score` but applies it as a direct filter —
    * one FileScan, no Exchange, no self-join (the earlier left-semi form
    * scanned docs twice and, under duplicate idCol values, kept every
    * row sharing a passing id). Streaming-legal: `Streams.qualityGate`
    * uses the same shape. Rows with null text evaluate to a null
    * predicate and are DROPPED at any threshold — filter them out (or
    * default them) upstream if they must survive. */
  def gate(docs: DataFrame, idCol: String, textCol: String,
      weights: Array[Double], k: Int = 1024,
      threshold: Double = 0.5, tf: Boolean = true,
      ngrams: Int = 1): DataFrame = {
    require(k > 0 && k <= 65536, "k must be in [1, 65536]")
    require(weights.length == k + 1,
      s"weights must be k+1=${k + 1} long, got ${weights.length}")
    docs.filter(
      (lit(1.0) / (lit(1.0) + exp(-graft.plans.ClassifierExprs
        .hashed_logit(col(textCol), weights.toSeq, tf, ngrams))))
        >= threshold)
  }
}
