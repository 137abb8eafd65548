package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Deduplication operators for training-data pipelines, designed for the
  * 100 TB regime:
  *
  *  - exact:      one hash-shuffle on a 64-bit fingerprint (not the text!)
  *                → min-id per group. Shuffle carries (hash, id) pairs only.
  *  - minhash+LSH: shingles → k minhashes → b bands; self-join happens on
  *                the *band signature* (tiny key), never on document pairs,
  *                so candidate generation is an equi-shuffle, not O(n²).
  *  - simhash:    64-bit weighted-projection hash; near-dups = equal
  *                rotated prefixes (block technique) — again equi-joinable.
  *  - n-gram Jaccard: exact verification on LSH candidates only.
  *
  * All stages are pure Column ops (portable, codegen'd); hashes use Spark's
  * built-in xxhash64 (seeded, deterministic across the cluster).
  */
object Dedup {

  /** Conditional fan-out before a CPU-bound per-row kernel (sha-256,
    * minhash, shingling). Kernel parallelism is otherwise capped by input
    * split count — a single-row-group parquet file scans as ONE partition
    * no matter how many cores the cluster has — so an under-split input
    * gets one round-robin respread ahead of the kernel. Delegates to
    * [[graft.Q.spread]]: when the scan already has ≥ defaultParallelism
    * splits (the 100 TB case — maxPartitionBytes bounds every split, so
    * partitions are byte-even and kernel cost ∝ bytes is balanced
    * without help) this is a NO-OP, and the pruned (id, text) projection
    * never crosses an exchange before the kernel stage. */
  def fanOut(df: DataFrame): DataFrame = graft.Q.spread(df)

  /** Exact dedup: keep the lowest `idCol` per normalized-text fingerprint.
    * The fanOut respreads the pruned (id, text) projection ONLY when the
    * scan is under-split (test parquet; a well-split 100 TB layout skips
    * it); the groupBy then shuffles only (fingerprint, id) pairs — at
    * scale the text never crosses an exchange at all. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    fanOut(df.select(col(idCol), col(textCol)))
      .select(col(idCol), Text.fingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
  }

  /** Base 64-bit hash per shingle/token (interpreted higher-order form;
    * the hot paths below use the native kernels in graft.plans instead). */
  def tokenHashes(tokens: Column): Column =
    transform(tokens, t => xxhash64(t))

  /** MinHash signature via the native single-pass codegen kernel
    * ([[graft.plans.MinHashSigExpr]]). Returns ArrayType(LongType), len k. */
  def minhashSignature(shingles: Column, k: Int): Column =
    graft.plans.HashExpressions.minhash_sig(shingles, k)

  /** The default MinHash signature config — shared by [[minhashBands]]
    * and [[verifiedPairs]]' estimate prefilter so the estimate always
    * runs in the SAME (shingleLen, k) space as the bands that produced
    * the candidates. */
  private val DefaultShingleLen = 5
  private val DefaultK = 20

  /** LSH banding: split a k-length signature into `bands` bands of
    * k/bands rows each; one output row per (docId, bandIdx, bandHash).
    * Near-dup candidates are rows sharing (bandIdx, bandHash): a groupBy
    * on a small key, NOT a cross join. */
  def minhashBands(df: DataFrame, textCol: String, idCol: String,
      shingleLen: Int = DefaultShingleLen, k: Int = DefaultK,
      bands: Int = 5): DataFrame = {
    // bands must tile the signature exactly: bands > k gives 0-row
    // bands whose key is identical for EVERY doc (all buckets blow the
    // cap → zero candidates, silently); a non-dividing bands quietly
    // ignores the signature tail. Same stance as simhashNearDups'
    // require(60 % bands == 0).
    require(bands >= 1 && k % bands == 0,
      s"bands ($bands) must divide the signature length k ($k)")
    val rowsPerBand = k / bands
    fanOut(df.select(col(idCol), col(textCol)))
      .select(col(idCol),
        graft.plans.HashExpressions.minhash_text(col(textCol), shingleLen, k)
          .as("sig"))
      .select(col(idCol), posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(concat_ws("_",
            slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))), b)))
        .as(Seq("band", "band_hash")))
  }

  /** Candidate near-dup pairs from LSH bands (id1 < id2). The self-join is
    * on (band, band_hash) — an equi-shuffle whose fan-out is bounded by
    * bucket size, so it survives 1000 executors; a skew guard drops
    * degenerate buckets (>maxBucket docs, e.g. empty/boilerplate text).
    *
    * Saturation telemetry: on a low-char-diversity (templated) corpus
    * the banding degrades SILENTLY in two directions at once — buckets
    * past `maxBucket` drop wholesale (recall collapses toward zero) and
    * buckets just under it each fan out n² pairs (the ndunits drill
    * measured 30× shuffle at 10× data on a shared-template vocabulary).
    * Every call therefore rides a [[org.apache.spark.sql.Dataset.observe]]
    * on the bucket-count frame — the stats compute inside the SAME
    * aggregation exchange, zero extra passes — and a once-per-session
    * QueryExecutionListener WARN-logs any run whose saturated-bucket
    * fraction exceeds [[LshSaturationWarnFrac]], naming the remedies
    * ([[exactCandidates]] / raise shingleLen). One caveat, verified
    * empirically: when saturation is TOTAL (zero surviving candidates)
    * AQE's empty-relation propagation replaces the executed subtree —
    * metrics node included — so the passive warning cannot fire; the
    * eager [[requireHealthyLshBuckets]] preflight is the tool for
    * pipelines that must fail fast rather than read logs. */
  def minhashCandidates(bandsDf: DataFrame, idCol: String,
      maxBucket: Int = 1000): DataFrame =
    keptBuckets(bandsDf, idCol, maxBucket)
      .select(explode(
        graft.plans.HashExpressions.pair_combos(col("ids"))).as("pair"))
      .select(col("pair.id1"), col("pair.id2")).distinct()

  /** The shared kept-bucket aggregation: one (band, band_hash) groupBy
    * with the saturation observe, filtered to 2..maxBucket members. */
  private def keptBuckets(bandsDf: DataFrame, idCol: String,
      maxBucket: Int): DataFrame = {
    registerLshTelemetry(bandsDf.sparkSession)
    val counted0 = bandsDf.groupBy("band", "band_hash")
      .agg(collect_list(col(idCol)).as("ids"), count(lit(1)).as("n"))
    val statExprs = Seq(
      count(lit(1)).as("buckets"),
      sum(when(col("n") > maxBucket, 1L).otherwise(0L))
        .as("saturated_buckets"),
      max(col("n")).as("max_bucket"),
      sum(when(col("n").between(2, maxBucket),
        (col("n") * (col("n") - 1) / 2).cast("long")).otherwise(0L))
        .as("candidate_pairs"),
      max(lit(maxBucket.toLong)).as("bucket_cap"))
    counted0.observe(
        s"$LshObservePrefix${lshObsId.incrementAndGet()}",
        statExprs.head, statExprs.tail: _*)
      .filter(col("n").between(2, maxBucket))
  }

  /** [[minhashCandidates]] plus the distinct member ids of every kept
    * bucket, BOTH derived from the one bucket aggregation. The id set
    * covers every id appearing in the pair list (a kept bucket holds
    * ≥2 distinct ids — one row per (id, band) by construction — so
    * each member lands in some pair); callers that only need "which
    * docs participate in any candidate pair" (the verification
    * corpus prune) read the second frame and skip re-running the
    * quadratic pair expansion + pair-level distinct that deriving
    * ids FROM the pairs would cost. The two returned frames share the
    * same `counted` subtree object, so the bucket exchange is built
    * once and reused. */
  def minhashCandidatesAndIds(bandsDf: DataFrame, idCol: String,
      maxBucket: Int = 1000): (DataFrame, DataFrame) = {
    // ONE exchange (the bucket groupBy); degenerate buckets are dropped
    // before any pair is formed; the quadratic within-bucket fan-out is
    // the native [[graft.plans.PairCombosExpr]] kernel — one plain-JVM
    // loop per BUCKET. (The composable nested transform(ids×ids) form
    // evaluated interpreted per emitted pair and dominated this stage;
    // an equi-self-join shape was codegen'd but re-shuffled and
    // re-sorted the band rows.)
    //
    // FUSED single-reader shape (r17): the r16 form derived pairs and
    // member ids as two readers of the shared bucket subtree — the
    // bucket EXCHANGE was reused, but everything above it (the final
    // collect_list aggregation deserializing the id blobs, ~1.3 s
    // taskSum per purge query at sf0.1) ran once PER READER. Here one
    // pair_combos_with_members Generate emits member singles (id,
    // null) ahead of the pairs, the (id1, id2) distinct puts an
    // exchange ABOVE the expensive subtree, and both returned frames
    // read that exchange — ReuseExchange shares the whole bucket
    // aggregation + expansion. The member/pair split filters ride on a
    // StageBarrier'd id2 so PushPredicateThroughNonJoin cannot push
    // them below the distinct (pushed copies would specialize the two
    // exchange subtrees and break the reuse). Member singles add
    // O(members) rows to a shuffle of O(pairs) — noise at every scale.
    val fused = keptBuckets(bandsDf, idCol, maxBucket)
      .select(explode(graft.plans.HashExpressions
        .pair_combos_with_members(col("ids"))).as("pair"))
      .select(col("pair.id1"), col("pair.id2"))
      .distinct()
    val marker = graft.plans.StageBarrier.stage(col("id2"))
    val pairs = fused.filter(marker.isNotNull)
    val memberIds = fused.filter(marker.isNull)
      .select(col("id1").as(idCol))
    (pairs, memberIds)
  }

  /** Metric-name prefix for the LSH bucket-health observation a
    * [[minhashCandidates]] call plants (suffixed with a per-JVM counter
    * so two candidate stages inside one query never collide). */
  val LshObservePrefix = "graft_lsh_buckets_"

  /** Saturated-bucket fraction past which the session listener logs the
    * degradation warning. 5%: a healthy natural-text corpus saturates a
    * handful of boilerplate buckets; a templated corpus saturates most
    * of them. */
  val LshSaturationWarnFrac = 0.05

  private val lshObsId = new java.util.concurrent.atomic.AtomicLong()
  // observe names already WARN-logged (names embed a monotonic per-JVM
  // counter, so the set only ever holds one entry per saturated
  // minhashCandidates CALL — process-lifetime growth is bounded by
  // the number of distinct saturated runs, bytes each)
  private val lshWarnedObserves =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  // weak keys: sessions must be compared by IDENTITY (never a hash a
  // later session could reuse after GC) and must not be pinned in
  // memory by their own telemetry bookkeeping
  private val lshTelemetrySessions =
    java.util.Collections.newSetFromMap(
      java.util.Collections.synchronizedMap(
        new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
          java.lang.Boolean]()))
  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Bucket-health snapshot of one [[minhashCandidates]] run. */
  case class LshBucketStats(buckets: Long, saturatedBuckets: Long,
      maxBucket: Long, candidatePairs: Long, bucketCap: Long) {
    def saturatedFrac: Double =
      if (buckets == 0) 0.0 else saturatedBuckets.toDouble / buckets
  }

  private[operators] def lshSaturationMessage(s: LshBucketStats): String =
    f"LSH banding degraded: ${s.saturatedBuckets} of ${s.buckets} " +
      f"buckets (${100.0 * s.saturatedFrac}%.1f%%) exceed the " +
      s"${s.bucketCap}-doc cap (largest: ${s.maxBucket} docs) and " +
      "were DROPPED — " +
      "recall collapses and near-cap buckets fan out quadratically. " +
      "This is the low-char-diversity/templated-corpus shape: switch " +
      "to Dedup.exactCandidates (zero false negatives, cost " +
      "Σ(bucket²) over shingle buckets) or raise shingleLen to " +
      "restore shingle diversity; lowering maxBucket only hides more " +
      "of the corpus."

  /** One-time-per-session listener: reads the bucket-health metrics
    * every [[minhashCandidates]] run observes and WARN-logs saturated
    * runs with the remediation message — so a 100 TB job degrades
    * loudly in the driver log instead of silently returning a
    * near-empty candidate set. */
  private def registerLshTelemetry(
      spark: org.apache.spark.sql.SparkSession): Unit =
    // the weak identity set, not identityHashCode strings: a new
    // session can reuse a GC'd session's identity hash, which would
    // silently skip the registration — and a string key would pin an
    // entry per dead session forever
    if (lshTelemetrySessions.add(spark)) {
      spark.listenerManager.register(
        new org.apache.spark.sql.util.QueryExecutionListener {
          override def onSuccess(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              durationNs: Long): Unit =
            // the bridge walk, not qe.observedMetrics: the latter is
            // empty whenever AQE wraps the plan (see bridge Scaladoc)
            org.apache.spark.sql.graft.bridge
              .observedMetrics(qe.executedPlan)
              .foreach { case (name, row) =>
              if (name.startsWith(LshObservePrefix) &&
                  row.getAs[Long]("buckets") > 0) {
                val s = LshBucketStats(row.getAs[Long]("buckets"),
                  row.getAs[Long]("saturated_buckets"),
                  row.getAs[Long]("max_bucket"),
                  row.getAs[Long]("candidate_pairs"),
                  row.getAs[Long]("bucket_cap"))
                // once per observe (names are per-call unique): a
                // PERSISTED candidate subtree re-surfaces its metrics
                // on every action that scans the cache — e.g. each
                // connectedComponents iteration — and one saturated
                // run must warn once, not once per downstream job
                if (s.saturatedFrac > LshSaturationWarnFrac &&
                    lshWarnedObserves.add(name))
                  log.warn(lshSaturationMessage(s))
              }
            }
          override def onFailure(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              exception: Exception): Unit = ()
        })
    }

  /** Eager bucket-health probe over a banded frame: one job (the
    * band-rows scan plus a tiny partial-aggregated exchange of
    * per-bucket counts — no id lists collect, no pairs form). The
    * preflight shape on purpose: it prices the corpus scan ONCE to
    * decide whether the quadratic pair stage is safe to pay at all,
    * and bails before it. Persist `bandsDf` when the candidate stage
    * will reuse it. */
  def lshBucketHealth(bandsDf: DataFrame,
      maxBucket: Int = 1000): LshBucketStats = {
    val r = bandsDf.groupBy("band", "band_hash")
      .agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("buckets"),
        sum(when(col("n") > maxBucket, 1L).otherwise(0L))
          .as("saturated_buckets"),
        max(col("n")).as("max_bucket"),
        sum(when(col("n").between(2, maxBucket),
          (col("n") * (col("n") - 1) / 2).cast("long")).otherwise(0L))
          .as("candidate_pairs"))
      .head()
    if (r.isNullAt(0) || r.getLong(0) == 0L)
      LshBucketStats(0L, 0L, 0L, 0L, maxBucket.toLong)
    else LshBucketStats(r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), maxBucket.toLong)
  }

  /** Fail-fast preflight over [[lshBucketHealth]]: throws
    * IllegalStateException with the remediation message when the
    * saturated-bucket fraction exceeds `maxSaturatedFrac` — the strict
    * form of the listener's warning, for pipelines where a
    * silently-degraded candidate set is worse than an aborted run.
    * Unlike the passive telemetry this also catches TOTAL saturation
    * (where AQE's empty-result collapse erases the observed metrics —
    * see [[minhashCandidates]]). Returns the stats when healthy so
    * callers can record them. */
  def requireHealthyLshBuckets(bandsDf: DataFrame,
      maxBucket: Int = 1000,
      maxSaturatedFrac: Double = LshSaturationWarnFrac): LshBucketStats = {
    val s = lshBucketHealth(bandsDf, maxBucket)
    if (s.buckets > 0 && s.saturatedFrac > maxSaturatedFrac)
      throw new IllegalStateException(lshSaturationMessage(s))
    s
  }

  /** Full near-dup pipeline: LSH banding → candidate pairs → exact
    * word-n-gram Jaccard ≥ `threshold` (rounded to 3 decimals, matching
    * the oracle encoding). Verification cost scales with |candidates|,
    * not |corpus|: the corpus is semi-joined down to ids appearing in
    * some candidate pair BEFORE shingling; shingle sets are sorted
    * distinct 64-bit hashes so per-pair exact Jaccard is a linear merge
    * (native kernel, size-guarded by the JaccardLengthPruning rule).
    *
    * `broadcastSurvivors` broadcasts the shingled survivor set to both
    * pair sides — both joins reference the SAME exchange subtree, so
    * ReuseExchange builds it once. Right when survivors are small (the
    * verification-gate scale); leave false on dup-heavy corpora where
    * the survivor set is a large fraction of the corpus (ScaleStress)
    * and a shuffle join is the safe plan. */
  def verifiedPairs(df: DataFrame, textCol: String, idCol: String,
      threshold: Double = 0.4, shingleWords: Int = 3,
      broadcastSurvivors: Boolean = true,
      estimatePrefilter: Option[Double] = None): DataFrame = {
    val (cands0, bucketIds) =
      minhashCandidatesAndIds(minhashBands(df, textCol, idCol), idCol)
    // Optional signature-level prefilter: drop candidate pairs whose
    // MinHash Jaccard ESTIMATE is below `minEst` before any shingle
    // array is attached (signatures are 160 B/doc vs KBs of shingles).
    // minEst must sit well below `threshold` (estimate std ≈
    // sqrt(J(1-J)/k) ≈ 0.11 at k=20) — this is a recall/IO tradeoff for
    // low-dup corpora, NOT valid for exact-oracle paths.
    val cands = estimatePrefilter match {
      case Some(minEst) =>
        val sigs = fanOut(df.select(col(idCol), col(textCol)))
          .select(col(idCol).as("__pid"),
            graft.plans.HashExpressions
              .minhash_text(col(textCol), DefaultShingleLen, DefaultK)
              .as("__psig"))
        cands0
          .join(sigs.select(col("__pid").as("id1"), col("__psig").as("__sig1")),
            "id1")
          .join(sigs.select(col("__pid").as("id2"), col("__psig").as("__sig2")),
            "id2")
          .filter(minhashJaccardEstimate(col("__sig1"), col("__sig2"))
            >= minEst)
          .select(col("id1"), col("id2"))
      case None => cands0
    }
    // bucketIds is a (possibly proper, after the prefilter) SUPERSET of
    // the ids in `cands` — supersets only widen the shingle prune,
    // never the result (pairs attach by id equi-join)
    verifyCandidates(df, cands, textCol, idCol, threshold,
      shingleWords, broadcastSurvivors, Some(bucketIds))
  }

  /** EXACT candidate pairs: every id pair sharing at least one word-
    * `shingleWords`-gram — a zero-false-negative generator (any pair
    * with Jaccard > 0 shares a shingle), where LSH banding is
    * probabilistic (recall ~12% at J=0.4 with the default 5×4 bands —
    * fine for the high-J near-dup mass, wrong when the caller needs
    * brute-force-equivalent TOTALITY, e.g. an exact-oracle path or a
    * recall-critical decontamination pass). Same one-exchange bucket
    * shape as [[minhashCandidates]], keyed by the shingle hash itself;
    * cost is Σ(bucket²) over shingle buckets — quadratic in docs-per-
    * SHINGLE, so this is the moderate-scale/verification tool, not the
    * 100 TB default ([[verifiedPairs]] is). Uncapped by default: a cap
    * would silently reintroduce the false negatives this exists to
    * remove — pass `maxBucket` only when a boilerplate shingle's
    * bucket blows up AND approximate recall is acceptable. */
  def exactCandidates(df: DataFrame, textCol: String, idCol: String,
      shingleWords: Int = 3,
      maxBucket: Int = Int.MaxValue): DataFrame =
    minhashCandidates(exactShingleBands(df, textCol, idCol, shingleWords),
      idCol, maxBucket)

  /** The shared-shingle band frame behind [[exactCandidates]] (one
    * bucket per distinct shingle hash, band fixed at 0). */
  private def exactShingleBands(df: DataFrame, textCol: String,
      idCol: String, shingleWords: Int): DataFrame =
    fanOut(df.select(col(idCol), col(textCol)))
      .select(col(idCol), explode(graft.plans.HashExpressions
        .word_shingle_hashes(col(textCol), shingleWords))
        .as("band_hash"))
      .withColumn("band", lit(0))

  /** Cross-document overlap pairs from winnowing fingerprints
    * (Schleimer et al.'s actual use — plagiarism/near-copy detection
    * at SUBSTRING granularity, where MinHash measures set resemblance
    * and misses a long verbatim run pasted into an otherwise-different
    * page): each doc yields its
    * [[graft.plans.TextExpressions.winnow_fingerprints]] picks (one
    * map-only kernel scan, distinct per doc by construction), hot
    * fingerprints past `maxBucket` drop as boilerplate (the
    * minhashCandidates cap convention — a pick shared by everything
    * identifies nothing), and the fingerprint equi-join + pair count
    * is the established one-exchange bucket shape: cost Σ(bucket²)
    * over CAPPED buckets. `minShared` floors the report to real
    * overlap — with the winnow guarantee, a shared run of ≥ w+k−1
    * codepoints plants at least one common pick, and longer runs
    * plant proportionally more. Output (id1, id2, n_shared), id1<id2,
    * deterministic in the corpus alone.
    *
    * Scan discipline: at corpus scale the dominant cost is reading the
    * text and running the O(n) rolling-hash kernel, so BOTH must
    * happen exactly once. The r16 shape got there with two
    * GraftCaches persists (raw fingerprints + the capped `eligible`
    * frame the self-join read from both legs); r17 removes the
    * self-join and the persists outright by reusing the LSH bucket
    * shape: ONE fingerprint groupBy collects each bucket's member ids
    * (per-doc-distinct by the winnow kernel's construction, so ids
    * within a bucket are distinct), the cap filters on the bucket
    * count, [[graft.plans.PairCombosExpr]] fans out the within-bucket
    * pairs, and the (id1, id2) count IS n_shared — one corpus scan,
    * one kernel run, two exchanges, nothing persisted (the honest
    * bench contract showed the persist fills dominating every run:
    * 2.0 s walls on 6.8 s task sums at sf0.1). */
  def winnowOverlapPairs(df: DataFrame, textCol: String, idCol: String,
      w: Int = 24, k: Int = 4, minShared: Long = 4,
      maxBucket: Long = 64): DataFrame = {
    import graft.plans.TextExpressions.winnow_fingerprints
    val fps = df.select(col(idCol).as("__id"),
      explode(winnow_fingerprints(col(textCol), w, k)).as("fp"))
    fps.groupBy("fp")
      .agg(collect_list(col("__id")).as("ids"), count(lit(1)).as("__c"))
      .filter(col("__c") <= maxBucket)
      .select(explode(
        graft.plans.HashExpressions.pair_combos(col("ids"))).as("pair"))
      .groupBy(col("pair.id1").as("id1"), col("pair.id2").as("id2"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** The remove step over [[winnowOverlapPairs]]: cluster the overlap
    * graph (distributed min-label components, same machinery as every
    * other purge) and keep each component's representative — the purge
    * for substring-grade near-copies, where [[removeNearDups]] purges
    * by whole-set resemblance. */
  def removeWinnowOverlaps(df: DataFrame, textCol: String,
      idCol: String, w: Int = 24, k: Int = 4, minShared: Long = 4,
      maxBucket: Long = 64): DataFrame =
    dropNonRepresentatives(df, idCol,
      winnowOverlapPairs(df, textCol, idCol, w, k, minShared, maxBucket))

  /** [[verifiedPairs]] over [[exactCandidates]] — brute-force-
    * equivalent verified pairs (modulo 64-bit shingle-hash
    * collisions), deterministic in the corpus alone. */
  def verifiedPairsExact(df: DataFrame, textCol: String, idCol: String,
      threshold: Double = 0.4, shingleWords: Int = 3,
      broadcastSurvivors: Boolean = true): DataFrame = {
    val (cands, bucketIds) = minhashCandidatesAndIds(
      exactShingleBands(df, textCol, idCol, shingleWords), idCol,
      Int.MaxValue)
    verifyCandidates(df, cands, textCol, idCol, threshold,
      shingleWords, broadcastSurvivors, Some(bucketIds))
  }

  /** Shared verification tail: exact word-n-gram Jaccard over a
    * candidate pair set (see [[verifiedPairs]] for the cost shape). */
  private def verifyCandidates(df: DataFrame, cands: DataFrame,
      textCol: String, idCol: String, threshold: Double,
      shingleWords: Int, broadcastSurvivors: Boolean,
      candIds0: Option[DataFrame] = None): DataFrame = {
    // Without `candIds0` the candidate list forks here — once into
    // the survivor-id semi join, once into the verify join — and the
    // two copies prune to different columns, so the quadratic
    // expansion subtree appears twice in the final plan (two
    // ~1.3 s-taskSum stages per purge query at sf0.1). A persist()
    // was A/B-measured and LOST 30-70% on every family query (the
    // fork is inside ONE job, where concurrent stages each compute
    // the still-unfilled cache partitions anyway and pay the
    // serialization on top); the structural fix is `candIds0` from
    // [[minhashCandidatesAndIds]] — kept-bucket member ids, derived
    // BEFORE the expansion. A superset of the pair ids is fine: the
    // id set only prunes the shingle corpus, pairs attach by
    // equi-join.
    val candsP = cands
    val candIds = candIds0.getOrElse(candsP
      .select(explode(array(col("id1"), col("id2"))).as(idCol))
      .distinct())
    val shingled0 = df.join(candIds, Seq(idCol), "left_semi")
      .select(col(idCol).as("__sid"),
        graft.plans.HashExpressions
          .word_shingle_hashes(col(textCol), shingleWords).as("__sh"))
    val shingled =
      if (broadcastSurvivors) broadcast(shingled0) else shingled0
    candsP
      .join(shingled.as("s1"), col("id1") === col("s1.__sid"))
      .join(shingled.as("s2"), col("id2") === col("s2.__sid"))
      .withColumn("jaccard", round(
        graft.plans.HashExpressions
          .sorted_jaccard(col("s1.__sh"), col("s2.__sh")), 3))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  /** Distinct exact-dedup fingerprint index of a corpus — the stored
    * half of incremental dedup. One column of sha-256 fingerprints, one
    * distinct-shuffle of (fp) — the text never leaves its scan. At
    * 100 TB this is materialized ONCE (write the result as the dedup
    * index table) and reused by every arriving batch; rebuilding it per
    * batch would rescan the corpus. */
  def fingerprintIndex(corpus: DataFrame, textCol: String): DataFrame =
    fanOut(corpus.select(col(textCol)))
      .select(Text.fingerprint(col(textCol)).as("fp"))
      .distinct()

  /** Incremental exact dedup: the rows of `batch` that are (a) the
    * first (min-`idCol`) occurrence of their fingerprint WITHIN the
    * batch and (b) absent from the corpus `index`
    * ([[fingerprintIndex]] output or the persisted table of one). All
    * batch columns survive. The within-batch winner is a window over
    * the fingerprint (batch-sized, not corpus-sized); the corpus check
    * is a left-anti equi-join on the fingerprint — both shuffle 32-byte
    * digests, never text. This is the arriving-crawl-slice shape: the
    * corpus is represented only by its index, so per-batch cost is
    * |batch| + |index| regardless of corpus width. */
  def dedupAgainstIndex(batch: DataFrame, index: DataFrame,
      textCol: String, idCol: String): DataFrame =
    firstInBatch(batch, textCol, idCol)
      .join(index.select(col("fp").as("__fp")), Seq("__fp"), "left_anti")
      .drop("__fp")

  /** The within-batch half of [[dedupAgainstIndex]]: first (min-`idCol`)
    * occurrence per fingerprint, the `__fp` column still attached. */
  private def firstInBatch(batch: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    fanOut(batch).withColumn("__fp", Text.fingerprint(col(textCol)))
      .withColumn("__rn", row_number().over(
        Window.partitionBy("__fp").orderBy(col(idCol))))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Distributed Bloom sketch over a [[fingerprintIndex]]'s `fp` column
    * — the sidecar a 100 TB ingestion pipeline persists NEXT TO the
    * index (and refreshes on append) so arriving batches can skip the
    * index join for rows the corpus has never seen. Two scans of the
    * index's fp column by default (sizing count + aggregate) — pass
    * `expectedItems` from the index manifest to make it one. Returns
    * null on an empty index ([[dedupAgainstIndexBloom]] handles it).
    * Past ~4M fingerprints raise Spark's
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems`/`maxNumBits`
    * together; past the caps fpp degrades gracefully, never results. */
  def indexBloom(index: DataFrame, fpp: Double = 0.01,
      expectedItems: Long = -1L): Array[Byte] =
    graft.plans.BloomProbe
      .buildFilter(index.select(col("fp")), col("fp"), fpp, expectedItems)

  /** [[dedupAgainstIndex]] with a pre-built [[indexBloom]] sidecar —
    * row-identical results, a fraction of the join. A Bloom miss has no
    * false negatives, so a batch row whose fingerprint misses is
    * DEFINITELY new and bypasses the anti-join map-only; only rows the
    * filter accepts (real dups + the fpp sliver of the batch) shuffle
    * against the index. At 100 TB the index side dominates the plain
    * anti-join's cost; here the sketch answers for it, so the join's
    * probe side shrinks to the near-dup sliver. (The batch-side window
    * subtree feeds both branches of the split and may recompute — a
    * |batch|-sized cost, by construction tiny next to the index.) */
  def dedupAgainstIndexBloom(batch: DataFrame, index: DataFrame,
      textCol: String, idCol: String, bloom: Array[Byte],
      maxSliverRows: Long = 1000000L): DataFrame = {
    if (bloom == null)
      // null sidecar = EMPTY index (indexBloom's empty-input result):
      // nothing to dedup against, the whole first-in-batch set survives
      return firstInBatch(batch, textCol, idCol).drop("__fp")
    val probed = firstInBatch(batch, textCol, idCol)
      .withColumn("__maybe", graft.plans.BloomProbe
        .mightContain(bloom, xxhash64(col("__fp"))))
    val definitelyNew = probed.filter(!col("__maybe"))
      .drop("__maybe", "__fp")
      // increment-lived cache: the count probe fills it, the returned
      // lazy split reads it. Registered with [[GraftCaches]] — drivers
      // running many increments call GraftCaches.release() (or
      // spark.catalog.clearCache()) between batches; the ContextCleaner
      // does NOT reclaim Dataset caches on GC
    val accepted = GraftCaches.register(
      probed.filter(col("__maybe")).drop("__maybe")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // row count bounds distinct count — one map-only pass, no shuffle
    val maybeDup =
      if (accepted.count() <= maxSliverRows)
        broadcastSliverSplit(accepted, "__fp",
          index.select(col("fp")), "fp")._2
      else accepted
        .join(index.select(col("fp").as("__fp")), Seq("__fp"),
          "left_anti")
    definitelyNew.unionByName(maybeDup.drop("__fp"))
  }

  /** Split `accepted` rows into (historical, novel) against a
    * persisted `index` WITHOUT shuffling the index: the accepted
    * side's distinct keys broadcast into a map-only left-semi scan of
    * the index, and the surviving truly-historical keys broadcast back
    * to semi/anti-split `accepted`. Correct at any size; only
    * economical when `accepted` is a sliver (both broadcasts are
    * accepted-bounded), so callers count-cap and fall back to the
    * shuffled pair past their cap. This is the index-probe shape that
    * survives a 100 TB history: the index is scanned once per
    * increment, exchanged never. Shared by the doc-fingerprint, unit,
    * and substring-anchor incremental probes. */
  private[operators] def broadcastSliverSplit(accepted: DataFrame,
      keyCol: String, index: DataFrame,
      indexKeyCol: String): (DataFrame, DataFrame) = {
    val fps = accepted.select(col(keyCol)).distinct()
    val hist = index.join(broadcast(fps),
      index(indexKeyCol) === fps(keyCol), "left_semi")
    (accepted.join(broadcast(hist),
        accepted(keyCol) === hist(indexKeyCol), "left_semi"),
      accepted.join(broadcast(hist),
        accepted(keyCol) === hist(indexKeyCol), "left_anti"))
  }

  /** [[dedupAgainstIndex]] with the index derived inline — convenience
    * for one-shot jobs; streaming ingestion should materialize
    * [[fingerprintIndex]] once instead. */
  def dedupAgainst(corpus: DataFrame, batch: DataFrame,
      textCol: String, idCol: String): DataFrame =
    dedupAgainstIndex(batch, fingerprintIndex(corpus, textCol),
      textCol, idCol)

  /** Persist the near-dup signature index of a corpus: `path/bands` =
    * one (id, band, band_hash) row per LSH band key (degenerate buckets
    * > `maxBucket` dropped at WRITE time — boilerplate buckets never
    * reach a probe), `path/docs` = (id, shingles) with the
    * sorted-distinct 64-bit shingle hashes exact verification needs.
    * The minhash analog of [[fingerprintIndex]]: a few hundred bytes
    * per doc, built once, so arriving batches are near-dup-checked
    * without ever rescanning corpus TEXT. */
  /** Bucket-cap a pre-selected (id, band, band_hash) key set and write
    * it as an index's bands store — shared by the text and embedding
    * index writers so cap semantics cannot diverge. */
  private def writeCappedBands(bands: DataFrame, path: String,
      maxBucket: Int): Unit = {
    import org.apache.spark.sql.expressions.Window
    bands
      .withColumn("__n",
        count(lit(1)).over(Window.partitionBy("band", "band_hash")))
      .filter(col("__n") <= maxBucket)
      .drop("__n")
      .write.mode("overwrite").parquet(s"$path/bands")
  }

  /** The probe-relevant config manifest persisted next to an index's
    * stores (`path/params`), so a probe with a mismatched banding
    * config FAILS LOUDLY instead of silently returning empty or wrong
    * results (batch keys from a different (shingleLen, k, bands) — or
    * a different sign basis — simply never collide with stored keys;
    * the Dsir count-store (n, k) validation is the in-repo precedent).
    * A store without a manifest (pre-r10) is accepted unchecked.
    * Writers call this LAST, after the bands/docs/vecs stores land: a
    * mid-write failure then leaves either stale-manifest-next-to-new
    * data (a config change surfaces as [[checkIndexParams]]' mismatch)
    * or data-without-manifest — never a fresh manifest blessing stores
    * whose contents don't match it. */
  private def writeIndexParams(path: String, params: Map[String, Long],
      spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    params.toSeq.sortBy(_._1).toDF("param", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/params")
  }

  private[graft] def checkIndexParams(spark: org.apache.spark.sql.SparkSession,
      path: String, params: Map[String, Long], op: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$path/params")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return // pre-manifest store: accept unchecked
    val stored = spark.read.parquet(s"$path/params")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(stored == params,
      s"$op: index at $path was written with ${stored.toSeq.sorted
        .mkString(", ")} but probed with ${params.toSeq.sorted
        .mkString(", ")} — probe config must match the written index")
  }

  def writeNearDupIndex(corpus: DataFrame, path: String, textCol: String,
      idCol: String, shingleLen: Int = 5, k: Int = 20, bands: Int = 5,
      shingleWords: Int = 3, maxBucket: Int = 1000): Unit = {
    writeCappedBands(
      minhashBands(corpus, textCol, idCol, shingleLen, k, bands)
        .select(col(idCol).as("id"), col("band"), col("band_hash")),
      path, maxBucket)
    fanOut(corpus.select(col(idCol), col(textCol)))
      .select(col(idCol).as("id"),
        graft.plans.HashExpressions
          .word_shingle_hashes(col(textCol), shingleWords).as("shingles"))
      .write.mode("overwrite").parquet(s"$path/docs")
    // manifest last (see writeIndexParams' torn-write contract)
    writeIndexParams(path, Map("shingleLen" -> shingleLen.toLong,
      "k" -> k.toLong, "bands" -> bands.toLong,
      "shingleWords" -> shingleWords.toLong), corpus.sparkSession)
  }

  /** Incremental NEAR-dup detection: (batch_id, corpus_id, jaccard)
    * pairs of `batch` docs against an index written by
    * [[writeNearDupIndex]] (same shingleLen/k/bands/shingleWords).
    * Candidates are the band equi-join of the batch's keys against the
    * stored keys — fan-out bounded by the write-time bucket cap;
    * verification is the linear-merge Jaccard over STORED corpus
    * shingle hashes, so per-batch cost is |batch| banding + the
    * equi-join + |candidate| merges. Corpus text is never read — the
    * continuous-crawl shape where the index refreshes behind the
    * stream. */
  def nearDupsAgainstIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, batch: DataFrame, textCol: String, idCol: String,
      threshold: Double = 0.4, shingleLen: Int = 5, k: Int = 20,
      bands: Int = 5, shingleWords: Int = 3): DataFrame = {
    checkIndexParams(spark, path, Map("shingleLen" -> shingleLen.toLong,
      "k" -> k.toLong, "bands" -> bands.toLong,
      "shingleWords" -> shingleWords.toLong), "nearDupsAgainstIndex")
    val idxBands = spark.read.parquet(s"$path/bands")
    val batchBands = minhashBands(batch, textCol, idCol, shingleLen, k,
      bands).select(col(idCol).as("batch_id"), col("band"), col("band_hash"))
    val cands = batchBands.join(idxBands, Seq("band", "band_hash"))
      .select(col("batch_id"), col("id").as("corpus_id")).distinct()
    val batchSh = fanOut(batch.select(col(idCol), col(textCol)))
      .join(cands.select(col("batch_id").as(idCol)).distinct(),
        Seq(idCol), "left_semi")
      .select(col(idCol).as("batch_id"),
        graft.plans.HashExpressions
          .word_shingle_hashes(col(textCol), shingleWords).as("__bsh"))
    val idxSh = spark.read.parquet(s"$path/docs")
      .select(col("id").as("corpus_id"), col("shingles").as("__csh"))
    cands
      .join(batchSh, Seq("batch_id"))
      .join(idxSh, Seq("corpus_id"))
      .withColumn("jaccard", round(graft.plans.HashExpressions
        .sorted_jaccard(col("__bsh"), col("__csh")), 3))
      .filter(col("jaccard") >= threshold)
      .select(col("batch_id"), col("corpus_id"), col("jaccard"))
  }

  /** Persisted EMBEDDING near-dup index — the vector analogue of
    * [[writeNearDupIndex]]: hyperplane band keys (write-time bucket
    * cap) plus int8-QUANTIZED vectors for verification. Quantized
    * storage is 1 B/dim + one scale — 4× smaller than the raw floats a
    * 100 TB embedding index would otherwise duplicate — and the
    * dequantized cosine degrades < 1e-3 at 64-256 dims
    * (EmbeddingsSpec), absorbed by any sane near-dup threshold. */
  def writeEmbeddingIndex(corpus: DataFrame, path: String, idCol: String,
      vecCol: String, bands: Int = 8, bitsPerBand: Int = 12,
      maxBucket: Int = 1000, md5Basis: Boolean = false): Unit = {
    writeCappedBands(
      embeddingBands(corpus, idCol, vecCol, bands, bitsPerBand, md5Basis)
        .select(col(idCol).as("id"), col("band"), col("band_hash")),
      path, maxBucket)
    // fanOut, like the text index's docs store: the O(dim)-per-row
    // quantize must not run at the (often single-split) scan parallelism
    graft.operators.Embeddings
      .quantize(fanOut(corpus.select(col(idCol).as("id"), col(vecCol))),
        vecCol)
      .select(col("id"), col("qvec"), col("scale"))
      .write.mode("overwrite").parquet(s"$path/vecs")
    // manifest last (see writeIndexParams' torn-write contract)
    writeIndexParams(path, Map("bands" -> bands.toLong,
      "bitsPerBand" -> bitsPerBand.toLong,
      "md5Basis" -> (if (md5Basis) 1L else 0L)), corpus.sparkSession)
  }

  /** Incremental embedding near-dup detection: (batch_id, corpus_id,
    * cosine) pairs of `batch` vectors against a [[writeEmbeddingIndex]]
    * store (same bands/bitsPerBand). Candidates are the band equi-join
    * against stored keys; verification is exact cosine of the batch
    * vector against the DEQUANTIZED stored vector, so per-batch cost is
    * |batch| banding + the equi-join + |candidate| cosines and corpus
    * vectors are never re-read at full precision. */
  def embeddingNearDupsAgainstIndex(
      spark: org.apache.spark.sql.SparkSession, path: String,
      batch: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.9, bands: Int = 8, bitsPerBand: Int = 12,
      md5Basis: Boolean = false): DataFrame = {
    checkIndexParams(spark, path, Map("bands" -> bands.toLong,
      "bitsPerBand" -> bitsPerBand.toLong,
      "md5Basis" -> (if (md5Basis) 1L else 0L)),
      "embeddingNearDupsAgainstIndex")
    val idxBands = spark.read.parquet(s"$path/bands")
    val batchBands = embeddingBands(batch, idCol, vecCol, bands,
      bitsPerBand, md5Basis)
      .select(col(idCol).as("batch_id"), col("band"), col("band_hash"))
    val cands = batchBands.join(idxBands, Seq("band", "band_hash"))
      .select(col("batch_id"), col("id").as("corpus_id")).distinct()
    // verification runs in float: the stored side is int8-quantized
    // (whose error dominates any narrowing), and dequantize yields
    // array<float> — an uncast double batch column would fail
    // cosine_sim's no-mixed-types analysis rule
    val bvecs = batch
      .select(col(idCol).as("batch_id"),
        col(vecCol).cast("array<float>").as("__bv"))
      .join(cands.select(col("batch_id")).distinct(), Seq("batch_id"),
        "left_semi")
    // semi-filter to candidate ids BEFORE dequantizing: the per-element
    // dequantize transform over the FULL store would cost |corpus|·dim
    // interpreted lambda evals per batch, not |candidates|·dim
    val ivecs = spark.read.parquet(s"$path/vecs")
      .join(cands.select(col("corpus_id").as("id")).distinct(),
        Seq("id"), "left_semi")
      .select(col("id").as("corpus_id"),
        graft.operators.Embeddings
          .dequantize(col("qvec"), col("scale")).as("__cv"))
    cands
      .join(bvecs, Seq("batch_id"))
      .join(ivecs, Seq("corpus_id"))
      .withColumn("cosine", round(graft.plans.HashExpressions
        .cosine_sim(col("__bv"), col("__cv")), 3))
      .filter(col("cosine") >= threshold)
      .select(col("batch_id"), col("corpus_id"), col("cosine"))
  }

  /** End-to-end near-duplicate PURGE — the filtered corpus a curation
    * job actually wants: LSH candidates → exact-Jaccard verification
    * ([[verifiedPairs]]) → cluster resolution
    * ([[connectedComponents]]) → drop every cluster member except the
    * minimum-id representative. All input columns survive. The final
    * step is a left-anti join of the corpus against the drop set
    * (cluster members above their representative) — the drop set is
    * bounded by actual duplication, so on a mostly-unique corpus the
    * anti-join's build side is tiny. Stage costs are the ones SCALE.md
    * measures for the shared pipeline. */
  def removeNearDups(df: DataFrame, textCol: String, idCol: String,
      threshold: Double = 0.4, shingleWords: Int = 3,
      broadcastSurvivors: Boolean = true): DataFrame =
    dropNonRepresentatives(df, idCol,
      verifiedPairs(df, textCol, idCol, threshold, shingleWords,
        broadcastSurvivors))

  /** [[removeNearDups]] with [[exactCandidates]] instead of LSH
    * banding — the purge whose kept set is a pure function of the
    * corpus (no banding-recall dependence); see [[verifiedPairsExact]]
    * for when that totality is worth its Σ(bucket²) cost. */
  def removeNearDupsExact(df: DataFrame, textCol: String,
      idCol: String, threshold: Double = 0.4, shingleWords: Int = 3,
      broadcastSurvivors: Boolean = true): DataFrame =
    dropNonRepresentatives(df, idCol,
      verifiedPairsExact(df, textCol, idCol, threshold, shingleWords,
        broadcastSurvivors))

  private def dropNonRepresentatives(df: DataFrame, idCol: String,
      pairsDf: DataFrame): DataFrame = {
    val pairs = pairsDf.select(col("id1"), col("id2"))
    val drop = connectedComponents(pairs)
      .filter(col("id") =!= col("component"))
      .select(col("id").as(idCol))
    df.join(drop, Seq(idCol), "left_anti")
  }

  /** [[removeNearDups]] with an explicit keep policy: within each
    * near-dup cluster, keep the row MAXIMIZING `priority` (tie-break:
    * lowest id) instead of the arbitrary min-id representative —
    * curation keeps the longest / highest-quality duplicate, not
    * whichever crawled first. `priority` must be numeric (cast to
    * double); every column survives on the kept rows.
    *
    * Scale: identical to [[removeNearDups]] up to the components, plus
    * one join attaching (id, priority) — component membership is
    * bounded by documents that HAVE a near-dup, tiny next to the
    * corpus, so the planner broadcasts it against the corpus-side
    * (id, priority) projection. */
  def removeNearDupsKeepBest(df: DataFrame, textCol: String,
      idCol: String, priority: Column, threshold: Double = 0.4,
      shingleWords: Int = 3,
      broadcastSurvivors: Boolean = true): DataFrame = {
    val pairs = verifiedPairs(df, textCol, idCol, threshold, shingleWords,
      broadcastSurvivors).select(col("id1"), col("id2"))
    val members = connectedComponents(pairs)
      .join(df.select(col(idCol).as("id"),
        priority.cast("double").as("__p")), Seq("id"))
    val keep = members.groupBy(col("component"))
      // min over (-priority, id): highest priority, then lowest id.
      // Null priority must sort LAST (struct ordering puts null fields
      // first in a min, which would crown the unscored member) — same
      // rule as the oracle's ORDER BY p DESC NULLS LAST
      .agg(graft.plans.ArgExtremumAgg.obj_min_by(col("id"),
        struct(coalesce(-col("__p"), lit(Double.MaxValue)).as("np"),
          col("id"))).as("__keep"))
    val drop = members.join(keep, Seq("component"))
      .filter(col("id") =!= col("__keep"))
      .select(col("id").as(idCol))
    df.join(drop, Seq(idCol), "left_anti")
  }

  /** Keep exactly ONE row per `keyCol` group — the row with the
    * LARGEST `order` value (make the ordering total, e.g. tie-break on
    * a unique id, or the winner is tie-arbitrary). The canonical
    * web-curation use is URL-keyed document dedup: crawl variants of a
    * page collapse onto one canonical URL after
    * [[graft.functions.Url.normalize]], and the longest (then oldest)
    * capture wins. A `n_dups` group-size column is appended — the
    * recrawl-rate signal curation reports come from.
    *
    * Scale: ONE hash shuffle on the key with full partial aggregation —
    * `max_by` is a declarative aggregate, so every map task pre-reduces
    * to at most one candidate row per key before the exchange, and the
    * winner rides the shuffle as a struct. No window (a per-key
    * row_number sorts whole groups), no self-join: the exchange carries
    * ≤ |distinct keys| rows per map task regardless of duplication
    * depth. NULL keys pass through untouched by default; set
    * `nullsPassThrough = false` ONLY when the key is non-null by
    * construction — it removes the second union branch (which
    * re-evaluates a derived key's expression tree) but pools any null
    * keys that do appear into one group. */
  def keepBestByKey(df: DataFrame, keyCol: String, order: Column,
      nullsPassThrough: Boolean = true): DataFrame = {
    val carry = df.columns.toSeq.filterNot(_ == keyCol)
    require(carry.nonEmpty, "keepBestByKey: need at least one non-key " +
      "column to carry through the aggregation")
    // same fail-fast convention as cumBefore/shuffleWithPositions: a
    // caller's n_dups (e.g. this operator's own output) would silently
    // duplicate the output column name
    require(!df.columns.contains("n_dups") &&
      !df.columns.contains("__best"),
      "keepBestByKey: input must not carry the reserved n_dups/__best " +
        "column names")
    // NULL keys pass through untouched (n_dups = 1): a groupBy would
    // pool every un-keyed row into ONE group and silently keep a
    // single survivor — mass deletion of documents that share no
    // actual key. Cost: the two union branches each evaluate the
    // source (including a derived key's full expression tree) — when
    // the key is non-null BY CONSTRUCTION, opt out via
    // `nullsPassThrough = false` for the single-branch plan.
    val best = (if (nullsPassThrough) df.filter(col(keyCol).isNotNull)
        else df)
      .groupBy(col(keyCol))
      // obj_max_by: a declarative max_by whose BUFFER carries the
      // struct payload is ineligible for hash aggregation and drags
      // the exchange onto the SortAggregate path; the object-hash form
      // keeps the same partial aggregation and first-seen tie rule
      .agg(graft.plans.ArgExtremumAgg
        .obj_max_by(struct(carry.map(col): _*), order).as("__best"),
        count(lit(1)).as("n_dups"))
      .select(col(keyCol) +: carry.map(c => col(s"__best.`$c`").as(c)) :+
        col("n_dups"): _*)
    if (!nullsPassThrough) best
    else best.unionByName(
      df.filter(col(keyCol).isNull)
        .select(col(keyCol) +: carry.map(col) :+
          lit(1L).as("n_dups"): _*))
  }

  /** SemDeDup-style semantic near-dup pairs: coarse k-means cells
    * (the [[Similarity.trainCentroids]] quantizer — driver-local Lloyd
    * on a bounded sample), candidates = within-cell pairs, verified by
    * exact cosine ≥ `threshold`. Complements [[embeddingNearDups]]:
    * hyperplane bands catch near-identical vectors cheaply; semantic
    * cells group by meaning-neighborhood, the granularity SemDeDup
    * prunes at.
    *
    * Scale: assignment is a pure expression over centroid literals
    * (zero shuffle); the self-join shuffles (id, vec, cell) ONCE by
    * cell — linear in corpus size; within-cell pair cost is
    * (n/nlist)² per cell, so take nlist ∝ n (fixed target cell size)
    * and cap degenerate cells with `maxCell`, exactly like the LSH
    * bucket guard. */
  def semanticNearDups(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nlist: Int = 16, maxCell: Int = 10000,
      trainFraction: Double = 1.0,
      centroids: Option[Seq[(Int, Array[Float])]] = None,
      hierQuantizer: Option[Similarity.CoarseQuantizer] = None)
      : DataFrame = {
    // `centroids`: a persisted FLAT quantizer (writeIvfIndex sidecar)
    // — the train-once shape that lets an external engine replay the
    // cells (the strict q_dedup_semantic oracle). `hierQuantizer`: a
    // persisted TWO-LEVEL quantizer (writeIvfIndexHier sidecar) for
    // the nlist ∝ n sizing the flat literal fold cannot reach; with
    // NEITHER given, nlist ≤ 4096 trains flat in-line and larger
    // nlist auto-routes to the hierarchical fit — everything
    // downstream (cell cap, one vector exchange, within-cell pairs)
    // is identical, only the assignment expression differs.
    require(centroids.isEmpty || hierQuantizer.isEmpty,
      "semanticNearDups: pass at most one of centroids/hierQuantizer")
    centroids.foreach(cs => require(cs.size == nlist,
      s"semanticNearDups: persisted quantizer has ${cs.size} cells but " +
        s"nlist=$nlist — pass the matching nlist"))
    hierQuantizer.foreach(q => require(
      q.nlist == nlist || q.nlist == Similarity.roundedNlist(nlist),
      s"semanticNearDups: persisted quantizer has ${q.nlist} cells " +
        s"but nlist=$nlist (grid-rounded: " +
        s"${Similarity.roundedNlist(nlist)}) — pass the matching nlist"))
    val assignExpr: Column = hierQuantizer match {
      case Some(cq) => Similarity.assignCellHier(col(vecCol), cq)
      case None if centroids.isEmpty && nlist > 4096 =>
        Similarity.assignCellHier(col(vecCol),
          Similarity.trainCoarseHierarchical(df, vecCol, nlist,
            trainFraction))
      case None => Similarity.nearestCell(col(vecCol),
        centroids.getOrElse(
          Similarity.trainCentroids(df, vecCol, nlist, trainFraction)))
    }
    val assigned0 = df.select(col(idCol), col(vecCol),
      assignExpr.as("cell"))
    // cell cap via a ≤nlist-row aggregate broadcast back — a window
    // count would drag every VECTOR through a per-cell sort instead
    // (the aggregate recomputes the scan-and-assign map, no shuffle)
    val ok = assigned0.groupBy("cell").agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= maxCell).select("cell")
    // ONE explicit exchange of (id, vec, cell) by cell; both self-join
    // sides project above this same canonical subtree, so ReuseExchange
    // computes the assignment once and the join adds no shuffle of its
    // own — the vectors cross the wire exactly once.
    val assigned = assigned0.join(broadcast(ok), Seq("cell"))
      .repartition(col("cell"))
    val l = assigned.select(col("cell"), col(idCol).as("id1"),
      col(vecCol).as("__v1"))
    val r = assigned.select(col("cell"), col(idCol).as("id2"),
      col(vecCol).as("__v2"))
    l.join(r, Seq("cell"))
      .filter(col("id1") < col("id2"))
      .withColumn("sim", cosine(col("__v1"), col("__v2")))
      .filter(col("sim") >= threshold)
      .select(col("id1"), col("id2"), col("sim"))
  }

  /** Jaccard ESTIMATE from two equal-length minhash signatures: the
    * fraction of agreeing components (the MinHash guarantee). Cheap
    * pre-filter on candidate pairs before exact shingle verification —
    * signatures are k longs vs full shingle arrays. */
  def minhashJaccardEstimate(sigA: Column, sigB: Column): Column = {
    val agree = size(filter(zip_with(sigA, sigB,
      (a, b) => when(a === b, 1).otherwise(0)), x => x === 1))
    agree.cast("double") / size(sigA).cast("double")
  }

  /** Exact n-gram Jaccard similarity between two shingle arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val ua = array_distinct(a); val ub = array_distinct(b)
    val inter = size(array_intersect(ua, ub)).cast("double")
    inter / (size(ua) + size(ub) - inter).cast("double")
  }

  /** SimHash: 64-bit signature where bit j = sign of Σ_tokens (±1 by bit j
    * of the token hash). Near-dups have small Hamming distance. Native
    * single-pass codegen kernel ([[graft.plans.SimHash64Expr]]). */
  def simhash(tokens: Column): Column =
    graft.plans.HashExpressions.simhash64(tokens)

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pipeline on the DuckDB-replayable md5 basis:
    * 60-bit [[graft.plans.HashKernels.simhash60Md5]] signature per doc,
    * banded into `bands` equal bit-slices, candidate pairs from equal
    * (band, slice) buckets (the pigeonhole guarantees FULL recall for
    * Hamming ≤ bands−1: that few flipped bits cannot touch every band),
    * verified by exact 60-bit Hamming ≤ `maxHamming`.
    *
    * Plan shape: ONE corpus-scale exchange (the bucket groupBy; the
    * closing pair-distinct shuffles only surviving pairs). The
    * (id, sig) pair rides the band rows into the bucket groupBy, so
    * candidate pairs emerge from [[graft.plans.PairCombosExpr]] with
    * both signatures attached — no join back to a signature table, no
    * persist, no recompute of the signature scan (the earlier
    * minhash-candidate simhash query computed signatures once per join
    * side or persisted them).
    * Degenerate buckets (> maxBucket docs) are dropped before any pair
    * forms, same skew guard as [[minhashCandidates]]. */
  def simhashNearDups(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, bands: Int = 4,
      maxBucket: Int = 1000): DataFrame = {
    require(bands > 0 && 60 % bands == 0, "bands must divide 60")
    val bitsPerBand = 60 / bands
    require(maxHamming >= 0 && maxHamming < bands,
      s"banding guarantees candidate recall only to Hamming ${bands - 1}")
    // null text → null sig; banding nulls would pool every null-text
    // doc into one bucket per band (the oracle's unnest drops them).
    // Filter the RAW text, not the sig: sig is null iff text is, and a
    // sig.isNotNull predicate pushes below the projection where the
    // codegen'd filter+project pair would evaluate the md5 kernel twice
    // per row (seen in the PLANS.md audit).
    val sigs = docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol),
        graft.plans.HashExpressions
          .simhash60_md5(split(lower(trim(col(textCol))), "\\s+"))
          .as("sig"))
    val bandKeys = (0 until bands).map(b =>
      shiftright(col("sig"), b * bitsPerBand)
        .bitwiseAND(lit((1L << bitsPerBand) - 1)))
    sigs
      .select(struct(col(idCol).as("id"), col("sig").as("sig")).as("ds"),
        posexplode(array(bandKeys: _*)).as(Seq("band", "bh")))
      .groupBy(col("band"), col("bh"))
      .agg(collect_list(col("ds")).as("ids"), count(lit(1)).as("n"))
      .filter(col("n").between(2, maxBucket))
      .select(explode(
        graft.plans.HashExpressions.pair_combos(col("ids"))).as("p"))
      .select(col("p.id1.id").as("id1"), col("p.id2.id").as("id2"),
        hamming64(col("p.id1.sig"), col("p.id2.sig")).as("hamming"))
      // duplicate doc ids with DIFFERING text are distinct (id, sig)
      // structs to pair_combos, which would emit an (x, x) self-pair —
      // meaningless as a near-dup and absent from the oracle's
      // a.doc_id < b.doc_id join
      .filter(col("id1") =!= col("id2") && col("hamming") <= maxHamming)
      // a pair surfacing from several shared bands is one pair
      .distinct()
  }

  /** Embedding near-dup: cosine similarity ≥ threshold via LSH-free
    * all-pairs within random-hyperplane buckets — see Similarity.scala for
    * the shared primitives. */
  def cosine(a: Column, b: Column): Column = Similarity.cosine(a, b)

  /** Multi-band random-hyperplane banding for embedding near-dup: one
    * `bands·bitsPerBand`-plane signature per vector (single kernel
    * pass), band b's key = bit range [b·bitsPerBand, (b+1)·bitsPerBand).
    * Same AND-OR structure as MinHash-LSH — similar vectors collide on
    * SOME band with prob 1-(1-p^bits)^bands, p = 1 - θ/π — so recall is
    * tuned by adding bands, not by shrinking the key until buckets go
    * quadratic (the single-table failure mode). One row per (id, band,
    * band_hash); candidates come from the same capped equi-shuffle as
    * [[minhashCandidates]].
    *
    * Band b draws planes [b·bitsPerBand, (b+1)·bitsPerBand) via the
    * kernel's plane-offset parameter, so the total plane count is NOT
    * capped at 64: at scale, widen `bitsPerBand` until random pairs
    * stop colliding (collision rate ≈ 2^-bits per band on
    * near-orthogonal corpora) and recover recall by adding bands.
    * Per-band offset signatures are bit-identical to slices of the old
    * packed ≤64-bit signature, so narrow configs are unchanged. */
  def embeddingBands(df: DataFrame, idCol: String, vecCol: String,
      bands: Int = 6, bitsPerBand: Int = 6,
      md5Basis: Boolean = false): DataFrame = {
    // degenerate configs are silent recall killers, not errors Spark
    // would surface: bitsPerBand = 0 keys EVERY vector into one bucket
    // per band (the cap then drops them all — zero candidates on a
    // dup-filled corpus); bands = 0 emits no key rows at all
    require(bands >= 1 && bitsPerBand >= 1 && bitsPerBand <= 64,
      s"need 1 <= bitsPerBand <= 64 and bands >= 1 " +
        s"(got bands=$bands, bitsPerBand=$bitsPerBand)")
    // ONE kernel invocation computes every band's key (vector read once,
    // dims-outer loop), then posexplode: pos IS the band index. Keys are
    // bit-identical to the per-offset hyperplane_sig slices (spec-pinned).
    // md5Basis swaps the sign source for the oracle-replayable
    // md5-prefix matrix — same plan, same memoized-lookup cost.
    val keys =
      if (md5Basis) graft.plans.HashExpressions
        .hyperplane_band_sigs_md5(col(vecCol), bands, bitsPerBand)
      else graft.plans.HashExpressions
        .hyperplane_band_sigs(col(vecCol), bands, bitsPerBand)
    fanOut(df.select(col(idCol), col(vecCol)))
      .select(col(idCol),
        posexplode(keys).as(Seq("band", "band_hash")))
      .select(col(idCol), col("band"), col("band_hash"))
  }

  /** Embedding near-duplicates: banded hyperplane candidates (bucket-
    * capped, never all-pairs) verified by exact cosine ≥ `threshold`.
    * The banding shuffle carries (id, band, band_hash) — 20 B rows, not
    * vectors; vectors are attached to candidate ids only. */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bands: Int = 6, bitsPerBand: Int = 6,
      maxBucket: Int = 1000, md5Basis: Boolean = false): DataFrame = {
    val cands = minhashCandidates(
      embeddingBands(df, idCol, vecCol, bands, bitsPerBand, md5Basis),
      idCol, maxBucket)
    val vecs = df.select(col(idCol), col(vecCol))
    cands
      .join(vecs.select(col(idCol).as("id1"), col(vecCol).as("__v1")), "id1")
      .join(vecs.select(col(idCol).as("id2"), col(vecCol).as("__v2")), "id2")
      .withColumn("sim", cosine(col("__v1"), col("__v2")))
      .filter(col("sim") >= threshold)
      .select(col("id1"), col("id2"), col("sim"))
  }

  /** Resolve near-dup candidate pairs into duplicate clusters: iterative
    * min-label propagation (each id adopts the smallest id reachable so
    * far) until fixpoint. Returns (id, component) where component = the
    * cluster's minimum id — the "keep" representative.
    *
    * At scale each iteration is one join + one groupBy on the edge list
    * (no driver-side union-find); near-dup clusters are shallow (most
    * have diameter ≤ 2-3), so convergence is fast and bounded. A graph
    * still unconverged after `maxIter` rounds THROWS rather than
    * returning split clusters (a chain of diameter > maxIter would
    * silently keep one extra "representative" duplicate per split) —
    * raise maxIter for pathological long-chain graphs. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 10,
      driverThreshold: Long = 100000L): DataFrame = {
    val spark = pairs.sparkSession
    // Adaptive fast path: below the threshold a driver union-find is one
    // bounded collect instead of diameter-many join rounds. The iterative
    // path below is the scale story; this is the (equally exact)
    // small-graph engineering answer — near-dup edge sets are usually
    // tiny relative to their corpus. Union-find needs neither doubled
    // directions nor deduped edges, so the probe is a limit(T+1) collect
    // of the RAW pair list — one job, no extra shuffle; the union +
    // distinct + cache below are paid only when the graph is actually
    // big enough for the distributed fixpoint.
    val rawPairs = pairs.select(col("id1"), col("id2")).cache()
    // The driver fast path unifies on Long keys, so it only applies to
    // integral id columns (cast back to the input type on return);
    // string/other ids keep the type-generic iterative path regardless
    // of edge count.
    val idType = rawPairs.schema("id1").dataType
    val integralId = idType == org.apache.spark.sql.types.LongType ||
      idType == org.apache.spark.sql.types.IntegerType
    val probe: Array[org.apache.spark.sql.Row] =
      if (integralId)
        rawPairs.select(col("id1").cast("long"), col("id2").cast("long"))
          .limit(math.min(driverThreshold, Int.MaxValue - 1L).toInt + 1)
          .collect()
      else Array.empty
    if (integralId && probe.nonEmpty && probe.length <= driverThreshold) {
      val es = probe.map(r => (r.getLong(0), r.getLong(1)))
      rawPairs.unpersist()
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) {
          val n = parent.getOrElse(c, c); parent(c) = r; c = n
        }
        r
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val ids = es.flatMap { case (a, b) => Seq(a, b) }.distinct
      val out = ids.map(id => (id, find(id)))
      import spark.implicits._
      return out.toSeq.toDF("id", "component")
        .select(col("id").cast(idType).as("id"),
          col("component").cast(idType).as("component"))
    }
    // Distributed fixpoint: undirected edges, both directions, deduped —
    // built from the cached raw pairs so the expensive upstream
    // (verification pipeline) runs once.
    val edges = rawPairs.select(col("id1").as("src"), col("id2").as("dst"))
      .union(rawPairs.select(col("id2").as("src"), col("id1").as("dst")))
      .distinct().cache()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborMin = edges
        .join(labels, edges("dst") === labels("id"))
        .groupBy(col("src")).agg(min(col("component")).as("nbr_min"))
      // the change flag rides along with the update (old `component` is
      // still in scope inside this select), so convergence detection is
      // a filter-count on the checkpointed result — not a second join
      val updated = labels.join(neighborMin,
          labels("id") === neighborMin("src"), "left")
        .select(labels("id"),
          least(col("component"), coalesce(col("nbr_min"), col("component")))
            .as("component"),
          (col("nbr_min") < col("component")).as("__changed"))
        .localCheckpoint(eager = true) // cut lineage per round
      converged = updated.filter(col("__changed")).count() == 0
      // the PREVIOUS round's checkpoint snapshot becomes unreferenced
      // here; Spark's ContextCleaner unpersists it on GC, so live
      // block-manager copies stay bounded without manual plumbing
      labels = updated.drop("__changed")
      i += 1
    }
    edges.unpersist()
    rawPairs.unpersist()
    if (!converged) throw new IllegalStateException(
      s"connectedComponents: not converged after $i rounds — the graph " +
        "has a label chain longer than maxIter; raise maxIter " +
        "(diameter bounds the rounds needed)")
    labels
  }
}
