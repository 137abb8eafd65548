package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Scale-stress drill for the dedup pipeline: replicate the documents
  * corpus Nx with per-copy token perturbation (every source doc gains
  * N near-duplicate variants — the adversarial, dup-heavy case where
  * LSH candidate volume grows ~quadratically in cluster size) and
  * measure each stage. `sbt "runMain graft.tools.ScaleStress [maxScale]"`.
  *
  * What it demonstrates (recorded in SCALE.md): candidate generation
  * stays an equi-shuffle on band keys; verification cost tracks
  * candidate count; connected components converge in O(cluster
  * diameter) rounds with no driver-side state.
  */
object ScaleStress {

  def corpus(spark: SparkSession, dir: String, copies: Int): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val n = docs.count()
    // copy c of doc d: id = d + c*n, text perturbed by replacing the
    // copy-marker token so copies are near- (not exact-) duplicates
    docs.crossJoin(
        spark.range(copies).select(col("id").as("copy")))
      .select(
        (col("doc_id") + col("copy") * n).as("doc_id"),
        when(col("copy") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" variant marker token "),
            col("copy").cast("string"))).as("text"))
  }

  /** Embedding analogue of [[corpus]]: every vector gains N near-
    * duplicate variants (one dimension nudged by a copy-dependent
    * epsilon — cosine vs the original stays ≥0.99 while distinct base
    * vectors stay near-orthogonal). */
  def embCorpus(spark: SparkSession, dir: String, copies: Int): DataFrame = {
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val n = vecs.count()
    vecs.crossJoin(spark.range(copies).select(col("id").as("copy")))
      .select(
        (col("vec_id") + col("copy") * n).as("vec_id"),
        when(col("copy") === 0, col("embedding"))
          .otherwise(zip_with(col("embedding"),
            sequence(lit(0), size(col("embedding")) - 1),
            (x, i) => when(i === pmod(col("copy"), size(col("embedding"))
                .cast("long")).cast("int"),
              x + lit(0.02f) * (pmod(col("copy"), lit(5L)) + 1L)
                .cast("float"))
              .otherwise(x)))
          .as("embedding"))
  }

  /** Zipf-skewed 20-unit docs, deterministic: per-unit md5 uniform →
    * inverse CDF of the log-uniform density over [1, 10^6]
    * (P(id=r) ≈ 1/(r·ln 10^6) — Zipf s≈1; unit 1 alone is ~5% of ALL
    * occurrences, the blank-line/cookie-banner shape). Shared by the
    * r11ops drill (10^6–10^7 docs, cached) and the r12 flagship drill
    * (10^8 docs, NOT cached — 56 GB of text; re-generation stands in
    * for the parquet re-scan a real 100 TB run would pay). */
  def zipfDocs(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(col("id").as("doc_id"))
      .select(col("doc_id"), array_join(
        transform(sequence(lit(0), lit(19)), j =>
          concat(lit("unit"),
            floor(exp(
              (conv(substring(md5(concat(col("doc_id").cast("string"),
                lit(":"), j.cast("string"))), 1, 15), 16, 10)
                .cast("double") / lit(math.pow(2.0, 60))) *
              log(lit(1000000.0)))).cast("long").cast("string"),
            lit(" alpha beta gamma delta"))), "\n").as("text"))

  /** Exact global top-25 word bigrams — the baseline both the curate
    * drill and the CMS comparison leg time, kept identical here. */
  private def topBigramsExact(docs: DataFrame): Long = {
    import graft.functions.Text
    docs.select(explode(Text.word_shingles(col("text"), 2)).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("b").asc).limit(25).count()
  }

  def main(args: Array[String]): Unit = {
    val maxScale = args.headOption.map(_.toInt).getOrElse(10)
    // which drills to run: all | text | emb
    val which = args.drop(1).headOption.getOrElse("all")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.register(spark)

    println(f"${"copies"}%8s ${"docs"}%9s ${"cands"}%9s ${"pairs"}%9s " +
      f"${"clusters"}%9s ${"t_cand"}%8s ${"t_verify"}%9s ${"t_cc"}%8s")
    for (copies <- Seq(1, maxScale)
        if which == "all" || which == "text") {
      val docs = corpus(spark, dir, copies).cache()
      val nDocs = docs.count()

      var t0 = System.nanoTime()
      val cands = Dedup.minhashCandidates(
        Dedup.minhashBands(docs, "text", "doc_id"), "doc_id").cache()
      val nCands = cands.count()
      val tCand = (System.nanoTime() - t0) / 1e9

      t0 = System.nanoTime()
      // same builder as the q_dedup_minhash/q_dedup_cluster queries, but
      // with the shuffle-join plan: on this dup-heavy corpus the shingled
      // survivor set is most of the corpus — too big to broadcast
      val verified = Dedup
        .verifiedPairs(docs, "text", "doc_id", broadcastSurvivors = false)
        .select(col("id1"), col("id2")).cache()
      val nPairs = verified.count()
      val tVerify = (System.nanoTime() - t0) / 1e9

      t0 = System.nanoTime()
      val nClusters = Dedup.connectedComponents(verified)
        .select(col("component")).distinct().count()
      val tCc = (System.nanoTime() - t0) / 1e9

      println(f"$copies%8d $nDocs%9d $nCands%9d $nPairs%9d $nClusters%9d " +
        f"$tCand%8.1f $tVerify%9.1f $tCc%8.1f")

      if (copies == maxScale) {
        // signature-estimate prefilter variant: pairs whose 20-lane
        // estimate < 0.2 skip shingle attachment entirely
        val t1 = System.nanoTime()
        val nPre = Dedup.verifiedPairs(docs, "text", "doc_id",
            broadcastSurvivors = false, estimatePrefilter = Some(0.2))
          .count()
        println(f"  prefilter(0.2) at ${copies}x: pairs=$nPre " +
          f"t_verify=${(System.nanoTime() - t1) / 1e9}%.1f s")
      }
      docs.unpersist(); cands.unpersist(); verified.unpersist()
    }

    // Embedding near-dup drill: same banded-candidate + exact-verify
    // shape over vectors (multi-band hyperplane signatures, capped
    // buckets, cosine verification on candidate ids only). Uses the
    // scale band config — 8 bands × 12 bits, so random near-orthogonal
    // pairs collide at ~2^-12 per band instead of the narrow default's
    // 2^-6 — planted dups (cosine ≥ 0.99) still collide on some band
    // with p ≈ 1-(1-0.575)^8. Override via env to compare configs.
    val emBands = sys.env.getOrElse("SPARK_GRAFT_EMB_BANDS", "8").toInt
    val emBits = sys.env.getOrElse("SPARK_GRAFT_EMB_BITS", "12").toInt
    // SPARK_GRAFT_EMB_MD5=1 runs the drill on the md5 sign basis (the
    // oracle-replayable one q_dedup_embedding/q_dedup_incr_emb use) —
    // the sign matrix is memoized, so the two bases must cost the same
    val emMd5 = sys.env.get("SPARK_GRAFT_EMB_MD5").contains("1")
    println(f"\n${"copies"}%8s ${"vecs"}%9s ${"cands"}%9s ${"pairs"}%9s " +
      f"${"t_cand"}%8s ${"t_verify"}%9s")
    for (copies <- Seq(1, maxScale)
        if which == "all" || which == "emb") {
      val vecs = embCorpus(spark, dir, copies).cache()
      val nVecs = vecs.count()

      var t0 = System.nanoTime()
      val cands = Dedup.minhashCandidates(
        Dedup.embeddingBands(vecs, "vec_id", "embedding",
          emBands, emBits, emMd5), "vec_id").cache()
      val nCands = cands.count()
      val tCand = (System.nanoTime() - t0) / 1e9

      t0 = System.nanoTime()
      val nPairs = Dedup
        .embeddingNearDups(vecs, "vec_id", "embedding", threshold = 0.9,
          bands = emBands, bitsPerBand = emBits, md5Basis = emMd5)
        .count()
      val tVerify = (System.nanoTime() - t0) / 1e9

      println(f"$copies%8d $nVecs%9d $nCands%9d $nPairs%9d " +
        f"$tCand%8.1f $tVerify%9.1f")
      vecs.unpersist(); cands.unpersist()
    }

    // Corpus-curation drill: the map-only ops (repetition gates,
    // hash sampling, PII scrub) must scale linearly with corpus size —
    // any superlinear growth means a shuffle or a quadratic lambda
    // crept in. BM25 and ngram-topk add one bounded reduction each.
    import graft.operators.Corpus
    import graft.functions.Text
    def timed(force: => Unit): Double = {
      val t0 = System.nanoTime(); force; (System.nanoTime() - t0) / 1e9
    }
    println(f"\n${"copies"}%8s ${"docs"}%9s ${"t_rep"}%8s " +
      f"${"t_sample"}%9s ${"t_scrub"}%8s ${"t_bm25"}%8s ${"t_ngram"}%8s")
    for (copies <- Seq(1, maxScale)
        if which == "all" || which == "curate") {
      val docs = corpus(spark, dir, copies).cache()
      val nDocs = docs.count()
      val tRep = timed {
        val f = Text.repetition_features(col("text"))
        docs.select(f.getField("dup_word_frac").as("d"),
          f.getField("top_bigram_frac").as("t"))
          .agg(avg(col("d")), avg(col("t"))).head()
      }
      val tSample = timed {
        docs.filter(Corpus.hashKeep(col("text"), 0.1)).count()
      }
      val tScrub = timed {
        docs.select(Corpus.scrubPii(col("text")).getField("scrubbed").as("s"))
          .agg(max(length(col("s")))).head()
      }
      val tBm25 = timed {
        Corpus.bm25(docs, "doc_id", "text", Seq("table", "spark", "vector"))
          .orderBy(col("score").desc, col("doc_id").asc).limit(50).count()
      }
      val tNgram = timed { topBigramsExact(docs) }
      println(f"$copies%8d $nDocs%9d $tRep%8.1f $tSample%9.1f " +
        f"$tScrub%8.1f $tBm25%8.1f $tNgram%8.1f")
      docs.unpersist()
    }

    // Round-10 curation-quartet drill: html strip / C4 line filter /
    // gopher gate are row-local scans and must scale linearly with
    // corpus bytes; span decontamination's only shuffle carries hit
    // positions — here adversarially ~ALL corpus windows (every doc
    // shares shingles with the bench slice's perturbed twins), the
    // worst case for the islands stage.
    println(f"\n${"copies"}%8s ${"docs"}%9s ${"t_html"}%8s ${"t_c4"}%8s " +
      f"${"t_gopher"}%9s ${"scrubbed"}%9s ${"t_span"}%8s")
    for (copies <- Seq(1, maxScale)
        if which == "all" || which == "curate") {
      import graft.operators.{Contamination, Corpus}
      import graft.functions.Text
      def timed(force: => Unit): Double = {
        val t0 = System.nanoTime(); force; (System.nanoTime() - t0) / 1e9
      }
      val docs = corpus(spark, dir, copies).cache()
      val nDocs = docs.count()
      val tHtml = timed {
        docs.select(Text.html_to_text(concat(lit("<p>"), col("text"),
            lit("</p><script>var x = 1;</script><div>tail</div>"))).as("t"))
          .agg(sum(length(col("t")))).head()
      }
      val tC4 = timed {
        Corpus.c4FilterLines(docs.select(col("doc_id"),
            regexp_replace(col("text"), " (the|a) ", ".\n").as("text")),
          "text", "doc_id", minKeptLines = 0)
          .agg(sum(col("n_kept"))).head()
      }
      val tGopher = timed {
        val f = Text.gopher_features(col("text"))
        docs.filter(Text.gopher_keep(f, minWords = 5)).count()
      }
      var nScrubbed = 0L
      val tSpan = timed {
        val bench = docs.filter(pmod(col("doc_id"), lit(97)) === 0)
        nScrubbed = Contamination.scrubSpans(
            docs.filter(pmod(col("doc_id"), lit(97)) =!= 0),
            "doc_id", "text", bench, "text")
          .filter(col("n_spans") > 0).count()
      }
      println(f"$copies%8d $nDocs%9d $tHtml%8.1f $tC4%8.1f " +
        f"$tGopher%9.1f $nScrubbed%9d $tSpan%8.1f")
      docs.unpersist()
    }

    // Round-6 dedup additions drill: duplicated-substring spans
    // (dup-heavy: every copy shares its full token stream with its
    // siblings), incremental batch-vs-index dedup (the batch is a 1×
    // re-keyed slice — every row must drop against the N× index), and
    // SemDeDup semantic pairs with nlist ∝ n (fixed ~250-vector cells).
    println(f"\n${"copies"}%8s ${"docs"}%9s ${"spans"}%9s ${"t_spans"}%8s " +
      f"${"survive"}%8s ${"t_incr"}%7s ${"sem_pairs"}%10s ${"t_sem"}%6s")
    for (copies <- Seq(1, maxScale)
        if which == "all" || which == "newops") {
      val docs = corpus(spark, dir, copies).cache()
      docs.count()
      var nSpans = 0L
      val tSpans = timed {
        nSpans = Corpus.duplicatedSpans(docs, "text", "doc_id").count()
      }
      val batch = corpus(spark, dir, 1)
        .select((col("doc_id") + 100000000L).as("doc_id"), col("text"))
      var nSurv = 0L
      val tIncr = timed {
        nSurv = Dedup.dedupAgainst(docs, batch, "text", "doc_id").count()
      }
      val vecs = embCorpus(spark, dir, copies).cache()
      val nVecs = vecs.count()
      var nSem = 0L
      val tSem = timed {
        nSem = Dedup.semanticNearDups(vecs, "vec_id", "embedding",
          threshold = 0.9, nlist = math.min(4096, math.max(8, (nVecs / 250).toInt)),
          trainFraction = math.min(1.0, 50000.0 / nVecs)).count()
      }
      println(f"$copies%8d ${docs.count()}%9d $nSpans%9d $tSpans%8.1f " +
        f"$nSurv%8d $tIncr%7.1f $nSem%10d $tSem%6.1f")
      docs.unpersist(); vecs.unpersist()
    }

    // Round-10 drill: keep-first paragraph dedup, URL keep-best dedup,
    // and CCNet perplexity buckets at 1x vs maxScale. The keep-first
    // corpus tiles 5-word pseudo-paragraphs (the query's shape);
    // copies are near-dups, so most paragraphs repeat across copies —
    // the dup-heavy worst case for the unit-keyed exchange. URL keys
    // hold ~5 docs per canonical URL at ANY scale (key count grows
    // with the corpus — the realistic recrawl shape).
    println(f"\n${"copies"}%8s ${"docs"}%9s ${"kf_docs"}%9s ${"t_kf"}%7s " +
      f"${"url_keys"}%9s ${"t_url"}%7s ${"buckets"}%9s ${"t_ppl"}%7s")
    for (copies <- Seq(1, maxScale)
        if which == "all" || which == "r10ops") {
      val base = corpus(spark, dir, copies)
      // the SAME tiling the q_corpus_paragraph_dedup family benchmarks
      val docs = base.select(col("doc_id"),
        graft.QueriesPipeline.tile5(col("text")).as("text"),
        concat(lit("l"), pmod(col("doc_id"), lit(4)).cast("string"))
          .as("lang")).cache()
      val nDocs = docs.count()
      var nKf = 0L
      val tKf = timed {
        nKf = Corpus.dedupKeepFirst(docs, "text", "doc_id", "\n").count()
      }
      val urled = docs.select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        concat(lit("https://example.invalid/p/"),
          pmod(col("doc_id"), lit(math.max(1L, nDocs / 5)))
            .cast("string")).as("url_norm"))
      var nUrl = 0L
      val tUrl = timed {
        nUrl = Dedup.keepBestByKey(urled, "url_norm",
          struct(col("n_chars"), -col("doc_id"))).count()
      }
      var nPpl = 0L
      val tPpl = timed {
        nPpl = Corpus.perplexityBuckets(docs, "doc_id", "text", "lang",
            headVocab = 16)
          .select(col("plabel")).distinct().count()
      }
      // incremental form: the index grows with the corpus (copies×),
      // the probing batch stays FIXED at 1× — per-increment cost must
      // track |batch| + |index|, not corpus²
      var nIdx = 0L; var nIncr = 0L
      val idx = Corpus.unitIndex(docs, "text", "doc_id").cache()
      val tIdx = timed { nIdx = idx.count() }
      // re-crawl shape: most units hit the index, each doc's tail tile
      // is novel (fresh token) — both anti-join outcomes exercised
      val batch = corpus(spark, dir, 1).select(
        (col("doc_id") + 900000000L).as("doc_id"),
        graft.QueriesPipeline.tile5(concat(col("text"),
          lit(" fresh crawl token "),
          pmod(col("doc_id"), lit(7)).cast("string"))).as("text"))
      val tIncr = timed {
        nIncr = Corpus
          .dedupKeepFirstAgainstIndex(batch, idx, "text", "doc_id")
          .count()
      }
      println(f"$copies%8d $nDocs%9d $nKf%9d $tKf%7.1f " +
        f"$nUrl%9d $tUrl%7.1f $nPpl%9d $tPpl%7.1f " +
        f"idx=$nIdx%d t_idx=$tIdx%.1f incr=$nIncr%d t_incr=$tIncr%.1f")
      docs.unpersist(); idx.unpersist()
    }

    // Round-11 drill: Zipf-skewed keep-first + the composed web-dedup
    // pipeline at web shape (10^6 → 10^7 docs, 2×10^7 → 2×10^8 unit
    // occurrences). Unit ids draw log-uniform over [1, 10^6] — Zipf
    // s≈1, so unit 1 alone takes ~5% of ALL occurrences (the blank
    // line / cookie banner: ~10^7 copies at the 10× leg). The r10
    // PARTITION BY u window would pin that unit's whole group on ONE
    // un-splittable task; the partial-agg winner groupBy must keep
    // wall ~linear in corpus size and the winner-exchange shuffle
    // bytes ~|map-task-distinct units|, not |occurrences|.
    // Shared shuffle-byte accounting for the round-11 drills: a stage
    // listener summed between timedMB resets (listener events land
    // async, so each timed leg sleeps the bus empty before reading).
    import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(
          sc: SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(
          sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    def timedMB(force: => Long): (Long, Double, Double) = {
      Thread.sleep(300) // drain async stage events from the prior leg
      shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      val out = force
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      (out, secs, shuffleBytes.get / 1e6)
    }

    println(f"\n${"docs"}%9s ${"kf_kept"}%9s ${"t_kf"}%7s " +
      f"${"kf_shufMB"}%10s ${"web_kept"}%9s ${"t_web"}%7s " +
      f"${"web_shufMB"}%11s ${"aud_rows"}%9s ${"t_aud"}%7s " +
      f"${"aud_shufMB"}%11s")
    if (which == "all" || which == "r11ops") {
      for (n <- Seq(1000000L, 1000000L * maxScale)) {
        // deterministic Zipf unit ids: md5 uniform → inverse CDF of
        // the log-uniform density (P(id=r) ≈ 1/(r·ln 10^6))
        val docs = zipfDocs(spark, n).cache()
        docs.count() // materialize: legs time dedup, not generation
        val (nKf, tKf, mbKf) = timedMB {
          Corpus.dedupKeepFirst(docs, "text", "doc_id", "\n").count()
        }
        // composed web shape: 5 crawl variants per page collapse by
        // canonical url (longest-then-oldest wins), survivors feed the
        // SAME keep-first — the q_pipeline_web_dedup plan at scale
        val (nWeb, tWeb, mbWeb) = timedMB {
          val urled = docs.select(col("doc_id"), col("text"),
            length(col("text")).cast("long").as("n_chars"),
            concat(lit("https://example.invalid/p/"),
              (col("doc_id") / 5).cast("long").cast("string"))
              .as("url_norm"))
          val kept = Dedup.keepBestByKey(urled, "url_norm",
            struct(col("n_chars"), -col("doc_id")),
            nullsPassThrough = false)
          Corpus.dedupKeepFirst(kept.select(col("doc_id"), col("text")),
            "text", "doc_id", "\n").count()
        }
        // boilerplate audit over the SAME Zipf corpus: the mega-unit
        // (~5% of ALL occurrences) must crush map-side TWICE — (u,doc)
        // then (u) — so the report's shuffle tracks distinct
        // (unit, doc) pairs, never occurrence depth, and the cut is
        // TakeOrdered (per-partition k), never a global sort
        val (nAud, tAud, mbAud) = timedMB {
          Corpus.topDuplicatedUnits(docs, "doc_id", col("text"), 100)
            .count()
        }
        println(f"$n%9d $nKf%9d $tKf%7.1f $mbKf%10.1f " +
          f"$nWeb%9d $tWeb%7.1f $mbWeb%11.1f " +
          f"$nAud%9d $tAud%7.1f $mbAud%11.1f")
        docs.unpersist()
      }
    }

    // Round-12 flagship drill (VERDICT r11 item 6): the composed web
    // pipeline — URL keep-best 5:1 collapse, then Zipf keep-first
    // paragraph dedup over the survivors, the q_pipeline_web_dedup
    // plan — at 10^8 docs / 2×10^9 unit occurrences, 10× the largest
    // curation drill. Run with SPARK_DRIVER_MEM=64g. The corpus is
    // NOT cached (≈56 GB of text): each scan regenerates, standing in
    // for the parquet re-scan a real 100 TB run pays. Shuffle
    // partitions are raised to 256 for this leg — the 100 TB config,
    // where a 32-way exchange of 4×10^8 unit rows would put >1 GB on
    // every reduce task; AQE coalesces the small stages back down.
    // Skew accounting: a QueryExecutionListener sums AQE skew
    // partition splits over the leg (the Zipf mega-unit's rebuild-join
    // partition is the candidate) via bridge.skewStats.
    if (which == "flagship") {
      import org.apache.spark.sql.execution.QueryExecution
      import org.apache.spark.sql.util.QueryExecutionListener
      val skewParts = new java.util.concurrent.atomic.AtomicLong
      val skewSplits = new java.util.concurrent.atomic.AtomicLong
      val skewListener = new QueryExecutionListener {
        override def onSuccess(name: String, qe: QueryExecution,
            durationNs: Long): Unit = {
          val (p, s) = org.apache.spark.sql.graft.bridge
            .skewStats(qe.executedPlan)
          skewParts.addAndGet(p); skewSplits.addAndGet(s)
        }
        override def onFailure(name: String, qe: QueryExecution,
            error: Exception): Unit = ()
      }
      spark.listenerManager.register(skewListener)
      val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "256")
      // try/finally: an OOM/failure in the timed leg must not leave
      // the 256-partition override active for later legs in a chained
      // run — their timings would quietly distort. Same for the
      // listener: unregister it so a chained run's later legs don't
      // keep incrementing these atomics.
      try {
        println(f"\n${"docs"}%10s ${"web_kept"}%9s ${"t_web"}%8s " +
          f"${"web_shufMB"}%11s ${"skew_parts"}%11s ${"skew_splits"}%12s")
        val n = 10000000L * maxScale
        val (nWeb, tWeb, mbWeb) = timedMB {
          val docs = zipfDocs(spark, n)
          val urled = docs.select(col("doc_id"), col("text"),
            length(col("text")).cast("long").as("n_chars"),
            concat(lit("https://example.invalid/p/"),
              (col("doc_id") / 5).cast("long").cast("string"))
              .as("url_norm"))
          val kept = Dedup.keepBestByKey(urled, "url_norm",
            struct(col("n_chars"), -col("doc_id")),
            nullsPassThrough = false)
          Corpus.dedupKeepFirst(kept.select(col("doc_id"), col("text")),
            "text", "doc_id", "\n").count()
        }
        // settle the listener bus instead of a fixed sleep: async
        // execution events still in flight would undercount the skew
        // tallies (ADVICE r12)
        org.apache.spark.sql.graft.bridge.settleListenerBus(
          spark.sparkContext, 30000L)
        println(f"$n%10d $nWeb%9d $tWeb%8.1f $mbWeb%11.1f " +
          f"${skewParts.get}%11d ${skewSplits.get}%12d")
      } finally {
        spark.conf.set("spark.sql.shuffle.partitions", prevParts)
        spark.listenerManager.unregister(skewListener)
      }
    }

    // Round-11 substring-index drill: incremental substring dedup of a
    // mostly-novel batch (|batch| = |history|/10, 5% of batch docs
    // repeat a full historical doc) against a persisted anchor index.
    // Plain probe = shuffled semi/anti pair — the INDEX crosses the
    // exchange every increment, so probe shuffle grows with history.
    // Bloom sidecar = misses proven novel map-side; the accepted
    // sliver broadcasts into a map-only semi-scan of the index, which
    // never exchanges — probe shuffle should stay ~|batch novel
    // anchors| (the winner groupBy) at ANY history size. Caps raised
    // per the BloomProbe Scaladoc: the 10× index holds ~13M anchors.
    println(f"\n${"hist"}%9s ${"anchors"}%9s ${"spans"}%7s " +
      f"${"t_plain"}%8s ${"plain_MB"}%9s ${"t_bloom"}%8s " +
      f"${"bloom_MB"}%9s")
    if (which == "all" || which == "ssidx") {
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.maxNumItems", 33554432L)
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.maxNumBits", 268435456L)
      def docText(id: Column): Column = array_join(
        transform(sequence(lit(0), lit(19)),
          j => concat(lit("w"), (id * 20 + j).cast("string"))), " ")
      for (n <- Seq(100000L, 100000L * maxScale)) {
        val hist = spark.range(n).select(col("id").as("doc_id"),
          docText(col("id")).as("text"))
        val idx = Corpus.substringAnchorIndex(hist, "text", "doc_id", 8)
          .cache()
        val nAnchors = idx.count()
        val batch = spark.range(n / 10)
          .select((col("id") + 1000000000L).as("doc_id"),
            docText(when(col("id") % 20 === 0, col("id") % n)
              .otherwise(col("id") + 1000000000L)).as("text"))
          .cache()
        batch.count()
        def spans(df: org.apache.spark.sql.DataFrame): Long =
          df.agg(coalesce(sum(col("n_spans")), lit(0L)).as("s"))
            .head.getLong(0)
        val (sPlain, tPlain, mbPlain) = timedMB {
          spans(Corpus.dedupSubstringsAgainstIndex(
            batch, idx, "text", "doc_id", k = 8))
        }
        // real lifecycle: the sidecar comes from the PERSISTED store
        // (FingerprintIndexStore: keys parquet + bloom + manifest), so
        // the bloom leg scans parquet, not the cached frame, and the
        // store write/append walls land in the table
        val storeDir = java.nio.file.Files
          .createTempDirectory("ssidx-store").toString + "/idx"
        val (_, tWrite, _) = timedMB {
          graft.sinks.FingerprintIndexStore.write(idx, storeDir); 0L
        }
        val loaded = graft.sinks.FingerprintIndexStore
          .load(spark, storeDir, "afp")
        require(loaded.nKeys == nAnchors, "store lost anchors")
        val (sBloom, tBloom, mbBloom) = timedMB {
          spans(Corpus.dedupSubstringsAgainstIndexBloom(
            batch, loaded.keys, "text", "doc_id", loaded.bloom, k = 8))
        }
        require(sPlain == sBloom,
          s"sidecar changed results: $sPlain vs $sBloom")
        val (_, tAppend, _) = timedMB {
          graft.sinks.FingerprintIndexStore.append(
            Corpus.substringAnchorIndex(batch, "text", "doc_id", 8),
            storeDir)
          graft.sinks.FingerprintIndexStore
            .load(spark, storeDir, "afp").nKeys
        }
        println(f"$n%9d $nAnchors%9d $sPlain%7d " +
          f"$tPlain%8.1f $mbPlain%9.1f $tBloom%8.1f $mbBloom%9.1f " +
          f"write=$tWrite%.1f append=$tAppend%.1f")
        idx.unpersist(); batch.unpersist()
      }
    }

    // Round-11 paragraph-near-dedup drill: 3-unit docs where every odd
    // doc near-dups its predecessor's units (shared 9-word prefix,
    // doc-unique last token → unit Jaccard 7/9). Banded mode is the
    // 100 TB default (recall ~90% per pair at J=0.78, deterministic on
    // the md5 basis); exact mode (shared-shingle candidates) is the
    // zero-false-negative oracle path — here vocabularies are doc-pair
    // -local so its buckets stay tiny; its Σ(bucket²) blowup needs
    // SHARED shingles (the dup-heavy 'text' drill shape), which is
    // exactly why banded stays the default.
    println(f"\n${"docs"}%9s ${"band_kept"}%9s ${"t_band"}%8s " +
      f"${"band_MB"}%8s ${"exact_kept"}%10s ${"t_exact"}%8s " +
      f"${"exact_MB"}%9s")
    if (which == "all" || which == "ndunits") {
      for (n <- Seq(100000L, 100000L * maxScale)) {
        val base = (col("doc_id") - pmod(col("doc_id"), lit(2))) * 100
        def unit(k: Int): Column = concat(
          array_join(transform(sequence(lit(0), lit(8)),
            j => concat(lit("w"), (base + lit(k * 10) + j)
              .cast("string"))), " "),
          lit(" t"), (col("doc_id") * 3 + k).cast("string"))
        val docs = spark.range(n).select(col("id").as("doc_id"))
          .select(col("doc_id"),
            concat_ws("\n", unit(0), unit(1), unit(2)).as("text"))
          .cache()
        docs.count()
        val (nBand, tBand, mbBand) = timedMB {
          Corpus.nearDedupUnits(docs, "text", "doc_id").count()
        }
        val (nExact, tExact, mbExact) = timedMB {
          Corpus.nearDedupUnits(docs, "text", "doc_id",
            exactCandidates = true).count()
        }
        println(f"$n%9d $nBand%9d $tBand%8.1f $mbBand%8.1f " +
          f"$nExact%10d $tExact%8.1f $mbExact%9.1f")
        docs.unpersist()
      }
    }

    // Round-13 LSH saturation-telemetry drill (VERDICT r12 item 6):
    // the ndunits corpus CANNOT saturate (every unit appears exactly
    // twice — bucket depth 2 ≪ cap), and a FULLY templated corpus
    // hits the documented AQE blind spot (all buckets saturate → the
    // candidate subtree is empty → AQE's empty-relation collapse
    // erases the observed metrics — requireHealthyLshBuckets exists
    // for that edge). The listener's regime is PARTIAL saturation, so
    // the drill corpus mixes both populations: every doc carries two
    // units from a 1000-template pool (bucket depth ~2n/1000 ≫ the
    // 1000 cap → saturated, DROPPED) and 1 doc pair per 100 docs
    // carries a genuine shared unit (depth-2 buckets → healthy,
    // candidates flow; distinct pair texts sized so saturated
    // buckets ≈ 1000/11000 ≈ 9% of all buckets, past the 5%
    // threshold). Expected: pair dups ARE found, and the session
    // listener WARN-logs the measured saturated fraction with the
    // remediation message — the 100 TB footgun announcing itself
    // instead of silently under-reporting.
    if (which == "lshsat") {
      val n = 100000L * maxScale
      def template(k: Column): Column = concat(
        lit("template boilerplate body number "),
        pmod(k, lit(1000)).cast("string"),
        lit(" lorem ipsum dolor sit amet consetetur sadipscing elitr"))
      val hasPair = pmod(col("doc_id"), lit(100)) < 2
      val pairUnit = concat(
        lit("shared pair paragraph with distinctive words number "),
        floor(col("doc_id") / 2).cast("long").cast("string"),
        lit(" end of paragraph marker"))
      val docs = spark.range(n).select(col("id").as("doc_id"))
        .select(col("doc_id"),
          when(hasPair, concat_ws("\n", template(col("doc_id") * 2),
            template(col("doc_id") * 2 + 1), pairUnit))
          .otherwise(concat_ws("\n", template(col("doc_id") * 2),
            template(col("doc_id") * 2 + 1))).as("text"))
      val t0 = System.nanoTime()
      val kept = Corpus.nearDedupUnits(docs, "text", "doc_id").count()
      org.apache.spark.sql.graft.bridge.settleListenerBus(
        spark.sparkContext, 30000L)
      // the same stats the listener read, printed as the drill record
      // (the WARN goes to the driver log; this line goes to SCALE.md)
      val units = spark.range(n).select(col("id").as("doc_id"))
        .select(col("doc_id"),
          when(hasPair, concat_ws("\n", template(col("doc_id") * 2),
            template(col("doc_id") * 2 + 1), pairUnit))
          .otherwise(concat_ws("\n", template(col("doc_id") * 2),
            template(col("doc_id") * 2 + 1))).as("text"))
        .select(col("doc_id"), explode(split(col("text"), "\n")).as("u"))
      val stats = Dedup.lshBucketHealth(
        Dedup.minhashBands(units, "u", "doc_id"))
      println(f"lshsat: docs=$n kept_docs=$kept " +
        f"t=${(System.nanoTime() - t0) / 1e9}%.1f s " +
        f"buckets=${stats.buckets} saturated=${stats.saturatedBuckets} " +
        f"frac=${100 * stats.saturatedFrac}%.1f%% " +
        f"max_bucket=${stats.maxBucket} — the 'LSH banding degraded' " +
        "WARN above carries the same fraction")
    }

    // Round-12 winnow drill: proves winnowOverlapPairs' Σ(capped-
    // bucket²) claim at 10×. Each doc = 256 unique hex chars + a
    // 160-char passage shared by its 2-doc pair group (≥5 guaranteed
    // common picks at w=24,k=4 — well past minShared=4) + a ~200-char
    // boilerplate footer IDENTICAL across every doc. The footer's
    // fingerprints land in n-deep buckets — past maxBucket=64 they
    // drop as boilerplate, which is the whole cap story: uncapped this
    // corpus is an n² pair explosion; capped, pairs = exactly n/2 and
    // shuffle tracks the linear fingerprint mass. With the r12
    // single-scan fix the text generates once into the fps cache;
    // wall should scale ~linearly with n.
    println(f"\n${"docs"}%9s ${"pairs"}%9s ${"t_winnow"}%9s " +
      f"${"winnow_MB"}%10s")
    if (which == "all" || which == "winnow") {
      for (n <- Seq(100000L, 100000L * maxScale)) {
        def md5cat(tag: String, idExpr: Column, m: Int): Column =
          array_join(transform(sequence(lit(0), lit(m - 1)), j =>
            md5(concat(lit(tag), idExpr.cast("string"), lit(":"),
              j.cast("string")))), "")
        val docs = spark.range(n).select(col("id").as("doc_id"))
          .select(col("doc_id"), concat(
            md5cat("u", col("doc_id"), 8), lit("\n"),
            md5cat("g", col("doc_id") - pmod(col("doc_id"), lit(2L)), 5),
            lit("\nshared boilerplate footer every document carries " +
              "verbatim so its fingerprints saturate far past the " +
              "bucket cap and must be dropped before any pair forms " +
              "at all scales tested here")).as("text"))
          .cache()
        docs.count()
        val (nPairs, tW, mbW) = timedMB {
          Dedup.winnowOverlapPairs(docs, "text", "doc_id").count()
        }
        println(f"$n%9d $nPairs%9d $tW%9.1f $mbW%10.1f")
        docs.unpersist()
      }
    }

    // Round-8 line-dedup drill: the rewritten one-cached-pass plan
    // (dup-heavy: every copy shares its full token stream, so the
    // frequent set is the whole shared vocabulary above threshold —
    // the driver-collected literal's worst realistic shape). chars_out
    // forces full string materialization of the rewrite.
    println(f"\n${"copies"}%8s ${"docs"}%9s ${"freq_cut"}%9s " +
      f"${"t_linededup"}%12s")
    for (copies <- Seq(1, maxScale)
        if which == "all" || which == "linededup") {
      val docs = corpus(spark, dir, copies).cache()
      val nDocs = docs.count()
      var charsOut = 0L
      val t = timed {
        charsOut = Corpus.dedupLinesAuto(docs, "text", delim = " ")
          .agg(sum(length(col("text")))).head().getLong(0)
      }
      val charsIn = docs.agg(sum(length(col("text")))).head().getLong(0)
      println(f"$copies%8d $nDocs%9d ${charsIn - charsOut}%9d $t%12.1f")
      docs.unpersist()
    }

    // Round-9 per-group line-dedup fallback drill: a many-domain corpus
    // pushes the per-group frequent map past the driver-literal
    // threshold, and the operator must flip to the broadcast-join path
    // with IDENTICAL output. Synthetic domains (doc_id mod G) each get
    // a planted boiler token in 100% of their docs; `chk` is an exact
    // per-row content checksum, so lit≡join is verified on the full
    // rewritten corpus, not a sampled slice.
    println(f"\n${"copies"}%8s ${"docs"}%9s ${"groups"}%7s " +
      f"${"t_literal"}%10s ${"t_join"}%7s ${"lit==join"}%10s")
    for (copies <- Seq(1, maxScale)
        if which == "all" || which == "groupdedup") {
      val g = 2000
      val docs = corpus(spark, dir, copies)
        .select(col("doc_id"),
          pmod(col("doc_id"), lit(g)).as("site"),
          concat(col("text"), lit(" boiler"),
            pmod(col("doc_id"), lit(g))).as("text"))
        .cache()
      val nDocs = docs.count()
      def chk(df: DataFrame): (Long, Long) = {
        // bit_xor, not sum: a sum of 64-bit hashes overflows under
        // ANSI; xor is order-independent and exact
        val r = df.agg(
          bit_xor(xxhash64(concat_ws(" ",
            col("doc_id").cast("string"), col("text")))).as("h"),
          sum(length(col("text"))).as("c")).head()
        (r.getLong(0), r.getLong(1))
      }
      var litChk: (Long, Long) = null; var joinChk: (Long, Long) = null
      // force each path explicitly (the drill's frequent set is larger
      // than the production literal default, so the default parameters
      // would silently take the join path on BOTH legs) and verify the
      // plan shape actually taken before trusting the timing labels
      val tLit = timed {
        val lit = Corpus.dedupLinesPerGroup(docs, "site", "text",
          delim = " ", maxLiteralLines = Long.MaxValue,
          maxLiteralBytes = Long.MaxValue)
        // the docs LINEAGE has a crossJoin (corpus replication), so
        // test for the fallback's specific node, not any Join
        assert(!lit.queryExecution.executedPlan.toString
          .contains("BroadcastHashJoin"),
          "t_literal leg did not take the literal path")
        litChk = chk(lit)
      }
      val tJoin = timed {
        val j = Corpus.dedupLinesPerGroup(docs, "site", "text",
          delim = " ", maxLiteralLines = 0L)
        assert(j.queryExecution.executedPlan.toString
          .contains("BroadcastHashJoin"),
          "t_join leg did not take the broadcast-join path")
        joinChk = chk(j)
      }
      println(f"$copies%8d $nDocs%9d $g%7d $tLit%10.1f $tJoin%7.1f " +
        f"${litChk == joinChk}%10s")
      docs.unpersist()
    }

    // kNN self-join drill: exact is O(n²) cosine (the baseline that
    // must NOT be the scale path); LSH's narrow far-neighbor bands make
    // buckets grow as n/2^bits (quadratic candidates); IVF with
    // nlist ∝ n keeps per-vector cost at nprobe·cell — the linear
    // scale path. Planted near-dups make each vector's true top-k
    // mostly its own clones (easy recall for both approximations).
    import graft.operators.Similarity
    println(f"\n${"copies"}%8s ${"vecs"}%9s ${"t_exact"}%8s ${"t_lsh"}%8s " +
      f"${"t_ivf"}%8s ${"r_lsh"}%7s ${"r_ivf"}%7s")
    for (copies <- Seq(1, maxScale)
        if which == "all" || which == "knn") {
      val vecs = embCorpus(spark, dir, copies).cache()
      val nVecs = vecs.count()
      var t0 = System.nanoTime()
      val exact = Similarity.knnJoinExact(vecs, 3)
        .select("qid", "vec_id").cache()
      val nExact = exact.count()
      val tExact = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val lsh = Similarity.knnJoinLsh(vecs, 3)
        .select("qid", "vec_id").cache()
      lsh.count()
      val tLsh = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      // fixed target cell ≈ 250 vectors: nlist grows with the corpus
      val ivf = Similarity.knnJoinIvf(vecs, 3,
          nlist = math.min(4096, math.max(8, (nVecs / 250).toInt)), nprobe = 4,
          trainFraction = math.min(1.0, 50000.0 / nVecs))
        .select("qid", "vec_id").cache()
      ivf.count()
      val tIvf = (System.nanoTime() - t0) / 1e9
      val rLsh = exact.intersect(lsh).count().toDouble / nExact
      val rIvf = exact.intersect(ivf).count().toDouble / nExact
      println(f"$copies%8d $nVecs%9d $tExact%8.1f $tLsh%8.1f " +
        f"$tIvf%8.1f $rLsh%7.3f $rIvf%7.3f")
      vecs.unpersist(); exact.unpersist(); lsh.unpersist(); ivf.unpersist()
    }

    // Round-12 PQ drill: the quantized-ANN layouts at 10⁵ → 10⁶
    // vectors (md5-derived synthetic 64-dim corpus — embCorpus tops
    // out at 2×10⁴). Claims under measure: index build (m sample
    // fits + one encode scan) and the FLAT ADC probe are linear in n;
    // the IVF-PQ probe with nlist ∝ n (fixed ~2.5k-vector cells) is
    // FLAT in n — nprobe cells of constant size, partition-pruned at
    // the file listing, is the whole point of the layout.
    if (which == "pq") {
      import org.apache.spark.sql.Column
      def synthVec(id: Column): Column =
        transform(sequence(lit(0), lit(63)), j =>
          ((conv(substring(md5(concat(id.cast("string"), lit(":"),
            j.cast("string"))), 1, 8), 16, 10).cast("double")
            % 1000.0) / 500.0 - 1.0).cast("float"))
      println(f"\n${"vecs"}%9s ${"t_build"}%8s ${"t_flat"}%8s " +
        f"${"flat_MB"}%8s ${"t_bivfpq"}%9s ${"t_ivfpq"}%8s " +
        f"${"ivfpq_MB"}%9s")
      for (n <- Seq(100000L, 100000L * maxScale)) {
        val vecs = spark.range(n).select(col("id").as("vec_id"),
          synthVec(col("id")).as("embedding")).cache()
        vecs.count()
        val queries = spark.range(20).select(col("id").as("qid"),
          synthVec(col("id")).as("qvec"))
        val flatPath = java.nio.file.Files
          .createTempDirectory("pq-flat").toString + "/idx"
        val (_, tBuild, _) = timedMB {
          Similarity.writePqIndex(vecs, flatPath, m = 8, ncodes = 16); 0L
        }
        val (nFlat, tFlat, mbFlat) = timedMB {
          Similarity.pqTopKFromIndex(spark, flatPath, queries, 10).count()
        }
        val ivfPath = java.nio.file.Files
          .createTempDirectory("pq-ivf").toString + "/idx"
        val nlist = math.min(4096, math.max(8, (n / 2500).toInt))
        val (_, tBuildIvf, _) = timedMB {
          val coarse = Similarity.trainCentroids(vecs, "embedding", nlist,
            trainFraction = math.min(1.0, 100000.0 / n))
          Similarity.writeIvfPqIndex(vecs, ivfPath, coarse,
            m = 8, ncodes = 16)
          0L
        }
        val (nIvf, tIvf, mbIvf) = timedMB {
          Similarity.ivfPqTopKFromIndex(spark, ivfPath, queries, 10,
            nprobe = 4).count()
        }
        // residual layout: same coarse cells (retrained — identical
        // sample → identical centroids), residual codebooks + the
        // per-cell query rebase; probe must stay as flat-in-n as the
        // raw-vector layout (the rebase is probe-frame-sized work)
        val resPath = java.nio.file.Files
          .createTempDirectory("pq-ivfres").toString + "/idx"
        val (_, tBuildRes, _) = timedMB {
          val coarse = Similarity.trainCentroids(vecs, "embedding", nlist,
            trainFraction = math.min(1.0, 100000.0 / n))
          Similarity.writeIvfPqIndex(vecs, resPath, coarse,
            m = 8, ncodes = 16, residual = true)
          0L
        }
        val (nRes, tRes, mbRes) = timedMB {
          Similarity.ivfPqTopKFromIndex(spark, resPath, queries, 10,
            nprobe = 4).count()
        }
        require(nFlat == 200 && nIvf == 200 && nRes == 200,
          s"probe row counts drifted: flat=$nFlat ivfpq=$nIvf res=$nRes")
        println(f"$n%9d $tBuild%8.1f $tFlat%8.1f $mbFlat%8.1f " +
          f"$tBuildIvf%9.1f $tIvf%8.1f $mbIvf%9.1f " +
          f"t_bres=$tBuildRes%.1f t_res=$tRes%.1f res_MB=$mbRes%.1f")
        vecs.unpersist()
      }
    }

    // Round-13 coarse-quantizer drill (VERDICT r12 item 1): the
    // two-level hierarchical fit past the driver-Lloyd ceiling,
    // measured at the nlist range the flat path cannot reach (its
    // ceiling is now an enforced require at 4096). Claims under
    // measure: (a) fit wall grows ~√nlist — level 1 is a k1 ≈ √nlist
    // driver fit, level 2 is k1 DISTRIBUTED per-cell sub-fits of k2
    // centers each — vs the flat fit's O(nlist) driver loop (shown at
    // 1024 for reference, the largest this corpus makes honest);
    // (b) the assignment scan is O(√nlist) per vector — kernel with
    // the quantizer as a reference object, zero literals — so t_assign
    // moves with √nlist, never nlist. ppc = training points per
    // centroid (the fail-fast floor is 32).
    if (which == "coarse") {
      import org.apache.spark.sql.Column
      def synthVec(id: Column): Column =
        transform(sequence(lit(0), lit(63)), j =>
          ((conv(substring(md5(concat(id.cast("string"), lit(":"),
            j.cast("string"))), 1, 8), 16, 10).cast("double")
            % 1000.0) / 500.0 - 1.0).cast("float"))
      val n = 100000L * maxScale
      val vecs = spark.range(n).select(col("id").as("vec_id"),
        synthVec(col("id")).as("embedding")).cache()
      vecs.count()
      println(f"\n${"vecs"}%9s ${"nlist"}%7s ${"grid"}%9s ${"ppc"}%5s " +
        f"${"t_fit"}%7s ${"t_assign"}%9s ${"t_flat_fit"}%11s")
      for (nlist <- Seq(1024, 4096, 16384)
          if n >= 32L * nlist) {
        var cq: Similarity.CoarseQuantizer = null
        val tFit = timed {
          cq = Similarity.trainCoarseHierarchical(vecs, "embedding",
            nlist)
        }
        val (nAssigned, tAssign, _) = timedMB {
          vecs.select(Similarity.assignCellHier(col("embedding"), cq)
            .as("cell")).filter(col("cell").isNotNull).count()
        }
        require(nAssigned == n, s"assignment dropped rows: $nAssigned")
        // flat driver-Lloyd reference, only where its ceiling allows
        // and the wall stays drill-sized
        val tFlat =
          if (nlist <= 1024)
            timed { Similarity.trainCentroids(vecs, "embedding", nlist,
              trainFraction = math.min(1.0, 100000.0 / n)) }
          else Double.NaN
        val ppc = math.min(n, 2L * cq.k1 * 8192) / nlist
        println(f"$n%9d $nlist%7d ${s"${cq.k1}x${cq.k2}"}%9s $ppc%5d " +
          f"$tFit%7.1f $tAssign%9.1f $tFlat%11.1f")
      }
      // the uniform corpus is done — free its cache before the
      // clustered leg caches its own n rows, or two corpus-sized
      // vector caches coexist and spill distorts the walls below
      vecs.unpersist()
      // the layout that USES the big quantizer: hierarchical IVF-PQ
      // at nlist 16k — build (fit + m subspace fits + one kernel
      // encode into the grouped layout) and the beam probe, which must
      // stay bounded by |probed cells| (≈ nprobe · n/nlist rows of
      // 8-int codes), not by n or nlist. This leg's corpus is
      // CLUSTERED (n/50 planted clusters, 0.15-scale noise): uniform
      // random 64-dim vectors have no locality for ANN to exploit —
      // recall against them reads ~0.02 (still ~80× the 0.0002 chance
      // rate, but meaningless as a quality receipt); real embedding
      // spaces have the cluster structure IVF cells align to, and the
      // planted corpus reproduces that regime so the adc-vs-refined
      // recall comparison measures what the refine stage actually buys.
      locally {
        val nlist = 16384
        def h(tag: String, key: Column, j: Column): Column =
          ((conv(substring(md5(concat(lit(tag), key.cast("string"),
            lit(":"), j.cast("string"))), 1, 8), 16, 10).cast("double")
            % 1000.0) / 500.0 - 1.0)
        def clusteredVec(id: Column): Column = {
          val cl = pmod(id, lit(n / 50))
          transform(sequence(lit(0), lit(63)), j =>
            (h("c", cl, j) + lit(0.15) * h("n", id, j)).cast("float"))
        }
        val cvecs = spark.range(n).select(col("id").as("vec_id"),
          clusteredVec(col("id")).as("embedding")).cache()
        cvecs.count()
        var cq: Similarity.CoarseQuantizer = null
        val queries = spark.range(20).select(col("id").as("qid"),
          clusteredVec(col("id")).as("qvec"))
        val path = java.nio.file.Files
          .createTempDirectory("coarse-ivfpq").toString + "/idx"
        val tBuild = timed {
          cq = Similarity.trainCoarseHierarchical(cvecs, "embedding",
            nlist)
          Similarity.writeIvfPqIndexHier(cvecs, path, cq,
            m = 8, ncodes = 16)
        }
        var nProbe = 0L
        var adc: Set[(Long, Long)] = Set.empty
        val tProbe = timed {
          adc = Similarity.ivfPqHierTopKFromIndex(spark, path,
              queries, 10, nprobe = 4, beam = 2)
            .select(col("qid"), col("vec_id"))
            .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
          nProbe = adc.size.toLong
        }
        // a floor, not equality: a sparse probed cell under skewed
        // synthetic occupancy can legitimately yield < k candidates
        // for a query — that is a data-distribution outcome, not an
        // engine bug the drill should die on
        require(nProbe >= 100L && nProbe <= 200L,
          s"probe rows out of range: $nProbe")
        // the refine stage: ADC shortlist (refineFactor·k) + exact
        // rerank of only the shortlist's raw vectors — wall must track
        // the probe (the shortlist broadcasts into ONE corpus scan;
        // raw vectors never shuffle — plan-guarded in
        // PlanAssertionsSpec), never a corpus rerank; recall vs exact
        // cosine must IMPROVE over raw ADC order and grow with the
        // factor, while the wall grows only with the shortlist join
        // probe count, not the corpus
        val exact = Similarity.bruteForceTopK(cvecs, queries, 10)
          .select(col("qid"), col("vec_id"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val rAdc = (exact & adc).size.toDouble / exact.size
        println(f"hier-ivfpq: nlist=$nlist t_build=$tBuild%.1f " +
          f"t_probe=$tProbe%.1f recall@10 adc=$rAdc%.2f " +
          "(clustered corpus, 20 queries, beam=2, nprobe=4)")
        for (rf <- Seq(2, 4, 8)) {
          var refined: Set[(Long, Long)] = Set.empty
          val tRefined = timed {
            refined = Similarity.ivfPqHierTopKRefined(spark, path, cvecs,
                queries, 10, nprobe = 4, beam = 2, refineFactor = rf)
              .select(col("qid"), col("vec_id"))
              .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
          }
          val rRef = (exact & refined).size.toDouble / exact.size
          println(f"  refined rf=$rf%d: t=$tRefined%.1f " +
            f"recall@10=$rRef%.2f")
        }
        cvecs.unpersist()
      }

      // Round-14 carrier leg (VERDICT r13 item 1): the quantizer OFF
      // the plan. The r13 expressions carried l2 in the case-class
      // signature — nlist·dim·8 B into every task binary, O(nlist·dim)
      // semanticEquals. Now l2 rides an explicit Broadcast and equality
      // is a content digest; under measure at the sizing the layout
      // itself targets (nlist ≥ 131072, d = 512, l2 > 0.5 GB):
      // (a) the java-serialized assign expression — what a task binary
      // carries — stays l1-sized (√nlist·d, ~KBs) while l2 grows 8×;
      // (b) 10k semanticEquals calls (plan-transform cost) stay flat;
      // (c) the assignment scan wall still moves with √nlist only.
      // The grid is SYNTHETIC (deterministic LCG floats): the carrier
      // is under measure, not the fit — fit scaling is the sweep above.
      locally {
        val rows = 50000L
        println(f"\n${"nlist"}%8s ${"dim"}%5s ${"l2_MB"}%7s " +
          f"${"expr_KB"}%8s ${"t_eq10k"}%8s ${"t_assign"}%9s")
        for ((nlist, d) <- Seq((16384, 512), (131072, 512))) {
          val k1 = math.ceil(math.sqrt(nlist.toDouble)).toInt
          val k2 = math.ceil(nlist.toDouble / k1).toInt
          def tab(n: Int, seed: Long): Array[Float] = {
            val a = new Array[Float](n); var s = seed * 2654435761L + 1L
            var i = 0
            while (i < n) {
              s = s * 6364136223846793005L + 1442695040888963407L
              a(i) = ((s >>> 40).toInt % 1000) / 500f - 1f; i += 1
            }
            a
          }
          val cq = Similarity.CoarseQuantizer(k1, k2, d,
            (0 until k1).map(i => (i, tab(d, i.toLong))),
            (0 until k1).flatMap(c1 => (0 until k2).map(c2 =>
              (c1, c2, tab(d, (c1.toLong << 20) + c2)))))
          val tables = cq.tables // digest + broadcast, once
          import org.apache.spark.sql.catalyst.expressions.BoundReference
          import org.apache.spark.sql.types.{ArrayType, FloatType}
          def mkExpr = graft.plans.CoarseAssignExpr(
            BoundReference(0, ArrayType(FloatType), nullable = true),
            k1, k2, d, tables)
          val expr = mkExpr
          val bos = new java.io.ByteArrayOutputStream()
          val oos = new java.io.ObjectOutputStream(bos)
          oos.writeObject(expr); oos.close()
          val exprKb = bos.size() / 1024.0
          val twin = mkExpr
          val tEq = timed {
            var i = 0
            while (i < 10000) {
              require(expr.semanticEquals(twin)); i += 1
            }
          }
          def vec512(id: Column): Column =
            transform(sequence(lit(0), lit(d - 1)), j =>
              ((conv(substring(md5(concat(id.cast("string"), lit(":"),
                j.cast("string"))), 1, 8), 16, 10).cast("double")
                % 1000.0) / 500.0 - 1.0).cast("float"))
          val vecs = spark.range(rows).select(
            vec512(col("id")).as("embedding"))
          val tAssign = timed {
            val nAssigned = vecs.select(
                Similarity.assignCellHier(col("embedding"), cq).as("cell"))
              .filter(col("cell").isNotNull).count()
            require(nAssigned == rows, s"assignment dropped: $nAssigned")
          }
          println(f"$nlist%8d $d%5d ${nlist.toLong * d * 8 / 1048576.0}%7.0f " +
            f"$exprKb%8.1f $tEq%8.2f $tAssign%9.1f")
        }
      }

      // Round-14 append leg (VERDICT r13 item 2): append cost ∝
      // |batch|, NOT |index|. Two hier IVF-PQ stores at 1× and 4×
      // corpus size (same clustered generator), the SAME-SIZE batch
      // appended to each: t_append must stay ~flat while the index
      // quadruples, because the append never reads the index — the
      // batch is assigned + encoded by kernel scans and lands as
      // per-group file adds.
      locally {
        val batchN = 20000L
        println(f"\n${"index_n"}%9s ${"nlist"}%6s ${"t_build"}%8s " +
          f"${"t_append"}%9s ${"probe_ok"}%9s")
        for (mult <- Seq(1, 4)) {
          val nIdx = math.max(200000L, n / 4) * mult
          def h(tag: String, key: Column, j: Column): Column =
            ((conv(substring(md5(concat(lit(tag), key.cast("string"),
              lit(":"), j.cast("string"))), 1, 8), 16, 10).cast("double")
              % 1000.0) / 500.0 - 1.0)
          def cvec(id: Column): Column = {
            val cl = pmod(id, lit(nIdx / 50))
            transform(sequence(lit(0), lit(63)), j =>
              (h("c", cl, j) + lit(0.15) * h("n", id, j)).cast("float"))
          }
          val corpus = spark.range(nIdx).select(col("id").as("vec_id"),
            cvec(col("id")).as("embedding"))
          val batch = spark.range(nIdx, nIdx + batchN)
            .select(col("id").as("vec_id"), cvec(col("id")).as("embedding"))
          val path = java.nio.file.Files
            .createTempDirectory("coarse-append").toString + "/idx"
          val nlist = 4096
          var cq: Similarity.CoarseQuantizer = null
          val tBuild = timed {
            cq = Similarity.trainCoarseHierarchical(corpus, "embedding",
              nlist)
            Similarity.writeIvfPqIndexHier(corpus, path, cq,
              m = 8, ncodes = 16)
          }
          val tAppend = timed {
            Similarity.appendIvfPqIndexHier(batch, path)
          }
          // appended rows must be searchable: probe with 5 appended
          // vectors as queries — each must surface candidates
          val queries = batch.limit(5)
            .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
          val hits = Similarity.ivfPqHierTopKFromIndex(spark, path,
            queries, 5, nprobe = 4, beam = 2).count()
          println(f"$nIdx%9d $nlist%6d $tBuild%8.1f $tAppend%9.1f " +
            f"${if (hits >= 20) "yes" else s"NO($hits)"}%9s")

          // r14 streaming-probe cost leg (on the LARGER store only):
          // annTopKStream's Scaladoc claims the one-query stream-static
          // form scans the whole slim code tree per microbatch (no
          // literal cell list exists at stream plan time) while the
          // foreachBatch form keeps the batch probe's collect-driven
          // group/cell pruning — measure both shapes for the same
          // 100-query microbatch so the documented tradeoff has
          // numbers: t_pruned = the batch probe; t_fullscan = the
          // identical join WITHOUT the isin pruning (exactly what the
          // stream-static plan executes per microbatch).
          if (mult == 4) {
            val qs = spark.range(nIdx, nIdx + 100)
              .select(col("id").as("qid"), cvec(col("id")).as("qvec"))
              .cache()
            qs.count()
            val tPruned = timed {
              Similarity.ivfPqHierTopKFromIndex(spark, path, qs, 10,
                nprobe = 4, beam = 2).count()
            }
            val meta = spark.read.parquet(s"$path/meta").head()
            val cqS = Similarity.readCoarseQuantizer(spark, path)
            val cbS = Similarity.readPqCodebooks(spark, path)
            val tFull = timed {
              val probes = qs.select(col("qid"),
                explode(Similarity.probeCellsHier(col("qvec"), cqS, 4, 2))
                  .as("cell"), col("qvec"))
              val codes = spark.read.parquet(s"$path/codes")
              val scored = codes.join(broadcast(probes), Seq("cell"))
                .select(col("qid"), col("vec_id"),
                  (-graft.plans.PqExpressions.pq_adc(col("qvec"),
                    col("codes"), cbS.ncodes, cbS.dsub, cbS.flat))
                    .as("sim"))
              scored.groupBy(col("qid"))
                .agg(graft.plans.TopKAgg.top_k_agg(10)(
                  col("sim"), col("vec_id").cast("long")).as("t"))
                .count()
            }
            println(f"  stream-probe shapes at n=$nIdx%d " +
              f"(100-query microbatch): t_pruned=$tPruned%.1f " +
              f"t_fullscan=$tFull%.1f " +
              f"(cells_per_group=${meta.getAs[Int]("cells_per_group")}%d)")
            qs.unpersist()
          }
        }
      }
    }

    // Embedding/encoding ops drill: PCA fit is ONE aggregate whose
    // shuffle is |partitions| moment buffers (corpus-size-independent);
    // projection and encoding are scans, so both must scale ~linearly
    // in rows; balanced sampling adds one capped cell shuffle. The
    // interesting failure mode at N× would be the vocab broadcast or
    // the collect_list reassembly blowing up — neither depends on
    // copies here (same text distribution), so t_enc ~ N× t_enc(1).
    import graft.operators.Embeddings
    println(f"\n${"copies"}%8s ${"vecs"}%9s ${"t_fit"}%7s ${"t_proj"}%7s " +
      f"${"docs"}%9s ${"t_enc"}%7s ${"t_bal"}%7s ${"t_ng_ex"}%7s " +
      f"${"t_ng_cms"}%8s")
    for (copies <- Seq(1, maxScale)
        if which == "all" || which == "embops") {
      val vecs = embCorpus(spark, dir, copies).cache()
      val nVecs = vecs.count()
      var model: Embeddings.PcaModel = null
      val tFit = timed {
        model = Embeddings.fitPca(vecs, "embedding", 8)
      }
      val tProj = timed {
        // sum(size(pca)) REFERENCES the projection output — a bare
        // count() column-prunes mat_project and times an empty scan
        Embeddings.pcaProject(vecs, "embedding", model)
          .select(sum(size(col("pca")))).head()
      }
      val docs = corpus(spark, dir, copies).cache()
      val nDocs = docs.count()
      val tEnc = timed {
        // force the reassembled arrays, not just the joins (see tProj)
        Corpus.encodeTokens(docs, "doc_id", "text",
          Corpus.buildVocab(docs, "text", 5000))
          .select(sum(size(col("token_ids")))).head()
      }
      val tBal = timed {
        Embeddings.balancedSample(vecs, "embedding", "vec_id",
          nlist = math.min(4096, math.max(8, (nVecs / 250).toInt)), perCell = 100).count()
      }
      // exact top-25 bigrams vs the CMS sketch over the same stream —
      // at this cardinality exact wins on CPU; the sketch's case is
      // bounded MEMORY when distinct keys outgrow the groupBy
      val tNgEx = timed { topBigramsExact(docs) }
      val tNgCms = timed {
        // size(top) references the aggregate output — count() would
        // prune cms_topk entirely and time only the explode
        docs.select(explode(Text.word_shingles(col("text"), 2)).as("b"))
          .agg(graft.plans.CmsAgg.cms_topk(25)(col("b")).as("top"))
          .select(size(col("top"))).head()
      }
      println(f"$copies%8d $nVecs%9d $tFit%7.1f $tProj%7.1f " +
        f"$nDocs%9d $tEnc%7.1f $tBal%7.1f $tNgEx%7.1f $tNgCms%8.1f")
      vecs.unpersist(); docs.unpersist()
    }

    // Round-8 BPE drill: training = ONE corpus word-count shuffle +
    // a DICTIONARY-bounded driver merge loop. Replicating the corpus
    // leaves the dictionary essentially unchanged (same words, Nx
    // counts — the perturbed copy-marker tokens add one rare word per
    // copy), so the merge loop's wall must NOT grow with copies; only
    // the distributed count pass may. Encode is map-only → ~linear.
    import graft.operators.Bpe
    println(f"\n${"copies"}%8s ${"docs"}%9s ${"merges"}%7s " +
      f"${"t_train"}%8s ${"t_encode"}%9s ${"pieces"}%12s")
    for (copies <- Seq(1, maxScale)
        if which == "all" || which == "bpe") {
      val docs = corpus(spark, dir, copies).cache()
      val nDocs = docs.count()
      var model: Bpe.BpeModel = null
      val tTrain = timed {
        model = Bpe.train(docs, "text", numMerges = 500, minCount = 2L)
      }
      var nPieces = 0L
      val tEnc = timed {
        // sum(size(pieces)) references the encode output (see tProj)
        nPieces = Bpe.encode(docs, "doc_id", "text", model)
          .agg(sum(size(col("pieces")))).head().getLong(0)
      }
      println(f"$copies%8d $nDocs%9d ${model.merges.size}%7d " +
        f"$tTrain%8.1f $tEnc%9.1f $nPieces%12d")
      docs.unpersist()
    }

    // Round-8 bloom-sidecar drill: batch-vs-index dedup where the INDEX
    // is the N× corpus and the batch a mostly-novel crawl slice — the
    // arriving-batch shape the sidecar targets. `join_rows` is how many
    // batch rows actually reach the anti-join (plain = all of them;
    // bloom = the re-crawl sliver + fpp) — the shuffle the sketch
    // eliminates. Survivor counts must be identical.
    println(f"\n${"copies"}%8s ${"index"}%9s ${"batch"}%8s " +
      f"${"join_rows"}%9s ${"t_plain"}%8s ${"t_sketch"}%9s ${"t_bloom"}%8s")
    for (copies <- Seq(1, maxScale)
        if which == "all" || which == "bloom") {
      val corpusDf = corpus(spark, dir, copies).cache()
      corpusDf.count()
      val idx = Dedup.fingerprintIndex(corpusDf, "text")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nIdx = idx.count()
      val fresh = corpus(spark, dir, 1)
        .select((col("doc_id") + 200000000L).as("doc_id"),
          concat(lit("novel "), col("text")).as("text"))
      val recrawl = corpusDf.filter(pmod(col("doc_id"), lit(7)) === 0)
        .select((col("doc_id") + 300000000L).as("doc_id"), col("text"))
      val batch = fresh.unionByName(recrawl).cache()
      val nBatch = batch.count()
      var nPlain = 0L
      val tPlain = timed {
        nPlain = Dedup.dedupAgainstIndex(batch, idx, "text", "doc_id")
          .count()
      }
      var sidecar: Array[Byte] = null
      val tSketch = timed {
        sidecar = Dedup.indexBloom(idx, expectedItems = nIdx)
      }
      var nBloom = 0L
      val tBloom = timed {
        nBloom = Dedup.dedupAgainstIndexBloom(batch, idx, "text",
          "doc_id", sidecar).count()
      }
      assert(nPlain == nBloom,
        s"bloom path diverged: plain=$nPlain bloom=$nBloom")
      val joinRows = batch
        .select(Text.fingerprint(col("text")).as("fp"))
        .filter(graft.plans.BloomProbe
          .mightContain(sidecar, xxhash64(col("fp"))))
        .count()
      println(f"$copies%8d $nIdx%9d $nBatch%8d $joinRows%9d " +
        f"$tPlain%8.1f $tSketch%9.1f $tBloom%8.1f")
      corpusDf.unpersist(); idx.unpersist(); batch.unpersist()
    }

    // Round-10 embedding-index probe drill: the persisted-index shape
    // q_dedup_incr_emb oracle-checks — index = N× corpus banded +
    // int8-quantized at WRITE time (t_write, paid once), probes = a
    // fixed-size perturbed re-crawl batch against the growing store
    // (t_probe — must stay flat-ish: |batch| banding + band equi-join +
    // |candidate| dequantized cosines, never an index rescan). Both
    // sign bases drilled; hit counts must match the planted batch.
    println(f"\n${"copies"}%8s ${"basis"}%7s ${"index"}%8s " +
      f"${"batch"}%7s ${"hits"}%7s ${"t_write"}%8s ${"t_probe"}%8s")
    for (copies <- Seq(1, maxScale);
        md5 <- Seq(false, true)
        if which == "all" || which == "embidx") {
      val vecs = embCorpus(spark, dir, copies).cache()
      vecs.count()
      val path = java.nio.file.Files
        .createTempDirectory("embidx_drill").toString + "/idx"
      val tWrite = timed {
        Dedup.writeEmbeddingIndex(vecs, path, "vec_id", "embedding",
          md5Basis = md5)
      }
      // batch: perturbed copies of 2,000 stored vectors (cosine ≥ .99)
      // — every probe must match its source at any index scale
      val batch = embCorpus(spark, dir, 1)
        .select((col("vec_id") + 900000000L).as("vec_id"),
          transform(col("embedding"), x => x + lit(0.01f))
            .as("embedding")).cache()
      val nBatch = batch.count()
      var hits = 0L
      val tProbe = timed {
        hits = Dedup.embeddingNearDupsAgainstIndex(spark, path, batch,
            "vec_id", "embedding", threshold = 0.9, md5Basis = md5)
          .select(col("batch_id")).distinct().count()
      }
      assert(hits == nBatch,
        s"probe missed planted re-crawls: $hits of $nBatch")
      println(f"$copies%8d ${if (md5) "md5" else "seed"}%7s " +
        f"${vecs.count()}%8d $nBatch%7d $hits%7d $tWrite%8.1f $tProbe%8.1f")
      vecs.unpersist(); batch.unpersist()
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(path).getParentFile)
    }

    // Round-8 DSIR drill (continuation session): the model-fit side of
    // importance resampling must stay k-BOUNDED while the corpus grows —
    // ratio rows ≤ k at any scale (the two count jobs collapse map-side)
    // — and weighting/selection must stay ~linear (slim (id, bucket)
    // shuffle + TakeOrdered). The replicated corpus keeps the en/rest
    // split, so the fitted models barely move with copies.
    import graft.operators.Dsir
    println(f"\n${"copies"}%8s ${"raw"}%9s ${"ratioRows"}%9s " +
      f"${"t_ratios"}%8s ${"t_weights"}%9s ${"t_select"}%8s")
    for (copies <- Seq(1, maxScale)
        if which == "all" || which == "dsir") {
      // corpus() drops lang; replicate inline keeping it
      val base = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"), col("lang"))
      val nBase = base.count()
      val docs = base.crossJoin(
          spark.range(copies).select(col("id").as("copy")))
        .select((col("doc_id") + col("copy") * nBase).as("doc_id"),
          when(col("copy") === 0, col("text"))
            .otherwise(concat(col("text"), lit(" variant marker token "),
              col("copy").cast("string"))).as("text"),
          col("lang")).cache()
      val target = docs.filter(col("lang") === "en")
      val raw = docs.filter(col("lang") =!= "en")
      val nRaw = raw.count()
      var ratios: org.apache.spark.sql.DataFrame = null
      val tRatios = timed {
        ratios = Dsir.logRatios(target, raw, "text", n = 2, k = 512)
      }
      val nRatio = ratios.count()
      var nW = 0L
      val tWeights = timed {
        nW = Dsir.importanceWeights(raw, "doc_id", "text", ratios,
          n = 2, k = 512).count()
      }
      val tSelect = timed {
        Dsir.select(raw, "doc_id", "text", target,
          topN = 100, n = 2, k = 512, seed = 7L).count()
      }
      assert(nW == nRaw, s"every raw doc must get a weight: $nW vs $nRaw")
      println(f"$copies%8d $nRaw%9d $nRatio%9d " +
        f"$tRatios%8.1f $tWeights%9.1f $tSelect%8.1f")
      docs.unpersist()
    }

    // Round-8 classifier drill (continuation session): the deployment
    // shape is a FIXED labeled set (training cost must not move) and an
    // N×-growing scored corpus (one scan + broadcast weight lookup →
    // ~linear). Label = marker-bucket presence, as in the query.
    import graft.operators.TextClassifier
    println(f"\n${"copies"}%8s ${"scored"}%9s ${"t_train"}%8s " +
      f"${"t_score"}%8s ${"kept"}%9s")
    for (copies <- Seq(1, maxScale)
        if which == "all" || which == "clf") {
      val wsCol = split(col("text"), "\\s+")
      val labeled = corpus(spark, dir, 1)
        .withColumn("y", array_contains(wsCol, "vector").cast("int"))
        .cache()
      labeled.count()
      val scored = corpus(spark, dir, copies).cache()
      val nScored = scored.count()
      var w: Array[Double] = null
      val tTrain = timed {
        w = TextClassifier.train(labeled, "doc_id", "text", "y",
          k = 256, iters = 4, lr = 1.0, tf = false)
      }
      var nKept = 0L
      val tScore = timed {
        nKept = TextClassifier.score(scored, "doc_id", "text", w,
          k = 256, tf = false).filter(col("score") >= 0.5).count()
      }
      println(f"$copies%8d $nScored%9d $tTrain%8.1f $tScore%8.1f $nKept%9d")
      labeled.unpersist(); scored.unpersist()
    }

    // Round-9 ubuntu OSV-flow drill: record count is the scaling axis
    // (dimensions broadcast regardless). Synthetic Canonical-shaped
    // records — every 5th is Pro-only (synthetic-envelope path), the
    // rest exercise base + Pro-append inference; one store row and one
    // USN row keep both fix-date joins live. Expect ~linear wall: the
    // only shuffles are keyed by record id.
    println(f"\n${"records"}%9s ${"envelopes"}%10s ${"t_flow"}%8s")
    for (n <- Seq(2000L, 2000L * maxScale)
        if which == "all" || which == "ubuntu") {
      import spark.implicits._
      def ev(intro: String, fixed: String) = struct(
        (if (intro == null) lit(null).cast("string") else lit(intro))
          .as("introduced"),
        (if (fixed == null) lit(null).cast("string") else lit(fixed))
          .as("fixed"))
      def aff(eco: String, pkg: String, distro: String, fix: String) =
        struct(
          struct(lit(eco).as("ecosystem"), lit(pkg).as("name"),
            lit(s"pkg:deb/ubuntu/$pkg@$fix?arch=source&distro=$distro")
              .as("purl")).as("package"),
          array(struct(lit("ECOSYSTEM").as("type"),
            array(ev("0", null), ev(null, fix)).as("events")))
            .as("ranges"))
      val recs = spark.range(n).select(struct(
        concat(lit("UBUNTU-CVE-2024-"), col("id")).as("id"),
        lit("1.7.0").as("schema_version"),
        lit("2024-01-01T00:00:00Z").as("published"),
        array(concat(lit("CVE-2024-"), col("id"))).as("upstream"),
        filter(array(
          when(col("id") % 5 =!= 0,
            aff("Ubuntu:22.04:LTS", "pkga", "jammy", "1.2-3")),
          aff("Ubuntu:Pro:22.04:LTS", "pkgb", "esm-infra/jammy",
            "9.9+esm1")),
          x => x.isNotNull).as("affected")).as("rec"))
      val fd = Seq(("CVE-2024-1", "Ubuntu:22.04:LTS", "pkga", "1.2-3",
        "2024-02-01", "first-observed"))
        .toDF("vuln_id", "ecosystem", "pkg", "version", "date", "kind")
      val usnDim = Seq(("Ubuntu:Pro:22.04:LTS", "pkgb", "9.9+esm1",
        "2024-03-01")).toDF("ecosystem", "pkg", "version", "date")
      var cnt = 0L
      val tFlow = timed {
        cnt = graft.providers.UbuntuProvider
          .envelopes(recs, None, Some(fd), Some(usnDim)).count()
      }
      println(f"$n%9d $cnt%10d $tFlow%8.1f")
    }

    // Round-10 wide-record drill: the slicing regroup must ship the
    // record across the exchange ONCE, not once per affected entry
    // (VERDICT r9 item 2). Records carry a fat 4 KB details field and
    // W ecosystems; under the old rec-keyed regroup shuffle bytes
    // scaled ~W×4 KB per record, under the slim (id, eco, pos, entry)
    // regroup the fat payload crosses once however many ecosystems the
    // record spans — 25× the slices must NOT read as ~25× the bytes.
    if (which == "all" || which == "ubuntu") {
      import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
      val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
      val listener = new SparkListener {
        override def onStageCompleted(
            sc: SparkListenerStageCompleted): Unit =
          shuffleBytes.addAndGet(
            sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
      println(f"\n${"ecos/rec"}%9s ${"envelopes"}%10s ${"shuffleMB"}%10s " +
        f"${"t_flow"}%8s")
      for (w <- Seq(2, 50)) {
        def ev(intro: String, fixed: String) = struct(
          (if (intro == null) lit(null).cast("string") else lit(intro))
            .as("introduced"),
          (if (fixed == null) lit(null).cast("string") else lit(fixed))
            .as("fixed"))
        def affC(eco: org.apache.spark.sql.Column) = struct(
          struct(eco.as("ecosystem"), lit("pkga").as("name"),
            lit("pkg:deb/ubuntu/pkga@1.2-3?arch=source&distro=jammy")
              .as("purl")).as("package"),
          array(struct(lit("ECOSYSTEM").as("type"),
            array(ev("0", null), ev(null, "1.2-3")).as("events")))
            .as("ranges"))
        val recs = spark.range(2000).select(struct(
          concat(lit("UBUNTU-CVE-2024-"), col("id")).as("id"),
          lit("1.7.0").as("schema_version"),
          lit("x" * 4096).as("details"),
          lit("2024-01-01T00:00:00Z").as("published"),
          array(concat(lit("CVE-2024-"), col("id"))).as("upstream"),
          transform(sequence(lit(1), lit(w)), i =>
            affC(concat(lit("Ubuntu:"), i.cast("string"), lit(".04:LTS"))))
            .as("affected")).as("rec"))
        spark.sparkContext.addSparkListener(listener)
        shuffleBytes.set(0L)
        var cnt = 0L
        val tFlow = timed {
          cnt = graft.providers.UbuntuProvider.envelopes(recs, None).count()
        }
        // let the listener bus drain: poll until the counter is stable
        // for two consecutive reads (a fixed sleep dropped late
        // stage-completed events on a loaded machine), bounded at 10 s
        var stable = 0
        var last = -1L
        var polls = 0
        while (stable < 2 && polls < 50) {
          Thread.sleep(200)
          val now = shuffleBytes.get
          stable = if (now == last) stable + 1 else 0
          last = now
          polls += 1
        }
        spark.sparkContext.removeSparkListener(listener)
        val mb = shuffleBytes.get / 1e6
        println(f"$w%9d $cnt%10d $mb%10.1f $tFlow%8.1f")
      }
    }
    // ---- r15 drills -----------------------------------------------------

    if (which == "ingest500") {
      // Continuous-ingestion drill (the r14 verdict's done-bar): 500
      // sequential microbatch appends into ONE hier IVF-PQ store under
      // the r15 atomic-sidecar protocol, pre-loaded quantizer/codebooks
      // (the annIngestBatch shape). Must hold: (a) sidecar file counts
      // stay BOUNDED — one live meta version, one live log file — not
      // one file per append; (b) a concurrent reader (meta row, append
      // log, a probe) succeeds after EVERY append: zero torn-store
      // refusals; (c) append wall flat first-100 vs last-100 (cost ∝
      // |batch|, the store is never read); (d) probe wall flat as the
      // store grows, compaction on a 100-append cadence bounding
      // per-group fragmentation.
      import org.apache.spark.sql.Column
      val nAppends = 500
      val batchN = 50L
      val bootN = 20000L
      def hv(tag: String, key: Column, j: Column): Column =
        (pmod(hash(lit(tag), key, j), lit(1000)).cast("double") / 500.0
          - 1.0)
      def cvec(id: Column): Column = {
        val cl = pmod(id, lit(50L))
        transform(sequence(lit(0), lit(63)), j =>
          (hv("c", cl, j) + lit(0.15) * hv("n", id, j)).cast("float"))
      }
      val boot = spark.range(bootN).select(col("id").as("vec_id"),
        cvec(col("id")).as("embedding"))
      val path = java.nio.file.Files
        .createTempDirectory("ingest500").toString + "/idx"
      val cq0 = Similarity.trainCoarseHierarchical(boot, "embedding", 256)
      Similarity.writeIvfPqIndexHier(boot, path, cq0, m = 8, ncodes = 16)
      val preCq = Similarity.readCoarseQuantizer(spark, path)
      val cb = Similarity.readPqCodebooks(spark, path)
      // one bootstrap append BEFORE the racing reader starts: the
      // reader's contract assumes an appended store (readAppendLog on
      // a never-appended store throws by contract — a racing reader
      // during the very first append would count that legitimate
      // refusal as a protocol failure)
      Similarity.appendIvfPqIndexHierWith(
        spark.range(bootN + nAppends * batchN,
            bootN + nAppends * batchN + batchN)
          .select(col("id").as("vec_id"), cvec(col("id")).as("embedding")),
        path, preCq, cb)
      val queries = spark.range(5).select(col("id").as("qid"),
        cvec(col("id")).as("qvec")).cache()
      queries.count()
      def files(sub: String): Int =
        Option(new java.io.File(s"$path/$sub").listFiles())
          .map(_.count(f => f.isFile && f.getName.endsWith(".parquet")))
          .getOrElse(0)
      def maxGrpFiles: Int =
        new java.io.File(s"$path/codes").listFiles()
          .filter(f => f.isDirectory && f.getName.startsWith("cell_grp="))
          .map(_.listFiles().count(f => f.isFile &&
            f.getName.endsWith(".parquet"))).max
      val walls = new Array[Double](nAppends)
      var tornRefusals = 0
      // a GENUINELY concurrent reader: its own thread hammers the
      // manifest surfaces (meta row, residual flag, append-log count)
      // the whole time the 500 appends run — the exact race the
      // versioned-swap protocol (publish-then-sweep + reader
      // re-resolve/retry) exists to win. Sequential simulation can
      // never hit the rename→sweep window; this does, thousands of
      // times.
      val raceFailures = new java.util.concurrent.atomic.AtomicLong(0)
      val raceReads = new java.util.concurrent.atomic.AtomicLong(0)
      val compactRefusals = new java.util.concurrent.atomic.AtomicLong(0)
      @volatile var ingestDone = false
      // compaction is the documented torn-by-design maintenance window
      // (meta off while group dirs swap): reader refusals STRADDLING a
      // compaction are the protocol working, not a failure — only a
      // refusal whose whole attempt ran outside any compaction window
      // counts against the never-torn APPEND promise
      @volatile var compacting = false
      val reader = new Thread(() => {
        while (!ingestDone) {
          val startedClean = !compacting
          try {
            require(!Similarity.readIvfPqHierMeta(spark, path))
            require(Similarity.readAppendLog(spark, path).count() >= 0)
            raceReads.incrementAndGet()
          } catch {
            case _: InterruptedException => ()
            case e: Exception =>
              if (startedClean && !compacting) {
                raceFailures.incrementAndGet()
                println(s"  racing reader failed: ${e.getClass.getName}: " +
                  s"${String.valueOf(e.getMessage).take(160)}")
              } else {
                compactRefusals.incrementAndGet()
                // loud refusal is the documented behavior; don't spin
                // at FS speed against a window we know is torn
                Thread.sleep(20)
              }
          }
        }
      }, "ingest500-racing-reader")
      reader.setDaemon(true)
      reader.start()
      println(f"\n${"appends"}%8s ${"meta_f"}%7s ${"log_f"}%6s " +
        f"${"max_grp_f"}%10s ${"t_compact"}%10s ${"t_probe"}%8s")
      for (i <- 0 until nAppends) {
        val lo = bootN + i * batchN
        val batch = spark.range(lo, lo + batchN)
          .select(col("id").as("vec_id"), cvec(col("id")).as("embedding"))
        walls(i) = timed {
          Similarity.appendIvfPqIndexHierWith(batch, path, preCq, cb)
          ()
        }
        // the concurrent-reader simulation: every surface an audit or
        // probe touches must resolve between (and conceptually during)
        // appends — the atomic protocol's promise
        try {
          require(Similarity.readAppendLog(spark, path).count() > 0)
          require(!Similarity.readIvfPqHierMeta(spark, path))
        } catch { case _: Exception => tornRefusals += 1 }
        if ((i + 1) % 100 == 0) {
          compacting = true
          val tCompact = timed {
            Similarity.compactIvfPqIndexHier(spark, path,
              maxFilesPerGroup = 4)
          }
          compacting = false
          val tProbe = timed {
            require(Similarity.ivfPqHierTopKFromIndex(spark, path,
              queries, 10, nprobe = 4, beam = 2).count() >= 40)
          }
          println(f"${i + 1}%8d ${files("meta")}%7d ${files("appends")}%6d " +
            f"$maxGrpFiles%10d $tCompact%10.1f $tProbe%8.1f")
        }
      }
      ingestDone = true
      reader.join(30000)
      val first100 = walls.take(100).sum / 100
      val last100 = walls.takeRight(100).sum / 100
      println(f"append wall: first100=$first100%.2f s/batch " +
        f"last100=$last100%.2f s/batch torn_refusals=$tornRefusals " +
        f"log_rows=${Similarity.readAppendLog(spark, path).count()} " +
        f"racing_reads=${raceReads.get} racing_failures=" +
        f"${raceFailures.get} compact_window_refusals=" +
        f"${compactRefusals.get}")
      require(tornRefusals == 0, "a reader hit a torn store")
      require(raceFailures.get == 0,
        "the CONCURRENT racing reader hit a torn/vanished sidecar " +
          "OUTSIDE a compaction window - the never-torn append " +
          "promise broke")
      require(raceReads.get > 100,
        "racing reader barely ran - the drill didn't race anything")
      require(files("meta") <= 2 && files("appends") <= 2,
        "sidecar file counts must stay bounded")
      queries.unpersist()
    }

    if (which == "lazyprobe") {
      // Lazy-probe residency drill (the r14 verdict item 3 done-bar):
      // nlist = 10^6 (k1 = k2 = 1000) at d = 1024 — the l2 grid is
      // 10^6·1024 doubles ≈ 8 GB resident per executor on the
      // broadcast carrier, PAST its documented ceiling. The lazy probe
      // runs the same two-stage search with the quantizer sidecar
      // staying ON DISK: measured as (a) JVM heap delta ≪ l2 size, (b)
      // bytes READ from the sidecar scan ≪ its full size (file +
      // row-group pruning over the c1-sorted layout — opened cells are
      // |q|·beam of k1). Sidecars are synthesized directly (the coarse
      // drill owns fit cost; this leg measures probe I/O shape), and
      // the lazy ≡ kernel law is pinned at fixture size in CoarseSpec
      // + the strict q_sim_ivf_hier_lazy oracle.
      import org.apache.spark.sql.Column
      val k1 = 1000; val k2 = 1000; val d = 1024
      val path = java.nio.file.Files
        .createTempDirectory("lazyprobe").toString + "/idx"
      def hv(tag: String, a: Column, b: Column): Column =
        (pmod(hash(lit(tag), a, b), lit(1000)).cast("double") / 500.0
          - 1.0)
      def vecOf(tag: String, key: Column): Column =
        transform(sequence(lit(0), lit(d - 1)), j =>
          hv(tag, key, j).cast("float"))
      var t = timed {
        spark.range(k1).select(col("id").cast("int").as("c1"),
            vecOf("l1", col("id")).as("centroid"))
          .coalesce(1).write.parquet(s"$path/l1")
        spark.range(k1.toLong * k2).select(
            (col("id") / k2).cast("int").as("c1"),
            pmod(col("id"), lit(k2.toLong)).cast("int").as("c2"),
            vecOf("l2", col("id")).as("centroid"))
          .repartitionByRange(32, col("c1"))
          .sortWithinPartitions(col("c1"), col("c2"))
          .write.parquet(s"$path/quantizer")
        import spark.implicits._
        Seq((k1, k2, d, 64, 0.1))
          .toDF("k1", "k2", "dim", "cells_per_group", "base_distortion")
          .coalesce(1).write.parquet(s"$path/meta")
        // a 200k-row index tree (cells hashed over the grid): the
        // rerank side — small next to the 8 GB quantizer, which is the
        // object under measurement
        spark.range(200000L).select(col("id").as("vec_id"),
            vecOf("x", col("id")).as("embedding"),
            pmod(hash(col("id")), lit(k1 * k2)).as("cell"))
          .withColumn("cell_grp", (col("cell") / 64).cast("int"))
          .repartition(col("cell_grp"))
          .write.partitionBy("cell_grp").parquet(s"$path/index")
      }
      def dirBytes(sub: String): Long =
        new java.io.File(s"$path/$sub").listFiles()
          .filter(_.isFile).map(_.length()).sum
      val qBytes = dirBytes("quantizer")
      println(f"\nsidecars built in $t%.0f s; quantizer on disk = " +
        f"${qBytes / 1048576.0}%.0f MB (l2 as doubles would be " +
        f"${k1.toLong * k2 * d * 8 / 1048576.0}%.0f MB per executor)")
      val bytesRead = new java.util.concurrent.atomic.AtomicLong(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (e.taskMetrics != null)
            bytesRead.addAndGet(e.taskMetrics.inputMetrics.bytesRead)
      }
      val queries = spark.range(8).select(col("id").as("qid"),
        vecOf("q", col("id")).as("qvec"))
      val rt = Runtime.getRuntime
      System.gc()
      val heapBefore = rt.totalMemory() - rt.freeMemory()
      spark.sparkContext.addSparkListener(listener)
      var rows = 0L
      t = timed {
        rows = Similarity.ivfHierTopKFromIndexLazy(spark, path, queries,
          10, nprobe = 4, beam = 2).count()
      }
      // drain the listener bus (the ubuntu-envelopes leg's polling
      // pattern): bytesRead must be stable before we read it
      var stable = 0; var last = -1L; var polls = 0
      while (stable < 2 && polls < 50) {
        Thread.sleep(200)
        val now = bytesRead.get
        stable = if (now == last) stable + 1 else 0
        last = now; polls += 1
      }
      spark.sparkContext.removeSparkListener(listener)
      System.gc()
      val heapAfter = rt.totalMemory() - rt.freeMemory()
      val mb = bytesRead.get / 1048576.0
      println(f"lazy probe: rows=$rows wall=$t%.1f s " +
        f"bytes_read=$mb%.0f MB (${100.0 * bytesRead.get / qBytes}%.0f%% " +
        f"of the sidecar) heap_delta=" +
        f"${(heapAfter - heapBefore) / 1048576.0}%.0f MB")
      require(rows > 0, "lazy probe returned nothing")
      // the residency law: the probe must NOT have read (or held)
      // anything near the whole grid — 8 queries × beam 2 open ≤ 16 of
      // 1000 c1 groups (1.6%); scan overshoot past 40% of the sidecar
      // means pruning broke
      require(bytesRead.get < qBytes * 2 / 5,
        s"lazy probe read ${bytesRead.get} of $qBytes sidecar bytes - " +
          "row-group pruning broke")
    }

    if (which == "appendlog") {
      // r16 drill (verdict item: segment the appends log). The pre-r16
      // log rewrote WHOLE per append — O(n)/append, O(n²) cumulative:
      // trivial to ~10⁵ appends but a real wall for a years-long
      // minute-cadence ingest. The segmented log seals the active
      // sidecar into an immutable seg-*.parquet every 512 rows, so
      // per-append cost is O(segment) FLAT and file counts stay
      // bounded (1 seg per 512 appends; compaction merges to one).
      // This leg drives the log protocol directly (the data-tree cost
      // around it is ingest500's subject): N appends in W windows —
      // flat ms/append across windows for the segmented log, visibly
      // climbing for the unsegmented shape (segmentRows = MaxValue
      // reproduces the pre-r16 behavior on the same code path) — then
      // a compaction merge back to one live file with zero row loss.
      // The marginal-cost-vs-store-age measurement: row-by-row
      // appending to a 10⁶-age store would take days, so store AGE is
      // SEEDED directly in the on-disk protocol layout (plain file
      // copies — no private surface) and the drill measures the
      // MARGINAL cost of the next appends at each age. Pre-r16 shape
      // (one whole-log active file, segmentRows = MaxValue so the
      // same code path never seals) must grow with age; the
      // segmented log must stay flat.
      import java.nio.file.{Files, Paths, StandardCopyOption}
      def partFileOf(rows: Long): java.nio.file.Path = {
        val t = Files.createTempDirectory("applog_part").toString
        spark.range(rows).select(col("id").as("n_rows"),
            lit(0.1).as("distortion"), lit(0.1).as("base_distortion"),
            lit(2.0).as("refit_threshold"))
          .coalesce(1).write.mode("overwrite").parquet(t)
        new java.io.File(t).listFiles()
          .find(_.getName.endsWith(".parquet")).get.toPath
      }
      val segPart = partFileOf(512)    // one sealed-segment body
      val smallPart = partFileOf(100)  // a part-full active sidecar
      def seed(age: Long, segmented: Boolean): String = {
        val p = Files.createTempDirectory(
          s"applog_${if (segmented) "seg" else "unseg"}_$age").toString +
          "/idx"
        val dir = s"$p/appends"
        Files.createDirectories(Paths.get(dir))
        if (segmented) {
          val nSegs = age / 512
          (1L to nSegs).foreach(i => Files.copy(segPart,
            Paths.get(dir, f"seg-$i%012d.parquet"),
            StandardCopyOption.REPLACE_EXISTING))
          Files.copy(smallPart,
            Paths.get(dir, "v0000000000000001.parquet"))
        } else {
          Files.copy(partFileOf(age),
            Paths.get(dir, "v0000000000000001.parquet"))
        }
        p
      }
      val perAge = 20
      var segBig: String = null
      for (age <- Seq(10000L, 100000L, 1000000L)) {
        val rows = new Array[Double](2)
        for ((segmented, slot) <- Seq((true, 0), (false, 1))) {
          val p = seed(age, segmented)
          if (segmented && age == 1000000L) segBig = p
          val t0 = System.nanoTime()
          for (i <- 0 until perAge)
            graft.operators.Similarity.appendLogRowSeg(spark, p,
              i.toLong, 0.1, 0.1, 2.0,
              if (segmented) 512 else Int.MaxValue)
          rows(slot) = (System.nanoTime() - t0) / 1e9 / perAge * 1000
        }
        println(f"appendlog age=$age%8d: seg512 ${rows(0)}%7.1f " +
          f"ms/append | unseg ${rows(1)}%8.1f ms/append")
      }
      // merge the 10⁶-age segmented store back to one live file
      val before = graft.operators.Similarity
        .readAppendLog(spark, segBig).count()
      val t0 = System.nanoTime()
      graft.operators.Similarity.compactAppendLog(spark, segBig)
      val files = new java.io.File(s"$segBig/appends").listFiles()
        .count(_.getName.endsWith(".parquet"))
      val total = graft.operators.Similarity.readAppendLog(spark, segBig)
        .count()
      println(f"appendlog merge at age 10^6: " +
        f"${(System.nanoTime() - t0) / 1e9}%5.1f s → $files file(s), " +
        f"$total rows (was $before)")
      require(files == 1 && total == before,
        "compaction must merge to one live file with zero row loss")
    }

    if (which == "streamx") {
      // Streaming-probe crossover drill (the r14 verdict item 6): the
      // r14 measurement said the FULL-tree stream-static scan beats
      // the pruned batch probe at 10^6 codes (0.6 vs 1.2 s / 100-query
      // microbatch) because pruning pays sidecar reads + a probe
      // checkpoint + a cell collect per batch while the slim tree is
      // ~40 MB. Scale the tree until the pruned form wins and record
      // the rule. Same two shapes as the r14 leg, same 100-query
      // microbatch, hash-based generator (md5 would dominate the build
      // at 10^7+).
      import org.apache.spark.sql.Column
      def hv(tag: String, key: Column, j: Column): Column =
        (pmod(hash(lit(tag), key, j), lit(1000)).cast("double") / 500.0
          - 1.0)
      // stores are SYNTHESIZED structurally (complete quantizer grid,
      // complete codebooks, hashed cells, hashed 8-int codes): this is
      // a probe COST drill — both shapes run the identical plans a
      // trained store would, but a real fit+encode at 10^8 rows is a
      // build-cost question the coarse drill owns (and OOMs a single
      // 24 GB host before the probe question even starts). Recall is
      // pinned at fixture size by the strict oracles.
      // config dials: the DEFAULT (nlist=4096, 100-query microbatch)
      // is the r14 leg's shape; the 100 TB shape is nlist ∝ √n with
      // small batches (SPARK_GRAFT_STREAMX_K1=256 → nlist=65,536,
      // SPARK_GRAFT_STREAMX_QN=10), where probed cells ≪ nlist and
      // pruning actually prunes
      val k1x = sys.env.getOrElse("SPARK_GRAFT_STREAMX_K1", "64").toInt
      val k2x = k1x; val d = 64
      val qn = sys.env.getOrElse("SPARK_GRAFT_STREAMX_QN", "100").toInt
      println(f"\nnlist=${k1x * k2x} microbatch=$qn queries")
      println(f"${"codes_n"}%9s ${"tree_mb"}%8s ${"t_build"}%8s " +
        f"${"t_pruned"}%9s ${"t_fullscan"}%11s ${"winner"}%8s")
      for (n <- Seq(1000000L, 10000000L, 30000000L, 100000000L)
          if n <= 3000000L * maxScale) {
        def cvec(id: Column): Column = {
          val cl = pmod(id, lit(n / 50))
          transform(sequence(lit(0), lit(63)), j =>
            (hv("c", cl, j) + lit(0.15) * hv("n", id, j)).cast("float"))
        }
        val path = java.nio.file.Files
          .createTempDirectory("streamx").toString + "/idx"
        val nlist = k1x * k2x
        def vecOf(tag: String, key: Column): Column =
          transform(sequence(lit(0), lit(d - 1)), j =>
            hv(tag, key, j).cast("float"))
        val tBuild = timed {
          spark.range(k1x).select(col("id").cast("int").as("c1"),
              vecOf("l1", col("id")).as("centroid"))
            .coalesce(1).write.parquet(s"$path/l1")
          spark.range(nlist).select((col("id") / k2x).cast("int").as("c1"),
              pmod(col("id"), lit(k2x.toLong)).cast("int").as("c2"),
              vecOf("l2", col("id")).as("centroid"))
            .coalesce(1).write.parquet(s"$path/quantizer")
          spark.range(8 * 16).select((col("id") / 16).cast("int").as("sub"),
              pmod(col("id"), lit(16L)).cast("int").as("code"),
              transform(sequence(lit(0), lit(7)), j =>
                hv("cb", col("id"), j).cast("float")).as("centroid"))
            .coalesce(1).write.parquet(s"$path/codebooks")
          import spark.implicits._
          Seq((k1x, k2x, d, false, 64, 0.1)).toDF("k1", "k2", "dim",
              "residual", "cells_per_group", "base_distortion")
            .coalesce(1).write.parquet(s"$path/meta")
          spark.range(n).select(col("id").as("vec_id"),
              pmod(hash(col("id")), lit(nlist)).as("cell"),
              transform(sequence(lit(0), lit(7)), j =>
                pmod(hash(col("id"), j), lit(16))).as("codes"))
            .withColumn("cell_grp", (col("cell") / 64).cast("int"))
            .repartition(col("cell_grp"))
            .sortWithinPartitions(col("cell"))
            .write.partitionBy("cell_grp").parquet(s"$path/codes")
        }
        val treeMb = {
          def walk(f: java.io.File): Long =
            if (f.isFile) f.length()
            else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
          walk(new java.io.File(s"$path/codes")) / 1048576.0
        }
        val qs = spark.range(n, n + qn)
          .select(col("id").as("qid"), cvec(col("id")).as("qvec"))
          .cache()
        qs.count()
        val tPruned = timed {
          Similarity.ivfPqHierTopKFromIndex(spark, path, qs, 10,
            nprobe = 4, beam = 2).count()
        }
        val cqS = Similarity.readCoarseQuantizer(spark, path)
        val cbS = Similarity.readPqCodebooks(spark, path)
        val tFull = timed {
          val probes = qs.select(col("qid"),
            explode(Similarity.probeCellsHier(col("qvec"), cqS, 4, 2))
              .as("cell"), col("qvec"))
          val codes = spark.read.parquet(s"$path/codes")
          val scored = codes.join(broadcast(probes), Seq("cell"))
            .select(col("qid"), col("vec_id"),
              (-graft.plans.PqExpressions.pq_adc(col("qvec"),
                col("codes"), cbS.ncodes, cbS.dsub, cbS.flat))
                .as("sim"))
          scored.groupBy(col("qid"))
            .agg(graft.plans.TopKAgg.top_k_agg(10)(
              col("sim"), col("vec_id").cast("long")).as("t"))
            .count()
        }
        println(f"$n%9d $treeMb%8.0f $tBuild%8.0f $tPruned%9.1f " +
          f"$tFull%11.1f ${if (tPruned < tFull) "pruned" else "full"}%8s")
        qs.unpersist()
      }
    }

    spark.stop()
  }
}
