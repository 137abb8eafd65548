package graft

import org.scalatest.funsuite.AnyFunSuite

/** Regression guards on the physical plans: the scale posture (pushdown,
  * broadcast, pruning) must survive refactors — a query that silently
  * starts shuffling its fact side still passes correctness, so
  * correctness tests alone won't catch it. */
class PlanAssertionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir)
      .queryExecution.executedPlan.toString

  test("q_agg_pricing pushes the shipdate filter into the parquet scan") {
    val p = plan("q_agg_pricing")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
  }

  test("q_agg_pricing prunes to the referenced columns only") {
    val p = plan("q_agg_pricing")
    assert(!p.contains("l_orderkey"), "unreferenced column not pruned")
    assert(!p.contains("l_tax"), "unreferenced column not pruned")
  }

  test("q_join_enrich broadcasts the dimension, never shuffles lineitem") {
    val p = plan("q_join_enrich")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q_join_multiway is a pure broadcast chain") {
    val p = plan("q_join_multiway")
    assert("BroadcastHashJoin".r.findAllIn(p).length == 3)
    assert(!p.contains("SortMergeJoin"))
  }

  test("q_sim_bruteforce broadcasts queries; corpus side stays unshuffled") {
    val p = plan("q_sim_bruteforce")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("decorator joins broadcast the aux dimension, fact side unshuffled") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rows = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey").cast("string").as("cve"))
    val kev = Seq("1", "2").toDF("cve")
    val eol = graft.providers.AuxProviders.eolCycles(spark,
      getClass.getResource("/fixtures/eol.json").getPath)
    val p = graft.operators.Decorators.withEol(
      graft.operators.Decorators.withKev(rows, kev)
        .withColumnRenamed("cve", "namespace"), eol)
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(p).length == 2)
    assert(!p.contains("SortMergeJoin"))
    // the ONE hash exchange is withKev's distinct on the dimension
    // side, pre-broadcast; the fact scan feeds both joins directly
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      "fact side must not shuffle for decorator joins")
  }

  test("q_decontaminate_bloom probes the sketch map-side before any exchange") {
    val exec = SparkEntry.queries("q_decontaminate_bloom")(spark, dir)
      .queryExecution.executedPlan match {
      // AQE wraps the plan in a leaf node; collect needs the inner tree
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.inputPlan
      case p => p
    }
    assert(exec.toString.contains("LeftSemi"),
      "exact verify semi-join missing")
    // the might_contain Filter over the CORPUS shingles must have no
    // Exchange beneath it — clean shingles die in the scan stage, so
    // nothing but true hits + the fpp sliver is ever shuffled
    val probes = exec.collect {
      case f: org.apache.spark.sql.execution.FilterExec
          if f.condition.toString.contains("might_contain") => f
    }
    assert(probes.nonEmpty, "bloom probe missing from the plan")
    assert(probes.forall(_.collect {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e
    }.isEmpty), "bloom probe must run before any exchange")
  }

  test("q_rpm_stream_reduce partial-aggregates before the exchange") {
    val p = plan("q_rpm_stream_reduce")
    // ObjectHashAggregate partial_rpmstreamreduce runs map-side: the
    // aggregate appears below AND above the shuffle
    assert(p.contains("partial_"), s"no partial aggregation:\n$p")
  }

  test("JaccardLengthPruning injects the O(1) size guard before the merge") {
    graft.plans.GraftExtensions.register(spark)
    val p = plan("q_dedup_minhash")
    // the guard shape: size(__sh) cast to double compared against t*size
    assert(p.contains("size(__sh"), s"no length guard in plan:\n$p")
    assert(p.contains("sorted_jaccard"), "kernel disappeared from plan")
  }

  test("JaccardLengthPruning preserves results exactly") {
    import org.apache.spark.sql.functions._
    import graft.plans.HashExpressions._
    import spark.implicits._
    val texts = Seq(
      (1L, "a b c d e f g h"), (2L, "a b c d e f g x"),
      (3L, "a b"), (4L, "totally different words here now ok"))
    // engine-independent ground truth: word-3-gram set Jaccard in Scala
    // (the earlier test already registered the rule on the shared
    // session, so a Spark "no-rule" baseline would be rule-on anyway)
    def shingles(t: String): Set[String] = {
      val w = t.split("\\s+").toSeq
      if (w.length <= 3) Set(w.mkString(" "))
      else w.sliding(3).map(_.mkString(" ")).toSet
    }
    val expected = (for {
      (i, ti) <- texts; (j, tj) <- texts if i < j
      inter = shingles(ti).intersect(shingles(tj)).size.toDouble
      union = shingles(ti).union(shingles(tj)).size.toDouble
      if math.rint(inter / union * 1000) / 1000 >= 0.4
    } yield (i, j)).toSet
    val df = texts.toDF("id", "text")
      .select(col("id"), word_shingle_hashes(col("text"), 3).as("sh"))
    graft.plans.GraftExtensions.register(spark)
    val withRule = df.as("l").join(df.as("r"), col("l.id") < col("r.id"))
      .select(col("l.id").as("id1"), col("r.id").as("id2"),
        round(sorted_jaccard(col("l.sh"), col("r.sh")), 3).as("j"))
      .filter(col("j") >= 0.4)
    assert(withRule.queryExecution.optimizedPlan.toString.contains("size("),
      "rule did not fire on the guardable filter")
    assert(withRule.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      == expected)
  }

  test("q_sim_ivf never exchanges embedding vectors") {
    val p = plan("q_sim_ivf") // builds the index on first touch
    // Cell assignment is a literal-centroid expression and probes are
    // broadcast: the only allowed Exchange carries (qid, id, sim)
    // candidate triples into the top-k window. An Exchange whose
    // output includes an embedding/qvec column means the corpus
    // vectors started shuffling again (the round-2 regression).
    val exchanges = p.split("\n").filter(_.contains("Exchange hashpartitioning"))
    assert(exchanges.forall(l =>
      !l.contains("embedding") && !l.contains("qvec")),
      s"vector column in an Exchange:\n${exchanges.mkString("\n")}")
    // and the probe must prune index partitions at the file listing
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(p).isDefined,
      s"no partition pruning in plan:\n$p")
  }

  test("q_sim_ivf_hier: kernel probe, partition pruning, vectors " +
      "never exchange") {
    val p = plan("q_sim_ivf_hier") // builds the index on first touch
    // (the coarse_probe kernel itself sits behind the probe frame's
    // localCheckpoint, like the flat path's probeCells — CoarseSpec
    // pins its semantics; this guard pins the rerank plan shape)
    // same vector-exchange law as the flat path
    val exchanges = p.split("\n").filter(_.contains("Exchange hashpartitioning"))
    assert(exchanges.forall(l =>
      !l.contains("embedding") && !l.contains("qvec")),
      s"vector column in an Exchange:\n${exchanges.mkString("\n")}")
    // and the probed cells prune index partitions at the file listing
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(p).isDefined,
      s"no partition pruning in plan:\n$p")
  }

  test("q_sim_ivf_hier_lazy: the lazy probe's rerank keeps the kernel " +
      "path's plan laws — partition pruning, vectors never exchange, " +
      "and NO l2-table broadcast variable anywhere") {
    val p = plan("q_sim_ivf_hier_lazy")
    // same vector-exchange law as the kernel path: the probe frame is
    // checkpointed, so the final plan is the pruned index scan + the
    // broadcast probes rerank — an Exchange carrying an embedding
    // column would mean the lazy re-plumbing broke the rerank shape
    val exchanges = p.split("\n").filter(_.contains("Exchange hashpartitioning"))
    assert(exchanges.forall(l =>
      !l.contains("embedding") && !l.contains("qvec")),
      s"vector column in an Exchange:\n${exchanges.mkString("\n")}")
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(p).isDefined,
      s"no partition pruning in plan:\n$p")
    // the whole point of the lazy shape: no coarse_probe kernel (and
    // with it no whole-l2 broadcast) in the final rerank plan
    assert(!p.contains("coarse_probe"),
      s"lazy probe plan still carries the kernel probe:\n$p")
  }

  test("q_sim_knn_ivfpq_hier_lazy: ADC kernel on the pruned code " +
      "scan, no kernel probe / whole-l2 broadcast, nothing exchanges " +
      "vectors or codes") {
    val p = plan("q_sim_knn_ivfpq_hier_lazy")
    assert(p.contains("pq_adc"), "ADC must be the codegen kernel")
    assert("PartitionFilters: \\[[^\\]]*cell_grp".r.findFirstIn(p).isDefined,
      s"no group pruning in plan:\n$p")
    assert(!p.contains("coarse_probe"),
      s"lazy probe plan still carries the kernel probe:\n$p")
    val exchanges = p.split("\n").filter(_.contains("Exchange hashpartitioning"))
    assert(exchanges.forall(l =>
      !l.contains("embedding") && !l.contains("qvec") &&
        !l.contains("codes")),
      s"vector/code column in an Exchange:\n${exchanges.mkString("\n")}")
  }

  test("q_multimodal_frame_dedup: the pairing plan never carries " +
      "pixels — only the staged 16-byte (frame_id, phash) rows band, " +
      "shuffle and verify; the Hamming check is codegen bit_count") {
    val p = plan("q_multimodal_frame_dedup")
    assert(!p.contains("content"),
      s"frame content bytes in the pairing plan:\n$p")
    assert(p.contains("bit_count"), "Hamming verify must be bit_count")
    // the banding exchange carries only the slim band keys/ids — a
    // phash column in an Exchange is fine (8 bytes), raster/binary
    // columns are not (there are none in the staged input by design,
    // so this pins the INPUT shape too)
    assert(p.contains("Exchange hashpartitioning"),
      "banding must be an equi-shuffle on band keys")
  }

  test("q_sim_hier_append_audit: appended-batch filter pushes to the " +
      "index scan; the one-row log broadcasts; no shuffle anywhere") {
    val p = plan("q_sim_hier_append_audit")
    // the audit reads ONLY the appended half: vec_id >= 400 reaches
    // the parquet scan as a pushed filter, the single-row appends log
    // rides a broadcast join, and nothing exchanges
    assert(p.contains("PushedFilters: [IsNotNull(vec_id), GreaterThanOrEqual(vec_id,400)]")
      || p.contains("GreaterThanOrEqual(vec_id,400)"), s"filter not pushed:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"))
    assert(!p.contains("Exchange hashpartitioning"),
      s"unexpected shuffle in the audit plan:\n$p")
  }

  test("q_sim_knn_ivfpq_hier_refined: shortlist broadcasts into the " +
      "corpus scan — raw vectors are read once, never shuffled") {
    val p = plan("q_sim_knn_ivfpq_hier_refined")
    // the refine stage's whole point: the ADC shortlist (|q|·k·factor
    // rows) and the query set broadcast; the corpus vector scan is the
    // STREAMED side of hash joins — no SortMergeJoin, and no Exchange
    // may carry a vector column (shuffling raw vectors at 100 TB is
    // the failure mode this stage exists to avoid)
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
    val exchanges = p.split("\n").filter(_.contains("Exchange hashpartitioning"))
    assert(exchanges.forall(l =>
      !l.contains("embedding") && !l.contains("qvec")),
      s"vector column in an Exchange:\n${exchanges.mkString("\n")}")
  }

  test("q_embed_pq_codes reads ONLY the persisted code table") {
    val p = plan("q_embed_pq_codes") // builds the index on first touch
    // the probe-time plan must never touch raw vectors: codes scan +
    // posexplode, zero Exchange
    assert(!p.contains("embedding"),
      s"raw vectors in the codes plan:\n$p")
    assert(!p.contains("Exchange"), "codes dump must be a pure scan")
  }

  test("q_sim_knn_pq scores codes via the native ADC kernel; vectors " +
      "never shuffle") {
    val p = plan("q_sim_knn_pq")
    assert(p.contains("pq_adc"), "ADC must be the codegen kernel")
    assert(!p.contains("SortMergeJoin"), "queries must broadcast")
    val exchanges = p.split("\n").filter(_.contains("Exchange hashpartitioning"))
    assert(exchanges.forall(l =>
      !l.contains("embedding") && !l.contains("qvec") &&
        !l.contains("codes")),
      s"vector/code column in an Exchange:\n${exchanges.mkString("\n")}")
  }

  test("q_sim_knn_ivfpq prunes cells at the file listing and never " +
      "exchanges vectors or codes") {
    val p = plan("q_sim_knn_ivfpq")
    assert(p.contains("pq_adc"))
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(p).isDefined,
      s"no partition pruning in plan:\n$p")
    val exchanges = p.split("\n").filter(_.contains("Exchange hashpartitioning"))
    assert(exchanges.forall(l =>
      !l.contains("embedding") && !l.contains("qvec") &&
        !l.contains("codes")),
      s"vector/code column in an Exchange:\n${exchanges.mkString("\n")}")
  }

  test("q_sim_knn_ivfpq_res keeps the residual layout's probe shape: " +
      "pruned cells, kernel ADC, no vector/code exchange") {
    val p = plan("q_sim_knn_ivfpq_res")
    assert(p.contains("pq_adc"))
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(p).isDefined,
      s"no partition pruning in plan:\n$p")
    val exchanges = p.split("\n").filter(_.contains("Exchange hashpartitioning"))
    assert(exchanges.forall(l =>
      !l.contains("embedding") && !l.contains("qvec") &&
        !l.contains("codes")),
      s"vector/code column in an Exchange:\n${exchanges.mkString("\n")}")
  }

  test("q_sample_stratified is a map-only scan (zero Exchange)") {
    val p = plan("q_sample_stratified")
    assert(!p.contains("Exchange"), s"sampler must not shuffle:\n$p")
  }

  test("q_source_cap pushes the per-group top-n below the exchange") {
    val p = plan("q_source_cap")
    assert(p.contains("WindowGroupLimit"), s"no group-limit pushdown:\n$p")
  }

  test("q_ngram_topk takes the global top-k without a single-partition sort") {
    val p = plan("q_ngram_topk")
    assert(p.contains("TakeOrderedAndProject"), s"no TakeOrdered:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"global sort crept in:\n$p")
    assert(p.contains("partial_count") || p.contains("Partial"),
      s"no map-side combine before the bigram shuffle:\n$p")
  }

  test("q_text_bm25 broadcasts the 1-row stats and ends in TakeOrdered") {
    val p = plan("q_text_bm25")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), s"stats row not broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"no TakeOrdered:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus-side shuffle join:\n$p")
  }

  test("q_corpus_boilerplate_topk: both aggs partial below their " +
      "exchanges; the global cut is TakeOrdered, never a full sort") {
    val p = plan("q_corpus_boilerplate_topk")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"unit counts must combine map-side:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k must be per-partition k + driver merge, not a sort:\n$p")
  }

  test("q_dedup_winnow_pairs: bucket counts and pair counts both " +
      "partial-aggregate; the kernel runs in the scan, no cartesian") {
    val p = plan("q_dedup_winnow_pairs")
    assert(p.contains("partial_count"),
      s"counts must combine map-side:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"the pair join must stay an equi-join on fp:\n$p")
  }

  test("q_dedup_winnow_pairs: the corpus scans ONCE — the bucket shape " +
      "reads one relation, builds no caches, runs the kernel once") {
    // r17: winnowOverlapPairs is the LSH bucket shape (groupBy fp →
    // pair_combos fan-out → pair count), so single-scan discipline is
    // STRUCTURAL: exactly one relation in the plan, zero persists,
    // one winnow kernel evaluation.
    import org.apache.spark.sql.execution.columnar.InMemoryRelation
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    val qe = SparkEntry.queries("q_dedup_winnow_pairs")(spark, dir)
      .queryExecution
    val cached = qe.withCachedData
    assert(cached.collect { case r: InMemoryRelation => r }.isEmpty,
      s"the bucket shape needs no caches:\n$cached")
    assert(cached.collect { case r: LogicalRelation => r }.size == 1,
      s"corpus must be read exactly once:\n$cached")
    val p = qe.executedPlan.toString
    assert("winnow_fingerprints".r.findAllIn(p).length == 1,
      s"the kernel must run once, in the scan stage:\n$p")
    assert("pair_combos".r.findAllIn(p).length == 1,
      s"one pair fan-out Generate:\n$p")
  }

  test("q_pipeline_normalize_fingerprint: repair→NFC order pinned in " +
      "the plan; the normalize front fuses into the kernel's scan " +
      "stage (zero Exchange from scan to fingerprints)") {
    val p = plan("q_pipeline_normalize_fingerprint")
    assert(p.contains("unicode_nfc(fix_mojibake("),
      s"normalization must run repair-then-NFC, in one projection:\n$p")
    val i = p.indexOf("Generate explode(winnow_fingerprints")
    assert(i >= 0, s"winnow kernel missing:\n$p")
    val seg = p.substring(i, p.indexOf("FileScan", i))
    assert(!seg.contains("Exchange"),
      s"normalize+fingerprint must stay one map stage:\n$seg")
    // single-corpus-scan discipline inherited from winnowOverlapPairs
    // (r17 bucket shape: one raw relation, no caches)
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    val raw = SparkEntry.queries("q_pipeline_normalize_fingerprint")(
      spark, dir).queryExecution.withCachedData.collect {
      case r: LogicalRelation => r }
    assert(raw.size == 1, "corpus must be read exactly once")
  }

  test("q_vocab_coverage: partial word counts below the exchange; the " +
      "token total rides a one-row broadcast, no WindowExec") {
    val p = plan("q_vocab_coverage")
    assert(p.contains("partial_count"),
      s"word counts must combine map-side:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"),
      s"the scalar total must broadcast:\n$p")
    assert(!p.contains("Window"),
      s"prefix sums must stay in the array domain:\n$p")
  }

  test("kNN rerank partial-aggregates the bounded top-k before the exchange") {
    val p = plan("q_sim_knn_ivf")
    assert(p.contains("partial_top_k_agg"),
      "map-side top-k truncation missing — the exchange would carry " +
        "every scored candidate")
  }

  test("q_dedup_spans gates short docs at the scan and combines map-side") {
    val p = plan("q_dedup_spans")
    assert(p.contains("token_count_native"), "short-doc gate lost")
    assert(p.contains("partial_count"), "gram counts must combine map-side")
    assert(p.contains("xxhash64"), "grams must be hashed before the shuffle")
  }

  test("q_dedup_incremental and q_dedup_purge end in anti-joins") {
    assert(plan("q_dedup_incremental").contains("LeftAnti"))
    assert(plan("q_dedup_purge").contains("LeftAnti"))
    assert(plan("q_dedup_purge_best").contains("LeftAnti"))
  }

  test("q_sample_token_budget windows per group, never one partition") {
    val p = plan("q_sample_token_budget")
    assert(p.contains("Window"), "running token sum must be a window")
    assert(!p.contains("SinglePartition"),
      "no stage of the budget cap may be single-partition")
  }

  test("q_sample_dsir is one kernel scan cut by TakeOrdered — no shuffle") {
    val p = plan("q_sample_dsir")
    // per-doc weights are the native hashed_ngram_sum kernel — a pure
    // map; the ratio table rides the plan as a reference object
    assert(p.contains("hashed_ngram_sum"),
      "weights must come from the native kernel")
    // selection is driver-bounded by topN, not a global sort
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("Exchange"),
      "the selection plan must not shuffle at all")
    assert("FileScan".r.findAllIn(p).length == 1,
      "selection must scan the corpus exactly once")
  }

  test("q_dedup_semantic joins on cells, never cross-joins vectors") {
    val p = plan("q_dedup_semantic")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("every graft kernel is callable from plain SQL") {
    val spark = SparkTestSession.spark
    graft.plans.GraftExtensions.register(spark)
    val r = spark.sql("""SELECT
        rpm_ver_cmp('1:2.0-1', '1:10.0-1') AS c,
        rpm_sort_key('0:1.2.3-4.el9') AS sk,
        token_count('a b  c') AS tc,
        word_shingles('a b c d', 3) AS ws,
        word_shingle_hashes('a b c d', 3) AS wsh,
        minhash_text('a b c d e f', 3, 16) AS mh,
        simhash64(array('a', 'b', 'a')) AS sh,
        sorted_jaccard(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j,
        cosine_sim(array(cast(1.0 as float), cast(0.0 as float)),
                   array(cast(1.0 as float), cast(0.0 as float))) AS cos,
        hyperplane_sig(array(cast(0.5 as float), cast(-0.25 as float)), 8) AS hs,
        hyperplane_band_sigs(array(cast(0.5 as float),
                   cast(-0.25 as float)), 4, 6) AS hbs,
        pair_combos(array(3L, 1L, 2L)) AS pc
      """).head()
    assert(r.getAs[Int]("c") < 0)          // 2.0 < 10.0 numerically
    assert(r.getAs[Number]("tc").longValue == 3L)
    assert(r.getSeq[String](r.fieldIndex("ws")).size == 2)
    assert(r.getSeq[Long](r.fieldIndex("mh")).size == 16)
    assert(r.getAs[Double]("j") == 0.5)
    assert(r.getAs[Double]("cos") == 1.0)
    assert(r.getSeq[Long](r.fieldIndex("hbs")).size == 4)
    assert(r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("pc"))
      .map(p => (p.getLong(0), p.getLong(1))) ==
      Seq((1L, 3L), (2L, 3L), (1L, 2L)))
    // hashed_logit: weights as a foldable array<double>, tf as 0/1
    val hl = spark.sql("""SELECT hashed_logit('a a b',
        cast(array(0.0, 0.25, 0.125, 2.0) as array<double>), 1) AS m""")
      .head().getAs[Double]("m")
    // tf margin = (w[b('a')]+w[b('a')]+w[b('b')])/3 + bias; with only
    // bias distinguishable a priori, just pin totality + bias presence
    assert(hl >= 2.0 - 0.25 && hl <= 2.0 + 0.25)
    // hashed_ngram_sum: integer ngram-bucket sum, n=1 over 3 tokens —
    // each token adds some values(b) of the all-sevens vector → 21
    val hns = spark.sql("""SELECT hashed_ngram_sum('a b c',
        array(7L, 7L, 7L, 7L), 1) AS v""").head().getAs[Long]("v")
    assert(hns == 21L)
    // the aggregate kernel: grouped SQL top-k
    val agg = spark.sql("""SELECT top_k_agg(s, i, 2) AS t FROM (
        SELECT * FROM VALUES (0.9, 1L), (0.8, 2L), (0.7, 3L) AS v(s, i))""")
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(agg.map(e => (e.getDouble(0), e.getLong(1))) ==
      Seq((0.9, 1L), (0.8, 2L)))
    // shape parameters must be literals, not columns
    val err = intercept[Exception] {
      spark.sql("SELECT word_shingles('a b c', 1 + cast(rand() as int))")
        .collect()
    }
    assert(err.getMessage.contains("literal int"))
    // the SQL surface guards the id type like the Scala API: a
    // fractional id would otherwise be silently cast double→long,
    // truncating and conflating distinct ids
    val idErr = intercept[Exception] {
      spark.sql("""SELECT top_k_agg(s, i, 2) FROM (
          SELECT * FROM VALUES (0.9, 1.5D), (0.8, 2.5D) AS v(s, i))""")
        .collect()
    }
    assert(idErr.getMessage.contains("integral"))
  }

  test("q_tokens_encode looks ids up via broadcast join, never sort-merge") {
    val p = plan("q_tokens_encode")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q_vocab_topk cuts the vocabulary with TakeOrdered, not a global sort") {
    val p = plan("q_vocab_topk")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q_embed_pca_cov partial-aggregates the moment buffers map-side") {
    assert(plan("q_embed_pca_cov").contains("partial_"))
  }

  test("q_embed_pca projection is a zero-Exchange codegen scan") {
    val p = plan("q_embed_pca")
    assert(p.contains("mat_project"))
    assert(!p.contains("Exchange"),
      "PCA projection must be a pure map — no shuffle")
  }

  test("q_embed_balanced caps cells below the exchange (WindowGroupLimit)") {
    assert(plan("q_embed_balanced").contains("WindowGroupLimit"))
  }

  test("q_text_distinctive broadcasts the vocabulary table and caps " +
      "below the exchange") {
    val p = plan("q_text_distinctive")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
    // the PARTIAL group-limit must run below the exchange — the Final
    // one above it alone means the full (group, word) set shuffled
    assert(p.split("\n").exists(l =>
      l.contains("WindowGroupLimit") && l.contains("Partial")))
  }

  test("q_sample_split: the split itself is map-only — one exchange " +
      "total, for the count aggregate") {
    val p = plan("q_sample_split")
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1)
    assert(p.contains("partial_count"), "count must combine map-side")
  }

  test("q_ngram_topk_cms combines sketches map-side before the exchange") {
    val p = plan("q_ngram_topk_cms")
    assert(p.contains("partial_cms_topk"),
      "CMS partials must fold per map task — the whole point of the sketch")
  }

  test("q_dedup_simhash: one corpus scan, one corpus-scale exchange; " +
      "no signature-table join-back") {
    val p = plan("q_dedup_simhash")
    assert("Scan parquet".r.findAllIn(p).length == 1,
      s"signatures must ride the band rows — docs scanned once:\n$p")
    // bucket groupBy + the closing pair-distinct; anything more means a
    // join back to a signature table crept in
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 2,
      s"expected exactly bucket + distinct exchanges:\n$p")
    assert(!p.contains("Join"), s"no signature join-back:\n$p")
  }

  test("q_fn_evr_split parses each row ONCE (single evr_split in plan)") {
    val p = plan("q_fn_evr_split")
    val n = "evr_split".r.findAllIn(p).length
    assert(n == 1,
      s"expected one struct-returning parse, found $n:\n$p")
  }

  test("TextClassifier.gate is a single FileScan + kernel filter — " +
      "no Exchange, no self-join") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val p = graft.operators.TextClassifier.gate(
      docs, "doc_id", "text", Array.fill(129)(0.01), k = 128)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"gate must not shuffle:\n$p")
    assert(!p.contains("Join"), s"gate must not self-join:\n$p")
    assert("Scan parquet".r.findAllIn(p).length == 1,
      s"gate must read docs exactly once:\n$p")
  }

  test("ubuntu OSV flow: the VEX and fix-date dimensions broadcast — " +
      "no sort-merge join against a dimension") {
    import spark.implicits._
    val recs = graft.providers.UbuntuProvider.records(spark,
      getClass.getResource("/fixtures/ubuntu_osv").getPath)
    val vex = spark.read.option("multiLine", "true")
      .json(getClass.getResource("/fixtures/ubuntu_vex.json").getPath)
    val fd = Seq(("CVE-2023-1111", "Ubuntu:22.04:LTS", "openssl",
      "3.0.2-0ubuntu1.9", "2023-05-09", "first-observed"))
      .toDF("vuln_id", "ecosystem", "pkg", "version", "date", "kind")
    val usn = graft.providers.UbuntuProvider.usnFixDates(
      spark.read.option("multiLine", "true")
        .json(getClass.getResource("/fixtures/ubuntu_usn.json").getPath))
    val p = graft.providers.UbuntuProvider
      .envelopes(recs, Some(vex), Some(fd), Some(usn))
      .queryExecution.executedPlan.toString
    // dimensions (VEX wont-fix triples, first-observed store, USN
    // dates) must ride broadcast joins; the only shuffles are keyed by
    // record id (slicing regroup, inference window, fix-map fold)
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 3,
      s"expected the three dimension joins to broadcast:\n$p")
  }

  test("the row-local curation trio (html strip, C4 lines, gopher) are " +
      "map-only scans: no keyed Exchange, filters/features inside the " +
      "scan stage (the only allowed Exchange is Q.spread's conditional " +
      "RoundRobin respread — a no-op on a well-split scan at scale)") {
    for (q <- Seq("q_text_html_strip", "q_corpus_c4_lines",
        "q_quality_gopher", "q_pipeline_web",
        "q_quality_repetition_ngrams", "q_text_unicode_norm",
        "q_quality_gopher_para", "q_text_fix_mojibake",
        "q_text_script_profile", "q_pipeline_text_normalize",
        "q_text_langid_units", "q_quality_code_detect",
        "q_text_winnow_fps")) {
      val p = plan(q)
      assertOnlyRespreadExchange(p, q)
      assert(!p.contains("Generate"), s"$q must not explode:\n$p")
    }
  }

  /** The query may carry at most Q.spread's RoundRobin respread —
    * never a keyed (hash/range) exchange. */
  private def assertOnlyRespreadExchange(p: String, q: String): Unit = {
    val total = "Exchange".r.findAllIn(p).length
    val rr = "Exchange RoundRobinPartitioning".r.findAllIn(p).length
    assert(total == rr,
      s"$q must not shuffle beyond the conditional respread:\n$p")
    assert(rr <= 1, s"$q respreads more than once:\n$p")
  }

  test("q_decontaminate_scrub: bench shingles and span lists ride " +
      "broadcast joins — the corpus text never sort-merge joins") {
    val p = plan("q_decontaminate_scrub")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2,
      s"bench-shingle join and span-rebuild join must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no corpus-side SMJ:\n$p")
  }

  test("Dedup.fanOut respreads an under-split input but is a NO-OP once " +
      "the scan is already well-split (the 100 TB layout)") {
    import org.apache.spark.sql.functions._
    val want = spark.sparkContext.defaultParallelism
    def synth(parts: Int) =
      spark.range(0, 1000, 1, parts)
        .select(col("id").as("doc_id"),
          concat(lit("doc text "), col("id")).as("text"))
    // under-split (1 partition — the single-row-group test parquet case):
    // the kernel stage must not run single-threaded
    val under = graft.operators.Dedup
      .exact(synth(1), "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(under.contains("RoundRobinPartitioning"),
      s"under-split input should respread before the hash kernel:\n$under")
    // well-split (>= defaultParallelism partitions): the text projection
    // must NOT cross a pre-kernel exchange — only (fingerprint, id)
    // pairs shuffle, in the groupBy
    val wide = graft.operators.Dedup
      .exact(synth(want), "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(!wide.contains("RoundRobinPartitioning"),
      s"well-split input must not respread before the kernel:\n$wide")
    assert("Exchange hashpartitioning".r.findAllIn(wide).length == 1,
      s"exactly the fingerprint groupBy exchange expected:\n$wide")
  }

  test("q_ngram_cms_estimates: sketch partials combine map-side; the " +
      "32 KiB matrix broadcasts to the 25-key probe") {
    val p = plan("q_ngram_cms_estimates")
    assert(p.contains("partial_cms_sketch"),
      s"map-side sketch combine missing:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"),
      s"the 1-row sketch must broadcast to the probe:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no shuffled join:\n$p")
  }

  test("q_agg_distinct_hll + q_stream_hourly_hll: register partials " +
      "max-merge map-side before the group exchange") {
    for (q <- Seq("q_agg_distinct_hll", "q_stream_hourly_hll")) {
      val p = plan(q)
      assert(p.contains("partial_hll_registers"),
        s"$q: map-side register combine missing:\n$p")
      assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
        s"$q: no join expected:\n$p")
    }
  }

  test("q_dedup_url: keep-best is ONE partial-aggregated exchange — " +
      "no window, no self-join; duplication depth never rides the wire") {
    val p = plan("q_dedup_url")
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      s"exactly the url-key aggregate exchange expected:\n$p")
    assert(!p.contains("Window"), s"keep-best must not sort groups:\n$p")
    assert(!p.contains("Join"), s"keep-best must not self-join:\n$p")
    // nullsPassThrough=false on the planted key: the normalizer chain
    // must be evaluated by exactly ONE branch (no Union, one scan)
    assert(!p.contains("Union"), s"single-branch plan expected:\n$p")
    assert("FileScan parquet".r.findAllIn(p).length == 1,
      s"one corpus scan expected:\n$p")
    // partial_obj_max_by BELOW the exchange: map tasks pre-reduce to
    // one candidate per key before the shuffle. obj_max_by (r16): the
    // declarative max_by's struct-valued buffer was not hash-agg
    // representable and dragged the aggregation onto SortAggregate —
    // the object-hash form keeps the partial pass with no sort
    assert(p.contains("partial_obj_max_by"),
      s"partial aggregation missing:\n$p")
    assert(!p.contains("SortAggregate"),
      s"keep-best must stay on the hash path:\n$p")
  }

  test("q_corpus_paragraph_dedup: exactly the three keyed exchanges " +
      "(doc_id respread, unit winner, doc rebuild); the winner set " +
      "never broadcasts") {
    val p = plan("q_corpus_paragraph_dedup")
    // r16: +1 for Q.spreadBy(doc_id) — the conditional respread that
    // parallelizes the tile+explode map stage (no-op at scale)
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 3,
      s"respread + unit-keyed winner agg + doc-keyed rebuild " +
        s"expected, no more:\n$p")
    // partial min BELOW the exchange: map tasks crush a
    // mega-duplicated unit to one candidate row each BEFORE anything
    // ships — a PARTITION BY u window would pin every occurrence of a
    // boilerplate unit on ONE un-splittable task (the r10 skew flag).
    // r16: the winner rule is the object-hash min_long_pair (the
    // declarative min(struct) degraded the agg to SortAggregate)
    assert(p.contains("partial_min_long_pair"),
      s"winner agg must partial-aggregate map-side:\n$p")
    assert(!p.contains("SortAggregate"),
      s"winner agg must stay on the hash path:\n$p")
    assert(!p.contains("Window"),
      s"no window — winners come from the partial-agg groupBy:\n$p")
    assert(!p.contains("BroadcastExchange"),
      s"the corpus-sized winner set must never broadcast:\n$p")
    assert(!p.contains("Join"), s"no join needed — the winner rows ARE " +
      s"the kept set:\n$p")
  }

  test("q_corpus_paragraph_dedup_incr: batch units anti-join the " +
      "fingerprint index — paragraph strings never build a hash side") {
    val p = plan("q_corpus_paragraph_dedup_incr")
    assert(p.contains("LeftAnti"), s"index anti-join missing:\n$p")
    assert(p.contains("partial_min"),
      s"in-batch keep-first winner agg must partial-aggregate:\n$p")
    assert(!p.contains("Window"),
      s"no window — winners come from the partial-agg groupBy:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    // the anti-join keys on md5(u) = ufp — 16-byte keys, not text
    assert(p.contains("md5(cast(u"), s"fingerprint join key missing:\n$p")
  }

  test("q_corpus_substring_dedup: anchor winners partial-aggregate " +
      "before the fingerprint exchange; gram strings hash to md5 " +
      "before any shuffle; no cartesian anywhere") {
    val p = plan("q_corpus_substring_dedup")
    // the winner min(struct) + count crush a mega-duplicated anchor
    // to one row per map task BEFORE the exchange (the keep-first
    // shape); without it a boilerplate anchor pins one task
    assert(p.contains("partial_min") && p.contains("partial_count"),
      s"winner agg must partial-aggregate map-side:\n$p")
    // anchors shuffle as md5 fingerprints, never k-word gram strings
    assert(p.contains("md5("), s"fingerprint projection missing:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"no cartesian:\n$p")
  }

  test("q_corpus_substring_dedup_incr: batch anchors semi/anti-join " +
      "the fingerprint index; only the batch-novel remainder pays " +
      "winner arithmetic") {
    val p = plan("q_corpus_substring_dedup_incr")
    assert(p.contains("LeftSemi"), s"historical-hit semi join missing:\n$p")
    assert(p.contains("LeftAnti"), s"novel-anchor anti join missing:\n$p")
    assert(p.contains("partial_min"),
      s"in-batch winner agg must partial-aggregate:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"no cartesian:\n$p")
  }

  test("q_pipeline_web_curation: the four-stage chain never shuffle-" +
      "joins the corpus; blocklist gate is a broadcast LeftAnti") {
    val p = plan("q_pipeline_web_curation")
    assert(p.contains("LeftAnti"), s"no blocklist anti-join:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus shuffled against a gate:\n$p")
  }

  test("q_corpus_within_doc_dedup is a map-only scan (per-doc dedup " +
      "is row-local — no keyed Exchange, only the conditional respread)") {
    val p = plan("q_corpus_within_doc_dedup")
    assertOnlyRespreadExchange(p, "q_corpus_within_doc_dedup")
  }

  test("q_corpus_flagged_words is a map-only scan (wordlist is a " +
      "constant-folded literal — no keyed Exchange, zero join; the " +
      "kernel filter stays ABOVE the respread so it parallelizes)") {
    val p = plan("q_corpus_flagged_words")
    assertOnlyRespreadExchange(p, "q_corpus_flagged_words")
    assert(!p.contains("Join"), s"wordlist filter must not join:\n$p")
  }

  test("q_corpus_domain_blocklist: text rides only the final host anti-" +
      "join; suffix explode touches distinct hosts, never documents") {
    val p = plan("q_corpus_domain_blocklist")
    assert(p.contains("LeftAnti"), s"no anti-join gate:\n$p")
    // the matched-host set is bounded by actual blocklist hits, so the
    // corpus-side anti-join must broadcast it, not shuffle the corpus
    assert(p.contains("BroadcastHashJoin") &&
      p.contains("LeftSemi"), s"suffix semi-join shape missing:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus shuffled against the blocklist:\n$p")
  }

  test("q_quality_ppl_buckets: group offsets broadcast; no per-group " +
      "window anywhere (ranks come from the two-phase prefix sum)") {
    val p = plan("q_quality_ppl_buckets")
    assert(p.contains("BroadcastHashJoin"),
      s"dimension-sized offsets table must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no corpus-side SMJ:\n$p")
    assert(!p.contains("Window"),
      s"a per-language window would single-task each language:\n$p")
  }
}
