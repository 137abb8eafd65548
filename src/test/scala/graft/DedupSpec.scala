package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Similarity}
import graft.functions.Text

/** Semantics of the dedup / similarity operators on controlled inputs
  * (these have no SQL oracle — xxhash64-seeded signatures — so the
  * ground truth is pinned here instead). */
class DedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("exact dedup groups identical normalized text") {
    val df = Seq(
      (1L, "Hello   World"), (2L, "hello world"), (3L, "something else")
    ).toDF("doc_id", "text")
    val out = Dedup.exact(df, "text", "doc_id").collect()
    assert(out.length == 2)
    val dup = out.find(_.getAs[Long]("n_copies") == 2).get
    assert(dup.getAs[Long]("keep_id") == 1L)
  }

  test("minhash LSH finds near-identical docs, not unrelated ones") {
    val near1 = "the quick brown fox jumps over the lazy dog again and again today"
    val near2 = "the quick brown fox jumps over the lazy dog again and again yesterday"
    val far = "completely unrelated content about spark catalyst optimizer internals"
    val df = Seq((1L, near1), (2L, near2), (3L, far)).toDF("doc_id", "text")
    val pairs = Dedup.minhashCandidates(
      Dedup.minhashBands(df, "text", "doc_id"), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("fused candidatesAndIds: pairs == pair-only path; member ids == " +
      "kept-bucket ids") {
    // r17 fuse: one pair_combos_with_members Generate serves both the
    // pair list and the member-id prune — results must match the
    // independent derivations exactly
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again yesterday"),
      (3L, "completely unrelated content about spark catalyst optimizer internals"),
      (4L, "the quick brown fox jumps over the lazy dog again and again tomorrow"))
      .toDF("doc_id", "text")
    val bands = Dedup.minhashBands(docs, "text", "doc_id")
    val (pairs, memberIds) = Dedup.minhashCandidatesAndIds(bands, "doc_id")
    val pairSet = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pairOnly = Dedup.minhashCandidates(bands, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairSet == pairOnly && pairSet.nonEmpty)
    // every kept bucket (≥2 distinct ids) pairs all its members, so the
    // member-id set equals the union of pair ids
    val members = memberIds.collect().map(_.getLong(0)).toSet
    assert(members == pairSet.flatMap(p => Set(p._1, p._2)))
    // no member single may leak into the pair list (id2 null-marked)
    assert(pairs.collect().forall(r => !r.isNullAt(1)))
  }

  test("jaccard on word shingles: identity, hand-computed partial " +
      "overlap, and disjoint") {
    // identity — any intersection/union confusion still gives 1.0
    // here, so the PARTIAL case below is the discriminating one
    val same = Seq(("a b c d e", "a b c d e")).toDF("t1", "t2")
    assert(same.select(Dedup.jaccard(
      Text.word_shingles(col("t1"), 3),
      Text.word_shingles(col("t2"), 3)).as("j")).head().getDouble(0)
      == 1.0)
    // "a b c d e" → {abc, bcd, cde}; "b c d e f" → {bcd, cde, def}
    // inter = {bcd, cde} (2), union = 4 → true Jaccard 0.5; a
    // containment-style inter/|A| bug would give 2/3 here
    val part = Seq(("a b c d e", "b c d e f")).toDF("t1", "t2")
    assert(part.select(Dedup.jaccard(
      Text.word_shingles(col("t1"), 3),
      Text.word_shingles(col("t2"), 3)).as("j")).head().getDouble(0)
      == 0.5)
    // disjoint → 0.0
    val none = Seq(("a b c d e", "x y z w v")).toDF("t1", "t2")
    assert(none.select(Dedup.jaccard(
      Text.word_shingles(col("t1"), 3),
      Text.word_shingles(col("t2"), 3)).as("j")).head().getDouble(0)
      == 0.0)
  }

  test("simhash hamming distance: near texts closer than far texts") {
    val near1 = "the quick brown fox jumps over the lazy dog again and again today"
    val near2 = "the quick brown fox jumps over the lazy dog again and again yesterday"
    val far = "completely unrelated content about catalyst optimizer internals"
    val df = Seq((near1, near2, far)).toDF("a", "b", "c")
    def sig(c: String) = Dedup.simhash(split(lower(trim(col(c))), "\\s+"))
    val r = df.select(
      Dedup.hamming64(sig("a"), sig("b")).as("near"),
      Dedup.hamming64(sig("a"), sig("c")).as("far")).head()
    assert(r.getAs[Int]("near") < r.getAs[Int]("far"))
  }

  test("simhashNearDups: exact dups pair at Hamming 0; few-bit " +
      "near-dups survive the pigeonhole banding; far docs don't pair") {
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val docs = Seq(
      (1L, base),
      (2L, base), // exact dup → identical sig, hamming 0
      (3L, base + " extra"), // near twin — pairs iff sig within 3 bits
      (4L, "completely unrelated content about catalyst optimizer internals and shuffles"),
      (5L, null.asInstanceOf[String])) // null text must not pair with anything
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDups(docs, "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) == 0,
      s"exact dup pair missing or nonzero hamming: $pairs")
    assert(!pairs.keySet.exists(p => p._1 == 5L || p._2 == 5L),
      "null-text doc must drop out before banding")
    assert(!pairs.keySet.exists(p => p._1 == 4L || p._2 == 4L),
      s"unrelated doc paired: $pairs")
    // pigeonhole recall law: EVERY pair within maxHamming appears —
    // check against the brute-force truth over all sigs
    val sigs = docs.filter($"text".isNotNull).select($"doc_id",
      graft.plans.HashExpressions
        .simhash60_md5(split(lower(trim($"text")), "\\s+")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (a <- sigs.keys; b <- sigs.keys if a < b) {
      val h = java.lang.Long.bitCount(sigs(a) ^ sigs(b))
      if (h <= 3)
        assert(pairs.contains((a, b)),
          s"pair ($a,$b) at hamming $h missed by banding")
    }
  }

  test("brute-force top-k returns k neighbors per query, self excluded") {
    val vecs = (0 until 20).map(i =>
      (i.toLong, Array.tabulate(8)(d => math.sin(i * 31 + d).toFloat)))
    val corpus = vecs.toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" < 2)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val out = Similarity.bruteForceTopK(corpus, queries, 5).collect()
    assert(out.length == 10)
    assert(!out.exists(r => r.getAs[Long]("qid") == r.getAs[Long]("vec_id")))
    val ranks = out.filter(_.getAs[Long]("qid") == 0L).map(_.getAs[Int]("rank")).sorted
    assert(ranks.toSeq == Seq(1, 2, 3, 4, 5))
  }

  test("LSH top-k recall vs brute force is sane on clustered vectors") {
    // two tight clusters; LSH with few bits must keep same-cluster
    // neighbors in the same bucket
    val base = Array.tabulate(8)(_.toFloat + 1f)
    val vecs = (0 until 40).map { i =>
      val cluster = i % 2
      val v = base.zipWithIndex.map { case (x, d) =>
        (if (cluster == 0) x else -x) + 0.01f * ((i * 7 + d) % 5)
      }
      (i.toLong, v)
    }
    val corpus = vecs.toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" < 2)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val brute = Similarity.bruteForceTopK(corpus, queries, 5)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(corpus, queries, 5, bits = 4)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall >= 0.8, s"recall=$recall")
  }

  test("connected components: distributed path == driver fast path") {
    // chain 1-2-3-4, pair 5-6, singleton edge 7-8
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L), (7L, 8L))
      .toDF("id1", "id2")
    def labels(threshold: Long) =
      Dedup.connectedComponents(pairs, driverThreshold = threshold)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fast = labels(100000L)
    val dist = labels(0L) // force the iterative label-propagation path
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 7L, 8L -> 7L)
    assert(fast == expected)
    assert(dist == expected)
  }

  test("estimate prefilter keeps every true near-dup pair (loose bound)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plain = Dedup.verifiedPairs(docs, "text", "doc_id")
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val pre = Dedup.verifiedPairs(docs, "text", "doc_id",
        estimatePrefilter = Some(0.2))
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(pre == plain, s"prefilter dropped ${plain -- pre}")
  }

  test("fused minhash_text == minhash_sig(char_shingles) on all paths") {
    import graft.plans.HashExpressions
    import graft.functions.Text
    import org.apache.spark.sql.functions.col
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",   // ascii fast path
      "  Weird   WHITESPACE\tand\nnewlines  here  ",   // normalization
      "héllo wörld with nön-ascii çharacters über",    // utf-8 fallback
      "tiny",                                          // shorter than n=5
      "abc")                                           // == fallback branch
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val both = df.select(
      HashExpressions.minhash_text(col("text"), 5, 20).as("fused"),
      HashExpressions.minhash_sig(Text.char_shingles(col("text"), 5), 20)
        .as("composed"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }

  test("multi-probe LSH: recall beats single-probe at the same bits") {
    val em = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = em.filter($"vec_id" < 5)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val brute = Similarity.bruteForceTopK(em, queries, 10)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    def recallOf(ph: Int): Double = {
      val got = Similarity.lshTopK(em, queries, 10, bits = 8,
          probeHamming = ph)
        .select("qid", "vec_id").as[(Long, Long)].collect().toSet
      (brute & got).size.toDouble / brute.size
    }
    val single = recallOf(0)
    val multi = recallOf(1)
    // 9 probes of 1/256 buckets: strictly more candidates, so recall is
    // monotone (the floor is modest — this synthetic corpus is near-
    // uniform, the hardest case for LSH; clustered corpora sit higher)
    assert(multi >= single, s"multi=$multi < single=$single")
    assert(multi >= 0.15, s"multi-probe recall=$multi")
    // and the rerank stays a corpus FRACTION: ~9/256 of n·q pairs
    val n = em.count(); val q = 5
    val cands = Similarity.lshTopK(em, queries, Int.MaxValue, bits = 8,
      probeHamming = 1).count()
    assert(cands < 0.1 * n * q, s"reranked $cands of ${n * q} pairs")
  }

  test("embedding near-dups: exact precision, banded recall on real table") {
    val em = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val brute = em.select($"vec_id".as("id1"), $"embedding".as("v1"))
      .join(em.select($"vec_id".as("id2"), $"embedding".as("v2")),
        $"id1" < $"id2")
      .withColumn("sim", Dedup.cosine($"v1", $"v2"))
      .filter($"sim" >= 0.3)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val got = Dedup.embeddingNearDups(em, "vec_id", "embedding", 0.3)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    // precision is exact by construction (cosine verify), so the output
    // must be a subset of brute force; recall floor reflects
    // 1-(1-p^6)^6 ≈ 0.24 at sim = 0.3 (true-dup corpora sit near 1.0)
    assert(got.subsetOf(brute), s"unverified pairs: ${got -- brute}")
    val recall =
      if (brute.isEmpty) 1.0 else (brute & got).size.toDouble / brute.size
    assert(recall >= 0.1, s"recall=$recall over ${brute.size} true pairs")
    // md5-prefix sign basis (the oracle-replayable q_dedup_embedding
    // path): a different-but-equally-random basis, so the same exact
    // precision and the same recall-floor family must hold.
    val gotMd5 = Dedup.embeddingNearDups(em, "vec_id", "embedding", 0.3,
        md5Basis = true)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(gotMd5.subsetOf(brute), s"unverified pairs: ${gotMd5 -- brute}")
    val recallMd5 =
      if (brute.isEmpty) 1.0 else (brute & gotMd5).size.toDouble / brute.size
    assert(recallMd5 >= 0.1,
      s"md5-basis recall=$recallMd5 over ${brute.size} true pairs")
  }

  test("degenerate embedding buckets are capped, not exploded") {
    // 50 identical vectors: every band bucket holds all 50 ids.
    // maxBucket=10 must drop those buckets — candidate volume is 0,
    // not 50·49/2 — while the uncapped run still finds every pair.
    val vecs = (0 until 50).map(i =>
      (i.toLong, Array.tabulate(8)(d => (d + 1).toFloat)))
    val df = vecs.toDF("vec_id", "embedding")
    val capped = Dedup.minhashCandidates(
      Dedup.embeddingBands(df, "vec_id", "embedding"), "vec_id",
      maxBucket = 10)
    assert(capped.count() == 0)
    val uncapped = Dedup.embeddingNearDups(df, "vec_id", "embedding", 0.99)
    assert(uncapped.count() == 50L * 49 / 2)
  }

  test("near-dup index: batch probes find stored near-dups, text unread") {
    val near1 = "the quick brown fox jumps over the lazy dog again and again today"
    val near2 = "the quick brown fox jumps over the lazy dog again and again yesterday"
    val far = "completely unrelated content about spark catalyst optimizer internals"
    val corpus = Seq((1L, near1), (3L, far)).toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("ndidx").toString
    Dedup.writeNearDupIndex(corpus, path, "text", "doc_id")
    val batch = Seq((10L, near2), (11L, "something else entirely fresh"))
      .toDF("doc_id", "text")
    val out = Dedup.nearDupsAgainstIndex(spark, path, batch,
      "text", "doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((10L, 1L)))
    assert(out.head.getDouble(2) >= 0.4)
    // ≡ the from-text pipeline restricted to (batch, corpus) pairs
    val re = batch.select(col("doc_id") + 100, col("text"))
      .toDF("doc_id", "text") // disjoint ids
    val full = Dedup.verifiedPairs(corpus.unionByName(re), "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full.contains((1L, 110L)))
  }

  test("embedding index: batch probes find stored near-dups via " +
      "quantized vectors") {
    val rnd = new scala.util.Random(13)
    // corpus: 60 near-orthogonal random vectors
    val corpus = (1L to 60L).map(i =>
      (i, Seq.fill(64)(rnd.nextGaussian().toFloat))).toDF(
      "vec_id", "embedding")
    val path = java.nio.file.Files
      .createTempDirectory("embidx").toString + "/idx"
    Dedup.writeEmbeddingIndex(corpus, path, "vec_id", "embedding")
    // batch: perturbed copies of corpus vectors 1-5 (cosine ≥ 0.99)
    // plus 5 novel random vectors
    val perturbed = corpus.filter($"vec_id" <= 5)
      .select(($"vec_id" + 1000L).as("vec_id"),
        org.apache.spark.sql.functions.transform($"embedding",
          x => (x + org.apache.spark.sql.functions.lit(0.01f)))
          .as("embedding"))
    val novel = (2001L to 2005L).map(i =>
      (i, Seq.fill(64)(rnd.nextGaussian().toFloat))).toDF(
      "vec_id", "embedding")
    val batch = perturbed.unionByName(novel)
    val hits = Dedup.embeddingNearDupsAgainstIndex(spark, path, batch,
      "vec_id", "embedding", threshold = 0.9)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    // every perturbed copy matches its source; novel vectors match none
    // (random 64-dim Gaussians are near-orthogonal, cosine ≪ 0.9)
    val expected = (1L to 5L).map(i => (i + 1000L) -> i).toSet
    assert(hits.toSet == expected, s"got ${hits.toSet}")
    // the md5 sign basis (the oracle-replayable q_dedup_incr_emb path)
    // must reach the same verified pairs: different band keys, same
    // planted recall and novel rejection
    val pathMd5 = path + "_md5"
    Dedup.writeEmbeddingIndex(corpus, pathMd5, "vec_id", "embedding",
      md5Basis = true)
    val hitsMd5 = Dedup.embeddingNearDupsAgainstIndex(spark, pathMd5,
      batch, "vec_id", "embedding", threshold = 0.9, md5Basis = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(hitsMd5.toSet == expected, s"got ${hitsMd5.toSet}")
  }

  test("removeNearDups keeps cluster representatives and uniques") {
    val near1 = "the quick brown fox jumps over the lazy dog again and again today"
    val near2 = "the quick brown fox jumps over the lazy dog again and again yesterday"
    val far = "completely unrelated content about spark catalyst optimizer internals"
    val df = Seq((1L, near1), (2L, near2), (3L, far)).toDF("doc_id", "text")
    val out = Dedup.removeNearDups(df, "text", "doc_id")
    assert(out.columns.toSeq == Seq("doc_id", "text")) // columns survive
    assert(out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 3L)) // 2 drops into 1's cluster; 3 is unique
  }

  test("incremental dedup: re-crawls drop, batch-internal dups keep min id") {
    val corpus = Seq(
      (1L, "alpha beta gamma"), (2L, "delta epsilon zeta"),
      (3L, "eta theta iota")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "Alpha   Beta gamma"), // normalizes to corpus doc 1 → drop
      (11L, "brand new content here"),
      (12L, "brand  NEW content here"), // dup of 11 within batch → drop
      (13L, "another fresh document")).toDF("doc_id", "text")
    val out = Dedup.dedupAgainst(corpus, batch, "text", "doc_id")
    assert(out.columns.toSeq == Seq("doc_id", "text")) // columns survive
    assert(out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(11L, 13L))
    // the index form matches the inline form
    val idx = Dedup.fingerprintIndex(corpus, "text")
    val viaIndex = Dedup.dedupAgainstIndex(batch, idx, "text", "doc_id")
    assert(viaIndex.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(11L, 13L))
    // empty index: the whole batch survives (minus internal dups)
    val empty = idx.filter(lit(false))
    assert(Dedup.dedupAgainstIndex(batch, empty, "text", "doc_id")
      .count() == 3)
  }

  test("bloom-sidecar incremental dedup ≡ plain, exact even saturated") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = docs.filter(col("doc_id") % 5 < 4)
    val batch = docs.filter(col("doc_id") % 5 === 5 - 1)
      .select(col("doc_id"), col("text"))
      .unionByName(corpus.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 100000).as("doc_id"), col("text")))
    val idx = Dedup.fingerprintIndex(corpus, "text")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val plain = ids(Dedup.dedupAgainstIndex(batch, idx, "text", "doc_id"))
    assert(plain.nonEmpty && plain.forall(_ < 100000),
      "every re-crawl must drop; fixture plants survivors")
    val bloom = Dedup.indexBloom(idx)
    assert(ids(Dedup.dedupAgainstIndexBloom(batch, idx, "text", "doc_id",
      bloom)) == plain, "bloom path must be row-identical")
    // a 64-bit floor filter is ~all false positives: every row routes
    // through the exact anti-join and the answer must not change
    val saturated = Dedup.indexBloom(idx, expectedItems = 1L)
    assert(ids(Dedup.dedupAgainstIndexBloom(batch, idx, "text", "doc_id",
      saturated)) == plain,
      "a saturated filter must not change results")
    // oversized accepted sliver → the shuffled anti-join fallback
    // (instead of the broadcast-sliver split) — same rows either way
    assert(ids(Dedup.dedupAgainstIndexBloom(batch, idx, "text", "doc_id",
      bloom, maxSliverRows = 0L)) == plain,
      "sliver-cap fallback must be row-identical")
    // bootstrap: EMPTY index → null sidecar → the whole deduped batch
    // survives, exactly like the plain path (a naive null probe would
    // silently drop every row instead)
    val empty = idx.filter(lit(false))
    val emptyPlain = ids(Dedup.dedupAgainstIndex(batch, empty, "text",
      "doc_id"))
    assert(Dedup.indexBloom(empty) == null)
    assert(ids(Dedup.dedupAgainstIndexBloom(batch, empty, "text",
      "doc_id", Dedup.indexBloom(empty))) == emptyPlain)
  }

  test("exactCandidates emits every shingle-sharing pair and nothing " +
      "else; verifiedPairsExact matches hand Jaccard; exact purge " +
      "keeps min-id representatives") {
    val df = Seq(
      (1L, "a b c d e"), // shares [a b c], [b c d] with 2 → J=0.5
      (2L, "a b c d x"),
      (3L, "p q r s t"), // exact dup pair → J=1.0
      (4L, "p q r s t")
    ).toDF("doc_id", "text")
    val cands = Dedup.exactCandidates(df, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(cands == Seq((1L, 2L), (3L, 4L)))
    val pairs = Dedup.verifiedPairsExact(df, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(x => (x._1, x._2)).toSeq
    assert(pairs == Seq((1L, 2L, 0.5), (3L, 4L, 1.0)))
    assert(Dedup.removeNearDupsExact(df, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 3L))
  }

  test("removeNearDupsKeepBest keeps the highest-priority cluster member") {
    // one near-dup cluster (same long text ± a token), one unique doc;
    // doc 3 is the LONGEST so it must win despite the highest id
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, s"$base one"),
      (2L, s"$base two"),
      (3L, s"$base two three four"),
      (9L, "completely different text about other matters entirely")
    ).toDF("doc_id", "text")
    def kept(priority: org.apache.spark.sql.Column) =
      Dedup.removeNearDupsKeepBest(docs, "text", "doc_id", priority)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept(graft.functions.Text.token_count(col("text")))
      == Set(3L, 9L), "longest cluster member + unique survive")
    // constant priority → tie-break is the lowest id (= min-id policy)
    assert(kept(lit(1)) == Set(1L, 9L))
    // a NULL-priority member must sort LAST, never win the cluster
    // (struct ordering would otherwise put the null field first)
    assert(kept(when(col("doc_id") === 2L, lit(null))
      .otherwise(graft.functions.Text.token_count(col("text"))))
      == Set(3L, 9L))
  }

  test("bloom build/probe: zero false negatives, fpp within sizing") {
    import graft.plans.BloomProbe
    val members = spark.range(2000)
      .select(concat(lit("member-"), col("id")).as("s"))
    val filter = BloomProbe.buildFilter(members, col("s"),
      fpp = 0.01, expectedItems = -1L)
    // no false negatives — every inserted key must probe true
    assert(members
      .filter(!BloomProbe.mightContain(filter, xxhash64(col("s"))))
      .count() == 0, "a Bloom filter may never reject a member")
    // false-positive rate on a disjoint key space stays near sizing
    val fp = spark.range(20000)
      .select(concat(lit("stranger-"), col("id")).as("s"))
      .filter(BloomProbe.mightContain(filter, xxhash64(col("s"))))
      .count()
    assert(fp < 20000 * 0.05, s"fpp ${fp / 20000.0} far above the 1% sizing")
  }

  test("duplicated spans: planted repeats merge to maximal spans") {
    import graft.operators.Corpus
    val repeat = "one two three four five" // 5 words shared by docs 1,2
    val df = Seq(
      (1L, s"u1 u2 $repeat u3 u4"),
      (2L, s"v1 $repeat v2 v3 v4 v5"),
      (3L, "w1 w2 w3 w4 w5 w6 w7 w8"),
      (4L, "short doc")).toDF("doc_id", "text")
    val out = Corpus.duplicatedSpans(df, "text", "doc_id", n = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    // doc 1: repeat at word 2..6 → windows p=2,3 merge → span [2,6]
    // doc 2: repeat at word 1..5 → windows p=1,2 merge → span [1,5]
    // doc 3: unique; doc 4: shorter than n → no rows
    assert(out.toSeq == Seq((1L, 2L, 6L, 2L), (2L, 1L, 5L, 2L)))
    // higher minCount silences the pair
    assert(Corpus.duplicatedSpans(df, "text", "doc_id", n = 4,
      minCount = 3L).count() == 0)
  }

  test("duplicated spans: overlapping and touching windows merge, " +
      "disjoint ones don't") {
    import graft.operators.Corpus
    // doc 10: duplicated windows at p=0 ("a b c d") and p=2
    // ("c d X e") with p=1 unique — the windows OVERLAP (gap 2 < n),
    // so one maximal span [0,5], not [0,3] + [2,5]
    // doc 20: duplicated windows at p=0 and p=4 — TOUCHING spans
    // (gap = n) merge to [0,7]
    // doc 30: duplicated windows at p=0 and p=5 — gap n+1, two spans
    val df = Seq(
      (10L, "a b c d X e f g h"),
      (11L, "a b c d"),
      (12L, "c d X e"),
      (20L, "p q r s w x y z"),
      (21L, "p q r s"),
      (22L, "w x y z"),
      (30L, "j k l m n1 g1 g2 g3 g4"),
      (31L, "j k l m"),
      (32L, "g1 g2 g3 g4")).toDF("doc_id", "text")
    val spans = Corpus.duplicatedSpans(df, "text", "doc_id", n = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .filter(_._1 % 10 == 0).sortBy(t => (t._1, t._2)).toSeq
    assert(spans == Seq(
      (10L, 0L, 5L, 2L),
      (20L, 0L, 7L, 2L),
      (30L, 0L, 3L, 1L), (30L, 5L, 8L, 1L)))
  }

  test("semantic near-dups: exact precision, cell recall on real table") {
    val em = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val truth = em.as("a").join(em.as("b"),
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"),
        Similarity.cosine(col("a.embedding"), col("b.embedding")).as("sim"))
      .filter(col("sim") >= 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Dedup.semanticNearDups(em, "vec_id", "embedding", 0.3,
        nlist = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(truth), "emitted a pair below the exact threshold")
    assert(truth.nonEmpty)
    val recall = got.size.toDouble / truth.size
    assert(recall >= 0.2, s"within-cell recall=$recall") // 1/8 cells co-located
    // nlist=1 puts everything in one cell → exhaustive → full recall
    assert(Dedup.semanticNearDups(em, "vec_id", "embedding", 0.3, nlist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet == truth)
  }

  test("connected components fast path preserves non-Long id types") {
    val intPairs = Seq((1, 2), (2, 3), (7, 8)).toDF("id1", "id2")
    val outInt = Dedup.connectedComponents(intPairs)
    assert(outInt.schema("id").dataType ==
      org.apache.spark.sql.types.IntegerType)
    assert(outInt.collect().map(r => r.getInt(0) -> r.getInt(1)).toMap ==
      Map(1 -> 1, 2 -> 1, 3 -> 1, 7 -> 7, 8 -> 7))
    // string ids: the Long fast path must NOT fire; the iterative path
    // handles them (min-label propagation orders lexicographically)
    val strPairs = Seq(("a", "b"), ("b", "c"), ("x", "y"))
      .toDF("id1", "id2")
    val outStr = Dedup.connectedComponents(strPairs)
    assert(outStr.collect().map(r => r.getString(0) -> r.getString(1)).toMap
      == Map("a" -> "a", "b" -> "a", "c" -> "a", "x" -> "x", "y" -> "x"))
  }

  test("connected components: unconverged distributed fixpoint throws " +
      "instead of returning split clusters") {
    // a 13-node chain (diameter 12) on STRING ids (forces the
    // iterative path): 3 rounds cannot finish; enough rounds resolve
    // ONE component rooted at the lexicographic minimum
    val chain = (1 until 13).map(i => (f"d$i%02d", f"d${i + 1}%02d"))
      .toDF("id1", "id2")
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, maxIter = 3).collect()
    }
    assert(e.getMessage.contains("not converged"))
    val ok = Dedup.connectedComponents(chain, maxIter = 20)
      .collect().map(r => r.getString(1)).distinct
    assert(ok.toSeq == Seq("d01"))
  }

  test("degenerate banding configs and index-config mismatches fail " +
      "loudly, not silently empty") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Dedup.minhashBands(df, "text", "doc_id", k = 20, bands = 30)
    }
    intercept[IllegalArgumentException] {
      Dedup.minhashBands(df, "text", "doc_id", k = 20, bands = 6)
    }
    val em = Seq((1L, Seq(1f, 2f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Dedup.embeddingBands(em, "vec_id", "embedding", bands = 6,
        bitsPerBand = 0)
    }
    // a probe whose banding config mismatches the written index's
    // params manifest is rejected (keys would never collide — the
    // probe would silently report a dup-filled batch as clean)
    val corpus = (1L to 20L)
      .map(i => (i, Seq.fill(16)((i % 7).toFloat + 0.1f)))
      .toDF("vec_id", "embedding")
    val path = java.nio.file.Files
      .createTempDirectory("embidx_params").toString + "/idx"
    Dedup.writeEmbeddingIndex(corpus, path, "vec_id", "embedding",
      bands = 8, bitsPerBand = 12)
    val e = intercept[IllegalArgumentException] {
      Dedup.embeddingNearDupsAgainstIndex(spark, path, corpus,
        "vec_id", "embedding", bands = 4, bitsPerBand = 6).collect()
    }
    assert(e.getMessage.contains("probe config must match"))
    intercept[IllegalArgumentException] {
      Dedup.embeddingNearDupsAgainstIndex(spark, path, corpus,
        "vec_id", "embedding", md5Basis = true).collect()
    }
  }

  test("winnowOverlapPairs: a shared long run pairs its docs, unrelated " +
      "docs don't, and boilerplate fingerprints drop at the bucket cap") {
    import spark.implicits._
    val run = "the quick brown fox jumps over the lazy dog tonight"
    val docs = Seq(
      (1L, s"alpha bravo charlie $run delta echo"),
      (2L, s"zulu yankee $run xray whiskey victor"),
      (3L, "uniform tango sierra romeo quebec papa oscar november mike")
    ).toDF("doc_id", "text")
    val pairs = graft.operators.Dedup
      .winnowOverlapPairs(docs, "text", "doc_id", minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
    // the purge drops the pair's non-representative, keeps the rest
    val kept = graft.operators.Dedup
      .removeWinnowOverlaps(docs, "text", "doc_id", minShared = 1)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L))
    // plant the run in EVERY doc: uncapped, all three pair on the
    // run's deep picks; capping buckets below the corpus size drops
    // those now-ubiquitous picks as boilerplate. Picks from the
    // boundary REGION (k-window mixing doc-specific and run hashes)
    // are context-dependent and may survive for a 2-doc subset —
    // correct winnowing behavior — but far below the deep-run mass
    val all = Seq(
      (1L, s"alpha bravo $run"), (2L, s"zulu yankee $run"),
      (3L, s"uniform tango $run")).toDF("doc_id", "text")
    def pairCounts(cap: Long): Map[(Long, Long), Long] =
      graft.operators.Dedup
        .winnowOverlapPairs(all, "text", "doc_id",
          minShared = 1, maxBucket = cap)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val uncapped = pairCounts(Long.MaxValue)
    assert(uncapped.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    val capped = pairCounts(2L)
    assert(capped.values.forall(_ < uncapped.values.min),
      s"cap must kill the deep-run mass: $capped vs $uncapped")
  }

  test("keepBestByKey keeps the max-order row per key and counts dups") {
    val df = Seq(
      ("u1", 10L, 5L), ("u1", 12L, 9L), ("u1", 11L, 9L),
      ("u2", 20L, 1L)
    ).toDF("url", "doc_id", "score")
    // order: highest score, ties → lowest id (negated id in the struct)
    val out = Dedup
      .keepBestByKey(df, "url", struct(col("score"), -col("doc_id")))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("u1") == ((11L, 9L, 3L)))
    assert(out("u2") == ((20L, 1L, 1L)))
    // column contract: key first, carried columns in input order, n_dups
    assert(Dedup.keepBestByKey(df, "url", col("score")).columns.toSeq ==
      Seq("url", "doc_id", "score", "n_dups"))
    intercept[IllegalArgumentException] {
      Dedup.keepBestByKey(df.select("url"), "url", col("url"))
    }
    // NULL keys pass through untouched — a groupBy would pool every
    // un-keyed row into one group and keep a single survivor
    val withNulls = Seq(
      (Option("u1"), 1L), (None: Option[String], 2L),
      (None: Option[String], 3L)
    ).toDF("url", "doc_id")
    val kept = Dedup
      .keepBestByKey(withNulls, "url", -col("doc_id")).collect()
    assert(kept.length == 3)
    assert(kept.filter(_.isNullAt(0)).map(_.getLong(1)).toSet ==
      Set(2L, 3L))
    assert(kept.filter(_.isNullAt(0)).forall(_.getLong(2) == 1L))
    // reserved output names guarded (re-running on own output would
    // otherwise emit two n_dups columns)
    intercept[IllegalArgumentException] {
      Dedup.keepBestByKey(
        Dedup.keepBestByKey(df, "url", col("score")), "url", col("score"))
    }
    // nullsPassThrough = false (single-branch plan for by-construction
    // non-null keys) agrees with the default on null-free input
    val one = Dedup.keepBestByKey(df, "url",
        struct(col("score"), -col("doc_id")), nullsPassThrough = false)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(one.toSet == Set(("u1", 11L, 3L), ("u2", 20L, 1L)))
  }

  test("LSH saturation telemetry: a templated corpus trips the " +
      "fail-fast gate with the remediation message; a diverse corpus " +
      "passes it; candidate output is unchanged by the observation") {
    // 40 docs sharing ONE template: every band bucket holds all 40
    // docs, far past maxBucket=8 — the silent shape the gate exists
    // for (all buckets dropped => zero candidates, zero recall).
    val templated = spark.range(40)
      .selectExpr("id as doc_id",
        "'the same boilerplate template text repeated verbatim in " +
          "every single document of this corpus' as text")
    val bands = Dedup.minhashBands(templated, "text", "doc_id")
    val cands = Dedup.minhashCandidates(bands, "doc_id", maxBucket = 8)
    assert(cands.count() == 0L) // recall collapsed — silently, sans gate
    val stats = Dedup.lshBucketHealth(bands, maxBucket = 8)
    assert(stats.saturatedFrac == 1.0 && stats.maxBucket == 40L,
      s"every bucket holds the full corpus here: $stats")
    val ex = intercept[IllegalStateException] {
      Dedup.requireHealthyLshBuckets(bands, maxBucket = 8)
    }
    assert(ex.getMessage.contains("exactCandidates"),
      s"remediation must name the zero-FN fallback: ${ex.getMessage}")
    assert(ex.getMessage.contains("shingleLen"),
      s"remediation must name the diversity knob: ${ex.getMessage}")
    // Diverse corpus: same preflight, same cap — the gate passes,
    // returns the stats, and the candidate stage output is unaffected
    // by its planted observation.
    val diverse = spark.range(20).selectExpr("id as doc_id",
      "concat('document ', id, ' discusses a distinct subject: ', " +
        "md5(concat('a', id)), ' ', md5(concat('b', id))) as text")
    val okBands = Dedup.minhashBands(diverse, "text", "doc_id")
    val ok = Dedup.requireHealthyLshBuckets(okBands, maxBucket = 8)
    assert(ok.saturatedFrac <= 0.05 && ok.buckets > 0)
    assert(Dedup.minhashCandidates(okBands, "doc_id", 8).count() == 0L)
    // empty bands frame: no buckets, trivially healthy (nothing to
    // saturate), gate passes rather than dividing by zero
    val empty = Dedup.requireHealthyLshBuckets(
      okBands.filter(lit(false)), maxBucket = 8)
    assert(empty.buckets == 0L)
  }

  test("LSH passive telemetry: partial saturation (non-empty result) " +
      "delivers the observed bucket metrics through the AQE walk the " +
      "session listener uses") {
    import org.apache.spark.sql.util.QueryExecutionListener
    import org.apache.spark.sql.execution.QueryExecution
    // half the corpus shares one template (saturates its buckets past
    // the cap), the other half is a planted near-dup pair per doc —
    // the result is NON-empty, so AQE keeps the metrics node alive.
    val mixed = spark.range(30).selectExpr("id as doc_id",
      "case when id < 20 then 'identical template body shared by the " +
        "templated half of this corpus' " +
        "else concat('unique subject ', md5(concat('s', cast(id/2 as " +
        "int))), ' tail ', id % 2) end as text")
    val cands = Dedup.minhashCandidates(
      Dedup.minhashBands(mixed, "text", "doc_id"), "doc_id",
      maxBucket = 8)
    @volatile var rows: List[org.apache.spark.sql.Row] = Nil
    val l = new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution,
          d: Long): Unit =
        rows = org.apache.spark.sql.graft.bridge
          .observedMetrics(qe.executedPlan)
          .collect { case (n, r)
            if n.startsWith(Dedup.LshObservePrefix) => r }
          .toList ::: rows
      override def onFailure(f: String, qe: QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    try {
      assert(cands.count() > 0, "the diverse half must still pair")
      // listener bus is async
      var tries = 0
      while (rows.isEmpty && tries < 100) { Thread.sleep(100); tries += 1 }
      assert(rows.nonEmpty,
        "observed metrics must survive the AQE plan walk")
      val r = rows.head
      assert(r.getAs[Long]("saturated_buckets") > 0,
        s"the templated half must saturate buckets: $r")
      assert(r.getAs[Long]("buckets") > r.getAs[Long]("saturated_buckets"),
        s"the diverse half must keep healthy buckets: $r")
    } finally spark.listenerManager.unregister(l)
  }

  test("LSH passive telemetry survives a PERSISTED candidate subtree " +
      "— the connectedComponents shape every purge/cluster path runs") {
    import org.apache.spark.sql.util.QueryExecutionListener
    import org.apache.spark.sql.execution.QueryExecution
    // the r13 lshsat drill's live find: every purge path persists the
    // candidate pairs (connectedComponents), which buries the observe
    // under InMemoryTableScan — without the bridge's cached-plan
    // descent the saturation WARN never fired in any real pipeline,
    // only on direct candidate actions
    val mixed = spark.range(30).selectExpr("id as doc_id",
      "case when id < 20 then 'identical template body shared by the " +
        "templated half of this corpus' " +
        "else concat('unique subject ', md5(concat('s', cast(id/2 as " +
        "int))), ' tail ', id % 2) end as text")
    val cands = Dedup.minhashCandidates(
        Dedup.minhashBands(mixed, "text", "doc_id"), "doc_id",
        maxBucket = 8)
      .persist()
    @volatile var rows: List[org.apache.spark.sql.Row] = Nil
    val l = new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution,
          d: Long): Unit =
        rows = org.apache.spark.sql.graft.bridge
          .observedMetrics(qe.executedPlan)
          .collect { case (n, r)
            if n.startsWith(Dedup.LshObservePrefix) => r }
          .toList ::: rows
      override def onFailure(f: String, qe: QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    try {
      assert(cands.count() > 0)
      var tries = 0
      while (rows.isEmpty && tries < 100) { Thread.sleep(100); tries += 1 }
      assert(rows.nonEmpty,
        "observed metrics must survive the InMemoryTableScan descent")
      assert(rows.head.getAs[Long]("saturated_buckets") > 0)
    } finally {
      spark.listenerManager.unregister(l)
      cands.unpersist()
    }
  }
}
