package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity
import graft.operators.Similarity.CoarseQuantizer
import graft.plans.CoarseExpressions

/** Laws for the two-level (hierarchical) coarse quantizer — the IVF
  * fit/assign/probe path that scales past the driver-Lloyd ceiling.
  * Kernel semantics are pinned against driver-side replications of the
  * documented contract (two-stage argmax cosine, strict-> ties to the
  * lowest index, NaN never wins); the train/store/probe surface is
  * pinned on the real embeddings fixture. */
class CoarseSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // hand-set 2×2 grid in 2 dims: level-1 cells point at +x and +y;
  // cell 0's subs split +x into (1,0.2) vs (1,-0.2), cell 1's split +y
  private val k1 = 2; private val k2 = 2; private val dim = 2
  private val l1 = Seq(1.0, 0.0, /* c1=0 */ 0.0, 1.0 /* c1=1 */)
  private val l2 = Seq(
    1.0, 0.2, /* cell 0 = (0,0) */ 1.0, -0.2, /* cell 1 = (0,1) */
    0.2, 1.0, /* cell 2 = (1,0) */ -0.2, 1.0 /* cell 3 = (1,1) */)

  private def assignOf(v: Seq[Float]): Option[Int] = {
    val r = Seq(v).toDF("v")
      .select(CoarseExpressions.coarse_assign(col("v"), k1, k2, dim,
        l1, l2)).head()
    if (r.isNullAt(0)) None else Some(r.getInt(0))
  }

  test("assign: two-stage argmax cosine, hand-checked") {
    assert(assignOf(Seq(1.0f, 0.1f)).contains(0)) // +x side, upper sub
    assert(assignOf(Seq(1.0f, -0.1f)).contains(1)) // +x side, lower sub
    assert(assignOf(Seq(0.1f, 1.0f)).contains(2)) // +y side, +x-ish sub
    assert(assignOf(Seq(-0.1f, 1.0f)).contains(3))
  }

  test("assign: wrong-length vector yields null; zero vector lands " +
      "deterministically in cell 0") {
    assert(assignOf(Seq(1.0f, 2.0f, 3.0f)).isEmpty)
    assert(assignOf(Seq(0.0f, 0.0f)).contains(0)) // all-NaN sims
  }

  test("probe with beam=1 leads with the assigned cell; beam=k1 equals " +
      "the exhaustive top-nprobe over the full grid") {
    val rnd = new scala.util.Random(17)
    val vs = Seq.fill(40)(Seq.fill(dim)(rnd.nextGaussian().toFloat))
    def cosine(a: Seq[Float], c: Seq[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- 0 until dim) {
        val x = a(i).toDouble; val y = c(i)
        dot += x * y; na += x * x; nb += y * y
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val df = vs.toDF("v")
    val got = df.select(
      CoarseExpressions.coarse_assign(col("v"), k1, k2, dim, l1, l2)
        .as("cell"),
      CoarseExpressions.coarse_probe(col("v"), k1, k2, dim, l1, l2, 2, 1)
        .as("p1"),
      CoarseExpressions.coarse_probe(col("v"), k1, k2, dim, l1, l2, 3, 2)
        .as("pFull"))
      .collect()
    vs.zip(got).foreach { case (v, r) =>
      assert(r.getSeq[Int](1).head == r.getInt(0),
        s"beam=1 first probe != assigned cell for $v")
      // exhaustive top-3 over all 4 composed cells (sim desc, id asc)
      val want = (0 until k1 * k2)
        .map(c => (c, cosine(v, l2.slice(c * dim, c * dim + dim))))
        .sortBy { case (c, s) => (-s, c) }.take(3).map(_._1)
      assert(r.getSeq[Int](2) == want, s"full-beam probe drift for $v")
    }
  }

  test("CoarseTables digest equality: separately-built same-content " +
      "tables are semanticEqual (CSE-sound); different content is not; " +
      "toString never renders the tables") {
    import graft.plans.{CoarseAssignExpr, CoarseTables}
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val l1a = l1.toArray; val l2a = l2.toArray
    val ta = CoarseTables(spark, l1a, l2a)
    val tb = CoarseTables(spark, l1.toArray, l2.toArray) // fresh arrays
    assert(ta == tb && ta.hashCode == tb.hashCode,
      "same content must digest-equal across instances")
    val child = BoundReference(0, ArrayType(FloatType), nullable = true)
    assert(CoarseAssignExpr(child, k1, k2, dim, ta)
      .semanticEquals(CoarseAssignExpr(child, k1, k2, dim, tb)))
    val tc = CoarseTables(spark, l1a,
      l2.updated(0, 0.5).toArray) // one value differs
    assert(ta != tc, "different content must not digest-equal")
    assert(!CoarseAssignExpr(child, k1, k2, dim, ta)
      .semanticEquals(CoarseAssignExpr(child, k1, k2, dim, tc)))
    // O(1) rendering: an expression toString must never inline the
    // tables (the r13 Seq signature printed them)
    val s = CoarseAssignExpr(child, k1, k2, dim, ta).toString
    assert(s.length < 200 && s.contains("coarse_tables"))
  }

  test("train on the embeddings fixture: complete grid, " +
      "layout-independent, assignment covers the corpus") {
    val em = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = Similarity.trainCoarseHierarchical(em, "embedding", 9)
    val b = Similarity.trainCoarseHierarchical(em.repartition(7),
      "embedding", 9)
    assert(a.k1 == 3 && a.k2 == 3 && a.nlist == 9 && a.dim == 64)
    assert(a.l2.length == 9 && a.l1.length == 3)
    // bit-identical across partition layouts (content-sorted fits)
    assert(a.l2.map(c => (c._1, c._2, c._3.toSeq)) ==
      b.l2.map(c => (c._1, c._2, c._3.toSeq)))
    val cells = em.select(Similarity.assignCellHier(col("embedding"), a)
      .as("cell")).collect().map(_.getInt(0))
    assert(cells.length == 500 && cells.forall(c => c >= 0 && c < 9))
    // the grid is genuinely used: several distinct cells populated
    assert(cells.distinct.length >= 4)
  }

  test("fail-fast: sample too thin for the requested nlist") {
    val em = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val e = intercept[IllegalArgumentException] {
      Similarity.trainCoarseHierarchical(em, "embedding", 64,
        minPointsPerCentroid = 32) // 500 points / 64 cells ≈ 7 < 32
    }
    assert(e.getMessage.contains("per"))
  }

  test("flat trainCentroids refuses nlist past the driver ceiling and " +
      "points at the hierarchical path") {
    val em = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val e = intercept[IllegalArgumentException] {
      Similarity.trainCentroids(em, "embedding", 5000)
    }
    assert(e.getMessage.contains("trainCoarseHierarchical"))
  }

  test("index store round-trips; torn quantizer grid is rejected") {
    val em = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val p = java.nio.file.Files.createTempDirectory("ivfh").toString
    val cq = Similarity.writeIvfIndexHier(em, p, 9)
    val back = Similarity.readCoarseQuantizer(spark, p)
    assert(back.k1 == cq.k1 && back.k2 == cq.k2 && back.dim == cq.dim)
    assert(back.l2.map(c => (c._1, c._2, c._3.toSeq)) ==
      cq.l2.map(c => (c._1, c._2, c._3.toSeq)))
    // the partitioned index covers the corpus exactly once
    assert(spark.read.parquet(s"$p/index").count() == 500)
    // torn store: drop one quantizer row and rewrite
    spark.read.parquet(s"$p/quantizer")
      .filter(!(col("c1") === 1 && col("c2") === 1))
      .write.mode("overwrite").parquet(s"$p/torn/quantizer")
    spark.read.parquet(s"$p/l1")
      .write.mode("overwrite").parquet(s"$p/torn/l1")
    spark.read.parquet(s"$p/meta")
      .write.mode("overwrite").parquet(s"$p/torn/meta")
    val e = intercept[IllegalArgumentException] {
      Similarity.readCoarseQuantizer(spark, s"$p/torn")
    }
    assert(e.getMessage.contains("torn"))
  }

  test("semanticNearDups through a hierarchical quantizer finds the " +
      "planted twins; flat/hier exclusivity enforced") {
    import graft.operators.Dedup
    val rnd = new scala.util.Random(23)
    // 60 base vectors + a near-identical twin for the first 10
    val base = (1L to 60L).map(i =>
      (i, Array.fill(16)(rnd.nextGaussian().toFloat)))
    val twins = base.take(10).map { case (i, v) =>
      (1000L + i, v.map(x => x + 0.001f))
    }
    val df = (base ++ twins).map { case (i, v) => (i, v.toSeq) }
      .toDF("vec_id", "embedding")
    val cq = Similarity.trainCoarseHierarchical(df, "embedding", 9,
      minPointsPerCentroid = 1)
    val pairs = Dedup.semanticNearDups(df, "vec_id", "embedding",
        threshold = 0.999, nlist = 9, hierQuantizer = Some(cq))
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    // a twin pair can only be missed if the 0.001 nudge crosses a
    // cell boundary — on 16-dim gaussians that is rare; require most
    assert((1L to 10L).count(i => pairs.contains((i, 1000L + i))) >= 8,
      s"planted twins missed: $pairs")
    // and nothing else is .999-similar in a random gaussian corpus
    assert(pairs.forall { case (a, b) => b - a == 1000L })
    val e = intercept[IllegalArgumentException] {
      Dedup.semanticNearDups(df, "vec_id", "embedding", 0.9,
        nlist = 9, centroids = Some(Seq.empty),
        hierQuantizer = Some(cq))
    }
    assert(e.getMessage.contains("at most one"))
  }

  test("balancedSample auto-routes past the flat ceiling to the " +
      "hierarchical fit") {
    val em = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // the route proof without a heavyweight train: past 4096 cells the
    // call must land in trainCoarseHierarchical, whose points-per-
    // centroid fail-fast names itself — the flat path would instead
    // throw trainCentroids' ceiling message
    val e = intercept[IllegalArgumentException] {
      graft.operators.Embeddings.balancedSample(em, "embedding",
        "vec_id", nlist = 4097, perCell = 10)
    }
    assert(e.getMessage.contains("trainCoarseHierarchical"))
    // same route in clusterTopics (its in-line fit shares the rule)
    val docs = em.select(col("vec_id").as("doc_id"),
      lit("some words here").as("text"))
    val e2 = intercept[IllegalArgumentException] {
      graft.operators.Embeddings.clusterTopics(em, "vec_id",
        "embedding", docs, "doc_id", "text", nlist = 4097)
    }
    assert(e2.getMessage.contains("trainCoarseHierarchical"))
  }

  test("knnJoinIvfHier: self-join recall vs exact kNN; quantizer/nlist " +
      "mismatch refused") {
    val em = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val exact = Similarity.knnJoinExact(em, 3)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val got = Similarity.knnJoinIvfHier(em, 3, nlist = 9, nprobe = 3,
        beam = 3, minPointsPerCentroid = 8)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val r = (exact & got).size.toDouble / exact.size
    // 3 of 9 cells probed through a beam of 3: recall must beat the
    // unguided 1/3 corpus fraction comfortably
    assert(r >= 0.5, s"hier self-join recall=$r")
    val cq = Similarity.trainCoarseHierarchical(em, "embedding", 9)
    val e = intercept[IllegalArgumentException] {
      Similarity.knnJoinIvfHier(em, 3, nlist = 16, quantizer = Some(cq))
    }
    assert(e.getMessage.contains("matching nlist"))
  }

  test("hierarchical IVF-PQ: recall vs exact L2, residual layout " +
      "improves distortion, torn meta refused") {
    val em = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cq = Similarity.trainCoarseHierarchical(em, "embedding", 9)
    val queries = em.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    // exact L2 top-5 (driver-side: 500 × 3 pairs)
    val all = em.select("vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val exact = all.filter(_._1 < 3).flatMap { case (q, qv) =>
      all.filter(_._1 != q)
        .map { case (id, v) =>
          var d = 0.0; var i = 0
          while (i < qv.length) {
            val t = qv(i).toDouble - v(i); d += t * t; i += 1 }
          (id, d)
        }
        .sortBy { case (id, d) => (d, id) }.take(5)
        .map { case (id, _) => (q, id) }
    }.toSet
    val p = java.nio.file.Files.createTempDirectory("ivfpqh").toString
    Similarity.writeIvfPqIndexHier(em, p, cq, m = 8, ncodes = 16)
    assert(!Similarity.readIvfPqHierMeta(spark, p))
    val got = Similarity.ivfPqHierTopKFromIndex(spark, p, queries, 5,
        nprobe = 4, beam = 3)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    assert(got.size == 15) // 3 queries × k=5 — probes found enough
    val r = (exact & got).size.toDouble / exact.size
    assert(r >= 0.1, s"hier IVF-PQ recall=$r") // ≫ chance (~0.01)
    // residual layout: same grid, rebased queries, flag round-trips
    val rp = java.nio.file.Files.createTempDirectory("ivfpqhr").toString
    Similarity.writeIvfPqIndexHier(em, rp, cq, m = 8, ncodes = 16,
      residual = true)
    assert(Similarity.readIvfPqHierMeta(spark, rp))
    val res = Similarity.ivfPqHierTopKFromIndex(spark, rp, queries, 5,
        nprobe = 4, beam = 3)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    assert(res.size == 15)
    // residual self-distortion strictly below raw over the corpus —
    // the same witness PqSpec uses for the flat layout
    def meanDistortion(path: String, resLayout: Boolean): Double = {
      val cbs = Similarity.readPqCodebooks(spark, path)
      val codes = spark.read.parquet(s"$path/codes")
      val joined = em.join(codes, Seq("vec_id"))
      val x =
        if (!resLayout) col("embedding").cast("array<double>")
        else {
          val centDf = spark.createDataFrame(
              cq.l2.map { case (c1, c2, v) => (c1 * cq.k2 + c2, v.toSeq) })
            .toDF("cell2", "centroid")
          zip_with(col("embedding").cast("array<double>"),
            col("centroid").cast("array<double>"), (a, b) => a - b)
        }
      val src =
        if (!resLayout) joined
        else joined.join(broadcast(spark.createDataFrame(
            cq.l2.map { case (c1, c2, v) => (c1 * cq.k2 + c2, v.toSeq) })
          .toDF("cell2", "centroid")), col("cell") === col("cell2"))
      src.select(graft.plans.PqExpressions.pq_adc(x, col("codes"),
          cbs.ncodes, cbs.dsub, cbs.flat).as("d"))
        .agg(avg(col("d"))).head().getDouble(0)
    }
    assert(meanDistortion(rp, resLayout = true) <
      meanDistortion(p, resLayout = false))
    // torn store: meta gone → refuse
    def rmr(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmr)); f.delete(); ()
    }
    rmr(new java.io.File(s"$p/meta"))
    val e = intercept[IllegalArgumentException] {
      Similarity.readIvfPqHierMeta(spark, p)
    }
    assert(e.getMessage.contains("torn"))
  }

  test("refined hier IVF-PQ equals the exact-cosine ranking restricted " +
      "to the ADC shortlist — the refine-stage law") {
    val em = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cq = Similarity.trainCoarseHierarchical(em, "embedding", 9)
    val p = java.nio.file.Files.createTempDirectory("ivfpqhRef").toString
    Similarity.writeIvfPqIndexHier(em, p, cq, m = 8, ncodes = 16)
    val queries = em.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val shortlist = Similarity.ivfPqHierTopKFromIndex(spark, p, queries,
        15, nprobe = 4, beam = 3)
      .select("qid", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val refined = Similarity.ivfPqHierTopKRefined(spark, p, em, queries,
        5, nprobe = 4, beam = 3, refineFactor = 3)
      .select("qid", "rank", "vec_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .toSet
    val vecs = em.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val want = shortlist.flatMap { case (qid, cands) =>
      val qv = vecs(qid)
      cands.toSeq.map(id => (id, cos(vecs(id), qv)))
        .sortBy { case (id, s) => (-s, id) }
        .take(5).zipWithIndex
        .map { case ((id, _), i) => (qid, i + 1, id) }
    }.toSet
    assert(refined == want,
      "refine must be exact-cosine over exactly the ADC shortlist")
  }

  test("append ≡ rebuild: hier IVF probes row-identical on an appended " +
      "store; appends log records distortion; compaction collapses " +
      "fragmented groups without changing probes") {
    val em = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = em.filter(col("vec_id") < 400)
    val b = em.filter(col("vec_id") >= 400)
    val cq = Similarity.trainCoarseHierarchical(a, "embedding", 9,
      minPointsPerCentroid = 8)
    val p1 = java.nio.file.Files.createTempDirectory("ivfhApp").toString
    val p2 = java.nio.file.Files.createTempDirectory("ivfhReb").toString
    Similarity.writeIvfIndexHier(a, p1, 9, quantizer = Some(cq))
    val dist = Similarity.appendIvfIndexHier(b, p1)
    assert(dist > 0.0 && !dist.isNaN)
    // rebuild over the union with the SAME quantizer — the law's oracle
    Similarity.writeIvfIndexHier(em, p2, 9, quantizer = Some(cq))
    val queries = em.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    def probe(p: String) = Similarity.ivfHierTopKFromIndex(spark, p,
        queries, 5, nprobe = 4, beam = 2)
      .select("qid", "rank", "vec_id", "sim")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    val appended = probe(p1)
    assert(appended == probe(p2), "append ≡ rebuild probe law broke")
    // appended rows are genuinely searchable: some result ids >= 400
    assert(appended.exists(_._3 >= 400L))
    val log = Similarity.readAppendLog(spark, p1).collect()
    assert(log.length == 1 &&
      log.head.getAs[Long]("n_rows") == 100L &&
      log.head.getAs[Double]("base_distortion") > 0.0)
    // the append fragmented at least one group; compaction collapses
    // every group back to one file and probes are unchanged
    def maxFiles(p: String): Int = new java.io.File(s"$p/index")
      .listFiles().filter(f => f.isDirectory &&
        f.getName.startsWith("cell_grp=")).map(
        _.listFiles().count(f2 => f2.isFile &&
          f2.getName.endsWith(".parquet"))).max
    assert(maxFiles(p1) >= 2, "append did not add per-group files")
    Similarity.compactIvfIndexHier(spark, p1)
    assert(maxFiles(p1) == 1, "compaction left fragmented groups")
    assert(probe(p1) == appended, "compaction changed probe results")
    // a second compact is a no-op (nothing fragmented): meta mtime
    // proves the store was not touched
    val metaDir = new java.io.File(s"$p1/meta")
    val before = metaDir.listFiles().map(_.lastModified()).max
    Similarity.compactIvfIndexHier(spark, p1)
    assert(metaDir.listFiles().map(_.lastModified()).max == before)
  }

  test("append ≡ rebuild for hier IVF-PQ (persisted quantizer AND " +
      "codebooks); drifted batch refused BEFORE any mutation") {
    val em = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = em.filter(col("vec_id") < 400)
    val b = em.filter(col("vec_id") >= 400)
    val cq = Similarity.trainCoarseHierarchical(a, "embedding", 9,
      minPointsPerCentroid = 8)
    val p1 = java.nio.file.Files.createTempDirectory("ivfpqhApp").toString
    val p2 = java.nio.file.Files.createTempDirectory("ivfpqhReb").toString
    Similarity.writeIvfPqIndexHier(a, p1, cq, m = 8, ncodes = 16,
      residual = true)
    Similarity.appendIvfPqIndexHier(b, p1)
    // rebuild over the union with the SAME quantizer and the APPENDED
    // store's persisted codebooks (fit on a alone — what append used)
    val cb = Similarity.readPqCodebooks(spark, p1)
    Similarity.writeIvfPqIndexHier(em, p2, cq, m = 8, ncodes = 16,
      residual = true, codebooks = Some(cb))
    val queries = em.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    def probe(p: String) = Similarity.ivfPqHierTopKFromIndex(spark, p,
        queries, 5, nprobe = 4, beam = 3)
      .select("qid", "rank", "vec_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val appended = probe(p1)
    assert(appended == probe(p2), "PQ append ≡ rebuild probe law broke")
    assert(appended.exists(_._3 >= 400L))
    // drift gate: a 5×-scaled batch has ~25× the squared-L2 distortion
    // (the k-means objective the threshold compares in) and must be
    // refused with the default threshold — and the refusal happens
    // BEFORE any mutation, so the store still probes identically
    val drifted = b.select(col("vec_id"),
      transform(col("embedding"), x => x * lit(5.0f)).as("embedding"))
    val e = intercept[IllegalArgumentException] {
      Similarity.appendIvfPqIndexHier(drifted, p1)
    }
    assert(e.getMessage.contains("drifted"))
    assert(probe(p1) == appended, "refused append mutated the store")
  }

  test("hierarchical probe recall vs exact cosine top-10 across beams") {
    val em = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val p = java.nio.file.Files.createTempDirectory("ivfhr").toString
    Similarity.writeIvfIndexHier(em, p, 9)
    val queries = em.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val exact = Similarity.bruteForceTopK(em, queries, 10)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    def recallAt(beam: Int): Double = {
      val got = Similarity.ivfHierTopKFromIndex(spark, p, queries, 10,
          nprobe = 4, beam = beam)
        .select("qid", "vec_id").as[(Long, Long)].collect().toSet
      (exact & got).size.toDouble / exact.size
    }
    val r1 = recallAt(1); val r2 = recallAt(2); val r3 = recallAt(3)
    // 4 of 9 cells probed: chance would be ~0.44 of the corpus seen —
    // real recall must beat the unguided fraction comfortably. NOTE:
    // recall is NOT guaranteed monotone in beam at fixed nprobe (a
    // wider beam's candidate cells can DISPLACE a narrower beam's
    // true-neighbor cell from the top-nprobe), so only floors are
    // asserted — the algorithm promises nothing stronger.
    assert(r1 >= 0.3, s"beam=1 recall=$r1")
    assert(r2 >= 0.6, s"beam=2 recall=$r2")
    assert(r3 >= 0.6, s"beam=3 recall=$r3")
  }

  test("lazy probe ≡ kernel probe, row-for-row: hier IVF and hier " +
      "IVF-PQ (raw and residual), across beams — the past-the-" +
      "broadcast-ceiling path must be a pure re-plumbing of the same " +
      "arithmetic, never a different ranking") {
    val em = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cq = Similarity.trainCoarseHierarchical(em, "embedding", 9,
      minPointsPerCentroid = 8)
    val queries = em.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val pIvf = java.nio.file.Files.createTempDirectory("lazyIvf").toString
    Similarity.writeIvfIndexHier(em, pIvf, 9, quantizer = Some(cq))
    for (beam <- Seq(1, 2, 3); nprobe <- Seq(2, 4)) {
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select("qid", "rank", "vec_id", "sim").collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
            r.getDouble(3))).toSet
      val kern = rows(Similarity.ivfHierTopKFromIndex(spark, pIvf,
        queries, 5, nprobe = nprobe, beam = beam))
      val lazyR = rows(Similarity.ivfHierTopKFromIndexLazy(spark, pIvf,
        queries, 5, nprobe = nprobe, beam = beam))
      assert(lazyR == kern, s"hier IVF lazy ≠ kernel at beam=$beam " +
        s"nprobe=$nprobe")
    }
    for (residual <- Seq(false, true)) {
      val p = java.nio.file.Files.createTempDirectory(
        s"lazyPq$residual").toString
      Similarity.writeIvfPqIndexHier(em, p, cq, m = 8, ncodes = 16,
        residual = residual)
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select("qid", "rank", "vec_id").collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      val kern = rows(Similarity.ivfPqHierTopKFromIndex(spark, p,
        queries, 5, nprobe = 4, beam = 3))
      val lazyR = rows(Similarity.ivfPqHierTopKFromIndexLazy(spark, p,
        queries, 5, nprobe = 4, beam = 3))
      assert(lazyR == kern,
        s"hier IVF-PQ (residual=$residual) lazy ≠ kernel")
    }
  }

  test("lazy probe refuses a torn quantizer sidecar loudly — the " +
      "pruned relational read validates grid completeness (every " +
      "opened level-1 cell contributes exactly k2 rows) instead of " +
      "silently dropping candidate cells, matching the kernel path's " +
      "readCoarseQuantizer refusal") {
    val em = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val p = java.nio.file.Files.createTempDirectory("lazyTorn").toString
    Similarity.writeIvfIndexHier(em, p, 9, minPointsPerCentroid = 8)
    val queries = em.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    // sanity: intact store probes fine
    assert(Similarity.ivfHierTopKFromIndexLazy(spark, p, queries, 5,
      nprobe = 4, beam = 3).collect().nonEmpty)
    // tear the quantizer: drop one (c1, c2) row, as a partial copy or
    // interrupted rebuild would
    val q = spark.read.parquet(s"$p/quantizer").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2)))
    val torn = q.filterNot { case (c1, c2, _) => c1 == 0 && c2 == 0 }
    def rmr(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmr)); f.delete(); ()
    }
    rmr(new java.io.File(s"$p/quantizer"))
    spark.createDataFrame(torn.toSeq)
      .toDF("c1", "c2", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$p/quantizer")
    // beam=3 opens all three level-1 cells, so the torn c1=0 is probed
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfHierTopKFromIndexLazy(spark, p, queries, 5,
        nprobe = 4, beam = 3).collect()
    }
    assert(e.getMessage.contains("torn") &&
        e.getMessage.contains("2 of 3"),
      s"must refuse with the torn-store message: ${e.getMessage}")
  }
}
