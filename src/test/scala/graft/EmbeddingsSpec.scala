package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Embeddings

/** Value pins for the embedding-centroid operators (q_embed_centroid's
  * DuckDB oracle checks the full surface; these pin the Aggregator's
  * reduce/merge arithmetic on hand-computable vectors and partitions). */
class EmbeddingsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("vector mean aggregator: hand-computed centroid per group") {
    val df = Seq(
      (0, Seq(1.0f, 0.0f)), (0, Seq(0.0f, 1.0f)),
      (1, Seq(2.0f, 2.0f))
    ).toDF("label", "embedding")
    val out = Embeddings.centroids(df, "label", "embedding")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(out(0) == Seq(0.5, 0.5))
    assert(out(1) == Seq(2.0, 2.0))
  }

  test("merge across many partitions equals single-partition result") {
    val vecs = (1 to 257).map(i => (i % 3, Seq(i.toFloat, (2 * i).toFloat)))
    val one = Embeddings.centroids(
      vecs.toDF("label", "embedding").coalesce(1), "label", "embedding")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val many = Embeddings.centroids(
      vecs.toDF("label", "embedding").repartition(13), "label", "embedding")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    for (l <- 0 to 2)
      (one(l), many(l)).zipped.foreach((a, b) =>
        assert(math.abs(a - b) < 1e-9, s"label $l drifted"))
  }

  test("null vectors are skipped, not poisoning the group") {
    val df = Seq(
      (0, Option(Seq(4.0f, 0.0f))), (0, Option.empty[Seq[Float]])
    ).toDF("label", "embedding")
    val out = Embeddings.centroids(df, "label", "embedding")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(out(0) == Seq(4.0, 0.0))
    // EMPTY vectors are skipped too (a failed embed next to real
    // vectors): seeding the buffer at length 0 would read as "length
    // drift" on the next real vector and kill the job
    val mixed = Seq(
      (0, Seq.empty[Float]), (0, Seq(2.0f, 6.0f)), (0, Seq(4.0f, 0.0f))
    ).toDF("label", "embedding")
    val m = Embeddings.centroids(mixed, "label", "embedding")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(m(0) == Seq(3.0, 3.0))
  }

  test("centroid similarity: member of a tight cluster scores near 1") {
    val df = Seq(
      (1L, 0, Seq(1.0f, 0.01f)), (2L, 0, Seq(1.0f, -0.01f)),
      (3L, 1, Seq(0.0f, 1.0f))
    ).toDF("vec_id", "label", "embedding")
    val sims = Embeddings.centroidSims(df, "label", "embedding")
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Double]("centroid_sim")).toMap
    assert(sims(1L) > 0.999 && sims(2L) > 0.999)
    assert(sims(3L) > 0.999999) // singleton cluster: centroid = itself
  }

  test("int8 quantize: codes bounded, roundtrip cosine ≥ 0.9999") {
    import org.apache.spark.sql.functions._
    val em = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = Embeddings.quantize(em, "embedding")
    val checked = q.select(
      graft.operators.Similarity.cosine(
        Embeddings.dequantize(col("qvec"), col("scale"))
          .cast("array<double>"),
        col("embedding").cast("array<double>")).as("rt"),
      array_max(transform(col("qvec"), x => abs(x.cast("int")))).as("mx"))
      .agg(min(col("rt")), max(col("mx")), count(lit(1))).head()
    assert(checked.getDouble(0) >= 0.9999,
      s"worst roundtrip cosine ${checked.getDouble(0)}")
    assert(checked.getInt(1) <= 127) // int8 range, scale saturates at max
    assert(checked.getLong(2) == 500L)
  }

  test("int8 quantize: zero vector survives via the scale guard") {
    val df = Seq((1L, Seq(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val r = Embeddings.quantize(df, "embedding").head()
    assert(r.getAs[Double]("scale") == 1.0)
    assert(r.getSeq[Byte](r.fieldIndex("qvec")).toList == List(0, 0, 0))
  }

  // ---- PCA -----------------------------------------------------------

  test("jacobiEigen: known symmetric matrices to machine precision") {
    // diag(3,1) rotated 45°: eigenvalues {3,1}, eigenvectors (1,1)/(1,-1)
    val (ev, vecs) = Embeddings.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(ev(0) - 3.0) < 1e-12 && math.abs(ev(1) - 1.0) < 1e-12)
    assert(math.abs(math.abs(vecs(0)(0)) - math.sqrt(0.5)) < 1e-12)
    // already-diagonal input: identity basis, sorted values
    val (ev2, vecs2) = Embeddings.jacobiEigen(
      Array(Array(1.0, 0.0, 0.0), Array(0.0, 5.0, 0.0),
        Array(0.0, 0.0, 2.0)))
    assert(ev2.toSeq == Seq(5.0, 2.0, 1.0))
    assert(math.abs(math.abs(vecs2(0)(1)) - 1.0) < 1e-12)
  }

  test("covariance aggregator equals brute force at any partitioning") {
    val rnd = new scala.util.Random(7)
    val vecs = (1 to 97).map(_ => Seq.fill(5)(rnd.nextFloat()))
    val brute = {
      val n = vecs.size
      val d = 5
      val mean = Array.tabulate(d)(i => vecs.map(_(i).toDouble).sum / n)
      Array.tabulate(d, d)((i, j) =>
        vecs.map(v => v(i).toDouble * v(j).toDouble).sum / n
          - mean(i) * mean(j))
    }
    for (parts <- Seq(1, 7)) {
      val row = vecs.toDF("embedding").repartition(parts)
        .agg(Embeddings.cov_stats(col("embedding")).as("s"))
        .selectExpr("s.n", "s.sum", "s.prod").head()
      val n = row.getLong(0)
      val sum = row.getSeq[Double](1)
      val prod = row.getSeq[Double](2)
      assert(n == 97L)
      for (i <- 0 until 5; j <- 0 until 5) {
        val cov = prod(i * 5 + j) / n - (sum(i) / n) * (sum(j) / n)
        assert(math.abs(cov - brute(i)(j)) < 1e-9,
          s"cov($i,$j) at $parts partitions")
      }
    }
  }

  test("fitPca: planted principal direction recovered, basis orthonormal") {
    // points spread along (1,1,0)/√2 with small noise in other dims
    val rnd = new scala.util.Random(11)
    val df = (1 to 400).map { _ =>
      val a = rnd.nextGaussian() * 10.0
      val e1 = rnd.nextGaussian() * 0.1
      val e2 = rnd.nextGaussian() * 0.1
      Seq((a / math.sqrt(2) + e1).toFloat, (a / math.sqrt(2) - e1).toFloat,
        e2.toFloat)
    }.toDF("embedding")
    val m = Embeddings.fitPca(df, "embedding", 3)
    // eigenvalues descending; top component ≈ ±(1,1,0)/√2
    assert(m.eigenvalues(0) > m.eigenvalues(1))
    assert(m.eigenvalues(1) >= m.eigenvalues(2))
    val c0 = m.components(0)
    val dot = (c0(0) + c0(1)) / math.sqrt(2)
    assert(math.abs(math.abs(dot) - 1.0) < 0.01,
      s"top component ${c0.toSeq} not along (1,1,0)")
    // rows orthonormal
    for (r <- m.components) {
      val norm = math.sqrt(r.map(x => x * x).sum)
      assert(math.abs(norm - 1.0) < 1e-9)
    }
    val cross = m.components(0).zip(m.components(1)).map {
      case (a, b) => a * b }.sum
    assert(math.abs(cross) < 1e-9, "components not orthogonal")
    // sign canon: largest-|x| entry positive
    assert(m.components.forall(r => r(r.zipWithIndex.maxBy(
      p => math.abs(p._1))._2) > 0))
  }

  test("mat_project kernel equals manual projection; null on drift") {
    val model = Embeddings.PcaModel(
      mean = Array(1.0, 2.0),
      eigenvalues = Array(1.0),
      components = Array(Array(0.6, 0.8), Array(-0.8, 0.6)))
    val df = Seq((1L, Seq(3.0f, 4.0f)), (2L, Seq(1.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val out = Embeddings.pcaProject(df, "embedding", model)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](2)).toMap
    // (3-1, 4-2)·(0.6, 0.8) = 2.8 ; ·(-0.8, 0.6) = -0.4
    assert(out(1L).zip(Seq(2.8, -0.4)).forall {
      case (a, b) => math.abs(a - b) < 1e-9 })
    assert(out(2L).zip(Seq(0.0, 0.0)).forall {
      case (a, b) => math.abs(a - b) < 1e-9 })
    // dimension drift → null row, not a stage failure
    val drift = Seq((3L, Seq(1.0f, 2.0f, 3.0f)))
      .toDF("vec_id", "embedding")
    val r = Embeddings.pcaProject(drift, "embedding", model).head()
    assert(r.isNullAt(2))
  }

  test("projected variance along component k equals eigenvalue k") {
    val rnd = new scala.util.Random(23)
    val df = (1 to 300).map(_ => Seq.fill(4)(rnd.nextGaussian().toFloat))
      .toDF("embedding")
    val m = Embeddings.fitPca(df, "embedding", 2)
    val proj = Embeddings.pcaProject(df, "embedding", m)
      .select(col("pca")).collect().map(_.getSeq[Double](0))
    for (k <- 0 until 2) {
      val xs = proj.map(_(k))
      val mu = xs.sum / xs.size
      val v = xs.map(x => (x - mu) * (x - mu)).sum / xs.size
      assert(math.abs(v - m.eigenvalues(k)) < 1e-6,
        s"component $k variance $v vs eigenvalue ${m.eigenvalues(k)}")
    }
  }

  test("whitened projection has unit variance per component") {
    val rnd = new scala.util.Random(41)
    // anisotropic cloud: dim 0 stretched 5×
    val df = (1 to 300).map { _ =>
      Seq((rnd.nextGaussian() * 5).toFloat, rnd.nextGaussian().toFloat,
        rnd.nextGaussian().toFloat)
    }.toDF("embedding")
    val m = Embeddings.fitPca(df, "embedding", 2)
    val proj = Embeddings.pcaProject(df, "embedding", m, whiten = true)
      .select(col("pca")).collect().map(_.getSeq[Double](0))
    for (k <- 0 until 2) {
      val xs = proj.map(_(k))
      val mu = xs.sum / xs.size
      val v = xs.map(x => (x - mu) * (x - mu)).sum / xs.size
      assert(math.abs(v - 1.0) < 1e-6,
        s"whitened component $k variance $v != 1")
    }
  }

  test("incremental moment stats: two appended batches ≡ one-shot fit") {
    val rnd = new scala.util.Random(43)
    val all = (1 to 240).map(_ => Seq.fill(6)(rnd.nextGaussian().toFloat))
    val (a, b) = all.splitAt(100)
    val path = java.nio.file.Files
      .createTempDirectory("moments").toString + "/stats"
    Embeddings.appendMomentStats(a.toDF("embedding"), "embedding", path)
    Embeddings.appendMomentStats(b.toDF("embedding"), "embedding", path)
    val inc = Embeddings.fitPcaFromStats(spark, path, 3)
    val one = Embeddings.fitPca(all.toDF("embedding"), "embedding", 3)
    inc.eigenvalues.zip(one.eigenvalues).foreach { case (x, y) =>
      assert(math.abs(x - y) < 1e-9, s"eigenvalue drift: $x vs $y") }
    inc.mean.zip(one.mean).foreach { case (x, y) =>
      assert(math.abs(x - y) < 1e-12) }
    inc.components.zip(one.components).foreach { case (ci, co) =>
      ci.zip(co).foreach { case (x, y) =>
        assert(math.abs(x - y) < 1e-7, "component drift") } }
  }

  test("PCA model store round-trips bit-exactly") {
    // the strict q_embed_pca oracle depends on the projection running
    // with the EXACT doubles the replayer reads back — the store must
    // lose nothing (parquet doubles are lossless; this pins the
    // row-flattening/reassembly code around them)
    val rnd = new scala.util.Random(11)
    val df = (1 to 80).map(_ => Seq.fill(5)(rnd.nextGaussian().toFloat))
      .toDF("embedding")
    val m = Embeddings.fitPca(df, "embedding", 3)
    val p = java.nio.file.Files.createTempDirectory("pcastore").toString
    Embeddings.writePcaModel(spark, m, p)
    val r = Embeddings.readPcaModel(spark, p)
    assert(r.mean.sameElements(m.mean))
    assert(r.eigenvalues.sameElements(m.eigenvalues))
    assert(r.components.length == m.components.length)
    r.components.zip(m.components).foreach { case (a, b) =>
      assert(a.sameElements(b)) }
  }

  test("balancedSample with persisted centroids equals in-line training") {
    import graft.operators.Similarity
    val rnd = new scala.util.Random(7)
    val df = (1L to 200L).map(i =>
        (i, Seq.fill(3)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val cents = Similarity.trainCentroids(df, "embedding", 4)
    val inline = Embeddings.balancedSample(df, "embedding", "vec_id",
      nlist = 4, perCell = 15)
      .select(col("vec_id"), col("cell")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val persisted = Embeddings.balancedSample(df, "embedding", "vec_id",
      nlist = 4, perCell = 15, centroids = Some(cents))
      .select(col("vec_id"), col("cell")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(inline == persisted)
  }

  test("capped centroid training cuts by content hash, not partition " +
      "prefix") {
    import graft.operators.Similarity
    val rnd = new scala.util.Random(53)
    val vecs = (1 to 100).map(_ => Seq.fill(4)(rnd.nextGaussian().toFloat))
    // n=100 > cap=64 triggers the capped path; thin rate clamps to 1.0
    // (n ≤ 2×cap), so the hash-ordered cut is the ONLY selection — it
    // must be identical across partition layouts (a prefix cut is not:
    // repartition(1) vs repartition(13) enumerate different prefixes)
    val a = Similarity.trainCentroids(
      vecs.toDF("embedding").repartition(1), "embedding", 4,
      maxTrainRows = 64)
    val b = Similarity.trainCentroids(
      vecs.toDF("embedding").repartition(13), "embedding", 4,
      maxTrainRows = 64)
    assert(a.map(_._2.toSeq) == b.map(_._2.toSeq))
  }

  test("a malformed moment-store row fails with a clear shape error") {
    val rnd = new scala.util.Random(47)
    val path = java.nio.file.Files
      .createTempDirectory("moments_bad").toString + "/stats"
    Embeddings.appendMomentStats(
      (1 to 50).map(_ => Seq.fill(4)(rnd.nextGaussian().toFloat))
        .toDF("embedding"), "embedding", path)
    // truncated prod array (hand-written store row)
    Seq((10L, Seq(1.0, 2.0, 3.0, 4.0), Seq(1.0, 2.0, 3.0)))
      .toDF("n", "sum", "prod").write.mode("append").parquet(path)
    val err = intercept[IllegalArgumentException] {
      Embeddings.fitPcaFromStats(spark, path, 2)
    }
    assert(err.getMessage.contains("moment-stats row shape"))
  }

  test("randomProject: deterministic, norm-preserving in expectation") {
    val rnd = new scala.util.Random(31)
    val df = (1L to 200L).map(i =>
      (i, Seq.fill(64)(rnd.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    def proj() = Embeddings.randomProject(df, "embedding", 64, 32)
      .select(col("vec_id"), col("rp")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val p = proj()
    assert(p.values.forall(_.length == 32))
    assert(proj() == p, "projection not deterministic")
    // JL: E‖Rv‖² = ‖v‖²; the MEAN ratio over 200 vectors concentrates
    val orig = df.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(x => x.toDouble * x).sum).toMap
    val ratios = p.map { case (id, v) =>
      v.map(x => x * x).sum / orig(id) }
    val meanRatio = ratios.sum / ratios.size
    assert(math.abs(meanRatio - 1.0) < 0.15,
      s"mean norm ratio $meanRatio drifted from 1")
    // different seed ⇒ different projection
    val q = Embeddings.randomProject(df, "embedding", 64, 32, seed = 7L)
      .orderBy(col("vec_id")).select(col("rp")).head().getSeq[Double](0)
    assert(q != p(1L))
    // md5 sign basis (Achlioptas ±1/√k — the q_embed_rproj oracle
    // path): same JL norm-preservation family, and entry magnitudes
    // are exactly 1/√32 · ‖v‖-free signs, so determinism is structural
    val ps = Embeddings.randomProject(df, "embedding", 64, 32,
        signBasis = true)
      .select(col("vec_id"), col("rp")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val ratiosS = ps.map { case (id, v) => v.map(x => x * x).sum / orig(id) }
    val meanRatioS = ratiosS.sum / ratiosS.size
    assert(math.abs(meanRatioS - 1.0) < 0.15,
      s"sign-basis mean norm ratio $meanRatioS drifted from 1")
    assert(ps(1L) != p(1L), "sign basis unexpectedly equals Gaussian")
  }

  test("balancedSample: per-cell cap respected, deterministic, subset") {
    val rnd = new scala.util.Random(5)
    // two dense clusters + sparse noise
    val rows = (1L to 300L).map { i =>
      val base = if (i % 3 == 0) Array(5.0f, 5.0f)
        else if (i % 3 == 1) Array(-5.0f, 5.0f)
        else Array(rnd.nextFloat() * 20 - 10, rnd.nextFloat() * 20 - 10)
      (i, Seq(base(0) + rnd.nextFloat() * 0.1f,
        base(1) + rnd.nextFloat() * 0.1f))
    }
    val df = rows.toDF("vec_id", "embedding")
    val s1 = Embeddings.balancedSample(df, "embedding", "vec_id",
      nlist = 4, perCell = 10)
    val got = s1.select(col("vec_id"), col("cell")).collect()
    val perCell = got.groupBy(_.getInt(1)).view.mapValues(_.length)
    assert(perCell.values.forall(_ <= 10), s"cap violated: $perCell")
    assert(got.map(_.getLong(0)).toSet.subsetOf(rows.map(_._1).toSet))
    // deterministic across reruns
    val s2 = Embeddings.balancedSample(df, "embedding", "vec_id",
      nlist = 4, perCell = 10)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(s2 == got.map(_.getLong(0)).toSet)
  }

  test("clusterTopics recovers planted cluster vocabularies") {
    // two well-separated embedding clusters, each with an exclusive
    // topic vocabulary plus shared filler — the topic labels must be
    // the exclusive words, never the filler, and must not cross over
    val emb = (0 until 12).map { i =>
      val v = if (i < 6) Seq(1.0f, 0.02f * i) else Seq(0.02f * i, 1.0f)
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val docs = (0 until 12).map { i =>
      val topic = if (i < 6) "astronomy telescope nebula"
                  else "cooking saucepan garlic"
      (i.toLong, s"the and of $topic the and")
    }.toDF("doc_id", "text")
    val out = Embeddings.clusterTopics(emb, "vec_id", "embedding",
      docs, "doc_id", "text", nlist = 2, topTerms = 3)
      .collect()
      .groupBy(_.getAs[Int]("cell"))
      .map { case (c, rows) =>
        c -> (rows.head.getAs[Long]("n_docs"), rows.map(_.getAs[String]("term")).toSet)
      }
    assert(out.size == 2)
    assert(out.values.map(_._1).toSeq.sorted == Seq(6L, 6L))
    val Seq(a, b) = out.values.map(_._2).toSeq
    val astro = Set("astronomy", "telescope", "nebula")
    val cook = Set("cooking", "saucepan", "garlic")
    assert((a == astro && b == cook) || (a == cook && b == astro),
      s"topics must be the exclusive vocabularies: $out")
  }
}
