package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Embedding-column aggregation operators for training-data pipelines:
  * per-group centroids and centroid-similarity (outlier) scoring.
  *
  * Scale design:
  *  - the centroid is a typed [[Aggregator]] whose buffer is one
  *    (sum[dims], count) pair — map-side partial aggregation means each
  *    executor contributes ONE 8·dims-byte row per group to the shuffle,
  *    never the vectors themselves. 100 TB of embeddings with k groups
  *    shuffles k·partitions tiny rows.
  *  - scoring joins the finished centroids back by group key; group
  *    cardinality is assumed small (labels, sources, clusters), so the
  *    join is a broadcast and the corpus never shuffles.
  *  - sums are doubles regardless of the (usually float) storage type:
  *    summing a 100M-row group in float32 loses ~3 decimal digits to
  *    accumulated rounding; the extra 4 bytes/dim only exist in the
  *    aggregation buffer, not in storage.
  */
object Embeddings {

  /** (sum per dimension, element count) running buffer. */
  final case class VecAcc(sum: Array[Double], n: Long)

  /** Typed mean-vector Aggregator over float-array embeddings.
    * Null/empty-safe: null AND empty inputs are skipped (an empty
    * array seeding the buffer would make the next real vector read as
    * "length drift" and kill the job — covAggregator skips the same
    * way); groups with no non-null non-empty vector yield an empty
    * array. */
  val meanAggregator: Aggregator[Seq[Float], VecAcc, Seq[Double]] =
    new Aggregator[Seq[Float], VecAcc, Seq[Double]] {
      override def zero: VecAcc = VecAcc(Array.emptyDoubleArray, 0L)
      private def add(acc: VecAcc, v: Seq[Float]): VecAcc =
        if (v == null || v.isEmpty) acc
        else if (acc.n == 0L) {
          val s = new Array[Double](v.length)
          var i = 0
          while (i < v.length) { s(i) = v(i).toDouble; i += 1 }
          VecAcc(s, 1L)
        } else {
          require(v.length == acc.sum.length,
            s"embedding length drift: ${v.length} vs ${acc.sum.length}")
          var i = 0
          while (i < v.length) { acc.sum(i) += v(i).toDouble; i += 1 }
          VecAcc(acc.sum, acc.n + 1L)
        }
      override def reduce(acc: VecAcc, v: Seq[Float]): VecAcc = add(acc, v)
      override def merge(a: VecAcc, b: VecAcc): VecAcc =
        if (a.n == 0L) b
        else if (b.n == 0L) a
        else {
          require(a.sum.length == b.sum.length,
            s"embedding length drift: ${b.sum.length} vs ${a.sum.length}")
          var i = 0
          while (i < a.sum.length) { a.sum(i) += b.sum(i); i += 1 }
          VecAcc(a.sum, a.n + b.n)
        }
      override def finish(acc: VecAcc): Seq[Double] =
        if (acc.n == 0L) Seq.empty
        else acc.sum.map(_ / acc.n).toSeq
      override def bufferEncoder: Encoder[VecAcc] = Encoders.product[VecAcc]
      override def outputEncoder: Encoder[Seq[Double]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
    }

  /** The mean aggregator as an untyped column function. */
  def vector_mean: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(meanAggregator)

  /** Per-group mean embedding: (groupCol, centroid array<double>). */
  def centroids(df: DataFrame, groupCol: String, vecCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(vector_mean(col(vecCol)).as("centroid"))

  /** Symmetric int8 quantization of an embedding column — the standard
    * 4-bytes-per-dim → 1 storage/IO reduction for 100 TB embedding
    * tables (cosine after dequantization degrades < 1e-3 at 64-256
    * dims; spec-pinned). Per-vector scale = max|v| / 127; elements are
    * `floor(v / scale + 0.5)` — written as floor(+0.5), not round(),
    * because Java and DuckDB disagree on round-half of NEGATIVE values
    * (Math.round(-2.5) = -2, DuckDB -3) and the oracle replays this
    * arithmetic exactly. Zero vectors quantize to zeros (scale 1 guard).
    * Pure projection — quantization is a scan, no shuffle. */
  def quantize(df: DataFrame, vecCol: String,
      qCol: String = "qvec", scaleCol: String = "scale"): DataFrame = {
    // withColumn would silently REPLACE a caller's existing qvec/scale
    // ("scale" is a common name) — fail fast like Pack.cumBefore
    require(!df.columns.contains(qCol) && !df.columns.contains(scaleCol),
      s"quantize: input already carries a '$qCol' or '$scaleCol' " +
        "column — pass different qCol/scaleCol names")
    val maxAbs = array_max(transform(col(vecCol), x => abs(x)))
      .cast("double")
    val scale = when(maxAbs === 0.0 || maxAbs.isNull, lit(1.0))
      .otherwise(maxAbs / 127.0)
    df.withColumn(scaleCol, scale)
      .withColumn(qCol,
        transform(col(vecCol), x =>
          floor(x.cast("double") / col(scaleCol) + 0.5).cast("tinyint")))
  }

  /** Inverse of [[quantize]]: q · scale as array<float>. */
  def dequantize(qCol: Column, scaleCol: Column): Column =
    transform(qCol, b => (b.cast("double") * scaleCol).cast("float"))

  /** Cosine similarity of every vector to its own group's centroid —
    * the outlier-scoring primitive of semantic-cluster cleaning (low
    * similarity = candidate mislabel/noise). Centroids broadcast; the
    * corpus is scored in place with zero vector shuffle. */
  def centroidSims(df: DataFrame, groupCol: String, vecCol: String)
      : DataFrame =
    df.join(broadcast(centroids(df, groupCol, vecCol)), groupCol)
      .withColumn("centroid_sim",
        Similarity.cosine(col(vecCol).cast("array<double>"), col("centroid")))

  // ---- distributed PCA ------------------------------------------------

  /** One-pass second-moment statistics of an embedding column:
    * count, per-dimension sum, and the FULL d×d raw-product matrix
    * (row-major `prod(i*d + j) = Σ v_i·v_j`). The aggregation buffer
    * carries only the upper triangle (d·(d+1)/2 doubles) and mirrors
    * it on finish, so the shuffle for the whole corpus is
    * |partitions| × ~4·d² bytes — at d=1024 that is ~4 MB per map-side
    * partial and ZERO vector rows. Covariance and PCA both derive from
    * this single pass. */
  final case class CovStats(n: Long, sum: Seq[Double], prod: Seq[Double])

  /** (count, sum[d], upper-triangle products[d(d+1)/2]) buffer. */
  final case class CovAcc(n: Long, sum: Array[Double], tri: Array[Double])

  val covAggregator: Aggregator[Seq[Float], CovAcc, CovStats] =
    new Aggregator[Seq[Float], CovAcc, CovStats] {
      override def zero: CovAcc =
        CovAcc(0L, Array.emptyDoubleArray, Array.emptyDoubleArray)
      override def reduce(acc: CovAcc, v: Seq[Float]): CovAcc =
        if (v == null || v.isEmpty) acc
        else {
          val d = v.length
          val a =
            if (acc.n == 0L) CovAcc(0L, new Array[Double](d),
              new Array[Double](d * (d + 1) / 2))
            else {
              require(d == acc.sum.length,
                s"embedding length drift: $d vs ${acc.sum.length}")
              acc
            }
          val x = new Array[Double](d)
          var i = 0
          while (i < d) { x(i) = v(i).toDouble; i += 1 }
          var t = 0
          i = 0
          while (i < d) {
            a.sum(i) += x(i)
            var j = i
            while (j < d) { a.tri(t) += x(i) * x(j); j += 1; t += 1 }
            i += 1
          }
          CovAcc(a.n + 1L, a.sum, a.tri)
        }
      override def merge(a: CovAcc, b: CovAcc): CovAcc =
        if (a.n == 0L) b
        else if (b.n == 0L) a
        else {
          require(a.sum.length == b.sum.length,
            s"embedding length drift: ${b.sum.length} vs ${a.sum.length}")
          var i = 0
          while (i < a.sum.length) { a.sum(i) += b.sum(i); i += 1 }
          i = 0
          while (i < a.tri.length) { a.tri(i) += b.tri(i); i += 1 }
          CovAcc(a.n + b.n, a.sum, a.tri)
        }
      override def finish(acc: CovAcc): CovStats = {
        val d = acc.sum.length
        val full = new Array[Double](d * d)
        var t = 0
        var i = 0
        while (i < d) {
          var j = i
          while (j < d) {
            full(i * d + j) = acc.tri(t)
            full(j * d + i) = acc.tri(t)
            j += 1; t += 1
          }
          i += 1
        }
        CovStats(acc.n, acc.sum.toSeq, full.toSeq)
      }
      override def bufferEncoder: Encoder[CovAcc] = Encoders.product[CovAcc]
      override def outputEncoder: Encoder[CovStats] =
        Encoders.product[CovStats]
    }

  /** The covariance-stats aggregator as an untyped column function. */
  def cov_stats: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(covAggregator)

  /** Fitted PCA basis: per-dimension mean, top-k eigenvalues
    * (descending), and k unit-norm principal components (rows,
    * sign-canonicalized so each row's largest-|x| entry is positive —
    * eigenvector sign is otherwise arbitrary and would make reruns
    * non-deterministic). */
  final case class PcaModel(mean: Array[Double],
      eigenvalues: Array[Double], components: Array[Array[Double]])

  /** Fit PCA over a float-embedding column in ONE distributed pass:
    * the corpus reduces to [[CovStats]] (map-side partials, no vector
    * shuffle), the d×d population covariance `prod/n − mean·meanᵀ` is
    * assembled on the driver (d² doubles — bounded by dimension, not
    * rows), and a cyclic Jacobi eigensolver extracts the basis.
    * Jacobi on a symmetric d×d is exact to machine precision and
    * deterministic. Driver cost is O(d³) PER SWEEP (~10 sweeps):
    * sub-second at d ≤ ~256, but expect tens of seconds of driver
    * compute at d = 1024+ — for very high-dimensional embeddings,
    * [[randomProject]] down first (JL preserves the spectrum you keep)
    * or budget the one-off eigensolve like any model-fit step. */
  def fitPca(df: DataFrame, vecCol: String, k: Int): PcaModel = {
    val row = df.agg(cov_stats(col(vecCol)).as("s"))
      .selectExpr("s.n", "s.sum", "s.prod").head()
    fitFromMoments(row.getLong(0), row.getSeq[Double](1).toArray,
      row.getSeq[Double](2).toArray, k)
  }

  /** The driver-side tail of [[fitPca]]: covariance from raw moments,
    * Jacobi eigenbasis, top-k with sign canonicalization. */
  private def fitFromMoments(n: Long, sum: Array[Double],
      prod: Array[Double], k: Int): PcaModel = {
    require(n > 0, "fitPca: no non-empty vectors")
    val d = sum.length
    val mean = sum.map(_ / n)
    val cov = Array.tabulate(d, d)((i, j) =>
      prod(i * d + j) / n - mean(i) * mean(j))
    val (evals, evecs) = jacobiEigen(cov)
    val kk = math.min(k, d)
    val comps = Array.tabulate(kk) { r =>
      val v = evecs(r)
      // sign canon: largest-|x| entry positive
      var bi = 0
      var i = 1
      while (i < d) { if (math.abs(v(i)) > math.abs(v(bi))) bi = i; i += 1 }
      if (v(bi) < 0) v.map(-_) else v
    }
    PcaModel(mean, evals.take(kk), comps)
  }

  /** Append one batch's raw moment statistics (n, Σv, Σvvᵀ row-major)
    * to a persisted stats store — moments are ADDITIVE, so a PCA over
    * a growing corpus never rescans old batches: each ingest appends
    * ONE tiny row (d + d² doubles), and [[fitPcaFromStats]] folds
    * however many rows have accumulated. Same incremental pattern as
    * the dedup fingerprint index. */
  def appendMomentStats(df: DataFrame, vecCol: String, path: String,
      overwrite: Boolean = false): Unit =
    df.agg(cov_stats(col(vecCol)).as("s"))
      .selectExpr("s.n AS n", "s.sum AS sum", "s.prod AS prod")
      .write.mode(if (overwrite) "overwrite" else "append").parquet(path)

  /** Fit PCA from the persisted moment store: reads one row per
    * appended batch (driver collect bounded by batch COUNT, not corpus
    * size), folds the additive moments, and reuses the [[fitPca]]
    * eigen tail. Result is identical to a single-pass fit over the
    * union of all batches up to float-summation order. */
  def fitPcaFromStats(spark: org.apache.spark.sql.SparkSession,
      path: String, k: Int): PcaModel = {
    val rows = spark.read.parquet(path)
      .selectExpr("n", "sum", "prod").collect()
    require(rows.nonEmpty, s"fitPcaFromStats: no stats rows at $path")
    var n = 0L
    var sum: Array[Double] = null
    var prod: Array[Double] = null
    rows.foreach { r =>
      val bn = r.getLong(0)
      if (bn > 0L) {
        val bs = r.getSeq[Double](1)
        val bp = r.getSeq[Double](2)
        // every row must be internally consistent (prod is the d×d
        // row-major matrix of the SAME d as sum) — a hand-written or
        // truncated store row would otherwise surface as an index
        // error deep in the fold loop instead of a clear message
        require(bp.length.toLong == bs.length.toLong * bs.length,
          s"moment-stats row shape: prod has ${bp.length} entries, " +
            s"expected ${bs.length}×${bs.length}")
        if (sum == null) { sum = bs.toArray; prod = bp.toArray }
        else {
          require(bs.length == sum.length,
            s"moment-stats dimension drift: ${bs.length} vs ${sum.length}")
          var i = 0
          while (i < sum.length) { sum(i) += bs(i); i += 1 }
          i = 0
          while (i < prod.length) { prod(i) += bp(i); i += 1 }
        }
        n += bn
      }
    }
    fitFromMoments(n, sum, prod, k)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix (public
    * textbook algorithm — Golub & Van Loan §8.5). Returns
    * (eigenvalues, eigenvectors-as-rows), sorted by eigenvalue
    * descending. O(d³) per sweep, converges in ~log(d) sweeps; runs on
    * the driver over the d×d covariance only. */
  private[graft] def jacobiEigen(m: Array[Array[Double]],
      maxSweeps: Int = 64, tol: Double = 1e-14)
      : (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    // tolerances RELATIVE to the matrix scale: an absolute cutoff
    // either never converges (entries ~1e12 floor their off-diagonals
    // at ‖A‖·ε ≫ tol) or never rotates (entries ~1e-18 all sit below
    // it despite meaningful relative structure)
    var scale = 0.0
    for (i <- 0 until d; j <- 0 until d)
      scale = math.max(scale, math.abs(a(i)(j)))
    val offTol = tol * tol * scale * scale * d * d
    val rotTol = tol * scale
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < maxSweeps && off > offTol) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          off += a(p)(q) * a(p)(q)
          if (math.abs(a(p)(q)) > rotTol) {
            // Jacobi rotation zeroing a(p)(q)
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            // stable tan of the rotation: t = sign(θ)/(|θ|+√(θ²+1))
            val t =
              if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              else 1.0 / (theta - math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    (order.map(i => a(i)(i)).toArray,
      order.map(i => Array.tabulate(d)(r => v(r)(i))).toArray)
  }

  /** Project an embedding column onto a fitted PCA basis:
    * out[r] = Σ_d (v[d] − mean[d]) · comp[r][d], as `array<double>`.
    * Row-local via the native codegen'd `mat_project` kernel (an
    * interpreted higher-order-function form costs ~µs per element;
    * the kernel is one JVM call per row) — projection is a pure scan,
    * no shuffle, and composes with quantized storage via
    * [[dequantize]]. */
  /** Persist a fitted [[PcaModel]] as one flat parquet relation at
    * `path/model`: rows (comp, i, w, mu, eig) — component weight
    * w = components(comp)(i), the per-dimension mean mu (repeated per
    * comp), and the component's eigenvalue. k·d rows of plain doubles:
    * the shape an external SQL engine can replay the projection from
    * directly (the strict q_embed_pca oracle), and small enough that
    * coalesce(1) is the right layout. A projection that wants to be
    * replayable must RUN with the model read back from this store
    * ([[readPcaModel]]) so both sides share bit-identical doubles —
    * never the in-memory fit (a refit's distributed moment sums can
    * land in a different partition-merge order). */
  def writePcaModel(spark: org.apache.spark.sql.SparkSession,
      model: PcaModel, path: String): Unit = {
    val rows = for {
      c <- model.components.indices
      i <- model.mean.indices
    } yield (c.toLong, i.toLong, model.components(c)(i), model.mean(i),
      model.eigenvalues(c))
    import spark.implicits._
    rows.toDF("comp", "i", "w", "mu", "eig")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/model")
  }

  /** Load a [[writePcaModel]] store. Driver-side (k·d rows — the model
    * IS the broadcast-sized half, same stance as
    * [[Similarity.readCentroids]]). */
  def readPcaModel(spark: org.apache.spark.sql.SparkSession,
      path: String): PcaModel = {
    val rows = spark.read.parquet(s"$path/model")
      .select(col("comp"), col("i"), col("w"), col("mu"), col("eig"))
      .collect()
    require(rows.nonEmpty, s"readPcaModel: empty model at $path")
    val k = rows.iterator.map(_.getLong(0)).max.toInt + 1
    val d = rows.iterator.map(_.getLong(1)).max.toInt + 1
    require(rows.length == k * d,
      s"readPcaModel: ${rows.length} rows, expected $k×$d — torn store?")
    val mean = new Array[Double](d)
    val eig = new Array[Double](k)
    val comps = Array.fill(k)(new Array[Double](d))
    rows.foreach { r =>
      val c = r.getLong(0).toInt
      val i = r.getLong(1).toInt
      comps(c)(i) = r.getDouble(2)
      mean(i) = r.getDouble(3)
      eig(c) = r.getDouble(4)
    }
    PcaModel(mean, eig, comps)
  }

  def pcaProject(df: DataFrame, vecCol: String, model: PcaModel,
      outCol: String = "pca", whiten: Boolean = false): DataFrame = {
    val mat =
      if (!whiten) model.components.flatten
      else model.components.zip(model.eigenvalues).flatMap {
        // unit variance per component: rows scaled 1/√λ (λ floored at
        // machine-noise scale so near-null directions don't explode)
        case (row, ev) =>
          val s = 1.0 / math.sqrt(math.max(ev, 1e-12))
          row.map(_ * s)
      }
    df.withColumn(outCol,
      graft.plans.HashExpressions.mat_project(col(vecCol), model.mean, mat))
  }

  /** Johnson–Lindenstrauss random projection to `outDim` dimensions —
    * the cheap pre-ANN/pre-dedup dimensionality cut when PCA's extra
    * pass isn't warranted. The Gaussian matrix is generated
    * deterministically from `seed` on the driver (outDim×d doubles,
    * scaled 1/√outDim so expected norms are preserved) and applied via
    * the same zero-Exchange codegen'd kernel as [[pcaProject]] — at
    * 100 TB the projection is a pure scan, and the matrix rides the
    * plan, not the data. */
  def randomProject(df: DataFrame, vecCol: String, inDim: Int,
      outDim: Int, seed: Long = 42L, outCol: String = "rp",
      signBasis: Boolean = false): DataFrame = {
    val mat =
      if (signBasis) {
        // Achlioptas sign projection: entries ±1/√outDim with signs
        // drawn from the md5-prefix basis (sign(j,d) = low bit of
        // md5Prefix60("j:d") — the same DuckDB-replayable matrix the
        // LSH banding uses). An equally valid JL construction
        // (Achlioptas '03), and the one that lets q_embed_rproj face
        // the strict oracle; `seed` is ignored on this basis.
        val s = 1.0 / math.sqrt(outDim.toDouble)
        val signs = graft.plans.HashKernels.md5SignMatrix(outDim, inDim)
        Array.tabulate(outDim * inDim)(i => if (signs(i)) s else -s)
      } else {
        val rnd = new scala.util.Random(seed)
        Array.fill(outDim * inDim)(
          rnd.nextGaussian() / math.sqrt(outDim.toDouble))
      }
    df.withColumn(outCol,
      graft.plans.HashExpressions.mat_project(col(vecCol),
        new Array[Double](inDim), mat))
  }

  // ---- cluster-balanced sampling --------------------------------------

  /** Cluster-balanced (diversity) sampling: k-means cells over the
    * embedding space, then at most `perCell` rows kept per cell in
    * deterministic md5(id) order. Down-weights dense semantic regions
    * that dominate uniform samples of web-scale corpora.
    *
    * Scale shape: centroids train on a bounded sorted sample
    * (driver-local Lloyd's, deterministic — [[Similarity.trainCentroids]]),
    * assignment is a codegen'd scan against centroid literals, and the
    * per-cell cap is a WindowGroupLimit top-n that truncates BELOW the
    * exchange — the shuffle carries at most nlist·perCell rows per
    * partition, never the corpus. */
  def balancedSample(df: DataFrame, vecCol: String, idCol: String,
      nlist: Int, perCell: Int,
      centroids: Option[Seq[(Int, Array[Float])]] = None): DataFrame = {
    // persisted-quantizer option: same contract as [[clusterTopics]] —
    // pass a writeIvfIndex sidecar to replay the exact cells an
    // external engine can re-derive (the strict q_embed_balanced
    // oracle); default trains in-line. nlist ∝ n sizing past the flat
    // quantizer's 4096-cell ceiling auto-routes to the hierarchical
    // fit (the semanticNearDups convention) — cell-balanced corpus
    // selection is exactly the operator that wants fixed cell sizes
    // at any corpus scale.
    centroids.foreach(cs => require(cs.size == nlist,
      s"balancedSample: persisted quantizer has ${cs.size} cells but " +
        s"nlist=$nlist — pass the matching nlist"))
    val cellExpr: Column =
      if (centroids.isEmpty && nlist > 4096)
        Similarity.assignCellHier(col(vecCol),
          Similarity.trainCoarseHierarchical(df, vecCol, nlist))
      else Similarity.nearestCell(col(vecCol),
        centroids.getOrElse(Similarity.trainCentroids(df, vecCol, nlist)))
    val assigned = df.withColumn("cell", cellExpr)
    Corpus.capPerGroup(assigned, "cell",
      Seq(md5(col(idCol).cast("string")), col(idCol)), perCell)
      .drop("rnk") // capPerGroup's working column, not part of the contract
  }

  // ---- cluster topic labeling -----------------------------------------

  /** BERTopic-style cluster topic labeling: k-means cells over the
    * embedding space, each cell labeled with its c-TF-IDF-distinctive
    * terms — the "what IS this semantic region" view a curation pass
    * needs before deciding to keep, cap, or drop a cluster. Returns
    * (cell, n_docs, term, tf, gdf, score), `topTerms` rows per cell,
    * ordered within each cell by score.
    *
    * Scale shape: composition of two already-bounded plans — centroids
    * train on a bounded driver sample and assignment is a codegen'd
    * scan against centroid literals ([[Similarity.trainCentroids]]);
    * the term scoring is [[Corpus.distinctiveTerms]]'s one (cell, word)
    * count shuffle + vocabulary-sized broadcast + WindowGroupLimit cut.
    * The embedding⋈text join shuffles only (id, cell) against the doc
    * scan; vectors never move after assignment. */
  def clusterTopics(embedded: DataFrame, idCol: String, vecCol: String,
      docs: DataFrame, docIdCol: String, textCol: String,
      nlist: Int, topTerms: Int = 5,
      centroids: Option[Seq[(Int, Array[Float])]] = None): DataFrame = {
    require(nlist > 0 && topTerms > 0, "nlist and topTerms must be positive")
    // `centroids`: a persisted quantizer (e.g. the writeIvfIndex
    // sidecar via Similarity.readCentroids) — the production shape:
    // train once, every labeling pass replays the same cells, and an
    // external replayer can reread the identical floats (the strict
    // q_embed_topics oracle). Default trains in-line (knnJoinIvf's
    // convention).
    centroids.foreach(cs => require(cs.size == nlist,
      s"clusterTopics: persisted quantizer has ${cs.size} cells but " +
        s"nlist=$nlist — pass the matching nlist (a silent mismatch " +
        "would relabel every cell)"))
    // in-line fits past the flat ceiling auto-route to the
    // hierarchical quantizer (the semanticNearDups/balancedSample
    // convention) — topic maps over web-scale corpora want
    // nlist ∝ n cells
    val cellExpr: Column =
      if (centroids.isEmpty && nlist > 4096)
        Similarity.assignCellHier(col(vecCol),
          Similarity.trainCoarseHierarchical(embedded, vecCol, nlist))
      else Similarity.nearestCell(col(vecCol), centroids.getOrElse(
        Similarity.trainCentroids(embedded, vecCol, nlist)))
    val assigned = embedded.select(col(idCol).as("__cid"),
      cellExpr.as("cell"))
    val labeled = assigned.join(
      docs.select(col(docIdCol).as("__cid"), col(textCol)), Seq("__cid"))
    val sizes = labeled.groupBy(col("cell"))
      .agg(count(lit(1)).as("n_docs"))
    Corpus.distinctiveTerms(labeled, "cell", textCol, topTerms)
      .join(broadcast(sizes), Seq("cell")) // ≤nlist rows
      .select(col("cell"), col("n_docs"), col("term"), col("tf"),
        col("gdf"), col("score"))
  }
}
