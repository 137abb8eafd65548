package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (Array[Float]).
  *
  * Scale design: brute-force is the *correctness baseline* — a broadcast of
  * the (small) query set against the full corpus, i.e. a map-side nested
  * loop with zero shuffle of the corpus. The scale path is
  * random-hyperplane LSH: each vector gets a b-bit signature; candidate
  * generation is an equi-join on the signature (or on multi-probe
  * neighbors), turning O(n·q) dot products into O(bucket) work per query.
  * At 100 TB the corpus side never shuffles its vectors: signatures (8
  * bytes) shuffle, vectors stay where the scan put them until the final
  * per-bucket rerank.
  */
object Similarity {

  /** Cosine similarity of two float-array columns (double accumulation,
    * sequential in index order — deterministic). Native codegen kernel:
    * the composable aggregate/zip_with form evaluates its lambdas
    * interpreted per element with boxing, which dominates every rerank
    * stage; [[graft.plans.CosineSimExpr]] is one primitive loop per pair
    * producing bit-identical results. */
  def cosine(a: Column, b: Column): Column =
    graft.plans.HashExpressions.cosine_sim(a, b)

  /** Brute-force top-k cosine neighbors for each query vector.
    * `queries` must be small (it is broadcast); the corpus is only mapped +
    * locally reduced — the shuffle carries q·k candidate rows, not vectors. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      qidCol: String = "qid", qvecCol: String = "qvec"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joined = corpus.select(col(idCol), col(vecCol))
      .join(broadcast(queries.select(col(qidCol), col(qvecCol))),
        col(idCol) =!= col(qidCol)) // exclude self-match
      .withColumn("sim", cosine(col(vecCol), col(qvecCol)))
    val w = Window.partitionBy(col(qidCol))
      .orderBy(col("sim").desc, col(idCol).asc)
    joined
      .select(col(qidCol), col(idCol), col("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Random-hyperplane signature: bit i = sign(v · h_i) where h_i is a
    * deterministic pseudo-random hyperplane derived from (i, dim) via a
    * splitmix-style integer mix — reproducible with no stored model. */
  def hyperplaneSignature(vec: Column, bits: Int): Column =
    graft.plans.HashExpressions.hyperplane_sig(vec, bits)

  /** IVF (inverted-file) ANN: a coarse k-means quantizer partitions the
    * corpus into `nlist` cells; each query probes its `nprobe` nearest
    * centroids and reranks exactly within those cells only.
    *
    * Scale: centroids are tiny (broadcast); the corpus is scanned once
    * to assign cells (narrow map) and thereafter only probed cells'
    * rows are reranked — at 100 TB the corpus would be WRITTEN
    * partitioned by cell so a probe prunes parquet partitions instead
    * of scanning. Returns (qid, vec_id, sim, rank ≤ k). */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nlist: Int = 16, nprobe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding",
      qidCol: String = "qid", qvecCol: String = "qvec"): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    import org.apache.spark.sql.expressions.Window

    val train = corpus.select(array_to_vector(
      col(vecCol).cast("array<double>")).as("features"))
    val model = new KMeans().setK(nlist).setSeed(42L).setMaxIter(10)
      .fit(train)
    val centroids = model.clusterCenters.zipWithIndex.map {
      case (c, i) => (i, c.toArray.map(_.toFloat))
    }
    val centDf = corpus.sparkSession.createDataFrame(centroids.toSeq)
      .toDF("cell", "centroid")

    // assign corpus rows to their nearest cell (argmax cosine; one
    // broadcast join + window, no shuffle of vectors beyond the agg)
    def nearestCells(df: DataFrame, vc: String, n: Int, out: String) = {
      val w = Window.partitionBy(df.columns.map(col): _*)
        .orderBy(col("__sim").desc, col("cell").asc)
      df.join(broadcast(centDf))
        .withColumn("__sim", cosine(col(vc), col("centroid")))
        .withColumn("__r", row_number().over(w))
        .filter(col("__r") <= n)
        .drop("__sim", "__r", "centroid")
        .withColumnRenamed("cell", out)
    }
    val assigned = nearestCells(corpus.select(col(idCol), col(vecCol)),
      vecCol, 1, "cell")
    val probes = nearestCells(queries.select(col(qidCol), col(qvecCol)),
      qvecCol, nprobe, "cell")

    val w = Window.partitionBy(col(qidCol))
      .orderBy(col("sim").desc, col(idCol).asc)
    assigned.join(broadcast(probes), Seq("cell"))
      .filter(col(idCol) =!= col(qidCol))
      .withColumn("sim", cosine(col(vecCol), col(qvecCol)))
      .select(col(qidCol), col(idCol), col("sim"))
      .dropDuplicates(qidCol, idCol) // a pair may meet in several cells
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Materialize the IVF index: corpus written partitioned by its coarse
    * k-means cell, centroids as a tiny sidecar. At 100 TB this is the
    * load-bearing half of IVF — a probe then reads `nprobe` parquet
    * partitions instead of scanning the corpus (storage-level partition
    * pruning, see [[ivfTopKFromIndex]]). */
  def writeIvfIndex(corpus: DataFrame, path: String, nlist: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    import org.apache.spark.sql.expressions.Window
    val train = corpus.select(array_to_vector(
      col(vecCol).cast("array<double>")).as("features"))
    val model = new KMeans().setK(nlist).setSeed(42L).setMaxIter(10)
      .fit(train)
    val centroids = model.clusterCenters.zipWithIndex.map {
      case (c, i) => (i, c.toArray.map(_.toFloat))
    }
    val centDf = corpus.sparkSession.createDataFrame(centroids.toSeq)
      .toDF("cell", "centroid")
    val w = Window.partitionBy(col(idCol)).orderBy(col("__sim").desc,
      col("cell").asc)
    corpus.select(col(idCol), col(vecCol))
      .join(broadcast(centDf))
      .withColumn("__sim", cosine(col(vecCol), col("centroid")))
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") === 1)
      .select(col(idCol), col(vecCol), col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/index")
    centDf.write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Probe a materialized IVF index: the `cell isin(probes)` predicate is
    * a PARTITION filter on the index layout — Spark prunes unprobed
    * cells at the file-listing level, so probe I/O is |probed cells|,
    * not |corpus|. Centroids and queries are driver-small. */
  def ivfTopKFromIndex(spark: SparkSession, path: String,
      queries: DataFrame, k: Int, nprobe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding",
      qidCol: String = "qid", qvecCol: String = "qvec"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val centDf = spark.read.parquet(s"$path/centroids")
    val wq = Window.partitionBy(col(qidCol)).orderBy(col("__sim").desc,
      col("cell").asc)
    val probes = queries.select(col(qidCol), col(qvecCol))
      .join(broadcast(centDf))
      .withColumn("__sim", cosine(col(qvecCol), col("centroid")))
      .withColumn("__r", row_number().over(wq))
      .filter(col("__r") <= nprobe)
      .select(col(qidCol), col(qvecCol), col("cell"))
    val probedCells = probes.select("cell").distinct()
      .collect().map(_.getInt(0))
    val index = spark.read.parquet(s"$path/index")
      .filter(col("cell").isin(probedCells.toSeq: _*)) // partition pruning
    val w = Window.partitionBy(col(qidCol))
      .orderBy(col("sim").desc, col(idCol).asc)
    index.join(broadcast(probes), Seq("cell"))
      .filter(col(idCol) =!= col(qidCol))
      .withColumn("sim", cosine(col(vecCol), col(qvecCol)))
      .select(col(qidCol), col(idCol), col("sim"))
      .dropDuplicates(qidCol, idCol)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** LSH-bucketed ANN: candidates = corpus rows whose signature equals the
    * query's signature (single-probe), reranked exactly within the bucket.
    * Recall is tuned by `bits` (fewer bits → bigger buckets → higher
    * recall, more rerank work). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, bits: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding",
      qidCol: String = "qid", qvecCol: String = "qvec"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sigCorpus = corpus.select(col(idCol), col(vecCol),
      hyperplaneSignature(col(vecCol), bits).as("sig"))
    val sigQueries = queries.select(col(qidCol), col(qvecCol),
      hyperplaneSignature(col(qvecCol), bits).as("sig"))
    val cands = sigCorpus.join(broadcast(sigQueries), Seq("sig"))
      .filter(col(idCol) =!= col(qidCol))
      .withColumn("sim", cosine(col(vecCol), col(qvecCol)))
    val w = Window.partitionBy(col(qidCol))
      .orderBy(col("sim").desc, col(idCol).asc)
    cands.select(col(qidCol), col(idCol), col("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
