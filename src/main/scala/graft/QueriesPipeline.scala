package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Q._
import graft.functions.{Norm, Text}
import graft.operators.{Corpus, Dedup, Similarity, Skew}

/** Scalar-function surface (SURVEY §2.9), streaming/incremental semantics
  * (§2.10), and the training-data-pipeline operators (dedup, similarity,
  * text analysis) over documents/embeddings/events.
  */
object QueriesPipeline {

  /** Verified near-dup pairs (shared by q_dedup_minhash and
    * q_dedup_cluster): see [[Dedup.verifiedPairs]] — the verification-
    * gate scale broadcasts the shingled survivor set (one ReuseExchange-
    * shared build for both pair sides). */
  private def minhashVerifiedPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.verifiedPairs(t(s, dir, "documents"), "text", "doc_id")

  /** DuckDB CTE chain computing the brute-force ground truth of
    * [[minhashVerifiedPairs]] (`pairs(id1, id2, jaccard)`). */
  private val minhashPairsCtes: String = """words AS (
          SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS ws
          FROM documents
        ), sh AS (
          SELECT DISTINCT doc_id,
            CASE WHEN len(ws) <= 3 THEN array_to_string(ws, ' ')
            ELSE array_to_string(list_slice(ws, i, i+2), ' ') END AS s
          FROM words, unnest(CASE WHEN len(ws) <= 3 THEN [1]
            ELSE range(1, len(ws)-1) END) AS t(i)
        ), sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        inter AS (
          SELECT a.doc_id id1, b.doc_id id2, count(*) AS i
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        pairs AS (
          SELECT id1, id2, round(i / (sa.n + sb.n - i), 3) AS jaccard
          FROM inter
          JOIN sizes sa ON sa.doc_id = id1
          JOIN sizes sb ON sb.doc_id = id2
          WHERE jaccard >= 0.4)"""

  /** Word bigrams of a text column via the native single-pass shingle
    * kernel, guarded to empty for sub-2-token texts (the kernel returns
    * the whole text as one shingle there). The composable
    * transform(sequence …) form re-ran the full text split per element
    * inside Generate — interpreted, measured 5.7 s vs 0.3 s at sf0.1.
    * Shared by q_ngram_topk and q_ngram_topk_cms so both count the SAME
    * bigram set. */
  private def bigramsOf(text: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    // token_count kernel, not size(split(...)): the composable form
    // materializes a throwaway array per row just to take its length
    val n = Text.token_count(text)
    when(n >= 2, Text.word_shingles(text, 2))
      .otherwise(array().cast("array<string>"))
  }

  /** doc_id-derived noisy crawl-variant URL (shared by q_dedup_url and
    * q_pipeline_web_dedup): canonical key = doc_id % 97; scheme/host
    * case, the default :443 port, trailing slash, tracking params and
    * fragment all vary by doc_id and all normalize away, so the group
    * key only emerges AFTER [[graft.functions.Url.normalize]]. */
  private def plantedCrawlUrl: org.apache.spark.sql.Column = {
    val id = col("doc_id")
    val k = pmod(id, lit(97))
    concat(
      when(pmod(id, lit(2)) === 0, lit("HTTPS://WWW.Example"))
        .otherwise(lit("https://www.example")),
      k.cast("string"),
      when(pmod(id, lit(3)) === 0, lit(".COM")).otherwise(lit(".com")),
      when(pmod(id, lit(5)) === 0, lit(":443")).otherwise(lit("")),
      lit("/page/"), k.cast("string"),
      when(pmod(id, lit(2)) === 0, lit("/")).otherwise(lit("")),
      when(pmod(id, lit(4)) === 0,
        concat(lit("?utm_source=x&b="), pmod(k, lit(9)).cast("string"),
          lit("&a=1")))
        .otherwise(concat(lit("?a=1&fbclid=z&b="),
          pmod(k, lit(9)).cast("string"))),
      when(pmod(id, lit(3)) === 0, lit("#frag")).otherwise(lit("")))
  }

  /** 5-word pseudo-paragraph tiling of the single-line corpus — shared
    * by the paragraph-dedup family (see q_corpus_paragraph_dedup for
    * why the synthetic corpus needs tiling at all; `private[graft]` so
    * the ScaleStress drill tiles the SAME shape it benchmarks).
    * Embedded newlines squash to spaces FIRST: the tiles join on "\n"
    * and dedupKeepFirst re-splits on it, so a newline surviving inside
    * a token would shift unit boundaries relative to [[tile5Sql]]
    * (which consumes the chunks directly, never round-tripping the
    * delimiter). */
  private[graft] def tile5(text: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    // limit -1 pinned explicitly: trailing empty tokens must survive
    // so "a b " and "a b" tile into DIFFERENT unit arrays on BOTH
    // engines (DuckDB string_split keeps trailing empties; Spark's
    // 2-arg split also passes limit=-1, verified empirically on 4.1 —
    // pinning the third arg guards the parity against a default change)
    val ws = split(translate(text, "\n", " "), " ", -1)
    val nch = ceil(size(ws) / lit(5.0)).cast("int")
    array_join(transform(sequence(lit(0), nch - 1),
      j => array_join(slice(ws, j * 5 + 1, lit(5)), " ")), "\n")
  }

  /** The 12-word boilerplate footer q_corpus_substring_dedup plants on
    * doc_id % 4 = 0 — identical literal on the Spark and oracle sides
    * (the plantedCrawlUrl convention: the oracle re-plants it
    * arithmetically, never reading the Spark output). Already
    * lowercase/single-spaced so normalization is a no-op on it. */
  private val substrFooter: String =
    "subscribe to the daily data digest for updates and exclusive query offers"

  /** Build-if-stale the nlist=8 IVF index both q_sim_ivf and
    * q_sim_knn_ivf (and their oracles) share. Index-build is a one-time
    * cost amortized over every probe — exactly how IVF is used at
    * scale; the queries themselves are pruned-partition probes over
    * the persisted layout. Returns the index path. */
  /** Build-if-stale for every tag-keyed persisted artifact: run
    * `build` into the md5-keyed staging dir when `successSub`'s
    * _SUCCESS marker is missing or older than `srcTable`'s parquet.
    * ONE definition of the staleness rule, so a fix to it cannot
    * silently miss one of the stores (there are nine). */
  private def ensureStaged(s: SparkSession, dir: String, tag: String,
      successSub: String, srcTable: String,
      alsoRequire: Seq[String] = Nil)(build: String => Unit)
      : String = {
    val p = Q.stagingDir(dir, tag)
    val marker = if (successSub.isEmpty) s"$p/_SUCCESS"
      else s"$p/$successSub/_SUCCESS"
    val success = new java.io.File(marker)
    val src = new java.io.File(s"$dir/$srcTable.parquet")
    // `alsoRequire`: sub-layouts the CURRENT writer always produces but
    // an older cached build may predate (e.g. the IVF-PQ meta sidecar,
    // added after some staging dirs were already on disk). A cache
    // missing one is a different-VERSION layout, not a fresh one —
    // rebuild rather than let the reader's torn-store guard refuse it.
    def hasParquet(sub: String): Boolean =
      Option(new java.io.File(s"$p/$sub").listFiles()).exists(
        _.exists(f => f.isFile && f.getName.endsWith(".parquet")))
    if (!success.exists() || success.lastModified() < src.lastModified()
        || !alsoRequire.forall(hasParquet))
      build(p)
    p
  }

  /** Built as BUILD(vec_id < 400) + APPEND(rest) + COMPACT — the flat
    * layouts' full recurring-crawl lifecycle runs under the same
    * strict oracles as the hier trees' (the replays recompute
    * assignment for EVERY row from the persisted centroids, so an
    * appended-then-compacted tree must match exactly). */
  private def ensureIvfIndex(s: SparkSession, dir: String): String =
    ensureStaged(s, dir, "ivf_n8_v3", "centroids", "embeddings",
      alsoRequire = Seq("meta", "appends"))(p => {
      val em = t(s, dir, "embeddings")
      Similarity.writeIvfIndex(em.filter(col("vec_id") < 400), p,
        nlist = 8)
      Similarity.appendIvfIndex(em.filter(col("vec_id") >= 400), p)
      Similarity.compactIvfIndex(s, p)
      ()
    })

  /** Build-if-stale the HIERARCHICAL (two-level) IVF index: a 3×3
    * grid — tiny here so the fixture populates every cell, but the
    * same fit/assign/probe path that holds at nlist 10⁵⁻⁶ (drilled in
    * `ScaleStress coarse`). Built as BUILD + APPEND — the recurring-
    * crawl shape (quantizer from the first 4/5, the rest appended with
    * it, per-group file adds) — so the strict q_sim_*hier oracles
    * replay probes over a genuinely appended, fragmented tree. */
  private def ensureIvfHierIndex(s: SparkSession, dir: String): String =
    ensureStaged(s, dir, "ivfh_3x3_v4", "index", "embeddings",
      alsoRequire = Seq("meta", "appends"))(p => {
      val em = t(s, dir, "embeddings")
      Similarity.writeIvfIndexHier(em.filter(col("vec_id") < 400), p,
        nlist = 9, minPointsPerCentroid = 8)
      Similarity.appendIvfIndexHier(em.filter(col("vec_id") >= 400), p)
      ()
    })

  /** Build-if-stale the flat PQ index (m=8 subspaces × ncodes=16,
    * d=64 → 8 ints/vector) that q_embed_pq_codes and q_sim_knn_pq (and
    * their oracles) share — the [[ensureIvfIndex]] convention. */
  private def ensurePqIndex(s: SparkSession, dir: String): String =
    ensureStaged(s, dir, "pq_m8x16_v3", "codes", "embeddings",
      alsoRequire = Seq("meta", "appends"))(p => {
      val em = t(s, dir, "embeddings")
      Similarity.writePqIndex(em.filter(col("vec_id") < 400), p,
        m = 8, ncodes = 16)
      Similarity.appendPqIndex(em.filter(col("vec_id") >= 400), p)
      Similarity.compactPqIndex(s, p, maxFiles = 1)
      ()
    })

  /** Build-if-stale the IVF-PQ layout: codes partitioned by the SAME
    * persisted nlist=8 coarse cells as every other IVF query, PQ
    * m=8×16 within. */
  private def ensureIvfPqIndex(s: SparkSession, dir: String): String =
    ensureStaged(s, dir, "ivfpq_n8_m8x16_v3", "codes", "embeddings",
      alsoRequire = Seq("meta", "appends"))(p => {
      val em = t(s, dir, "embeddings")
      Similarity.writeIvfPqIndex(em.filter(col("vec_id") < 400), p,
        Similarity.readCentroids(s, ensureIvfIndex(s, dir)),
        m = 8, ncodes = 16)
      Similarity.appendIvfPqIndex(em.filter(col("vec_id") >= 400), p)
      Similarity.compactIvfPqIndex(s, p)
      ()
    })

  /** DuckDB replay of the PQ machinery against a persisted index:
    * `cb` reads the codebook sidecar, `recon` rebuilds each corpus
    * vector's QUANTIZED form (the 8 codebook centroids its codes name,
    * flattened in subspace order) so the ADC distance replays as ONE
    * continuous 64-term sequential reduce — bit-identical to the
    * pq_adc kernel's single running accumulator (sub-subtotals summed
    * separately would round differently). `partitioned` switches the
    * codes scan to the hive layout (IVF-PQ) and carries the cell. */
  private def pqReconCtes(tag: String, partitioned: Boolean): String = {
    val codesSrc =
      if (partitioned)
        s"read_parquet('{STAGING:$tag}/codes/*/*.parquet', hive_partitioning = true)"
      else s"read_parquet('{STAGING:$tag}/codes/*.parquet')"
    val cellSel = if (partitioned) ", CAST(k.cell AS INTEGER) AS cell" else ""
    val cellGrp = if (partitioned) ", 2" else ""
    s"""cb AS (
          SELECT sub, code, CAST(centroid AS DOUBLE[]) AS c
          FROM read_parquet('{STAGING:$tag}/codebooks/*.parquet')
        ), cl AS (
          SELECT k.vec_id$cellSel, s.sub AS sub,
            k.codes[s.sub + 1] AS code
          FROM $codesSrc k, (SELECT unnest(range(8)) AS sub) s
        ), recon AS (
          SELECT cl.vec_id${if (partitioned) ", cl.cell" else ""},
            flatten(list(cb.c ORDER BY cb.sub)) AS r
          FROM cl JOIN cb ON cb.sub = cl.sub AND cb.code = cl.code
          GROUP BY 1$cellGrp)"""
  }

  /** The 64-term sequential squared-L2 reduce both PQ oracles share —
    * kernel order: one running accumulator seeded 0.0 over dims. */
  private val pqAdcDistSql: String =
    """list_reduce(list_prepend(0.0, list_transform(range(1, 65),
            i -> (q.e[i] - r.r[i]) * (q.e[i] - r.r[i]))),
            (a, b) -> a + b)"""

  /** Build-if-stale the HIERARCHICAL IVF-PQ layout: the 3×3 composed
    * grid (fixture-sized; `ScaleStress coarse` drills it at 16k),
    * m=8×16 PQ codes inside, the grouped-directory layout. Built as
    * BUILD + APPEND + COMPACT — quantizer AND codebooks fit on the
    * first 4/5, the rest encoded with them and appended, fragmented
    * groups compacted back to one file — so the strict oracles replay
    * the full recurring-crawl lifecycle from the final tree. */
  private def ensureIvfPqHierIndex(s: SparkSession, dir: String): String =
    ensureStaged(s, dir, "ivfpqh_3x3_m8x16_v3", "codes", "embeddings",
      alsoRequire = Seq("meta", "appends"))(p => {
      val em = t(s, dir, "embeddings")
      val head = em.filter(col("vec_id") < 400)
      Similarity.writeIvfPqIndexHier(head, p,
        Similarity.trainCoarseHierarchical(head, "embedding", 9,
          minPointsPerCentroid = 8),
        m = 8, ncodes = 16)
      Similarity.appendIvfPqIndexHier(em.filter(col("vec_id") >= 400), p)
      Similarity.compactIvfPqIndexHier(s, p)
      ()
    })

  /** Build-if-stale the RESIDUAL hierarchical IVF-PQ layout (codes
    * quantize v − c_cell of the composed level-2 cell). */
  private def ensureIvfPqHierResIndex(s: SparkSession,
      dir: String): String =
    ensureStaged(s, dir, "ivfpqhr_3x3_m8x16_v2", "codes", "embeddings",
      alsoRequire = Seq("meta"))(p => {
      val em = t(s, dir, "embeddings")
      Similarity.writeIvfPqIndexHier(em, p,
        Similarity.trainCoarseHierarchical(em, "embedding", 9,
          minPointsPerCentroid = 8),
        m = 8, ncodes = 16, residual = true)
      ()
    })

  /** The [[pqReconCtes]] replay over the hierarchical layout's
    * GROUPED directory tree (cell is a data column there, sorted
    * within cell_grp files — not a hive partition). */
  private def pqReconCtesGrouped(tag: String): String =
    s"""cb AS (
          SELECT sub, code, CAST(centroid AS DOUBLE[]) AS c
          FROM read_parquet('{STAGING:$tag}/codebooks/*.parquet')
        ), cl AS (
          SELECT k.vec_id, CAST(k.cell AS INTEGER) AS cell, s.sub AS sub,
            k.codes[s.sub + 1] AS code
          FROM read_parquet('{STAGING:$tag}/codes/cell_grp=*/*.parquet') k,
            (SELECT unnest(range(8)) AS sub) s
        ), recon AS (
          SELECT cl.vec_id, cl.cell,
            flatten(list(cb.c ORDER BY cb.sub)) AS r
          FROM cl JOIN cb ON cb.sub = cl.sub AND cb.code = cl.code
          GROUP BY 1, 2)"""

  /** Build-if-stale the RESIDUAL IVF-PQ layout (codes quantize
    * v − c_cell; finer at the same bit budget). */
  private def ensureIvfPqResIndex(s: SparkSession, dir: String): String =
    ensureStaged(s, dir, "ivfpqr_n8_m8x16_v2", "codes", "embeddings",
      alsoRequire = Seq("meta"))(p =>
      Similarity.writeIvfPqIndex(t(s, dir, "embeddings"), p,
        Similarity.readCentroids(s, ensureIvfIndex(s, dir)),
        m = 8, ncodes = 16, residual = true))

  /** Build-if-stale a persisted PCA model (tag-keyed staging, the
    * [[ensureIvfIndex]] convention). `fit` runs only when the store is
    * missing or older than embeddings.parquet; the returned model is
    * ALWAYS read back from the store, so the projection the query runs
    * and the {STAGING:tag} oracle replay share bit-identical doubles. */
  private def ensurePcaModel(s: SparkSession, dir: String, tag: String)(
      fit: => graft.operators.Embeddings.PcaModel)
      : graft.operators.Embeddings.PcaModel =
    graft.operators.Embeddings.readPcaModel(s,
      ensureStaged(s, dir, tag, "model", "embeddings")(p =>
        graft.operators.Embeddings.writePcaModel(s, fit, p)))

  /** DuckDB replay of [[graft.operators.Embeddings.pcaProject]] against
    * a [[ensurePcaModel]] store: per (vec, comp), the centered dot
    * product recomputed in the KERNEL'S summation order (list_reduce
    * left-to-right ≡ matProjectFloat's sequential `s += (x−mu)·w`) from
    * the same persisted doubles, so the pre-round float result is
    * bit-identical, not merely close. `__SCALE__` hooks the whitening
    * factor (1.0 for the plain projection; 1/√max(eig,1e-12) applied to
    * w BEFORE the product for the whitened one, matching the driver's
    * pre-scaled matrix). */
  private def pcaReplaySql(tag: String, scaleSql: String): String =
    s"""WITH m AS (
          SELECT comp, i, w, mu, eig
          FROM read_parquet('{STAGING:$tag}/model/*.parquet')
        ), basis AS (
          SELECT comp,
            list(w ORDER BY i) AS w, list(mu ORDER BY i) AS mu,
            min(eig) AS eig
          FROM m GROUP BY comp
        ), v AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
          FROM embeddings
          WHERE embedding IS NOT NULL AND len(embedding) > 0)
        SELECT vec_id, comp,
          round(list_reduce(list_transform(range(1, len(e) + 1),
            ii -> (e[ii] - mu[ii]) * (w[ii] * ($scaleSql))),
            (a, b) -> a + b), 3) + 0.0 AS pca
        FROM v CROSS JOIN basis"""

  /** DuckDB replay of the persisted-IVF probe machinery, shared by the
    * q_sim_ivf / q_sim_knn_ivf oracles: `cents` reads the centroid
    * sidecar [[ensureIvfIndex]] wrote ({STAGING:ivf_n8_v3} substitutes to
    * the run's staging path in Verify's oracle dump), `assigned`
    * recomputes every corpus vector's home cell from those floats —
    * argmax cosine, ties to the LOWEST cell, the
    * [[graft.operators.Similarity.nearestCell]] contract. The k-means
    * FIT stays outside the oracle (float-iterative); everything
    * downstream of the persisted model is replayed from scratch. */
  private val ivfReplayCtes: String = """cents AS (
          SELECT cell, centroid
          FROM read_parquet('{STAGING:ivf_n8_v3}/centroids/*.parquet')
        ), assigned AS (
          SELECT vec_id, cell FROM (
            SELECT e.vec_id, c.cell,
              row_number() OVER (PARTITION BY e.vec_id ORDER BY
                list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                  CAST(c.centroid AS DOUBLE[])) DESC, c.cell) AS ar
            FROM embeddings e CROSS JOIN cents c)
          WHERE ar = 1)"""

  /** DuckDB replay of [[graft.operators.Dedup.winnowOverlapPairs]] at
    * the q_dedup_winnow_* defaults (w=24, k=4, maxBucket=64,
    * minShared=4): fingerprints from definitional window recomputes,
    * bucket cap, pair join + floor — ends in `wpairs(id1, id2,
    * n_shared)`. Shared by the pairs report and the purge so both
    * count the SAME pairs. */
  private val winnowPairsCtes: String = winnowPairCtesOver("documents")

  /** The same replay over any (doc_id, text) relation — the composed
    * normalize→fingerprint oracle runs it over its normalized CTE. */
  private def winnowPairCtesOver(src: String): String = ("""cps AS (
          SELECT doc_id,
            list_transform(regexp_extract_all(text, '[\s\S]'),
              c -> cast(unicode(c) as bigint)) AS cp
          FROM __SRC__
        ), hs AS (
          SELECT doc_id,
            CASE WHEN len(cp) = 0 THEN CAST([] AS BIGINT[])
              WHEN len(cp) < 24 THEN [list_reduce(cp,
                (a, c) -> (a * 257 + c) % 1000000007)]
              ELSE list_transform(range(1, len(cp) - 22),
                i -> list_reduce(cp[i:i+23],
                  (a, c) -> (a * 257 + c) % 1000000007))
              END AS hh
          FROM cps
        ), fpl AS (
          SELECT doc_id,
            CASE WHEN len(hh) = 0 THEN CAST([] AS BIGINT[])
              WHEN len(hh) < 4 THEN [list_aggregate(hh, 'min')]
              ELSE list_sort(list_distinct(
                list_transform(range(1, len(hh) - 2),
                  p -> list_aggregate(hh[p:p+3], 'min'))))
              END AS fp
          FROM hs
        ), fps AS (
          SELECT doc_id, unnest(fp) AS fp FROM fpl
        ), cnt AS (
          SELECT fp, count(*) AS c FROM fps GROUP BY fp
        ), elig AS (
          SELECT f.doc_id, f.fp FROM fps f JOIN cnt USING (fp)
          WHERE c <= 64
        ), wpairs AS (
          SELECT a.doc_id AS id1, b.doc_id AS id2,
            cast(count(*) as bigint) AS n_shared
          FROM elig a JOIN elig b
            ON a.fp = b.fp AND a.doc_id < b.doc_id
          GROUP BY 1, 2 HAVING count(*) >= 4)""").replace("__SRC__", src)

  /** DuckDB replay of the [[graft.sinks.Shards]] packing, from a CTE
    * named `src(doc_id, text)` (the rows read back OUT of a written
    * shard tree): the md5("id:seed") shuffle key (seed 0, id appended
    * — [[graft.operators.Corpus.shuffleKey]]), whitespace token
    * counts (the q_pack_sequences replay, null → 0 mirroring the
    * writers' coalesce), the running prefix sum in key order, bins of
    * `tokensPerBin`, shards of `binsPerShard` bins. Ends in
    * `b(seq_id, shardR, n)`. */
  private def shardReplayCtes(tokensPerBin: String,
      binsPerShard: String): String = s"""t AS (
          SELECT
            md5(coalesce(CAST(doc_id AS VARCHAR), '') || ':0') || ':' ||
              coalesce(CAST(doc_id AS VARCHAR), '') AS ord,
            -- token count pins the ENGINE kernel's Java semantics, not
            -- DuckDB's: Java String.trim strips every char <= 0x20
            -- (DuckDB trim() strips spaces only) and Java \\s includes
            -- \\x0B (RE2 \\s does not) — tab/VT-framed text would
            -- otherwise count one token more here and shift every
            -- downstream prefix sum
            CASE WHEN text IS NULL THEN 0
              ELSE len(regexp_split_to_array(
                regexp_replace(regexp_replace(text,
                  '^[\\x00-\\x20]+', ''), '[\\x00-\\x20]+$$', ''),
                '[\\t\\n\\x0B\\f\\r ]+')) END AS n
          FROM src
        ), c AS (
          SELECT ord, n,
            coalesce(sum(n) OVER (ORDER BY ord
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
          FROM t
        ), b AS (
          SELECT CAST(floor(cb / $tokensPerBin) AS BIGINT) AS seq_id,
            CAST(floor(floor(cb / $tokensPerBin) / $binsPerShard)
              AS BIGINT) AS shardR, n
          FROM c)"""

  /** The manifest aggregation over [[shardReplayCtes]]' `b` — the
    * (shard, n_docs, n_tokens, n_bins) rows both shard writers
    * return. */
  private val shardReplaySelect: String = """
        SELECT shardR AS shard, count(*) AS n_docs,
          CAST(sum(n) AS BIGINT) AS n_tokens,
          CAST(count(DISTINCT seq_id) AS BIGINT) AS n_bins
        FROM b GROUP BY 1"""

  /** DuckDB replay of [[tile5]]: `ch(doc_id, pos, u)` from a CTE named
    * `ds(doc_id, ws)`. */
  private val tile5Sql: String = """ch AS (
          SELECT doc_id, j AS pos,
            array_to_string(ws[(j*5+1):(j*5+5)], ' ') AS u
          FROM ds, unnest(range(0,
            cast(ceil(len(ws)/5.0) AS BIGINT))) AS t(j))"""

  /** DuckDB replay of [[graft.functions.Text.repetition_ngram_features]]:
    * per gram size, explode word n-grams (whole-text single gram when
    * len ≤ n — the kernel's edge), count, and recompute the char-mass
    * fractions with the kernel's total tie rule. Built
    * programmatically — 9 features, one CTE chain each. */
  private val repetitionNgramOracle: String = {
    val topKs = Seq(2, 3, 4)
    val dupKs = (5 to 10).toSeq
    // text-char normalization (the kernel's units contract, see
    // TextKernels.repetitionNgramFeatures): wchars = Σ word codepoints;
    // word chars of a space-joined k-gram = length(g) − (k−1)
    def gram(k: Int) = s"""g$k AS (
          SELECT doc_id, i,
            array_to_string(list_slice(ws, i, i + ${k - 1}), ' ') AS g
          FROM words, unnest(range(1, len(ws) - ${k - 2})) AS t$k(i)
          WHERE len(ws) >= $k
        ), c$k AS (SELECT doc_id, g, count(*) AS c FROM g$k GROUP BY 1, 2)"""
    def top(k: Int) = s"""t$k AS (
          SELECT doc_id, round(mass / wchars, 4) AS frac FROM (
            SELECT c.doc_id,
              (c.c * (length(c.g) - ${k - 1}))::double AS mass, w.wchars,
              row_number() OVER (PARTITION BY c.doc_id
                ORDER BY c.c DESC, length(c.g) DESC, c.g) AS rn
            FROM c$k c JOIN words w ON w.doc_id = c.doc_id) x$k
          WHERE rn = 1 AND wchars > 0)"""
    // duplicate rule = positional coverage: a word position inside ANY
    // occurrence of a gram seen ≥2× counts its chars ONCE
    def dup(k: Int) = s"""d$k AS (
          SELECT pos.doc_id,
            round(sum(length(w.ws[pos.p]))::double / w.wchars, 4) AS frac
          FROM (
            SELECT DISTINCT g.doc_id, u.p
            FROM g$k g JOIN c$k c ON c.doc_id = g.doc_id AND c.g = g.g,
              unnest(range(g.i, g.i + $k)) AS u(p)
            WHERE c.c >= 2) pos
          JOIN words w ON w.doc_id = pos.doc_id
          WHERE w.wchars > 0
          GROUP BY pos.doc_id, w.wchars)"""
    val ctes = (topKs ++ dupKs).map(gram) ++ topKs.map(top) ++ dupKs.map(dup)
    val sel = topKs.map(k =>
      s"coalesce(t$k.frac, 0.0) AS top_${k}gram_char_frac") ++
      dupKs.map(k => s"coalesce(d$k.frac, 0.0) AS dup_${k}gram_char_frac")
    // table A1 thresholds, AND-composed — the keep gate
    val gate = (topKs.zip(Seq(0.20, 0.18, 0.16)).map { case (k, t) =>
      s"coalesce(t$k.frac, 0.0) <= $t" } ++
      dupKs.zip(Seq(0.15, 0.14, 0.13, 0.12, 0.11, 0.10)).map { case (k, t) =>
        s"coalesce(d$k.frac, 0.0) <= $t" }).mkString("(", " AND ", ")")
    val joins = topKs.map(k => s"LEFT JOIN t$k ON t$k.doc_id = doc.doc_id") ++
      dupKs.map(k => s"LEFT JOIN d$k ON d$k.doc_id = doc.doc_id")
    raw"""WITH ws0 AS (
          SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS ws
          FROM documents
        ), words AS (
          SELECT doc_id, ws,
            coalesce(list_sum(list_transform(ws, w -> length(w))), 0) AS wchars
          FROM ws0
        ), ${ctes.mkString(", ")}
        SELECT doc.doc_id, ${sel.mkString(", ")},
          $gate AS keep
        FROM documents doc ${joins.mkString(" ")}"""
  }

  /** DuckDB CTE chain replaying the md5-basis HyperLogLog (p = 8:
    * registers, exact distinct witness, and the published estimate —
    * see [[graft.plans.HllAgg]]) over a CTE `src(g, k)`; ends in
    * `hll(g, n_exact, hll_est)`. Shared by q_agg_distinct_hll and
    * q_stream_hourly_hll so the replay arithmetic has ONE definition,
    * with the α constant interpolated from the Scala side. */
  private val hllReplayCtes: String = {
    val aMM = graft.plans.HllAgg.alphaMM(8)
    raw"""h AS (
          SELECT DISTINCT g, ('0x' || substr(md5(k), 1, 15))::BIGINT AS v
          FROM src
        ), r AS (
          SELECT g, v % 256 AS idx,
            max(CASE WHEN v // 256 = 0 THEN 53
                ELSE 53 - length(bin(v // 256)) END) AS mr
          FROM h GROUP BY 1, 2
        ), grid AS (
          SELECT gg.g, i.idx FROM (SELECT DISTINCT g FROM src) gg
          CROSS JOIN range(0, 256) i(idx)
        ), regs AS (
          SELECT grid.g, coalesce(r.mr, 0) AS m
          FROM grid LEFT JOIN r ON r.g = grid.g AND r.idx = grid.idx
        ), agg AS (
          SELECT g, sum(CAST(pow(2, 53 - m) AS HUGEINT)) AS s,
            sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS v0
          FROM regs GROUP BY 1
        ), ex AS (
          SELECT g, count(DISTINCT k) AS n_exact FROM src GROUP BY 1
        ), hll AS (
          SELECT agg.g, ex.n_exact,
            round(CASE WHEN
                ($aMM / (CAST(s AS DOUBLE) / 9007199254740992.0)) <= 640.0
                  AND v0 > 0
              THEN 256.0 * ln(256.0 / CAST(v0 AS DOUBLE))
              ELSE $aMM / (CAST(s AS DOUBLE) / 9007199254740992.0) END,
              3) AS hll_est
          FROM agg JOIN ex ON ex.g = agg.g)"""
  }

  /** The EXPECTED canonical form of [[plantedCrawlUrl]], computed
    * arithmetically in DuckDB — ground truth for the normalizer, not a
    * SQL re-implementation of it. */
  private val canonicalUrlSql: String =
    "'https://www.example' || cast(doc_id % 97 AS varchar)" +
      " || '.com/page/' || cast(doc_id % 97 AS varchar)" +
      " || '?a=1&b=' || cast((doc_id % 97) % 9 AS varchar)"

  /** DuckDB CTE chain replaying [[graft.operators.Dsir]]'s hashed-bigram
    * models and integer micro-nat weights for en-target vs rest-raw over
    * `src` (any CTE/table with doc_id, lang, text), k = 512 — ends in
    * `w(doc_id, w_mnat)`. Shared by q_sample_dsir_weights, q_sample_dsir
    * and the composed q_pipeline_curation. */
  private def dsirWeightCtesFrom(src: String): String = """words AS (
          SELECT doc_id, lang,
            regexp_split_to_array(trim(lower(text)), '\s+') AS ws
          FROM SRC_RELATION),
        sh AS (
          SELECT doc_id, lang,
            CASE WHEN len(ws) <= 2 THEN array_to_string(ws, ' ')
            ELSE array_to_string(list_slice(ws, i, i + 1), ' ') END AS s
          FROM words, unnest(CASE WHEN len(ws) <= 2 THEN [1]
            ELSE range(1, len(ws)) END) AS t(i)),
        b AS (
          SELECT doc_id, lang,
            ('0x' || substr(md5(s), 1, 4))::INT % 512 AS bucket
          FROM sh),
        tc AS (SELECT bucket, count(*) AS t_cnt FROM b
          WHERE lang = 'en' GROUP BY 1),
        rc AS (SELECT bucket, count(*) AS r_cnt FROM b
          WHERE lang <> 'en' GROUP BY 1),
        tt AS (SELECT sum(t_cnt) AS t_total FROM tc),
        rt AS (SELECT sum(r_cnt) AS r_total FROM rc),
        ratios AS (
          SELECT bucket,
            CAST(round(1e6 * (
              ln((coalesce(t_cnt, 0) + 1) / (t_total + 512.0)) -
              ln((coalesce(r_cnt, 0) + 1) / (r_total + 512.0)))) AS BIGINT)
              AS mnat
          FROM tc FULL OUTER JOIN rc USING (bucket), tt, rt),
        w AS (
          -- DuckDB sums BIGINT into HUGEINT, which pandas widens to
          -- float64 — cast back so the strict compare sees int64
          SELECT b.doc_id, CAST(sum(r.mnat) AS BIGINT) AS w_mnat
          FROM b JOIN ratios r USING (bucket)
          WHERE b.lang <> 'en' GROUP BY 1)""".replace("SRC_RELATION", src)

  private val dsirWeightCtes: String = dsirWeightCtesFrom("documents")

  /** Pre-build every cached staging fixture CONCURRENTLY — called by
    * Bench and Verify before their per-query loops. Staging is fixture
    * PREPARATION, not query cost, and it dominates the cold wall: the
    * staged ANN trees each BUILD+APPEND+COMPACT through a chain of
    * small sequential Spark jobs that leave local[32] nearly idle, so
    * building independent fixtures on concurrent driver threads
    * overlaps them (Spark schedules concurrent jobs fine; the trees
    * are tiny at bench scale). Tasks are grouped so no two CONCURRENT
    * tasks ever touch the same staging tag — ensureStaged has no
    * cross-thread guard, so intra-family dependencies (the flat
    * IVF-PQ trees read ensureIvfIndex's centroids; the media queries
    * share the media table) serialize inside one task. A task failure
    * is logged and swallowed here: the owning query reports it
    * properly (and retries the staging) in its own run. */
  def preStageAll(s: SparkSession, dir: String): Unit = {
    val entryFn = entries.toMap
    def run(name: String): Unit = { entryFn(name).fn(s, dir); () }
    val tasks: Seq[(String, () => Unit)] = Seq(
      ("ivf_flat_family", () => { ensureIvfIndex(s, dir)
        ensureIvfPqIndex(s, dir); ensureIvfPqResIndex(s, dir); () }),
      ("ivfh", () => { ensureIvfHierIndex(s, dir); () }),
      ("pq", () => { ensurePqIndex(s, dir); () }),
      ("ivfpqh", () => { ensureIvfPqHierIndex(s, dir); () }),
      ("ivfpqhr", () => { ensureIvfPqHierResIndex(s, dir); () }),
      ("media_family", () => { run("q_multimodal_frame_dedup")
        run("q_multimodal_image_dedup") }),
      ("embidx", () => run("q_dedup_incr_emb")),
      ("ndidx", () => run("q_dedup_incr_near")),
      ("subidx", () => run("q_corpus_substring_dedup_incr")),
      ("fpidx", () => run("q_dedup_incremental_bloom")),
      ("classifier", () => run("q_quality_classifier")),
      ("pshards", () => run("q_shards_manifest")),
      ("jshards", () => run("q_shards_jsonl")),
      ("bpe", () => run("q_tokens_bpe")),
      ("pca", () => run("q_embed_pca")),
      ("pca_inc", () => run("q_embed_pca_inc")))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(tasks.size, 8))
    try {
      tasks.map { case (tag, body) =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit =
            try body()
            catch { case e: Exception =>
              System.err.println(s"[prestage] $tag failed (the owning " +
                s"query will report it): ${e.getMessage}")
            }
        })
      }.foreach(_.get())
    } finally { pool.shutdown(); () }
  }

  val entries: Seq[(String, Entry)] = Seq(

    // ---- F-class scalar functions -----------------------------------
    // F12/F13/F14: id↔path codecs, slugs, reference-link synthesis.
    "q_fn_codecs" -> Entry(
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          concat(lit("CVE-2024-"), col("doc_id")).as("cve_id"))
        .select(col("doc_id"), col("cve_id"),
          Norm.cve_to_path(col("cve_id")).as("path"),
          Norm.ref_link_for_id(col("cve_id")).as("link"),
          Norm.ecosystem_slug(concat(lit("Ubuntu:22.04:"), col("doc_id")))
            .as("slug")),
      Some("""SELECT doc_id, 'CVE-2024-' || doc_id AS cve_id,
        '2024/cve-2024-' || doc_id AS path,
        'https://nvd.nist.gov/vuln/detail/CVE-2024-' || doc_id AS link,
        'ubuntu-22.04-' || doc_id AS slug
        FROM documents""")),

    // F9: severity normalization CASE chains.
    "q_fn_severity_norm" -> Entry(
      (s, dir) => {
        val e = t(s, dir, "events")
        val raw = when(col("event_type") === "error", "IMPORTANT")
          .when(col("event_type") === "purchase", "MODERATE")
          .when(col("event_type") === "click", "low")
          .otherwise("untriaged")
        e.select(col("event_id"), Norm.normalize_severity(raw).as("severity"))
      },
      Some("""SELECT event_id,
        CASE WHEN event_type = 'error' THEN 'High'
             WHEN event_type = 'purchase' THEN 'Medium'
             WHEN event_type = 'click' THEN 'Low'
             ELSE 'Unknown' END AS severity
        FROM events""")),

    // F17: JSON extraction from the events props column.
    "q_fn_json" -> Entry(
      (s, dir) => t(s, dir, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k")),
      Some("""SELECT event_id, cast(props->>'$.k' as int) AS k
        FROM events""")),

    // F18: portable digests with algo label (vunnel utils/hasher.py
    // labeled_digests; sha-256 is engine-portable, unlike xxh64 seeds).
    "q_fn_digest" -> Entry(
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          concat(lit("sha256:"), sha2(col("text"), 256)).as("digest")),
      Some("""SELECT doc_id, 'sha256:' || sha256(text) AS digest
        FROM documents""")),

    // F15: array union/distinct ops (reference-url merge shape).
    "q_fn_array_ops" -> Entry(
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          size(array_union(array_distinct(split(trim(col("text")), "\\s+")),
            array(lit("spark"), lit("flink"), lit("trino"))))
            .as("n_merged_refs")),
      Some("""SELECT doc_id,
        len(list_distinct(list_concat(
          list_distinct(regexp_split_to_array(trim(text), '\s+')),
          ['spark','flink','trino']))) AS n_merged_refs
        FROM documents""")),

    // F10: fuzzy multi-format date normalization round-trip.
    "q_fn_fuzzy_date" -> Entry(
      (s, dir) => {
        val e = Q.spread(t(s, dir, "events"))
        val raw = when(col("user_id") % 3 === 0,
          date_format(col("ts"), "yyyy-MM-dd"))
          .when(col("user_id") % 3 === 1,
            date_format(col("ts"), "yyyy/MM/dd"))
          .otherwise(date_format(col("ts"), "MM/dd/yyyy"))
        e.select(col("event_id"),
          date_format(Norm.fuzzy_to_date(raw), "yyyy-MM-dd").as("day"))
      },
      Some("""SELECT event_id, strftime(cast(ts as date), '%Y-%m-%d') AS day
        FROM events""")),

    // ---- streaming / incremental ------------------------------------
    // I1: watermark-driven incremental window (last-3-days slice).
    "q_inc_watermark" -> Entry(
      (s, dir) => {
        val e = t(s, dir, "events")
        e.join(e.agg(max(col("ts")).as("max_ts")))
          .filter(col("ts") > col("max_ts") - expr("INTERVAL 3 DAYS"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), moneySum(col("value")).as("total"))
      },
      Some(s"""SELECT event_type, count(*) AS n,
        ${sqlMoneySum("value")} AS total
        FROM events
        WHERE ts > (SELECT max(ts) - INTERVAL 3 DAY FROM events)
        GROUP BY event_type""")),

    // Event-time tumbling window aggregation (Structured Streaming's
    // windowed-agg semantics, run on the batch table; window start
    // emitted as epoch seconds — ns-vs-µs-safe).
    "q_stream_hourly_window" -> Entry(
      (s, dir) => t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), moneySum(col("value")).as("total"))
        .select(unix_timestamp(col("window.start")).as("hour_start"),
          col("event_type"), col("n"), col("total")),
      Some(s"""SELECT cast(floor(epoch(time_bucket(INTERVAL 1 HOUR,
          cast(ts as timestamp)))) as bigint) AS hour_start,
        event_type, count(*) AS n, ${sqlMoneySum("value")} AS total
        FROM events GROUP BY 1, 2""")),

    // Sessionization-lite: per-user event ordering with lag gaps —
    // stateful-streaming shape expressed with a window function.
    "q_stream_session_gaps" -> Entry(
      (s, dir) => {
        val e = t(s, dir, "events")
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        e.select(col("user_id"), col("event_id"),
          (unix_timestamp(col("ts")) -
            unix_timestamp(lag(col("ts"), 1).over(w))).as("gap_sec"))
      },
      Some("""SELECT user_id, event_id,
        cast(floor(epoch(cast(ts as timestamp))) as bigint) -
          cast(floor(epoch(cast(lag(ts, 1) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) as timestamp))) as bigint) AS gap_sec
        FROM events""")),

    // ---- text analysis ----------------------------------------------
    "q_text_tokens" -> Entry(
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"), Text.token_count(col("text")).as("n_tokens"),
          length(col("text")).as("n_chars_actual")),
      Some("""SELECT doc_id,
        len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
        length(text) AS n_chars_actual
        FROM documents""")),

    // Curation pipeline with DATA SELECTION: length gate → exact dedup
    // (min-id per normalized fingerprint) → DSIR Gumbel top-50 over the
    // survivors. The whole chain is md5/integer arithmetic, so the
    // SELECTED SUBSET of a three-stage pipeline is strict-hash checked
    // end-to-end in DuckDB — the composition guarantee q_pipeline_e2e
    // gives for packing, extended to importance resampling.
    "q_pipeline_curation" -> Entry(
      (s, dir) => {
        import graft.operators.{Dedup, Dsir}
        val docs = t(s, dir, "documents")
        val filt = docs.filter(Text.token_count(col("text")) >= 20)
        val keepIds = Dedup.exact(filt, "text", "doc_id")
          .select(col("keep_id").as("doc_id"))
        // the gate+dedup+semi-join survivors are consumed by TWO
        // eager jobs (the tagged model fit collects, then the scoring
        // pass runs) — a cross-job fork, so the curated corpus
        // persists like every bloom-probe/winnow intermediate
        // (GraftCaches lifecycle); a production curation pipeline
        // materializes its post-dedup corpus before DSIR anyway
        val kept = graft.operators.GraftCaches.register(
          filt.join(keepIds, Seq("doc_id"), "left_semi")
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        // split-frame select: the tagged fit evaluates the shared
        // subtree once instead of once per side (identical counts)
        Dsir.select(kept, "doc_id", "text", col("lang") === "en",
          topN = 50, n = 2, k = 512, seed = 11L, temperature = 1.0)
      },
      // gate replay note: DuckDB trim() strips spaces only while the
      // token_count kernel trims all chars ≤ 0x20 — the repo-wide \s+
      // oracle convention (q_pipeline_e2e, q_text_tokens); divergent
      // only for text with leading/trailing exotic whitespace, which
      // the fixtures never contain
      Some("""WITH filt AS (
          SELECT doc_id, lang, text FROM documents
          WHERE len(regexp_split_to_array(trim(text), '\s+')) >= 20),
        keep AS (
          SELECT min(doc_id) AS doc_id FROM filt
          GROUP BY sha256(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))),
        kept AS (SELECT f.* FROM filt f JOIN keep USING (doc_id)),
        """ + dsirWeightCtesFrom("kept") + """,
        sel AS (
          SELECT doc_id, w_mnat,
            round(w_mnat / 1e6
              - ln(-ln((('0x' || substr(md5(coalesce(doc_id::VARCHAR, '') || ':11'), 1, 4))::INT
                        + 0.5) / 65536.0)), 6) AS sel_key
          FROM w)
        SELECT doc_id, w_mnat FROM sel
        ORDER BY sel_key DESC, doc_id LIMIT 50""")),

    // End-to-end training-data flow: quality gate → exact dedup → pack.
    // Every stage is individually oracle-checked elsewhere; this pins
    // the COMPOSITION (filters survive into the dedup keyspace, the
    // pack runs over dedup survivors only).
    "q_pipeline_e2e" -> Entry(
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .select(col("doc_id"), col("text"),
            Text.token_count(col("text")).as("n"))
        val quality = docs.filter(col("n") >= 5)
        val keep = Dedup.exact(quality, "text", "doc_id")
          .select(col("keep_id").as("doc_id"))
        val survivors = quality.join(keep, "doc_id").select("doc_id", "n")
        graft.operators.Pack.sequenceStats(
          graft.operators.Pack.sequencePack(survivors, "doc_id", "n", 4096),
          "n").select(col("seq_id"), col("n_docs"), col("sum_tokens"))
      },
      Some("""WITH q AS (
          SELECT doc_id, text,
            len(regexp_split_to_array(trim(text), '\s+')) AS n
          FROM documents
          WHERE len(regexp_split_to_array(trim(text), '\s+')) >= 5
        ), k AS (
          SELECT min(doc_id) AS doc_id FROM q
          GROUP BY sha256(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))
        ), s AS (SELECT q.doc_id, q.n FROM q JOIN k USING (doc_id)),
        c AS (SELECT doc_id, n,
          coalesce(sum(n) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
          FROM s)
        SELECT CAST(floor(cb / 4096) AS BIGINT) AS seq_id,
          count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS sum_tokens
        FROM c GROUP BY 1""")),

    // Benchmark decontamination: training docs sharing 3-gram shingles
    // with the (broadcast) eval slice — exact overlap, no sketches.
    "q_decontaminate" -> Entry(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val bench = docs.filter(pmod(col("doc_id"), lit(97)) === 0)
        graft.operators.Contamination.hits(
          docs.filter(pmod(col("doc_id"), lit(97)) =!= 0),
          "doc_id", "text", bench, "text")
      },
      Some("""WITH words AS (
          SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS ws
          FROM documents
        ), sh AS (
          SELECT DISTINCT doc_id,
            CASE WHEN len(ws) <= 3 THEN array_to_string(ws, ' ')
            ELSE array_to_string(list_slice(ws, i, i+2), ' ') END AS s
          FROM words, unnest(CASE WHEN len(ws) <= 3 THEN [1]
            ELSE range(1, len(ws)-1) END) AS t(i)
        ), bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0)
        SELECT a.doc_id, count(*) AS n_hits
        FROM sh a JOIN bench b ON a.s = b.s
        WHERE a.doc_id % 97 <> 0 GROUP BY 1""")),

    // The same decontamination through the bloom-guarded path: the
    // large-eval-set plan (distributed sketch build → map-side probe →
    // shuffled exact verify join) must produce IDENTICAL rows — the
    // filter sizes the shuffle, never the answer — so it faces the
    // same oracle SQL as q_decontaminate.
    "q_decontaminate_bloom" -> Entry(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val bench = docs.filter(pmod(col("doc_id"), lit(97)) === 0)
        // cache=false: the bench-set shingle explode (~1% of docs) is
        // cheaper to recompute once than to pin across the session —
        // the r8 driver log's repeated `Block rdd_* already exists`
        // warnings were this entry's default persist re-firing per run.
        graft.operators.Contamination.hitsBloom(
          docs.filter(pmod(col("doc_id"), lit(97)) =!= 0),
          "doc_id", "text", bench, "text", cache = false)
      },
      Some("""WITH words AS (
          SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS ws
          FROM documents
        ), sh AS (
          SELECT DISTINCT doc_id,
            CASE WHEN len(ws) <= 3 THEN array_to_string(ws, ' ')
            ELSE array_to_string(list_slice(ws, i, i+2), ' ') END AS s
          FROM words, unnest(CASE WHEN len(ws) <= 3 THEN [1]
            ELSE range(1, len(ws)-1) END) AS t(i)
        ), bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0)
        SELECT a.doc_id, count(*) AS n_hits
        FROM sh a JOIN bench b ON a.s = b.s
        WHERE a.doc_id % 97 <> 0 GROUP BY 1""")),

    // Per-document contamination FRACTION: n_hits / n_distinct_shingles
    // for EVERY training doc (clean docs = 0.0) — the drop-threshold
    // gate curation applies on top of the raw hit list. Fraction of
    // two exact integers rounded to 3 dp replays exactly.
    "q_decontaminate_frac" -> Entry(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val bench = docs.filter(pmod(col("doc_id"), lit(97)) === 0)
        graft.operators.Contamination.contaminationFraction(
          docs.filter(pmod(col("doc_id"), lit(97)) =!= 0),
          "doc_id", "text", bench, "text")
      },
      Some("""WITH words AS (
          SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+')
            AS ws
          FROM documents
        ), sh AS (
          SELECT DISTINCT doc_id,
            CASE WHEN len(ws) <= 3 THEN array_to_string(ws, ' ')
            ELSE array_to_string(list_slice(ws, i, i+2), ' ') END AS s
          FROM words, unnest(CASE WHEN len(ws) <= 3 THEN [1]
            ELSE range(1, len(ws)-1) END) AS t(i)
        ), bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
        totals AS (
          SELECT doc_id, count(*) AS n_shingles FROM sh
          WHERE doc_id % 97 <> 0 GROUP BY 1
        ), h AS (
          SELECT a.doc_id, count(*) AS n_hits
          FROM sh a JOIN bench b ON a.s = b.s
          WHERE a.doc_id % 97 <> 0 GROUP BY 1)
        SELECT t.doc_id, t.n_shingles,
          coalesce(h.n_hits, 0) AS n_hits,
          round(coalesce(h.n_hits, 0) /
            greatest(t.n_shingles, 1), 3) AS frac
        FROM totals t LEFT JOIN h USING (doc_id)""")),

    // Span-level decontamination (Contamination.scrubSpans): remove the
    // contaminated 3-gram windows ±2 buffer words instead of the whole
    // doc — merged buffered spans, normalized-stream rebuild. Oracle
    // replays the full chain: shingle positions, islands at tolerance
    // n+2b, span clamp, indexed-position anti-join rebuild.
    "q_decontaminate_scrub" -> Entry(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val bench = docs.filter(pmod(col("doc_id"), lit(97)) === 0)
        graft.operators.Contamination.scrubSpans(
          docs.filter(pmod(col("doc_id"), lit(97)) =!= 0),
          "doc_id", "text", bench, "text")
      },
      Some("""WITH words AS (
          SELECT doc_id, string_split(
            regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS ws
          FROM documents),
        bsh AS (
          SELECT DISTINCT
            CASE WHEN len(ws) <= 3 THEN array_to_string(ws, ' ')
              ELSE array_to_string(ws[i+1 : i+3], ' ') END AS g
          FROM words, UNNEST(CASE WHEN len(ws) <= 3 THEN [0]
            ELSE range(0, greatest(len(ws)-2, 0)) END) AS t(i)
          WHERE doc_id % 97 = 0),
        grams AS (
          SELECT doc_id, u.p AS p,
            CASE WHEN len(ws) <= 3 THEN array_to_string(ws, ' ')
              ELSE array_to_string(ws[u.p+1 : u.p+3], ' ') END AS g
          FROM words, UNNEST(CASE WHEN len(ws) <= 3 THEN [0]
            ELSE range(0, greatest(len(ws)-2, 0)) END) AS u(p)
          WHERE doc_id % 97 <> 0),
        hit AS (
          SELECT doc_id, p FROM grams WHERE g IN (SELECT g FROM bsh)),
        heads AS (
          SELECT doc_id, p,
            CASE WHEN coalesce(p - lag(p) OVER
              (PARTITION BY doc_id ORDER BY p), 8) > 7 THEN 1 ELSE 0 END
              AS h
          FROM hit),
        isl AS (
          SELECT doc_id, p,
            sum(h) OVER (PARTITION BY doc_id ORDER BY p) AS i
          FROM heads),
        spans AS (
          SELECT doc_id, greatest(min(p) - 2, 0) AS s, max(p) + 4 AS e
          FROM isl GROUP BY doc_id, i),
        pos AS (
          SELECT w.doc_id, u.j AS j, w.ws[u.j+1] AS word
          FROM words w, UNNEST(range(0, len(w.ws))) AS u(j)
          WHERE w.doc_id % 97 <> 0),
        keptpos AS (
          SELECT p.doc_id, p.j, p.word FROM pos p
          WHERE NOT EXISTS (SELECT 1 FROM spans s
            WHERE s.doc_id = p.doc_id AND p.j BETWEEN s.s AND s.e)),
        agg AS (
          SELECT doc_id, string_agg(word, ' ' ORDER BY j) AS clean_text,
            count(*) AS n_kept
          FROM keptpos GROUP BY doc_id),
        nsp AS (
          SELECT doc_id, count(*) AS n_spans FROM spans GROUP BY doc_id)
        SELECT w.doc_id,
          coalesce(a.clean_text, '') AS clean_text,
          cast(len(w.ws) - coalesce(a.n_kept, 0) as bigint)
            AS n_words_removed,
          cast(coalesce(nsp.n_spans, 0) as bigint) AS n_spans
        FROM words w
        LEFT JOIN agg a USING (doc_id)
        LEFT JOIN nsp USING (doc_id)
        WHERE w.doc_id % 97 <> 0""")),

    // Cross-corpus n-gram containment matrix: how much of source b's
    // distinct-3-gram mass already appears in source a — the dataset-mix
    // / source-leakage audit. One (group, shingle) distinct-shuffle, a
    // self-join whose fan-out is bounded by |groups|, sizes broadcast.
    "q_corpus_containment" -> Entry(
      // hashed = false ONLY here: DuckDB replays literal string shingles.
      // The library default is the hashed (8-byte-key) path; CorpusSpec
      // pins the two row-identical. cache = false so a bench/verify
      // session doesn't pin the string-shingle set for the remaining
      // queries (callers of this entry run it once).
      // spreadBy(doc_id) (r16): the earlier round-robin respread was
      // net-negative, but the keyed form skips sortBeforeRepartition
      // and the shingle-explode producer stage — single-task, 0.35 s
      // of the wall, ReuseExchange-shared by all three consumers —
      // parallelizes
      (s, dir) => graft.operators.Contamination
        .crossContainment(Q.spreadBy(t(s, dir, "documents"),
          col("doc_id")), "source", "text",
          hashed = false, cache = false),
      Some("""WITH words AS (
          SELECT doc_id, source, regexp_split_to_array(trim(lower(text)), '\s+') AS ws
          FROM documents
        ), sh AS (
          SELECT DISTINCT source,
            CASE WHEN len(ws) <= 3 THEN array_to_string(ws, ' ')
            ELSE array_to_string(list_slice(ws, i, i+2), ' ') END AS s
          FROM words, unnest(CASE WHEN len(ws) <= 3 THEN [1]
            ELSE range(1, len(ws)-1) END) AS t(i)
        ), sizes AS (SELECT source, count(*) AS n_sh FROM sh GROUP BY 1),
        inter AS (
          SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_common
          FROM sh a JOIN sh b ON a.s = b.s AND a.source <> b.source
          GROUP BY 1, 2)
        SELECT src_a, src_b, n_common,
          round(n_common / sizes.n_sh, 3) AS containment
        FROM inter JOIN sizes ON sizes.source = src_b""")),

    // The PRODUCTION containment path: hashed = true (8-byte shingle
    // keys through every shuffle — the 100 TB design). cache = false
    // HERE, against the library default: the bench invokes the entry
    // three times in one session, so a persisted distinct would hand
    // runs 2-3 an InMemoryRelation in place of the only expensive
    // shuffle (the reported warm number would measure cache reads, not
    // the shipped plan) and pin the entry for the session's remaining
    // queries. r9: md5Keys = true converts this from rows-only to the
    // STRICT oracle — the 60-bit md5-prefix keys replay exactly in
    // DuckDB, so the hashed join/distinct/count pipeline is compared
    // end-to-end on the same keys (a collision would be the same
    // collision on both engines). The xxh64 basis stays the library
    // default for hash-cost-sensitive callers; CorpusSpec pins the two
    // bases row-identical.
    "q_corpus_containment_hashed" -> Entry(
      (s, dir) => graft.operators.Contamination
        .crossContainment(Q.spreadBy(t(s, dir, "documents"),
          col("doc_id")), "source", "text",
          cache = false, md5Keys = true),
      Some("""WITH words AS (
          SELECT doc_id, source, regexp_split_to_array(trim(lower(text)), '\s+') AS ws
          FROM documents
        ), sh AS (
          SELECT DISTINCT source,
            ('0x' || substr(md5(CASE WHEN len(ws) <= 3
              THEN array_to_string(ws, ' ')
              ELSE array_to_string(list_slice(ws, i, i+2), ' ') END),
              1, 15))::BIGINT AS s
          FROM words, unnest(CASE WHEN len(ws) <= 3 THEN [1]
            ELSE range(1, len(ws)-1) END) AS t(i)
        ), sizes AS (SELECT source, count(*) AS n_sh FROM sh GROUP BY 1),
        inter AS (
          SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_common
          FROM sh a JOIN sh b ON a.s = b.s AND a.source <> b.source
          GROUP BY 1, 2)
        SELECT src_a, src_b, n_common,
          round(n_common / sizes.n_sh, 3) AS containment
        FROM inter JOIN sizes ON sizes.source = src_b""")),

    // Token-window chunking: long documents → ≤64-word training chunks
    // with a 16-word overlap carried between consecutive chunks. Pure
    // row-local array arithmetic (posexplode of slices) — a scan, no
    // shuffle (operators/Corpus.chunk).
    "q_corpus_chunk" -> Entry(
      (s, dir) => graft.operators.Corpus
        .chunk(t(s, dir, "documents"), "doc_id", "text",
          maxTokens = 64, overlap = 16),
      Some("""WITH words AS (
          SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS ws
          FROM documents
        )
        SELECT doc_id, s // 48 AS chunk_id,
          array_to_string(list_slice(ws, s + 1, s + 64), ' ') AS chunk_text,
          len(list_slice(ws, s + 1, s + 64)) AS n_tokens
        FROM words, unnest(range(0, len(ws), 48)) AS t(s)""")),

    // Mixture rebalancing: deterministically downsample each language to
    // hit a target mix (en .5 / de .3 / es .15 / zh .05 of 300 docs;
    // fr carries no weight and drops). Group counts are one broadcast
    // aggregate; the keep decision is a map-side md5-prefix filter —
    // rebalancing is a scan (operators/Corpus.rebalanceMixture).
    "q_sample_mixture" -> Entry(
      (s, dir) => graft.operators.Corpus
        .rebalanceMixture(t(s, dir, "documents"), "lang", col("text"),
          Map("en" -> 0.5, "de" -> 0.3, "es" -> 0.15, "zh" -> 0.05),
          targetTotal = 300)
        .select(col("doc_id"), col("lang")),
      Some("""WITH n AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
        rated AS (
          SELECT d.doc_id, d.lang, d.text,
            least(1.0, 300 * CASE d.lang WHEN 'en' THEN 0.5
              WHEN 'de' THEN 0.3 WHEN 'es' THEN 0.15 WHEN 'zh' THEN 0.05
              END / n.n) AS rate
          FROM documents d JOIN n ON n.lang = d.lang
          WHERE d.lang IN ('en', 'de', 'es', 'zh'))
        SELECT doc_id, lang FROM rated
        WHERE rate >= 1.0 OR substr(md5(text), 1, 4) <
          printf('%04x', cast(floor(rate * 65536) AS int))""")),

    // Temperature (α = 0.5) mixture rebalancing: keep rates derive from
    // group counts ∝ n^α — the multilingual up-weight-the-tail sampling
    // rule. The α-weights are computed from one tiny count aggregate;
    // the oracle replays pow/least/md5-threshold arithmetic exactly
    // (same float-rate convention as q_sample_mixture).
    "q_sample_mixture_temp" -> Entry(
      (s, dir) => graft.operators.Corpus
        .rebalanceTemperature(t(s, dir, "documents"), "lang", col("text"),
          alpha = 0.5, targetTotal = 300)
        .select(col("doc_id"), col("lang")),
      Some("""WITH n AS (SELECT lang, count(*) AS n FROM documents
          WHERE lang IS NOT NULL GROUP BY 1),
        z AS (SELECT sum(pow(n, 0.5)) AS z FROM n),
        rated AS (
          -- α-weight rounded to 12 dp before the rate arithmetic,
          -- mirroring the operator: z sums in each engine's own order,
          -- so the weight is snapped to a shared decimal grid
          SELECT d.doc_id, d.lang, d.text,
            least(1.0, 300 * round(pow(n.n, 0.5) / z.z, 12) / n.n) AS rate
          FROM documents d JOIN n ON n.lang = d.lang, z)
        SELECT doc_id, lang FROM rated
        WHERE rate >= 1.0 OR substr(md5(text), 1, 4) <
          printf('%04x', cast(floor(rate * 65536) AS int))""")),

    // Per-group TOKEN-budget cap: the mixture primitive for targets
    // specified in tokens ("N tokens per language"), not row rates —
    // md5(id:seed)-ordered prefix per group until the cumulative token
    // count crosses the budget. Deterministic, layout-independent;
    // the oracle replays the identical hash order and running sum.
    "q_sample_token_budget" -> Entry(
      (s, dir) => graft.operators.Corpus
        .takeTokenBudget(t(s, dir, "documents"), "lang", "text",
          "doc_id", budget = 4000L)
        .select(col("lang"), col("doc_id")),
      Some("""WITH t AS (
          SELECT lang, doc_id,
            len(regexp_split_to_array(trim(text), '\s+')) AS n,
            md5(coalesce(doc_id::VARCHAR, '') || ':0') AS ord
          FROM documents),
        c AS (
          SELECT lang, doc_id,
            sum(n) OVER (PARTITION BY lang ORDER BY ord, doc_id) AS cum
          FROM t)
        SELECT lang, doc_id FROM c WHERE cum <= 4000""")),

    // DSIR importance weights (Xie et al. 2023): per-doc hashed-bigram
    // log p_target/q_raw mass against en-vs-rest bucket models. The
    // contract is INTEGER micro-nats — per-bucket ratios round to
    // BIGINT first, so the per-doc sums below are order-exact and the
    // strict hash cannot drift (operators/Dsir scaladoc). The corpus
    // never shuffles: both model fits collapse to ≤k bucket rows
    // map-side and the ratio table broadcasts.
    "q_sample_dsir_weights" -> Entry(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        // two-frame fit kept deliberately: the tagged single-scan form
        // was A/B-measured here and LOST (0.40 -> 0.46-0.49 s) — the
        // base scan is cheap and the union-of-aggregates fit runs its
        // two legs concurrently, while the fused scan serializes them
        val target = docs.filter(col("lang") === "en")
        val raw = docs.filter(col("lang") =!= "en")
        val ratios = graft.operators.Dsir
          .logRatios(target, raw, "text", n = 2, k = 512)
        graft.operators.Dsir
          .importanceWeights(raw, "doc_id", "text", ratios, n = 2, k = 512)
      },
      Some("WITH " + dsirWeightCtes + """
        SELECT doc_id, w_mnat FROM w""")),

    // DSIR Gumbel top-k selection: the training subset drawn without
    // replacement ∝ exp(weight) — seeded md5 uniforms (rerun/engine
    // stable where rand() is neither), rank key rounded to 6 dp with a
    // doc-id tiebreak so the CUT replays cross-engine (the
    // distinctiveTerms precedent), TakeOrdered not a global sort.
    "q_sample_dsir" -> Entry(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        // two-frame select kept deliberately: the split-frame form was
        // A/B-measured here and LOST (0.47 -> 0.50-0.59 s) — see
        // q_sample_dsir_weights
        graft.operators.Dsir.select(
          docs.filter(col("lang") =!= "en"), "doc_id", "text",
          docs.filter(col("lang") === "en"),
          topN = 100, n = 2, k = 512, seed = 7L)
      },
      Some("WITH " + dsirWeightCtes + """,
        sel AS (
          SELECT doc_id, w_mnat,
            round(w_mnat / 1e6
              - ln(-ln((('0x' || substr(md5(coalesce(doc_id::VARCHAR, '') || ':7'), 1, 4))::INT
                        + 0.5) / 65536.0)), 6) AS sel_key
          FROM w)
        SELECT doc_id, w_mnat FROM sel
        ORDER BY sel_key DESC, doc_id LIMIT 100""")),

    // Corpus-unigram log-prob quality score (LM-quality proxy): per-doc
    // mean ln P(word) under the corpus' own unigram distribution. The
    // words⋈vocab join is Zipf-skewed, so the hot head of the vocab
    // broadcasts (map-side) and only the long tail shuffles — exact at
    // any split point (operators/Corpus.unigramLogProb).
    "q_quality_unigram_lp" -> Entry(
      (s, dir) => graft.operators.Corpus
        .unigramLogProb(t(s, dir, "documents"), "doc_id", "text",
          headVocab = 16),
      Some("""WITH w AS (
          SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
          FROM documents
        ), v AS (SELECT w, count(*) AS c FROM w GROUP BY 1),
        tot AS (SELECT sum(c) AS tot FROM v)
        SELECT doc_id, round(avg(ln(c / tot)), 3) AS avg_lp
        FROM w JOIN v USING (w), tot GROUP BY doc_id""")),

    // CCNet-style perplexity buckets: per language, rank documents by
    // the corpus-unigram LM score (q_quality_unigram_lp's rounded
    // avg_lp; best = highest log-prob = lowest perplexity) and cut
    // exact terciles — head/middle/tail is THE published CCNet
    // curation signal. Ranks come from ONE range exchange over the
    // total (lang, -score, id) key via the shared two-phase prefix sum
    // (no per-language single-task window), group offsets from a
    // bounded dimension-sized aggregate; the tercile is integer
    // arithmetic on (rank, n) so the cut replays exactly in DuckDB.
    "q_quality_ppl_buckets" -> Entry(
      (s, dir) => graft.operators.Corpus.perplexityBuckets(
        t(s, dir, "documents"), "doc_id", "text", "lang",
        headVocab = 16),
      Some("""WITH w AS (
          SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
          FROM documents
        ), v AS (SELECT w, count(*) AS c FROM w GROUP BY 1),
        tot AS (SELECT sum(c) AS tot FROM v),
        lp AS (
          SELECT doc_id, round(avg(ln(c / tot)), 3) AS avg_lp
          FROM w JOIN v USING (w), tot GROUP BY doc_id),
        r AS (
          SELECT d.doc_id, d.lang, lp.avg_lp,
            row_number() OVER (PARTITION BY d.lang
              ORDER BY lp.avg_lp DESC, d.doc_id) AS r,
            count(*) OVER (PARTITION BY d.lang) AS n
          FROM documents d JOIN lp USING (doc_id))
        SELECT doc_id, lang, avg_lp,
          ((r - 1) * 3) // n AS bucket,
          (['head','middle','tail'])[(((r - 1) * 3) // n) + 1] AS plabel
        FROM r""")),

    // Deterministic train/val/test split: content-keyed md5 ranges —
    // map-only, rerun-stable, partition-layout-independent (randomSplit
    // is none of these), and exact duplicates land on the same side so
    // they cannot leak train→eval. 80/10/10 by text; per-(split, lang)
    // counts, threshold arithmetic replayed exactly in the oracle.
    "q_sample_split" -> Entry(
      (s, dir) => t(s, dir, "documents")
        .withColumn("split", graft.operators.Corpus.splitByHash(
          col("text"), Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)))
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n")),
      Some("""SELECT CASE
          WHEN substr(md5(coalesce(text, '')), 1, 4) < 'cccc' THEN 'train'
          WHEN substr(md5(coalesce(text, '')), 1, 4) < 'e666' THEN 'val'
          ELSE 'test' END AS split, lang, count(*) AS n
        FROM documents GROUP BY 1, 2""")),

    // c-TF-IDF distinctive terms: top-10 keywords per source — frequent
    // in the group, rare across groups. One (group, word) shuffle, a
    // vocabulary-sized broadcast join back, WindowGroupLimit cut. The
    // rank key is the score rounded to 6 dp (ties → word) so the cut
    // replays deterministically in DuckDB despite ln's last-ulp
    // differences across engines.
    "q_text_distinctive" -> Entry(
      (s, dir) => graft.operators.Corpus
        .distinctiveTerms(t(s, dir, "documents"), "source", "text", 10),
      Some("""WITH words AS (
          SELECT source,
            unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
          FROM documents
        ), tf AS (
          SELECT source, w, count(*) AS tf FROM words GROUP BY 1, 2
        ), gdf AS (SELECT w, count(*) AS gdf FROM tf GROUP BY 1),
        ng AS (SELECT count(DISTINCT source) AS n FROM documents),
        scored AS (
          SELECT source, w, tf, gdf,
            round(tf * ln((1.0 + n) / (1.0 + gdf)), 6) AS score6
          FROM tf JOIN gdf USING (w), ng
        ), ranked AS (
          SELECT *, row_number() OVER (PARTITION BY source
            ORDER BY score6 DESC, w ASC) AS rnk
          FROM scored)
        SELECT source, w AS term, tf, gdf, round(score6, 3) AS score
        FROM ranked WHERE rnk <= 10""")),

    // Bigram-LM quality score: mean log P(w₂|w₁) under the corpus's own
    // bigram model — word salad has plausible unigrams but improbable
    // bigrams. Difference-of-sums form: the prefix and bigram streams
    // score independently, each with its own Zipf-head broadcast split
    // (headVocab = 16 exercises both the broadcast and shuffled legs;
    // exact at any setting — CorpusSpec pins 0 ≡ 16).
    "q_quality_bigram_lp" -> Entry(
      (s, dir) => graft.operators.Corpus
        .bigramLogProb(t(s, dir, "documents"), "doc_id", "text",
          headVocab = 16),
      Some("""WITH words AS (
          SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+')
            AS ws
          FROM documents
        ), base AS (SELECT doc_id, ws FROM words WHERE len(ws) >= 2),
        pref AS (
          SELECT doc_id, ws[i] AS w
          FROM base, unnest(range(1, len(ws))) AS t(i)
        ), bg AS (
          SELECT doc_id, ws[i] || ' ' || ws[i+1] AS b
          FROM base, unnest(range(1, len(ws))) AS t(i)
        ), c1 AS (SELECT w, count(*) AS c FROM pref GROUP BY 1),
        c2 AS (SELECT b, count(*) AS c FROM bg GROUP BY 1),
        s1 AS (
          SELECT doc_id, sum(ln(c)) AS sl1, count(*) AS n
          FROM pref JOIN c1 USING (w) GROUP BY 1
        ), s2 AS (
          SELECT doc_id, sum(ln(c)) AS sl2
          FROM bg JOIN c2 USING (b) GROUP BY 1)
        SELECT doc_id, round((sl2 - sl1) / n, 3) AS avg_lp2
        FROM s1 JOIN s2 USING (doc_id)""")),

    // Per-label embedding centroids (typed vector-sum Aggregator —
    // map-side partials of one (sum[64], n) buffer per label) + cosine
    // of every vector to its own centroid: the semantic-outlier /
    // mislabel-scoring primitive. Centroids broadcast; zero vector
    // shuffle (operators/Embeddings.scala).
    "q_embed_centroid" -> Entry(
      (s, dir) => graft.operators.Embeddings
        .centroidSims(t(s, dir, "embeddings"), "label", "embedding")
        .select(col("vec_id"), col("label"),
          // + 0.0: the q_embed_pca_cov signed-zero rule — a tiny
          // negative cosine rounds to -0.0 in DuckDB but +0.0 here
          // (first observed at sf0.1: 4 such cells; the sf0.01 gate
          // corpus has none, so this was a latent flap)
          (round(col("centroid_sim"), 3) + lit(0.0)).as("centroid_sim")),
      Some("""WITH d AS (
          SELECT vec_id, label, cast(embedding AS double[]) AS e
          FROM embeddings
        ), flat AS (
          SELECT label, generate_subscripts(e, 1) AS i, unnest(e) AS x
          FROM d
        ), dims AS (SELECT label, i, avg(x) AS c FROM flat GROUP BY 1, 2),
        cent AS (SELECT label, list(c ORDER BY i) AS cl FROM dims GROUP BY 1)
        SELECT vec_id, label,
          round(list_cosine_similarity(e, cl), 3) + 0.0 AS centroid_sim
        FROM d JOIN cent USING (label)""")),

    // C4-style global frequent-line strip, demonstrated at word
    // granularity on the single-line synthetic corpus: tokens occurring
    // more than |docs| times corpus-wide are deleted everywhere, docs
    // reconstructed in original token order. One 8-byte-hash count
    // shuffle + a broadcast frequent set + a map-only rewrite.
    "q_corpus_line_dedup" -> Entry(
      (s, dir) => {
        // dedupLinesAuto: threshold (= |docs|) is a 1-row in-flow
        // broadcast aggregate, not a driver count() prepass, and the
        // exploded lines projection is computed ONCE (persisted across
        // the two counting passes, unpersisted before return) — r7
        // profiled the uncached double explode at 7 s of the query's
        // 7.06 s total
        graft.operators.Corpus
          // (no respread: the multi-pass lines cache + final rewrite
          // pay the exchange per pass — measured 0.99 -> 1.3-1.5 s
          // with a doc_id respread at sf0.1)
          .dedupLinesAuto(t(s, dir, "documents"), "text", delim = " ")
          .select(col("doc_id"), col("text").as("cleaned"))
      },
      Some("""WITH flat AS (
          SELECT doc_id, generate_subscripts(ws, 1) AS i, unnest(ws) AS w
          FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
        ), freq AS (
          SELECT w FROM flat GROUP BY w
          HAVING count(*) > (SELECT count(*) FROM documents))
        SELECT doc_id, coalesce(
          string_agg(w, ' ' ORDER BY i)
            FILTER (w NOT IN (SELECT w FROM freq)), '') AS cleaned
        FROM flat GROUP BY doc_id""")),

    // RefinedWeb/MassiveText keep-FIRST exact dedup at paragraph
    // granularity: a repeated paragraph survives only at its globally
    // first (doc_id, pos) occurrence and strips everywhere else; docs
    // rebuild in paragraph order, fully-deduplicated docs vanish.
    // Distinct from q_corpus_line_dedup's threshold strip (frequent
    // units delete EVERYWHERE): keep-first retains one canonical copy
    // — the paragraph-dedup rule of web curation. The single-line
    // corpus has no organic paragraphs, so both sides tile each doc
    // into 5-word pseudo-paragraphs first (word granularity would be
    // degenerate here — the synthetic vocab is ~31 words, so nearly
    // every doc vanishes). One unit-keyed shuffle + one doc-keyed
    // rebuild; the winner set never collects or broadcasts (it is
    // corpus-sized).
    "q_corpus_paragraph_dedup" -> Entry(
      // spreadBy(doc_id): the tile5+posexplode+partial-winner map
      // stage otherwise runs as ONE task on the one-row-group test
      // scan (measured 0.99 s of a 1.56 s wall); keyed respread, so
      // no sortBeforeRepartition pass
      (s, dir) => graft.operators.Corpus
        .dedupKeepFirst(
          Q.spreadBy(t(s, dir, "documents"), col("doc_id"))
            .select(col("doc_id"), tile5(col("text")).as("text")),
          "text", "doc_id", delim = "\n")
        .select(col("doc_id"), col("text").as("cleaned")),
      Some(s"""WITH ds AS (
          SELECT doc_id, string_split(replace(text, chr(10), ' '), ' ') AS ws
          FROM documents
        ), $tile5Sql, r AS (
          SELECT doc_id, pos, u,
            row_number() OVER (PARTITION BY u ORDER BY doc_id, pos) AS rn
          FROM ch)
        SELECT doc_id, string_agg(u, chr(10) ORDER BY pos) AS cleaned
        FROM r WHERE rn = 1 GROUP BY doc_id""")),

    // Incremental paragraph dedup — the recurring-crawl shape of
    // q_corpus_paragraph_dedup: the historical corpus (doc_id%5<4) is
    // present ONLY as the md5 fingerprints of its distinct paragraphs
    // (Corpus.unitIndex — the persisted store a 100 TB pipeline keeps
    // between crawls); the new batch (doc_id%5=4) strips index hits
    // via a fingerprint-keyed anti-join, keeps first occurrences
    // within itself, and rebuilds. Corpus text is never re-read; each
    // increment pays |batch units| + |index|.
    "q_corpus_paragraph_dedup_incr" -> Entry(
      (s, dir) => {
        // spreadBy(doc_id): parallel tiling for both the index and the
        // batch side (see q_corpus_paragraph_dedup)
        val docs = Q.spreadBy(t(s, dir, "documents"), col("doc_id"))
          .select(col("doc_id"), tile5(col("text")).as("text"))
        val idx = graft.operators.Corpus.unitIndex(
          docs.filter(col("doc_id") % 5 < 4), "text", "doc_id")
        graft.operators.Corpus
          .dedupKeepFirstAgainstIndex(
            docs.filter(col("doc_id") % 5 === 4), idx, "text", "doc_id")
          .select(col("doc_id"), col("text").as("cleaned"))
      },
      // the oracle anti-joins on the unit STRING; the operator joins on
      // md5(unit) — identical results (md5 is injective up to
      // vanishing 128-bit collisions), and the string form is what
      // DuckDB can replay
      Some(s"""WITH ds AS (
          SELECT doc_id, string_split(replace(text, chr(10), ' '), ' ') AS ws
          FROM documents
        ), $tile5Sql, cu AS (
          SELECT DISTINCT u FROM ch WHERE doc_id % 5 < 4
        ), novel AS (
          SELECT b.doc_id, b.pos, b.u
          FROM ch b LEFT JOIN cu ON cu.u = b.u
          WHERE b.doc_id % 5 = 4 AND cu.u IS NULL
        ), r AS (
          SELECT doc_id, pos, u,
            row_number() OVER (PARTITION BY u ORDER BY doc_id, pos) AS rn
          FROM novel)
        SELECT doc_id, string_agg(u, chr(10) ORDER BY pos) AS cleaned
        FROM r WHERE rn = 1 GROUP BY doc_id""")),

    // Intra-corpus exact-substring self-dedup (Lee et al. 2021's
    // ExactSubstr at fixed k=8): any ≥8-word run repeated anywhere in
    // the corpus survives only at its globally first (doc_id, pos)
    // site. Input plants a shared 12-word footer on doc_id % 4 = 0
    // (5 overlapping anchors each — exercises the island merge on top
    // of the corpus's natural ~1.3k repeated 8-grams at sf0.001); the
    // oracle replays anchors → rn>1 non-first occurrences → islands →
    // covered-position rebuild arithmetically.
    "q_corpus_substring_dedup" -> Entry(
      // spreadBy(doc_id): parallel anchor shingling (the explode+md5
      // map stage is the dominant single-task cost on the test scan)
      (s, dir) => {
        val docs = Q.spreadBy(t(s, dir, "documents"), col("doc_id"))
          .select(col("doc_id"),
          when(col("doc_id") % 4 === 0,
            concat_ws(" ", col("text"), lit(substrFooter)))
            .otherwise(col("text")).as("text"))
        graft.operators.Corpus.dedupSubstrings(docs, "text", "doc_id",
          k = 8)
      },
      Some(raw"""WITH src AS (
          SELECT doc_id, CASE WHEN doc_id % 4 = 0
            THEN text || ' $substrFooter' ELSE text END AS text
          FROM documents
        ), ws0 AS (
          SELECT doc_id,
            regexp_split_to_array(trim(lower(text)), '\s+') AS ws
          FROM src
        ), anchors AS (
          SELECT doc_id, i - 1 AS p,
            array_to_string(list_slice(ws, i, i + 7), ' ') AS g
          FROM ws0, unnest(range(1, len(ws) - 6)) AS t(i)
          WHERE len(ws) >= 8
        ), hits AS (
          SELECT doc_id, p FROM (
            SELECT doc_id, p,
              row_number() OVER (PARTITION BY g ORDER BY doc_id, p) AS rn
            FROM anchors) x WHERE rn > 1
        ), isl AS (
          SELECT doc_id, p, CASE WHEN
              coalesce(p - lag(p) OVER (PARTITION BY doc_id ORDER BY p),
                9) > 8 THEN 1 ELSE 0 END AS head
          FROM hits
        ), isl2 AS (
          SELECT doc_id, p,
            sum(head) OVER (PARTITION BY doc_id ORDER BY p) AS gid
          FROM isl
        ), spans AS (
          SELECT doc_id, gid, min(p) AS s, max(p) + 7 AS e
          FROM isl2 GROUP BY 1, 2
        ), nsp AS (
          SELECT doc_id, count(*) AS n_spans FROM spans GROUP BY 1
        ), words AS (
          SELECT doc_id, j AS q, ws[j + 1] AS w
          FROM ws0, unnest(range(0, len(ws))) AS t(j)
        ), cov AS (
          SELECT DISTINCT w.doc_id, w.q
          FROM words w JOIN spans sp ON sp.doc_id = w.doc_id
            AND w.q BETWEEN sp.s AND sp.e
        ), kept AS (
          SELECT w.doc_id, w.q, w.w
          FROM words w LEFT JOIN cov
            ON cov.doc_id = w.doc_id AND cov.q = w.q
          WHERE cov.doc_id IS NULL
        ), rebuilt AS (
          SELECT doc_id, string_agg(w, ' ' ORDER BY q) AS clean_text,
            count(*) AS n_kept
          FROM kept GROUP BY 1
        ), tot AS (SELECT doc_id, len(ws) AS n_all FROM ws0)
        SELECT s.doc_id, coalesce(r.clean_text, '') AS clean_text,
          CAST(t2.n_all - coalesce(r.n_kept, 0) AS BIGINT)
            AS n_words_removed,
          CAST(coalesce(nsp.n_spans, 0) AS BIGINT) AS n_spans
        FROM src s
        JOIN tot t2 ON t2.doc_id = s.doc_id
        LEFT JOIN rebuilt r ON r.doc_id = s.doc_id
        LEFT JOIN nsp ON nsp.doc_id = s.doc_id""")),

    // Incremental substring dedup — the recurring-crawl shape: history
    // (doc_id % 5 < 4) persists ONLY as distinct md5 anchor
    // fingerprints; each batch doc (doc_id % 5 = 4) loses every
    // ≥8-word run history contains PLUS in-batch non-first repeats.
    // The oracle anti/semi-joins on the gram STRING (≡ md5 keys up to
    // vanishing 128-bit collisions, the unitIndex convention).
    "q_corpus_substring_dedup_incr" -> Entry(
      // (no respread: the bloom-probe path consumes the anchor stream
      // through several eager passes — count probe, persist fill,
      // miss-side recompute — and each pays the exchange again;
      // measured 1.75 -> 2.0-2.4 s with the respread)
      (s, dir) => {
        val docs = t(s, dir, "documents").select(col("doc_id"),
          when(col("doc_id") % 4 === 0,
            concat_ws(" ", col("text"), lit(substrFooter)))
            .otherwise(col("text")).as("text"))
        // History index STAGED on disk, mtime-guarded — the
        // q_dedup_incr_near / q_dedup_incr_emb model: an incremental
        // query times the per-batch PROBE, not the history index
        // build ("the production incremental driver stores this index
        // as a table anyway" — substringAnchorIndex's contract), and
        // the bloom sidecar is persisted NEXT to the index exactly as
        // indexBloom documents for the 100 TB shape. r16 instead
        // rebuilt the index into a session cache per invocation —
        // under the honest bench contract every timed run re-paid the
        // whole history shingle+distinct+bloom chain (~12 s task sum,
        // 2.8 s walls at sf0.1). The bloom bytes write FIRST, the
        // parquet (whose _SUCCESS is the staleness marker) last, so a
        // torn build can never present a marker without its sidecar.
        val idxPath = ensureStaged(s, dir, "subidx_md5_k8", "afp",
          "documents") { pp =>
          val hist = graft.operators.Corpus.substringAnchorIndex(
            Q.spreadBy(docs.filter(col("doc_id") % 5 < 4),
              col("doc_id")), "text", "doc_id", k = 8)
          val bloom = graft.operators.Corpus.substringIndexBloom(hist)
          java.nio.file.Files.createDirectories(
            java.nio.file.Paths.get(pp))
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$pp/bloom.bin"), bloom)
          hist.write.mode("overwrite").parquet(s"$pp/afp")
        }
        val idx = s.read.parquet(s"$idxPath/afp")
        val bloom = java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(s"$idxPath/bloom.bin"))
        // bloom+sliver probe path (row-identical to the plain probe,
        // which q_corpus_paragraph_dedup_incr keeps oracle-covered)
        graft.operators.Corpus.dedupSubstringsAgainstIndexBloom(
          docs.filter(col("doc_id") % 5 === 4), idx, "text", "doc_id",
          bloom, k = 8)
      },
      Some(raw"""WITH src AS (
          SELECT doc_id, CASE WHEN doc_id % 4 = 0
            THEN text || ' $substrFooter' ELSE text END AS text
          FROM documents
        ), ws0 AS (
          SELECT doc_id,
            regexp_split_to_array(trim(lower(text)), '\s+') AS ws
          FROM src
        ), anchors AS (
          SELECT doc_id, i - 1 AS p,
            array_to_string(list_slice(ws, i, i + 7), ' ') AS g
          FROM ws0, unnest(range(1, len(ws) - 6)) AS t(i)
          WHERE len(ws) >= 8
        ), idx AS (
          SELECT DISTINCT g FROM anchors WHERE doc_id % 5 < 4
        ), b AS (
          SELECT doc_id, p, g FROM anchors WHERE doc_id % 5 = 4
        ), hist AS (
          SELECT b.doc_id, b.p FROM b JOIN idx ON idx.g = b.g
        ), novel AS (
          SELECT b.doc_id, b.p, b.g FROM b LEFT JOIN idx ON idx.g = b.g
          WHERE idx.g IS NULL
        ), nf AS (
          SELECT doc_id, p FROM (
            SELECT doc_id, p,
              row_number() OVER (PARTITION BY g ORDER BY doc_id, p) AS rn
            FROM novel) x WHERE rn > 1
        ), hits AS (
          SELECT doc_id, p FROM hist
          UNION ALL SELECT doc_id, p FROM nf
        ), isl AS (
          SELECT doc_id, p, CASE WHEN
              coalesce(p - lag(p) OVER (PARTITION BY doc_id ORDER BY p),
                9) > 8 THEN 1 ELSE 0 END AS head
          FROM hits
        ), isl2 AS (
          SELECT doc_id, p,
            sum(head) OVER (PARTITION BY doc_id ORDER BY p) AS gid
          FROM isl
        ), spans AS (
          SELECT doc_id, gid, min(p) AS s, max(p) + 7 AS e
          FROM isl2 GROUP BY 1, 2
        ), nsp AS (
          SELECT doc_id, count(*) AS n_spans FROM spans GROUP BY 1
        ), words AS (
          SELECT doc_id, j AS q, ws[j + 1] AS w
          FROM ws0, unnest(range(0, len(ws))) AS t(j)
          WHERE doc_id % 5 = 4
        ), cov AS (
          SELECT DISTINCT w.doc_id, w.q
          FROM words w JOIN spans sp ON sp.doc_id = w.doc_id
            AND w.q BETWEEN sp.s AND sp.e
        ), kept AS (
          SELECT w.doc_id, w.q, w.w
          FROM words w LEFT JOIN cov
            ON cov.doc_id = w.doc_id AND cov.q = w.q
          WHERE cov.doc_id IS NULL
        ), rebuilt AS (
          SELECT doc_id, string_agg(w, ' ' ORDER BY q) AS clean_text,
            count(*) AS n_kept
          FROM kept GROUP BY 1
        ), tot AS (SELECT doc_id, len(ws) AS n_all FROM ws0)
        SELECT s.doc_id, coalesce(r.clean_text, '') AS clean_text,
          CAST(t2.n_all - coalesce(r.n_kept, 0) AS BIGINT)
            AS n_words_removed,
          CAST(coalesce(nsp.n_spans, 0) AS BIGINT) AS n_spans
        FROM src s
        JOIN tot t2 ON t2.doc_id = s.doc_id
        LEFT JOIN rebuilt r ON r.doc_id = s.doc_id
        LEFT JOIN nsp ON nsp.doc_id = s.doc_id
        WHERE s.doc_id % 5 = 4""")),

    // Per-SOURCE boilerplate removal: words appearing (distinct per
    // doc) in > 30% of a source's documents strip from that source
    // only — the domain-scoped nav/footer/banner cut a corpus-global
    // threshold can't see. Oracle replays doc-distinct counts,
    // per-group thresholds, and the position-ordered rebuild.
    "q_corpus_line_dedup_group" -> Entry(
      // (no respread: multi-pass, same measured regression as
      // q_corpus_line_dedup)
      (s, dir) => graft.operators.Corpus
        .dedupLinesPerGroup(t(s, dir, "documents"), "source", "text",
          delim = " ", maxDocShare = 0.3)
        .select(col("doc_id"), col("text").as("cleaned")),
      Some("""WITH ds AS (
          SELECT doc_id, source, string_split(text, ' ') AS ws
          FROM documents),
        flat AS (
          SELECT doc_id, source, generate_subscripts(ws, 1) AS i,
            unnest(ws) AS w
          FROM ds),
        nd AS (SELECT source, count(*) AS n FROM documents
          GROUP BY 1 HAVING count(*) >= 3),
        docfreq AS (
          SELECT source, w, count(DISTINCT doc_id) AS c
          FROM flat GROUP BY 1, 2),
        freq AS (
          SELECT df.source, df.w FROM docfreq df JOIN nd USING (source)
          WHERE df.c > 0.3 * nd.n)
        SELECT f.doc_id, coalesce(
          string_agg(f.w, ' ' ORDER BY f.i) FILTER (fr.w IS NULL),
          '') AS cleaned
        FROM flat f LEFT JOIN freq fr
          ON fr.source = f.source AND fr.w = f.w
        GROUP BY f.doc_id""")),

    // Deterministic training-order shuffle: the md5(id:seed) total
    // order replays exactly in DuckDB, so the PERMUTATION itself is
    // hash-checked (not just the key). The operator is one range
    // exchange at scale; the window here is only the oracle's way of
    // naming positions.
    "q_corpus_shuffle" -> Entry(
      (s, dir) => {
        // positions via the distributed two-phase prefix sum
        // (shuffleWithPositions) — NOT row_number() over a global
        // window, which planned a single-partition WindowExec (the
        // r7 bench tail's "No Partition Defined" warnings). The
        // oracle's plain md5 ordering agrees wherever ids are
        // distinct — the operator key is tie-free by construction.
        graft.operators.Corpus
          .shuffleWithPositions(t(s, dir, "documents"), "doc_id", 42L)
          .select(col("doc_id"), col("pos"))
      },
      Some("""SELECT doc_id, row_number() OVER (
          ORDER BY md5(coalesce(doc_id::VARCHAR, '') || ':42')) AS pos
        FROM documents""")),

    // int8 embedding quantization (4 B/dim → 1 B at 100 TB): integer
    // per-vector summaries of the quantized codes — the floor(x/s+0.5)
    // arithmetic replays exactly in DuckDB (round() would not: engines
    // disagree on round-half of negatives). All-integer output ⇒
    // strict hash compare.
    "q_embed_quantize" -> Entry(
      (s, dir) => {
        // spread: the probe columns below are interpreted HOF lambdas
        // (~200 evals/row) and the scan is one row group (Q.spread)
        val q = graft.operators.Embeddings
          .quantize(Q.spread(t(s, dir, "embeddings")), "embedding")
        q.select(col("vec_id"),
          aggregate(col("qvec"), lit(0L),
            (a, x) => a + x.cast("long")).as("sum_q"),
          aggregate(col("qvec"), lit(0L),
            (a, x) => a + abs(x.cast("long"))).as("sum_abs_q"),
          size(filter(col("qvec"),
            x => abs(x.cast("int")) === 127)).cast("long").as("n_sat"))
      },
      Some("""WITH base AS (
          SELECT vec_id, cast(embedding AS double[]) AS e,
            list_max(list_transform(cast(embedding AS double[]),
              x -> abs(x))) AS m
          FROM embeddings
        ), q AS (
          -- m IS NULL (empty array) mirrors the Spark scale-1 guard;
          -- list_sum of an empty list is NULL in DuckDB, 0 in Spark's
          -- aggregate — coalesce to keep the hash compare strict
          SELECT vec_id, list_transform(e,
            x -> cast(floor(x / (CASE WHEN m = 0 OR m IS NULL THEN 1.0
              ELSE m / 127.0 END) + 0.5) AS bigint)) AS qv
          FROM base)
        SELECT vec_id,
          coalesce(cast(list_sum(qv) AS bigint), 0) AS sum_q,
          coalesce(cast(list_sum(list_transform(qv, x -> abs(x)))
            AS bigint), 0) AS sum_abs_q,
          len(list_filter(qv, x -> abs(x) = 127)) AS n_sat
        FROM q""")),

    // Distributed PCA, step 1: the d×d population covariance from ONE
    // pass (typed aggregator buffers (n, sum[d], upper-tri products) —
    // map-side partials, zero vector shuffle). Products of identical
    // float→double casts differ across engines AND across Spark runs
    // (partial-merge order is scheduling-dependent) only in summation
    // order. Measured at sf0.01: six cov values sit within 1e-9 of a
    // 1e-6 rounding boundary — inside the drift — so round(…,6) hash-
    // flipped nondeterministically (r6 defect); at 4 dp the nearest
    // boundary is 7.4e-8 away, safely outside any drift.
    "q_embed_pca_cov" -> Entry(
      (s, dir) => {
        val stats = t(s, dir, "embeddings")
          .agg(graft.operators.Embeddings.cov_stats(col("embedding"))
            .as("s"))
        val d = size(col("sums"))
        stats
          .select(col("s.n").as("n"), col("s.sum").as("sums"),
            posexplode(col("s.prod")).as(Seq("pos", "sp")))
          .withColumn("i", floor(col("pos") / d).cast("long"))
          .withColumn("j", pmod(col("pos"), d).cast("long"))
          .filter(col("i") <= col("j"))
          .select(col("i"), col("j"),
            // + 0.0 normalizes IEEE signed zero (-0.0 + 0.0 = +0.0):
            // DuckDB round() preserves -0.0 while Spark's HALF_UP
            // normalizes, which stringify-differs under the strict
            // driver hash (r7 verdict). Applied on BOTH sides.
            (round(col("sp") / col("n") -
              (element_at(col("sums"), (col("i") + 1).cast("int")) / col("n")) *
              (element_at(col("sums"), (col("j") + 1).cast("int")) / col("n")),
              4) + lit(0.0)).as("cov"))
      },
      Some("""WITH v AS (
          SELECT vec_id, embedding AS e FROM embeddings
          WHERE embedding IS NOT NULL AND len(embedding) > 0
        ), dims AS (
          SELECT vec_id, i, cast(e[i+1] AS double) AS x
          FROM v, unnest(range(0, len(e))) AS t(i)
        ), stats AS (SELECT count(*) AS n FROM v),
        means AS (SELECT i, sum(x) AS s FROM dims GROUP BY 1),
        pairs AS (
          SELECT a.i AS i, b.i AS j, sum(a.x * b.x) AS sp
          FROM dims a JOIN dims b USING (vec_id) WHERE a.i <= b.i
          GROUP BY 1, 2)
        SELECT cast(p.i AS bigint) AS i, cast(p.j AS bigint) AS j,
          -- + 0.0 folds DuckDB's IEEE -0.0 into +0.0 (signed-zero
          -- normalization; see the Spark side)
          round(p.sp / n - (ma.s / n) * (mb.s / n), 4) + 0.0 AS cov
        FROM pairs p, stats
        JOIN means ma ON ma.i = p.i
        JOIN means mb ON mb.i = p.j""")),

    // Distributed PCA, step 2: Jacobi eigenbasis of that covariance
    // (driver-side, d×d-bounded) + corpus projection through the native
    // codegen'd mat_project kernel. r12: STRICT oracle (was rows-only)
    // — the model persists to a staging store and the projection runs
    // with the doubles read BACK from it, so DuckDB replays the
    // centered dot products from the same floats in the same
    // summation order; only the eigensolve (iterative Jacobi) stays
    // outside the oracle. EmbeddingsSpec still pins orthonormality,
    // variance ordering, and kernel ≡ manual projection. Output is one
    // (vec_id, comp, pca) row per component — plain doubles hash
    // strictly; arrays wouldn't.
    "q_embed_pca" -> Entry(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val model = ensurePcaModel(s, dir, "pca_k4")(
          graft.operators.Embeddings.fitPca(emb, "embedding", 4))
        graft.operators.Embeddings.pcaProject(emb, "embedding", model)
          .select(col("vec_id"),
            posexplode(col("pca")).as(Seq("comp", "y")))
          .select(col("vec_id"), col("comp").cast("long").as("comp"),
            // + 0.0: signed-zero normalization (q_embed_pca_cov rule)
            (round(col("y"), 3) + lit(0.0)).as("pca"))
      },
      Some(pcaReplaySql("pca_k4", "1.0"))),

    // Incremental PCA: raw moments are ADDITIVE, so each batch appends
    // ONE (n, Σv, Σvvᵀ) row to a persisted stats store and the fit
    // folds the rows — a growing corpus never rescans old batches
    // (same incremental pattern as the dedup fingerprint index). Here:
    // two half-corpus batches → fold → WHITENED projection (unit
    // variance per component, spec-pinned). r12: STRICT oracle via the
    // q_embed_pca persisted-model replay — the whitening factor
    // 1/√max(λ,1e-12) recomputes in DuckDB from the stored eigenvalue
    // (sqrt and division are correctly-rounded IEEE ops on both
    // engines, so the pre-scaled weights are bit-identical); only the
    // moment fold + eigensolve stay outside. EmbeddingsSpec pins
    // two-batch ≡ one-shot.
    "q_embed_pca_inc" -> Entry(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val m = ensurePcaModel(s, dir, "pca_inc_k4") {
          // per-invocation temp store (a fixed shared path would race
          // overwrite/append/read between concurrent runs and silently
          // fit on a half-written store); the store is only needed
          // until the fit below, so it is deleted eagerly — and
          // Q.tempDir's exit hook covers the failure path
          val p = Q.tempDir("graft_moments") + "/stats"
          graft.operators.Embeddings.appendMomentStats(
            emb.filter(col("vec_id") % 2 === 0), "embedding", p,
            overwrite = true)
          graft.operators.Embeddings.appendMomentStats(
            emb.filter(col("vec_id") % 2 === 1), "embedding", p)
          val fitted = graft.operators.Embeddings.fitPcaFromStats(s, p, 4)
          // the model is persisted by ensurePcaModel; the moment store
          // is dead weight now
          org.apache.commons.io.FileUtils.deleteQuietly(
            new java.io.File(p).getParentFile)
          fitted
        }
        graft.operators.Embeddings
          .pcaProject(emb, "embedding", m, whiten = true)
          .select(col("vec_id"),
            posexplode(col("pca")).as(Seq("comp", "y")))
          .select(col("vec_id"), col("comp").cast("long").as("comp"),
            (round(col("y"), 3) + lit(0.0)).as("pca"))
      },
      Some(pcaReplaySql("pca_inc_k4",
        "1.0 / sqrt(greatest(eig, 1e-12))"))),

    // Incremental EMBEDDING near-dup: batch vectors probe a persisted
    // index of hyperplane band keys + int8-quantized corpus vectors
    // (1 B/dim at rest, dequantized-cosine verify — the continuous-
    // ingest shape where full-precision corpus vectors are never
    // re-read). r10: md5-prefix sign basis (STRICT oracle — was
    // rows-only on hash-seeded bands): the 8×12 banding, the write-time
    // bucket cap, the floor(+0.5) int8 quantize/dequantize round-trip
    // AND the dequantized-cosine verify all replay in DuckDB, so the
    // oracle covers the persisted index's arithmetic end to end.
    // DedupSpec still pins planted recall and novel-vector rejection.
    "q_dedup_incr_emb" -> Entry(
      (s, dir) => {
        val em = t(s, dir, "embeddings")
        // cached index, mtime-guarded like q_dedup_incr_near: the query
        // must time the per-batch PROBE, not index construction, and a
        // regenerated embeddings.parquet must force a rebuild
        val p = ensureStaged(s, dir, "embidx_md5_b8w12", "vecs",
          "embeddings")(pp => graft.operators.Dedup.writeEmbeddingIndex(
            em.filter(col("vec_id") % 5 < 4), pp, "vec_id", "embedding",
            md5Basis = true))
        // batch: re-keyed perturbed copies (cosine ≥ 0.99) of INDEXED
        // corpus vectors — the re-crawl shape; the probe must match
        // each back to its stored source
        val batch = em.filter(col("vec_id") % 5 === 0)
          .select((col("vec_id") + 100000L).as("vec_id"),
            transform(col("embedding"), x => x + lit(0.01f))
              .as("embedding"))
        graft.operators.Dedup.embeddingNearDupsAgainstIndex(
          s, p, batch, "vec_id", "embedding", threshold = 0.9,
          md5Basis = true)
      },
      // The replay: corpus keys (96 planes, 12-bit bands), write-time
      // bucket cap ≤1000, batch keys over the float-perturbed vectors,
      // band equi-join candidates, then dequantized-cosine ≥ 0.9. The
      // quantize is floor(v/scale + 0.5) at double, scale = max|v|/127
      // (float max, cast double) — identical arithmetic both engines;
      // dequantize re-narrows q·scale to FLOAT before the double
      // cosine, matching the kernel's array<float> store exactly.
      Some("""WITH corpus AS (
          SELECT vec_id, embedding FROM embeddings WHERE vec_id % 5 < 4),
        batch AS (
          SELECT vec_id + 100000 AS vec_id,
            list_transform(embedding, x -> x + 0.01::FLOAT) AS embedding
          FROM embeddings WHERE vec_id % 5 = 0),
        planes AS (SELECT unnest(range(96)) AS p),
        dims AS (SELECT unnest(range(
          (SELECT len(embedding) FROM embeddings LIMIT 1))) AS d),
        signs AS (
          SELECT p, list(CASE WHEN
              ('0x'||substr(md5(p||':'||d),1,15))::BIGINT & 1 = 1
            THEN 1.0 ELSE -1.0 END ORDER BY d) AS sv
          FROM planes CROSS JOIN dims GROUP BY p),
        ckeys AS (
          SELECT c.vec_id, p.p // 12 AS band,
            sum(CASE WHEN list_reduce(
                list_transform(CAST(c.embedding AS DOUBLE[]),
                  (x, i) -> x * s.sv[i]),
                (a, b) -> a + b) > 0
              THEN (1::BIGINT << (p.p % 12)) ELSE 0 END)::BIGINT
              AS band_hash
          FROM corpus c CROSS JOIN planes p
          JOIN signs s ON s.p = p.p GROUP BY c.vec_id, p.p // 12),
        capped AS (SELECT band, band_hash FROM ckeys
          GROUP BY band, band_hash HAVING count(*) <= 1000),
        ikeys AS (SELECT k.* FROM ckeys k
          JOIN capped USING (band, band_hash)),
        bkeys AS (
          SELECT b.vec_id, p.p // 12 AS band,
            sum(CASE WHEN list_reduce(
                list_transform(CAST(b.embedding AS DOUBLE[]),
                  (x, i) -> x * s.sv[i]),
                (a, b) -> a + b) > 0
              THEN (1::BIGINT << (p.p % 12)) ELSE 0 END)::BIGINT
              AS band_hash
          FROM batch b CROSS JOIN planes p
          JOIN signs s ON s.p = p.p GROUP BY b.vec_id, p.p // 12),
        cands AS (
          SELECT DISTINCT b.vec_id AS batch_id, i.vec_id AS corpus_id
          FROM bkeys b JOIN ikeys i
            ON b.band = i.band AND b.band_hash = i.band_hash),
        quant AS (
          SELECT vec_id,
            list_transform(embedding, x -> CAST(floor(
                CAST(x AS DOUBLE) / scale + 0.5) * scale AS FLOAT))
              AS dvec
          FROM (SELECT vec_id, embedding,
              CASE WHEN maxabs = 0 OR maxabs IS NULL THEN 1.0
                ELSE maxabs / 127.0 END AS scale
            FROM (SELECT vec_id, embedding,
                CAST(list_max(list_transform(embedding,
                  x -> abs(x))) AS DOUBLE) AS maxabs
              FROM corpus)))
        SELECT batch_id, corpus_id, cosine FROM (
          SELECT c.batch_id, c.corpus_id,
            round(list_cosine_similarity(
              CAST(b.embedding AS DOUBLE[]),
              CAST(q.dvec AS DOUBLE[])), 3) AS cosine
          FROM cands c
          JOIN batch b ON b.vec_id = c.batch_id
          JOIN quant q ON q.vec_id = c.corpus_id)
        WHERE cosine >= 0.9""")),

    // Johnson–Lindenstrauss random projection 64 → 16 dims through the
    // same zero-Exchange mat_project kernel as PCA — the cheap
    // dimensionality cut before ANN/near-dup at 100 TB. r10: the matrix
    // is the Achlioptas ±1/√16 sign projection on the md5-prefix basis,
    // so the whole map replays in DuckDB (±0.25 is a power-of-two scale
    // and the kernel's d-ascending fold matches list_reduce exactly) —
    // strict oracle, integer-encoded (milli-units). EmbeddingsSpec pins
    // determinism + norm preservation on both bases.
    "q_embed_rproj" -> Entry(
      (s, dir) => graft.operators.Embeddings
        .randomProject(t(s, dir, "embeddings"), "embedding",
          inDim = 64, outDim = 16, signBasis = true)
        .select(col("vec_id"),
          posexplode(col("rp")).as(Seq("dim", "v")))
        .select(col("vec_id"), col("dim").cast("long").as("dim"),
          round(col("v") * 1000, 0).cast("long").as("milli")),
      Some("""WITH dims AS (SELECT unnest(range(
          (SELECT len(embedding) FROM embeddings LIMIT 1))) AS d),
        planes AS (SELECT unnest(range(16)) AS j),
        signs AS (
          SELECT j, list(CASE WHEN
              ('0x'||substr(md5(j||':'||d),1,15))::BIGINT & 1 = 1
            THEN 0.25 ELSE -0.25 END ORDER BY d) AS sv
          FROM planes CROSS JOIN dims GROUP BY j)
        SELECT e.vec_id, s.j AS dim,
          CAST(round(list_reduce(
            list_transform(CAST(e.embedding AS DOUBLE[]),
              (x, i) -> x * s.sv[i]),
            (a, b) -> a + b) * 1000) AS BIGINT) AS milli
        FROM embeddings e CROSS JOIN signs s""")),

    // Cluster-balanced (diversity) sampling: k-means cells +
    // deterministic per-cell cap — the anti-mode-collapse sampler for
    // dense semantic regions. r12: STRICT oracle (was rows-only) via
    // the persisted nlist=8 quantizer: DuckDB replays cell assignment
    // (ivfReplayCtes) and the md5(id)-ordered per-cell cap exactly;
    // only the k-means fit stays outside. EmbeddingsSpec pins
    // cap/determinism.
    "q_embed_balanced" -> Entry(
      (s, dir) => {
        val idxPath = ensureIvfIndex(s, dir)
        graft.operators.Embeddings
          .balancedSample(t(s, dir, "embeddings"), "embedding", "vec_id",
            nlist = 8, perCell = 40,
            centroids = Some(Similarity.readCentroids(s, idxPath)))
          .select(col("vec_id"), col("cell"))
      },
      Some(s"""WITH $ivfReplayCtes,
        ranked AS (
          SELECT vec_id, cell, row_number() OVER (PARTITION BY cell
            ORDER BY md5(cast(vec_id AS varchar)), vec_id) AS rnk
          FROM assigned)
        SELECT vec_id, cell FROM ranked WHERE rnk <= 40""")),

    // BERTopic-style cluster topic labels: k-means cells over the
    // embedding space, each labeled with its c-TF-IDF-distinctive
    // terms via the documents join (vec_id ≡ doc_id in the fixture).
    // r12: STRICT oracle (was rows-only) — labeling runs against the
    // SAME persisted nlist=8 quantizer the IVF probes use (train once,
    // every pass replays the same cells), so DuckDB replays cell
    // assignment (argmax cosine, ties to lowest cell — the
    // ivfReplayCtes machinery) and the full c-TF-IDF scoring from the
    // q_text_distinctive oracle, regrouped by cell. Only the k-means
    // FIT stays outside (float-iterative). EmbeddingsSpec still pins
    // planted-cluster topic recovery.
    "q_embed_topics" -> Entry(
      (s, dir) => {
        val idxPath = ensureIvfIndex(s, dir)
        graft.operators.Embeddings
          .clusterTopics(t(s, dir, "embeddings"), "vec_id", "embedding",
            t(s, dir, "documents"), "doc_id", "text",
            nlist = 8, topTerms = 3,
            centroids = Some(Similarity.readCentroids(s, idxPath)))
      },
      Some(s"""WITH $ivfReplayCtes,
        labeled AS (
          SELECT a.cell, d.text FROM assigned a
          JOIN documents d ON d.doc_id = a.vec_id
        ), sizes AS (
          SELECT cell, count(*) AS n_docs FROM labeled GROUP BY 1
        ), words AS (
          SELECT cell,
            unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS w
          FROM labeled
        ), tf AS (
          SELECT cell, w, count(*) AS tf FROM words GROUP BY 1, 2
        ), gdf AS (SELECT w, count(*) AS gdf FROM tf GROUP BY 1),
        ng AS (SELECT count(DISTINCT cell) AS n FROM labeled),
        scored AS (
          SELECT cell, w, tf, gdf,
            round(tf * ln((1.0 + n) / (1.0 + gdf)), 6) AS score6
          FROM tf JOIN gdf USING (w), ng
        ), ranked AS (
          SELECT *, row_number() OVER (PARTITION BY cell
            ORDER BY score6 DESC, w ASC) AS rnk
          FROM scored)
        SELECT r.cell, s.n_docs, r.w AS term, r.tf, r.gdf,
          round(r.score6, 3) AS score
        FROM ranked r JOIN sizes s USING (cell) WHERE rnk <= 3""")),

    // Sequence packing: docs → consecutive 4096-token training bins via
    // the two-phase distributed prefix sum (operators/Pack.scala — no
    // global single-partition window). Bin assignment is pure window
    // arithmetic, replayed exactly by the oracle.
    "q_pack_sequences" -> Entry(
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .select(col("doc_id"), Text.token_count(col("text")).as("n"))
        graft.operators.Pack.sequenceStats(
          graft.operators.Pack.sequencePack(docs, "doc_id", "n", 4096), "n")
          .select(col("seq_id"), col("n_docs"), col("sum_tokens"))
      },
      Some("""WITH t AS (SELECT doc_id,
          -- Java-trim (<= 0x20) + Java \s (incl. \x0B): the engine
          -- side is the pinned token_count kernel, not DuckDB trim()
          len(regexp_split_to_array(
            regexp_replace(regexp_replace(text,
              '^[\x00-\x20]+', ''), '[\x00-\x20]+$', ''),
            '[\t\n\x0B\f\r ]+')) AS n FROM documents),
        c AS (SELECT doc_id, n,
          coalesce(sum(n) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
          FROM t)
        SELECT CAST(floor(cb / 4096) AS BIGINT) AS seq_id,
          count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS sum_tokens
        FROM c GROUP BY 1""")),

    "q_text_quality" -> Entry(
      (s, dir) => {
        val f = Text.quality_features(col("text"))
        Q.spread(t(s, dir, "documents"))
          .select(col("doc_id"),
            f.getField("n_words").cast("long").as("n_words"),
            round(f.getField("mean_word_len"), 4).as("mean_word_len"),
            round(f.getField("stopword_ratio"), 4).as("stopword_ratio"))
      },
      Some("""SELECT doc_id,
        cast(len(regexp_split_to_array(trim(text), '\s+')) as bigint)
          AS n_words,
        round(length(trim(text)) /
          greatest(len(regexp_split_to_array(trim(text), '\s+')), 1)::double,
          4) AS mean_word_len,
        round(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
            w -> lower(w) IN ('the','a','an','and','or','of','to','in','is',
              'it','that','for','on','with','as'))) /
          greatest(len(regexp_split_to_array(trim(text), '\s+')), 1)::double,
          4) AS stopword_ratio
        FROM documents""")),

    // A1-shape explode+merge over documents (secdb explode→group→merge):
    // word-level inverted aggregation.
    "q_text_word_index" -> Entry(
      (s, dir) => t(s, dir, "documents")
        .select(col("lang"),
          explode(split(trim(col("text")), "\\s+")).as("word"))
        .filter(length(col("word")) > 4)
        .groupBy(col("lang"), col("word"))
        .agg(count(lit(1)).as("n")),
      Some("""SELECT lang, word, count(*) AS n FROM (
        SELECT lang, unnest(regexp_split_to_array(trim(text), '\s+')) AS word
        FROM documents) WHERE length(word) > 4
        GROUP BY lang, word""")),

    // Heuristic language-ID: stopword-marker hit counts per language,
    // argmax with deterministic tie-break (hits, then lang code).
    "q_text_langid" -> Entry(
      (s, dir) => Q.spread(t(s, dir, "documents"))
        .select(col("doc_id"), Text.lang_id(col("text")).as("lang")),
      Some("""WITH words AS (
          SELECT doc_id,
            regexp_split_to_array(trim(lower(text)), '\s+') AS ws
          FROM documents
        ), scores AS (
          SELECT doc_id, 'en' AS lang, len(list_filter(ws,
            w -> w IN ('the','and','of','to','is'))) AS hits FROM words
          UNION ALL SELECT doc_id, 'es', len(list_filter(ws,
            w -> w IN ('el','la','de','que','los'))) FROM words
          UNION ALL SELECT doc_id, 'de', len(list_filter(ws,
            w -> w IN ('der','die','und','das','ist'))) FROM words
          UNION ALL SELECT doc_id, 'fr', len(list_filter(ws,
            w -> w IN ('le','la','les','et','est'))) FROM words
        ), ranked AS (
          SELECT doc_id, lang, hits, row_number() OVER (
            PARTITION BY doc_id ORDER BY hits DESC, lang DESC) AS rn
          FROM scores)
        SELECT doc_id, CASE WHEN hits > 0 THEN lang ELSE 'und' END AS lang
        FROM ranked WHERE rn = 1""")),

    // Per-unit language mixture (Corpus.unitLangProfile): CCNet's
    // per-paragraph langid regrouped to a doc-level dominance signal —
    // dominant_frac < 1 flags the code-switching pages a whole-doc
    // langid mislabels. The corpus is single-line, so both sides plant
    // multi-unit bodies: the first unit is the doc's own words
    // (variable — en or und by marker luck), the rest are fixed
    // es/en | fr/de/fr | junk units by doc_id%3. Everything — unit
    // split, per-unit vote, argmax — runs as higher-order array ops in
    // ONE scan: no explode, no shuffle; the oracle replays the same
    // votes through an unnest + two ranked windows.
    "q_text_langid_units" -> Entry(
      (s, dir) => {
        val w = split(trim(col("text")), " ")
        val head = array_join(slice(w, 1, 4), " ")
        val body = when(pmod(col("doc_id"), lit(3)) === 0,
            concat_ws("\n", head, lit("el que la de los"),
              lit("the sun is to rise")))
          .when(pmod(col("doc_id"), lit(3)) === 1,
            concat_ws("\n", head, lit("le chat et la vie"),
              lit("der hund und das ist"), lit("le vin est bon")))
          .otherwise(concat_ws("\n", head, lit("qwerty asdf")))
        graft.operators.Corpus.unitLangProfile(
          Q.spread(t(s, dir, "documents")).select(col("doc_id"), body.as("body")),
          "body", "doc_id")
      },
      Some("""WITH parts AS (
          SELECT doc_id, coalesce(array_to_string(
            (string_split(trim(text), ' '))[1:4], ' '), '') AS head
          FROM documents
        ), planted AS (
          SELECT doc_id,
            CASE doc_id % 3
              WHEN 0 THEN concat_ws(chr(10), head,
                'el que la de los', 'the sun is to rise')
              WHEN 1 THEN concat_ws(chr(10), head, 'le chat et la vie',
                'der hund und das ist', 'le vin est bon')
              ELSE concat_ws(chr(10), head, 'qwerty asdf') END AS body
          FROM parts
        ), us AS (
          SELECT doc_id, string_split(body, chr(10)) AS ls FROM planted
        ), unit AS (
          SELECT doc_id, j AS pos,
            regexp_split_to_array(trim(lower(ls[j+1])), '\s+') AS ws
          FROM us, unnest(range(0, len(ls))) AS t(j)
        ), scores AS (
          SELECT doc_id, pos, 'en' AS lang, len(list_filter(ws,
            w -> w IN ('the','and','of','to','is'))) AS hits FROM unit
          UNION ALL SELECT doc_id, pos, 'es', len(list_filter(ws,
            w -> w IN ('el','la','de','que','los'))) FROM unit
          UNION ALL SELECT doc_id, pos, 'de', len(list_filter(ws,
            w -> w IN ('der','die','und','das','ist'))) FROM unit
          UNION ALL SELECT doc_id, pos, 'fr', len(list_filter(ws,
            w -> w IN ('le','la','les','et','est'))) FROM unit
        ), ranked AS (
          SELECT doc_id, pos, lang, hits, row_number() OVER (
            PARTITION BY doc_id, pos ORDER BY hits DESC, lang DESC) AS rn
          FROM scores
        ), ulang AS (
          SELECT doc_id, pos,
            CASE WHEN hits > 0 THEN lang ELSE 'und' END AS lang
          FROM ranked WHERE rn = 1
        ), votes AS (
          SELECT doc_id, lang, count(*) AS votes
          FROM ulang GROUP BY doc_id, lang
        ), dom AS (
          SELECT doc_id, lang, votes, row_number() OVER (
            PARTITION BY doc_id ORDER BY votes DESC, lang DESC) AS rn
          FROM votes
        ), n AS (
          SELECT doc_id, cast(len(ls) as bigint) AS n_units FROM us)
        SELECT n.doc_id, n.n_units, d.lang AS dominant_lang,
          round(d.votes / n.n_units, 4) AS dominant_frac
        FROM n JOIN dom d ON d.doc_id = n.doc_id AND d.rn = 1""")),

    // ---- dedup ------------------------------------------------------
    // Exact dedup on normalized-text fingerprint.
    "q_dedup_exact" -> Entry(
      (s, dir) => Dedup.exact(t(s, dir, "documents"), "text", "doc_id"),
      Some("""SELECT sha256(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))
          AS fp,
        min(doc_id) AS keep_id, count(*) AS n_copies
        FROM documents GROUP BY 1""")),

    // MinHash+LSH candidate pairs (band equi-join, no O(n²)); verified
    // with exact word-shingle Jaccard ≥ 0.4.
    "q_dedup_minhash" -> Entry(
      (s, dir) => minhashVerifiedPairs(s, dir),
      // Full DuckDB oracle: brute-force all-pairs word-3-gram Jaccard.
      // Valid because at the verification threshold (0.4) the LSH banding
      // stage has empirically total recall on this corpus — the oracle
      // therefore checks BOTH candidate recall and exact verification.
      Some(s"""WITH $minhashPairsCtes
        SELECT id1, id2, jaccard FROM pairs""")),

    // Duplicate-cluster resolution: iterative min-label propagation over
    // the verified near-dup pairs (one join + one groupBy per round, no
    // driver-side union-find) vs the oracle's recursive-CTE transitive
    // closure — a distributed fixpoint checked against SQL recursion.
    "q_dedup_cluster" -> Entry(
      (s, dir) => Dedup
        .connectedComponents(minhashVerifiedPairs(s, dir)
          .select(col("id1"), col("id2")))
        .select(col("id").as("doc_id"), col("component")),
      Some(s"""WITH RECURSIVE $minhashPairsCtes,
        edges AS (
          SELECT id1 AS a, id2 AS b FROM pairs
          UNION SELECT id2, id1 FROM pairs),
        reach(id, r) AS (
          SELECT DISTINCT a, a FROM edges
          UNION
          SELECT e.a, r.r FROM edges e JOIN reach r ON r.id = e.b)
        SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY id""")),

    // Incremental NEAR-dup: the batch split checked against the corpus
    // split's PERSISTED signature index (bands + shingle hashes; corpus
    // text never re-read). Oracle = brute-force batch×corpus Jaccard —
    // valid on the same total-recall-at-0.4 grounds as q_dedup_minhash,
    // which cross-split pairs are a subset of.
    "q_dedup_incr_near" -> Entry(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val corpus = docs.filter(col("doc_id") % 5 < 4)
        val batch = docs.filter(col("doc_id") % 5 === 4)
        // cache key carries the default index params; staleness is
        // guarded by mtime — a regenerated documents.parquet must
        // rebuild the index or the oracle would compare against the
        // OLD corpus' signatures
        val idxPath = ensureStaged(s, dir, "ndidx_s5k20b5w3", "docs",
          "documents")(pp =>
          Dedup.writeNearDupIndex(corpus, pp, "text", "doc_id"))
        Dedup.nearDupsAgainstIndex(s, idxPath, batch, "text", "doc_id")
      },
      Some("""WITH words AS (
          SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS ws
          FROM documents
        ), sh AS (
          SELECT DISTINCT doc_id,
            CASE WHEN len(ws) <= 3 THEN array_to_string(ws, ' ')
            ELSE array_to_string(list_slice(ws, i, i+2), ' ') END AS s
          FROM words, unnest(CASE WHEN len(ws) <= 3 THEN [1]
            ELSE range(1, len(ws)-1) END) AS t(i)
        ), sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        inter AS (
          SELECT b.doc_id AS batch_id, c.doc_id AS corpus_id, count(*) AS i
          FROM sh b JOIN sh c ON b.s = c.s
            AND b.doc_id % 5 = 4 AND c.doc_id % 5 < 4
          GROUP BY 1, 2)
        SELECT batch_id, corpus_id,
          round(i / (sb.n + sc.n - i), 3) AS jaccard
        FROM inter
        JOIN sizes sb ON sb.doc_id = batch_id
        JOIN sizes sc ON sc.doc_id = corpus_id
        WHERE jaccard >= 0.4""")),

    // End-to-end near-dup purge: verified pairs → clusters → corpus
    // minus non-representative members. The oracle recomputes the whole
    // chain in SQL: brute-force Jaccard pairs, recursive-CTE closure,
    // NOT IN drop set.
    "q_dedup_purge" -> Entry(
      (s, dir) => Dedup.removeNearDups(
          t(s, dir, "documents"), "text", "doc_id")
        .select(col("doc_id")),
      Some(s"""WITH RECURSIVE $minhashPairsCtes,
        edges AS (
          SELECT id1 AS a, id2 AS b FROM pairs
          UNION SELECT id2, id1 FROM pairs),
        reach(id, r) AS (
          SELECT DISTINCT a, a FROM edges
          UNION
          SELECT e.a, r.r FROM edges e JOIN reach r ON r.id = e.b),
        dropped AS (
          SELECT id FROM (SELECT id, min(r) AS c FROM reach GROUP BY id)
          WHERE c <> id)
        SELECT doc_id FROM documents
        WHERE doc_id NOT IN (SELECT id FROM dropped)""")),

    // Near-dup purge with the keep-LONGEST policy: within each
    // cluster, the doc with the most tokens survives (tie: lowest id)
    // — the curation policy, vs q_dedup_purge's arbitrary min-id
    // representative. Oracle: same recursive components, then a
    // (p DESC, id ASC) window picks the keeper.
    "q_dedup_purge_best" -> Entry(
      (s, dir) => Dedup.removeNearDupsKeepBest(
          t(s, dir, "documents"), "text", "doc_id",
          graft.functions.Text.token_count(col("text")))
        .select(col("doc_id")),
      Some(s"""WITH RECURSIVE $minhashPairsCtes,
        edges AS (
          SELECT id1 AS a, id2 AS b FROM pairs
          UNION SELECT id2, id1 FROM pairs),
        reach(id, r) AS (
          SELECT DISTINCT a, a FROM edges
          UNION
          SELECT e.a, r.r FROM edges e JOIN reach r ON r.id = e.b),
        comp AS (SELECT id, min(r) AS c FROM reach GROUP BY id),
        prio AS (
          SELECT co.id, co.c,
            len(regexp_split_to_array(trim(d.text), '\\s+')) AS p
          FROM comp co JOIN documents d ON d.doc_id = co.id),
        keep AS (
          SELECT c, id AS keep_id FROM (
            SELECT c, id, row_number() OVER (
              PARTITION BY c ORDER BY p DESC, id ASC) AS rn
            FROM prio) WHERE rn = 1),
        dropped AS (
          SELECT pr.id FROM prio pr JOIN keep k USING (c)
          WHERE pr.id <> k.keep_id)
        SELECT doc_id FROM documents
        WHERE doc_id NOT IN (SELECT id FROM dropped)""")),

    // SimHash 64-bit signatures + near-dup pairs by Hamming ≤ 6 within
    // LSH candidate set.
    // SimHash near-dups on the md5-prefix basis (r9: converted from
    // rows-only to STRICT oracle): the 60-bit signature, its 4×15-bit
    // banding, the ≤1000 bucket cap and the Hamming verify all replay
    // in DuckDB — the oracle recomputes every per-bit vote sum from
    // md5(token) prefixes, so the compare covers the hash arithmetic
    // itself, not just the output shape. One exchange: signatures ride
    // the band rows into the bucket groupBy (no sig-table join-back).
    "q_dedup_simhash" -> Entry(
      (s, dir) => Dedup.simhashNearDups(
        t(s, dir, "documents"), "doc_id", "text",
        maxHamming = 3, bands = 4, maxBucket = 1000),
      Some {
        // bit j of the signature = 1 iff the per-bit ±1 vote sum over
        // md5Prefix60(token) is strictly positive — 60 generated terms
        val sigTerms = (0 until 60).map(j =>
          s"(CASE WHEN sum(((h >> $j) & 1) * 2 - 1) > 0 THEN ${1L << j} ELSE 0 END)")
          .mkString(" + ")
        s"""WITH words AS (
          SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS w
          FROM documents
        ), h AS (
          SELECT doc_id, ('0x' || substr(md5(w), 1, 15))::BIGINT AS h FROM words
        ), sig AS (
          SELECT doc_id, $sigTerms AS sig FROM h GROUP BY doc_id
        ), bands AS (
          SELECT doc_id, sig, j AS band, (sig >> (15 * j)) & 32767 AS bh
          FROM sig, unnest(range(0, 4)) AS t(j)
        ), sz AS (
          SELECT band, bh, count(*) AS n FROM bands GROUP BY 1, 2
        )
        SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2,
          bit_count(xor(a.sig, b.sig))::INT AS hamming
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
        JOIN sz ON sz.band = a.band AND sz.bh = a.bh
        WHERE sz.n <= 1000 AND bit_count(xor(a.sig, b.sig)) <= 3"""
      }),

    // Embedding near-duplicates: multi-band hyperplane LSH candidates
    // (bucket-capped, mirroring MinHash banding — recall comes from
    // more bands, not from a single small key whose buckets go
    // quadratic) verified by exact cosine ≥ threshold (0.3 ≈ p99 of
    // this synthetic corpus — real corpora with true dups use 0.95+).
    // r10: md5-prefix sign basis — the 6×6 banding, bucket cap, and
    // the exact-cosine verify all replay in DuckDB, so the embedding
    // near-dup pipeline faces the strict oracle (the candidate recall
    // stays approximate by construction, as with any LSH).
    "q_dedup_embedding" -> Entry(
      (s, dir) => {
        val em = t(s, dir, "embeddings")
        Dedup.embeddingNearDups(em, "vec_id", "embedding", 0.3,
            bands = 6, bitsPerBand = 6, md5Basis = true)
          .select(col("id1"), col("id2"), round(col("sim"), 3).as("sim"))
      },
      Some("""WITH planes AS (SELECT unnest(range(36)) AS p),
        dims AS (SELECT unnest(range(
          (SELECT len(embedding) FROM embeddings LIMIT 1))) AS d),
        signs AS (
          SELECT p, list(CASE WHEN
              ('0x'||substr(md5(p||':'||d),1,15))::BIGINT & 1 = 1
            THEN 1.0 ELSE -1.0 END ORDER BY d) AS sv
          FROM planes CROSS JOIN dims GROUP BY p),
        keys AS (
          SELECT e.vec_id, p.p // 6 AS band,
            sum(CASE WHEN list_reduce(
                list_transform(CAST(e.embedding AS DOUBLE[]),
                  (x, i) -> x * s.sv[i]),
                (a, b) -> a + b) > 0
              THEN (1::BIGINT << (p.p % 6)) ELSE 0 END)::BIGINT
              AS band_hash
          FROM embeddings e CROSS JOIN planes p
          JOIN signs s ON s.p = p.p GROUP BY e.vec_id, p.p // 6),
        eligible AS (SELECT band, band_hash FROM keys
          GROUP BY band, band_hash HAVING count(*) BETWEEN 2 AND 1000),
        pairs AS (
          SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2
          FROM keys a
          JOIN eligible el ON el.band = a.band
            AND el.band_hash = a.band_hash
          JOIN keys b ON a.band = b.band AND a.band_hash = b.band_hash
            AND a.vec_id < b.vec_id)
        SELECT id1, id2, round(sim, 3) AS sim FROM (
          SELECT p.id1, p.id2,
            list_cosine_similarity(CAST(c1.embedding AS DOUBLE[]),
              CAST(c2.embedding AS DOUBLE[])) AS sim
          FROM pairs p
          JOIN embeddings c1 ON c1.vec_id = p.id1
          JOIN embeddings c2 ON c2.vec_id = p.id2)
        WHERE sim >= 0.3""")),

    // Incremental exact dedup: a simulated arriving crawl slice (new
    // docs ∪ re-crawled corpus docs under fresh ids) deduped against
    // the corpus fingerprint INDEX — the shape where the corpus is
    // never rescanned per batch. The re-crawls must all drop; the
    // within-batch window keeps first occurrences.
    "q_dedup_incremental" -> Entry(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val corpus = docs.filter(col("doc_id") % 5 < 4)
        val batch = docs.filter(col("doc_id") % 5 === 4)
          .select(col("doc_id"), col("text"))
          .unionByName(corpus.filter(col("doc_id") % 7 === 0)
            .select((col("doc_id") + 100000).as("doc_id"), col("text")))
        Dedup.dedupAgainst(corpus, batch, "text", "doc_id")
          .select(col("doc_id"))
      },
      Some("""WITH corpus AS (
          SELECT * FROM documents WHERE doc_id % 5 < 4),
        batch AS (
          SELECT doc_id, text FROM documents WHERE doc_id % 5 = 4
          UNION ALL
          SELECT doc_id + 100000 AS doc_id, text FROM corpus
          WHERE doc_id % 7 = 0),
        bfp AS (
          SELECT doc_id,
            sha256(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
          FROM batch),
        cfp AS (
          SELECT DISTINCT
            sha256(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
          FROM corpus),
        first AS (
          SELECT doc_id, fp FROM (
            SELECT doc_id, fp,
              row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
            FROM bfp) WHERE rn = 1)
        SELECT doc_id FROM first
        WHERE fp NOT IN (SELECT fp FROM cfp)""")),

    // The same incremental dedup through the bloom-sidecar path: batch
    // rows whose fingerprint misses the index's Bloom sketch are
    // DEFINITELY new and bypass the anti-join map-only; accepted rows
    // go through the exact anti-join. Row-identical — same oracle.
    "q_dedup_incremental_bloom" -> Entry(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val corpus = docs.filter(col("doc_id") % 5 < 4)
        val batch = docs.filter(col("doc_id") % 5 === 4)
          .select(col("doc_id"), col("text"))
          .unionByName(corpus.filter(col("doc_id") % 7 === 0)
            .select((col("doc_id") + 100000).as("doc_id"), col("text")))
        // The real pipeline reads a PERSISTED index (built once by the
        // batch job) for both the sketch and the anti-join. r16
        // modeled that with a session cache, which under the honest
        // bench contract re-ran the full sha-256 + distinct + bloom
        // chain per timed run; r17 stages the index on DISK with the
        // bloom sidecar next to it — exactly indexBloom's documented
        // 100 TB shape and the q_dedup_incr_near/emb fixture model
        // (the query times the per-batch probe). Bloom bytes write
        // before the parquet whose _SUCCESS is the staleness marker.
        val idxPath = ensureStaged(s, dir, "fpidx_sha256", "fp",
          "documents") { pp =>
          val idx = Dedup.fingerprintIndex(corpus, "text")
          // expectedItems: corpus row count is an upper bound on
          // distinct fingerprints and costs one doc_id-column scan
          // where the default (idx.count()) would run the full build
          val bloom = Dedup.indexBloom(idx,
            expectedItems = corpus.count())
          java.nio.file.Files.createDirectories(
            java.nio.file.Paths.get(pp))
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$pp/bloom.bin"), bloom)
          idx.write.mode("overwrite").parquet(s"$pp/fp")
        }
        val index = s.read.parquet(s"$idxPath/fp")
        val bloom = java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(s"$idxPath/bloom.bin"))
        Dedup.dedupAgainstIndexBloom(batch, index, "text", "doc_id",
            bloom)
          .select(col("doc_id"))
      },
      Some("""WITH corpus AS (
          SELECT * FROM documents WHERE doc_id % 5 < 4),
        batch AS (
          SELECT doc_id, text FROM documents WHERE doc_id % 5 = 4
          UNION ALL
          SELECT doc_id + 100000 AS doc_id, text FROM corpus
          WHERE doc_id % 7 = 0),
        bfp AS (
          SELECT doc_id,
            sha256(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
          FROM batch),
        cfp AS (
          SELECT DISTINCT
            sha256(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
          FROM corpus),
        first AS (
          SELECT doc_id, fp FROM (
            SELECT doc_id, fp,
              row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
            FROM bfp) WHERE rn = 1)
        SELECT doc_id FROM first
        WHERE fp NOT IN (SELECT fp FROM cfp)""")),

    // Duplicated-substring span detection (word 4-grams occurring ≥2
    // times corpus-wide, merged to maximal per-document spans) vs the
    // oracle's unnest+gaps-and-islands. Spark groups 8-byte gram
    // hashes; the oracle groups gram strings — identical up to 64-bit
    // collisions (~10⁻¹¹ here).
    "q_dedup_spans" -> Entry(
      (s, dir) => Corpus.duplicatedSpans(
        t(s, dir, "documents"), "text", "doc_id", n = 4),
      Some("""WITH words AS (
          SELECT doc_id, string_split(
            regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS ws
          FROM documents),
        grams AS (
          SELECT doc_id, u.p AS p,
            array_to_string(ws[u.p+1 : u.p+4], ' ') AS g
          FROM words, UNNEST(range(0, greatest(len(ws)-3, 0))) AS u(p)),
        dup AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
        marked AS (
          SELECT doc_id, p FROM grams WHERE g IN (SELECT g FROM dup)),
        heads AS (
          SELECT doc_id, p,
            CASE WHEN coalesce(p - lag(p) OVER
              (PARTITION BY doc_id ORDER BY p), 5) > 4 THEN 1 ELSE 0 END
              AS h
          FROM marked),
        isl AS (
          SELECT doc_id, p, sum(h) OVER
            (PARTITION BY doc_id ORDER BY p) AS i
          FROM heads)
        SELECT doc_id, min(p) AS span_start, max(p) + 3 AS span_end,
          count(*) AS n_windows
        FROM isl GROUP BY doc_id, i""")),

    // SemDeDup-style semantic near-dup pairs: k-means cells (driver
    // Lloyd quantizer) + within-cell exact cosine ≥ threshold.
    // Approximate by construction (pairs straddling cells are missed)
    // — but DETERMINISTIC given the quantizer, so r12 upgrades it to a
    // STRICT oracle against the persisted nlist=8 cells (ivfReplayCtes
    // assignment + the maxCell cap + within-cell cosine, the
    // q_dedup_embedding cosine-replay precedent); only the k-means fit
    // stays outside. DedupSpec pins precision (= exact, by the cosine
    // verify) and recall vs the brute-force pair set.
    "q_dedup_semantic" -> Entry(
      (s, dir) => {
        val idxPath = ensureIvfIndex(s, dir)
        Dedup.semanticNearDups(
            t(s, dir, "embeddings"), "vec_id", "embedding", 0.3, nlist = 8,
            centroids = Some(Similarity.readCentroids(s, idxPath)))
          .select(col("id1"), col("id2"), round(col("sim"), 3).as("sim"))
      },
      Some(s"""WITH $ivfReplayCtes,
        ok AS (SELECT cell FROM assigned
          GROUP BY cell HAVING count(*) <= 10000),
        a AS (
          SELECT s.vec_id, s.cell, e.embedding
          FROM assigned s JOIN ok USING (cell)
          JOIN embeddings e ON e.vec_id = s.vec_id)
        SELECT id1, id2, round(sim, 3) AS sim FROM (
          SELECT l.vec_id AS id1, r.vec_id AS id2,
            list_cosine_similarity(CAST(l.embedding AS DOUBLE[]),
              CAST(r.embedding AS DOUBLE[])) AS sim
          FROM a l JOIN a r ON l.cell = r.cell AND l.vec_id < r.vec_id)
        WHERE sim >= 0.3""")),

    // ---- similarity search ------------------------------------------
    // Brute-force cosine top-k (correctness baseline; queries broadcast).
    "q_sim_bruteforce" -> Entry(
      (s, dir) => {
        val em = t(s, dir, "embeddings")
        val queries = em.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        Similarity.bruteForceTopK(em, queries, 10)
          .select(col("qid"), col("rank").as("rnk"), col("vec_id"))
      },
      Some("""SELECT qid, rnk, vec_id FROM (
        SELECT q.vec_id AS qid, c.vec_id AS vec_id,
          row_number() OVER (PARTITION BY q.vec_id
            ORDER BY list_cosine_similarity(
              cast(c.embedding as double[]),
              cast(q.embedding as double[])) DESC, c.vec_id) AS rnk
        FROM embeddings c JOIN embeddings q
          ON q.vec_id < 5 AND c.vec_id <> q.vec_id)
        WHERE rnk <= 10""")),

    // Range (interval) join: events banded into value tiers via a
    // broadcast interval dimension — the non-equi join shape (the
    // version-range semantics of the reference are strings, but the
    // training-pipeline analog is a real range join). The 3-row dim
    // broadcasts; the fact side never shuffles for the join.
    "q_join_range" -> Entry(
      (s, dir) => {
        val e = t(s, dir, "events")
        val tiers = s.createDataFrame(Seq(
          ("low", 0.0, 50.0), ("mid", 50.0, 150.0), ("high", 150.0, 1e9)))
          .toDF("tier", "lo", "hi")
        e.join(broadcast(tiers),
            col("value") >= col("lo") && col("value") < col("hi"))
          .groupBy(col("tier"))
          .agg(count(lit(1)).as("n"), moneySum(col("value")).as("total"))
      },
      Some(s"""SELECT tier, count(*) AS n, ${sqlMoneySum("value")} AS total
        FROM events JOIN (
          SELECT 'low' AS tier, 0.0 AS lo, 50.0 AS hi UNION ALL
          SELECT 'mid', 50.0, 150.0 UNION ALL
          SELECT 'high', 150.0, 1e9) t
        ON value >= lo AND value < hi
        GROUP BY tier""")),

    // As-of join: each event joined to the latest signup at-or-before its
    // time by the same user. Spark lacks a native as-of join; the
    // composition (preference (a) of the custom-operator ladder) is a
    // conditional last-non-null over an ordered window — one shuffle on
    // user_id, no range join. The oracle is DuckDB's NATIVE ASOF JOIN,
    // so the composed operator is checked against a real implementation.
    "q_asof_last_signup" -> Entry(
      (s, dir) => {
        val e = t(s, dir, "events")
        // signups sort BEFORE other events at the same timestamp: ASOF
        // e.ts >= s.ts includes a same-ts signup regardless of
        // event_id, so a (ts, event_id)-only order would exclude a
        // same-ts signup with a larger id from the frame (latent on
        // current testdata — no same-user duplicate ts — armed by any
        // regen at coarser time granularity)
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"),
            when(col("event_type") === "signup", 0).otherwise(1),
            col("event_id"))
          .rowsBetween(Window.unboundedPreceding, 0)
        e.withColumn("signup_ts",
          last(when(col("event_type") === "signup", col("ts")),
            ignoreNulls = true).over(w))
          .select(col("event_id"), col("user_id"),
            unix_timestamp(col("signup_ts")).as("last_signup_epoch"))
      },
      Some("""SELECT e.event_id, e.user_id,
        cast(floor(epoch(cast(s.ts as timestamp))) as bigint)
          AS last_signup_epoch
        FROM events e
        ASOF LEFT JOIN (SELECT user_id, ts FROM events
          WHERE event_type = 'signup') s
        ON e.user_id = s.user_id AND e.ts >= s.ts""")),

    // Gaps-and-islands sessionization: 30-minute inactivity gap starts a
    // new session — the deterministic batch expression of session
    // windows (both engines compute the identical window chain).
    "q_stream_sessionize" -> Entry(
      (s, dir) => {
        val e = t(s, dir, "events")
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val newSession = when(
          unix_timestamp(col("ts")) -
            unix_timestamp(lag(col("ts"), 1).over(w)) > 1800, 1)
          .otherwise(0)
        val withSess = e
          .withColumn("new_s", coalesce(newSession, lit(0)))
          .withColumn("session_no",
            sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        // Every output column is integer-typed: DuckDB's windowed
        // sum() yields HUGEINT (stringifies as float through pandas)
        // and money doubles stringify engine-dependently — both were
        // hash-mismatch classes in the driver's strict compare even
        // though value-tolerant local checks passed.
        withSess.groupBy(col("user_id"),
            col("session_no").cast("long").as("session_no"))
          .agg(count(lit(1)).as("n_events"),
            sum(cents(col("value"))).as("session_cents"))
      },
      Some("""WITH g AS (
          SELECT user_id, value,
            CASE WHEN cast(floor(epoch(cast(ts as timestamp))) as bigint) -
              cast(floor(epoch(cast(lag(ts,1) OVER w as timestamp))) as bigint)
              > 1800 THEN 1 ELSE 0 END AS new_s,
            ts, event_id
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        s AS (
          SELECT user_id, value,
            cast(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as bigint)
              AS session_no
          FROM g)
        SELECT user_id, session_no, count(*) AS n_events,
          cast(sum(cast(floor((value)*100 + 0.5) as bigint)) as bigint)
            AS session_cents
        FROM s GROUP BY user_id, session_no""")),

    // Multimodal: binary media columns → partition-batch feature
    // extraction (REAL image + audio codecs via the JDK; video stub —
    // see operators/Multimodal).
    // Rows-only: the feature math is pinned in MultimodalSpec.
    "q_multimodal_features" -> Entry(
      (s, dir) => {
        import graft.operators.Multimodal
        // media staged to parquet once, mtime-guarded (the
        // q_dedup_incr_emb pattern): the query times the decode/probe
        // OPERATOR over binary columns — the shape a real corpus has —
        // not the per-row PNG/WAV/MP4 synthesis that fakes one up.
        // md5-keyed via Q.stagingDir (collision rationale there); the
        // synthesis-format generation lives next to the synthesis code
        val p = ensureStaged(s, dir,
          s"media_g${Multimodal.mediaGeneration}", "", "documents")(pp =>
          Multimodal.syntheticMedia(s, dir)
            .write.mode("overwrite").parquet(pp))
        // r16: RawVideoDecoder registered — uncompressed-YUV rows get
        // real frame-grade features through the seam instead of the stub.
        // Q.spread: the staged media parquet is a handful of small
        // files, so the decode mapPartitions otherwise runs as ONE
        // task (measured 0.88 s of the query's 1.16 s wall)
        val feats = Multimodal.extractFeatures(
          Q.spread(s.read.parquet(p)),
          decoders = Seq(Multimodal.RawVideoDecoder,
              graft.operators.Mpeg1.Decoder))
        feats.groupBy(col("kind"))
          .agg(count(lit(1)).as("n"),
            sum(col("n_bytes")).as("total_bytes"))
      },
      None),

    // Video frame-sample + decode over the staged media table: every
    // 2nd frame of each decodable video decodes through the SAME image
    // kernel as still images (real container walk + real codec, bare
    // JDK) — the video half of the decode/feature-extract/frame-sample
    // trio, end-to-end real for all three JDK-decodable sample streams
    // (MJPEG-AVI, rawvideo-AVI, and r14's JPEG-in-BMFF via the sample
    // tables); plain-BMFF rows (DCT codecs, no JDK codec) contribute
    // no rows by contract. Rows-only — no video surface in DuckDB;
    // MultimodalSpec pins frame counts, sampling indices, dims, and
    // codec fallbacks.
    "q_multimodal_video_frames" -> Entry(
      (s, dir) => {
        import graft.operators.Multimodal
        val p = ensureStaged(s, dir,
          s"media_g${Multimodal.mediaGeneration}", "", "documents")(pp =>
          Multimodal.syntheticMedia(s, dir)
            .write.mode("overwrite").parquet(pp))
        // n_videos (distinct decodable sources), not count(feature):
        // videoFrames only emits rows whose frame DID decode, so a
        // per-row feature count is tautologically n_sampled — the real
        // codec-coverage audit compares n_videos against the input's
        // video-row count (plain-BMFF DCT rows contribute nothing by
        // contract; MOV Motion-JPEG rows decode and count since r14)
        // r16: the RawVideoDecoder seam decoder is registered, so the
        // uncompressed-YUV rows (YUY2/I420/UYVY) frame-decode here
        // alongside the built-in codecs — the seam dispatch runs at
        // bench scale, not just in specs
        Multimodal.videoFrames(
            s.read.parquet(p).filter(col("kind") === "video"), step = 2,
            decoders = Seq(Multimodal.RawVideoDecoder,
              graft.operators.Mpeg1.Decoder))
          .groupBy(col("n_frames"))
          .agg(count(lit(1)).as("n_sampled"),
            countDistinct(col("media_id")).as("n_videos"))
      },
      None),

    // Per-FRAME near-dup detection — video content flowing into the
    // image-dedup pipeline: every decodable frame (built-in MJPEG /
    // rawvideo / MOV Motion-JPEG rows AND the uncompressed-YUV rows
    // seam-decoded by RawVideoDecoder) hashes to a 64-bit dHash keyed
    // by the packed frame_id, then pairs through the SAME banding +
    // Hamming pipeline as still images. Consecutive frames of one
    // video are near-identical by construction, so the pairing has
    // real positives. STRICT oracle via the persisted-artifact move:
    // the staged (frame_id, phash) index is the replay surface —
    // DuckDB re-derives banding, bucket cap, canonical pairing and
    // the bit_count(xor) verify; only the pixel decode stays outside
    // (no video surface in DuckDB), its math pinned in MultimodalSpec.
    "q_multimodal_frame_dedup" -> Entry(
      (s, dir) => {
        import graft.operators.Multimodal
        val p = ensureStaged(s, dir,
          s"media_g${Multimodal.mediaGeneration}", "", "documents")(pp =>
          Multimodal.syntheticMedia(s, dir)
            .write.mode("overwrite").parquet(pp))
        val hp = ensureStaged(s, dir,
          s"frame_hashes_g${Multimodal.mediaGeneration}", "",
          "documents") { hpp =>
          Multimodal.videoFrameHashes(
              s.read.parquet(p).filter(col("kind") === "video"),
              decoders = Seq(Multimodal.RawVideoDecoder,
              graft.operators.Mpeg1.Decoder))
            .select(col("frame_id"), col("phash"))
            .write.mode("overwrite").parquet(hpp)
        }
        Multimodal.imageNearDupsFromHashes(
            s.read.parquet(hp), idCol = "frame_id", maxHamming = 7)
          .select(col("id1"), col("id2"), col("hamming"))
      },
      Some(s"""WITH h AS (
          SELECT frame_id, phash FROM read_parquet(
            '{STAGING:frame_hashes_g${
              graft.operators.Multimodal.mediaGeneration}}/*.parquet')
        ), bands AS (
          SELECT frame_id, b.band,
            (phash >> (CAST(b.band AS INTEGER) * 8)) & 255 AS band_hash
          FROM h, (SELECT unnest(range(8)) AS band) b
        ), bsz AS (
          SELECT band, band_hash, count(*) AS n
          FROM bands GROUP BY 1, 2
        ), cands AS (
          SELECT DISTINCT a.frame_id AS id1, b.frame_id AS id2
          FROM bands a
          JOIN bands b ON a.band = b.band AND a.band_hash = b.band_hash
            AND a.frame_id < b.frame_id
          JOIN bsz ON bsz.band = a.band AND bsz.band_hash = a.band_hash
          WHERE bsz.n BETWEEN 2 AND 1000)
        SELECT c.id1, c.id2,
          CAST(bit_count(xor(h1.phash, h2.phash)) AS INTEGER) AS hamming
        FROM cands c
        JOIN h h1 ON h1.frame_id = c.id1
        JOIN h h2 ON h2.frame_id = c.id2
        WHERE bit_count(xor(h1.phash, h2.phash)) <= 7""")),

    // Image near-dup detection over the staged media table: every
    // image gains a brightness-shifted PNG twin (a REAL different
    // payload), and the perceptual-dHash pipeline (hash → 8×8-bit
    // banding → Hamming verify; images never shuffle) must pair each
    // with its twin. r13: STRICT oracle via the persisted-artifact
    // move — the query already stages the decoded (media_id, phash)
    // index; DuckDB replays the 8×8-bit banding, the 2..maxBucket
    // bucket cap, the canonical id1<id2 pairing, and the
    // bit_count(xor) Hamming verify from those persisted hashes.
    // Only the JPEG/PNG decode stays outside (no image surface in
    // DuckDB); its invariance/selectivity laws live in MultimodalSpec.
    "q_multimodal_image_dedup" -> Entry(
      (s, dir) => {
        import graft.operators.Multimodal
        // same staged parquet as q_multimodal_features (synthesis is
        // not what this query times); twins staged alongside
        val p = ensureStaged(s, dir,
          s"media_g${Multimodal.mediaGeneration}", "", "documents")(pp =>
          Multimodal.syntheticMedia(s, dir)
            .write.mode("overwrite").parquet(pp))
        val tp = ensureStaged(s, dir,
          s"media_twins_g${Multimodal.mediaGeneration}", "",
          "documents") { tpp =>
          val shift =
            udf((b: Array[Byte]) => Multimodal.brightnessShift(b, 8))
          s.read.parquet(p).filter(col("kind") === "image")
            .select((col("media_id") + 1000000L).as("media_id"),
              shift(col("content")).as("content"))
            .write.mode("overwrite").parquet(tpp)
        }
        // stage the dHash index once (decode is the expensive half;
        // 16 bytes/image after) and pair from the index — the 100 TB
        // shape, and it keeps the bench free of persist(): the r8
        // driver log's `Asked to cache already cached data` warnings
        // were this entry's cache=true default re-pinning per run.
        val hp = ensureStaged(s, dir,
          s"media_hashes_g${Multimodal.mediaGeneration}", "",
          "documents") { hpp =>
          val images = s.read.parquet(p).filter(col("kind") === "image")
            .select(col("media_id"), col("content"))
          Multimodal.imageHashes(
              images.unionByName(s.read.parquet(tp)))
            .write.mode("overwrite").parquet(hpp)
        }
        Multimodal.imageNearDupsFromHashes(
            s.read.parquet(hp), maxHamming = 7)
          .select(col("id1"), col("id2"), col("hamming"))
      },
      Some(s"""WITH h AS (
          SELECT media_id, phash FROM read_parquet(
            '{STAGING:media_hashes_g${
              graft.operators.Multimodal.mediaGeneration}}/*.parquet')
        ), bands AS (
          SELECT media_id, b.band,
            (phash >> (CAST(b.band AS INTEGER) * 8)) & 255 AS band_hash
          FROM h, (SELECT unnest(range(8)) AS band) b
        ), bsz AS (
          SELECT band, band_hash, count(*) AS n
          FROM bands GROUP BY 1, 2
        ), cands AS (
          SELECT DISTINCT a.media_id AS id1, b.media_id AS id2
          FROM bands a
          JOIN bands b ON a.band = b.band AND a.band_hash = b.band_hash
            AND a.media_id < b.media_id
          JOIN bsz ON bsz.band = a.band AND bsz.band_hash = a.band_hash
          WHERE bsz.n BETWEEN 2 AND 1000)
        SELECT c.id1, c.id2,
          CAST(bit_count(xor(h1.phash, h2.phash)) AS INTEGER) AS hamming
        FROM cands c
        JOIN h h1 ON h1.media_id = c.id1
        JOIN h h2 ON h2.media_id = c.id2
        WHERE bit_count(xor(h1.phash, h2.phash)) <= 7""")),

    // LSH-bucketed ANN, multi-probe: 8-bit signature + Hamming-1 probes
    // — each query reranks ~9/256 of the corpus (falls with more bits)
    // instead of a fixed 1/16. r10: signatures on the md5-prefix sign
    // basis, so the WHOLE query (buckets, probes, rerank) replays in
    // the oracle — recall stays approximate by construction, the
    // computation is exact.
    "q_sim_lsh" -> Entry(
      (s, dir) => {
        val em = t(s, dir, "embeddings")
        val queries = em.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        Similarity.lshTopK(em, queries, 10, bits = 8, probeHamming = 1,
          md5Basis = true)
          .select(col("qid"), col("rank").as("rnk"), col("vec_id"))
      },
      Some("""WITH planes AS (SELECT unnest(range(8)) AS p),
        dims AS (SELECT unnest(range(
          (SELECT len(embedding) FROM embeddings LIMIT 1))) AS d),
        signs AS (
          SELECT p, list(CASE WHEN
              ('0x'||substr(md5(p||':'||d),1,15))::BIGINT & 1 = 1
            THEN 1.0 ELSE -1.0 END ORDER BY d) AS sv
          FROM planes CROSS JOIN dims GROUP BY p),
        sigs AS (
          SELECT e.vec_id,
            sum(CASE WHEN list_reduce(
                list_transform(CAST(e.embedding AS DOUBLE[]),
                  (x, i) -> x * s.sv[i]),
                (a, b) -> a + b) > 0
              THEN (1::BIGINT << p.p) ELSE 0 END)::BIGINT AS sig
          FROM embeddings e CROSS JOIN planes p
          JOIN signs s ON s.p = p.p GROUP BY e.vec_id),
        probes AS (
          SELECT vec_id AS qid, sig FROM sigs WHERE vec_id < 5
          UNION ALL
          SELECT s.vec_id, xor(s.sig, (1::BIGINT << p.p))
          FROM sigs s CROSS JOIN planes p WHERE s.vec_id < 5),
        pairs AS (
          SELECT DISTINCT pr.qid, s.vec_id
          FROM probes pr JOIN sigs s ON s.sig = pr.sig
          WHERE s.vec_id <> pr.qid)
        SELECT qid, rnk, vec_id FROM (
          SELECT p.qid, p.vec_id,
            row_number() OVER (PARTITION BY p.qid
              ORDER BY list_cosine_similarity(
                CAST(c.embedding AS DOUBLE[]),
                CAST(q.embedding AS DOUBLE[])) DESC, p.vec_id) AS rnk
          FROM pairs p
          JOIN embeddings c ON c.vec_id = p.vec_id
          JOIN embeddings q ON q.vec_id = p.qid)
        WHERE rnk <= 10""")),

    // Corpus-wide kNN self-join (SemDeDup-style curation primitive):
    // every vector's top-3 cosine neighbors. Exact all-pairs form —
    // the correctness baseline the LSH variant is specced against.
    "q_sim_knn" -> Entry(
      (s, dir) => Similarity.knnJoinExact(t(s, dir, "embeddings"), 3)
        .select(col("qid"), col("rank").as("rnk"), col("vec_id")),
      Some("""SELECT qid, rnk, vec_id FROM (
        SELECT q.vec_id AS qid, c.vec_id AS vec_id,
          row_number() OVER (PARTITION BY q.vec_id
            ORDER BY list_cosine_similarity(
              cast(c.embedding as double[]),
              cast(q.embedding as double[])) DESC, c.vec_id) AS rnk
        FROM embeddings c JOIN embeddings q ON c.vec_id <> q.vec_id)
        WHERE rnk <= 3""")),

    // The banded-LSH kNN path: candidates from one kernel pass
    // (bucket-capped — never all-pairs), exact cosine on candidates,
    // per-id top-k under the exchange. r10: md5-prefix sign basis makes
    // bands, buckets, cap and rerank all oracle-replayable — recall vs
    // exact kNN stays pinned in ScaleOpsSpec, the computation itself is
    // now strict.
    "q_sim_knn_lsh" -> Entry(
      (s, dir) => Similarity.knnJoinLsh(t(s, dir, "embeddings"), 3,
          md5Basis = true)
        .select(col("qid"), col("rank").as("rnk"), col("vec_id")),
      Some("""WITH planes AS (SELECT unnest(range(144)) AS p),
        dims AS (SELECT unnest(range(
          (SELECT len(embedding) FROM embeddings LIMIT 1))) AS d),
        signs AS (
          SELECT p, list(CASE WHEN
              ('0x'||substr(md5(p||':'||d),1,15))::BIGINT & 1 = 1
            THEN 1.0 ELSE -1.0 END ORDER BY d) AS sv
          FROM planes CROSS JOIN dims GROUP BY p),
        keys AS (
          SELECT e.vec_id, p.p // 6 AS band,
            sum(CASE WHEN list_reduce(
                list_transform(CAST(e.embedding AS DOUBLE[]),
                  (x, i) -> x * s.sv[i]),
                (a, b) -> a + b) > 0
              THEN (1::BIGINT << (p.p % 6)) ELSE 0 END)::BIGINT
              AS band_hash
          FROM embeddings e CROSS JOIN planes p
          JOIN signs s ON s.p = p.p GROUP BY e.vec_id, p.p // 6),
        eligible AS (SELECT band, band_hash FROM keys
          GROUP BY band, band_hash HAVING count(*) BETWEEN 2 AND 1000),
        pairs AS (
          SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2
          FROM keys a
          JOIN eligible el ON el.band = a.band
            AND el.band_hash = a.band_hash
          JOIN keys b ON a.band = b.band AND a.band_hash = b.band_hash
            AND a.vec_id < b.vec_id),
        sym AS (
          SELECT id1 AS qid, id2 AS vec_id FROM pairs
          UNION ALL SELECT id2, id1 FROM pairs)
        SELECT qid, rnk, vec_id FROM (
          SELECT s.qid, s.vec_id,
            row_number() OVER (PARTITION BY s.qid
              ORDER BY list_cosine_similarity(
                CAST(c.embedding AS DOUBLE[]),
                CAST(q.embedding AS DOUBLE[])) DESC, s.vec_id) AS rnk
          FROM sym s
          JOIN embeddings c ON c.vec_id = s.vec_id
          JOIN embeddings q ON q.vec_id = s.qid)
        WHERE rnk <= 3""")),

    // The linear-cost kNN path (cell-equi-join IVF, nlist ∝ corpus,
    // cost/vector ≈ nprobe·cell) — the one that survives 100 TB;
    // SCALE.md's knn drill measures all three variants head-to-head.
    // r12: the quantizer comes from the PERSISTED index sidecar (the
    // production shape — train once, every probe replays those cells),
    // which makes the whole query a deterministic function of the
    // persisted floats: the oracle recomputes home-cell assignment,
    // nprobe probes, and the within-cell rerank from the same parquet.
    // Only the k-means FIT stays out of the oracle (float-iterative).
    "q_sim_knn_ivf" -> Entry(
      (s, dir) => Similarity.knnJoinIvf(t(s, dir, "embeddings"), 3,
          nlist = 8, nprobe = 4,
          centroids =
            Some(Similarity.readCentroids(s, ensureIvfIndex(s, dir))))
        .select(col("qid"), col("rank").as("rnk"), col("vec_id")),
      Some(s"""WITH $ivfReplayCtes,
        probed AS (
          SELECT qid, cell FROM (
            SELECT e.vec_id AS qid, c.cell,
              row_number() OVER (PARTITION BY e.vec_id ORDER BY
                list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                  CAST(c.centroid AS DOUBLE[])) DESC, c.cell) AS pr
            FROM embeddings e CROSS JOIN cents c)
          WHERE pr <= 4)
        SELECT qid, rnk, vec_id FROM (
          SELECT p.qid, a.vec_id,
            row_number() OVER (PARTITION BY p.qid ORDER BY
              list_cosine_similarity(CAST(ce.embedding AS DOUBLE[]),
                CAST(qe.embedding AS DOUBLE[])) DESC, a.vec_id) AS rnk
          FROM assigned a
          JOIN probed p ON a.cell = p.cell
          JOIN embeddings ce ON ce.vec_id = a.vec_id
          JOIN embeddings qe ON qe.vec_id = p.qid
          WHERE a.vec_id <> p.qid)
        WHERE rnk <= 3""")),

    // IVF ANN (coarse k-means cells + nprobe rerank): the partition-
    // pruning scale path. r12: strict oracle — DuckDB reads the
    // persisted centroid sidecar and replays assignment + probes +
    // rerank (the r10 md5-basis move, applied to the persisted-model
    // family); recall vs brute force stays pinned in ScaleOpsSpec.
    "q_sim_ivf" -> Entry(
      (s, dir) => {
        val em = t(s, dir, "embeddings")
        val idxPath = ensureIvfIndex(s, dir)
        val queries = em.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        Similarity.ivfTopKFromIndex(s, idxPath, queries, 10, nprobe = 4)
          .select(col("qid"), col("rank").as("rnk"), col("vec_id"))
      },
      Some(s"""WITH $ivfReplayCtes,
        q AS (SELECT vec_id AS qid, embedding AS qvec
          FROM embeddings WHERE vec_id < 5),
        qcell AS (
          SELECT qid, cell FROM (
            SELECT q.qid, c.cell,
              row_number() OVER (PARTITION BY q.qid ORDER BY
                list_cosine_similarity(CAST(q.qvec AS DOUBLE[]),
                  CAST(c.centroid AS DOUBLE[])) DESC, c.cell) AS pr
            FROM q CROSS JOIN cents c)
          WHERE pr <= 4)
        SELECT qid, rnk, vec_id FROM (
          SELECT p.qid, a.vec_id,
            row_number() OVER (PARTITION BY p.qid ORDER BY
              list_cosine_similarity(CAST(ce.embedding AS DOUBLE[]),
                CAST(qe.embedding AS DOUBLE[])) DESC, a.vec_id) AS rnk
          FROM assigned a
          JOIN qcell p ON a.cell = p.cell
          JOIN embeddings ce ON ce.vec_id = a.vec_id
          JOIN embeddings qe ON qe.vec_id = p.qid
          WHERE a.vec_id <> p.qid)
        WHERE rnk <= 10""")),

    // The flat-compaction invariant under a STRICT oracle: the staged
    // flat IVF tree builds BUILD+APPEND+COMPACT, so every cell dir
    // must hold exactly ONE parquet file — the engine audits the tree
    // through the store's own file listing (and REQUIRES the
    // compacted invariant, so a compaction regression fails loudly at
    // build time), while DuckDB re-derives the same per-cell file
    // counts from the filenames of the rows it reads. Engine listing
    // ≡ external file reality, per cell.
    "q_sim_ivf_compact_audit" -> Entry(
      (s, dir) => {
        val idxPath = ensureIvfIndex(s, dir)
        val counts = Option(new java.io.File(s"$idxPath/index")
            .listFiles()).getOrElse(Array.empty)
          .filter(f => f.isDirectory && f.getName.startsWith("cell="))
          .map(d => (d.getName.stripPrefix("cell=").toInt,
            d.listFiles().count(f => f.isFile &&
              f.getName.endsWith(".parquet")).toLong))
          .sortBy(_._1).toSeq
        require(counts.nonEmpty && counts.forall(_._2 == 1L),
          s"q_sim_ivf_compact_audit: staged flat IVF tree at $idxPath " +
            s"is not compacted to one file per cell: $counts — " +
            "compactIvfIndex regressed or the staging recipe changed")
        import s.implicits._
        counts.toDF("cell", "n_files")
      },
      Some("""SELECT CAST(cell AS INT) AS cell,
          CAST(count(DISTINCT filename) AS BIGINT) AS n_files
        FROM read_parquet('{STAGING:ivf_n8_v3}/index/*/*.parquet',
          filename = true, hive_partitioning = true)
        GROUP BY cell""")),

    // Hierarchical (two-level) IVF ANN — the fit/assign/probe that
    // scales past the flat quantizer's driver-Lloyd + literal-fold
    // ceiling: k1 level-1 cells × k2 sub-centroids each, composed
    // cell = c1·k2 + c2, assignment/probe O(√nlist) per vector via
    // codegen kernels carrying the quantizer as a reference object
    // (FAISS inverted-multi-index shape). STRICT oracle: DuckDB reads
    // the persisted l1/quantizer sidecars and replays BOTH argmax
    // stages of the assignment, the beam-2 probe (top-2 level-1 cells,
    // then top-4 composed cells among their subs), and the exact-
    // cosine rerank — only the k-means fits stay outside. The 3×3
    // grid here is fixture-sized; CoarseSpec pins kernel laws and
    // `ScaleStress coarse` measures the fit at nlist ≥ 16k.
    "q_sim_ivf_hier" -> Entry(
      (s, dir) => {
        val idxPath = ensureIvfHierIndex(s, dir)
        val em = t(s, dir, "embeddings")
        val queries = em.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        Similarity.ivfHierTopKFromIndex(s, idxPath, queries, 10,
            nprobe = 4, beam = 2)
          .select(col("qid"), col("rank").as("rnk"), col("vec_id"))
      },
      Some("""WITH l1c AS (
          SELECT c1, CAST(centroid AS DOUBLE[]) AS c
          FROM read_parquet('{STAGING:ivfh_3x3_v4}/l1/*.parquet')
        ), l2c AS (
          SELECT c1, c1 * 3 + c2 AS cell, CAST(centroid AS DOUBLE[]) AS c
          FROM read_parquet('{STAGING:ivfh_3x3_v4}/quantizer/*.parquet')
        ), a1 AS (
          SELECT vec_id, c1 FROM (
            SELECT e.vec_id, l.c1,
              row_number() OVER (PARTITION BY e.vec_id ORDER BY
                list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                  l.c) DESC, l.c1) AS r
            FROM embeddings e CROSS JOIN l1c l)
          WHERE r = 1
        ), assigned AS (
          SELECT vec_id, cell FROM (
            SELECT a1.vec_id, s.cell,
              row_number() OVER (PARTITION BY a1.vec_id ORDER BY
                list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                  s.c) DESC, s.cell) AS r
            FROM a1 JOIN embeddings e USING (vec_id)
            JOIN l2c s ON s.c1 = a1.c1)
          WHERE r = 1
        ), q AS (
          SELECT vec_id AS qid, embedding FROM embeddings
          WHERE vec_id < 5
        ), qb AS (
          SELECT qid, c1 FROM (
            SELECT q.qid, l.c1,
              row_number() OVER (PARTITION BY q.qid ORDER BY
                list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                  l.c) DESC, l.c1) AS r
            FROM q CROSS JOIN l1c l)
          WHERE r <= 2
        ), qcell AS (
          SELECT qid, cell FROM (
            SELECT q.qid, s.cell,
              row_number() OVER (PARTITION BY q.qid ORDER BY
                list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                  s.c) DESC, s.cell) AS r
            FROM q JOIN qb ON qb.qid = q.qid
            JOIN l2c s ON s.c1 = qb.c1)
          WHERE r <= 4)
        SELECT qid, rnk, vec_id FROM (
          SELECT p.qid, a.vec_id,
            row_number() OVER (PARTITION BY p.qid ORDER BY
              list_cosine_similarity(CAST(ce.embedding AS DOUBLE[]),
                CAST(qe.embedding AS DOUBLE[])) DESC, a.vec_id) AS rnk
          FROM assigned a
          JOIN qcell p ON a.cell = p.cell
          JOIN embeddings ce ON ce.vec_id = a.vec_id
          JOIN embeddings qe ON qe.vec_id = p.qid
          WHERE a.vec_id <> p.qid)
        WHERE rnk <= 10""")),

    // The LAZY hierarchical probe under the SAME strict replay — the
    // probe shape for the regime past the broadcast carrier's ceiling
    // (nlist ~10⁶ at d≥1024, where shipping the whole l2 grid per
    // executor stops scaling): stage 1 beams on the √nlist-sized l1
    // through the real kernel, stage 2 scores ONLY the beam-opened
    // cells' sub-tables read relationally from the quantizer sidecar.
    // Lazy ≡ kernel is spec-pinned row-for-row (CoarseSpec); here the
    // lazy path additionally replays externally against DuckDB with
    // its own beam/nprobe/k so the two queries cannot mask each other.
    "q_sim_ivf_hier_lazy" -> Entry(
      (s, dir) => {
        val idxPath = ensureIvfHierIndex(s, dir)
        val em = t(s, dir, "embeddings")
        val queries = em.filter(col("vec_id") >= 5 && col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        Similarity.ivfHierTopKFromIndexLazy(s, idxPath, queries, 8,
            nprobe = 3, beam = 3)
          .select(col("qid"), col("rank").as("rnk"), col("vec_id"))
      },
      Some("""WITH l1c AS (
          SELECT c1, CAST(centroid AS DOUBLE[]) AS c
          FROM read_parquet('{STAGING:ivfh_3x3_v4}/l1/*.parquet')
        ), l2c AS (
          SELECT c1, c1 * 3 + c2 AS cell, CAST(centroid AS DOUBLE[]) AS c
          FROM read_parquet('{STAGING:ivfh_3x3_v4}/quantizer/*.parquet')
        ), a1 AS (
          SELECT vec_id, c1 FROM (
            SELECT e.vec_id, l.c1,
              row_number() OVER (PARTITION BY e.vec_id ORDER BY
                list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                  l.c) DESC, l.c1) AS r
            FROM embeddings e CROSS JOIN l1c l)
          WHERE r = 1
        ), assigned AS (
          SELECT vec_id, cell FROM (
            SELECT a1.vec_id, s.cell,
              row_number() OVER (PARTITION BY a1.vec_id ORDER BY
                list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                  s.c) DESC, s.cell) AS r
            FROM a1 JOIN embeddings e USING (vec_id)
            JOIN l2c s ON s.c1 = a1.c1)
          WHERE r = 1
        ), q AS (
          SELECT vec_id AS qid, embedding FROM embeddings
          WHERE vec_id >= 5 AND vec_id < 10
        ), qb AS (
          SELECT qid, c1 FROM (
            SELECT q.qid, l.c1,
              row_number() OVER (PARTITION BY q.qid ORDER BY
                list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                  l.c) DESC, l.c1) AS r
            FROM q CROSS JOIN l1c l)
          WHERE r <= 3
        ), qcell AS (
          SELECT qid, cell FROM (
            SELECT q.qid, s.cell,
              row_number() OVER (PARTITION BY q.qid ORDER BY
                list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                  s.c) DESC, s.cell) AS r
            FROM q JOIN qb ON qb.qid = q.qid
            JOIN l2c s ON s.c1 = qb.c1)
          WHERE r <= 3)
        SELECT qid, rnk, vec_id FROM (
          SELECT p.qid, a.vec_id,
            row_number() OVER (PARTITION BY p.qid ORDER BY
              list_cosine_similarity(CAST(ce.embedding AS DOUBLE[]),
                CAST(qe.embedding AS DOUBLE[])) DESC, a.vec_id) AS rnk
          FROM assigned a
          JOIN qcell p ON a.cell = p.cell
          JOIN embeddings ce ON ce.vec_id = a.vec_id
          JOIN embeddings qe ON qe.vec_id = p.qid
          WHERE a.vec_id <> p.qid)
        WHERE rnk <= 8""")),

    // The ANN append path under a STRICT oracle: the staged hier tree
    // builds as BUILD(vec_id < 400) + APPEND(vec_id >= 400) with the
    // persisted quantizer, so the appended rows' cells are a pure
    // kernel function of the sidecars — DuckDB re-derives every
    // appended row's composed cell by the two-stage argmax replay,
    // the grouped dir from the meta's cells_per_group, and the append
    // log's n_rows, and all three must match the tree byte-for-byte.
    // This is the law appendIvfIndexHier ships on: append never
    // re-fits, so an external replayer can predict exactly where
    // every appended vector landed.
    "q_sim_hier_append_audit" -> Entry(
      (s, dir) => {
        val idxPath = ensureIvfHierIndex(s, dir)
        val idx = s.read.parquet(s"$idxPath/index")
          .filter(col("vec_id") >= 400)
          .select(col("vec_id"), col("cell"),
            col("cell_grp").cast("int").as("cell_grp"))
        val log = Similarity.readAppendLog(s, idxPath)
          .select(col("n_rows").as("batch_rows"))
        // the keyless broadcast join below is a deliberate one-row
        // carrier, correct ONLY while the staged tree has exactly one
        // append — a second append in a future fixture revision must
        // fail HERE, loudly, not silently multiply every audit row on
        // both the engine and oracle sides
        require(log.count() == 1L,
          s"q_sim_hier_append_audit: expected exactly 1 append-log row " +
            s"at $idxPath (the staged BUILD+APPEND recipe); the fixture " +
            "changed — rework the audit join to key on the append")
        idx.join(broadcast(log))
      },
      Some("""WITH l1c AS (
          SELECT c1, CAST(centroid AS DOUBLE[]) AS c
          FROM read_parquet('{STAGING:ivfh_3x3_v4}/l1/*.parquet')
        ), l2c AS (
          SELECT c1, c1 * 3 + c2 AS cell, CAST(centroid AS DOUBLE[]) AS c
          FROM read_parquet('{STAGING:ivfh_3x3_v4}/quantizer/*.parquet')
        ), batch AS (
          SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 400
        ), a1 AS (
          SELECT vec_id, c1 FROM (
            SELECT b.vec_id, l.c1,
              row_number() OVER (PARTITION BY b.vec_id ORDER BY
                list_cosine_similarity(CAST(b.embedding AS DOUBLE[]),
                  l.c) DESC, l.c1) AS r
            FROM batch b CROSS JOIN l1c l)
          WHERE r = 1
        ), assigned AS (
          SELECT vec_id, cell FROM (
            SELECT a1.vec_id, s.cell,
              row_number() OVER (PARTITION BY a1.vec_id ORDER BY
                list_cosine_similarity(CAST(b.embedding AS DOUBLE[]),
                  s.c) DESC, s.cell) AS r
            FROM a1 JOIN batch b USING (vec_id)
            JOIN l2c s ON s.c1 = a1.c1)
          WHERE r = 1
        ), cpg AS (
          SELECT cells_per_group
          FROM read_parquet('{STAGING:ivfh_3x3_v4}/meta/*.parquet')
        ), logrow AS (
          SELECT n_rows AS batch_rows
          FROM read_parquet('{STAGING:ivfh_3x3_v4}/appends/*.parquet'))
        SELECT a.vec_id, a.cell,
          CAST(floor(a.cell / cpg.cells_per_group) AS INT) AS cell_grp,
          logrow.batch_rows
        FROM assigned a, cpg, logrow""")),

    // Corpus kNN self-join through the hierarchical quantizer — the
    // self-join at the nlist ∝ n sizing the flat literal fold cannot
    // reach; the 3×3 grid here shares ensureIvfHierIndex's PERSISTED
    // quantizer, so the whole computation downstream of the k-means
    // fit replays. STRICT oracle: both argmax assignment stages, the
    // beam-2 probes for EVERY vector, the cell equi-join and the
    // cosine rerank all recomputed by DuckDB from the sidecar floats.
    "q_sim_knn_ivf_hier" -> Entry(
      (s, dir) => {
        val idxPath = ensureIvfHierIndex(s, dir)
        val cq = Similarity.readCoarseQuantizer(s, idxPath)
        Similarity.knnJoinIvfHier(t(s, dir, "embeddings"), 3,
            nlist = 9, nprobe = 3, beam = 2, quantizer = Some(cq))
          .select(col("qid"), col("rank").as("rnk"), col("vec_id"))
      },
      Some("""WITH l1c AS (
          SELECT c1, CAST(centroid AS DOUBLE[]) AS c
          FROM read_parquet('{STAGING:ivfh_3x3_v4}/l1/*.parquet')
        ), l2c AS (
          SELECT c1, c1 * 3 + c2 AS cell, CAST(centroid AS DOUBLE[]) AS c
          FROM read_parquet('{STAGING:ivfh_3x3_v4}/quantizer/*.parquet')
        ), a1 AS (
          SELECT vec_id, c1 FROM (
            SELECT e.vec_id, l.c1,
              row_number() OVER (PARTITION BY e.vec_id ORDER BY
                list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                  l.c) DESC, l.c1) AS r
            FROM embeddings e CROSS JOIN l1c l)
          WHERE r = 1
        ), assigned AS (
          SELECT vec_id, cell FROM (
            SELECT a1.vec_id, s.cell,
              row_number() OVER (PARTITION BY a1.vec_id ORDER BY
                list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                  s.c) DESC, s.cell) AS r
            FROM a1 JOIN embeddings e USING (vec_id)
            JOIN l2c s ON s.c1 = a1.c1)
          WHERE r = 1
        ), qb AS (
          SELECT vec_id AS qid, c1 FROM (
            SELECT e.vec_id, l.c1,
              row_number() OVER (PARTITION BY e.vec_id ORDER BY
                list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                  l.c) DESC, l.c1) AS r
            FROM embeddings e CROSS JOIN l1c l)
          WHERE r <= 2
        ), qcell AS (
          SELECT qid, cell FROM (
            SELECT qb.qid, s.cell,
              row_number() OVER (PARTITION BY qb.qid ORDER BY
                list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                  s.c) DESC, s.cell) AS r
            FROM qb JOIN embeddings e ON e.vec_id = qb.qid
            JOIN l2c s ON s.c1 = qb.c1)
          WHERE r <= 3)
        SELECT qid, rnk, vec_id FROM (
          SELECT p.qid, a.vec_id,
            row_number() OVER (PARTITION BY p.qid ORDER BY
              list_cosine_similarity(CAST(ce.embedding AS DOUBLE[]),
                CAST(qe.embedding AS DOUBLE[])) DESC, a.vec_id) AS rnk
          FROM assigned a
          JOIN qcell p ON a.cell = p.cell
          JOIN embeddings ce ON ce.vec_id = a.vec_id
          JOIN embeddings qe ON qe.vec_id = p.qid
          WHERE a.vec_id <> p.qid)
        WHERE rnk <= 3""")),

    // Hierarchical IVF-PQ — the two pieces of the web-scale layout
    // composed: the √nlist-cost two-level quantizer (assignment +
    // beam probes as reference-object kernels) over m-int PQ codes in
    // the GROUPED directory layout (nlist/64 dirs, cell-sorted files
    // — listing-level + row-group-level pruning; one dir per cell at
    // nlist 10⁵⁻⁶ is a metastore problem of its own). STRICT oracle,
    // the deepest in the ANN family: DuckDB reads the persisted
    // l1/quantizer/codebook sidecars and the grouped code tree, then
    // replays the beam probe (top-2 level-1 cells by cosine, top-4
    // composed cells among their subs) AND the full ADC arithmetic
    // (codes → reconstructed centroids → 64-term sequential reduce)
    // — only the k-means fits stay outside.
    "q_sim_knn_ivfpq_hier" -> Entry(
      (s, dir) => {
        val idxPath = ensureIvfPqHierIndex(s, dir)
        val em = t(s, dir, "embeddings")
        val queries = em.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        Similarity.ivfPqHierTopKFromIndex(s, idxPath, queries, 10,
            nprobe = 4, beam = 2)
          .select(col("qid"), col("rank").as("rnk"), col("vec_id"))
      },
      Some(s"""WITH ${pqReconCtesGrouped("ivfpqh_3x3_m8x16_v3")},
        l1c AS (
          SELECT c1, CAST(centroid AS DOUBLE[]) AS c
          FROM read_parquet('{STAGING:ivfpqh_3x3_m8x16_v3}/l1/*.parquet')
        ), l2c AS (
          SELECT c1, c1 * 3 + c2 AS cell, CAST(centroid AS DOUBLE[]) AS c
          FROM read_parquet(
            '{STAGING:ivfpqh_3x3_m8x16_v3}/quantizer/*.parquet')
        ), q AS (
          SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS e
          FROM embeddings WHERE vec_id < 5
        ), qb AS (
          SELECT qid, c1 FROM (
            SELECT q.qid, l.c1,
              row_number() OVER (PARTITION BY q.qid ORDER BY
                list_cosine_similarity(q.e, l.c) DESC, l.c1) AS pr
            FROM q CROSS JOIN l1c l)
          WHERE pr <= 2
        ), qcell AS (
          SELECT qid, cell FROM (
            SELECT q.qid, s.cell,
              row_number() OVER (PARTITION BY q.qid ORDER BY
                list_cosine_similarity(q.e, s.c) DESC, s.cell) AS pr
            FROM q JOIN qb ON qb.qid = q.qid
            JOIN l2c s ON s.c1 = qb.c1)
          WHERE pr <= 4)
        SELECT qid, rnk, vec_id FROM (
          SELECT p.qid, r.vec_id,
            row_number() OVER (PARTITION BY p.qid ORDER BY
              $pqAdcDistSql ASC, r.vec_id) AS rnk
          FROM recon r
          JOIN qcell p ON r.cell = p.cell
          JOIN q ON q.qid = p.qid
          WHERE r.vec_id <> p.qid)
        WHERE rnk <= 10""")),

    // The LAZY hierarchical IVF-PQ probe under the same deepest-strict
    // replay (see q_sim_ivf_hier_lazy for the shape's rationale): the
    // probe cells come from the sidecar-scan stage-2 instead of the
    // whole-l2 kernel, the ADC arithmetic is identical, and the
    // external oracle cannot tell which path ran — which is exactly
    // the law. Own beam/nprobe/k and query set so the kernel query
    // cannot mask this one.
    "q_sim_knn_ivfpq_hier_lazy" -> Entry(
      (s, dir) => {
        val idxPath = ensureIvfPqHierIndex(s, dir)
        val em = t(s, dir, "embeddings")
        val queries = em.filter(col("vec_id") >= 5 && col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        Similarity.ivfPqHierTopKFromIndexLazy(s, idxPath, queries, 6,
            nprobe = 3, beam = 3)
          .select(col("qid"), col("rank").as("rnk"), col("vec_id"))
      },
      Some(s"""WITH ${pqReconCtesGrouped("ivfpqh_3x3_m8x16_v3")},
        l1c AS (
          SELECT c1, CAST(centroid AS DOUBLE[]) AS c
          FROM read_parquet('{STAGING:ivfpqh_3x3_m8x16_v3}/l1/*.parquet')
        ), l2c AS (
          SELECT c1, c1 * 3 + c2 AS cell, CAST(centroid AS DOUBLE[]) AS c
          FROM read_parquet(
            '{STAGING:ivfpqh_3x3_m8x16_v3}/quantizer/*.parquet')
        ), q AS (
          SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS e
          FROM embeddings WHERE vec_id >= 5 AND vec_id < 10
        ), qb AS (
          SELECT qid, c1 FROM (
            SELECT q.qid, l.c1,
              row_number() OVER (PARTITION BY q.qid ORDER BY
                list_cosine_similarity(q.e, l.c) DESC, l.c1) AS pr
            FROM q CROSS JOIN l1c l)
          WHERE pr <= 3
        ), qcell AS (
          SELECT qid, cell FROM (
            SELECT q.qid, s.cell,
              row_number() OVER (PARTITION BY q.qid ORDER BY
                list_cosine_similarity(q.e, s.c) DESC, s.cell) AS pr
            FROM q JOIN qb ON qb.qid = q.qid
            JOIN l2c s ON s.c1 = qb.c1)
          WHERE pr <= 3)
        SELECT qid, rnk, vec_id FROM (
          SELECT p.qid, r.vec_id,
            row_number() OVER (PARTITION BY p.qid ORDER BY
              $pqAdcDistSql ASC, r.vec_id) AS rnk
          FROM recon r
          JOIN qcell p ON r.cell = p.cell
          JOIN q ON q.qid = p.qid
          WHERE r.vec_id <> p.qid)
        WHERE rnk <= 6""")),

    // The REFINE stage over the hierarchical layout — the FAISS
    // two-stage search: ADC shortlists k·4 candidates from the code
    // table (probed-cell I/O, m-int compute), then only those
    // candidates' raw vectors rerank by exact cosine (the shortlist
    // BROADCASTS into the corpus scan — vectors never shuffle).
    // STRICT oracle: the full hier-ADC replay ranks the shortlist,
    // then DuckDB reranks it with exact cosine from the raw
    // embeddings — both stages recomputed from the persisted store.
    "q_sim_knn_ivfpq_hier_refined" -> Entry(
      (s, dir) => {
        val idxPath = ensureIvfPqHierIndex(s, dir)
        val em = t(s, dir, "embeddings")
        val queries = em.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        Similarity.ivfPqHierTopKRefined(s, idxPath, em, queries, 10,
            nprobe = 4, beam = 2, refineFactor = 4)
          .select(col("qid"), col("rank").as("rnk"), col("vec_id"))
      },
      Some(s"""WITH ${pqReconCtesGrouped("ivfpqh_3x3_m8x16_v3")},
        l1c AS (
          SELECT c1, CAST(centroid AS DOUBLE[]) AS c
          FROM read_parquet('{STAGING:ivfpqh_3x3_m8x16_v3}/l1/*.parquet')
        ), l2c AS (
          SELECT c1, c1 * 3 + c2 AS cell, CAST(centroid AS DOUBLE[]) AS c
          FROM read_parquet(
            '{STAGING:ivfpqh_3x3_m8x16_v3}/quantizer/*.parquet')
        ), q AS (
          SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS e
          FROM embeddings WHERE vec_id < 5
        ), qb AS (
          SELECT qid, c1 FROM (
            SELECT q.qid, l.c1,
              row_number() OVER (PARTITION BY q.qid ORDER BY
                list_cosine_similarity(q.e, l.c) DESC, l.c1) AS pr
            FROM q CROSS JOIN l1c l)
          WHERE pr <= 2
        ), qcell AS (
          SELECT qid, cell FROM (
            SELECT q.qid, s.cell,
              row_number() OVER (PARTITION BY q.qid ORDER BY
                list_cosine_similarity(q.e, s.c) DESC, s.cell) AS pr
            FROM q JOIN qb ON qb.qid = q.qid
            JOIN l2c s ON s.c1 = qb.c1)
          WHERE pr <= 4
        ), shortlist AS (
          SELECT qid, vec_id FROM (
            SELECT q.qid, r.vec_id,
              row_number() OVER (PARTITION BY q.qid ORDER BY
                $pqAdcDistSql ASC, r.vec_id) AS adcr
            FROM recon r
            JOIN qcell p ON r.cell = p.cell
            JOIN q ON q.qid = p.qid
            WHERE r.vec_id <> q.qid)
          WHERE adcr <= 40)
        SELECT qid, rnk, vec_id FROM (
          SELECT sl.qid, sl.vec_id,
            row_number() OVER (PARTITION BY sl.qid ORDER BY
              list_cosine_similarity(CAST(ce.embedding AS DOUBLE[]),
                CAST(qe.embedding AS DOUBLE[])) DESC, sl.vec_id) AS rnk
          FROM shortlist sl
          JOIN embeddings ce ON ce.vec_id = sl.vec_id
          JOIN embeddings qe ON qe.vec_id = sl.qid)
        WHERE rnk <= 10""")),

    // The residual refinement on the HIERARCHICAL layout — codes
    // quantize v − c_cell of the composed level-2 cell, queries rebase
    // per probed cell. STRICT oracle: the hier beam probe + the
    // per-cell rebase + the full ADC replay, all from the persisted
    // sidecars — the last cell of the flat×hier / raw×residual ANN
    // oracle matrix.
    "q_sim_knn_ivfpq_hier_res" -> Entry(
      (s, dir) => {
        val idxPath = ensureIvfPqHierResIndex(s, dir)
        val em = t(s, dir, "embeddings")
        val queries = em.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        Similarity.ivfPqHierTopKFromIndex(s, idxPath, queries, 10,
            nprobe = 4, beam = 2)
          .select(col("qid"), col("rank").as("rnk"), col("vec_id"))
      },
      Some(s"""WITH ${pqReconCtesGrouped("ivfpqhr_3x3_m8x16_v2")},
        l1c AS (
          SELECT c1, CAST(centroid AS DOUBLE[]) AS c
          FROM read_parquet('{STAGING:ivfpqhr_3x3_m8x16_v2}/l1/*.parquet')
        ), l2c AS (
          SELECT c1, c1 * 3 + c2 AS cell, CAST(centroid AS DOUBLE[]) AS c
          FROM read_parquet(
            '{STAGING:ivfpqhr_3x3_m8x16_v2}/quantizer/*.parquet')
        ), qraw AS (
          SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS e
          FROM embeddings WHERE vec_id < 5
        ), qb AS (
          SELECT qid, c1 FROM (
            SELECT qraw.qid, l.c1,
              row_number() OVER (PARTITION BY qraw.qid ORDER BY
                list_cosine_similarity(qraw.e, l.c) DESC, l.c1) AS pr
            FROM qraw CROSS JOIN l1c l)
          WHERE pr <= 2
        ), qcell AS (
          SELECT qid, cell FROM (
            SELECT qraw.qid, s.cell,
              row_number() OVER (PARTITION BY qraw.qid ORDER BY
                list_cosine_similarity(qraw.e, s.c) DESC, s.cell) AS pr
            FROM qraw JOIN qb ON qb.qid = qraw.qid
            JOIN l2c s ON s.c1 = qb.c1)
          WHERE pr <= 4
        ), q AS (
          SELECT p.qid, p.cell,
            list_transform(range(1, 65), i -> qraw.e[i] - s.c[i]) AS e
          FROM qcell p
          JOIN qraw ON qraw.qid = p.qid
          JOIN l2c s ON s.cell = p.cell)
        SELECT qid, rnk, vec_id FROM (
          SELECT q.qid, r.vec_id,
            row_number() OVER (PARTITION BY q.qid ORDER BY
              $pqAdcDistSql, r.vec_id) AS rnk
          FROM recon r JOIN q ON r.cell = q.cell
          WHERE r.vec_id <> q.qid)
        WHERE rnk <= 10""")),

    // PQ encode (the memory half of web-scale ANN): the corpus at rest
    // as m=8 codebook codes per vector — 8 ints vs 64 floats, one
    // zero-Exchange scan through the codegen'd pq_encode kernel at
    // index-build time. STRICT oracle: DuckDB recomputes every
    // subspace argmin (sequential squared-L2 per candidate code, ties
    // to the lowest code) from the persisted codebook floats and the
    // raw embeddings — the whole encode arithmetic replays; only the
    // per-subspace k-means fit stays outside. PqSpec pins kernel laws
    // (ties, shape nulls, round-trip distortion).
    "q_embed_pq_codes" -> Entry(
      (s, dir) => {
        val p = ensurePqIndex(s, dir)
        s.read.parquet(s"$p/codes")
          .select(col("vec_id"),
            posexplode(col("codes")).as(Seq("sub", "code")))
      },
      Some("""WITH cb AS (
          SELECT sub, code, CAST(centroid AS DOUBLE[]) AS c
          FROM read_parquet('{STAGING:pq_m8x16_v3}/codebooks/*.parquet')
        ), v AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
          FROM embeddings
          WHERE embedding IS NOT NULL AND len(embedding) > 0
        ), d AS (
          SELECT v.vec_id, cb.sub, cb.code,
            list_reduce(list_prepend(0.0, list_transform(range(1, 9),
              i -> (e[cb.sub * 8 + i] - c[i]) * (e[cb.sub * 8 + i] - c[i]))),
              (a, b) -> a + b) AS dist
          FROM v CROSS JOIN cb
        ), r AS (
          SELECT vec_id, sub, code,
            row_number() OVER (PARTITION BY vec_id, sub
              ORDER BY dist, code) AS rn
          FROM d)
        SELECT vec_id, sub, code FROM r WHERE rn = 1""")),

    // PQ flat (ADC) kNN: every query scans the code table with the
    // asymmetric distance — no vector is read or shuffled after the
    // index build, the compute/memory-bound ANN baseline (IVF-PQ below
    // adds I/O pruning). STRICT oracle: DuckDB reconstructs each
    // corpus vector's quantized form from its persisted codes and
    // replays the 64-term sequential ADC reduce bit-exactly, then the
    // (distance, id) ranking. Only the codebook fit stays outside.
    "q_sim_knn_pq" -> Entry(
      (s, dir) => {
        val em = t(s, dir, "embeddings")
        val p = ensurePqIndex(s, dir)
        val queries = em.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        Similarity.pqTopKFromIndex(s, p, queries, 10)
          .select(col("qid"), col("rank").as("rnk"), col("vec_id"))
      },
      Some(s"""WITH ${pqReconCtes("pq_m8x16_v3", partitioned = false)},
        q AS (
          SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS e
          FROM embeddings WHERE vec_id < 5)
        SELECT qid, rnk, vec_id FROM (
          SELECT q.qid, r.vec_id,
            row_number() OVER (PARTITION BY q.qid ORDER BY
              $pqAdcDistSql, r.vec_id) AS rnk
          FROM recon r CROSS JOIN q WHERE r.vec_id <> q.qid)
        WHERE rnk <= 10""")),

    // IVF-PQ kNN — the full web-scale ANN layout (the FAISS shape, on
    // the shared-codebook variant): probe I/O bounded by nprobe
    // partition-pruned cells, probe compute by 8-int ADC rows, memory
    // by the code table; raw vectors appear nowhere in the probe plan.
    // Both sidecars persist (coarse cells shared with every other IVF
    // query; codebooks shared with the flat PQ path). STRICT oracle:
    // cell probes replay by cosine against the coarse centroids, ADC
    // by the same reconstructed-vector sequential reduce as
    // q_sim_knn_pq — only the two k-means fits stay outside.
    "q_sim_knn_ivfpq" -> Entry(
      (s, dir) => {
        val em = t(s, dir, "embeddings")
        val p = ensureIvfPqIndex(s, dir)
        val queries = em.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        Similarity.ivfPqTopKFromIndex(s, p, queries, 10, nprobe = 4)
          .select(col("qid"), col("rank").as("rnk"), col("vec_id"))
      },
      Some(s"""WITH ${pqReconCtes("ivfpq_n8_m8x16_v3", partitioned = true)},
        q AS (
          SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS e
          FROM embeddings WHERE vec_id < 5),
        qcell AS (
          SELECT qid, cell FROM (
            SELECT q.qid, c.cell,
              row_number() OVER (PARTITION BY q.qid ORDER BY
                list_cosine_similarity(q.e,
                  CAST(c.centroid AS DOUBLE[])) DESC, c.cell) AS pr
            FROM q CROSS JOIN (
              SELECT cell, centroid FROM read_parquet(
                '{STAGING:ivfpq_n8_m8x16_v3}/centroids/*.parquet')) c)
          WHERE pr <= 4)
        SELECT qid, rnk, vec_id FROM (
          SELECT p.qid, r.vec_id,
            row_number() OVER (PARTITION BY p.qid ORDER BY
              $pqAdcDistSql, r.vec_id) AS rnk
          FROM recon r
          JOIN qcell p ON r.cell = p.cell
          JOIN q ON q.qid = p.qid
          WHERE r.vec_id <> p.qid)
        WHERE rnk <= 10""")),

    // Residual IVF-PQ kNN — the FAISS-style refinement: codes quantize
    // v − c_cell (within-cell variance ≪ corpus variance, so the same
    // 8×4 bits buy a finer quantization); queries rebase to q − c_cell
    // per probed cell and ADC scores ‖(q−c) − quant(v−c)‖², the same
    // true-distance approximation in every cell. All residual
    // arithmetic runs in double on BOTH engines (float subtraction
    // would round unreplayably). STRICT oracle: qcell probes, the
    // per-cell query rebase, residual reconstruction, and the 64-term
    // sequential ADC all replay from the persisted sidecars — only the
    // two k-means fits stay outside.
    "q_sim_knn_ivfpq_res" -> Entry(
      (s, dir) => {
        val em = t(s, dir, "embeddings")
        val p = ensureIvfPqResIndex(s, dir)
        val queries = em.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        Similarity.ivfPqTopKFromIndex(s, p, queries, 10, nprobe = 4)
          .select(col("qid"), col("rank").as("rnk"), col("vec_id"))
      },
      Some(s"""WITH ${pqReconCtes("ivfpqr_n8_m8x16_v2", partitioned = true)},
        qraw AS (
          SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS e
          FROM embeddings WHERE vec_id < 5),
        cents2 AS (
          SELECT cell, CAST(centroid AS DOUBLE[]) AS c
          FROM read_parquet(
            '{STAGING:ivfpqr_n8_m8x16_v2}/centroids/*.parquet')),
        qcell AS (
          SELECT qid, cell FROM (
            SELECT qraw.qid, c2.cell,
              row_number() OVER (PARTITION BY qraw.qid ORDER BY
                list_cosine_similarity(qraw.e, c2.c) DESC, c2.cell) AS pr
            FROM qraw CROSS JOIN cents2 c2)
          WHERE pr <= 4),
        q AS (
          SELECT p.qid, p.cell,
            list_transform(range(1, 65), i -> qraw.e[i] - c2.c[i]) AS e
          FROM qcell p
          JOIN qraw ON qraw.qid = p.qid
          JOIN cents2 c2 ON c2.cell = p.cell)
        SELECT qid, rnk, vec_id FROM (
          SELECT q.qid, r.vec_id,
            row_number() OVER (PARTITION BY q.qid ORDER BY
              $pqAdcDistSql, r.vec_id) AS rnk
          FROM recon r JOIN q ON r.cell = q.cell
          WHERE r.vec_id <> q.qid)
        WHERE rnk <= 10""")),

    // Skew-mitigated aggregation: two-stage salted groupBy (hot grouping
    // keys spread over 16 reducers, then partials combine). The oracle is
    // the plain one-stage aggregate — the decomposition must be exact,
    // which is why the money sum goes through integer cents.
    "q_skew_salted_agg" -> Entry(
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        Skew.saltedAgg(
          li.select(col("l_returnflag"), col("l_quantity")),
          Seq(col("l_returnflag")), 16,
          Seq(count(lit(1)).as("pn"), sum(cents(col("l_quantity"))).as("ps")),
          Seq(sum(col("pn")).as("n_rows"),
            (sum(col("ps")) / 100.0).as("sum_qty")))
      },
      Some("""SELECT l_returnflag, count(*) AS n_rows,
        sum(cast(floor(l_quantity*100 + 0.5) as bigint))/100.0 AS sum_qty
        FROM lineitem GROUP BY l_returnflag""")),

    // ---- corpus curation --------------------------------------------
    // Gopher-style repetition gates: word-duplication fraction and the
    // share of bigram slots taken by the most frequent bigram — entirely
    // row-local (the bigram mode-count runs inside the row via
    // `aggregate` over the sorted bigram array, no corpus-wide explode
    // shuffle). The oracle recomputes the same fractions the expensive
    // way (unnest + group) — same numbers, different plan shape.
    "q_quality_repetition" -> Entry(
      (s, dir) => {
        val f = Text.repetition_features(col("text"))
        Q.spread(t(s, dir, "documents")).select(col("doc_id"),
          f.getField("n_words").as("n_words"),
          round(f.getField("dup_word_frac"), 4).as("dup_word_frac"),
          round(f.getField("top_bigram_frac"), 4).as("top_bigram_frac"))
      },
      Some("""WITH words AS (
          SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS ws
          FROM documents
        ), bg AS (
          SELECT doc_id, ws[i] || ' ' || ws[i+1] AS b
          FROM words, unnest(range(1, len(ws))) AS t(i)
        ), cnt AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2),
        top AS (SELECT doc_id, max(c) AS mc FROM cnt GROUP BY 1)
        SELECT w.doc_id, cast(len(ws) as bigint) AS n_words,
          round(1.0 - len(list_distinct(ws))::double / len(ws), 4)
            AS dup_word_frac,
          round(coalesce(t.mc::double / (len(ws) - 1), 0.0), 4)
            AS top_bigram_frac
        FROM words w LEFT JOIN top t ON w.doc_id = t.doc_id""")),

    // The COMPLETE published Gopher n-gram repetition bundle: top
    // n-gram char fraction (n=2,3,4) + duplicate n-gram char fraction
    // (n=5..10) — 9 native single-pass hash kernels over the row's own
    // shingle arrays, zero shuffle. The oracle recomputes every
    // feature from exploded n-grams (counts, char masses, the total
    // tie rule c DESC / length DESC / gram ASC) in DuckDB.
    "q_quality_repetition_ngrams" -> Entry(
      (s, dir) => {
        val f = Text.repetition_ngram_features(col("text"))
        val cols = Seq("top_2gram_char_frac", "top_3gram_char_frac",
          "top_4gram_char_frac") ++
          (5 to 10).map(k => s"dup_${k}gram_char_frac")
        Q.spread(t(s, dir, "documents")).select(
          (col("doc_id") +: cols.map(c => f.getField(c).as(c))) :+
            Text.repetition_ngram_keep(f).as("keep"): _*)
      },
      Some(repetitionNgramOracle)),

    // Compression-ratio quality gate (RefinedWeb/Gopher family): raw
    // DEFLATE size ÷ UTF-8 size via the native deflated_size kernel —
    // row-local, zero shuffle, whole corpus in one scan. Rows-only:
    // DuckDB has no SQL deflate surface; the ratio's ordering and
    // bounds are pinned in CorpusSpec, the SQL registration in
    // KernelPropertiesSpec.
    "q_quality_compress" -> Entry(
      (s, dir) => {
        val r = Text.compression_ratio(col("text"))
        Q.spread(t(s, dir, "documents")).select(col("doc_id"), r.as("c_ratio"),
          // the two-sided gate: repeated boilerplate compresses away,
          // high-entropy noise doesn't compress at all
          (r.between(0.10, 0.95)).as("keep"))
      },
      None),

    // Trained quality classifier (the fastText-style gate of the
    // GPT-3/CCNet curation lineage): hashed bag-of-words logistic
    // regression fit on a content-hash train split (label: does the
    // doc carry the marker term?), then scored on the held-out split.
    // r12: STRICT oracle (was rows-only) — the trained weights persist
    // to a staging store (the operator's own "persist the trained
    // array, not retrain per run" contract) and scoring runs with the
    // doubles read back, so DuckDB replays the presence-branch
    // hashed_logit exactly: md5-16-bit buckets mod k, per-doc distinct
    // buckets summed in ASCENDING bucket order (the kernel sorts
    // before the dedup-sum), + bias, sigmoid, threshold. Only the
    // gradient-descent FIT stays outside. ClassifierSpec pins
    // separation/layout laws. Training cost is bounded by the labeled
    // split; scoring is the corpus-scan-sized path.
    "q_quality_classifier" -> Entry(
      (s, dir) => {
        import graft.operators.{Corpus, TextClassifier}
        // vocabulary-defined quality label (the docs table's langs share
        // one word pool, so lang itself is unlearnable from text): the
        // model must LEARN which hash buckets carry the marker terms
        // marker presence is ~76% positive here, so majority-guessing
        // caps at 0.76 — the fit must find the marker's bucket among
        // 256 to beat it (it reaches ~1.0; DsirSpec-style planted
        // multi-vocabulary learning is pinned in ClassifierSpec)
        val ws = split(col("text"), "\\s+")
        val docs = t(s, dir, "documents").withColumn("y",
          array_contains(ws, "vector").cast("int"))
        val held = docs.filter(!Corpus.hashKeep(col("doc_id").cast("string"), 0.5))
        val p = ensureStaged(s, dir, "clf_k256", "model", "documents") {
          pp =>
            val train = docs.filter(
              Corpus.hashKeep(col("doc_id").cast("string"), 0.5))
            TextClassifier.writeWeights(s,
              TextClassifier.train(train, "doc_id", "text", "y",
                k = 256, iters = 4, lr = 1.0, tf = false), pp)
        }
        val w = TextClassifier.readWeights(s, p)
        TextClassifier.score(held, "doc_id", "text", w, k = 256, tf = false)
          .join(held.select(col("doc_id"), col("y")), Seq("doc_id"))
          .select(col("doc_id"), (col("score") >= 0.5).cast("int").as("y_pred"),
            col("y").as("y_true"))
      },
      Some("""WITH wrows AS (
          SELECT i, w FROM read_parquet('{STAGING:clf_k256}/model/*.parquet')
        ), warr AS (SELECT list(w ORDER BY i) AS wl FROM wrows),
        held AS (
          SELECT doc_id, text,
            CASE WHEN list_contains(
              regexp_split_to_array(trim(text), '\s+'), 'vector')
            THEN 1 ELSE 0 END AS y_true
          FROM documents
          WHERE NOT (substr(md5(cast(doc_id AS varchar)), 1, 4) < '8000')
        ), toks AS (
          SELECT doc_id, list_sort(list_distinct(list_transform(
            regexp_split_to_array(trim(text), '\s+'),
            t -> ('0x' || substr(md5(t), 1, 4))::BIGINT % 256))) AS bs
          FROM held
        ), lg AS (
          SELECT doc_id,
            list_reduce(list_prepend(0.0,
              list_transform(bs, b -> wl[b + 1])), (a, b) -> a + b)
              + wl[257] AS logit
          FROM toks CROSS JOIN warr)
        SELECT h.doc_id,
          CASE WHEN 1.0 / (1.0 + exp(-l.logit)) >= 0.5
            THEN 1 ELSE 0 END AS y_pred,
          h.y_true
        FROM held h JOIN lg l USING (doc_id)""")),

    // Deterministic stratified sampling: content-hash (md5-prefix)
    // Bernoulli keep with per-language rates — a pure map-side filter
    // (the 100 TB sampler: one scan, zero shuffle, rerun-stable, and
    // portable to any engine with md5 — unlike rand(), which is
    // partition-layout-dependent).
    "q_sample_stratified" -> Entry(
      (s, dir) => {
        import graft.operators.Corpus
        val keep = when(col("lang") === "en",
            Corpus.hashKeep(col("text"), 0.5))
          .otherwise(Corpus.hashKeep(col("text"), 0.125))
        t(s, dir, "documents").filter(keep)
          .select(col("doc_id"), col("lang"),
            Corpus.hashBucket(col("text")).as("bucket"))
      },
      Some("""SELECT doc_id, lang, substr(md5(text), 1, 4) AS bucket
        FROM documents
        WHERE substr(md5(text), 1, 4) <
          CASE WHEN lang = 'en' THEN '8000' ELSE '2000' END""")),

    // Per-source corpus balancing: keep the 10 highest-token documents
    // per source (WindowGroupLimit pushes the top-10 below the exchange,
    // so the shuffle carries at most 10 rows per source per map task).
    "q_source_cap" -> Entry(
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .select(col("source"), col("doc_id"),
            Text.token_count(col("text")).cast("long").as("n_tokens"))
        graft.operators.Corpus.capPerGroup(docs, "source",
            Seq(col("n_tokens").desc, col("doc_id").asc), 10)
          .select(col("source"), col("doc_id"), col("n_tokens"),
            col("rnk").cast("long").as("rnk"))
      },
      Some("""SELECT source, doc_id, n_tokens, rnk FROM (
          SELECT source, doc_id,
            cast(len(regexp_split_to_array(trim(text), '\s+')) as bigint)
              AS n_tokens,
            cast(row_number() OVER (PARTITION BY source
              ORDER BY len(regexp_split_to_array(trim(text), '\s+')) DESC,
                doc_id) as bigint) AS rnk
          FROM documents) WHERE rnk <= 10""")),

    // BM25 retrieval: top-50 documents for a 3-term query. Corpus stats
    // (N, Σdl, per-term df) are one partial-aggregated pass broadcast
    // back as a 1-row cross join; term frequencies are row-local; the
    // only wide node is the final TakeOrdered. The oracle replays the
    // identical Okapi arithmetic in SQL (same association order).
    "q_text_bm25" -> Entry(
      // the top-50 cut ranks on the ROUNDED score (+ doc_id tiebreak)
      // on BOTH sides — the oracle's ORDER BY score resolves to its
      // rounded output alias, and a raw-double cut would let last-ulp
      // ln() drift or a past-4dp tie at the boundary pick different
      // row sets (the distinctiveTerms rounding rule, applied here)
      (s, dir) => graft.operators.Corpus.bm25(Q.spread(t(s, dir, "documents")),
          "doc_id", "text", Seq("table", "spark", "vector"))
        .select(col("doc_id"), col("dl").cast("long").as("dl"),
          round(col("score"), 4).as("score"))
        .orderBy(col("score").desc, col("doc_id").asc)
        .limit(50),
      Some("""WITH d AS (
          SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS ws
          FROM documents
        ), f AS (
          SELECT doc_id, cast(len(ws) as bigint) AS dl,
            len(list_filter(ws, w -> w = 'table')) AS tf0,
            len(list_filter(ws, w -> w = 'spark')) AS tf1,
            len(list_filter(ws, w -> w = 'vector')) AS tf2
          FROM d
        ), s AS (
          SELECT count(*) AS n_docs, sum(dl) AS sum_dl,
            sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
            sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
            sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
          FROM f)
        SELECT doc_id, dl, round(score, 4) AS score FROM (
          SELECT doc_id, dl,
            ln(1.0 + (n_docs::double - df0::double + 0.5)/(df0::double + 0.5))
              * tf0::double * 2.2 / (tf0::double + 1.2 *
                (0.25 + 0.75 * dl::double / (sum_dl::double / n_docs::double)))
            + ln(1.0 + (n_docs::double - df1::double + 0.5)/(df1::double + 0.5))
              * tf1::double * 2.2 / (tf1::double + 1.2 *
                (0.25 + 0.75 * dl::double / (sum_dl::double / n_docs::double)))
            + ln(1.0 + (n_docs::double - df2::double + 0.5)/(df2::double + 0.5))
              * tf2::double * 2.2 / (tf2::double + 1.2 *
                (0.25 + 0.75 * dl::double / (sum_dl::double / n_docs::double)))
              AS score
          FROM f, s WHERE tf0 > 0 OR tf1 > 0 OR tf2 > 0)
        ORDER BY score DESC, doc_id LIMIT 50""")),

    // Exact corpus distribution stats: per-language token-count
    // quantiles (linear interpolation — Spark `percentile` ≡ DuckDB
    // `quantile_cont`). One shuffle on lang; percentile is a typed
    // aggregate with map-side partials.
    "q_corpus_quantiles" -> Entry(
      (s, dir) => t(s, dir, "documents")
        .select(col("lang"), Text.token_count(col("text")).as("n_tokens"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          expr("percentile(n_tokens, array(0.5D, 0.9D, 0.99D))").as("p"))
        .select(col("lang"), col("n_docs"),
          round(element_at(col("p"), 1), 4).as("p50"),
          round(element_at(col("p"), 2), 4).as("p90"),
          round(element_at(col("p"), 3), 4).as("p99")),
      Some("""SELECT lang, count(*) AS n_docs,
        round(quantile_cont(len(regexp_split_to_array(trim(text), '\s+')),
          0.5), 4) AS p50,
        round(quantile_cont(len(regexp_split_to_array(trim(text), '\s+')),
          0.9), 4) AS p90,
        round(quantile_cont(len(regexp_split_to_array(trim(text), '\s+')),
          0.99), 4) AS p99
        FROM documents GROUP BY lang""")),

    // Corpus-level n-gram vocabulary stats: global top-25 word bigrams.
    // Explode shuffles (bigram, partial-count) after map-side combine;
    // the top-25 is a TakeOrdered (per-partition heap + driver merge),
    // never a single-partition global sort.
    "q_ngram_topk" -> Entry(
      (s, dir) => {
        t(s, dir, "documents")
          .select(explode(bigramsOf(col("text"))).as("bigram"))
          .groupBy(col("bigram")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("bigram").asc)
          .limit(25)
      },
      Some("""WITH words AS (
          SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS ws
          FROM documents
        ), bg AS (
          SELECT doc_id, ws[i] || ' ' || ws[i+1] AS b
          FROM words, unnest(range(1, len(ws))) AS t(i))
        SELECT b AS bigram, count(*) AS n FROM bg GROUP BY 1
        ORDER BY n DESC, bigram LIMIT 25""")),

    // Bounded-memory heavy hitters: the same top-25 bigrams as
    // q_ngram_topk, but through the native count-min-sketch aggregate —
    // state is O(depth·width) per partial regardless of key
    // cardinality, the 100 TB fallback when the distinct-shingle space
    // outgrows an exact groupBy shuffle. Estimates are
    // hash-collision-dependent (≥ truth, ≤ truth + ε·N), so rows-only;
    // KernelPropertiesSpec pins the bounds, partition invariance, and
    // exactness on a wide sketch.
    "q_ngram_topk_cms" -> Entry(
      (s, dir) => {
        Q.spread(t(s, dir, "documents"))
          .select(explode(bigramsOf(col("text"))).as("bigram"))
          .agg(graft.plans.CmsAgg.cms_topk(25)(col("bigram")).as("top"))
          .select(explode(col("top")).as("e"))
          .select(col("e.key").as("bigram"), col("e.est").as("n"))
      },
      None),

    // The CMS sketch ARITHMETIC under a strict oracle: build the raw
    // counter matrix on the md5 basis (cell_r(k) =
    // ('0x'||substr(md5(k||':'||r),1,15))::BIGINT % width — the
    // byte-replayable 60-bit prefix convention), probe it with the
    // EXACT top-25 bigram keys, and hash-compare the min-over-rows
    // estimates against DuckDB recomputing every cell. q_ngram_topk_cms
    // stays the heavy-hitter demo (its CANDIDATE SET is partition-
    // layout-dependent by design — the sketch+heap tradeoff — hence
    // rows-only there); here the keys come from the exact path, so
    // every remaining number is deterministic sketch arithmetic. The
    // 25-key probe rides a 1-row broadcast of the 32 KiB sketch.
    "q_ngram_cms_estimates" -> Entry(
      (s, dir) => {
        val depth = 4
        val w = 1024
        val grams = Q.spread(t(s, dir, "documents"))
          .select(explode(bigramsOf(col("text"))).as("bigram"))
        val top = grams.groupBy(col("bigram")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("bigram").asc).limit(25)
        val sketch = grams.agg(graft.plans.CmsAgg
          .cms_sketch(depth, w, md5Basis = true)(col("bigram")).as("sk"))
        def bucket(r: Int) = pmod(
          conv(substring(md5(concat(col("bigram"), lit(s":$r"))), 1, 15),
            16, 10).cast("long"), lit(w.toLong))
        val est = (0 until depth).map(r =>
          element_at(col("sk"),
            (lit(r * w).cast("long") + bucket(r)).cast("int") + 1))
          .reduce(least(_, _))
        top.crossJoin(broadcast(sketch))
          .select(col("bigram"), col("n"), est.as("est"))
      },
      Some("""WITH words AS (
          SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS ws
          FROM documents
        ), bg AS (
          SELECT doc_id, ws[i] || ' ' || ws[i+1] AS b
          FROM words, unnest(range(1, len(ws))) AS t(i)
        ), cnt AS (SELECT b, count(*) AS n FROM bg GROUP BY 1),
        top AS (SELECT b, n FROM cnt ORDER BY n DESC, b LIMIT 25),
        cells AS (
          SELECT r, ('0x' || substr(md5(b || ':' || cast(r AS varchar)),
              1, 15))::BIGINT % 1024 AS cell, count(*) AS c
          FROM bg CROSS JOIN range(0, 4) t(r) GROUP BY 1, 2)
        SELECT top.b AS bigram, top.n, min(c.c) AS est
        FROM top CROSS JOIN range(0, 4) t(r)
        JOIN cells c ON c.r = t.r AND c.cell =
          ('0x' || substr(md5(top.b || ':' || cast(t.r AS varchar)),
            1, 15))::BIGINT % 1024
        GROUP BY 1, 2""")),

    // Training-shard writer end-to-end: deterministic shuffle → token
    // packing → shard-partitioned parquet, audited via the manifest it
    // returns. Written to a per-invocation temp dir; manifest row set
    // is deterministic for (corpus, seed, budgets) but involves a
    // filesystem round-trip, so rows-only; ShardsSpec pins bounds,
    // losslessness, and rerun-stability.
    // Token-packed parquet training shards. r13: STRICT oracle — the
    // shards now land in a staged (mtime-guarded) tree the oracle can
    // reach after the Spark JVM exits, and DuckDB replays the WHOLE
    // packing independently from only the (doc_id, text) it reads back
    // out of the written files: the md5("id:seed") shuffle order, the
    // whitespace token counts, the running prefix sum, the 4096-token
    // bins, the 256-bin shards, then the manifest aggregation. A
    // writer that dropped rows, misassigned a shard, or persisted a
    // wrong __tok/seq_id shifts the replayed prefix sums and
    // hash-mismatches. (Staging replaces the old per-invocation temp:
    // same build-if-stale sharing contract as every persisted index.)
    "q_shards_manifest" -> Entry(
      (s, dir) => {
        val p = ensureStaged(s, dir, "pshards_v1", "", "documents")(pp => {
          // slim projection: the shard files only need the columns the
          // packer consumes
          graft.sinks.Shards.writeTrainingShards(
            t(s, dir, "documents").select(col("doc_id"), col("text")),
            "doc_id", "text", pp)
          ()
        })
        graft.sinks.Shards.manifest(s, p)
      },
      Some(s"""WITH src AS (
          SELECT doc_id, text FROM read_parquet(
            '{STAGING:pshards_v1}/shard=*/*.parquet')
        ), ${shardReplayCtes("4096", "256")}"""
        + shardReplaySelect)),

    // Gzip-JSONL shard export (Shards.writeJsonlShards): the Dolma-
    // lineage wire format under the SAME packing discipline as the
    // parquet writer — ShardsSpec pins manifest equality between the
    // two. r13: STRICT oracle, one step deeper than the parquet twin —
    // DuckDB's read_json consumes the written gzip-JSONL tree
    // natively, so the replay ALSO proves the shards are readable
    // outside Spark (the wire-format contract of the layout) and that
    // text survives the JSON round-trip, before replaying the same
    // full packing from (doc_id, text).
    "q_shards_jsonl" -> Entry(
      (s, dir) => {
        val p = ensureStaged(s, dir, "jshards_v1", "", "documents")(pp => {
          graft.sinks.Shards.writeJsonlShards(
            t(s, dir, "documents").select(col("doc_id"), col("text")),
            "doc_id", "text", pp)
          ()
        })
        graft.sinks.Shards.manifestJsonl(s, p)
      },
      Some(s"""WITH src AS (
          SELECT doc_id, text FROM read_json(
            '{STAGING:jshards_v1}/shard=*/*.json.gz')
        ), ${shardReplayCtes("4096", "256")}"""
        + shardReplaySelect)),

    // WebDataset-style tar shards: the multimodal training-export
    // layout (one tar per shard, samples as <key>.<ext> member runs).
    // Payload bytes cross ONE exchange — the shard boundaries come
    // from a slim (ord, bytes) prefix-sum pack + a broadcast
    // binary-search assignment (sinks/Shards.writeTarShards scaladoc).
    // Rows-only: the manifest rows (with per-shard sha256) ARE the
    // result; ShardsSpec byte-compares reruns and round-trips members
    // through the library's own binary tar scan.
    "q_shards_webdataset" -> Entry(
      (s, dir) => {
        val out = Q.tempDir("graft_webds") + "/shards"
        val docs = t(s, dir, "documents")
          .select(col("doc_id"),
            col("text").cast("binary").as("payload"),
            to_json(struct(col("doc_id"), col("lang"),
              col("source"))).as("meta"))
        // 128 KiB budget: several shards even at the small verify SF
        // (each sample costs ~2 KiB of tar framing + content)
        val manifest = graft.sinks.Shards.writeTarShards(docs, "doc_id",
          Seq("payload" -> "txt", "meta" -> "json"), out,
          bytesPerShard = 128L << 10)
        // store-relative paths: the absolute form carried the
        // per-invocation temp prefix, the one rerun-UNSTABLE cell in
        // the whole board (contents, sizes and sha256 were identical
        // across runs — only the prefix differed)
        manifest.withColumn("path",
          regexp_replace(col("path"), java.util.regex.Pattern.quote(out),
            "shards"))
      },
      None),

    // Frequency-ranked vocabulary: top-200 whitespace tokens with
    // deterministic (count desc, word asc) rank ids. TakeOrdered cut +
    // rank window bounded by V, not the corpus (operators/Corpus.scala
    // buildVocab).
    "q_vocab_topk" -> Entry(
      (s, dir) => Corpus.buildVocab(t(s, dir, "documents"), "text", 200),
      Some("""WITH flat AS (
          SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
            AS w
          FROM documents)
        SELECT w AS word, cast(count(*) AS bigint) AS n,
          cast(row_number() OVER (ORDER BY count(*) DESC, w ASC) AS bigint)
            AS id
        FROM flat GROUP BY w ORDER BY n DESC, word LIMIT 200""")),

    // Vocabulary coverage curve (Corpus.vocabCoverage): cumulative
    // token-coverage fraction by frequency rank — the table that sizes
    // a tokenizer budget ("95% coverage needs N words"). One partial-
    // agg word-count exchange + TakeOrdered(k); the prefix sums run in
    // the ARRAY domain on the single collected top-k row (k-bounded,
    // buildVocab's trick — no single-partition WindowExec); the token
    // total rides a one-row broadcast crossJoin.
    "q_vocab_coverage" -> Entry(
      (s, dir) => graft.operators.Corpus.vocabCoverage(
        t(s, dir, "documents"), "text", 200),
      Some("""WITH flat AS (
          SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
            AS w
          FROM documents
        ), tot AS (
          SELECT cast(count(*) as double) AS total FROM flat
        ), counts AS (
          SELECT w AS word, cast(count(*) as bigint) AS n
          FROM flat GROUP BY w
        ), top AS (
          SELECT word, n, cast(row_number() OVER (ORDER BY n DESC, word)
            as bigint) AS rank
          FROM counts ORDER BY n DESC, word LIMIT 200)
        SELECT word, n, rank,
          round(sum(n) OVER (ORDER BY rank) / total, 4) AS cum_frac
        FROM top, tot""")),

    // Token-id encoding of every document against that vocabulary
    // (OOV → 0, order-preserving). Spark looks ids up via a BROADCAST
    // hash join on the exploded token stream (O(1)/token in codegen);
    // the oracle replays it with a DuckDB map. The reassembly shuffle
    // carries (doc_id, pos, id) — ~16 bytes/token, never text.
    "q_tokens_encode" -> Entry(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        Corpus.encodeTokens(docs, "doc_id", "text",
          Corpus.buildVocab(docs, "text", 500))
          // arrays hash engine-dependently in the driver compare;
          // serialize the id sequence (order preserved)
          .select(col("doc_id"),
            array_join(col("token_ids"), " ").as("token_ids"))
      },
      Some("""WITH toks AS (
          -- coalesce mirrors encodeTokens' null-text guard (ENCODING
          -- side only: a null doc encodes as [0], it is not dropped)
          SELECT doc_id,
            regexp_split_to_array(trim(lower(coalesce(text, ''))), '\s+')
            AS ws
          FROM documents
        -- the VOCABULARY side must NOT coalesce: buildVocab's explode
        -- of a null split contributes nothing, so a null-text doc
        -- feeding the oracle's vocab an '' token would shift
        -- membership near the cut
        ), flat AS (
          SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
            AS w
          FROM documents WHERE text IS NOT NULL
        ), vocab AS (
          SELECT w AS word,
            cast(row_number() OVER (ORDER BY count(*) DESC, w ASC)
              AS bigint) AS id
          FROM flat GROUP BY w ORDER BY count(*) DESC, w LIMIT 500
        ), vmap AS (
          SELECT map(list(word ORDER BY id), list(id ORDER BY id)) AS m
          FROM vocab)
        SELECT doc_id,
          array_to_string(list_transform(ws,
            t -> coalesce(map_extract(m, t)[1], 0)), ' ') AS token_ids
        FROM toks, vmap""")),

    // BPE subword tokenizer (Sennrich-style): merges train on the
    // word-frequency DICTIONARY — one corpus-sized explode+groupBy
    // shuffle cut to maxWords by TakeOrdered, then a driver merge loop
    // bounded by the dictionary (the sequential-by-nature part; a
    // 100 TB corpus costs the same loop as 100 MB). Encoding is
    // map-only: broadcast merge ranks + per-partition word memo.
    // r12: STRICT oracle (was rows-only) — the trained merges persist
    // to a staging store and the encode runs with the read-back copy,
    // so DuckDB replays the greedy ENCODE loop exactly: a recursive
    // CTE advances every distinct word one merge step per iteration
    // (LATERAL min-rank applicable pair; the left-to-right
    // merge-every-occurrence rewrite as a sentinel-joined string fold,
    // overlap-skipping by construction — a just-merged a·b can never
    // re-match as a bare `a`), then documents reassemble in word
    // order. Only the merge LEARNING loop (global pair argmax per
    // round) stays outside the oracle. BpeSpec pins the merge
    // sequence, greedy generalization ("lowest" → low + est</w>),
    // decode round-trip, and the merge-store round-trip.
    "q_tokens_bpe" -> Entry(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val p = ensureStaged(s, dir, "bpe_m200", "merges", "documents")(
          pp => graft.operators.Bpe.writeMerges(s,
            graft.operators.Bpe.train(docs, "text",
              numMerges = 200, maxWords = 1 << 15, minCount = 2L), pp))
        val model = graft.operators.Bpe.readMerges(s, p)
        graft.operators.Bpe.encode(docs, "doc_id", "text", model)
          // serialized: array cells hash engine-dependently in the
          // driver's pandas compare
          .select(col("doc_id"),
            array_join(col("pieces"), " ").as("pieces"))
      },
      // chr(57344) = the  end-of-word symbol. The fold/split
      // sentinel is chr(10): words come from a \s+ split, so NO
      // whitespace codepoint can ever sit inside a symbol — unlike a
      // private-use char, which corpus text could legitimately carry
      // (a literal U+E001 inside a word would have broken a
      // private-use sentinel;  is stripped on both sides)
      Some("""WITH RECURSIVE m AS (
          SELECT rank, a, b, a || chr(10) || b AS pairkey
          FROM read_parquet('{STAGING:bpe_m200}/merges/*.parquet')
        ), words AS (
          SELECT DISTINCT w AS word FROM (
            SELECT unnest(list_filter(list_transform(
              regexp_split_to_array(trim(lower(text)), '\s+'),
              x -> replace(x, chr(57344), '')), x -> x <> '')) AS w
            FROM documents WHERE text IS NOT NULL)
        ), enc AS (
          SELECT word,
            list_append(regexp_extract_all(word, '[\s\S]'), chr(57344))
              AS syms,
            0 AS it
          FROM words
          UNION ALL
          SELECT x.word,
            list_filter(string_split(
              list_reduce(
                list_prepend('', list_transform(x.syms,
                  s -> chr(10) || s)),
                (acc, cur) -> CASE
                  WHEN ends_with(acc, chr(10) || best.a)
                    AND cur = chr(10) || best.b
                  THEN left(acc, length(acc) - length(best.a))
                    || best.a || best.b
                  ELSE acc || cur END),
              chr(10)), s2 -> s2 <> '') AS syms,
            x.it + 1
          FROM (
            SELECT word, syms, it,
              list_transform(range(1, len(syms)),
                i -> syms[i] || chr(10) || syms[i + 1]) AS prs
            FROM enc WHERE len(syms) > 1) x,
          LATERAL (
            SELECT mm.rank, mm.a, mm.b FROM m mm
            WHERE list_contains(x.prs, mm.pairkey)
            ORDER BY mm.rank LIMIT 1) best
        ), final AS (
          SELECT word, syms FROM (
            SELECT word, syms,
              row_number() OVER (PARTITION BY word ORDER BY it DESC) AS rn
            FROM enc) WHERE rn = 1
        ), docw AS (
          SELECT doc_id, i AS pos, ws[i] AS w
          FROM (SELECT doc_id, list_filter(list_transform(
              regexp_split_to_array(trim(lower(coalesce(text, ''))), '\s+'),
              x -> replace(x, chr(57344), '')), x -> x <> '') AS ws
            FROM documents) d, unnest(range(1, len(ws) + 1)) t(i))
        SELECT doc.doc_id,
          coalesce(string_agg(array_to_string(f.syms, ' '), ' '
            ORDER BY dw.pos), '') AS pieces
        FROM documents doc
        LEFT JOIN docw dw ON dw.doc_id = doc.doc_id
        LEFT JOIN final f ON f.word = dw.w
        GROUP BY doc.doc_id""")),

    // PII scrubbing: emails / IPv4s / phone-shaped runs → typed tokens,
    // with per-class counts. The corpus has no organic PII, so the query
    // plants deterministic PII derived from doc_id on both sides — the
    // OPERATOR under test is the scrub, which must behave identically in
    // both regex engines (patterns are RE2-safe by construction).
    "q_pii_scrub" -> Entry(
      (s, dir) => {
        import graft.operators.Corpus
        val planted = concat(col("text"),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com from 10.0."),
          pmod(col("doc_id"), lit(256)).cast("string"),
          lit(".7 tel 555-01"), pmod(col("doc_id"), lit(100)).cast("string"))
        val p = Corpus.scrubPii(planted)
        Q.spread(t(s, dir, "documents")).select(col("doc_id"),
          p.getField("n_emails").as("n_emails"),
          p.getField("n_ips").as("n_ips"),
          p.getField("n_phones").as("n_phones"),
          sha2(p.getField("scrubbed"), 256).as("scrubbed_sha"))
      },
      Some("""WITH planted AS (
          SELECT doc_id, text || ' contact user' || cast(doc_id as varchar)
            || '@example.com from 10.0.' || cast(doc_id % 256 as varchar)
            || '.7 tel 555-01' || cast(doc_id % 100 as varchar) AS t
          FROM documents
        ), s1 AS (
          SELECT doc_id, t,
            len(regexp_extract_all(t,
              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
              AS n_emails,
            regexp_replace(t,
              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
              '<EMAIL>', 'g') AS t1
          FROM planted
        ), s2 AS (
          SELECT doc_id, n_emails,
            len(regexp_extract_all(t1,
              '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ips,
            regexp_replace(t1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
              '<IP>', 'g') AS t2
          FROM s1)
        SELECT doc_id, cast(n_emails as bigint) AS n_emails,
          cast(n_ips as bigint) AS n_ips,
          cast(len(regexp_extract_all(t2, '\b\d{3}-\d{3,}\b')) as bigint)
            AS n_phones,
          sha256(regexp_replace(t2, '\b\d{3}-\d{3,}\b', '<PHONE>', 'g'))
            AS scrubbed_sha
        FROM s2""")),

    // URL canonicalization — the dedup-key step of web-corpus
    // curation. Like q_pii_scrub, the corpus has no organic URLs, so
    // both sides plant deterministic doc_id-derived ones (mixed case,
    // default/explicit ports, trailing slashes, tracking params,
    // fragments) and the OPERATOR under test is the normalizer
    // (functions/Url.scala — pure codegen'd Column ops, RE2-safe so
    // the identical arithmetic replays in DuckDB). Map-only scan.
    "q_url_normalize" -> Entry(
      (s, dir) => {
        import graft.functions.Url
        val id = col("doc_id")
        val url = concat(
          when(pmod(id, lit(3)) === 0, lit("HTTPS://"))
            .otherwise(lit("http://")),
          lit("WWW"), pmod(id, lit(7)).cast("string"),
          lit(".Example"), pmod(id, lit(41)).cast("string"), lit(".COM"),
          when(pmod(id, lit(5)) === 0, lit(":443")).otherwise(lit("")),
          lit("/Path/"), id.cast("string"),
          when(pmod(id, lit(2)) === 0, lit("/")).otherwise(lit("")),
          lit("?utm_source=x&b="), pmod(id, lit(9)).cast("string"),
          lit("&a=1"),
          when(pmod(id, lit(4)) === 0, lit("#frag")).otherwise(lit("")))
        // staged Project: passing the raw `url` Column into the three
        // extractors would inline the plant ~30x into one giant
        // expression tree (codegen-method blowup); behind an alias,
        // CollapseProject keeps the non-cheap multi-referenced plant
        // in its own Project
        Q.spread(t(s, dir, "documents")).select(col("doc_id"), url.as("url"))
          .select(col("doc_id"),
            Url.normalize(col("url")).as("url_norm"),
            Url.host(col("url")).as("host"),
            Url.registeredDomain(col("url")).as("domain"))
      },
      Some("""WITH planted AS (
          SELECT doc_id,
            (CASE WHEN doc_id % 3 = 0 THEN 'HTTPS://' ELSE 'http://' END
             || 'WWW' || cast(doc_id % 7 AS varchar) || '.Example'
             || cast(doc_id % 41 AS varchar) || '.COM'
             || CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END
             || '/Path/' || cast(doc_id AS varchar)
             || CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END
             || '?utm_source=x&b=' || cast(doc_id % 9 AS varchar)
             || '&a=1'
             || CASE WHEN doc_id % 4 = 0 THEN '#frag' ELSE '' END) AS url
          FROM documents
        ), parts AS (
          SELECT doc_id, url,
            lower(regexp_extract(url,
              '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS sch,
            regexp_extract(url,
              '^[A-Za-z][A-Za-z0-9+.-]*://(.*)$', 1) AS rest
          FROM planted
        ), auth AS (
          SELECT doc_id, sch, rest,
            lower(regexp_replace(regexp_replace(
              regexp_extract(rest, '^([^/?#]*)', 1),
              '^[^@]*@', ''), ':.*$', '')) AS host,
            regexp_extract(regexp_extract(rest, '^([^/?#]*)', 1),
              ':([0-9]+)$', 1) AS port,
            regexp_replace(regexp_replace(rest, '^[^/?#]*', ''),
              '#.*$', '') AS pathq
          FROM parts
        ), comp AS (
          SELECT doc_id, sch, host,
            CASE WHEN port <> '' AND NOT ((sch = 'http' AND port = '80')
                OR (sch = 'https' AND port = '443'))
              THEN host || ':' || port ELSE host END AS hostport,
            regexp_extract(pathq, '^([^?]*)', 1) AS path0,
            CASE WHEN pathq LIKE '%?%'
              THEN regexp_replace(pathq, '^[^?]*\?', '')
              ELSE '' END AS rawq
          FROM auth
        ), fin AS (
          SELECT doc_id, sch, host, hostport,
            CASE WHEN regexp_replace(path0, '/+$', '') = '' THEN '/'
              ELSE regexp_replace(path0, '/+$', '') END AS path,
            array_to_string(list_sort(list_filter(
              string_split(rawq, '&'), p -> p <> '' AND NOT
              regexp_matches(p, '^(utm_[^=]*|gclid|fbclid|ref)(=|$)'))),
              '&') AS q
          FROM comp)
        SELECT doc_id,
          sch || '://' || hostport || path ||
            CASE WHEN q = '' THEN '' ELSE '?' || q END AS url_norm,
          host,
          CASE WHEN len(string_split(host, '.')) <= 2 THEN host
            ELSE string_split(host, '.')[-2] || '.' ||
              string_split(host, '.')[-1] END AS domain
        FROM fin""")),

    // URL-keyed document dedup — the step AFTER q_url_normalize in a
    // web pipeline: crawl variants of one page (scheme/host case,
    // default port, trailing slash, tracking params, fragment — all
    // doc_id-derived noise here) collapse onto one canonical URL
    // (key = doc_id % 97), and keep-best retains the longest text,
    // ties to the oldest id. ONE partial-aggregated max_by shuffle
    // (Dedup.keepBestByKey) — no window, no self-join. The oracle
    // computes the expected CANONICAL form arithmetically (ground
    // truth, not a SQL re-implementation of the normalizer), so it
    // checks the normalizer AND the keep-best rule.
    "q_dedup_url" -> Entry(
      (s, dir) => {
        import graft.functions.Url
        // staged Project (q_url_normalize convention): the plant stays
        // behind an alias so the normalizer references ONE column
        val docs = t(s, dir, "documents")
          .select(col("doc_id"), col("n_chars"),
            plantedCrawlUrl.as("url"))
          .select(col("doc_id"), col("n_chars"),
            Url.normalize(col("url")).as("url_norm"))
        // nullsPassThrough = false: the planted URL is non-null by
        // construction, and the pass-through branch would re-evaluate
        // the whole normalizer chain a second time
        Dedup.keepBestByKey(docs, "url_norm",
          struct(col("n_chars"), -col("doc_id")),
          nullsPassThrough = false)
      },
      Some(s"""WITH norm AS (
          SELECT doc_id, n_chars, $canonicalUrlSql AS url_norm
          FROM documents)
        SELECT url_norm, doc_id, n_chars, n_dups FROM (
          SELECT url_norm, doc_id, n_chars,
            count(*) OVER (PARTITION BY url_norm) AS n_dups,
            row_number() OVER (PARTITION BY url_norm
              ORDER BY n_chars DESC, doc_id) AS rn
          FROM norm) t WHERE rn = 1""")),

    // Composed web-dedup pipeline — the two dedup stages a crawl
    // actually chains, verified END-TO-END by one oracle: normalize
    // crawl-variant URLs → keep the best capture per canonical URL
    // (longest text, oldest id) → tile survivors into 5-word
    // pseudo-paragraphs → keep-first paragraph dedup across the
    // deduped crawl. Stage interactions are the point: the paragraph
    // stage must see exactly the URL-dedup survivor set, in survivor
    // id order.
    "q_pipeline_web_dedup" -> Entry(
      (s, dir) => {
        import graft.functions.Url
        val docs = t(s, dir, "documents")
          .select(col("doc_id"), col("n_chars"), col("text"),
            plantedCrawlUrl.as("url"))
          .select(col("doc_id"), col("n_chars"), col("text"),
            Url.normalize(col("url")).as("url_norm"))
        val kept = Dedup.keepBestByKey(docs, "url_norm",
          struct(col("n_chars"), -col("doc_id")),
          nullsPassThrough = false) // planted key, non-null
        val tiled = kept.select(col("doc_id"),
          tile5(col("text")).as("text"))
        graft.operators.Corpus
          .dedupKeepFirst(tiled, "text", "doc_id", "\n")
          .select(col("doc_id"), col("text").as("cleaned"))
      },
      Some(s"""WITH norm AS (
          SELECT doc_id, n_chars, text, $canonicalUrlSql AS url_norm
          FROM documents
        ), best AS (
          SELECT doc_id, text FROM (
            SELECT doc_id, text,
              row_number() OVER (PARTITION BY url_norm
                ORDER BY n_chars DESC, doc_id) AS rn
            FROM norm) b WHERE rn = 1
        ), ds AS (
          SELECT doc_id, string_split(replace(text, chr(10), ' '), ' ') AS ws
          FROM best
        ), $tile5Sql, r AS (
          SELECT doc_id, pos, u,
            row_number() OVER (PARTITION BY u ORDER BY doc_id, pos) AS rn
          FROM ch)
        SELECT doc_id, string_agg(u, chr(10) ORDER BY pos) AS cleaned
        FROM r WHERE rn = 1 GROUP BY doc_id""")),

    // HTML → text extraction — the step before every other curation
    // operator on a web corpus. The corpus has no organic HTML, so
    // both sides plant a deterministic doc_id-derived page (script +
    // style blocks, block/inline tags, the six entities, <br>) around
    // each document's words and the OPERATOR under test is the
    // extractor (Text.html_to_text — chained RE2-safe regexp/replace
    // Column ops, map-only scan). Entity-encoded markup must survive
    // as text (&lt;tag&gt; → literal '<tag>', decoded AFTER the tag
    // strip), &amp; decodes last.
    "q_text_html_strip" -> Entry(
      (s, dir) => {
        val id = col("doc_id")
        val w = split(trim(col("text")), " ")
        val html = concat(
          lit("<!DOCTYPE html><html><head><style type=\"text/css\">" +
            "body { color: #fff; }</style>"),
          lit("<script>if (2 < "), pmod(id, lit(7)).cast("string"),
          lit(") { document.write(\"x\"); }</script>"),
          lit("<title>Doc "), id.cast("string"),
          lit("</title></head><body>"),
          lit("<h1 class=\"t\">Doc &quot;"), id.cast("string"),
          lit("&quot;</h1><p>"),
          array_join(slice(w, 1, 6), " "),
          lit(" &amp; "), array_join(slice(w, 7, 4), " "),
          lit("&nbsp;&lt;tag&gt;</p><ul><li>"),
          array_join(slice(w, 11, 3), " "),
          lit("</li><li>"), array_join(slice(w, 14, 3), " "),
          lit("</li></ul><div id=\"d1\">"),
          array_join(slice(w, 17, 5), " "),
          lit("<br/>tail &#39;q&#39;</div></body></html>"))
        // staged Project (q_url_normalize convention): the plant stays
        // behind an alias so the extractor chain references ONE column
        Q.spread(t(s, dir, "documents")).select(id, html.as("html"))
          .select(col("doc_id"),
            Text.html_to_text(col("html")).as("txt"))
          .select(col("doc_id"), col("txt"),
            length(col("txt")).cast("long").as("n_chars"))
      },
      Some("""WITH planted AS (
          SELECT doc_id,
            '<!DOCTYPE html><html><head><style type="text/css">body { color: #fff; }</style>'
            || '<script>if (2 < ' || cast(doc_id % 7 AS varchar)
            || ') { document.write("x"); }</script>'
            || '<title>Doc ' || cast(doc_id AS varchar)
            || '</title></head><body>'
            || '<h1 class="t">Doc &quot;' || cast(doc_id AS varchar)
            || '&quot;</h1><p>'
            || coalesce(array_to_string((string_split(trim(text), ' '))[1:6], ' '), '')
            || ' &amp; '
            || coalesce(array_to_string((string_split(trim(text), ' '))[7:10], ' '), '')
            || '&nbsp;&lt;tag&gt;</p><ul><li>'
            || coalesce(array_to_string((string_split(trim(text), ' '))[11:13], ' '), '')
            || '</li><li>'
            || coalesce(array_to_string((string_split(trim(text), ' '))[14:16], ' '), '')
            || '</li></ul><div id="d1">'
            || coalesce(array_to_string((string_split(trim(text), ' '))[17:21], ' '), '')
            || '<br/>tail &#39;q&#39;</div></body></html>' AS html
          FROM documents
        ), s1 AS (
          SELECT doc_id, regexp_replace(html,
            '(?is)<(?:script|style)[^>]*>.*?</(?:script|style)\s*>',
            ' ', 'g') AS x
          FROM planted
        ), s2 AS (
          SELECT doc_id, regexp_replace(x,
            '(?i)<(?:br\s*/?|/p|/div|/h[1-6]|/li|/tr|/ul|/ol|/table)\s*>',
            chr(10), 'g') AS x
          FROM s1
        ), s3 AS (
          SELECT doc_id, regexp_replace(x, '<[^>]+>', ' ', 'g') AS x
          FROM s2
        ), s4 AS (
          SELECT doc_id, replace(replace(replace(replace(replace(replace(x,
            '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
            '&nbsp;', ' '), '&amp;', '&') AS x
          FROM s3
        ), s5 AS (
          SELECT doc_id,
            regexp_replace(regexp_replace(regexp_replace(x,
              '[ \t\r]+', ' ', 'g'),
              ' *\n *', chr(10), 'g'),
              '\n{3,}', chr(10) || chr(10), 'g') AS x
          FROM s4
        ), fin AS (
          SELECT doc_id,
            regexp_replace(x, '^\s+|\s+$', '', 'g') AS txt
          FROM s5)
        SELECT doc_id, txt, cast(length(txt) as bigint) AS n_chars
        FROM fin""")),

    // Unicode NFC normalization (plans/TextExpressions.scala
    // UnicodeNormalizeExpr) — the transform every published pipeline
    // runs before tokenizing/shingling so decomposed and precomposed
    // text dedups identically. The corpus is ASCII (which must ride
    // the no-alloc fast path unchanged), so both sides plant the same
    // doc_id-selected canonical-equivalence suffixes: combining acute
    // (e+U+0301→é), angstrom sign (U+212B→Å) + o+diaeresis, Hangul
    // jamo composition (U+1100 U+1161 U+11A8→각), ohm sign
    // (U+2126→Ω), and a pure-ASCII control. Oracle: DuckDB's
    // utf8proc-backed nfc_normalize — an independent UAX #15
    // implementation, so the hash compare cross-checks the JDK
    // normalizer against utf8proc, not the kernel against itself.
    // Map-only scan; NFKC/NFD forms are spec-covered (DuckDB only
    // exposes NFC).
    "q_text_unicode_norm" -> Entry(
      (s, dir) => {
        import graft.plans.TextExpressions.unicode_normalize
        val id = col("doc_id")
        // decomposed plants, ASCII-escaped in source (the raw side
        // must match the oracle's chr() construction byte-for-byte;
        // precomposed literals would already be NFC)
        val planted = concat(col("text"), lit(" "),
          when(pmod(id, lit(5)) === 0, lit("café"))
            .when(pmod(id, lit(5)) === 1,
              lit("Ångström"))
            .when(pmod(id, lit(5)) === 2, lit("각"))
            .when(pmod(id, lit(5)) === 3, lit("Ω ohm"))
            .otherwise(lit("plain ascii")))
        // staged Projects (q_url_normalize convention): plant and
        // normalized form each computed once behind an alias
        t(s, dir, "documents").select(id, planted.as("t"))
          .select(col("doc_id"), col("t"),
            unicode_normalize(col("t")).as("nfc"))
          .select(col("doc_id"), sha2(col("nfc"), 256).as("nfc_sha"),
            length(col("nfc")).cast("long").as("nfc_chars"),
            length(col("t")).cast("long").as("raw_chars"),
            (col("nfc") === col("t")).cast("int").as("already_nfc"))
      },
      Some("""WITH planted AS (
          SELECT doc_id, text || ' ' ||
            CASE doc_id % 5
              WHEN 0 THEN 'cafe' || chr(769)
              WHEN 1 THEN chr(8491) || 'ngstro' || chr(776) || 'm'
              WHEN 2 THEN chr(4352) || chr(4449) || chr(4520)
              WHEN 3 THEN chr(8486) || ' ohm'
              ELSE 'plain ascii' END AS t
          FROM documents)
        SELECT doc_id, sha256(nfc_normalize(t)) AS nfc_sha,
          cast(length(nfc_normalize(t)) as bigint) AS nfc_chars,
          cast(length(t) as bigint) AS raw_chars,
          cast(nfc_normalize(t) = t as int) AS already_nfc
        FROM planted""")),

    // Mojibake repair (plans/TextExpressions.scala FixMojibakeExpr —
    // the ftfy fix_encoding core case): UTF-8 read as windows-1252
    // upstream, so é arrives as Ã©. The Spark side runs the GENERIC
    // round-trip repairer on planted corruptions; DuckDB plants the
    // independently-constructed expected outputs — the hash compare
    // proves the kernel inverts each corruption rather than
    // pattern-matching it. Cases (doc_id%7): single-encoded é/’/ü/…
    // (the last two exercising cp1252's 0x80–0x9F punctuation block),
    // DOUBLE-encoded é (two fixpoint rounds), legitimate precomposed
    // café (must NOT change — 0xE9 never round-trips as UTF-8), pure
    // ASCII (fast path). Map-only scan.
    "q_text_fix_mojibake" -> Entry(
      (s, dir) => {
        import graft.plans.TextExpressions.fix_mojibake
        val id = col("doc_id")
        val planted = concat(col("text"), lit(" "),
          when(pmod(id, lit(7)) === 0, lit("cafÃ©"))
            .when(pmod(id, lit(7)) === 1, lit("donâ€™t"))
            .when(pmod(id, lit(7)) === 2, lit("Ã¼ber"))
            .when(pmod(id, lit(7)) === 3, lit("â€¦end"))
            .when(pmod(id, lit(7)) === 4, lit("ÃƒÂ©"))
            .when(pmod(id, lit(7)) === 5, lit("café"))
            .otherwise(lit("plain ascii")))
        t(s, dir, "documents").select(id, planted.as("t"))
          .select(id, col("t"), fix_mojibake(col("t")).as("fx"))
          .select(id, sha2(col("fx"), 256).as("fixed_sha"),
            length(col("fx")).cast("long").as("fixed_chars"),
            (col("fx") =!= col("t")).cast("int").as("changed"))
      },
      Some("""WITH planted AS (
          SELECT doc_id, text || ' ' ||
            CASE doc_id % 7
              WHEN 0 THEN 'caf' || chr(195) || chr(169)
              WHEN 1 THEN 'don' || chr(226) || chr(8364) || chr(8482) || 't'
              WHEN 2 THEN chr(195) || chr(188) || 'ber'
              WHEN 3 THEN chr(226) || chr(8364) || chr(166) || 'end'
              WHEN 4 THEN chr(195) || chr(402) || chr(194) || chr(169)
              WHEN 5 THEN 'caf' || chr(233)
              ELSE 'plain ascii' END AS t,
            text || ' ' ||
            CASE doc_id % 7
              WHEN 0 THEN 'caf' || chr(233)
              WHEN 1 THEN 'don' || chr(8217) || 't'
              WHEN 2 THEN chr(252) || 'ber'
              WHEN 3 THEN chr(8230) || 'end'
              WHEN 4 THEN chr(233)
              WHEN 5 THEN 'caf' || chr(233)
              ELSE 'plain ascii' END AS fx
          FROM documents)
        SELECT doc_id, sha256(fx) AS fixed_sha,
          cast(length(fx) as bigint) AS fixed_chars,
          cast(fx != t as int) AS changed
        FROM planted""")),

    // Winnowing document fingerprints (plans/TextExpressions.scala
    // WinnowFingerprintsExpr — Schleimer et al. MOSS): Karp-Rabin
    // rolling hashes over 8-codepoint windows, min-of-4 winnow,
    // distinct sorted picks. Runs on the RAW corpus text — no
    // planting; the oracle recomputes every window hash from scratch
    // with DuckDB list_reduce modular arithmetic (O(n·w) replay of the
    // kernel's O(n) roll), so the hash compare proves the rolling
    // update against the definition. Map-only scan; the long array
    // serializes via join (arrays hash engine-dependently).
    "q_text_winnow_fps" -> Entry(
      (s, dir) => {
        import graft.plans.TextExpressions.winnow_fingerprints
        Q.spread(t(s, dir, "documents")).select(col("doc_id"),
          winnow_fingerprints(col("text"), 8, 4).as("fp"))
          .select(col("doc_id"),
            size(col("fp")).cast("long").as("n_fps"),
            array_join(transform(col("fp"), x => x.cast("string")), ",")
              .as("fps"))
      },
      Some("""WITH cps AS (
          SELECT doc_id,
            list_transform(regexp_extract_all(text, '[\s\S]'),
              c -> cast(unicode(c) as bigint)) AS cp
          FROM documents
        ), hs AS (
          SELECT doc_id,
            CASE WHEN len(cp) = 0 THEN CAST([] AS BIGINT[])
              WHEN len(cp) < 8 THEN [list_reduce(cp,
                (a, c) -> (a * 257 + c) % 1000000007)]
              ELSE list_transform(range(1, len(cp) - 6),
                i -> list_reduce(cp[i:i+7],
                  (a, c) -> (a * 257 + c) % 1000000007))
              END AS hh
          FROM cps
        ), fps AS (
          SELECT doc_id,
            CASE WHEN len(hh) = 0 THEN CAST([] AS BIGINT[])
              WHEN len(hh) < 4 THEN [list_aggregate(hh, 'min')]
              ELSE list_sort(list_distinct(
                list_transform(range(1, len(hh) - 2),
                  p -> list_aggregate(hh[p:p+3], 'min'))))
              END AS fp
          FROM hs)
        SELECT doc_id, cast(len(fp) as bigint) AS n_fps,
          array_to_string(fp, ',') AS fps
        FROM fps""")),

    // Cross-doc overlap pairs over winnowing fingerprints
    // (Dedup.winnowOverlapPairs) — substring-grade near-copy detection,
    // the fingerprint's purpose: at w=24 (≈4 words) the 31-word
    // synthetic vocabulary stops colliding and the report isolates the
    // corpus's true near-dup pairs (~30 at sf0.001); at w=8 EVERYTHING
    // overlaps — window size is the semantic dial, documented in the
    // operator. Capped-bucket equi-join (maxBucket=64 drops
    // boilerplate picks), partial-agg pair counts, minShared=4 floor.
    "q_dedup_winnow_pairs" -> Entry(
      // spreadBy(doc_id): after the r17 bucket restructure the scan →
      // winnow-kernel → partial bucket agg runs as ONE map stage, so
      // on the single-row-group test parquet it was one task (profiled
      // 0.95 s of a 1.37 s wall); the keyed respread parallelizes it
      // and is a no-op on a well-split corpus (Q.spread contract)
      (s, dir) => graft.operators.Dedup.winnowOverlapPairs(
        Q.spreadBy(t(s, dir, "documents"), col("doc_id")),
        "text", "doc_id"),
      Some(s"""WITH $winnowPairsCtes
        SELECT id1, id2, n_shared FROM wpairs""")),

    // Winnow-overlap purge (Dedup.removeWinnowOverlaps): the remove
    // step over those pairs — connected components by iterative
    // min-label propagation, component representatives survive (the
    // q_dedup_purge policy, oracle'd by the same recursive-CTE
    // transitive closure). Detect→cluster→remove for the
    // substring-grade family.
    "q_dedup_winnow_purge" -> Entry(
      // spreadBy(doc_id): same single-task kernel stage as
      // q_dedup_winnow_pairs (the pairs pipeline runs eagerly inside
      // the components probe)
      (s, dir) => graft.operators.Dedup.removeWinnowOverlaps(
          Q.spreadBy(t(s, dir, "documents"), col("doc_id")),
          "text", "doc_id")
        .select(col("doc_id")),
      Some(s"""WITH RECURSIVE $winnowPairsCtes,
        edges AS (
          SELECT id1 AS a, id2 AS b FROM wpairs
          UNION SELECT id2, id1 FROM wpairs),
        reach(id, r) AS (
          SELECT DISTINCT a, a FROM edges
          UNION
          SELECT e.a, r.r FROM edges e JOIN reach r ON r.id = e.b),
        dropped AS (
          SELECT id FROM (SELECT id, min(r) AS c FROM reach GROUP BY id)
          WHERE c <> id)
        SELECT doc_id FROM documents
        WHERE doc_id NOT IN (SELECT id FROM dropped)""")),

    // Unicode-script profile (plans/TextExpressions.scala
    // ScriptCountsExpr + Text.scriptFractions): per-script letter
    // fractions + dominant script — the multilingual routing gate that
    // runs BEFORE langid in CCNet/mC4-style pipelines. The corpus is
    // ASCII, so non-%6=0 docs plant a repeated non-Latin body ahead of
    // two Latin words (dominance flips, fractions stay mixed). Oracle
    // cross-checks the JDK's Character.UnicodeScript table against
    // RE2's \p{Script} classes — two independent implementations of
    // the Unicode Script property. One fused kernel pass per row
    // (ASCII rows never decode), map-only scan.
    "q_text_script_profile" -> Entry(
      (s, dir) => {
        import graft.plans.TextExpressions.script_counts
        val id = col("doc_id")
        val w = split(trim(col("text")), " ")
        val two = array_join(slice(w, 1, 2), " ")
        val planted = when(pmod(id, lit(6)) === 0, col("text"))
          .when(pmod(id, lit(6)) === 1,
            concat(repeat(lit("привет мир "), 8), two))
          .when(pmod(id, lit(6)) === 2,
            concat(repeat(lit("αβγδ εζ "), 8), two))
          .when(pmod(id, lit(6)) === 3,
            concat(repeat(lit("مرحبا بكم "), 8), two))
          .when(pmod(id, lit(6)) === 4,
            concat(repeat(lit("中文漢字 "), 8), two))
          .otherwise(concat(repeat(lit("한국어 글 "), 8), two))
        val f = Text.scriptFractions(col("c"))
        Q.spread(t(s, dir, "documents")).select(id, planted.as("t"))
          .select(id, script_counts(col("t")).as("c"))
          .select(id, f.as("f"))
          .select(id,
            col("f.n_letters").as("n_letters"),
            col("f.latin_frac").as("latin_frac"),
            col("f.cyrillic_frac").as("cyrillic_frac"),
            col("f.greek_frac").as("greek_frac"),
            col("f.arabic_frac").as("arabic_frac"),
            col("f.han_frac").as("han_frac"),
            col("f.hangul_frac").as("hangul_frac"),
            col("f.other_frac").as("other_frac"),
            col("f.dominant").as("dominant"))
      },
      Some("""WITH parts AS (
          SELECT doc_id, text,
            coalesce(array_to_string(
              (string_split(trim(text), ' '))[1:2], ' '), '') AS two
          FROM documents
        ), planted AS (
          SELECT doc_id,
            CASE doc_id % 6
              WHEN 0 THEN text
              WHEN 1 THEN repeat('привет мир ', 8) || two
              WHEN 2 THEN repeat('αβγδ εζ ', 8) || two
              WHEN 3 THEN repeat('مرحبا بكم ', 8) || two
              WHEN 4 THEN repeat('中文漢字 ', 8) || two
              ELSE repeat('한국어 글 ', 8) || two END AS t
          FROM parts
        ), m AS (
          SELECT doc_id,
            cast(len(regexp_extract_all(t, '\pL')) as bigint) AS nl,
            cast(len(regexp_extract_all(t, '\p{Latin}')) as bigint) AS lat,
            cast(len(regexp_extract_all(t, '\p{Cyrillic}')) as bigint) AS cyr,
            cast(len(regexp_extract_all(t, '\p{Greek}')) as bigint) AS grk,
            cast(len(regexp_extract_all(t, '\p{Arabic}')) as bigint) AS ara,
            cast(len(regexp_extract_all(t, '\p{Han}')) as bigint) AS han,
            cast(len(regexp_extract_all(t, '\p{Hangul}')) as bigint) AS hang
          FROM planted
        ), m2 AS (
          SELECT *, nl - lat - cyr - grk - ara - han - hang AS oth
          FROM m)
        SELECT doc_id, nl AS n_letters,
          round(CASE WHEN nl > 0 THEN lat / nl ELSE 0 END, 4) AS latin_frac,
          round(CASE WHEN nl > 0 THEN cyr / nl ELSE 0 END, 4)
            AS cyrillic_frac,
          round(CASE WHEN nl > 0 THEN grk / nl ELSE 0 END, 4) AS greek_frac,
          round(CASE WHEN nl > 0 THEN ara / nl ELSE 0 END, 4) AS arabic_frac,
          round(CASE WHEN nl > 0 THEN han / nl ELSE 0 END, 4) AS han_frac,
          round(CASE WHEN nl > 0 THEN hang / nl ELSE 0 END, 4)
            AS hangul_frac,
          round(CASE WHEN nl > 0 THEN oth / nl ELSE 0 END, 4) AS other_frac,
          CASE WHEN nl = 0 THEN 'none'
            WHEN lat >= cyr AND lat >= grk AND lat >= ara AND lat >= han
              AND lat >= hang AND lat >= oth THEN 'latin'
            WHEN cyr >= grk AND cyr >= ara AND cyr >= han AND cyr >= hang
              AND cyr >= oth THEN 'cyrillic'
            WHEN grk >= ara AND grk >= han AND grk >= hang AND grk >= oth
              THEN 'greek'
            WHEN ara >= han AND ara >= hang AND ara >= oth THEN 'arabic'
            WHEN han >= hang AND han >= oth THEN 'han'
            WHEN hang >= oth THEN 'hangul'
            ELSE 'other' END AS dominant
        FROM m2""")),

    // C4-style line-level quality filter (Corpus.c4FilterLines): keep
    // prose-shaped lines (≥3 words, terminal punctuation, no
    // javascript/lorem-ipsum/cookie chrome, no '{'), drop docs left
    // with <2 surviving lines. The corpus is single-line, so both
    // sides plant the same six doc_id-derived lines — one passes every
    // rule, four each violate exactly one rule, and the last flips on
    // doc_id%4 so the DOC gate fires for 3/4 of the corpus. The whole
    // operator is one higher-order filter in a scan: no explode, no
    // shuffle.
    // Composed text-normalization front: mojibake repair → NFC →
    // script-dominance gate, under ONE oracle — the stage ordering is
    // the point (encoding damage must be undone BEFORE normalization
    // or the mojibake fossilizes; the script gate must see normalized
    // text). Case %5=2 exercises the full chain: mojibake of the
    // angstrom SIGN fixes to U+212B, which only then NFC-folds to Å.
    // DuckDB replays NFC (utf8proc) and the script gate (RE2 \p{Xxx})
    // genuinely — only the mojibake inverse is planted. All three
    // stages are map-only kernels in one scan: zero shuffle.
    "q_pipeline_text_normalize" -> Entry(
      (s, dir) => {
        import graft.plans.TextExpressions.{fix_mojibake,
          unicode_normalize, script_counts}
        val id = col("doc_id")
        val w = split(trim(col("text")), " ")
        val two = array_join(slice(w, 1, 2), " ")
        val planted = when(pmod(id, lit(5)) === 0,
            concat(col("text"), lit(" cafÃ©")))
          .when(pmod(id, lit(5)) === 1,
            concat(col("text"), lit(" café")))
          .when(pmod(id, lit(5)) === 2,
            concat(col("text"), lit(" â„«ngstrom")))
          .when(pmod(id, lit(5)) === 3,
            concat(repeat(lit("привет мир "), 8), two))
          .otherwise(concat(col("text"), lit(" plain ascii")))
        // spread: mojibake+NFC+script kernels per row (Q.spread) — the
        // one-row-group test scan otherwise runs the whole chain on a
        // single task. The two kernel stages are pinned with
        // StageBarrier.stage: the script-gate filter otherwise pushes
        // below the respread exchange with the whole kernel chain
        // substituted into its condition (§4.4 double evaluation).
        import graft.plans.StageBarrier.stage
        Q.spread(t(s, dir, "documents")).select(id, planted.as("raw"))
          .select(id,
            stage(unicode_normalize(fix_mojibake(col("raw")))).as("t"))
          .select(id, col("t"), stage(script_counts(col("t"))).as("c"))
          .select(id, col("t"),
            Text.scriptFractions(col("c")).as("f"))
          .filter(col("f.dominant") === "latin")
          .select(id, sha2(col("t"), 256).as("final_sha"),
            col("f.n_letters").as("n_letters"))
      },
      Some("""WITH parts AS (
          SELECT doc_id, text,
            coalesce(array_to_string(
              (string_split(trim(text), ' '))[1:2], ' '), '') AS two
          FROM documents
        ), planted AS (
          SELECT doc_id,
            CASE doc_id % 5
              WHEN 0 THEN text || ' caf' || chr(233)
              WHEN 1 THEN text || ' cafe' || chr(769)
              WHEN 2 THEN text || ' ' || chr(8491) || 'ngstrom'
              WHEN 3 THEN repeat('привет мир ', 8) || two
              ELSE text || ' plain ascii' END AS fixed
          FROM parts
        ), norm AS (
          SELECT doc_id, nfc_normalize(fixed) AS t FROM planted
        ), m AS (
          SELECT doc_id, t,
            cast(len(regexp_extract_all(t, '\pL')) as bigint) AS nl,
            cast(len(regexp_extract_all(t, '\p{Latin}')) as bigint) AS lat,
            cast(len(regexp_extract_all(t, '\p{Cyrillic}')) as bigint) AS cyr,
            cast(len(regexp_extract_all(t, '\p{Greek}')) as bigint) AS grk,
            cast(len(regexp_extract_all(t, '\p{Arabic}')) as bigint) AS ara,
            cast(len(regexp_extract_all(t, '\p{Han}')) as bigint) AS han,
            cast(len(regexp_extract_all(t, '\p{Hangul}')) as bigint) AS hang
          FROM norm
        ), m2 AS (
          SELECT *, nl - lat - cyr - grk - ara - han - hang AS oth FROM m)
        SELECT doc_id, sha256(t) AS final_sha, nl AS n_letters
        FROM m2
        WHERE nl > 0 AND lat >= cyr AND lat >= grk AND lat >= ara
          AND lat >= han AND lat >= hang AND lat >= oth""")),

    // Composed normalize→fingerprint (README's 100 TB ordering note,
    // pinned): the SAME content arrives three ways per 3-doc group —
    // mojibake'd (cafÃ©), NFC-decomposed (cafe+U+0301), clean
    // precomposed — and the winnow fingerprints are computed AFTER
    // fix_mojibake→NFC, so all three variants converge to identical
    // fingerprint sets and winnowOverlapPairs reports every within-
    // group pair. A future kernel reorder (NFC before repair, or
    // fingerprinting raw text) breaks the convergence and the hash.
    // Oracle: mojibake inverse planted (the q_text_fix_mojibake
    // convention), NFC replayed genuinely (utf8proc), every rolling
    // hash + winnow pick + bucket cap + pair floor recomputed from the
    // definition over the normalized CTE.
    "q_pipeline_normalize_fingerprint" -> Entry(
      (s, dir) => {
        import graft.plans.TextExpressions.{fix_mojibake,
          unicode_normalize}
        val id = col("doc_id")
        val g = ((id - pmod(id, lit(3))) / 3).cast("long")
        val marker = when(pmod(id, lit(3)) === 0,
            lit("caf\u00c3\u00a9"))
          .when(pmod(id, lit(3)) === 1, lit("cafe\u0301"))
          .otherwise(lit("caf\u00e9"))
        val base = concat_ws(" ",
          md5(concat(g.cast("string"), lit(":a"))),
          md5(concat(g.cast("string"), lit(":b"))),
          marker,
          md5(concat(g.cast("string"), lit(":c"))))
        val docs = t(s, dir, "documents").select(id,
          unicode_normalize(fix_mojibake(base)).as("text"))
        graft.operators.Dedup.winnowOverlapPairs(docs, "text", "doc_id")
          .select(col("id1"), col("id2"), col("n_shared"))
      },
      Some(s"""WITH nsrc AS (
          SELECT doc_id, nfc_normalize(
            md5(cast(doc_id // 3 as varchar) || ':a') || ' ' ||
            md5(cast(doc_id // 3 as varchar) || ':b') || ' ' ||
            CASE doc_id % 3
              WHEN 0 THEN 'caf' || chr(233)
              WHEN 1 THEN 'cafe' || chr(769)
              ELSE 'caf' || chr(233) END || ' ' ||
            md5(cast(doc_id // 3 as varchar) || ':c')) AS text
          FROM documents),
        ${winnowPairCtesOver("nsrc")}
        SELECT id1, id2, n_shared FROM wpairs""")),

    // Composed end-to-end web curation: domain blocklist → flagged-
    // wordlist gate → within-doc line dedup → cross-doc keep-first,
    // under ONE oracle — stage interactions are the point (keep-first
    // sees exactly the gated survivors' deduped lines; a doc dropped
    // by the blocklist must not donate a "first occurrence"). The
    // flagged word 'dup' hits ~5% of docs; tier3 blocks 25%.
    "q_pipeline_web_curation" -> Entry(
      (s, dir) => {
        import s.implicits._
        val id = col("doc_id")
        val url = concat(lit("https://"),
          when(pmod(id, lit(3)) === 0, lit("sub.")).otherwise(lit("")),
          lit("site"), pmod(id, lit(10)).cast("string"),
          lit(".tier"), pmod(id, lit(4)).cast("string"),
          lit(".example.com/p/"), id.cast("string"))
        val w = split(trim(col("text")), " ")
        val body = concat_ws("\n",
          array_join(slice(w, 1, 4), " "),
          array_join(slice(w, 5, 3), " "),
          array_join(slice(w, 1, 4), " "),
          array_join(slice(w, 8, 5), " "))
        val docs = t(s, dir, "documents")
          .select(id, col("text"), url.as("url"), body.as("body"))
        val gated = graft.operators.Corpus.filterFlaggedWords(
          graft.operators.Corpus.filterDomainBlocklist(docs, "url",
            Seq("tier3.example.com").toDF("domain")),
          "text", Seq("dup"))
        val within = graft.operators.Corpus.dedupUnitsWithinDoc(
          gated.select(col("doc_id"), col("body")), "body", "doc_id")
        graft.operators.Corpus.dedupKeepFirst(
          within.select(col("doc_id"), col("clean_text")),
          "clean_text", "doc_id")
      },
      Some("""WITH u AS (
          SELECT doc_id, text,
            (CASE WHEN doc_id % 3 = 0 THEN 'sub.' ELSE '' END)
              || 'site' || (doc_id % 10) || '.tier' || (doc_id % 4)
              || '.example.com' AS host
          FROM documents
        ), surv AS (
          SELECT doc_id, text FROM u
          WHERE NOT (host = 'tier3.example.com'
              OR host LIKE '%.tier3.example.com')
            AND (text IS NULL OR NOT list_has_any(
              regexp_split_to_array(lower(text), '[^a-z0-9'']+'),
              ['dup']))
        ), planted AS (
          SELECT doc_id, concat_ws(chr(10),
            coalesce(array_to_string((string_split(trim(text), ' '))[1:4], ' '), ''),
            coalesce(array_to_string((string_split(trim(text), ' '))[5:7], ' '), ''),
            coalesce(array_to_string((string_split(trim(text), ' '))[1:4], ' '), ''),
            coalesce(array_to_string((string_split(trim(text), ' '))[8:12], ' '), ''))
            AS body
          FROM surv
        ), wdd AS (
          SELECT doc_id,
            list_filter(ls, (x, i) -> list_position(ls, x) = i) AS ks
          FROM (SELECT doc_id, string_split(body, chr(10)) AS ls
                FROM planted) w
        ), units AS (
          SELECT doc_id, i AS pos, ks[i] AS u
          FROM wdd, unnest(range(1, len(ks) + 1)) AS t(i)
        ), r AS (
          SELECT doc_id, pos, u,
            row_number() OVER (PARTITION BY u ORDER BY doc_id, pos) AS rn
          FROM units)
        SELECT doc_id, string_agg(u, chr(10) ORDER BY pos) AS clean_text
        FROM r WHERE rn = 1 GROUP BY doc_id""")),
    // Paragraph-level NEAR dedup (Dolma rule): two planted units per
    // doc cluster corpus-wide by verified Jaccard >= 0.4 (the
    // perturbed-twin corpus makes real near-dup unit pairs); each
    // cluster keeps its first (doc, pos) member, docs rebuild in unit
    // order. Runs the exactCandidates mode, so the oracle's brute-
    // force unit-pair Jaccard + recursive closure + min-member keep is
    // the operator's semantics BY CONSTRUCTION — no banding-recall
    // assumption (which measurably fails at unit granularity here,
    // unlike q_dedup_minhash's doc-level corpus).
    "q_corpus_paragraph_near_dedup" -> Entry(
      (s, dir) => {
        val w = split(trim(col("text")), " ")
        val body = concat_ws("\n",
          array_join(slice(w, 1, 8), " "),
          array_join(slice(w, 9, 7), " "))
        // exactCandidates: the kept set must be a pure function of
        // the corpus for the brute-force oracle (LSH recall at J≈0.4
        // is probabilistic — measured misses at unit granularity)
        graft.operators.Corpus.nearDedupUnits(
          // spreadBy(doc_id): parallel unit tiling + shingling (the
          // map stage is single-task on the one-row-group test scan)
          Q.spreadBy(t(s, dir, "documents"), col("doc_id"))
            .select(col("doc_id"), body.as("body")),
          "body", "doc_id", exactCandidates = true)
      },
      Some("""WITH RECURSIVE planted AS (
          SELECT doc_id,
            coalesce(array_to_string((string_split(trim(text), ' '))[1:8], ' '), '') AS u1,
            coalesce(array_to_string((string_split(trim(text), ' '))[9:15], ' '), '') AS u2
          FROM documents
        ), uid AS (
          SELECT doc_id * 1000000 + 0 AS uid, doc_id, 0 AS pos, u1 AS u
          FROM planted
          UNION ALL
          SELECT doc_id * 1000000 + 1, doc_id, 1, u2 FROM planted
        ), words AS (
          SELECT uid, regexp_split_to_array(trim(lower(u)), '\s+') AS ws
          FROM uid
        ), sh AS (
          SELECT DISTINCT uid,
            CASE WHEN len(ws) <= 3 THEN array_to_string(ws, ' ')
            ELSE array_to_string(list_slice(ws, i, i+2), ' ') END AS s
          FROM words, unnest(CASE WHEN len(ws) <= 3 THEN [1]
            ELSE range(1, len(ws)-1) END) AS t(i)
        ), sizes AS (SELECT uid, count(*) AS n FROM sh GROUP BY 1),
        inter AS (
          SELECT a.uid AS id1, b.uid AS id2, count(*) AS i
          FROM sh a JOIN sh b ON a.s = b.s AND a.uid < b.uid
          GROUP BY 1, 2),
        pairs AS (
          SELECT id1, id2, round(i / (sa.n + sb.n - i), 3) AS jaccard
          FROM inter
          JOIN sizes sa ON sa.uid = id1
          JOIN sizes sb ON sb.uid = id2
          WHERE jaccard >= 0.4),
        edges AS (
          SELECT id1 AS a, id2 AS b FROM pairs
          UNION SELECT id2, id1 FROM pairs),
        reach(id, r) AS (
          SELECT DISTINCT a, a FROM edges
          UNION
          SELECT e.a, r.r FROM edges e JOIN reach r ON r.id = e.b),
        comp AS (SELECT id, min(r) AS c FROM reach GROUP BY 1),
        kept AS (
          SELECT u.doc_id, u.pos, u.u FROM uid u
          LEFT JOIN comp ON comp.id = u.uid
          WHERE comp.id IS NULL OR comp.c = u.uid)
        SELECT doc_id,
          array_to_string(list(u ORDER BY pos), chr(10)) AS body
        FROM kept GROUP BY doc_id""")),
    // Within-document line dedup (FineWeb page cleanup): repeated
    // lines keep their first occurrence INSIDE each doc, order kept,
    // no cross-doc semantics — one higher-order filter, zero shuffle.
    // The plant repeats two lines at arbitrary offsets; both engines
    // run first-position-wins over the same 1-based list positions.
    "q_corpus_within_doc_dedup" -> Entry(
      (s, dir) => {
        val w = split(trim(col("text")), " ")
        val l1 = array_join(slice(w, 1, 4), " ")
        val l2 = array_join(slice(w, 5, 3), " ")
        val l3 = array_join(slice(w, 8, 5), " ")
        val body = concat_ws("\n", l1, l2, l1, l3, l2, l1)
        graft.operators.Corpus.dedupUnitsWithinDoc(
          Q.spread(t(s, dir, "documents")).select(col("doc_id"),
            body.as("body")),
          "body", "doc_id")
      },
      Some("""WITH planted AS (
          SELECT doc_id,
            concat_ws(chr(10),
              coalesce(array_to_string((string_split(trim(text), ' '))[1:4], ' '), ''),
              coalesce(array_to_string((string_split(trim(text), ' '))[5:7], ' '), ''),
              coalesce(array_to_string((string_split(trim(text), ' '))[1:4], ' '), ''),
              coalesce(array_to_string((string_split(trim(text), ' '))[8:12], ' '), ''),
              coalesce(array_to_string((string_split(trim(text), ' '))[5:7], ' '), ''),
              coalesce(array_to_string((string_split(trim(text), ' '))[1:4], ' '), ''))
              AS body
          FROM documents
        ), u AS (
          SELECT doc_id, string_split(body, chr(10)) AS ls FROM planted)
        SELECT doc_id,
          array_to_string(
            list_filter(ls, (x, i) -> list_position(ls, x) = i),
            chr(10)) AS clean_text,
          cast(len(ls) - len(
            list_filter(ls, (x, i) -> list_position(ls, x) = i))
            AS bigint) AS n_units_removed
        FROM u""")),

    // Boilerplate audit report (Corpus.topDuplicatedUnits): the
    // most-duplicated 5-word tiles with occurrence + doc counts — the
    // table FineWeb/Dolma publish before turning keep-first loose.
    // doc_id%4=0 docs carry the planted crawl footer (substrFooter
    // convention), whose tiles dominate the report across the 5
    // word-count-mod-5 alignment phases — the real-world effect that
    // motivates substring dedup. Two partial-agg exchanges ((u,doc)
    // then (u)), global top-k via TakeOrderedAndProject; count-2 ties
    // at the k-boundary break on the unit string, so the cut is
    // deterministic on both engines.
    "q_corpus_boilerplate_topk" -> Entry(
      (s, dir) => {
        val planted = Q.spread(t(s, dir, "documents")).select(col("doc_id"),
          when(pmod(col("doc_id"), lit(4)) === 0,
            concat(col("text"), lit(" " + substrFooter)))
            .otherwise(col("text")).as("text"))
        graft.operators.Corpus.topDuplicatedUnits(
          planted, "doc_id", tile5(col("text")), 100)
      },
      Some(s"""WITH planted AS (
          SELECT doc_id, CASE WHEN doc_id % 4 = 0
            THEN text || ' $substrFooter' ELSE text END AS text
          FROM documents
        ), ds AS (
          SELECT doc_id,
            string_split(replace(text, chr(10), ' '), ' ') AS ws
          FROM planted
        ), $tile5Sql
        SELECT u, cast(count(*) as bigint) AS n_occurrences,
          cast(count(DISTINCT doc_id) as bigint) AS n_docs
        FROM ch GROUP BY u
        HAVING count(*) >= 2
        ORDER BY n_occurrences DESC, u LIMIT 100""")),

    // C4-style flagged-wordlist document filter: exact word-boundary
    // match after lower + non-alnum split (never substring), list as
    // one constant-folded array literal — map-only, no shuffle. The
    // mixed-case entry pins the list-side lowercasing.
    "q_corpus_flagged_words" -> Entry(
      // (no Q.spread: the tokenizer+overlap kernel is cheaper than the
      // respread exchange at any tested size — measured 0.29 s -> 0.43 s
      // with the respread at sf0.1)
      (s, dir) => graft.operators.Corpus.filterFlaggedWords(
          t(s, dir, "documents")
            .select(col("doc_id"), col("text"), col("lang")),
          "text", Seq("Vector", "hash", "stream"))
        .select(col("doc_id"), col("lang")),
      Some("""SELECT doc_id, lang FROM documents
          WHERE text IS NULL OR NOT list_has_any(
            regexp_split_to_array(lower(text), '[^a-z0-9'']+'),
            ['vector', 'hash', 'stream'])""")),
    // URL domain-blocklist filter: label-suffix match (blocking
    // example.com drops a.b.example.com, never notexample.com). The
    // planted host is doc_id arithmetic, so the oracle constructs the
    // EXPECTED host directly and replays suffix match as
    // equals-or-endswith-dot — ground truth, not a re-implementation.
    // The three entries cover apex-suffix, mid-label, and exact-host
    // match modes.
    "q_corpus_domain_blocklist" -> Entry(
      (s, dir) => {
        import s.implicits._
        val id = col("doc_id")
        val url = concat(lit("https://"),
          when(pmod(id, lit(3)) === 0, lit("sub.")).otherwise(lit("")),
          lit("site"), pmod(id, lit(10)).cast("string"),
          lit(".tier"), pmod(id, lit(4)).cast("string"),
          lit(".example.com/p/"), id.cast("string"))
        val docs = t(s, dir, "documents")
          .select(id, url.as("url"), col("lang"))
        val bl = Seq("tier3.example.com", "site4.tier0.example.com",
          "sub.site1.tier1.example.com").toDF("domain")
        graft.operators.Corpus.filterDomainBlocklist(docs, "url", bl)
          .select(col("doc_id"), col("lang"))
      },
      Some("""WITH u AS (
          SELECT doc_id, lang,
            (CASE WHEN doc_id % 3 = 0 THEN 'sub.' ELSE '' END)
              || 'site' || (doc_id % 10) || '.tier' || (doc_id % 4)
              || '.example.com' AS host
          FROM documents)
        SELECT doc_id, lang FROM u
        WHERE NOT (host = 'tier3.example.com'
          OR host LIKE '%.tier3.example.com'
          OR host = 'site4.tier0.example.com'
          OR host LIKE '%.site4.tier0.example.com'
          OR host = 'sub.site1.tier1.example.com'
          OR host LIKE '%.sub.site1.tier1.example.com')""")),
    "q_corpus_c4_lines" -> Entry(
      (s, dir) => {
        val id = col("doc_id")
        val w = split(trim(col("text")), " ")
        val body = concat_ws("\n",
          concat(array_join(slice(w, 1, 8), " "), lit(".")),
          concat(array_join(slice(w, 9, 2), " "), lit("!")),
          array_join(slice(w, 11, 6), " "),
          lit("Please enable javascript to continue."),
          lit("Config uses { braces } everywhere."),
          concat(array_join(slice(w, 3, 4), " "),
            when(pmod(id, lit(4)) === 0, lit(" here?"))
              .otherwise(lit(" here"))))
        Corpus.c4FilterLines(
          Q.spread(t(s, dir, "documents")).select(id, body.as("body")),
          "body", "doc_id", minWordsPerLine = 3, minKeptLines = 2)
      },
      Some("""WITH planted AS (
          SELECT doc_id,
            concat_ws(chr(10),
              coalesce(array_to_string((string_split(trim(text), ' '))[1:8], ' '), '')
                || '.',
              coalesce(array_to_string((string_split(trim(text), ' '))[9:10], ' '), '')
                || '!',
              coalesce(array_to_string((string_split(trim(text), ' '))[11:16], ' '), ''),
              'Please enable javascript to continue.',
              'Config uses { braces } everywhere.',
              coalesce(array_to_string((string_split(trim(text), ' '))[3:6], ' '), '')
                || CASE WHEN doc_id % 4 = 0 THEN ' here?' ELSE ' here' END)
              AS body
          FROM documents
        ), f AS (
          SELECT doc_id,
            string_split(body, chr(10)) AS ls,
            list_filter(string_split(body, chr(10)), l ->
              (CASE WHEN trim(l) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(l), '\s+')) END) >= 3
              AND regexp_matches(trim(l), '[.!?"]$')
              AND NOT contains(lower(trim(l)), 'javascript')
              AND NOT contains(lower(trim(l)), 'lorem ipsum')
              AND NOT contains(lower(trim(l)), 'cookie policy')
              AND NOT contains(trim(l), '{')) AS ks
          FROM planted)
        SELECT doc_id,
          array_to_string(ks, chr(10)) AS clean_text,
          cast(len(ks) as bigint) AS n_kept,
          cast(len(ls) - len(ks) as bigint) AS n_dropped
        FROM f
        WHERE len(ks) >= 2""")),

    // The web-curation pipeline COMPOSED: planted HTML → html_to_text
    // → C4 line filter (on the real line structure the block tags
    // produced) → Gopher gate → sha-256 fingerprint — one flow, one
    // oracle. Still map-only end-to-end: every stage is row-local.
    "q_pipeline_web" -> Entry(
      (s, dir) => {
        val id = col("doc_id")
        val w = split(trim(col("text")), " ")
        val html = concat(
          lit("<html><head><style>body { x: 1 }</style>" +
            "<script>var j = 2;</script></head><body><h1>Doc "),
          id.cast("string"), lit("</h1><p>"),
          array_join(slice(w, 1, 8), " "),
          lit(".</p><p>short one</p><p>"),
          array_join(slice(w, 9, 6), " "),
          lit(" tail.</p><div>Please enable javascript to continue." +
            "</div></body></html>"))
        val extracted = Q.spread(t(s, dir, "documents")).select(id, html.as("html"))
          .select(id, Text.html_to_text(col("html")).as("body"))
        val lined = Corpus.c4FilterLines(extracted, "body", "doc_id",
          minWordsPerLine = 3, minKeptLines = 1)
        val f = Text.gopher_features(col("clean_text"))
        lined.select(id, col("clean_text"), col("n_kept"), f.as("f"))
          .select(id, col("n_kept"),
            col("f.n_words").as("n_words"),
            Text.gopher_keep(col("f"), minWords = 15).cast("int")
              .as("keep"),
            sha2(col("clean_text"), 256).as("fp"))
      },
      Some("""WITH planted AS (
          SELECT doc_id,
            '<html><head><style>body { x: 1 }</style><script>var j = 2;</script></head><body><h1>Doc '
            || cast(doc_id AS varchar) || '</h1><p>'
            || coalesce(array_to_string(
              (string_split(trim(text), ' '))[1:8], ' '), '')
            || '.</p><p>short one</p><p>'
            || coalesce(array_to_string(
              (string_split(trim(text), ' '))[9:14], ' '), '')
            || ' tail.</p><div>Please enable javascript to continue.</div></body></html>'
              AS html
          FROM documents
        ), s1 AS (
          SELECT doc_id, regexp_replace(html,
            '(?is)<(?:script|style)[^>]*>.*?</(?:script|style)\s*>',
            ' ', 'g') AS x
          FROM planted
        ), s2 AS (
          SELECT doc_id, regexp_replace(x,
            '(?i)<(?:br\s*/?|/p|/div|/h[1-6]|/li|/tr|/ul|/ol|/table)\s*>',
            chr(10), 'g') AS x
          FROM s1
        ), s3 AS (
          SELECT doc_id, regexp_replace(x, '<[^>]+>', ' ', 'g') AS x
          FROM s2
        ), s4 AS (
          SELECT doc_id, replace(replace(replace(replace(replace(replace(x,
            '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
            '&nbsp;', ' '), '&amp;', '&') AS x
          FROM s3
        ), s5 AS (
          SELECT doc_id,
            regexp_replace(regexp_replace(regexp_replace(x,
              '[ \t\r]+', ' ', 'g'),
              ' *\n *', chr(10), 'g'),
              '\n{3,}', chr(10) || chr(10), 'g') AS x
          FROM s4
        ), fin AS (
          SELECT doc_id,
            regexp_replace(x, '^\s+|\s+$', '', 'g') AS body
          FROM s5
        ), c4 AS (
          SELECT doc_id,
            list_filter(string_split(body, chr(10)), l ->
              (CASE WHEN trim(l) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(l), '\s+')) END) >= 3
              AND regexp_matches(trim(l), '[.!?"]$')
              AND NOT contains(lower(trim(l)), 'javascript')
              AND NOT contains(lower(trim(l)), 'lorem ipsum')
              AND NOT contains(lower(trim(l)), 'cookie policy')
              AND NOT contains(trim(l), '{')) AS ks
          FROM fin
        ), kept AS (
          SELECT doc_id, array_to_string(ks, chr(10)) AS ct,
            cast(len(ks) as bigint) AS n_kept
          FROM c4 WHERE len(ks) >= 1
        ), base AS (
          SELECT doc_id, ct, n_kept, trim(ct) AS t,
            CASE WHEN trim(ct) = '' THEN CAST([] AS VARCHAR[])
              ELSE regexp_split_to_array(trim(ct), '\s+') END AS ws,
            string_split(ct, chr(10)) AS ls
          FROM kept
        ), m AS (
          SELECT doc_id, ct, n_kept,
            cast(len(ws) as bigint) AS n_words,
            cast(coalesce(list_aggregate(
              list_transform(ws, w -> length(w)), 'sum'), 0) as bigint)
              AS wchars,
            cast(len(list_filter(ws,
              w -> regexp_matches(w, '[A-Za-z]'))) as bigint) AS nalpha,
            cast(length(t) - length(replace(t, '#', '')) as bigint)
              AS nhash,
            cast((length(t) - length(replace(t, '...', ''))) // 3
              as bigint) AS nell3,
            cast(length(t) - length(replace(t, '…', '')) as bigint)
              AS nellu,
            cast(len(ls) as bigint) AS n_lines,
            cast(len(list_filter(ls,
              l -> regexp_matches(trim(l), '^[-*•]'))) as bigint) AS nbull,
            cast(len(list_filter(ls,
              l -> regexp_matches(trim(l), '(\.\.\.|…)$'))) as bigint)
              AS nellline,
            cast(len(list_distinct(ls)) as bigint) AS ndl,
            cast(coalesce(list_aggregate(
              list_transform(ls, l -> length(l)), 'sum'), 0) as bigint)
              AS lchars,
            cast(coalesce(list_aggregate(
              list_transform(list_distinct(ls), l -> length(l)), 'sum'),
              0) as bigint) AS dchars
          FROM base
        ), feat AS (
          SELECT doc_id, ct, n_kept, n_words,
            round(CASE WHEN n_words > 0 THEN wchars / n_words
              ELSE 0 END, 4) AS mwl,
            round(CASE WHEN n_words > 0 THEN nalpha / n_words
              ELSE 0 END, 4) AS af,
            round(CASE WHEN n_words > 0
              THEN (nhash + nell3 + nellu) / n_words
              ELSE 0 END, 4) AS sr,
            round(nbull / n_lines, 4) AS bf,
            round(nellline / n_lines, 4) AS ef,
            round(1.0 - ndl / n_lines, 4) AS dlf,
            round(CASE WHEN lchars > 0
              THEN (lchars - dchars) / lchars
              ELSE 0 END, 4) AS dcf
          FROM m)
        SELECT doc_id, n_kept, n_words,
          cast(CASE WHEN n_words BETWEEN 15 AND 100000
            AND mwl BETWEEN 3.0 AND 10.0
            AND sr <= 0.1 AND af >= 0.8
            AND bf <= 0.9 AND ef <= 0.3
            AND dlf <= 0.3 AND dcf <= 0.2
            THEN 1 ELSE 0 END as int) AS keep,
          sha256(ct) AS fp
        FROM feat""")),

    // Gopher-rule quality gate (Text.gopher_features/gopher_keep): the
    // named word-shape + line-shape rule bundle. The corpus is
    // single-line and symbol-free, so both sides plant the same
    // doc_id-derived bodies — doc_id%3=0 docs get a duplicated line
    // and a bullet line (drop via dup/bullet rules), the rest get an
    // ellipsis-terminated second line (keep iff word count and
    // symbol-ratio rules pass — short docs fail both). Row-local:
    // one scan, every feature a higher-order array op.
    "q_quality_gopher" -> Entry(
      (s, dir) => {
        val id = col("doc_id")
        val w = split(trim(col("text")), " ")
        val lineA = array_join(slice(w, 1, 6), " ")
        val body = when(pmod(id, lit(3)) === 0,
          concat_ws("\n", lineA, lineA,
            concat(lit("- "), array_join(slice(w, 2, 3), " "))))
          .otherwise(concat_ws("\n", lineA,
            concat(array_join(slice(w, 7, 6), " "), lit("..."))))
        val f = Text.gopher_features(col("body"))
        t(s, dir, "documents").select(id, body.as("body"))
          .select(id, f.as("f"))
          .select(id,
            col("f.n_words").as("n_words"),
            col("f.mean_word_len").as("mean_word_len"),
            col("f.alpha_word_frac").as("alpha_word_frac"),
            col("f.symbol_word_ratio").as("symbol_word_ratio"),
            col("f.bullet_line_frac").as("bullet_line_frac"),
            col("f.ellipsis_line_frac").as("ellipsis_line_frac"),
            col("f.dup_line_frac").as("dup_line_frac"),
            col("f.dup_line_char_frac").as("dup_line_char_frac"),
            Text.gopher_keep(col("f"), minWords = 8,
              maxSymbolRatio = 0.1, minAlphaFrac = 0.9,
              maxBulletFrac = 0.2, maxEllipsisFrac = 0.6,
              maxDupLineFrac = 0.2, maxDupLineCharFrac = 0.15)
              .cast("int").as("keep"))
      },
      Some("""WITH parts AS (
          SELECT doc_id,
            coalesce(array_to_string(
              (string_split(trim(text), ' '))[1:6], ' '), '') AS la,
            coalesce(array_to_string(
              (string_split(trim(text), ' '))[7:12], ' '), '') AS lb,
            coalesce(array_to_string(
              (string_split(trim(text), ' '))[2:4], ' '), '') AS lc
          FROM documents
        ), planted AS (
          SELECT doc_id,
            CASE WHEN doc_id % 3 = 0
              THEN concat_ws(chr(10), la, la, '- ' || lc)
              ELSE concat_ws(chr(10), la, lb || '...') END AS body
          FROM parts
        ), base AS (
          SELECT doc_id, trim(body) AS t,
            CASE WHEN trim(body) = '' THEN CAST([] AS VARCHAR[])
              ELSE regexp_split_to_array(trim(body), '\s+') END AS ws,
            string_split(body, chr(10)) AS ls
          FROM planted
        ), m AS (
          SELECT doc_id,
            cast(len(ws) as bigint) AS n_words,
            cast(coalesce(list_aggregate(
              list_transform(ws, w -> length(w)), 'sum'), 0) as bigint)
              AS wchars,
            cast(len(list_filter(ws,
              w -> regexp_matches(w, '[A-Za-z]'))) as bigint) AS nalpha,
            cast(length(t) - length(replace(t, '#', '')) as bigint)
              AS nhash,
            cast((length(t) - length(replace(t, '...', ''))) // 3
              as bigint) AS nell3,
            cast(length(t) - length(replace(t, '…', '')) as bigint)
              AS nellu,
            cast(len(ls) as bigint) AS n_lines,
            cast(len(list_filter(ls,
              l -> regexp_matches(trim(l), '^[-*•]'))) as bigint) AS nbull,
            cast(len(list_filter(ls,
              l -> regexp_matches(trim(l), '(\.\.\.|…)$'))) as bigint)
              AS nellline,
            cast(len(list_distinct(ls)) as bigint) AS ndl,
            cast(coalesce(list_aggregate(
              list_transform(ls, l -> length(l)), 'sum'), 0) as bigint)
              AS lchars,
            cast(coalesce(list_aggregate(
              list_transform(list_distinct(ls), l -> length(l)), 'sum'),
              0) as bigint) AS dchars
          FROM base
        ), feat AS (
          SELECT doc_id, n_words,
            round(CASE WHEN n_words > 0 THEN wchars / n_words
              ELSE 0 END, 4) AS mean_word_len,
            round(CASE WHEN n_words > 0 THEN nalpha / n_words
              ELSE 0 END, 4) AS alpha_word_frac,
            round(CASE WHEN n_words > 0
              THEN (nhash + nell3 + nellu) / n_words
              ELSE 0 END, 4) AS symbol_word_ratio,
            round(nbull / n_lines, 4) AS bullet_line_frac,
            round(nellline / n_lines, 4) AS ellipsis_line_frac,
            round(1.0 - ndl / n_lines, 4) AS dup_line_frac,
            round(CASE WHEN lchars > 0
              THEN (lchars - dchars) / lchars
              ELSE 0 END, 4) AS dup_line_char_frac
          FROM m)
        SELECT doc_id, n_words, mean_word_len, alpha_word_frac,
          symbol_word_ratio, bullet_line_frac, ellipsis_line_frac,
          dup_line_frac, dup_line_char_frac,
          cast(CASE WHEN n_words BETWEEN 8 AND 100000
            AND mean_word_len BETWEEN 3.0 AND 10.0
            AND symbol_word_ratio <= 0.1 AND alpha_word_frac >= 0.9
            AND bullet_line_frac <= 0.2 AND ellipsis_line_frac <= 0.6
            AND dup_line_frac <= 0.2 AND dup_line_char_frac <= 0.15
            THEN 1 ELSE 0 END as int) AS keep
        FROM feat""")),

    // Gopher table-A1 paragraph-repetition pair
    // (Text.paragraph_dup_features/gopher_para_keep): the PARAGRAPH
    // complement to q_quality_gopher's line pair, at the paper's own
    // 0.30/0.20 thresholds. The corpus is single-line, so both sides
    // plant the same doc_id-derived multi-paragraph bodies:
    // %3=0 → [A,A,B] (dup frac 0.3333 fails the 0.30 rule),
    // %3=1 → [A,B] (clean, keeps), %3=2 → [A,B,C,A] (dup frac 0.25
    // PASSES, but the duplicated 6-word A dominates chars → char-frac
    // rule fails — the two rules trip independently). Row-local
    // higher-order array ops, one scan, zero shuffle.
    "q_quality_gopher_para" -> Entry(
      (s, dir) => {
        val id = col("doc_id")
        val w = split(trim(col("text")), " ")
        val pa = array_join(slice(w, 1, 6), " ")
        val pb = array_join(slice(w, 7, 6), " ")
        val pc = array_join(slice(w, 13, 2), " ")
        val body = when(pmod(id, lit(3)) === 0,
            concat_ws("\n\n", pa, pa, pb))
          .when(pmod(id, lit(3)) === 1, concat_ws("\n\n", pa, pb))
          .otherwise(concat_ws("\n\n", pa, pb, pc, pa))
        val f = Text.paragraph_dup_features(col("body"))
        t(s, dir, "documents").select(id, body.as("body"))
          .select(id, f.as("f"))
          .select(id,
            col("f.n_paras").as("n_paras"),
            col("f.dup_para_frac").as("dup_para_frac"),
            col("f.dup_para_char_frac").as("dup_para_char_frac"),
            Text.gopher_para_keep(col("f")).cast("int").as("keep"))
      },
      Some("""WITH parts AS (
          SELECT doc_id,
            coalesce(array_to_string(
              (string_split(trim(text), ' '))[1:6], ' '), '') AS pa,
            coalesce(array_to_string(
              (string_split(trim(text), ' '))[7:12], ' '), '') AS pb,
            coalesce(array_to_string(
              (string_split(trim(text), ' '))[13:14], ' '), '') AS pc
          FROM documents
        ), planted AS (
          SELECT doc_id,
            CASE doc_id % 3
              WHEN 0 THEN concat_ws(chr(10)||chr(10), pa, pa, pb)
              WHEN 1 THEN concat_ws(chr(10)||chr(10), pa, pb)
              ELSE concat_ws(chr(10)||chr(10), pa, pb, pc, pa) END AS body
          FROM parts
        ), base AS (
          SELECT doc_id, string_split(body, chr(10)||chr(10)) AS ps
          FROM planted
        ), m AS (
          SELECT doc_id,
            cast(len(ps) as bigint) AS n_paras,
            cast(len(list_distinct(ps)) as bigint) AS ndp,
            cast(coalesce(list_aggregate(
              list_transform(ps, p -> length(p)), 'sum'), 0) as bigint)
              AS pchars,
            cast(coalesce(list_aggregate(
              list_transform(list_distinct(ps), p -> length(p)), 'sum'),
              0) as bigint) AS dchars
          FROM base
        ), feat AS (
          SELECT doc_id, n_paras,
            round(1.0 - ndp / n_paras, 4) AS dup_para_frac,
            round(CASE WHEN pchars > 0
              THEN (pchars - dchars) / pchars
              ELSE 0 END, 4) AS dup_para_char_frac
          FROM m)
        SELECT doc_id, n_paras, dup_para_frac, dup_para_char_frac,
          cast(CASE WHEN dup_para_frac <= 0.30
            AND dup_para_char_frac <= 0.20
            THEN 1 ELSE 0 END as int) AS keep
        FROM feat""")),

    // Code-vs-prose routing (Text.code_features/code_like): the
    // structural heuristics that ROUTE documents before prose quality
    // gates shred source code — brace/semicolon line fraction,
    // indentation-led line fraction, code-symbol character mass,
    // OR-composed. The corpus is single-line prose, so both sides
    // plant the same doc_id-derived bodies: %3=0 a brace+indent code
    // block (trips two signals), %3=1 pure prose (trips none), %3=2
    // prose with one assignment line (symbol mass stays under the
    // threshold — near-miss pin). Row-local split + higher-order
    // filters, one scan, zero shuffle.
    "q_quality_code_detect" -> Entry(
      (s, dir) => {
        val id = col("doc_id")
        val w = split(trim(col("text")), " ")
        val w1 = array_join(slice(w, 1, 1), "")
        val la = array_join(slice(w, 1, 5), " ")
        val lb = array_join(slice(w, 6, 5), " ")
        val lc = array_join(slice(w, 11, 5), " ")
        val body = when(pmod(id, lit(3)) === 0,
            concat_ws("\n",
              concat(lit("def "), w1, lit("(x) {")),
              concat(lit("    return "), w1, lit(";")),
              lit("}")))
          .when(pmod(id, lit(3)) === 1, concat_ws("\n", la, lb, lc))
          .otherwise(concat_ws("\n",
            concat(lit("x = "), w1), la, lb, lc))
        val f = Text.code_features(col("body"))
        t(s, dir, "documents").select(id, body.as("body"))
          .select(id, f.as("f"))
          .select(id,
            col("f.brace_line_frac").as("brace_line_frac"),
            col("f.indent_line_frac").as("indent_line_frac"),
            col("f.symbol_char_frac").as("symbol_char_frac"),
            Text.code_like(col("f")).cast("int").as("is_code"))
      },
      Some("""WITH parts AS (
          SELECT doc_id,
            coalesce(array_to_string(
              (string_split(trim(text), ' '))[1:1], ''), '') AS w1,
            coalesce(array_to_string(
              (string_split(trim(text), ' '))[1:5], ' '), '') AS la,
            coalesce(array_to_string(
              (string_split(trim(text), ' '))[6:10], ' '), '') AS lb,
            coalesce(array_to_string(
              (string_split(trim(text), ' '))[11:15], ' '), '') AS lc
          FROM documents
        ), planted AS (
          SELECT doc_id,
            CASE doc_id % 3
              WHEN 0 THEN concat_ws(chr(10),
                'def ' || w1 || '(x) {',
                '    return ' || w1 || ';', '}')
              WHEN 1 THEN concat_ws(chr(10), la, lb, lc)
              ELSE concat_ws(chr(10), 'x = ' || w1, la, lb, lc) END
              AS body
          FROM parts
        ), m AS (
          SELECT doc_id, body, string_split(body, chr(10)) AS ls
          FROM planted
        ), feat AS (
          SELECT doc_id,
            round(len(list_filter(ls,
              l -> regexp_matches(l, '[{};]'))) /
              cast(len(ls) as double), 4) AS brace_line_frac,
            round(len(list_filter(ls,
              l -> regexp_matches(l, '^(    |\t)'))) /
              cast(len(ls) as double), 4) AS indent_line_frac,
            round(CASE WHEN length(body) > 0
              THEN (length(body) -
                length(translate(body, '{}[]();=<>', '')))
                / cast(length(body) as double)
              ELSE 0 END, 4) AS symbol_char_frac
          FROM m)
        SELECT doc_id, brace_line_frac, indent_line_frac,
          symbol_char_frac,
          cast(CASE WHEN brace_line_frac >= 0.3
            OR indent_line_frac >= 0.3
            OR symbol_char_frac >= 0.08
            THEN 1 ELSE 0 END as int) AS is_code
        FROM feat""")),

    // Data profiling: per-column null/distinct/min/max over lineitem,
    // ONE single-distinct aggregate per column unioned (all-in-one-agg
    // triggers the RewriteDistinctAggregates Expand — see
    // Corpus.profile). Money min/max go through integer cents
    // (portable reprs).
    "q_profile_stats" -> Entry(
      (s, dir) => graft.operators.Corpus.profile(t(s, dir, "lineitem"), Seq(
        "l_returnflag" -> col("l_returnflag"),
        "l_quantity" -> cents(col("l_quantity")),
        "l_orderkey" -> col("l_orderkey"))),
      Some("""WITH li AS (SELECT * FROM lineitem)
        SELECT 'l_returnflag' AS col_name, count(*) AS n_rows,
          cast(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) as bigint)
            AS n_nulls,
          count(DISTINCT l_returnflag) AS n_distinct,
          cast(min(l_returnflag) as varchar) AS min_repr,
          cast(max(l_returnflag) as varchar) AS max_repr FROM li
        UNION ALL
        SELECT 'l_quantity', count(*),
          cast(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) as bigint),
          count(DISTINCT l_quantity),
          cast(min(cast(floor(l_quantity*100 + 0.5) as bigint)) as varchar),
          cast(max(cast(floor(l_quantity*100 + 0.5) as bigint)) as varchar)
          FROM li
        UNION ALL
        SELECT 'l_orderkey', count(*),
          cast(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) as bigint),
          count(DISTINCT l_orderkey),
          cast(min(l_orderkey) as varchar), cast(max(l_orderkey) as varchar)
          FROM li""")),

    // Time-range rolling window: per-user trailing-hour spend — the
    // RANGE frame (every other window query here is ROWS-framed). One
    // shuffle on user_id; the frame is computed in the sort order.
    "q_window_rolling_range" -> Entry(
      (s, dir) => {
        val e = t(s, dir, "events")
        val w = Window.partitionBy(col("user_id"))
          .orderBy(unix_timestamp(col("ts")))
          .rangeBetween(-3600, Window.currentRow)
        e.select(col("event_id"), col("user_id"),
          sum(cents(col("value"))).over(w).as("rolling_cents"))
      },
      Some("""SELECT event_id, user_id,
        cast(sum(cast(floor(value*100 + 0.5) as bigint)) OVER (
          PARTITION BY user_id
          ORDER BY cast(floor(epoch(cast(ts as timestamp))) as bigint)
          RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) as bigint)
          AS rolling_cents
        FROM events""")),

    // A5-shape wide pivot as a real `.pivot()` (explicit value list →
    // single-pass conditional aggregation, no extra distinct-values
    // job): per-source language mix of the corpus.
    "q_agg_pivot" -> Entry(
      (s, dir) => {
        val langs = Seq("de", "en", "es", "fr", "zh")
        val p = t(s, dir, "documents")
          .groupBy(col("source"))
          .pivot("lang", langs)
          .agg(count(lit(1)))
        langs.foldLeft(p)((df, l) =>
          df.withColumn(l, coalesce(col(l), lit(0L))))
      },
      Some("""SELECT source,
        cast(sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) as bigint) AS de,
        cast(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) as bigint) AS en,
        cast(sum(CASE WHEN lang = 'es' THEN 1 ELSE 0 END) as bigint) AS es,
        cast(sum(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) as bigint) AS fr,
        cast(sum(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END) as bigint) AS zh
        FROM documents GROUP BY source""")),

    // Sketch aggregation: HyperLogLog++ distinct-user estimates per
    // event type (the constant-memory 100 TB cardinality answer — an
    // exact distinct shuffles every key). Approximate by design →
    // rows-only; the ≤2% relative-error bound vs the exact count is
    // pinned in ScaleOpsSpec.
    "q_agg_approx_distinct" -> Entry(
      // NO respread: A/B-measured as a loss (0.81 -> 1.13 s) — at
      // rsd 0.01 each HLL++ buffer is 2^14 registers, so 32 partials
      // per group cost more to build+merge than one map-side partial
      // per group; the plain-aggregation anti-pattern from Q.spread's
      // contract (contrast q_stream_hourly_hll, whose exact
      // countDistinct forces a (window,user) expand the partial
      // cannot reduce — there the respread WON 1.07 -> 0.58 s).
      (s, dir) => t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_users"),
          count(lit(1)).as("n_events")),
      None),

    // HyperLogLog with every step under the strict oracle — the
    // distinct-count sketch q_agg_approx_distinct demonstrates with the
    // engine built-in (rows-only: its internal hashing is not
    // replayable), rebuilt on the md5-prefix basis: registers are pure
    // integer arithmetic on the 60-bit prefix (low 8 bits pick the
    // register, leading-zero rank of the remaining 52), merge is
    // elementwise max (partition-invariant), and the published
    // estimate (αm·m²/Σ2^−M, small-range linear counting) replays via
    // an EXACT integer Σ2^(R−M) before one double division. The exact
    // per-group distinct count rides along as the accuracy witness.
    "q_agg_distinct_hll" -> Entry(
      (s, dir) => {
        import graft.plans.HllAgg
        // group key coalesced on BOTH sides: Spark's groupBy keeps a
        // NULL-source group, but the oracle's equi-joins are
        // NULL-hostile and would silently drop its row — the latent
        // board-flap class
        val words = t(s, dir, "documents")
          .select(coalesce(col("source"), lit("")).as("source"),
            explode(split(trim(lower(col("text"))), "\\s+")).as("k"))
        words.groupBy(col("source"))
          .agg(countDistinct(col("k")).as("n_exact"),
            HllAgg.hll_registers(8)(col("k")).as("regs"))
          .select(col("source"), col("n_exact"),
            HllAgg.hll_estimate(col("regs"), 8).as("hll_distinct"))
      },
      Some(raw"""WITH src AS (
          SELECT coalesce(source, '') AS g,
            unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS k
          FROM documents
        ), $hllReplayCtes
        SELECT g AS source, n_exact, hll_est AS hll_distinct FROM hll""")),

    // The same HLL under event-time bucketing — the windowed-sketch
    // shape a streaming pipeline runs at 100 TB (exact per-window
    // distincts shuffle every user id; 256 registers are bounded state
    // per window and merge associatively). Registers + estimate on the
    // md5 basis replay through the SAME shared CTE chain; the exact
    // count rides along as the accuracy witness.
    "q_stream_hourly_hll" -> Entry(
      (s, dir) => {
        import graft.plans.HllAgg
        // spreadBy(user_id): same single-task-partial rationale as
        // q_agg_approx_distinct (the register-merge partial is the
        // whole map cost; the hourly final exchange stays tiny)
        Q.spreadBy(
            t(s, dir, "events").select(col("ts"), col("user_id")),
            col("user_id"))
          .groupBy(window(col("ts"), "1 hour"))
          .agg(countDistinct(col("user_id")).as("n_exact"),
            HllAgg.hll_registers(8)(col("user_id").cast("string"))
              .as("regs"))
          .select(unix_timestamp(col("window.start")).as("hour_start"),
            col("n_exact"),
            HllAgg.hll_estimate(col("regs"), 8).as("hll_users"))
      },
      Some(raw"""WITH src AS (
          SELECT cast(floor(epoch(time_bucket(INTERVAL 1 HOUR,
              cast(ts as timestamp)))) as bigint) AS g,
            user_id::VARCHAR AS k
          FROM events
        ), $hllReplayCtes
        SELECT g AS hour_start, n_exact, hll_est AS hll_users FROM hll""")),
  )
}
