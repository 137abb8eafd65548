package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora: flag training
  * documents sharing word n-grams with an evaluation set (the GPT-3 /
  * PaLM style n-gram-overlap check). Exact — no sketches: the eval set
  * is tiny relative to the corpus, so its distinct n-grams broadcast
  * and the corpus side is a map-side explode + broadcast join; the only
  * shuffle carries (doc_id, matched n-gram) pairs, bounded by actual
  * contamination, not corpus size.
  *
  * The n-gram rule matches the dedup pipeline's shingles (and the
  * DuckDB oracle replays it): documents of ≤ n words contribute their
  * whole text as one shingle, longer ones every n-word window.
  */
object Contamination {

  /** Distinct word n-grams of a text column as an array — the native
    * single-pass codegen kernel ([[graft.plans.TextKernels.wordShingles]];
    * a higher-order `transform` here runs interpreted per element and
    * was the bench's slowest stage). */
  def wordShingles(text: Column, n: Int = 3): Column =
    array_distinct(graft.plans.TextExpressions.word_shingles(text, n))

  /** (idCol, n_hits) for every training doc sharing ≥1 distinct n-gram
    * with the benchmark set. `bench` broadcasts. */
  def hits(docs: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, n: Int = 3): DataFrame = {
    val benchShingles = bench
      .select(explode(wordShingles(col(benchTextCol), n)).as("s"))
      .distinct()
    docs
      .select(col(idCol), explode(wordShingles(col(textCol), n)).as("s"))
      .join(broadcast(benchShingles), "s")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits")) // shingles pre-deduped per doc
  }

  /** The large-eval-set variant of [[hits]] — identical results, bounded
    * memory. [[hits]] broadcasts the benchmark's distinct shingles as a
    * join hash table; a full eval-suite union can reach 10⁸ distinct
    * n-grams (tens of GB relationalized), past any broadcast threshold,
    * at which point the exact join must shuffle BOTH sides — and the
    * corpus side of that shuffle is every shingle of every document.
    *
    * Here a Bloom filter over the benchmark shingles guards that
    * shuffle: built DISTRIBUTED (`BloomFilterAggregate` — map-side
    * partial sketches, one O(numBits) merge), ~1.2 bytes/item at 1%
    * fpp — two orders smaller than the join table — and shipped to
    * every scan task, it discards clean shingles map-side, so only
    * true hits plus the fpp sliver ever leave the scan. The shuffled
    * exact semi-join that follows removes the false positives, which
    * keeps the result row-identical to [[hits]] at ANY fpp — the
    * filter only sizes the shuffle, never the answer.
    *
    * The distinct'd bench shingle set feeds three consumers (the sizing
    * count, the sketch build, the verify join), so `cache` (default)
    * persists it — same contract and caveat as [[crossContainment]]'s
    * cache flag. `expectedItems ≤ 0` (default) sizes the filter from an
    * exact count of the benchmark's distinct shingles. Sketch sizing
    * clamps to Spark's per-sketch caps
    * (`spark.sql.optimizer.runtime.bloomFilter.maxNumBits` /
    * `maxNumItems` — raise BOTH past ~4M eval shingles; past the caps
    * fpp degrades gracefully, results never change). */
  def hitsBloom(docs: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, n: Int = 3,
      fpp: Double = 0.01, expectedItems: Long = -1L,
      cache: Boolean = true): DataFrame = {
    val benchBase = bench
      .select(explode(wordShingles(col(benchTextCol), n)).as("s"))
      .distinct()
    val benchShingles =
      if (cache) benchBase
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else benchBase
    val filter = graft.plans.BloomProbe
      .buildFilter(benchShingles, col("s"), fpp, expectedItems)
    if (filter == null)
      // empty benchmark → nothing can hit; (a null probe literal would
      // instead silently drop every row)
      return docs.select(col(idCol)).filter(lit(false))
        .withColumn("n_hits", lit(0L))
    docs
      .select(col(idCol), explode(wordShingles(col(textCol), n)).as("s"))
      .filter(graft.plans.BloomProbe
        .mightContain(filter, xxhash64(col("s"))))
      // exact verify: SHUFFLED semi-join (no broadcast hint — this path
      // exists precisely for bench sets past the broadcast threshold;
      // AQE may still broadcast a small one, which is just as exact)
      .join(benchShingles, Seq("s"), "left_semi")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits")) // shingles pre-deduped per doc
  }

  /** Per-document contamination FRACTION — the gate curation jobs
    * apply on top of [[hits]]: n_hits / n_distinct_shingles per doc,
    * for EVERY document (clean docs score 0.0, so the output is
    * directly filterable at a drop threshold). Two extra row-local
    * costs over [[hits]]: a per-doc distinct-shingle count (a scan)
    * and one outer join of the corpus against the bounded hit set. */
  def contaminationFraction(docs: DataFrame, idCol: String,
      textCol: String, bench: DataFrame, benchTextCol: String,
      n: Int = 3): DataFrame = {
    val totals = docs.select(col(idCol),
      size(wordShingles(col(textCol), n)).cast("long").as("n_shingles"))
    totals
      .join(hits(docs, idCol, textCol, bench, benchTextCol, n),
        Seq(idCol), "left")
      .select(col(idCol), col("n_shingles"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("frac", round(
        col("n_hits") / greatest(col("n_shingles"), lit(1L)), 3))
  }

  /** SPAN-level decontamination — instead of dropping a contaminated
    * document ([[hits]] + a gate), surgically remove each contaminated
    * n-gram window plus `buffer` words either side (the GPT-3/Llama
    * "exact substring removal" treatment: the doc survives, the leaked
    * benchmark text does not). Overlapping/touching buffered windows
    * merge into maximal spans (gaps-and-islands with tolerance
    * n + 2·buffer, the [[Corpus.duplicatedSpans]] shape).
    *
    * Positions index the NORMALIZED token stream (lowercased,
    * whitespace-collapsed — the same stream the shingle kernel hashes),
    * so `clean_text` is rebuilt from that stream; documents of ≤ n
    * words contribute their whole text as one window (the shared
    * shingle rule) and scrub to empty when it matches.
    *
    * Scale shape: the corpus side is a map-side posexplode + broadcast
    * join against the eval set's distinct shingles — only HIT positions
    * (bounded by actual contamination, not corpus size) cross the
    * per-document islands shuffle; the merged span lists ride back on a
    * SIZE-GUARDED broadcast join (the span list is per-HIT-doc — under
    * pathological contamination, every doc hit, it is corpus-sized and
    * a forced broadcast would exhaust the driver: the spans side is
    * persisted, counted, and broadcast only when the hit-doc count is
    * ≤ `broadcastMaxHitDocs`, falling back to a plain shuffled join —
    * the [[connectedComponents]] probe-then-branch shape) and the
    * rebuild is a row-local indexed filter.
    * Returns (idCol, clean_text, n_words_removed, n_spans); clean docs
    * pass through with their normalized text and zeros. */
  def scrubSpans(docs: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, n: Int = 3,
      buffer: Int = 2, broadcastMaxHitDocs: Long = 4000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n >= 1, s"n >= 1: $n")
    require(buffer >= 0, s"buffer >= 0: $buffer")
    val benchShingles = bench
      .select(explode(wordShingles(col(benchTextCol), n)).as("__g"))
      .distinct()
    val hitPos = docs
      .select(col(idCol).as("__doc"),
        posexplode(graft.plans.TextExpressions.word_shingles(col(textCol), n))
          .as(Seq("p", "__g")))
      .join(broadcast(benchShingles), Seq("__g"))
      .select(col("__doc"), col("p"))
    scrubFromHits(docs, idCol, textCol, hitPos, n, buffer,
      broadcastMaxHitDocs)
  }

  /** The islands + span-merge + rebuild back half of [[scrubSpans]],
    * over an arbitrary `(__doc, p)` hit-window-start stream — shared
    * with [[Corpus.dedupSubstrings]] (whose hits are non-first
    * occurrences of duplicated corpus anchors rather than eval-set
    * matches) so the buffered-extent merge rule and the normalized
    * rebuild cannot diverge between the two operators. Positions
    * index the normalized token stream; the islands window partitions
    * per document (bounded by single-document length — a document is
    * never corpus-sized). */
  private[operators] def scrubFromHits(docs: DataFrame, idCol: String,
      textCol: String, hitPos: DataFrame, n: Int, buffer: Int,
      broadcastMaxHitDocs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // two hit windows at starts p1 < p2 produce overlapping or touching
    // BUFFERED extents whenever p2 - p1 <= n + 2*buffer
    val gap = n + 2 * buffer
    val byPos = Window.partitionBy("__doc").orderBy("p")
    val spans = hitPos
      .withColumn("__head",
        when(coalesce(col("p") - lag("p", 1).over(byPos), lit(gap + 1)) > gap,
          1L).otherwise(0L))
      .withColumn("__isl", sum("__head").over(byPos))
      .groupBy(col("__doc"), col("__isl"))
      .agg(greatest(min("p") - buffer, lit(0)).cast("long").as("s"),
        (max("p") + n - 1 + buffer).cast("long").as("e"))
      .groupBy("__doc")
      .agg(sort_array(collect_list(struct(col("s"), col("e"))))
        .as("__spans"))
      // persist + count: the guard probe materializes the span lists
      // ONCE (the rebuild join below reads the cache, not a second
      // full-corpus shingle pass); stays cached for the lazy consumer —
      // span lists are bounded by actual contamination and spill to
      // disk, never the driver. The cache entry lives in the
      // CacheManager until an explicit unpersist/clearCache (the
      // ContextCleaner never reclaims Dataset caches on GC); drivers
      // running many increments must clearCache between batches
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val spansSide =
      if (spans.count() <= broadcastMaxHitDocs) broadcast(spans)
      else spans
    val words = split(
      regexp_replace(trim(lower(col(textCol))), "\\s+", " "), " ", -1)
    val kept = filter(words, (_, i) =>
      !exists(col("__spans"), sp =>
        i.cast("long") >= sp.getField("s") &&
          i.cast("long") <= sp.getField("e")))
    docs
      .join(spansSide, docs(idCol) === spansSide("__doc"), "left")
      .select(col(idCol),
        words.as("__w"),
        when(col("__spans").isNull, words).otherwise(kept).as("__kept"),
        coalesce(size(col("__spans")), lit(0)).cast("long").as("n_spans"))
      .select(col(idCol),
        array_join(col("__kept"), " ").as("clean_text"),
        (size(col("__w")) - size(col("__kept"))).cast("long")
          .as("n_words_removed"),
        col("n_spans"))
  }

  /** Cross-corpus n-gram containment matrix: one row per ordered pair
    * of groups (a, b) WITH nonzero shingle overlap —
    * |shingles(a) ∩ shingles(b)| / |shingles(b)|, the "how much of
    * corpus b is already inside corpus a" overlap measure used to
    * audit dataset mixes and source-level leakage. Zero-overlap pairs
    * are ABSENT, not 0.0 (the matrix is sparse by construction);
    * consumers pivoting to a dense matrix fill missing pairs with 0.
    *
    * Scale shape: ONE distinct-shuffle of (group, shingle) — the corpus
    * text itself never moves — then a self-equi-join on the shingle key
    * whose per-key fan-out is bounded by the number of groups (each
    * shingle matches ≤ |groups| rows per side), so no bucket can go
    * quadratic the way document-pair joins do. Group sizes are a tiny
    * aggregate, broadcast back.
    *
    * `hashed` (the default) shingles as 64-bit kernel hashes
    * (`word_shingle_hashes`) so the distinct-shuffle and self-join move
    * 8-byte keys instead of n-word strings (~5× smaller at 100 TB);
    * collisions only matter if two distinct shingles of the SAME group
    * pair collide — negligible at 2^-64 per pair. `hashed = false`
    * keeps the literal strings for the DuckDB oracle replay; a spec
    * pins the two paths row-identical. */
  def crossContainment(docs: DataFrame, groupCol: String, textCol: String,
      n: Int = 3, hashed: Boolean = true, cache: Boolean = true,
      md5Keys: Boolean = false): DataFrame = {
    // md5Keys: hash the same shingle strings with the 60-bit md5-prefix
    // basis (HashKernels.md5Prefix60) instead of xxh64 — identical
    // 8-byte-key shuffle shape, ~2-3× the per-shingle hash cost, but the
    // keys replay EXACTLY in DuckDB ('0x'||substr(md5(s),1,15))::BIGINT,
    // so even a collision is the SAME collision on both engines and the
    // query faces the strict oracle at any scale.
    require(hashed || !md5Keys,
      "md5Keys selects the hashed-key BASIS — it has no meaning with " +
        "hashed = false (string shingles); drop one of the two flags")
    val shingles: Column =
      if (hashed && md5Keys)
        graft.plans.HashExpressions.word_shingle_hashes_md5(col(textCol), n)
      else if (hashed)
        graft.plans.HashExpressions.word_shingle_hashes(col(textCol), n)
      else wordShingles(col(textCol), n)
    // cache (default): the distinct'd (g, s) set feeds three subtrees
    // (both self-join sides and the size aggregate); CacheManager
    // substitution makes the single-shuffle claim structural instead of
    // relying on ReusedExchange surviving AQE replanning. The entry is
    // MEMORY_AND_DISK and LRU-evictable but lives until the session
    // ends (the result is lazy, so this function cannot unpersist) —
    // callers running MANY containments in one session can pass
    // cache = false and accept up to two recomputes of the distinct.
    val shBase = docs
      .select(col(groupCol).as("g"), explode(shingles).as("s"))
      .distinct()
    val sh =
      if (cache) shBase
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else shBase
    val sizes = sh.groupBy(col("g")).agg(count(lit(1)).as("n_sh"))
    sh.as("a").join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.g") =!= col("b.g"))
      .groupBy(col("a.g").as("src_a"), col("b.g").as("src_b"))
      .agg(count(lit(1)).as("n_common"))
      .join(broadcast(sizes.select(col("g").as("src_b"),
        col("n_sh").as("n_b"))), "src_b")
      .select(col("src_a"), col("src_b"), col("n_common"),
        round(col("n_common").cast("double") /
          col("n_b").cast("double"), 3).as("containment"))
  }
}
