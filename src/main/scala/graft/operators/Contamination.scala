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
}
