package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, StringType}

/** SparkSessionExtensions entry point: registers every graft custom
  * expression for SQL use plus the [[JaccardLengthPruning]] optimizer
  * rule. Activate with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` or
  * call [[GraftExtensions.register]] on an existing session.
  *
  * (The reference's own surface needs no custom Rule/SparkStrategy —
  * SURVEY §4: its optimizations are source-protocol concerns or
  * join-strategy hints. The optimizer rule here serves the beyond-
  * reference set-similarity operators.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => JaccardLengthPruning)
    GraftExtensions.builders.foreach { case (name, className, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(className, name), builder))
    }
  }
}

object GraftExtensions {

  /** Shape parameters (shingle width, signature length, band count…)
    * determine codegen, so they must be LITERAL ints in SQL —
    * `minhash_text(text, 3, 128)`, not a column. */
  private def intLit(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case _ => throw new IllegalArgumentException(
      s"$fn expects literal int shape parameters")
  }

  /** Mode parameters (normalization form…) likewise select codegen —
    * literal strings only. */
  private def strLit(e: Expression, fn: String): String = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String, StringType) =>
      v.toString
    case _ => throw new IllegalArgumentException(
      s"$fn expects literal string mode parameters")
  }

  /** Every kernel: (SQL name, expression class for DESCRIBE FUNCTION,
    * builder) — one list serving both the extensions path and
    * [[register]]. */
  private[plans] val builders
      : Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("rpm_ver_cmp", classOf[RpmVerCmpExpr].getName,
      (es: Seq[Expression]) => RpmVerCmpExpr(es(0), es(1))),
    ("rpm_sort_key", classOf[RpmSortKeyExpr].getName,
      (es: Seq[Expression]) => RpmSortKeyExpr(es.head)),
    ("simhash64", classOf[SimHash64Expr].getName,
      (es: Seq[Expression]) => SimHash64Expr(es.head)),
    ("token_count", classOf[TokenCountExpr].getName,
      (es: Seq[Expression]) => TokenCountExpr(es.head)),
    ("deflated_size", classOf[DeflatedSizeExpr].getName,
      (es: Seq[Expression]) => DeflatedSizeExpr(es.head)),
    ("unicode_normalize", classOf[UnicodeNormalizeExpr].getName,
      (es: Seq[Expression]) => UnicodeNormalizeExpr(es.head,
        if (es.length > 1) strLit(es(1), "unicode_normalize") else "NFC")),
    ("fix_mojibake", classOf[FixMojibakeExpr].getName,
      (es: Seq[Expression]) => FixMojibakeExpr(es.head)),
    ("script_counts", classOf[ScriptCountsExpr].getName,
      (es: Seq[Expression]) => ScriptCountsExpr(es.head)),
    ("winnow_fingerprints", classOf[WinnowFingerprintsExpr].getName,
      (es: Seq[Expression]) => WinnowFingerprintsExpr(es.head,
        if (es.length > 1) intLit(es(1), "winnow_fingerprints") else 8,
        if (es.length > 2) intLit(es(2), "winnow_fingerprints") else 4)),
    ("top_gram_char_frac", classOf[TopGramCharFracExpr].getName,
      (es: Seq[Expression]) => TopGramCharFracExpr(es.head)),
    ("dup_gram_char_frac", classOf[DupGramCharFracExpr].getName,
      (es: Seq[Expression]) => DupGramCharFracExpr(es.head)),
    ("word_shingles", classOf[ShinglesExpr].getName,
      (es: Seq[Expression]) =>
        ShinglesExpr(es.head, intLit(es(1), "word_shingles"), word = true)),
    ("char_shingles", classOf[ShinglesExpr].getName,
      (es: Seq[Expression]) =>
        ShinglesExpr(es.head, intLit(es(1), "char_shingles"), word = false)),
    ("word_shingle_hashes", classOf[WordShingleHashesExpr].getName,
      (es: Seq[Expression]) =>
        WordShingleHashesExpr(es.head, intLit(es(1), "word_shingle_hashes"))),
    ("minhash_sig", classOf[MinHashSigExpr].getName,
      (es: Seq[Expression]) =>
        MinHashSigExpr(es.head, intLit(es(1), "minhash_sig"))),
    ("minhash_text", classOf[MinHashTextExpr].getName,
      (es: Seq[Expression]) => MinHashTextExpr(es.head,
        intLit(es(1), "minhash_text"), intLit(es(2), "minhash_text"))),
    ("sorted_jaccard", classOf[SortedJaccardExpr].getName,
      (es: Seq[Expression]) => SortedJaccardExpr(es(0), es(1))),
    ("cosine_sim", classOf[CosineSimExpr].getName,
      (es: Seq[Expression]) => CosineSimExpr(es(0), es(1))),
    ("hyperplane_sig", classOf[HyperplaneSigExpr].getName,
      (es: Seq[Expression]) => HyperplaneSigExpr(es.head,
        intLit(es(1), "hyperplane_sig"),
        if (es.length > 2) intLit(es(2), "hyperplane_sig") else 0)),
    ("hyperplane_band_sigs", classOf[HyperplaneBandSigsExpr].getName,
      (es: Seq[Expression]) => HyperplaneBandSigsExpr(es.head,
        intLit(es(1), "hyperplane_band_sigs"),
        intLit(es(2), "hyperplane_band_sigs"))),
    ("top_k_agg", classOf[TopKAggExpr].getName,
      (es: Seq[Expression]) => {
        // mirror topKPerGroup's Scala-side integral-id guard: without
        // it, ImplicitCastInputTypes silently casts a fractional id
        // double→long, truncating and conflating distinct ids
        es(1).dataType match {
          case org.apache.spark.sql.types.ByteType
            | org.apache.spark.sql.types.ShortType
            | IntegerType | org.apache.spark.sql.types.LongType => ()
          case dt => throw new IllegalArgumentException(
            "top_k_agg id argument must be an integral type, got " +
              dt.simpleString)
        }
        TopKAggExpr(es(0), es(1), intLit(es(2), "top_k_agg"))
          .toAggregateExpression()
      }),
    ("pair_combos", classOf[PairCombosExpr].getName,
      (es: Seq[Expression]) => PairCombosExpr(es.head)),
    ("rpm_stream_reduce", classOf[RpmStreamAggExpr].getName,
      (es: Seq[Expression]) =>
        RpmStreamAggExpr(es.head).toAggregateExpression()),
    ("cvss3_score", classOf[Cvss3ScoreExpr].getName,
      (es: Seq[Expression]) => Cvss3ScoreExpr(es.head)),
    ("mat_project", classOf[MatProjectExpr].getName,
      (es: Seq[Expression]) => MatProjectExpr(es(0),
        doubleArrayLit(es(1), "mat_project"),
        doubleArrayLit(es(2), "mat_project"))),
    ("cms_topk", classOf[CmsTopKExpr].getName,
      (es: Seq[Expression]) => CmsTopKExpr(es(0),
        intLit(es(1), "cms_topk"), intLit(es(2), "cms_topk"),
        intLit(es(3), "cms_topk")).toAggregateExpression()),
    // hashed_logit(text, cast(array(…) as array<double>), tf_int):
    // the weight vector is a foldable array (reference object, the
    // mat_project rule); tf as 0/1 int
    ("hashed_logit", classOf[HashedLogitExpr].getName,
      (es: Seq[Expression]) => HashedLogitExpr(es(0),
        doubleArrayLit(es(1), "hashed_logit"),
        intLit(es(2), "hashed_logit") != 0,
        if (es.length > 3) intLit(es(3), "hashed_logit") else 1)),
    // hashed_ngram_sum(text, array(…bigint…), n): dense value vector as
    // a foldable array<bigint> reference object
    ("hashed_ngram_sum", classOf[HashedNgramSumExpr].getName,
      (es: Seq[Expression]) => HashedNgramSumExpr(es(0),
        longArrayLit(es(1), "hashed_ngram_sum"),
        intLit(es(2), "hashed_ngram_sum"))))

  private def longArrayLit(e: Expression, fn: String): Seq[Long] = {
    val ok = e.foldable && (e.dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType, _) => true
      case _ => false
    })
    if (!ok) throw new IllegalArgumentException(
      s"$fn expects a foldable array<bigint> value vector")
    e.eval() match {
      case a: org.apache.spark.sql.catalyst.util.ArrayData =>
        a.toLongArray().toIndexedSeq
      case _ => throw new IllegalArgumentException(
        s"$fn value vector evaluated to null")
    }
  }

  /** The projection basis must be a FOLDABLE array<double> in SQL —
    * `mat_project(vec, cast(array(…) as array<double>), …)` — because
    * it becomes a codegen reference object, not a per-row input.
    * (Bare SQL float literals parse as decimals; the cast is on the
    * caller.) */
  private def doubleArrayLit(e: Expression, fn: String): Seq[Double] = {
    val ok = e.foldable && (e.dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType, _) => true
      case _ => false
    })
    if (!ok) throw new IllegalArgumentException(
      s"$fn expects foldable array<double> basis arguments " +
        "(cast(array(...) as array<double>))")
    e.eval() match {
      case a: org.apache.spark.sql.catalyst.util.ArrayData =>
        a.toDoubleArray().toIndexedSeq
      case _ => throw new IllegalArgumentException(
        s"$fn basis argument evaluated to null")
    }
  }

  /** Register the same functions + optimizer rule on an already-built
    * session (extraOptimizations is the post-build hook for rules). */
  def register(spark: SparkSession): Unit = {
    builders.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")
    }
    if (!spark.experimental.extraOptimizations.contains(JaccardLengthPruning))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ JaccardLengthPruning
  }
}
