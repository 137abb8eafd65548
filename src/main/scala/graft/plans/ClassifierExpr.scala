package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Row-local hashed bag-of-words logistic margin — the scoring kernel of
  * [[graft.operators.TextClassifier]] as one codegen'd pass: tokenize,
  * md5-bucket, weight-lookup, accumulate. Makes corpus scoring a pure
  * map (no explode, no per-doc groupBy shuffle) and is therefore legal
  * inside a Structured Streaming plan, where the explode+groupBy score
  * would be a streaming aggregation with state. The weight vector rides
  * the plan as a reference object (the mat_project pattern) — shipped
  * once per executor with the task binary, never per row. */
object ClassifierKernels {

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 16-bit md5-prefix bucket of a word, mod k — EXACTLY
    * [[graft.operators.Dsir.bucket]]'s arithmetic (the first 4 hex chars
    * of md5 are the first 2 digest bytes), so kernel-scored margins are
    * interchangeable with the training triples' buckets. */
  def bucket(word: String, k: Int): Int = {
    val md = md5Local.get(); md.reset()
    val d = md.digest(word.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    (((d(0) & 0xff) << 8) | (d(1) & 0xff)) % k
  }

  /** margin = Σ_b x_b·w(b) + w(k) with k = w.length − 1: term-frequency
    * features when `tf` (each occurrence adds w(b), total divided by the
    * FEATURE count), bucket PRESENCE otherwise (sort + dedup of the
    * row's buckets, stateless). `ngrams = 2` adds word-bigram buckets to
    * the unigram set (fastText's wordNgrams — style/collocation signal a
    * bag of words can't see); a sub-2-token doc contributes no bigram.
    * Single pass, no allocation beyond the per-row bucket array. */
  def hashedLogit(s: UTF8String, w: Array[Double], tf: Boolean,
      ngrams: Int = 1): Double = {
    val k = w.length - 1
    val words = TextKernels.splitWords(s)
    val nBi = if (ngrams >= 2 && words.length >= 2) words.length - 1 else 0
    var acc = 0.0
    if (tf) {
      // tf accumulates directly — no bucket array on the scoring hot
      // path (the presence branch below needs one to dedup)
      var i = 0
      while (i < words.length) { acc += w(bucket(words(i), k)); i += 1 }
      var j = 0
      while (j < nBi) {
        acc += w(bucket(words(j) + " " + words(j + 1), k)); j += 1
      }
      acc /= (words.length + nBi)
    } else {
      val bs = new Array[Int](words.length + nBi)
      var i = 0
      while (i < words.length) { bs(i) = bucket(words(i), k); i += 1 }
      var j = 0
      while (j < nBi) {
        bs(words.length + j) = bucket(words(j) + " " + words(j + 1), k)
        j += 1
      }
      java.util.Arrays.sort(bs)
      i = 0
      while (i < bs.length) {
        if (i == 0 || bs(i) != bs(i - 1)) acc += w(bs(i))
        i += 1
      }
    }
    acc + w(k)
  }

  /** Σ values(bucket(g)) over every word n-gram occurrence — see
    * [[HashedNgramSumExpr]]. Same shingle semantics as
    * [[TextKernels.wordShingles]] (incl. the ≤n whole-text edge), but
    * walking the split words directly: each shingle string is built
    * ONCE and hashed from its bytes — no intermediate ArrayData and no
    * UTF8String encode/decode round trip per n-gram on the scan path. */
  def hashedNgramSum(s: UTF8String, values: Array[Long], n: Int): Long = {
    val k = values.length
    val words = TextKernels.splitWords(s)
    if (words.length <= n)
      return values(bucket(words.mkString(" "), k))
    var acc = 0L
    var i = 0
    while (i + n <= words.length) {
      val sb = new java.lang.StringBuilder(16 * n)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j)); j += 1
      }
      acc += values(bucket(sb.toString, k))
      i += 1
    }
    acc
  }
}

/** See [[ClassifierKernels.hashedLogit]]. `weights` is a Seq in the
  * case-class signature for value equality (semanticEquals /
  * subexpression elimination — the MatProjectExpr rule); the primitive
  * array backs the kernel hot path. */
case class HashedLogitExpr(child: Expression, weights: Seq[Double],
    tf: Boolean, ngrams: Int = 1) extends UnaryExpression {
  private val wArr: Array[Double] = weights.toArray
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType =>
      // buckets are a 16-bit md5 prefix mod k: weights past index 65535
      // would be silently unreachable
      if (weights.length >= 2 && weights.length <= 65537 &&
          ngrams >= 1 && ngrams <= 2)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs 2 ≤ k+1 ≤ 65537 weights (bias last) and " +
          s"ngrams in {1, 2}, got ${weights.length} / $ngrams")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column, got ${t.sql}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "hashed_logit"

  override def nullSafeEval(v: Any): Any =
    ClassifierKernels.hashedLogit(v.asInstanceOf[UTF8String], wArr, tf, ngrams)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("hashedLogitW", wArr, "double[]")
    defineCodeGen(ctx, ev,
      c => s"graft.plans.ClassifierKernels.hashedLogit($c, $wRef, $tf, $ngrams)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Row-local Σ values(bucket(g)) over every word n-gram occurrence of
  * the text — the scoring kernel of [[graft.operators.Dsir]]: with
  * `values` = the dense micro-nat log-ratio vector, the result IS the
  * doc's integer importance weight, computed in one codegen'd pass with
  * zero shuffle (the explode → join → groupBy shape this replaces moved
  * one row per token). Integer accumulation keeps the sum order-exact —
  * the cross-engine strict-hash contract survives unchanged. k is
  * `values.length`; buckets use [[ClassifierKernels.bucket]] (≡
  * [[graft.operators.Dsir.bucket]]). */
case class HashedNgramSumExpr(child: Expression, values: Seq[Long],
    n: Int) extends UnaryExpression {
  private val vArr: Array[Long] = values.toArray
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType =>
      // 16-bit bucket space: values past index 65535 are unreachable
      if (values.nonEmpty && values.length <= 65536 && n > 0)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs 1 ≤ |values| ≤ 65536 and n > 0")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column, got ${t.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "hashed_ngram_sum"

  override def nullSafeEval(v: Any): Any =
    ClassifierKernels.hashedNgramSum(v.asInstanceOf[UTF8String], vArr, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vRef = ctx.addReferenceObj("hashedNgramV", vArr, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.plans.ClassifierKernels.hashedNgramSum($c, $vRef, $n)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ClassifierExprs {
  import org.apache.spark.sql.graft.bridge.{column, expression}

  def hashed_logit(text: Column, weights: Seq[Double], tf: Boolean,
      ngrams: Int = 1): Column =
    column(HashedLogitExpr(expression(text), weights, tf, ngrams))

  def hashed_ngram_sum(text: Column, values: Seq[Long], n: Int): Column =
    column(HashedNgramSumExpr(expression(text), values, n))
}
