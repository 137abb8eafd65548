package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/** Bounded top-k-by-score typed Aggregator.
  *
  * The row_number-window form of "top k per group" shuffles EVERY
  * scored row into the window sort; this aggregator's per-group state
  * is a ≤k-element sorted buffer, so map-side partial aggregation
  * reduces each partition's contribution to at most k rows per group
  * BEFORE the exchange. For a q-query × n-corpus rerank that is the
  * difference between shuffling q·n rows and q·k·partitions rows —
  * the shape the ANN operators advertise at 100 TB.
  *
  * Order: higher score first, lower id on ties — the deterministic
  * order the ANN DuckDB oracles pin (`... DESC, vec_id`).
  */
object TopK {

  final case class Scored(score: Double, id: Long)

  private def better(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  /** Insert into a best-first sorted buffer, keeping ≤ k. O(k) per
    * row — k is small (top-10-ish) by construction. Idempotent for an
    * exact (score, id) duplicate: candidate generators may surface the
    * same pair through several buckets/probes, always with the same
    * score, so dedup here replaces a pre-aggregation
    * dropDuplicates shuffle. */
  private def insert(buf: Seq[Scored], x: Scored, k: Int): Seq[Scored] =
    if (buf.size >= k && !better(x, buf.last)) buf
    else if (buf.contains(x)) buf
    else {
      val i = buf.indexWhere(e => better(x, e))
      val w = if (i < 0) buf :+ x else (buf.take(i) :+ x) ++ buf.drop(i)
      if (w.size > k) w.take(k) else w
    }

  def aggregator(k: Int): Aggregator[Scored, Seq[Scored], Seq[Scored]] = {
    require(k > 0, "top-k needs k > 0")
    new Aggregator[Scored, Seq[Scored], Seq[Scored]] {
      override def zero: Seq[Scored] = Vector.empty
      override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] =
        if (a == null) b else insert(b, a, k)
      override def merge(x: Seq[Scored], y: Seq[Scored]): Seq[Scored] =
        y.foldLeft(x)((acc, e) => insert(acc, e, k))
      override def finish(b: Seq[Scored]): Seq[Scored] = b
      override def bufferEncoder: Encoder[Seq[Scored]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
      override def outputEncoder: Encoder[Seq[Scored]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
    }
  }

  /** The aggregator as an untyped column function over
    * `struct(score: double, id: long)` inputs; returns the best-first
    * array of (score, id) structs. */
  def top_k(k: Int): UserDefinedFunction = udaf(aggregator(k))
}
