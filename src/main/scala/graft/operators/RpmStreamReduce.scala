package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import graft.functions.RpmVersion

/** A2: the RHEL grouped stream reduction (vunnel
  * `providers/rhel/parser.py:566-675`) as a typed Spark Aggregator.
  *
  * Per group (package, platform, module in the reference): affected
  * releases are reduced to (a) the max fix version per upstream base
  * stream (`_get_version_base`, `parser.py:1090-1105` — the leading
  * version segment before the first dot identifies the stream) and (b)
  * one canonical fix = the overall max under RPM-EVR order; the
  * reference emits a per-stream advisory table only when ≥2 streams
  * survive (`parser.py:961-980`).
  *
  * Buffer = Map[base → max-EVR version seen]; merge is associative and
  * commutative (pointwise EVR max), so Spark's partial aggregation
  * (map-side combine) applies — the shuffle carries one small map per
  * (group × partition), never the raw rows: at 100 TB this is the
  * difference between shuffling every affected-release row and
  * shuffling |groups| dictionaries.
  */
object RpmStreamReduce {

  final case class StreamFix(base: String, version: String)
  final case class Result(
      canonical: String,
      n_streams: Int,
      streams: Seq[StreamFix])

  /** Upstream base stream of an EVR string = epoch:version with the
    * release dropped (`_get_version_base`, rhel parser.py:1090-1105):
    * the release carries the .elN_M dist tag that differentiates
    * z-stream builds of the SAME upstream version. */
  def versionBase(full: String): String =
    graft.functions.Constraints.versionBase(full)

  val aggregator: Aggregator[String, Map[String, String], Result] =
    new Aggregator[String, Map[String, String], Result] {
      def zero: Map[String, String] = Map.empty

      private def put(m: Map[String, String], ver: String) = {
        val base = versionBase(ver)
        m.get(base) match {
          case Some(cur) if RpmVersion.compareVersions(cur, ver) >= 0 => m
          case _ => m.updated(base, ver)
        }
      }

      def reduce(b: Map[String, String], ver: String) = put(b, ver)

      def merge(a: Map[String, String], b: Map[String, String]) =
        b.values.foldLeft(a)(put)

      def finish(m: Map[String, String]): Result = {
        if (m.isEmpty) return Result(null, 0, Seq.empty)
        val canonical = m.values.reduce((a, b) =>
          if (RpmVersion.compareVersions(a, b) >= 0) a else b)
        val streams = m.toSeq.sortBy(_._1)
          .map { case (base, v) => StreamFix(base, v) }
        Result(canonical, streams.size, streams)
      }

      def bufferEncoder: Encoder[Map[String, String]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, String]]()
      def outputEncoder: Encoder[Result] = Encoders.product[Result]
    }

  /** Untyped column form for DataFrame groupBy().agg(...). */
  def rpm_stream_reduce = org.apache.spark.sql.functions.udaf(aggregator)
}
