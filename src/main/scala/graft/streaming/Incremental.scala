package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import java.time.{Duration, Instant}

/** Incremental-run semantics (SURVEY §2.10): the reference's watermark
  * mechanics re-expressed as job-control state around ordinary batch
  * plans.
  *
  *  - I1: watermark = last successful run timestamp, read from state iff
  *    not stale (`provider.py:188-201`)
  *  - I2: watermark expiry — a gap ≥ maxWindow forces a full re-scan
  *    (`providers/nvd/manager.py:188-205`, the NVD 120-day API limit)
  *  - I5: changed-keys reprocessing — the processing set is
  *    (source rows newer than the watermark) ∪ (rows whose enrichment
  *    dimension changed), so dimension updates re-emit untouched source
  *    records (`nvd/manager.py:103-159`)
  *
  * State is a tiny JSON sidecar per provider (the `State` of
  * `workspace.py:34-55`); results/manifests live in
  * [[graft.sinks.ResultStore]].
  */
object Incremental {

  final case class RunState(provider: String, lastUpdated: Instant,
      stale: Boolean)

  def readState(stateDir: String, provider: String): Option[RunState] = {
    val p = Paths.get(stateDir, s"$provider.state.json")
    if (!Files.exists(p)) return None
    val txt = Files.readString(p)
    def field(k: String): Option[String] =
      s""""$k"\\s*:\\s*"([^"]*)"""".r.findFirstMatchIn(txt).map(_.group(1))
    val stale = """"stale"\s*:\s*true""".r.findFirstIn(txt).isDefined
    for (ts <- field("last_updated")) yield
      RunState(provider, Instant.parse(ts), stale)
  }

  def writeState(stateDir: String, s: RunState): Unit = {
    Files.createDirectories(Paths.get(stateDir))
    Files.writeString(Paths.get(stateDir, s"${s.provider}.state.json"),
      s"""{"provider":"${s.provider}","last_updated":"${s.lastUpdated}","stale":${s.stale}}""")
  }

  /** I1+I2: the effective watermark for this run — None ⇒ full scan
    * (no prior state, stale state, or expiry-window exceeded). */
  def effectiveWatermark(stateDir: String, provider: String, now: Instant,
      maxWindow: Duration = Duration.ofDays(120)): Option[Instant] =
    readState(stateDir, provider) match {
      case Some(s) if !s.stale &&
        Duration.between(s.lastUpdated, now).compareTo(maxWindow) <= 0 =>
        Some(s.lastUpdated)
      case _ => None
    }

  /** Apply the watermark predicate (pushed to the source scan). */
  def incrementalSlice(df: DataFrame, tsCol: String,
      watermark: Option[Instant]): DataFrame =
    watermark.fold(df)(w =>
      df.filter(col(tsCol) > lit(java.sql.Timestamp.from(w))))

  /** I5: processing set = changed-source keys ∪ changed-dimension keys.
    * `changedDimKeys` is the fixdate-changed-ids shape
    * (`tool/fixdate/grype_db_first_observed.py:397-444`): a one-column
    * DataFrame of keys that must be re-emitted even if the source row is
    * older than the watermark. */
  def processingSet(source: DataFrame, keyCol: String, tsCol: String,
      watermark: Option[Instant], changedDimKeys: DataFrame): DataFrame = {
    val fresh = incrementalSlice(source, tsCol, watermark)
    val dimDriven = source.join(
      broadcast(changedDimKeys.toDF(keyCol).distinct()), Seq(keyCol),
      "left_semi")
    fresh.unionByName(dimDriven).dropDuplicates(keyCol)
  }
}
