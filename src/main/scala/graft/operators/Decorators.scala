package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Aux decorator joins (vunnel kev/epss/eol providers, SURVEY S9/S15):
  * pass-through upstream datasets used to ANNOTATE vulnerability rows.
  * Both dimensions are tiny (KEV ≈ 1k rows, EPSS ≈ 250k) → broadcast
  * left joins; the fact side never shuffles.
  */
object Decorators {

  /** KEV decoration: known_exploited = the CVE appears in the KEV
    * catalog (`providers/kev/manager.py:26-41`). */
  def withKev(rows: DataFrame, kev: DataFrame, cveCol: String = "cve"): DataFrame =
    rows.join(
      broadcast(kev.select(col(cveCol)).distinct()
        .withColumn("known_exploited", lit(true))),
      Seq(cveCol), "left")
      .withColumn("known_exploited",
        coalesce(col("known_exploited"), lit(false)))

  /** EPSS decoration: exploit-probability score + percentile
    * (`providers/epss/manager.py:46-134` typed CSV scan feeds this). */
  def withEpss(rows: DataFrame, epss: DataFrame, cveCol: String = "cve"): DataFrame =
    rows.join(
      broadcast(epss.select(col(cveCol), col("epss"), col("percentile"))),
      Seq(cveCol), "left")

  /** EOL decoration: rows whose namespace is a `<product>:<cycle>`
    * distro string (ubuntu:22.04, alpine:3.19, …) gain the cycle's
    * end-of-life status from the eol cycles table
    * ([[graft.providers.AuxProviders.eolCycles]]); unmatched
    * namespaces keep nulls. */
  def withEol(rows: DataFrame, eolCycles: DataFrame,
      nsCol: String = "namespace"): DataFrame =
    rows.join(
      broadcast(eolCycles.select(
        graft.providers.AuxProviders
          .eolNamespace(col("product"), col("rel.name")).as(nsCol),
        col("rel.isEol").as("is_eol"),
        col("rel.eolFrom").as("eol_from"),
        col("rel.isMaintained").as("is_maintained"))),
      Seq(nsCol), "left")
}
