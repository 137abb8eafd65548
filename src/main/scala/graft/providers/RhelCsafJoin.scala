package graft.providers

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.ProductId

/** J3: the RHEL Hydra × CSAF fix-version join (vunnel
  * `providers/rhel/csaf_parser.py:134-282`), relational.
  *
  * Reference shape: per affected-release, memoized CSAF doc lookup + a
  * scan over the RHSA's fixed product ids picking the first whose name
  * matches and whose platform CPE starts with Hydra's (prefix theta);
  * "ael" builds only as backup; channels = recognized-channel union over
  * FPIs shipping the chosen build.
  *
  * Spark shape: the CSAF archive becomes one exploded FPI dimension
  * (rhsa_id, cve, fpi, plat_cpe, module, name, version) built once and
  * broadcast; the per-record doc lookup becomes an equi-join on
  * (cve, rhsa_id) with the name-equality and CPE-prefix residuals
  * evaluated post-match — no cross product, no memo cache.
  */
object RhelCsafJoin {

  private val channelUdf = udf((fpi: String) =>
    ProductId.parseProductId(fpi).channel.orNull)

  /** hydra: (cve, rhsa_id, pkg, platform_cpe);
    * fpis: (rhsa_id, cve, fpi, plat_cpe, module, name, version).
    * Returns hydra keys + (version, module, product_id, channels). */
  def fixInfo(hydra: DataFrame, fpisIn: DataFrame): DataFrame = {
    // normalize: an all-null module column arrives as NullType, on which
    // <=> does not behave as null-safe string equality
    val fpis = fpisIn
      .withColumn("module", col("module").cast("string"))
      .withColumn("version", col("version").cast("string"))
    val cand = hydra.join(broadcast(fpis), Seq("cve", "rhsa_id"))
      .filter(col("name") === col("pkg") &&
        col("plat_cpe").startsWith(col("platform_cpe")))
    // "ael" (alternative) builds rank behind regular ones; fpi string
    // breaks remaining ties deterministically (the reference relies on
    // candidate order — SURVEY §7.4.3 demands an explicit key instead)
    val w = Window.partitionBy("cve", "rhsa_id", "pkg", "platform_cpe")
      .orderBy(when(col("version").contains("ael"), 1).otherwise(0).asc,
        col("fpi").asc)
    val best = cand.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("cve"), col("rhsa_id"), col("pkg"), col("platform_cpe"),
        col("version"), col("module"), col("fpi").as("product_id"))
    // channel union over ALL matching FPIs shipping the SAME build
    val channels = best.join(cand
        .select(col("cve"), col("rhsa_id"), col("pkg"),
          col("platform_cpe"), col("version").as("c_version"),
          col("module").as("c_module"), col("fpi").as("c_fpi")),
        Seq("cve", "rhsa_id", "pkg", "platform_cpe"))
      .filter(col("c_version") <=> col("version") &&
        col("c_module") <=> col("module"))
      .withColumn("channel", channelUdf(col("c_fpi")))
      .filter(col("channel").isNotNull)
      .groupBy("cve", "rhsa_id", "pkg", "platform_cpe")
      .agg(array_sort(collect_set(col("channel"))).as("channels"))
    hydra
      .join(best, Seq("cve", "rhsa_id", "pkg", "platform_cpe"), "left")
      .join(channels, Seq("cve", "rhsa_id", "pkg", "platform_cpe"), "left")
      .withColumn("channels",
        coalesce(col("channels"), array().cast("array<string>")))
  }
}
