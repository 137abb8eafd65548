package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Severity / date / id normalizations — the reference's small scalar
  * function zoo (SURVEY §2.9 F9-F14), expressed as pure Column pipelines so
  * they stay inside whole-stage codegen (no UDFs).
  */
object Norm {

  /** Canonical severity rank used for max-merges (vunnel
    * `utils/vulnerability.py:10-17` severity_order). */
  val severityRank: Map[String, Int] = Map(
    "Unknown" -> 0, "Negligible" -> 1, "Low" -> 2,
    "Medium" -> 3, "High" -> 4, "Critical" -> 5)

  /** Column-side rank lookup (codegen-friendly literal map). */
  def severity_rank(sev: Column): Column = {
    val m = map(severityRank.toSeq.sortBy(_._2)
      .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    coalesce(element_at(m, sev), lit(0))
  }

  /** GHSA / RHEL style severity word normalization:
    * MODERATE|moderate → Medium, importance words capitalized, unmapped →
    * Unknown (vunnel `github/parser.py:595-602`, `rhel/parser.py:833-849`). */
  def normalize_severity(raw: Column): Column = {
    val u = upper(raw)
    when(u.isin("LOW", "NEGLIGIBLE", "MEDIUM", "HIGH", "CRITICAL"),
      concat(upper(substring(lower(raw), 1, 1)), substring(lower(raw), 2, 1000)))
      .when(u === "MODERATE", lit("Medium"))
      .when(u === "IMPORTANT", lit("High"))
      .when(u === "UNTRIAGED", lit("Unknown"))
      .otherwise(lit("Unknown"))
  }

  /** Debian urgency → severity (vunnel `debian/parser.py:356-374`). */
  def debian_urgency_to_severity(urgency: Column): Column =
    when(urgency.isin("unimportant", "end-of-life"), "Negligible")
      .when(urgency === "low", "Low")
      .when(urgency === "medium", "Medium")
      .when(urgency === "high", "High")
      .otherwise("Unknown")

  /** Lenient multi-format date normalization → DateType (vunnel
    * `utils/date.py:6-12` uses dateutil fuzzy parse; here: try the formats
    * the sources actually emit, first hit wins). */
  def fuzzy_to_date(s: Column): Column = {
    // try_to_timestamp (not to_date): Spark 4 runs ANSI mode, where a
    // failed parse throws instead of yielding null — try_* keeps the
    // first-format-that-parses-wins coalesce semantics.
    def tryFmt(fmt: String): Column = try_to_timestamp(s, lit(fmt)).cast("date")
    coalesce(
      tryFmt("yyyy-MM-dd"),
      tryFmt("yyyy-MM-dd'T'HH:mm:ss"),
      tryFmt("yyyy-MM-dd'T'HH:mm:ssXXX"),
      tryFmt("yyyy/MM/dd"),
      tryFmt("MM/dd/yyyy"),
      tryFmt("dd MMM yyyy"),
      // RSS pubDate "Tue, 02 Jan 2024 03:04:05 GMT" (S7): strip the
      // day-name/zone tokens Spark 3+'s parser rejects, then parse.
      try_to_timestamp(regexp_extract(s, "^\\w{3}, (\\d{2} \\w{3} \\d{4})", 1),
        lit("dd MMM yyyy")).cast("date"),
      try_to_timestamp(s).cast("date"))
  }

  /** id ↔ path codec: CVE-2023-1234 → 2023/cve-2023-1234 (vunnel
    * `nvd/manager.py:397-404` cve_to_id). */
  def cve_to_path(id: Column): Column =
    concat_ws("/", split(id, "-").getItem(1), lower(id))

  /** path → id: 2023/cve-2023-1234 → CVE-2023-1234 (`manager.py:406-413`). */
  def path_to_cve(p: Column): Column =
    upper(element_at(split(p, "/"), -1))

  /** ecosystem → slug: lower + ':' → '-' (vunnel `ubuntu/parser.py:35-42`). */
  def ecosystem_slug(e: Column): Column = translate(lower(e), ":", "-")

  /** Reference-link synthesis by id prefix (vunnel
    * `utils/vulnerability.py:149-159`). */
  def ref_link_for_id(id: Column): Column =
    when(id.startsWith("CVE-"),
      concat(lit("https://nvd.nist.gov/vuln/detail/"), id))
      .when(id.startsWith("GHSA-"),
        concat(lit("https://github.com/advisories/"), id))
      .otherwise(lit(null).cast("string"))
}
