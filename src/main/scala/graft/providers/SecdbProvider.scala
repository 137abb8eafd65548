package graft.providers

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Envelope
import graft.functions.Norm
import graft.sources.Sources

/** The secdb provider family (wolfi/alpine/chainguard/minimos/echo —
  * config-differentiated, like the reference's chainguard reusing the
  * wolfi parser): SURVEY §7.2's minimum vertical slice.
  *
  * Pipeline: secdb JSON scan (S10) → explode packages/secfixes (F16) →
  * split multi-CVE strings (F15) → CVE-id regex filter (P2) → group by
  * (namespace, vuln-id) (A1 first-writer-header + FixedIn append, as an
  * order-explicit collect) → Vulnerability struct → canonical-JSON
  * envelope. The NAK sentinel `Version: "0"` passes through as a value
  * (§7.4.2).
  *
  * Scale: one shuffle (the A1 groupBy on (namespace, vuln_id)); the
  * explode fan-out happens map-side; FixedIn arrays are bounded by
  * packages-per-CVE (small). Reference: wolfi `parser.py:162-257`.
  */
object SecdbProvider {

  /** @param rejections optional (pkg_name, vuln_id) pairs to suppress —
    *   the alpine rejections anti-join (J9, `providers/alpine/parser.py:
    *   243-273`): a rejected secfix is removed and replaced by a NAK row
    *   (`Version: "0"`) marking the package not-affected.
    * @param fixdates optional fix-date dimension (vuln, pkg, version,
    *   date, kind) — the reference's fixdater, which both wolfi and
    *   alpine wire (`providers/wolfi/parser.py:35-42`,
    *   `providers/alpine/parser.py`): matched rows gain the
    *   `Available {Date, Kind}` record; NAK/unfixed sentinel rows
    *   ("0"/"None") never match, per `fixdate/finder.py:149-151`.
    *   Broadcast — curated metadata, never corpus-scale. */
  def envelopes(spark: SparkSession, secdbPath: String, namespace: String,
      rejections: Option[DataFrame] = None,
      fixdates: Option[DataFrame] = None): DataFrame = {
    val scanned = Sources.secdb(spark, secdbPath)
      .filter(col("vuln_id").rlike("^CVE-")) // P2: non-CVE ids skipped
    val rows = rejections match {
      case None => scanned
      case Some(rej) =>
        val r = broadcast(rej.toDF("pkg_name", "vuln_id"))
        val kept = scanned.join(r, Seq("pkg_name", "vuln_id"), "left_anti")
        val naks = scanned.join(r, Seq("pkg_name", "vuln_id"), "left_semi")
          .withColumn("fix_version", lit("0")).distinct()
        kept.unionByName(naks)
    }
    val dated = graft.operators.FixDate.available(rows, fixdates,
      col("vuln_id"), col("pkg_name"), col("fix_version"))
    dated
      .groupBy(col("vuln_id"))
      .agg(
        // O3 canonical FixedIn ordering by (Name, Version) — explicit
        // sort keys, never input row order
        // Available LAST in the struct: the sort keys stay
        // (Name, ..., Version), and the reference's wolfi parser also
        // appends the available key after the base record
        array_sort(collect_list(struct(
          col("pkg_name").as("Name"),
          lit(namespace).as("NamespaceName"),
          lit("apk").as("VersionFormat"),
          col("fix_version").as("Version"),
          when(col("available_date").isNotNull, struct(
            col("available_date").as("Date"),
            col("available_kind").as("Kind"))).as("Available"))))
          .as("fixed_in"),
        count(lit(1)).as("n_fixes"))
      .select(Envelope.assemble(
        concat(lit(namespace), lit("/"), lower(col("vuln_id"))),
        Envelope.OsSchema,
        Envelope.osPayload(struct(
          col("vuln_id").as("Name"),
          lit(namespace).as("NamespaceName"),
          lit("").as("Description"),
          lit("Unknown").as("Severity"),
          Norm.ref_link_for_id(col("vuln_id")).as("Link"),
          Envelope.emptyCvss.as("CVSS"),
          col("fixed_in").as("FixedIn"),
          Envelope.emptyMetadata.as("Metadata")))): _*)
  }
}
