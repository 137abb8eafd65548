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

  /** Split an apk version into (dot parts, -rN revision); a non-numeric
    * -r suffix parses as revision 0 (`secureos/parser.py:162-177`). */
  private def apkParts(v: String): (Seq[String], Int) = {
    // remaining dashes become part separators before the dot split
    // (`parser.py:181` version_str.replace("-", ".").split("."))
    def split(base: String) = base.replace("-", ".").split("\\.").toSeq
    val i = if (v == null) -1 else v.lastIndexOf("-r")
    if (i < 0) (split(Option(v).getOrElse("")), 0)
    else {
      val r = v.substring(i + 2)
      val rev = if (r.nonEmpty && r.forall(_.isDigit)) r.toInt else 0
      (split(v.substring(0, i)), rev)
    }
  }

  /** The reference's apk ordering (`secureos/parser.py:180-218`):
    * part-wise, numeric when both parts are numeric, string otherwise,
    * missing parts read as 0, revision breaks ties. */
  private[graft] def compareApk(a: String, b: String): Int = {
    val (pa, ra) = apkParts(a)
    val (pb, rb) = apkParts(b)
    var i = 0
    val n = math.max(pa.length, pb.length)
    while (i < n) {
      val x = if (i < pa.length) pa(i) else "0"
      val y = if (i < pb.length) pb(i) else "0"
      val c =
        if (x.nonEmpty && x.forall(_.isDigit) &&
            y.nonEmpty && y.forall(_.isDigit)) BigInt(x).compare(BigInt(y))
        else x.compare(y)
      if (c != 0) return c
      i += 1
    }
    ra.compare(rb)
  }

  private val sortApkUdf = udf((vs: Seq[String]) =>
    vs.distinct.sortWith(compareApk(_, _) < 0))

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
      fixdates: Option[DataFrame] = None,
      apkVulnerableRange: Boolean = false): DataFrame = {
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
    // secureos variant (`secureos/parser.py:264-308`): per package the
    // real fix versions sort apk-ascending; per (vid, pkg) the SMALLEST
    // fix stays range-less, and any later fix with revision > 0 gains
    // VulnerableRange ">=<base>-r0, <fix>" so a respin never
    // over-matches the earlier stream. The per-package version lists
    // are tiny (secfix map entries), so the exact-comparator sort runs
    // in a bounded per-group UDF; rank assignment is one window over
    // (vid, pkg).
    val ranged =
      if (!apkVulnerableRange)
        dated.withColumn("vulnerable_range", lit(null).cast("string"))
      else {
        val realVs = dated
          .filter(!coalesce(col("fix_version"), lit(""))
            .isin("", "0", "None"))
          .select("pkg_name", "fix_version").distinct()
          .groupBy("pkg_name")
          .agg(sortApkUdf(collect_list(col("fix_version"))).as("vs"))
          .select(col("pkg_name"),
            posexplode(col("vs")).as(Seq("apk_rank", "fix_version")))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("vuln_id", "pkg_name")
        val rev = coalesce(
          regexp_extract(col("fix_version"), "-r(\\d+)$", 1).cast("int"),
          lit(0))
        dated.join(realVs, Seq("pkg_name", "fix_version"), "left")
          .withColumn("__minrank", min(col("apk_rank")).over(w))
          .withColumn("vulnerable_range",
            when(col("apk_rank").isNotNull &&
              col("apk_rank") =!= col("__minrank") && rev > 0,
              concat(lit(">="),
                regexp_replace(col("fix_version"), "-r\\d+$", ""),
                lit("-r0, <"), col("fix_version"))))
          .drop("apk_rank", "__minrank")
      }
    ranged
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
            col("available_kind").as("Kind"))).as("Available"),
          col("vulnerable_range").as("VulnerableRange"))))
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
