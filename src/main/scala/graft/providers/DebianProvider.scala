package graft.providers

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType, StructType}
import graft.Envelope
import graft.functions.Norm

/** Debian security-tracker provider (vunnel `providers/debian/parser.py`):
  * the J4 DSA advisory join, A3 severity max-merge, P5 status predicates
  * and the A10 advisory-metrics rollup, relational.
  *
  * Input shapes:
  *  - tracker JSON: `{pkg: {CVE-x: {description, releases: {rel:
  *    {status, urgency, fixed_version, nodsa}}}}}` (dynamic keys → two
  *    nested MapTypes, exploded map-side)
  *  - DSA rows: one per (dsa, rel, pkg, cve) — the output of the DSA-list
  *    parse (`parser.py:109-137` `_get_cve_to_dsalist`); the upstream
  *    text-file parse is a driver-side fetch/parse stage.
  */
object DebianProvider {

  val trackerSchema: StructType = StructType(Seq(
    org.apache.spark.sql.types.StructField("data",
      MapType(StringType, MapType(StringType, StructType.fromDDL(
        "description STRING, " +
          "releases MAP<STRING, STRUCT<status: STRING, urgency: STRING, " +
          "fixed_version: STRING, nodsa: STRING>>"))))))

  val defaultDistroMap: Map[String, String] = Map(
    "buster" -> "10", "bullseye" -> "11", "bookworm" -> "12",
    "trixie" -> "13", "sid" -> "unstable")

  /** Debian urgency → severity, incl. the starred forms
    * (`parser.py:354-374`); absent/unmatched → Unknown. */
  private def urgencyToSeverity(urgency: org.apache.spark.sql.Column) =
    when(urgency.isin("low", "low**"), "Low")
      .when(urgency.isin("medium", "medium**"), "Medium")
      .when(urgency.isin("high", "high**"), "High")
      .when(urgency === "unimportant", "Negligible")
      .otherwise("Unknown")

  /** One row per (relno, cve, pkg): severity word + fixed_version with
    * the reference's sentinel semantics (absent → "None"; "0" → NAK). */
  def packageRows(spark: SparkSession, trackerPath: String,
      distroMap: Map[String, String] = defaultDistroMap): DataFrame = {
    val dm = map(distroMap.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    // wholetext: one row per FILE, the document intact. A line-mode
    // read + collect_list concat looked equivalent but is not — a
    // tracker file large enough to split (the real one is >100 MB)
    // merges its partial line lists in shuffle-arrival order, the
    // reassembled JSON goes out of order, from_json returns null, and
    // the provider silently emits nothing.
    spark.read.option("wholetext", "true").text(trackerPath)
      .select(from_json(col("value"),
        trackerSchema.fields.head.dataType).as("data"))
      .select(explode(col("data")).as(Seq("pkg", "cves")))
      .select(col("pkg"), explode(col("cves")).as(Seq("cve", "rec")))
      .filter(col("cve").rlike("^CVE"))                     // P2
      .select(col("pkg"), col("cve"),
        col("rec.description").as("description"),
        explode(col("rec.releases")).as(Seq("rel", "r")))
      .filter(col("r.status") =!= "undetermined")           // P5
      .withColumn("relno", element_at(dm, col("rel")))
      .filter(col("relno").isNotNull)
      .select(col("relno"), col("rel"), col("cve"), col("pkg"),
        col("description"),
        urgencyToSeverity(col("r.urgency")).as("severity"),
        coalesce(col("r.fixed_version"), lit("None")).as("version"),
        col("r.nodsa").isNotNull.as("nodsa"))
  }

  /** J4: left join DSA advisories on (rel, cve, pkg) → ordered
    * AdvisorySummary; nodsa → NoAdvisory=true; NAK rows ("0") keep an
    * empty advisory list (`parser.py:389-444`). */
  def withAdvisories(rows: DataFrame, dsas: DataFrame): DataFrame = {
    val d = broadcast(dsas
      .groupBy(col("rel"), col("cve"), col("pkg"))
      .agg(array_sort(collect_list(struct(
        col("dsa").as("ID"), col("link").as("Link")))).as("advisories"),
        min(col("date")).as("dsa_date")))
    rows.join(d, Seq("rel", "cve", "pkg"), "left")
      .select(rows.columns.toIndexedSeq.map(col) ++ Seq(
        when(col("version") === "0",
          struct(lit(false).as("NoAdvisory"),
            array().cast("array<struct<ID:string,Link:string>>")
              .as("AdvisorySummary")))
          .when(col("advisories").isNotNull,
            struct(lit(false).as("NoAdvisory"),
              col("advisories").as("AdvisorySummary")))
          .when(col("nodsa"),
            struct(lit(true).as("NoAdvisory"),
              lit(null).cast("array<struct<ID:string,Link:string>>")
                .as("AdvisorySummary")))
          .otherwise(struct(lit(false).as("NoAdvisory"),
            array().cast("array<struct<ID:string,Link:string>>")
              .as("AdvisorySummary"))).as("vendor_advisory"),
        when(col("version") =!= "None" && col("advisories").isNotNull,
          Norm.fuzzy_to_date(col("dsa_date"))).as("available_date")): _*)
  }

  /** A10: the advisory-metrics rollup — counts by (namespace, severity)
    * × {dsa, nodsa, neither} × {fixed, notfixed} (`parser.py:405-444`). */
  def advisoryMetrics(joined: DataFrame): DataFrame =
    joined.filter(col("version") =!= "0")
      .select(concat(lit("debian:"), col("relno")).as("namespace"),
        col("severity"),
        when(size(coalesce(col("vendor_advisory.AdvisorySummary"),
          array().cast("array<struct<ID:string,Link:string>>"))) > 0, "dsa")
          .when(col("vendor_advisory.NoAdvisory"), "nodsa")
          .otherwise("neither").as("adv_kind"),
        when(col("version") === "None", "notfixed").otherwise("fixed")
          .as("fix_state"))
      .groupBy("namespace", "severity", "adv_kind", "fix_state").count()

  /** Envelopes per (debian:relno, cve): severity = A3 max-merge across
    * packages; FixedIn in canonical (Name, Version) order. */
  def envelopes(joined: DataFrame): DataFrame = {
    joined
      .groupBy(col("relno"), col("cve"))
      .agg(
        max_by(col("severity"), Norm.severity_rank(col("severity")))
          .as("severity"),
        first(col("description"), ignoreNulls = true).as("description"),
        array_sort(collect_list(struct(
          col("pkg").as("Name"),
          concat(lit("debian:"), col("relno")).as("NamespaceName"),
          lit("dpkg").as("VersionFormat"),
          col("version").as("Version"),
          col("vendor_advisory").as("VendorAdvisory"),
          when(col("available_date").isNotNull,
            struct(date_format(col("available_date"), "yyyy-MM-dd").as("Date"),
              lit("advisory").as("Kind"))).as("Available"))))
          .as("fixed_in"))
      .select(Envelope.assemble(
        concat(lit("debian:"), col("relno"), lit("/"), lower(col("cve"))),
        Envelope.OsSchema,
        Envelope.osPayload(struct(
          col("cve").as("Name"),
          concat(lit("debian:"), col("relno")).as("NamespaceName"),
          coalesce(col("description"), lit("")).as("Description"),
          col("severity").as("Severity"),
          concat(lit("https://security-tracker.debian.org/tracker/"),
            col("cve")).as("Link"),
          Envelope.emptyCvss.as("CVSS"),
          col("fixed_in").as("FixedIn"),
          Envelope.emptyMetadata.as("Metadata")))): _*)
  }
}
