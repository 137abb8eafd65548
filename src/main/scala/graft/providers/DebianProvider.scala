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
  /** The reference's pinned per-CVE severity override
    * (`parser.py:620-630`): data-quality escapes forced to Unknown
    * until per-package severity is representable upstream. Applied to
    * BOTH freshly-normalized and legacy records at yield. */
  val severityOverride: Seq[String] = Seq("CVE-2020-35525",
    "CVE-2020-35527", "CVE-2023-4863", "CVE-2023-44487")

  private def overriddenSeverity(name: org.apache.spark.sql.Column,
      severity: org.apache.spark.sql.Column) =
    when(name.isin(severityOverride.map(x => x: Any): _*), lit("Unknown"))
      .otherwise(severity)

  /** Legacy normalized-cve-data record shape (the checked-in
    * vulnerabilities-debian:N-*.json arrays, os-schema 1.0.x era,
    * `parser.py:495-597`). */
  val legacyRecordSchema: StructType = StructType.fromDDL(
    "Vulnerability STRUCT<" +
      "Description: STRING, " +
      "FixedIn: ARRAY<STRUCT<" +
        "Available: STRUCT<Date: STRING, Kind: STRING>, " +
        "Name: STRING, NamespaceName: STRING, " +
        "VendorAdvisory: STRUCT<AdvisorySummary: ARRAY<STRUCT<" +
          "ID: STRING, Link: STRING>>, NoAdvisory: BOOLEAN>, " +
        "Version: STRING, VersionFormat: STRING>>, " +
      "Link: STRING, " +
      "Metadata: STRUCT<NVD: STRUCT<CVSSv2: STRUCT<" +
        "Score: DOUBLE, Vectors: STRING>>>, " +
      "Name: STRING, NamespaceName: STRING, Severity: STRING>")

  /** T4's real half (`parser.py:495-618`): legacy normalized-cve-data
    * records — the Wheezy-era releases the tracker no longer serves —
    * pass through with (a) the CVSSv2 `Vectors: null` key stripped
    * (`parser.py:579-583`; canonical null-drop does it), (b) the
    * fixdater's Available {Date, Kind} patched onto FixedIn entries
    * that lack one (`_patch_fix_date`, both legacy sources get it),
    * and (c) the severity override. `path` globs the per-release JSON
    * arrays; each element is one wrapped record. */
  def legacyEnvelopes(spark: SparkSession, path: String,
      fixdates: Option[DataFrame] = None): DataFrame = {
    val recs = spark.read.option("multiLine", "true")
      .schema(legacyRecordSchema).json(path)
      .select(col("Vulnerability").as("v"))
      .filter(col("v.Name").isNotNull && col("v.NamespaceName").isNotNull)
    // _patch_fix_date: only entries WITHOUT an Available date and with a
    // real fix version resolve; posexplode + regroup keeps record order
    val patched = fixdates match {
      case None => recs.withColumn("fixed_in", col("v.FixedIn"))
      case Some(fd) =>
        val exploded = recs.select(col("v"),
          posexplode_outer(col("v.FixedIn")).as(Seq("pos", "f")))
        graft.operators.FixDate.available(exploded, Some(fd),
          col("v.Name"), col("f.Name"),
          when(col("f.Available.Date").isNull, col("f.Version")),
          ecosystem = Some(lower(col("f.NamespaceName"))))
          .groupBy(col("v"))
          .agg(transform(array_sort(collect_list(when(col("f").isNotNull,
            struct(col("pos"), struct(
              coalesce(col("f.Available"),
                when(col("available_date").isNotNull, struct(
                  col("available_date").as("Date"),
                  col("available_kind").as("Kind")))).as("Available"),
              col("f.Name").as("Name"),
              col("f.NamespaceName").as("NamespaceName"),
              col("f.VendorAdvisory").as("VendorAdvisory"),
              col("f.Version").as("Version"),
              col("f.VersionFormat").as("VersionFormat")).as("f"))))),
            x => x.getField("f")).as("fixed_in"))
          // byte-faithful passthrough: a record with NO FixedIn key must
          // keep omitting it — the regroup would otherwise manufacture []
          .withColumn("fixed_in",
            when(col("v.FixedIn").isNotNull, col("fixed_in")))
    }
    patched.select(Envelope.assemble(
      concat(col("v.NamespaceName"), lit("/"), lower(col("v.Name"))),
      Envelope.OsSchema,
      Envelope.osPayload(struct(
        col("v.Description").as("Description"),
        col("fixed_in").as("FixedIn"),
        col("v.Link").as("Link"),
        // null NVD drops under canonical ignoreNullFields, leaving the
        // reference's bare "Metadata": {}
        struct(col("v.Metadata.NVD").as("NVD")).as("Metadata"),
        col("v.Name").as("Name"),
        col("v.NamespaceName").as("NamespaceName"),
        overriddenSeverity(col("v.Name"), col("v.Severity"))
          .as("Severity")))): _*)
  }

  /** Legacy-over-current merge (`parser.py:614-618`
    * `vuln_records[relno].update(legacy)`): the legacy record WINS for
    * a shared identifier. */
  def withLegacy(current: DataFrame, legacy: DataFrame): DataFrame =
    current.join(legacy.select(col("identifier").as("__li")),
      col("identifier") === col("__li"), "left_anti")
      .unionByName(legacy)

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
          overriddenSeverity(col("cve"), col("severity")).as("Severity"),
          concat(lit("https://security-tracker.debian.org/tracker/"),
            col("cve")).as("Link"),
          Envelope.emptyCvss.as("CVSS"),
          col("fixed_in").as("FixedIn"),
          Envelope.emptyMetadata.as("Metadata")))): _*)
  }
}
