package graft.providers

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Envelope
import graft.functions.RpmVersion

/** Amazon ALAS provider (vunnel `providers/amazon/parser.py`): RSS
  * summary scan (S7, via [[graft.sources.Sources.rss]]) + per-advisory
  * HTML page extraction (S8) of the "New Packages" section, split into
  * (name, version, release) with the rpm filename splitter (F2).
  *
  * The reference walks HTML tags statefully (PackagesHTMLParser,
  * `parser.py:276-331`: packages listed under x86_64:/noarch:/src:
  * headers inside the id="new_packages" element). Column-side, the same
  * extraction is a regex pull of the new_packages block and per-line
  * filtering — one narrow pass per page.
  */
object AmazonProvider {

  private val relevantArchs = Seq("x86_64:", "noarch:", "src:")

  /** Extract package filename lines from an ALAS page's new_packages
    * block, honouring the arch-section rules: lines under a relevant
    * arch header are packages; any other `...:` header ends the run. */
  def newPackages(html: Column): Column = {
    val block = regexp_extract(html,
      "(?s)id=\"new_packages\"[^>]*>(.*?)</(?:div|pre)>", 1)
    val text = regexp_replace(block, "<[^>]+>", "\n")
    val lines = filter(transform(split(text, "\n"), l => trim(l)),
      l => l =!= "")
    // stateful arch gating via aggregate: (inArch, acc) folded over lines
    aggregate(lines,
      struct(lit(false).as("in_arch"),
        array().cast("array<string>").as("pkgs")),
      (acc, l) => {
        val isRelevant = l.isin(relevantArchs.map(x => x: Any): _*)
        val isHeader = l.endsWith(":")
        struct(
          when(isRelevant, lit(true))
            .when(isHeader, lit(false))
            .otherwise(acc.getField("in_arch")).as("in_arch"),
          when(!isRelevant && !isHeader && acc.getField("in_arch"),
            array_append(acc.getField("pkgs"), l))
            .otherwise(acc.getField("pkgs")).as("pkgs"))
      },
      acc => array_distinct(acc.getField("pkgs")))
  }

  /** The advisory's issue_overview section text — the reference's
    * Description source (`parser.py:204-210`: concatenated overview
    * paragraphs). Tags stripped, paragraph text joined. */
  def issueOverview(html: Column): Column = {
    val block = regexp_extract(html,
      "(?s)id=\"issue_overview\"[^>]*>(.*?)</(?:div|section)>", 1)
    trim(regexp_replace(regexp_replace(block, "<[^>]+>", ""),
      "\\s+", " "))
  }

  /** pages: (alas_id, severity, cves: array, html) plus OPTIONAL `url`
    * and `date` columns (the RSS item's link and pubDate, `parser.py:
    * 95-107`). One envelope per ADVISORY — the reference record is
    * ALAS-keyed (`map_to_vulnerability`, `parser.py:332-380`; snapshot
    * ids like amzn:2/alas-2018-939) with Metadata.CVE carrying the CVE
    * aliases as [{Name}] entries and each FixedIn row gaining
    * Available {Date: pubDate, Kind: "advisory"} — the fixdater's
    * always-accurate default candidate (`parser.py:355-367`). */
  def envelopes(pages: DataFrame, namespace: String): DataFrame = {
    val p1 =
      if (pages.columns.contains("url")) pages
      else pages.withColumn("url", lit(null).cast("string"))
    val p2a =
      if (p1.columns.contains("date")) p1
      else p1.withColumn("date", lit(null).cast("string"))
    // one envelope per ALAS id even if the staged pages table carries a
    // re-fetched advisory twice (overlapping RSS windows): the
    // reference's vuln dict keys by advisory so the later summary wins
    // (`parser.py:332-380`); deterministic pick — newest pubDate, then
    // url, then page-content hash
    val p2 = p2a
      .groupBy(col("alas_id"))
      .agg(max_by(
        struct(col("severity"), col("cves"), col("html"), col("url"),
          col("date")),
        struct(
          coalesce(graft.functions.Norm.fuzzy_to_date(col("date")),
            to_date(lit("0001-01-01"))),
          coalesce(col("url"), lit("")),
          xxhash64(col("html")))).as("__r"))
      .select(col("alas_id"), col("__r.*"))
    // Link: the RSS item's link verbatim (`parser.py:349`); the RSS
    // always carries one, so when a caller stages pages without the
    // optional url column, synthesize the public ALAS page URL the feed
    // would have provided (os-schema requires a non-null Link)
    val release = namespace.substring(namespace.indexOf(':') + 1)
    val linkPrefix =
      if (release == "1") "https://alas.aws.amazon.com/"
      else s"https://alas.aws.amazon.com/AL$release/"
    val link = coalesce(col("url"),
      concat(lit(linkPrefix), upper(col("alas_id")), lit(".html")))
    // rpm filename → FixedIn rows with pure built-ins (no UDF): strip
    // .rpm, name = all-but-last-two dash segments, version = last two
    val available = when(col("date").isNotNull, struct(
      date_format(graft.functions.Norm.fuzzy_to_date(col("date")),
        "yyyy-MM-dd").as("Date"),
      lit("advisory").as("Kind")))
    val fixedIn = array_sort(array_distinct(
      filter(
        transform(newPackages(col("html")), f => {
          val parts = split(regexp_replace(f, "\\.rpm$", ""), "-")
          val n = size(parts)
          struct(
            available.as("Available"),
            array_join(slice(parts, lit(1), n - 2), "-").as("Name"),
            lit(namespace).as("NamespaceName"),
            concat_ws("-", element_at(parts, -2), element_at(parts, -1))
              .as("Version"),
            lit("rpm").as("VersionFormat"),
            n.as("__n"))
        }),
        e => e.getField("__n") >= 3)))
    p2.select(Envelope.assemble(
      concat(lit(namespace), lit("/"), lower(col("alas_id"))),
      Envelope.OsSchema,
      Envelope.osPayload(struct(
        col("alas_id").as("Name"),
        lit(namespace).as("NamespaceName"),
        issueOverview(col("html")).as("Description"),
        graft.functions.Norm.normalize_severity(col("severity"))
          .as("Severity"),
        // no CVSS key: ALAS pages carry no vector and the reference's
        // amazon record omits the field entirely (snapshot shape)
        link.as("Link"),
        transform(fixedIn, e => struct(
          e.getField("Available").as("Available"),
          e.getField("Name").as("Name"),
          e.getField("NamespaceName").as("NamespaceName"),
          e.getField("Version").as("Version"),
          e.getField("VersionFormat").as("VersionFormat")))
          .as("FixedIn"),
        struct(
          transform(array_sort(col("cves")), c => struct(c.as("Name")))
            .as("CVE")).as("Metadata")))): _*)
  }
}
