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

  /** pages: (alas_id, severity, cves: array, html). One envelope per
    * (namespace, cve) with FixedIn from the page's package list. */
  def envelopes(pages: DataFrame, namespace: String): DataFrame = {
    val splitUdf = udf((f: String) => {
      // rpm filename → (name, version-release); mirrors F2
      // split_rpm_filename without arch handling for bare `n-v-r` lines
      val base = f.stripSuffix(".rpm")
      val parts = base.split("-")
      if (parts.length < 3) (f, null: String)
      else (parts.dropRight(2).mkString("-"),
        parts.takeRight(2).mkString("-"))
    })
    pages
      .withColumn("pkg_file", explode(newPackages(col("html"))))
      .withColumn("nv", splitUdf(col("pkg_file")))
      .filter(col("nv._2").isNotNull)
      .withColumn("cve", explode(col("cves")))
      .groupBy(col("cve"))
      .agg(
        // a CVE fixed by TWO advisories appears in both pages:
        // first() is partition-arrival nondeterministic, flipping
        // Description/Severity between runs — pick the lexically
        // smallest advisory and its severity, deterministically
        min_by(col("alas_id"), col("alas_id")).as("alas_id"),
        min_by(col("severity"), col("alas_id")).as("severity"),
        array_sort(collect_set(struct(
          col("nv._1").as("Name"),
          lit(namespace).as("NamespaceName"),
          lit("rpm").as("VersionFormat"),
          col("nv._2").as("Version")))).as("fixed_in"))
      .select(Envelope.assemble(
        concat(lit(namespace), lit("/"), lower(col("cve"))),
        Envelope.OsSchema,
        struct(
          col("cve").as("Name"),
          lit(namespace).as("NamespaceName"),
          concat(lit("see "), col("alas_id")).as("Description"),
          graft.functions.Norm.normalize_severity(col("severity"))
            .as("Severity"),
          graft.functions.Norm.ref_link_for_id(col("cve")).as("Link"),
          col("fixed_in").as("FixedIn"))): _*)
  }
}
