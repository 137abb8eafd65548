package graft.providers

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Envelope

/** OSV family (ubuntu/rocky/alma/bitnami/govulndb shape): pass-through
  * records with fix-date enrichment (F19, `utils/osv.py:9-108`) and the
  * OSV→OS downconvert (F20, `providers/ubuntu/os_downconvert.py:61-266`).
  *
  * The reference mutates nested JSON in place (walk affected[].ranges[]
  * .events[], attach database_specific.anchore.fixes). Spark-first, the
  * same output is produced relationally: explode to affected-level rows,
  * broadcast-join the fix-date dimension (J1), and re-assemble structs at
  * emit — no nested surgery, one narrow explode + one broadcast join +
  * one group-merge shuffle regardless of corpus size.
  */
object OsvProvider {

  val osvSchema: StructType = StructType.fromDDL(
    "id STRING, published STRING, withdrawn STRING, " +
      "upstream ARRAY<STRING>, " +
      "severity ARRAY<STRUCT<type: STRING, score: STRING>>, " +
      "affected ARRAY<STRUCT<" +
      "package: STRUCT<name: STRING, ecosystem: STRING>, " +
      "ranges: ARRAY<STRUCT<type: STRING, " +
      "events: ARRAY<STRUCT<introduced: STRING, fixed: STRING>>>>, " +
      "database_specific: STRUCT<anchore: STRUCT<status: STRING>>>>")

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "true").schema(osvSchema).json(path)

  /** OSV ecosystem → `ubuntu:X.YY[+esm]` namespace (os_downconvert.py:
    * 61-85): base releases map, plain Pro maps to +esm, FIPS/Realtime/
    * BlueField variants yield null. */
  def ecosystemToNamespace(eco: Column, includeEsm: Boolean = true): Column = {
    val base = regexp_extract(eco, "^Ubuntu:([0-9]+\\.[0-9]+)(?::LTS)?$", 1)
    val pro = regexp_extract(eco, "^Ubuntu:Pro:([0-9]+\\.[0-9]+)(?::LTS)?$", 1)
    when(base =!= "", concat(lit("ubuntu:"), base))
      .when(lit(includeEsm) && pro =!= "", concat(lit("ubuntu:"), pro, lit("+esm")))
      .otherwise(lit(null).cast("string"))
  }

  /** Ubuntu priority → Severity word (os_downconvert.py:88-110):
    * severity[type=Ubuntu].score capitalized; untriaged/unknown → Unknown. */
  def severityFromOsv(severityArr: Column): Column = {
    // try_element_at: ANSI mode makes element_at throw on an empty array
    val ubuntuScore = try_element_at(
      filter(severityArr, s => s.getField("type") === "Ubuntu"), lit(1))
      .getField("score")
    val cap = concat(upper(substring(trim(ubuntuScore), 1, 1)),
      lower(substring(trim(ubuntuScore), 2, 100)))
    when(cap.isin("Negligible", "Low", "Medium", "High", "Critical"), cap)
      .otherwise(lit("Unknown"))
  }

  /** One row per affected[] entry: (cve, namespace, severity, pkg,
    * fixed_versions[], wont_fix). Withdrawn records and records without
    * an upstream CVE are dropped (os_downconvert.py:215-223). */
  def affectedRows(osv: DataFrame, includeEsm: Boolean = true): DataFrame = {
    osv
      .filter(col("withdrawn").isNull)
      .filter(size(coalesce(col("upstream"), array())) > 0)
      .select(
        element_at(col("upstream"), 1).as("cve"),
        severityFromOsv(coalesce(col("severity"),
          array().cast("array<struct<type:string,score:string>>"))).as("severity"),
        col("published"),
        explode(col("affected")).as("aff"))
      .filter(col("aff.package.name").isNotNull)
      .select(
        col("cve"), col("severity"), col("published"),
        col("aff.package.name").as("pkg"),
        ecosystemToNamespace(col("aff.package.ecosystem"), includeEsm)
          .as("namespace"),
        // all `fixed` events across ranges (os_downconvert.py:118-131)
        filter(
          flatten(transform(coalesce(col("aff.ranges"),
            array().cast("array<struct<type:string,events:array<struct<introduced:string,fixed:string>>>>")),
            r => transform(r.getField("events"), e => e.getField("fixed")))),
          v => v.isNotNull).as("fixed_versions"),
        (col("aff.database_specific.anchore.status") === "wont-fix")
          .as("wont_fix"))
      .filter(col("namespace").isNotNull)
  }

  /** F19+F20: FixedIn rows with fix-date enrichment. `fixdates` is the
    * broadcast dimension with columns (cve, pkg, version, date, kind) —
    * joined USING those names; note [[patchFixDates]] takes the same
    * dimension under (vuln_id, pkg, fix_version, …) naming instead.
    * Missing dates fall back to the advisory published date, marked
    * kind='advisory' (osv.py:78-90's inaccurate-candidate rule). */
  def fixedInRows(affected: DataFrame, fixdates: DataFrame): DataFrame = {
    val released = affected.filter(size(col("fixed_versions")) > 0)
      .select(col("cve"), col("namespace"), col("severity"), col("pkg"),
        col("published"), explode(col("fixed_versions")).as("version"))
      .join(broadcast(fixdates),
        Seq("cve", "pkg", "version"), "left")
      .select(col("cve"), col("namespace"), col("severity"), col("pkg"),
        col("version"), lit(false).as("no_advisory"),
        coalesce(col("date"), substring(col("published"), 1, 10)).as("available_date"),
        coalesce(col("kind"), lit("advisory")).as("available_kind"))
    // wont-fix / no-fix rows: Version "None"; +esm channels emit nothing
    // unfixed (the base record already discloses it)
    val unfixed = affected.filter(size(col("fixed_versions")) === 0)
      .filter(!col("namespace").endsWith("+esm"))
      .select(col("cve"), col("namespace"), col("severity"), col("pkg"),
        lit("None").as("version"), col("wont_fix").as("no_advisory"),
        lit(null).cast("string").as("available_date"),
        lit(null).cast("string").as("available_kind"))
    released.unionByName(unfixed)
  }

  /** J7: ubuntu Pro→base inference (`providers/ubuntu/parser.py:95-158,
    * 427-521`): a (cve, pkg) fixed ONLY on the Pro (+esm) channel implies
    * the base release won't see a fix → synthesize a base wont-fix row.
    * Anti-join of Pro rows vs base rows on (cve, base-namespace, pkg),
    * mapped to synthetic unfixed rows, unioned back. */
  def proToBaseInference(affected: DataFrame): DataFrame = {
    val pro = affected.filter(col("namespace").endsWith("+esm"))
      .withColumn("base_ns",
        regexp_replace(col("namespace"), "\\+esm$", ""))
    val base = affected.filter(!col("namespace").endsWith("+esm"))
    val missing = pro.join(base
        .select(col("cve").as("b_cve"), col("namespace").as("b_ns"),
          col("pkg").as("b_pkg")),
        col("cve") === col("b_cve") && col("base_ns") === col("b_ns") &&
          col("pkg") === col("b_pkg"),
        "left_anti")
    val synthesized = missing.select(
      col("cve"), col("severity"), col("published"), col("pkg"),
      col("base_ns").as("namespace"),
      array().cast("array<string>").as("fixed_versions"),
      lit(true).as("wont_fix"))
    affected.unionByName(synthesized)
  }

  // ---- OSV passthrough family (rocky / govulndb / bitnami) ------------

  /** Relational projection of an OSV record — used ONLY to compute the
    * fix-date patch (which (affected, range, event) gets which date).
    * The emit path carries the record's raw JSON string, so record-level
    * database_specific, credits, affected-level ecosystem_specific /
    * database_specific / severity, and any future OSV field all survive
    * verbatim — exactly the reference's loaded-dict passthrough
    * (`providers/rocky/parser.py:53-65`,
    * `providers/govulndb/parser.py:100-119`). */
  val passthroughProjection: StructType = StructType.fromDDL(
    "id STRING, schema_version STRING, published STRING, " +
      "affected ARRAY<STRUCT<" +
      "package: STRUCT<ecosystem: STRING, name: STRING>, " +
      "ranges: ARRAY<STRUCT<events: ARRAY<STRUCT<fixed: STRING>>>>>>")

  /** Read OSV records as (id, raw): one row per top-level JSON record.
    * `json_records` splits a file into records whether it is a
    * one-advisory-per-file tree (the reference's layout,
    * `rocky/parser.py:52-55`), a bulk array download, or JSONL.
    * Records without an id are dropped; nothing else is projected away.
    *
    * `wholeFile = true` (the default) reads each file as one row —
    * right for the reference's small-file tree and for bulk-array
    * downloads, but a single multi-GB JSONL dump would become one
    * unsplittable task (and a >2 GB file overflows UTF8String). For
    * large JSONL corpora pass `wholeFile = false`: line-mode text()
    * splits the scan at block boundaries and every line parallelizes
    * — the 100 TB path. Both modes run records through the same
    * `json_records` canonicalization, so the emitted bytes are
    * identical whichever mode read the corpus. */
  def readPassthrough(spark: SparkSession, path: String,
      wholeFile: Boolean = true): DataFrame = {
    val scan =
      if (wholeFile) spark.read.option("wholetext", "true").text(path)
      else spark.read.text(path).filter(trim(col("value")) =!= "")
    scan
      .select(explode(
        graft.plans.JsonExpressions.json_records(col("value"))).as("raw"))
      .select(get_json_object(col("raw"), "$.id").as("id"), col("raw"))
      .filter(coalesce(col("id"), lit("")) =!= "")
  }

  /** Rocky's fixdate-lookup ecosystem normalization
    * (`providers/rocky/parser.py:70-75`): "Rocky Linux:8" → "rocky:8",
    * anything else lowercased. */
  def rockyEcosystem(eco: Column): Column = {
    val ver = regexp_extract(eco, "^(?i)rocky linux:([^:]+)$", 1)
    when(ver =!= "", concat(lit("rocky:"), ver)).otherwise(lower(eco))
  }

  /** F19 for the passthrough family (`utils/osv.py:8-110`): every range
    * event with a truthy `fixed` version (the reference skips falsy fix
    * versions — `if not fix_version: continue`, osv.py:71-73) gets a
    * first-observed date from the fix-date dimension `(vuln_id,
    * ecosystem, pkg, version, date, kind)` — the advisory's own
    * `published` date rides along as the kind='advisory' fallback — and
    * the per-range results land as `database_specific.anchore.fixes`,
    * event order preserved, other database_specific keys preserved
    * (osv.py:105-110). Ranges with no dated fix are untouched.
    *
    * Spark-first: the reference walks and mutates each record's nested
    * JSON in place; here a typed projection of the ranges explodes to
    * rows once, broadcast-joins the dimension, folds back to ONE tiny
    * `(apos·1e5+rpos) → fixes` map per record, and the row-local
    * [[graft.plans.OsvFixPatchExpr]] kernel re-attaches the verdict to
    * the raw document. The only shuffles are the map fold and the
    * id-keyed re-attach join, both bounded by record count, never by
    * corpus bytes — and the record itself is never round-tripped
    * through a typed schema, so nothing is dropped. */
  /** @param lookupId the vuln id used for the fix-date lookup — the
    *   reference's `vuln_id_override` (`utils/osv.py:13-22`, needed
    *   when the record id is provider-internal like `UBUNTU-CVE-*` but
    *   the dimension keys by the upstream CVE). Defaults to the record
    *   id.
    * @param usnDates optional authoritative fix-ship dimension
    *   `(ecosystem, pkg, version, date)` — the reference's USN overlay
    *   (`ubuntu/usn_fixdate_overlay.py`): an accurate=true candidate
    *   preferred by `finder.best()`, kind "advisory". The fixdates
    *   dimension itself may carry an optional boolean `accurate`
    *   column (finder.Result.accurate); rows without it are treated as
    *   accurate first-observed dates. */
  def patchFixDates(records: DataFrame, fixdates: DataFrame,
      ecosystemNormalizer: Column => Column = lower(_),
      lookupId: Column = col("id"),
      usnDates: Option[DataFrame] = None): DataFrame = {
    val emptyRanges = array().cast(
      "array<struct<events:array<struct<fixed:string>>>>")
    // ONE dimension row per lookup key (fixdater.best returns a single
    // result): earliest date wins, kind riding along in the tie-break —
    // a doubled store row would otherwise produce duplicate fixes
    // entries for one event. The optional boolean `accurate` column
    // mirrors finder.Result.accurate (`grype_db_first_observed.py:386`
    // flags epoch-1 rows inaccurate; `vunnel_first_observed.py:175` is
    // always accurate); a dimension without the column is all-accurate.
    val fdAcc: Column =
      if (fixdates.columns.contains("accurate"))
        coalesce(col("accurate"), lit(true))
      else lit(true)
    val fd = broadcast(fixdates
      .groupBy(col("vuln_id").as("fd_vuln"), col("ecosystem").as("fd_eco"),
        col("pkg").as("fd_pkg"), col("version").as("fd_version"))
      .agg(min(when(fdAcc, struct(col("date"), col("kind")))).as("best"),
        min(when(!fdAcc, struct(col("date"), col("kind")))).as("bestIn"))
      .select(col("fd_vuln"), col("fd_eco"), col("fd_pkg"),
        col("fd_version"), col("best.date").as("fd_date"),
        col("best.kind").as("fd_kind"),
        col("bestIn.date").as("fdi_date"),
        col("bestIn.kind").as("fdi_kind")))
    val usn = usnDates.map(u => broadcast(u
      .groupBy(col("ecosystem").as("usn_eco"), col("pkg").as("usn_pkg"),
        col("version").as("usn_ver"))
      .agg(min(col("date")).as("usn_date"))))
    val rec = from_json(col("raw"), passthroughProjection)
    val events = records
      .select(col("id"), lookupId.as("__lid"),
        rec.getField("published").as("published"),
        posexplode(coalesce(rec.getField("affected"),
          array().cast(passthroughProjection("affected").dataType)))
          .as(Seq("apos", "aff")))
      .filter(col("aff.package.name").isNotNull &&
        col("aff.package.ecosystem").isNotNull)
      .select(col("id"), col("__lid"), col("published"), col("apos"),
        col("aff.package.name").as("pkg"),
        ecosystemNormalizer(col("aff.package.ecosystem")).as("eco"),
        posexplode(coalesce(col("aff.ranges"), emptyRanges))
          .as(Seq("rpos", "rng")))
      .select(col("id"), col("__lid"), col("published"), col("apos"),
        col("rpos"), col("pkg"), col("eco"),
        posexplode(coalesce(col("rng.events"),
          array().cast("array<struct<fixed:string>>")))
          .as(Seq("epos", "ev")))
      // the sentinel rule (`fixdate/finder.py:149-151`): "", "0" and
      // "None" fix versions never resolve ANY date — not even the
      // published-date fallback
      .filter(col("ev.fixed").isNotNull &&
        !col("ev.fixed").isin("", "0", "None"))
    val storeDated = events
      .join(fd, col("__lid") === col("fd_vuln") &&
        col("eco") === col("fd_eco") &&
        col("pkg") === col("fd_pkg") && col("ev.fixed") === col("fd_version"),
        "left")
    val usnDated = usn match {
      case None => storeDated
        .withColumn("usn_date", lit(null).cast("string"))
      case Some(u) => storeDated
        .join(u, col("eco") === col("usn_eco") &&
          col("pkg") === col("usn_pkg") && col("ev.fixed") === col("usn_ver"),
          "left")
    }
    // finder.best() (`tool/fixdate/finder.py:138-204`): the candidate
    // list is [accurate extra candidates (USN, `usn_fixdate_overlay.py:
    // 146-161`), inaccurate candidates (the record's published date,
    // `utils/osv.py:76-85`)]. An ACCURATE first-observed store date caps
    // them — candidates dated after it are discarded, the highest-
    // PRIORITY surviving candidate wins (list order: USN before
    // published, NOT earliest date), and the store date itself is the
    // fallback (`finder.py:180-194`). With no accurate store date the
    // candidates win outright in the same priority order, an INACCURATE
    // store date is the last resort (`finder.py:196-201`).
    val pub = nullif(substring(col("published"), 1, 10), lit(""))
    val usnD = col("usn_date")
    val adv = lit("advisory")
    val fixPick =
      when(col("fd_date").isNotNull,
        when(usnD.isNotNull && usnD <= col("fd_date"),
          struct(usnD.as("d"), adv.as("k")))
          .when(pub.isNotNull && pub <= col("fd_date"),
            struct(pub.as("d"), adv.as("k")))
          .otherwise(struct(col("fd_date").as("d"),
            col("fd_kind").as("k"))))
        .otherwise(
          when(usnD.isNotNull, struct(usnD.as("d"), adv.as("k")))
            .when(pub.isNotNull, struct(pub.as("d"), adv.as("k")))
            .when(col("fdi_date").isNotNull,
              struct(col("fdi_date").as("d"), col("fdi_kind").as("k"))))
    val dated = usnDated
      .select(col("id"), col("apos"), col("rpos"), col("epos"),
        col("ev.fixed").as("version"),
        fixPick.getField("d").as("fix_date"),
        fixPick.getField("k").as("fix_kind"))
      .filter(col("fix_date").isNotNull)
    val fixmap = dated
      .groupBy(col("id"), col("apos"), col("rpos"))
      .agg(transform(
        array_sort(collect_list(struct(col("epos"), col("version"),
          col("fix_date"), col("fix_kind")))),
        f => struct(f.getField("version").as("version"),
          f.getField("fix_date").as("date"),
          f.getField("fix_kind").as("kind"))).as("fixes"))
      .groupBy(col("id"))
      .agg(map_from_entries(collect_list(struct(
        (col("apos").cast("long") * 100000L + col("rpos")).as("key"),
        col("fixes").as("value")))).as("fixmap"))
    records.join(fixmap, Seq("id"), "left")
      .withColumn("raw",
        when(col("fixmap").isNotNull,
          graft.plans.JsonExpressions.osv_fix_patch(col("raw"), col("fixmap")))
          .otherwise(col("raw")))
      .drop("fixmap")
  }

  /** Passthrough result envelopes (`providers/rocky/__init__.py:60-81`):
    * identifier = lowercased record id, schema = the OSV schema URL
    * parameterized by the record's OWN schema_version (default "1.7.0",
    * rocky `_normalize`; records whose major version is not the
    * provider family's 1.x are skipped, `compatible_schema`), payload =
    * the fix-date-patched record itself — byte-faithful, nothing
    * dropped. Note the "1.7.0" default feeds ONLY the schema URL:
    * `_normalize` (rocky `parser.py:59`) reads
    * `vuln_entry.get("schema_version", "1.7.0")` and yields the record
    * UNCHANGED, so a record missing the key is stored without one —
    * injecting it into the payload here would be the divergence. */
  def passthroughEnvelopes(records: DataFrame, fixdates: DataFrame,
      ecosystemNormalizer: Column => Column = lower(_)): DataFrame = {
    // the compatibility gate depends only on the raw record, so it runs
    // BEFORE the patch pipeline: records of a foreign schema generation
    // are dropped at the scan, not after paying the explode/join/patch
    val compatible = records
      .withColumn("sv", coalesce(
        get_json_object(col("raw"), "$.schema_version"), lit("1.7.0")))
      .filter(split(col("sv"), "\\.").getItem(0) === "1")
    patchFixDates(compatible, fixdates, ecosystemNormalizer)
      .select(lower(col("id")).as("identifier"),
        Envelope.osvSchemaCol(col("sv")).as("schema"),
        col("raw").as("item"))
  }

  /** Group per (namespace, cve) into OS-schema envelopes. */
  def envelopes(fixedIn: DataFrame): DataFrame = {
    fixedIn
      .groupBy(col("namespace"), col("cve"))
      .agg(
        // two OSV records can name the same upstream CVE with
        // different priorities: first() flips between runs — the
        // highest severity wins, deterministically (the same A3 merge
        // DebianProvider uses)
        max_by(col("severity"),
          graft.functions.Norm.severity_rank(col("severity")))
          .as("severity"),
        array_sort(collect_list(struct(
          col("pkg").as("Name"),
          col("namespace").as("NamespaceName"),
          lit("dpkg").as("VersionFormat"),
          col("version").as("Version"),
          struct(col("no_advisory").as("NoAdvisory")).as("VendorAdvisory"),
          when(col("available_date").isNotNull,
            struct(col("available_date").as("Date"),
              col("available_kind").as("Kind"))).as("Available"))))
          .as("fixed_in"))
      .filter(size(col("fixed_in")) > 0)
      .select(Envelope.assemble(
        concat(col("namespace"), lit("/"), lower(col("cve"))),
        Envelope.OsSchema,
        // NO CVSS key: the reference's OSV->OS downconvert writes a
        // 7-key record (`ubuntu/os_downconvert.py:246-253`), unlike the
        // dataclass-based families
        Envelope.osPayload(struct(
          col("cve").as("Name"),
          col("namespace").as("NamespaceName"),
          lit("").as("Description"),
          col("severity").as("Severity"),
          concat(lit("https://ubuntu.com/security/"), col("cve")).as("Link"),
          col("fixed_in").as("FixedIn"),
          Envelope.emptyMetadata.as("Metadata")))): _*)
  }
}
