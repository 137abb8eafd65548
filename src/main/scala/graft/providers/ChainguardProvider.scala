package graft.providers

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Envelope
import graft.sources.Sources

/** Chainguard's OSV feed leg (vunnel `providers/chainguard/__init__.py:
  * 25-72` `use_osv` + `providers/wolfi/parser.py:260-339` OSVParser):
  * the per-advisory OSV JSONs arrive as one tar.gz; members whose
  * basename is not a well-formed CGA id are skipped with a warning
  * (`parser.py:297-303`); records pass through byte-faithful apart from
  * the `ranges[].database_specific.anchore.fixes` fix-date patch
  * (`_normalize` → `osv.patch_fix_date`), keyed
  * `chainguard:rolling/<id>` with the id's case preserved, under OSV
  * schema 1.7.0 (the provider pins the version, not the record).
  *
  * The secdb leg stays [[SecdbProvider]] — the reference flips between
  * the two parsers by config, sharing the wolfi family either way.
  */
object ChainguardProvider {

  /** `^CGA(-[23456789cfghjmpqrvwx]{4}){3}$` (`parser.py:262`). */
  private val cgaId = "^CGA(-[23456789cfghjmpqrvwx]{4}){3}$"

  val namespace = "chainguard"
  val release = "rolling"

  /** One (id, raw) row per valid tar member; `raw` is the
    * canonicalized record so emission is byte-stable. The CGA gate
    * matches the FULL member name minus `.json` (`parser.py:297-303`
    * `_cga_id_re.match(n.removesuffix(".json"))`) — a nested
    * `sub/CGA-….json` member is skipped, exactly as the reference
    * skips-with-warning. */
  def records(spark: SparkSession, tarPath: String): DataFrame =
    Sources.tarMembers(spark, tarPath, "*.json")
      .filter(regexp_extract(
        regexp_replace(col("member"), "\\.json$", ""), cgaId, 0) =!= "")
      .select(explode(
        graft.plans.JsonExpressions.json_records(col("content"))).as("raw"))
      .select(get_json_object(col("raw"), "$.id").as("id"), col("raw"))
      .filter(coalesce(col("id"), lit("")) =!= "")

  /** Envelopes, with the fix-date patch when a dimension is supplied.
    * The ecosystem reaches the fixdater lookup verbatim ("Chainguard")
    * — the reference passes no ecosystem processor here. */
  def osvEnvelopes(spark: SparkSession, tarPath: String,
      fixdates: Option[DataFrame] = None): DataFrame = {
    val recs = records(spark, tarPath)
    val patched = fixdates match {
      case None => recs
      case Some(fd) => OsvProvider.patchFixDates(recs, fd, e => e)
    }
    patched.select(
      concat(lit(s"$namespace:$release/"), col("id")).as("identifier"),
      Envelope.osvSchemaCol(lit("1.7.0")).as("schema"),
      col("raw").as("item"))
  }
}
