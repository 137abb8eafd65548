package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The universal record model (vunnel `result.py:33-37`): every provider
  * pipeline produces a Dataset of envelopes — a schema-versioned,
  * identifier-keyed JSON payload. The OS-schema vulnerability family
  * (`utils/vulnerability.py:83-146`) is modeled as typed case classes;
  * pass-through families stay as JSON strings in `item`.
  */
final case class Envelope(identifier: String, schema: String, item: String)

/** OS-schema vulnerability shapes (schema/vulnerability/os/schema-1.1.0),
  * with the reference's sentinel semantics preserved: `version = "None"`
  * means unfixed, `"0"` means not-affected NAK (`utils/vulnerability.py:
  * 85-89`) — these are string VALUES, never SQL NULLs (SURVEY §7.4.2).
  */
final case class FixedIn(
    Name: String,
    NamespaceName: String,
    VersionFormat: String, // rpm | dpkg | apk
    Version: String,       // "None" = unfixed, "0" = NAK
    Module: Option[String] = None)

final case class CvssBaseMetrics(
    base_score: Double,
    exploitability_score: Double,
    impact_score: Double,
    base_severity: String)

final case class CvssRecord(
    version: String,
    vector_string: String,
    base_metrics: CvssBaseMetrics,
    status: String = "N/A")

final case class Vulnerability(
    Name: String,
    NamespaceName: String,
    Description: String,
    Severity: String,
    Link: String,
    CVSS: Seq[CvssRecord] = Seq.empty,
    FixedIn: Seq[FixedIn] = Seq.empty)

object Envelope {

  /** The OS-schema payload wrapper: every OS-family record ships as
    * `{"Vulnerability": {...}}` (`Vulnerability.to_payload`,
    * `utils/vulnerability.py:145-146`; visible in every reference
    * provider snapshot). Providers assemble the inner record and wrap
    * it here so the envelope shape cannot drift per family. */
  def osPayload(vuln: Column): Column = struct(vuln.as("Vulnerability"))

  /** Always-present OS-element defaults (`utils/vulnerability.py:19-30`
    * and the Vulnerability dataclass asdict): the reference writes
    * `"CVSS": []` and `"Metadata": {}` even when a family never fills
    * them. Typed casts: a bare array()/map() is NullType-elemed and
    * some writers reject it. */
  def emptyCvss: Column = array().cast("array<string>")
  def emptyMetadata: Column = map().cast("map<string,string>")

  /** The reference FixedIn dataclass's non-null defaults
    * (`utils/vulnerability.py:91-103`): Module defaults to "" and
    * VendorAdvisory to {NoAdvisory: false, AdvisorySummary: []} in
    * __post_init__, so dataclass-based providers (arch, sles, photon,
    * mariner, fedora) always carry them in the bytes. */
  def defaultModule: Column = lit("")
  def defaultVendorAdvisory: Column = struct(
    array().cast("array<struct<ID:string,Link:string>>")
      .as("AdvisorySummary"),
    lit(false).as("NoAdvisory"))

  /** Schema registry mirroring `src/vunnel/schema.py` (urls are ours —
    * the design point is: every envelope names its payload schema+version). */
  val OsSchema = "https://example.invalid/graft/vulnerability/os/schema-1.1.0.json"
  /** Version-parameterized OS-schema URL — the reference publishes six
    * os-schema versions (`schema/vulnerability/os/schema-1.0.0.json` …
    * `schema-1.1.2.json`) and providers may pin any of them. */
  def osSchema(version: String): String =
    s"https://example.invalid/graft/vulnerability/os/schema-$version.json"
  val NvdSchema = "https://example.invalid/graft/vulnerability/nvd/schema-2.0.0.json"
  val OsvSchema = "https://example.invalid/graft/vulnerability/osv/schema-1.6.1.json"
  /** Per-record OSV schema URL — the passthrough families label each
    * envelope with the record's own schema_version
    * (`providers/rocky/__init__.py:60-64`). */
  def osvSchemaCol(version: Column): Column =
    concat(lit("https://example.invalid/graft/vulnerability/osv/schema-"),
      version, lit(".json"))
  val GhsaSchema = "https://example.invalid/graft/vulnerability/github/schema-1.0.3.json"
  val VexSchema = "https://example.invalid/graft/vulnerability/csaf-vex/schema-2.0.0.json"
  val AnnotatedOpenVexSchema = "https://example.invalid/graft/vulnerability/annotated-openvex/schema-1.0.0.json"
  // auxiliary decorator schemas (`schema.py:16-19,108-119`)
  val KevSchema = "https://example.invalid/graft/vulnerability/known-exploited/schema-1.0.0.json"
  val EpssSchema = "https://example.invalid/graft/vulnerability/epss/schema-1.0.0.json"
  val EolSchema = "https://example.invalid/graft/eol/schema-1.0.0.json"

  /** Canonical JSON: no nulls, field order = struct assembly order —
    * this wraps to_json with null dropping. Key order in the STORE
    * bytes is deliberately the caller's assembly order, matching the
    * reference, whose result store writes dataclass-order orjson
    * WITHOUT sort (`result.py:198`); the sorted-key rendering exists
    * only in its test harness (`tests/conftest.py:221-224`), and
    * [[graft.Golden]] mirrors that by re-sorting keys at compare
    * time. Providers are therefore free to assemble fields in a
    * semantically meaningful order — several sort FixedIn rows via
    * array_sort, whose ordering is keyed by the leading struct
    * fields (O3), which a forced alphabetical assembly would break.
    * Callers wanting byte-identical output across providers should
    * assemble sorted (most OS-schema providers do). */
  def canonicalJson(c: Column): Column = to_json(c, Map("ignoreNullFields" -> "true"))

  /** Assemble envelope columns from (identifier, schema, payload struct). */
  def assemble(identifier: Column, schemaUrl: String, payload: Column): Seq[Column] =
    assemble(identifier, lit(schemaUrl), payload)

  /** Column-typed schema overload for per-record schema URLs
    * ([[osvSchemaCol]]). */
  def assemble(identifier: Column, schemaUrl: Column, payload: Column): Seq[Column] =
    Seq(identifier.as("identifier"), schemaUrl.as("schema"),
      canonicalJson(payload).as("item"))
}
