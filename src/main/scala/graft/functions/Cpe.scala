package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** CPE parsing + normalization (F7, vunnel
  * `tool/fixdate/grype_db_first_observed.py:22` normalizes CPEs to a
  * short comparable form for lookup keys).
  *
  * Handles both syntaxes:
  *  - 2.3 formatted string: `cpe:2.3:a:vendor:product:version:...`
  *  - 2.2 URI form:         `cpe:/a:vendor:product:version`
  *
  * The short form keeps (part, vendor, product) — the join-key stable
  * prefix — as `cpe:/{part}:{vendor}:{product}`.
  */
object Cpe extends Serializable {

  final case class ParsedCpe(part: String, vendor: String, product: String,
      version: String)

  def parse(cpe: String): ParsedCpe = {
    if (cpe == null) return null
    if (cpe.startsWith("cpe:2.3:")) {
      val f = cpe.substring("cpe:2.3:".length).split(":", -1)
      if (f.length < 3) return null
      ParsedCpe(f(0), f(1), f(2),
        if (f.length > 3 && f(3) != "*" && f(3).nonEmpty) f(3) else null)
    } else if (cpe.startsWith("cpe:/")) {
      val f = cpe.substring("cpe:/".length).split(":", -1)
      if (f.length < 3) return null
      ParsedCpe(f(0), f(1), f(2),
        if (f.length > 3 && f(3).nonEmpty) f(3) else null)
    } else null
  }

  /** Short normalized lookup key: `cpe:/{part}:{vendor}:{product}`. */
  def normalize(cpe: String): String = {
    val p = parse(cpe)
    if (p == null) null else s"cpe:/${p.part}:${p.vendor}:${p.product}"
  }

  private val normalizeUdf = udf((s: String) => Option(normalize(s)))
  private val parseUdf = udf((s: String) => Option(parse(s)))

  def cpe_normalize(c: Column): Column = normalizeUdf(c)
  def cpe_parse(c: Column): Column = parseUdf(c)
}
