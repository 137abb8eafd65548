package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lit, regexp_replace, struct, udf, when}

/** CVSS v3.x base / exploitability / impact scoring from a vector string.
  *
  * The reference computes these via the public `cvss` python package
  * (vunnel `providers/rhel/parser.py:1155-1176`,
  * `providers/github/parser.py:604-628`: base_score, esc, isc each
  * quantized to 0.1, plus a severity word). This is a from-scratch
  * implementation of the published FIRST CVSS v3.1 specification
  * (https://www.first.org/cvss/v3.1/specification-document §7.1) — pure
  * arithmetic, no library.
  */
object Cvss extends Serializable {

  final case class Scores(
      version: String,
      baseScore: Double,
      exploitabilityScore: Double,
      impactScore: Double,
      baseSeverity: String)

  private def weightAV(v: String) = v match {
    case "N" => 0.85; case "A" => 0.62; case "L" => 0.55; case "P" => 0.2
    case _ => Double.NaN
  }
  private def weightAC(v: String) = v match {
    case "L" => 0.77; case "H" => 0.44; case _ => Double.NaN
  }
  private def weightPR(v: String, scopeChanged: Boolean) = v match {
    case "N" => 0.85
    case "L" => if (scopeChanged) 0.68 else 0.62
    case "H" => if (scopeChanged) 0.5 else 0.27
    case _ => Double.NaN
  }
  private def weightUI(v: String) = v match {
    case "N" => 0.85; case "R" => 0.62; case _ => Double.NaN
  }
  private def weightCIA(v: String) = v match {
    case "H" => 0.56; case "L" => 0.22; case "N" => 0.0; case _ => Double.NaN
  }

  /** CVSS v3.1 Roundup: smallest number, specified to 1 decimal, >= input
    * (spec Appendix A). Integer arithmetic per the spec's reference impl. */
  def roundup(x: Double): Double = {
    val i = math.round(x * 100000.0)
    if (i % 10000 == 0) i / 100000.0
    else (math.floor(i / 10000.0) + 1) / 10.0
  }

  private def quantize1(x: Double): Double = math.rint(x * 10.0) / 10.0

  def severityWord(score: Double): String =
    if (score <= 0.0) "None"
    else if (score < 4.0) "Low"
    else if (score < 7.0) "Medium"
    else if (score < 9.0) "High"
    else "Critical"

  /** Parse + score a CVSS:3.x vector. Returns null on malformed input
    * (the reference logs-and-skips, `github/parser.py:619-627`). */
  def score(vectorIn: String): Scores = {
    if (vectorIn == null) return null
    val vector = vectorIn.stripSuffix("/") // reference removesuffix("/")
    val parts = vector.split("/")
    if (parts.isEmpty || !parts(0).startsWith("CVSS:3")) return null
    val version = parts(0).stripPrefix("CVSS:")
    val m = scala.collection.mutable.HashMap.empty[String, String]
    var i = 1
    while (i < parts.length) {
      val kv = parts(i).split(":", 2)
      if (kv.length != 2) return null
      m.put(kv(0), kv(1))
      i += 1
    }
    val required = Seq("AV", "AC", "PR", "UI", "S", "C", "I", "A")
    if (!required.forall(m.contains)) return null
    val scopeChanged = m("S") == "C"
    if (m("S") != "C" && m("S") != "U") return null

    val av = weightAV(m("AV")); val ac = weightAC(m("AC"))
    val pr = weightPR(m("PR"), scopeChanged); val ui = weightUI(m("UI"))
    val c = weightCIA(m("C")); val ci = weightCIA(m("I")); val a = weightCIA(m("A"))
    if (Seq(av, ac, pr, ui, c, ci, a).exists(_.isNaN)) return null

    val iscBase = 1.0 - (1.0 - c) * (1.0 - ci) * (1.0 - a)
    val isc =
      if (!scopeChanged) 6.42 * iscBase
      else 7.52 * (iscBase - 0.029) - 3.25 * math.pow(iscBase - 0.02, 15)
    val esc = 8.22 * av * ac * pr * ui
    val base =
      if (isc <= 0.0) 0.0
      else if (!scopeChanged) roundup(math.min(isc + esc, 10.0))
      else roundup(math.min(1.08 * (isc + esc), 10.0))

    Scores(version, base, quantize1(esc), quantize1(math.max(isc, 0.0)),
      severityWord(base))
  }

  // ---- Column API ------------------------------------------------------

  /** struct(version, baseScore, exploitabilityScore, impactScore,
    * baseSeverity) or null for malformed vectors. Native expression —
    * see [[graft.plans.Cvss3ScoreExpr]] for why not a udf. */
  def cvss3_score(vector: Column): Column = {
    import org.apache.spark.sql.graft.bridge.{column, expression}
    column(graft.plans.Cvss3ScoreExpr(expression(vector)))
  }

  /** CVSS v4.0 vector grammar (FIRST CVSS v4.0 spec §7, Table 23): the
    * 11 mandatory base metrics, then each optional threat /
    * environmental / supplemental metric at most once, each restricted
    * to its enumerated value set, in canonical spec order. Unknown
    * metric codes, invalid values, and duplicates are rejected — same
    * outcome as the reference's CVSS4 library parse
    * (`providers/github/parser.py:648-665`). Stricter in one corner:
    * optional metrics in NON-canonical order are rejected here (the
    * reference's dict-based parser tolerates them; GHSA emits canonical
    * order, so this only drops hand-mangled vectors). */
  private val cvss4Pattern =
    "^CVSS:4\\.0/AV:[NALP]/AC:[LH]/AT:[NP]/PR:[NLH]/UI:[NPA]" +
      "/VC:[HLN]/VI:[HLN]/VA:[HLN]/SC:[HLN]/SI:[HLN]/SA:[HLN]" +
      "(/E:[XAPU])?" +
      "(/CR:[XHML])?(/IR:[XHML])?(/AR:[XHML])?" +
      "(/MAV:[XNALP])?(/MAC:[XLH])?(/MAT:[XNP])?(/MPR:[XNLH])?" +
      "(/MUI:[XNPA])?(/MVC:[XHLN])?(/MVI:[XHLN])?(/MVA:[XHLN])?" +
      "(/MSC:[XNLH])?(/MSI:[XSNLH])?(/MSA:[XSNLH])?" +
      "(/S:[XNP])?(/AU:[XNY])?(/R:[XAUI])?(/V:[XDC])?(/RE:[XLMH])?" +
      "(/U:(X|Clear|Green|Amber|Red))?$"

  /** CVSS v4 pass-through with validation — the reference computes NO v4
    * scores, it validates the vector and emits `{version, vector}`
    * (`providers/github/parser.py:648-665`): same here, null for
    * malformed vectors. A trailing '/' is stripped first
    * (`parser.py:650`). */
  def cvss4_validate(vector: Column): Column = {
    val trimmed = regexp_replace(vector, "/$", "")
    when(trimmed.rlike(cvss4Pattern),
      struct(lit("4.0").as("version"), trimmed.as("vector")))
  }
}
