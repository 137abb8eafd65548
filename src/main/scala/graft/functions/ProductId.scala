package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** RHEL full-product-id (FPI) parsing (F4/F5) — minor version + TRI-STATE
  * support channel from CSAF/Hydra product ids (vunnel
  * `providers/rhel/product_id.py:1-199`):
  *
  *  - OLD prefix `{Repo}-{MAJOR}.{MINOR}[.{Z}][.{markers}]`
  *    (`AppStream-9.5.0.GA:...` → (5, "ga");
  *    `BaseOS-9.4.0.Z.MAIN.EUS:...` → (4, "eus"))
  *  - NEW prefix `rhel-{MAJOR}.{MINOR}[-marker]`
  *    (`rhel-8.6-eus::appstream:...` → (6, "eus"))
  *  - major-only ELS streams (`7Server-ELS:...` → (None, "els"))
  *  - channel is tri-state: "ga" only for RECOGNIZED general markers;
  *    unknown markers (e.g. `.Z.ENS`) are null, never assumed GA
  *  - dist-tag fallback: `.elN_M` → M, modular `+elN.M` → M; a bare
  *    `.elN` (GA) or respin `.elN.M` carries NO minor.
  */
object ProductId extends Serializable {

  final case class Info(minor: Option[Int], channel: Option[String])

  private val extendedMarkers = Set("EUS", "E4S", "AUS", "TUS")
  private val generalMarkers = Set("GA", "Z", "MAIN")

  private val newPrefix = "^rhel-(\\d+)\\.(\\d+)(?:-([A-Za-z0-9]+))?$".r
  private val oldPrefix =
    "^([A-Za-z0-9]+(?:-[A-Za-z0-9]+)*?)-(\\d+)\\.(\\d+)((?:\\.[A-Za-z0-9]+)*)$".r
  private val elsMarker = "(?i)(?:^|-)ELS(?:[.:]|$)".r
  private val distTagMinor = "(?:(?:^|[.+])el\\d+_(\\d+))|(?:\\+el\\d+\\.(\\d+))".r

  private def platformPrefix(productId: String): String =
    if (productId.startsWith("rhel-")) productId.split("::", 2)(0)
    else productId.split(":", 2)(0)

  private def channelFromTokens(tokens: Seq[String]): Option[String] = {
    val upper = tokens.filterNot(_.forall(_.isDigit))
      .map(_.toUpperCase(java.util.Locale.ROOT))
    upper.find(extendedMarkers.contains)
      .map(_.toLowerCase(java.util.Locale.ROOT))
      .orElse(
        if (upper.nonEmpty && upper.forall(generalMarkers.contains)) Some("ga")
        else None)
  }

  def parseProductId(productId: String): Info = {
    if (productId == null || productId.isEmpty) return Info(None, None)
    val prefix = platformPrefix(productId)
    prefix match {
      case newPrefix(_, minor, marker) =>
        val channel =
          if (marker == null) Some("ga") else channelFromTokens(Seq(marker))
        Info(Some(minor.toInt), channel)
      case oldPrefix(_, _, minor, rest) =>
        val tokens = Option(rest).getOrElse("").split("\\.").filter(_.nonEmpty)
        Info(Some(minor.toInt), channelFromTokens(tokens.toSeq))
      case _ if elsMarker.findFirstIn(prefix).isDefined =>
        Info(None, Some("els"))
      case _ => Info(None, None)
    }
  }

  /** `.elN_M` / `+elN.M` dist-tag minor fallback; None for bare GA tags. */
  def minorFromDistTag(version: String): Option[Int] = {
    if (version == null) return None
    distTagMinor.findFirstMatchIn(version).flatMap { m =>
      Option(m.group(1)).orElse(Option(m.group(2))).map(_.toInt)
    }
  }

  // ---- Column API ------------------------------------------------------
  private val parseUdf = udf((s: String) => {
    val i = parseProductId(s)
    (i.minor.map(_.toString).orNull, i.channel.orNull)
  })
  private val distTagUdf = udf((s: String) => minorFromDistTag(s))

  /** struct(_1 = minor-as-string-or-null, _2 = channel-or-null). */
  def product_id_info(c: Column): Column = parseUdf(c)
  def dist_tag_minor(c: Column): Column = distTagUdf(c)
}
