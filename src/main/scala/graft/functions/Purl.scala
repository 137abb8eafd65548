package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Package-URL parsing (F6) — from-scratch implementation of the public
  * purl spec subset the reference exercises (vunnel
  * `providers/rhel/csaf_parser.py:11-46` module resolution,
  * `providers/ubuntu/vex_overlay.py` src-pkg/distro extraction).
  */
object Purl extends Serializable {

  final case class ParsedPurl(
      purlType: String,
      namespace: String, // null when absent
      name: String,
      version: String,   // null when absent
      qualifiers: Map[String, String])

  /** Parse `pkg:type/namespace/name@version?k=v&k2=v2#subpath`.
    * Returns null on malformed input. */
  def parse(purl: String): ParsedPurl = {
    if (purl == null || !purl.startsWith("pkg:")) return null
    var rest = purl.substring(4).dropWhile(_ == '/')
    // strip subpath then qualifiers
    val hashIdx = rest.indexOf('#')
    if (hashIdx >= 0) rest = rest.substring(0, hashIdx)
    val qIdx = rest.indexOf('?')
    val qualifiers: Map[String, String] =
      if (qIdx < 0) Map.empty
      else {
        val qs = rest.substring(qIdx + 1)
        rest = rest.substring(0, qIdx)
        qs.split("&").iterator.flatMap { kv =>
          kv.split("=", 2) match {
            case Array(k, v) if k.nonEmpty =>
              Some(k.toLowerCase(java.util.Locale.ROOT) -> urlDecode(v))
            case _ => None
          }
        }.toMap
      }
    val atIdx = rest.lastIndexOf('@')
    val version = if (atIdx >= 0) urlDecode(rest.substring(atIdx + 1)) else null
    if (atIdx >= 0) rest = rest.substring(0, atIdx)
    val segs = rest.split("/").filter(_.nonEmpty)
    if (segs.length < 2) return null // need at least type/name
    val t = segs.head.toLowerCase(java.util.Locale.ROOT)
    val name = urlDecode(segs.last)
    val namespace =
      if (segs.length > 2) segs.slice(1, segs.length - 1).map(urlDecode).mkString("/")
      else null
    ParsedPurl(t, namespace, name, version, qualifiers)
  }

  private def urlDecode(s: String): String =
    try java.net.URLDecoder.decode(s, "UTF-8") catch { case _: Exception => s }

  /** rpm module purl detection — old `rpmmod` type OR new `rpmmod`
    * qualifier (csaf_parser.py:12-18). */
  def isRpmModulePurl(p: ParsedPurl): Boolean =
    p != null && (p.purlType == "rpmmod" || p.qualifiers.contains("rpmmod"))

  /** Module name:stream resolution (csaf_parser.py:21-46):
    * old `pkg:rpmmod/redhat/ruby@2.5:809...:b46` → "ruby:2.5";
    * new `pkg:rpm/redhat/ruby@2.5?rpmmod=ruby:3.1:809...:a75` → "ruby:3.1". */
  def resolveModuleName(p: ParsedPurl): String = {
    if (p == null) return null
    if (p.purlType == "rpmmod") {
      val modVersion = Option(p.version).getOrElse("")
      val stream = if (modVersion.contains(":")) modVersion.split(":")(0) else modVersion
      s"${p.name}:$stream"
    } else p.qualifiers.get("rpmmod") match {
      case Some(rpmmod) =>
        val parts = rpmmod.split(":")
        if (parts.length >= 2) s"${parts(0)}:${parts(1)}" else rpmmod
      case None => null
    }
  }

  /** Ubuntu purl → (src_pkg, distro_label): `pkg:deb/ubuntu/openssl@3.0.2
    * ?distro=jammy` → ("openssl", "jammy"). */
  def ubuntuSrcAndDistro(p: ParsedPurl): (String, String) =
    if (p == null) (null, null)
    else (p.name, p.qualifiers.getOrElse("distro", null))

  // ---- Column API ------------------------------------------------------
  private val parseUdf = udf((s: String) => Option(parse(s)))
  private val moduleUdf = udf((s: String) => Option(resolveModuleName(parse(s))))
  private val isModUdf = udf((s: String) => isRpmModulePurl(parse(s)))

  def purl_parse(c: Column): Column = parseUdf(c)
  def purl_module_name(c: Column): Column = moduleUdf(c)
  def purl_is_rpm_module(c: Column): Column = isModUdf(c)
}
