package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus curation — the dedup key step
  * every crawl pipeline runs before exact/near dedup: the same page
  * arrives as `HTTP://Example.com:80/a/?utm_source=x&b=1#top` and
  * `http://example.com/a/?b=1` and must collapse.
  *
  * Pure Column composition (codegen'd string/array ops, no UDF): the
  * whole normalization is a scan, and the same arithmetic replays in
  * the DuckDB oracle. Rules (the common canonicalization subset):
  *   - scheme and host lowercase; fragment dropped
  *   - default ports stripped (`:80` for http, `:443` for https)
  *   - tracking params dropped (`utm_*`, `gclid`, `fbclid`, `ref`)
  *   - remaining query params sorted (order-insensitive compare),
  *     empty query dropped
  *   - trailing slash stripped from non-root paths; bare authority
  *     gets path `/`
  * Inputs without a `scheme://` prefix pass through trimmed — the
  * caller decides whether schemeless rows are URLs at all.
  */
object Url {

  private val schemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"

  /** Everything after `scheme://`, null when no scheme. */
  private def afterScheme(u: Column): Column = {
    val m = regexp_extract(u, schemeRe + "(.*)$", 2)
    when(u.rlike(schemeRe), m)
  }

  /** Lowercased scheme, null when absent. */
  def scheme(u: Column): Column = {
    val s = lower(regexp_extract(u, schemeRe, 1))
    when(u.rlike(schemeRe), s)
  }

  /** authority = host[:port] — the part before the first `/`, `?`
    * or `#` after the scheme. */
  private def authority(u: Column): Column =
    regexp_extract(afterScheme(u), "^([^/?#]*)", 1)

  /** Lowercased host without port (and without userinfo). */
  def host(u: Column): Column = {
    val a = authority(u)
    // strip userinfo@ then :port
    lower(regexp_replace(regexp_replace(a, "^[^@]*@", ""), ":\\d*$", ""))
  }

  /** The registrable-ish domain: last two dot-labels of the host. (A
    * real eTLD+1 needs the public-suffix list — config the library
    * does not ship; two labels is the standard cheap approximation
    * and is exact for .com/.org/.net-style corpora.) */
  def registeredDomain(u: Column): Column = {
    val h = host(u)
    val labels = split(h, "\\.")
    when(h.isNull, lit(null).cast("string"))
      // single/double-label hosts (localhost, example.com): as-is
      .when(size(labels) <= 2, h)
      .otherwise(concat_ws(".",
        element_at(labels, -2), element_at(labels, -1)))
  }

  /** Canonical form per the object contract; schemeless input passes
    * through trimmed; null → null. */
  def normalize(u: Column): Column = {
    val t = trim(u)
    val sch = scheme(t)
    val rest = afterScheme(t)
    val auth = authority(t)
    val h = host(t)
    // port survives unless it is the scheme default
    val port = regexp_extract(auth, ":(\\d+)$", 1)
    val keepPort = (port =!= "") &&
      !((sch === "http" && port === "80") ||
        (sch === "https" && port === "443"))
    val hostPort = when(keepPort, concat(h, lit(":"), port)).otherwise(h)

    // path = after authority, before ? or #; fragment dies here
    val pathQ = regexp_replace(
      regexp_extract(rest, "^[^/?#]*(.*)$", 1), "#.*$", "")
    val path0 = regexp_extract(pathQ, "^([^?]*)", 1)
    // no lookbehind (RE2-safe for the oracle replay): keep the root
    // slash, strip any other trailing one
    val path = when(path0 === "", lit("/"))
      .when(path0 === "/", lit("/"))
      .otherwise(regexp_replace(path0, "/$", ""))

    // query: drop tracking params, sort the rest
    val rawQ = when(pathQ.rlike("\\?"),
      regexp_replace(pathQ, "^[^?]*\\?", "")).otherwise(lit(""))
    val kept = filter(split(rawQ, "&"), p =>
      p =!= "" && !p.rlike("^(utm_[^=]*|gclid|fbclid|ref)(=|$)"))
    val q = array_join(array_sort(kept), "&")

    when(u.isNull, lit(null).cast("string"))
      .when(sch.isNull, t) // schemeless: pass through trimmed
      .otherwise(concat(sch, lit("://"), hostPort, path,
        when(q === "", lit("")).otherwise(concat(lit("?"), q))))
  }
}
