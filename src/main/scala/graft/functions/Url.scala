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
  *   - all trailing path slashes stripped (non-root); bare authority
  *     gets path `/`
  * Protocol-relative inputs (`//host/path`, common in crawled HTML)
  * canonicalize the same way and keep their `//` prefix (ports can't
  * be default-stripped without a scheme, so they survive). Inputs
  * with neither a `scheme://` nor a `//` prefix pass through
  * trimmed — the caller decides whether schemeless rows are URLs at
  * all. Every public function trims its input; [[normalize]] is
  * idempotent.
  */
object Url {

  private val schemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"

  /** Everything after the `scheme://` or protocol-relative `//`
    * prefix; null when neither is present. */
  private def afterPrefix(u: Column): Column = {
    val t = trim(u)
    when(t.rlike(schemeRe), regexp_extract(t, schemeRe + "(.*)$", 2))
      .when(t.startsWith("//"), regexp_replace(t, "^//", ""))
  }

  /** Lowercased scheme, null when absent (incl. protocol-relative). */
  def scheme(u: Column): Column = {
    val t = trim(u)
    when(t.rlike(schemeRe), lower(regexp_extract(t, schemeRe, 1)))
  }

  /** authority = host[:port] — the part before the first `/`, `?`
    * or `#` after the prefix. */
  private def authority(u: Column): Column =
    regexp_extract(afterPrefix(u), "^([^/?#]*)", 1)

  /** Lowercased host: authority without userinfo and without
    * everything from the first colon on (ports; degenerate repeated
    * `:p:p` suffixes collapse in one pass, keeping [[normalize]]
    * idempotent). */
  def host(u: Column): Column = {
    val a = authority(u)
    lower(regexp_replace(regexp_replace(a, "^[^@]*@", ""), ":.*$", ""))
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

  /** Canonical form per the object contract; schemeless
    * non-protocol-relative input passes through trimmed; null →
    * null. */
  def normalize(u: Column): Column = {
    val t = trim(u)
    val sch = scheme(t)
    val rest = afterPrefix(t)
    val auth = authority(t)
    val h = host(t)
    // port survives unless it is the scheme default (no scheme → no
    // known default → a coalesced "" scheme keeps it)
    val port = regexp_extract(auth, ":(\\d+)$", 1)
    val schOr = coalesce(sch, lit(""))
    val keepPort = (port =!= "") &&
      !((schOr === "http" && port === "80") ||
        (schOr === "https" && port === "443"))
    val hostPort = when(keepPort, concat(h, lit(":"), port)).otherwise(h)

    // path = after authority, before ? or #; fragment dies here
    val pathQ = regexp_replace(
      regexp_extract(rest, "^[^/?#]*(.*)$", 1), "#.*$", "")
    val path0 = regexp_extract(pathQ, "^([^?]*)", 1)
    // ALL trailing slashes die (one-slash-per-pass would break
    // idempotence on 'a//'); an emptied path is the root
    val stripped = regexp_replace(path0, "/+$", "")
    val path = when(stripped === "", lit("/")).otherwise(stripped)

    // query: drop tracking params, sort the rest
    val rawQ = when(pathQ.rlike("\\?"),
      regexp_replace(pathQ, "^[^?]*\\?", "")).otherwise(lit(""))
    val kept = filter(split(rawQ, "&"), p =>
      p =!= "" && !p.rlike("^(utm_[^=]*|gclid|fbclid|ref)(=|$)"))
    val q = array_join(array_sort(kept), "&")
    val qPart = when(q === "", lit("")).otherwise(concat(lit("?"), q))

    when(u.isNull, lit(null).cast("string"))
      .when(sch.isNotNull,
        concat(sch, lit("://"), hostPort, path, qPart))
      .when(t.startsWith("//"), // protocol-relative: same rules
        concat(lit("//"), hostPort, path, qPart))
      .otherwise(t) // schemeless: pass through trimmed
  }
}
