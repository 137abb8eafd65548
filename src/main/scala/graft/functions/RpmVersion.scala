package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** RPM EVR (epoch:version-release) parsing, comparison, and a
  * byte-comparable sort-key encoding.
  *
  * Semantics follow the reference engine's pure-python rpmvercmp port
  * (vunnel `src/vunnel/utils/rpm.py:53-217`):
  *
  *   - `splitFullVersion("1:2.27-34.el7") == ("1", "2.27", "34.el7")`;
  *     epoch/release are absent (null) when not present in the string
  *     (`rpm.py:53-87`).
  *   - `compareVersions`: epochs are compared as *strings*, and only when
  *     BOTH sides carry one (`rpm.py:118-128`) — `"12:x"` vs `"x"` ignores
  *     the epoch entirely. Then rpmvercmp(version), then rpmvercmp(release).
  *   - rpmvercmp (`rpm.py:133-217`): split into maximal alpha / numeric
  *     blocks, skipping non-alphanumeric separators; numeric blocks compare
  *     by stripped-zero length then digit string; a numeric block beats an
  *     alpha block at the same position; when one side runs out of blocks
  *     the other side wins; separators themselves never matter. There is no
  *     tilde/caret special-casing in the reference, so none here.
  *
  * The pairwise ignore-epoch-when-one-side-missing rule is NOT a total
  * order (1:0 > 0:1, 0:1 ≡ 1 without epoch, 1 ≡ 1:0 without epoch), so the
  * sort key — which must induce a total order for `orderBy`/`max_by` —
  * treats a missing epoch as "0" (the rpm convention). Pairwise
  * `compareVersions` stays faithful to the reference; documented divergence
  * applies only to sorting mixed epoch/no-epoch sets.
  *
  * Sort-key encoding (printable ASCII, compares correctly under plain
  * string ordering, so built-in `orderBy` / `max_by` / codegen comparisons
  * work with no comparator UDF on the hot path):
  *
  *   key = 'E' + epochStr + '!' + enc(version) + ' ' + enc(release)
  *   enc(s) = concat over blocks of:
  *     numeric: '2' + 3-digit zero-padded length(of zero-stripped digits) + digits
  *     alpha:   '1' + chars + '!'
  *
  * '!' (0x21) < '1' < '2' < digits < letters; ' ' (0x20) separates version
  * from release so a fully-consumed version compares before any longer one.
  */
object RpmVersion extends Serializable {

  /** (epoch, version, release); nulls for absent parts. Mirrors
    * `split_fullversion` (rpm.py:53-87). */
  def splitFullVersion(s: String): (String, String, String) = {
    if (s == null) return (null, null, null)
    val dash = s.lastIndexOf('-')
    val (verPart, release) =
      if (dash >= 0) (s.substring(0, dash), s.substring(dash + 1)) else (s, null)
    val colon = verPart.indexOf(':')
    if (colon >= 0) (verPart.substring(0, colon), verPart.substring(colon + 1), release)
    else (null, verPart, release)
  }

  /** rpmvercmp over one label (version OR release). Mirrors rpm.py:133-217. */
  def rpmVerCmp(aIn: String, bIn: String): Int = {
    val a = if (aIn == null) "" else aIn.trim
    val b = if (bIn == null) "" else bIn.trim
    var i = 0
    var j = 0
    val la = a.length
    val lb = b.length
    while (i < la && j < lb) {
      while (i < la && !Character.isLetterOrDigit(a.charAt(i))) i += 1
      while (j < lb && !Character.isLetterOrDigit(b.charAt(j))) j += 1
      if (i >= la || j >= lb) {
        // fall through to the tail rules below
      } else {
        val isNum = Character.isDigit(a.charAt(i))
        // greedy block of the same char class on each side
        val ai = i
        while (i < la && Character.isDigit(a.charAt(i)) == isNum &&
          Character.isLetterOrDigit(a.charAt(i))) i += 1
        val bj = j
        if (Character.isDigit(b.charAt(j)) != isNum) {
          // type mismatch: numeric segments always beat alpha segments
          return if (isNum) 1 else -1
        }
        while (j < lb && Character.isDigit(b.charAt(j)) == isNum &&
          Character.isLetterOrDigit(b.charAt(j))) j += 1
        var aSeg = a.substring(ai, i)
        var bSeg = b.substring(bj, j)
        if (isNum) {
          aSeg = stripLeadingZeros(aSeg)
          bSeg = stripLeadingZeros(bSeg)
          if (aSeg.length != bSeg.length) return if (aSeg.length > bSeg.length) 1 else -1
        }
        val c = aSeg.compareTo(bSeg)
        if (c != 0) return if (c > 0) 1 else -1
      }
    }
    // skip trailing separators (the reference's while-loop head does this
    // before deciding someone ran out)
    while (i < la && !Character.isLetterOrDigit(a.charAt(i))) i += 1
    while (j < lb && !Character.isLetterOrDigit(b.charAt(j))) j += 1
    if (i >= la && j >= lb) 0
    else if (i >= la) -1
    else 1
  }

  private def stripLeadingZeros(s: String): String = {
    var k = 0
    while (k < s.length && s.charAt(k) == '0') k += 1
    s.substring(k)
  }

  /** Full EVR compare. Mirrors `compare_versions`/`compare_labels`
    * (rpm.py:92-131): string-compared epochs only when both present. */
  def compareVersions(va: String, vb: String): Int = {
    if (va == vb) return 0
    val (e1, v1, r1) = splitFullVersion(va)
    val (e2, v2, r2) = splitFullVersion(vb)
    if (e1 != null && e2 != null) {
      val c = e1.compareTo(e2)
      if (c != 0) return if (c > 0) 1 else -1
    }
    val cv = rpmVerCmp(v1, v2)
    if (cv != 0) return cv
    rpmVerCmp(r1, r2)
  }

  private def encodeLabel(sIn: String, sb: java.lang.StringBuilder): Unit = {
    val s = if (sIn == null) "" else sIn.trim
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && !Character.isLetterOrDigit(s.charAt(i))) i += 1
      if (i < n) {
        val isNum = Character.isDigit(s.charAt(i))
        val start = i
        while (i < n && Character.isLetterOrDigit(s.charAt(i)) &&
          Character.isDigit(s.charAt(i)) == isNum) i += 1
        val seg = s.substring(start, i)
        if (isNum) {
          val stripped = stripLeadingZeros(seg)
          sb.append('2')
          val len = math.min(stripped.length, 999)
          if (len < 100) sb.append('0')
          if (len < 10) sb.append('0')
          sb.append(len)
          sb.append(stripped)
        } else {
          sb.append('1').append(seg).append('!')
        }
      }
    }
  }

  /** Byte-comparable (plain string order) encoding of the EVR total order.
    * `sortKey(a) < sortKey(b)` (string compare) iff a <EVR b, with missing
    * epoch treated as "0" (see class doc). */
  def sortKey(full: String): String = {
    if (full == null) return null
    val (e, v, r) = splitFullVersion(full)
    val sb = new java.lang.StringBuilder(full.length + 16)
    sb.append('E').append(if (e == null) "0" else e).append('!')
    encodeLabel(v, sb)
    sb.append(' ')
    encodeLabel(r, sb)
    sb.toString
  }

  // ---- Column API ------------------------------------------------------

  private val cmpUdf = udf((a: String, b: String) => compareVersions(a, b))
  private val keyUdf = udf((v: String) => sortKey(v))
  private val epochUdf = udf((v: String) => splitFullVersion(v)._1)
  private val versionUdf = udf((v: String) => splitFullVersion(v)._2)
  private val releaseUdf = udf((v: String) => splitFullVersion(v)._3)

  /** -1 / 0 / 1 comparison of two full EVR strings (reference semantics). */
  def rpm_ver_cmp(a: Column, b: Column): Column = cmpUdf(a, b)

  /** Sortable encoding; use with `orderBy` / `max_by` / `min_by`. */
  def rpm_sort_key(v: Column): Column = keyUdf(v)

  def rpm_epoch(v: Column): Column = epochUdf(v)
  def rpm_version(v: Column): Column = versionUdf(v)
  def rpm_release(v: Column): Column = releaseUdf(v)
}
