package graft.canon

import java.net.URI

/** URL canonicalization — the seen-set key of the frontier engine.
  *
  * Semantics ADAPT (not bit-match) the reference's CDX 'N'-field
  * canonicalizer (reference: CDXRecordExtractorOutput.java:591-620, which
  * drops the scheme from its output key and special-cases http only): for
  * http(s) URLs the host is lowercased, a leading "www." is stripped, the
  * default port is dropped, path+query are kept, and the whole string is
  * lowercased; non-http URLs are lowercased verbatim. Deliberate
  * adaptations: the scheme is RETAINED as the seen-set key prefix (a
  * crawler must not conflate http:// and https:// fetches) and https is
  * treated symmetrically with :443-stripping. Fragments are dropped (they
  * never reach the server). The function is pure, total and idempotent —
  * properties the tests check — because it keys the exact seen set: two
  * engines that disagree on one corner case diverge on the whole crawl.
  *
  * Kept deliberately regex-free and allocation-light: this runs once per
  * discovered link, i.e. O(10^11) times at a 10^10-URL frontier.
  */
object UrlCanon extends Serializable {

  def canonicalize(url: String): String = {
    if (url == null) return null
    var s = url.trim
    val hash = s.indexOf('#')
    if (hash >= 0) s = s.substring(0, hash)
    val lower = s.toLowerCase
    val isHttp  = lower.startsWith("http://")
    val isHttps = lower.startsWith("https://")
    if (!isHttp && !isHttps) return lower
    val schemeLen = if (isHttp) 7 else 8
    // authority ends at the first of '/' or '?' ('#' already stripped) — a
    // no-path URL with a query ("http://a.com:80?q=1") must not fold the
    // query into the authority, or the default-port strip misses
    val slash = lower.indexOf('/', schemeLen)
    val quest = lower.indexOf('?', schemeLen)
    val authEnd =
      if (slash < 0 && quest < 0) lower.length
      else if (slash < 0) quest
      else if (quest < 0) slash
      else math.min(slash, quest)
    var auth = lower.substring(schemeLen, authEnd)
    val pathQuery =
      if (authEnd == lower.length) "/"
      else if (authEnd == quest && (slash < 0 || quest < slash)) "/" + lower.substring(authEnd)
      else lower.substring(authEnd)
    if (auth.startsWith("www.")) auth = auth.substring(4)
    val defPort = if (isHttp) ":80" else ":443"
    if (auth.endsWith(defPort)) auth = auth.substring(0, auth.length - defPort.length)
    lower.substring(0, schemeLen) + auth + pathQuery
  }

  /** Resolve a possibly-relative link against its page URL
    * (reference: CDXRecordExtractorOutput.resolve:312-327 — Location/
    * meta-refresh targets resolved against the record URL). Returns null
    * for unresolvable garbage, which callers drop.
    */
  def resolve(base: String, ref: String): String = {
    if (ref == null || ref.isEmpty) return null
    val r = ref.trim
    val lower = r.toLowerCase
    if (lower.startsWith("http://") || lower.startsWith("https://")) return r
    if (lower.contains(":") && !lower.startsWith("/") && !lower.startsWith(".")) {
      // non-http scheme (mailto:, dns:, javascript:) — not crawlable
      return null
    }
    try {
      val resolved = new URI(base).resolve(r).toString
      val l = resolved.toLowerCase
      if (l.startsWith("http://") || l.startsWith("https://")) resolved else null
    } catch { case _: Exception => null }
  }

  /** Canonical host of an already-canonicalized URL ("" if opaque). */
  def hostOf(canon: String): String = {
    if (canon == null) return ""
    val isHttp  = canon.startsWith("http://")
    val isHttps = canon.startsWith("https://")
    if (!isHttp && !isHttps) return ""
    val schemeLen = if (isHttp) 7 else 8
    val slash = canon.indexOf('/', schemeLen)
    val auth = if (slash < 0) canon.substring(schemeLen) else canon.substring(schemeLen, slash)
    val colon = auth.indexOf(':')
    if (colon >= 0) auth.substring(0, colon) else auth
  }

  /** Path (+query) of an already-canonicalized URL ("/" if none). */
  def pathOf(canon: String): String = {
    if (canon == null) return "/"
    val isHttp  = canon.startsWith("http://")
    val isHttps = canon.startsWith("https://")
    if (!isHttp && !isHttps) return canon
    val schemeLen = if (isHttp) 7 else 8
    val slash = canon.indexOf('/', schemeLen)
    if (slash < 0) "/" else canon.substring(slash)
  }

  /** 64-bit key of a canonical URL for sharding/bloom — same function on
    * the Spark side (`xxhash64` with default seed 42) and the oracle side,
    * so shard routing is engine-independent. The EXACT seen set is keyed
    * by the canon string itself; this hash only partitions and prunes
    * (reference analog: reversed-prefix shard dirs, Util.getSubdir:71-87).
    */
  def urlKey64(canon: String): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(canon),
      org.apache.spark.sql.types.StringType, 42L)
}
