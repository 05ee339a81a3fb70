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

  /** Percent-encode every byte outside printable ASCII (0x21..0x7E) as the
    * %XX of its UTF-8 encoding. This is the ASCII boundary of the frontier:
    * the reference runs every resolved URL through UURIFactory-style ASCII
    * escaping (CDXRecordExtractorOutput.resolve:312-327), and the engine's
    * crawl-order determinism relies on ASCII-only canon strings (UTF-16
    * sort == UTF-8 byte sort only on ASCII). Escaping is LAX
    * (Heritrix-style): a '%' followed by two hex digits is treated as an
    * existing escape and passed through, a bare '%' is escaped to %25 —
    * so "a%20b" is unchanged while "100%" becomes "100%25" instead of
    * throwing inside java.net.URI (escape-rather-than-drop, like the
    * reference). Idempotent on its own output (pure printable ASCII whose
    * every '%' heads a valid escape). Surrogate pairs are handled by
    * encoding the WHOLE string to UTF-8 first, never char-by-char.
    */
  private def isHex(c: Int): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  def asciiEscape(s: String): String = {
    var i = 0
    var clean = true
    while (clean && i < s.length) {
      val c = s.charAt(i)
      if (c <= ' ' || c > '~') clean = false
      else if (c == '%' && (i + 2 >= s.length ||
               !isHex(s.charAt(i + 1)) || !isHex(s.charAt(i + 2))))
        clean = false
      i += 1
    }
    if (clean) return s
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new java.lang.StringBuilder(bytes.length + 8)
    var j = 0
    while (j < bytes.length) {
      val ub = bytes(j) & 0xff
      if (ub == '%') {
        val valid = j + 2 < bytes.length &&
          isHex(bytes(j + 1) & 0xff) && isHex(bytes(j + 2) & 0xff)
        out.append(if (valid) "%" else "%25")
      } else if (ub > 0x20 && ub <= 0x7e) out.append(ub.toChar)
      else out.append(f"%%$ub%02X")
      j += 1
    }
    out.toString
  }

  /** Resolve a possibly-relative link against its page URL
    * (reference: CDXRecordExtractorOutput.resolve:312-327 — Location/
    * meta-refresh targets resolved against the record URL, then
    * ASCII-escaped). Returns null for unresolvable garbage, which callers
    * drop; never returns a non-ASCII string (see asciiEscape).
    */
  def resolve(base: String, ref: String): String = {
    if (ref == null || ref.isEmpty) return null
    val r = ref.trim
    val lower = r.toLowerCase
    if (lower.startsWith("http://") || lower.startsWith("https://"))
      return asciiEscape(r)
    if (lower.contains(":") && !lower.startsWith("/") && !lower.startsWith(".")) {
      // non-http scheme (mailto:, dns:, javascript:) — not crawlable
      return null
    }
    try {
      // escape BEFORE java.net.URI sees it: URI rejects raw spaces/non-ASCII
      // that real hrefs carry, and the reference escapes rather than drops
      val resolved = new URI(asciiEscape(base)).resolve(asciiEscape(r)).toString
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

  /** Fixed fan-out of the discovery-seq assignment — part of the crawl
    * SPEC, shared by the Spark engine and the oracle: within a round, new
    * URLs are numbered in (seqShard(canon), canon) order. A FIXED constant
    * (not a tuning knob) so crawl order never depends on cluster or shard
    * configuration; hash-distributed so the engine can number each shard
    * independently from per-shard counts with no global sort.
    */
  val SeqShards = 64
  def seqShard(canon: String): Int =
    java.lang.Math.floorMod(urlKey64(canon), SeqShards.toLong).toInt

  /** Murmur3 bucket of a canon string — Spark's HashPartitioning/bucketBy
    * function (`pmod(hash(canon), n)`, seed 42). Shared so executor-side
    * bloom builds and tests route to EXACTLY the bucket the bucketed seen
    * table writer uses. */
  def bucketOf(canon: String, n: Int): Int = {
    val h = org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(canon),
      org.apache.spark.sql.types.StringType, 42L).toInt
    java.lang.Math.floorMod(h, n)
  }
}
