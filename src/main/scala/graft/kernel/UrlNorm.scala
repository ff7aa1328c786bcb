package graft.kernel

/** RFC 3986 URL canonicalization (§6.2.2 syntax-based normalization) —
  * the crawl-frontier identity function: two spellings of the same
  * resource must map to one frontier key or the corpus fetches (and
  * dedups) them twice. Implements case normalization (scheme/host
  * lowercased), percent-encoding normalization (unreserved octets
  * decoded, remaining escapes uppercased), dot-segment removal
  * (§5.2.4), default-port and empty-path normalization, and (for crawl
  * identity) fragment stripping. Query-parameter SORTING is off by
  * default — it is not semantics-preserving for every server and RFC
  * 3986 does not license it; the flag exists for corpora known to be
  * safe. Hand-parsed (no `java.net.URI` — it throws on the hostile
  * spellings a real crawl contains; this never throws on any input,
  * returning the input unchanged when it is not a parseable
  * scheme://authority URL).
  */
object UrlNorm {

  private def isUnreserved(c: Int): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
      (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' || c == '~'

  private def hex(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  /** Decode %XX for unreserved octets, uppercase the hex of the rest;
    * malformed escapes pass through verbatim (crawl reality). Literal
    * spaces — illegal in URLs but common in crawl anchors — are
    * percent-encoded, which also makes the whole normalizer a fixed
    * point under leading/trailing-whitespace trim.
    */
  private[kernel] def normalizeEscapes(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == ' ') { sb.append("%20"); i += 1 }
      else if (c == '%' && i + 2 < s.length &&
          hex(s.charAt(i + 1)) >= 0 && hex(s.charAt(i + 2)) >= 0) {
        val v = (hex(s.charAt(i + 1)) << 4) | hex(s.charAt(i + 2))
        if (isUnreserved(v)) sb.append(v.toChar)
        else sb.append('%')
          .append(Character.toUpperCase(s.charAt(i + 1)))
          .append(Character.toUpperCase(s.charAt(i + 2)))
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** §5.2.4 remove_dot_segments, operating on an absolute path. */
  private[kernel] def removeDotSegments(path: String): String = {
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    val trailingSlash = path.endsWith("/") || path.endsWith("/.") || path.endsWith("/..")
    path.split("/", -1).foreach {
      case "" | "." => ()
      case ".." => if (out.nonEmpty) out.remove(out.length - 1)
      case seg => out += seg
    }
    val joined = out.mkString("/", "/", "")
    if (out.isEmpty) "/"
    else if (trailingSlash) joined + "/"
    else joined
  }

  /** Canonicalize one URL. Non-URL inputs (no `scheme://`) are returned
    * unchanged — the caller's column stays total.
    */
  def normalize(url0: String, stripFragment: Boolean = true,
                sortQuery: Boolean = false): String = {
    if (url0 == null) return null
    val url = url0.trim
    val ss = url.indexOf("://")
    if (ss <= 0 || !url.substring(0, ss).forall(c =>
        Character.isLetterOrDigit(c) || c == '+' || c == '-' || c == '.'))
      return url
    val scheme = url.substring(0, ss).toLowerCase
    val rest = url.substring(ss + 3)
    var authEnd = rest.length
    var i = 0
    while (i < rest.length && authEnd == rest.length) {
      val c = rest.charAt(i)
      if (c == '/' || c == '?' || c == '#') authEnd = i
      i += 1
    }
    val auth0 = rest.substring(0, authEnd)
    val afterAuth = rest.substring(authEnd)
    // authority = [userinfo@]host[:port]
    val at = auth0.lastIndexOf('@')
    val userinfo = if (at >= 0) auth0.substring(0, at + 1) else ""
    val hostPort0 = auth0.substring(at + 1)
    // trailing bare colons (empty ports) drop — in one pass, so the
    // result is a fixed point of this function (fuzz-pinned)
    val hostPort = {
      var e = hostPort0.length
      while (e > 0 && hostPort0.charAt(e - 1) == ':') e -= 1
      hostPort0.substring(0, e)
    }
    val colon = hostPort.lastIndexOf(':')
    val (host0, port0) =
      if (colon >= 0 && colon + 1 < hostPort.length &&
          hostPort.substring(colon + 1).forall(_.isDigit))
        (hostPort.substring(0, colon), hostPort.substring(colon + 1))
      else (hostPort, "")
    val host = normalizeEscapes(host0).toLowerCase
    val defaultPort = scheme match {
      case "http" | "ws" => "80"
      case "https" | "wss" => "443"
      case "ftp" => "21"
      case _ => ""
    }
    // leading zeros stripped without numeric parsing (a 40-digit "port"
    // in crawl junk must not throw)
    val pTrim = port0.dropWhile(_ == '0')
    val port =
      if (port0.isEmpty || pTrim.isEmpty || pTrim == defaultPort) ""
      else s":$pTrim"
    // split path / query / fragment
    val qIdx = afterAuth.indexOf('?')
    val hIdx = afterAuth.indexOf('#')
    val pathEnd = Seq(qIdx, hIdx).filter(_ >= 0).sorted.headOption.getOrElse(afterAuth.length)
    val path0 = afterAuth.substring(0, pathEnd)
    val query0 =
      if (qIdx >= 0 && (hIdx < 0 || qIdx < hIdx))
        afterAuth.substring(qIdx + 1, if (hIdx > qIdx) hIdx else afterAuth.length)
      else null
    val frag0 = if (hIdx >= 0) afterAuth.substring(hIdx + 1) else null
    val path = removeDotSegments(normalizeEscapes(if (path0.isEmpty) "/" else path0))
    val query = if (query0 == null) null else {
      val q = normalizeEscapes(query0)
      if (sortQuery) q.split("&", -1).sorted.mkString("&") else q
    }
    val sb = new java.lang.StringBuilder()
    sb.append(scheme).append("://").append(userinfo).append(host).append(port).append(path)
    if (query != null) sb.append('?').append(query)
    if (!stripFragment && frag0 != null) sb.append('#').append(normalizeEscapes(frag0))
    sb.toString
  }

  /** Classic SURT key (Sort-friendly URI Reordering Transform — the
    * Common Crawl / Wayback index sort key): scheme and userinfo drop,
    * host labels reverse comma-joined, then `)` + path + sorted query.
    * `https://www.example.com/a?b=1` → `com,example,www)/a?b=1`.
    * Built on [[normalize]]; total on crawl junk (a non-URL input comes
    * back lowercased rather than throwing).
    */
  def surt(url0: String): String = {
    val n = normalize(url0, stripFragment = true, sortQuery = true)
    if (n == null) return null
    val ss = n.indexOf("://")
    if (ss <= 0) return n.toLowerCase
    val rest = n.substring(ss + 3)
    var authEnd = rest.length
    var i = 0
    while (i < rest.length && authEnd == rest.length) {
      val c = rest.charAt(i)
      if (c == '/' || c == '?') authEnd = i
      i += 1
    }
    val auth = rest.substring(0, authEnd)
    val tail = rest.substring(authEnd)
    val at = auth.lastIndexOf('@')
    val hostPort = if (at >= 0) auth.substring(at + 1) else auth
    val colon = hostPort.lastIndexOf(':')
    val (host, port) =
      if (colon >= 0 && colon + 1 < hostPort.length &&
          hostPort.substring(colon + 1).forall(_.isDigit))
        (hostPort.substring(0, colon), hostPort.substring(colon))
      else (hostPort, "")
    val rev = host.split('.').reverse.mkString(",")
    rev + port + ")" + (if (tail.isEmpty) "/" else tail)
  }
}
