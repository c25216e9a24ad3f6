package graft.sources

/** Dep-free URL canonicalization — crawl-frontier machinery: URL-keyed
  * dedup (the cheapest dedup there is: two fetches of one page) and
  * per-host rollups only work when `HTTP://ExAmple.com:80/a/../b` and
  * `http://example.com/b` key identically. Pure functions, exactly
  * specified so an oracle can state the expected canonical form:
  *
  *   - scheme and host lowercase;
  *   - default ports drop (http:80, https:443);
  *   - the fragment drops (never sent to the server);
  *   - path dot-segments resolve per RFC 3986 remove_dot_segments;
  *   - percent-escapes of UNRESERVED chars (ALPHA / DIGIT / - . _ ~)
  *     decode; all other escapes keep, hex digits uppercased;
  *   - empty path becomes "/" when a host is present;
  *   - an empty query's dangling "?" drops; query content and parameter
  *     ORDER are preserved (reordering changes semantics for some
  *     servers — canonicalization must never merge distinct resources);
  *   - inputs without "://" (or otherwise unparseable) return trimmed
  *     and unchanged — a frontier must pass junk through, not throw.
  */
object Url {

  private def isUnreserved(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
      (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' || c == '~'

  /** Decode %XX of unreserved chars, uppercase kept escapes' hex. */
  private[sources] def normalizeEscapes(s: String): String = {
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
          Character.digit(s.charAt(i + 1), 16) >= 0 &&
          Character.digit(s.charAt(i + 2), 16) >= 0) {
        val v = Character.digit(s.charAt(i + 1), 16) * 16 +
          Character.digit(s.charAt(i + 2), 16)
        if (isUnreserved(v.toChar)) out.append(v.toChar)
        else out.append('%')
          .append(Character.toUpperCase(s.charAt(i + 1)))
          .append(Character.toUpperCase(s.charAt(i + 2)))
        i += 3
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** RFC 3986 §5.2.4 remove_dot_segments. */
  private[sources] def removeDotSegments(path: String): String = {
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    var in = path
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) { in = "/" + in.substring(4); if (out.nonEmpty) out.remove(out.length - 1) }
      else if (in == "/..") { in = "/"; if (out.nonEmpty) out.remove(out.length - 1) }
      else if (in == "." || in == "..") in = ""
      else {
        val next = in.indexOf('/', 1)
        val seg = if (next < 0) in else in.substring(0, next)
        out.append(seg)
        in = if (next < 0) "" else in.substring(next)
      }
    }
    out.mkString
  }

  /** Canonicalize one URL (see object doc). */
  def normalize(url: String): String = {
    if (url == null) return ""
    val trimmed = url.trim
    val schemeEnd = trimmed.indexOf("://")
    if (schemeEnd <= 0) return trimmed
    val scheme = trimmed.substring(0, schemeEnd).toLowerCase
    if (!scheme.forall(c => c.isLetterOrDigit || c == '+' || c == '-' || c == '.')
        || !scheme.head.isLetter) return trimmed
    val rest0 = trimmed.substring(schemeEnd + 3)
    // drop fragment first (never part of the resource key)
    val rest = { val h = rest0.indexOf('#'); if (h < 0) rest0 else rest0.substring(0, h) }
    val authEnd = {
      val slash = rest.indexOf('/'); val q = rest.indexOf('?')
      Seq(slash, q).filter(_ >= 0).sorted.headOption.getOrElse(rest.length)
    }
    val auth0 = rest.substring(0, authEnd)
    if (auth0.isEmpty) return trimmed
    // userinfo (rare, kept verbatim) | host[:port]
    val (userinfo, hostPort) = {
      val at = auth0.lastIndexOf('@')
      if (at < 0) ("", auth0) else (auth0.substring(0, at + 1), auth0.substring(at + 1))
    }
    val (host, port) = {
      val c = hostPort.lastIndexOf(':')
      // an IPv6 literal [..] has colons inside brackets; only a colon
      // AFTER the closing bracket (or in a bracketless host) is a port
      if (c < 0 || hostPort.lastIndexOf(']') > c) (hostPort, "")
      else (hostPort.substring(0, c), hostPort.substring(c + 1))
    }
    if (port.nonEmpty && !port.forall(_.isDigit)) return trimmed
    val keepPort = port.nonEmpty &&
      !((scheme == "http" && port == "80") || (scheme == "https" && port == "443"))
    val tail = rest.substring(authEnd)
    val (path0, query) = {
      val q = tail.indexOf('?')
      if (q < 0) (tail, "") else (tail.substring(0, q), tail.substring(q + 1))
    }
    val path = {
      val p = removeDotSegments(normalizeEscapes(path0))
      if (p.isEmpty) "/" else p
    }
    val sb = new java.lang.StringBuilder(trimmed.length)
    sb.append(scheme).append("://").append(userinfo).append(host.toLowerCase)
    if (keepPort) sb.append(':').append(port)
    sb.append(path)
    if (query.nonEmpty) sb.append('?').append(normalizeEscapes(query))
    sb.toString
  }

  /** The lowercased host of a URL, or "" when unparseable — the
    * per-host rollup / politeness key. */
  def host(url: String): String = {
    val n = normalize(url)
    val schemeEnd = n.indexOf("://")
    if (schemeEnd <= 0) return ""
    val rest = n.substring(schemeEnd + 3)
    val end = rest.indexWhere(c => c == '/' || c == '?' || c == '#') match {
      case -1 => rest.length
      case i => i
    }
    val auth = rest.substring(0, end)
    val afterUser = { val at = auth.lastIndexOf('@'); if (at < 0) auth else auth.substring(at + 1) }
    val c = afterUser.lastIndexOf(':')
    if (c < 0 || afterUser.lastIndexOf(']') > c) afterUser else afterUser.substring(0, c)
  }
}
