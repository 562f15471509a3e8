package graft.core

import org.apache.spark.unsafe.types.UTF8String

/**
 * Pure URL kernels used by the crawl engine's Catalyst expressions.
 *
 * Canonicalization follows RFC 3986 §6 normalization, fixing the weak
 * normalization the reference applies ad hoc (lowercase compares at
 * /root/reference/main.py:126-127, trailing-slash probing at
 * /root/reference/healthcare_scraper.py:144-150) into one deterministic
 * total function. URL identity = xxhash64(canonicalize(url)) per
 * BASELINE.json north_rule.
 *
 * All functions are static, allocation-light, and callable from
 * whole-stage-codegen'd Java (see graft.expr.*).
 */
object UrlNormalizer {

  private def isUnreserved(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
    (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' || c == '~'

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  /** Percent-decode unreserved characters; uppercase remaining escapes. */
  private def normalizePercent(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        val h = hexVal(s.charAt(i + 1)); val l = hexVal(s.charAt(i + 2))
        if (h >= 0 && l >= 0) {
          val dec = (h * 16 + l).toChar
          if (isUnreserved(dec)) sb.append(dec)
          else { sb.append('%')
            sb.append(Character.toUpperCase(s.charAt(i + 1)))
            sb.append(Character.toUpperCase(s.charAt(i + 2))) }
          i += 3
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** RFC 3986 §5.2.4 remove_dot_segments. */
  private[core] def removeDotSegments(path: String): String = {
    if (path.isEmpty) return path
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    val abs = path.startsWith("/")
    val segs = path.split("/", -1)
    var i = 0
    while (i < segs.length) {
      segs(i) match {
        case "." | "" if i > 0 && i < segs.length - 1 => // skip interior empties? keep them: RFC keeps //; we keep
          if (segs(i) == ".") () else out += segs(i)
        case "." => () // trailing/leading "." → drop (keeps trailing slash via "" below)
        case ".." => if (out.nonEmpty && out.last != "" && out.last != "..") out.remove(out.length - 1)
                     else if (!abs) out += ".."
        case s => out += s
      }
      i += 1
    }
    val trailingSlash = path.endsWith("/") || path.endsWith("/.") || path.endsWith("/..")
    var r = out.mkString("/")
    if (abs && !r.startsWith("/")) r = "/" + r
    if (trailingSlash && !r.endsWith("/")) r = r + "/"
    if (abs && r.isEmpty) r = "/"
    r
  }

  private case class Parts(scheme: String, authority: String, path: String,
                           query: String, fragment: String)

  /** Split a URL into RFC 3986 components without validation. */
  private def split(url: String): Parts = {
    var rest = url
    var fragment = ""
    val fi = rest.indexOf('#')
    if (fi >= 0) { fragment = rest.substring(fi + 1); rest = rest.substring(0, fi) }
    var query = ""
    val qi = rest.indexOf('?')
    if (qi >= 0) { query = rest.substring(qi + 1); rest = rest.substring(0, qi) }
    var scheme = ""
    val ci = rest.indexOf(':')
    // scheme must be ALPHA *( ALPHA / DIGIT / + / - / . ) and precede "//" or path
    if (ci > 0 && rest.substring(0, ci).forall(c => c.isLetterOrDigit || c == '+' || c == '-' || c == '.') &&
        rest.charAt(0).isLetter) {
      scheme = rest.substring(0, ci); rest = rest.substring(ci + 1)
    }
    var authority = ""
    if (rest.startsWith("//")) {
      val end0 = rest.indexOf('/', 2)
      val end = if (end0 < 0) rest.length else end0
      authority = rest.substring(2, end)
      rest = rest.substring(end)
    }
    Parts(scheme, authority, rest, query, fragment)
  }

  /** Lowercase host, strip default port, strip trailing dot. */
  private def normAuthority(auth: String, scheme: String): String = {
    var userinfo = ""
    var hostport = auth
    val ai = auth.lastIndexOf('@')
    if (ai >= 0) { userinfo = auth.substring(0, ai + 1); hostport = auth.substring(ai + 1) }
    var host = hostport
    var port = ""
    val pi = hostport.lastIndexOf(':')
    if (pi >= 0 && hostport.indexOf(']') < pi || (pi >= 0 && hostport.indexOf(']') < 0)) {
      host = hostport.substring(0, pi); port = hostport.substring(pi + 1)
    }
    host = host.toLowerCase(java.util.Locale.ROOT)
    if (host.endsWith(".") && host.length > 1) host = host.substring(0, host.length - 1)
    val keepPort = port.nonEmpty &&
      !((scheme == "http" && port == "80") || (scheme == "https" && port == "443"))
    userinfo + host + (if (keepPort) ":" + port else "")
  }

  /** Sort query parameters by (key, value); drop bare '&'s; keep duplicates. */
  private def normQuery(q: String): String = {
    if (q.isEmpty) return ""
    val parts = q.split("&", -1).filter(_.nonEmpty).map(normalizePercent)
    if (parts.isEmpty) return ""
    java.util.Arrays.sort(parts.asInstanceOf[Array[Object]])
    parts.mkString("&")
  }

  /**
   * Canonicalize a URL: ensure scheme (default https), lowercase
   * scheme/host, strip default port + fragment + trailing host dot,
   * remove dot segments, percent-normalize, sort query params,
   * "/" for empty path when an authority exists.
   */
  def canonicalize(raw: String): String = {
    if (raw == null) return null
    var url = raw.trim
    if (url.isEmpty) return ""
    val p0 = split(url)
    // reference prepends https:// to schemeless seeds (main.py:126-127)
    val p = if (p0.scheme.isEmpty && p0.authority.isEmpty) {
      split("https://" + url.replaceFirst("^//", ""))
    } else p0
    val scheme = (if (p.scheme.isEmpty) "https" else p.scheme).toLowerCase(java.util.Locale.ROOT)
    val auth = normAuthority(p.authority, scheme)
    var path = normalizePercent(removeDotSegments(p.path))
    if (path.isEmpty && auth.nonEmpty) path = "/"
    val query = normQuery(p.query)
    val sb = new java.lang.StringBuilder(url.length + 8)
    // non-hierarchical schemes (mailto:, tel:) keep their opaque form
    if (auth.isEmpty && scheme != "http" && scheme != "https")
      sb.append(scheme).append(':').append(path)
    else sb.append(scheme).append("://").append(auth).append(path)
    if (query.nonEmpty) sb.append('?').append(query)
    sb.toString
  }

  /** RFC 3986 §5.2 reference resolution (string-level, total — never throws). */
  def resolve(base: String, ref0: String): String = {
    if (base == null || ref0 == null) return null
    val ref = ref0.trim
    if (ref.isEmpty) return base
    if (ref.startsWith("#")) return base.split("#", 2)(0) + ref
    val r = split(ref)
    if (r.scheme.nonEmpty) return ref                       // absolute
    val b = split(base)
    val scheme = b.scheme
    if (ref.startsWith("//")) return scheme + ":" + ref     // protocol-relative
    var authority = b.authority
    var path = ""
    var query = r.query
    if (r.path.isEmpty) {
      path = b.path
      if (r.query.isEmpty) query = b.query
    } else if (r.path.startsWith("/")) {
      path = removeDotSegments(r.path)
    } else {
      val merged =
        if (b.authority.nonEmpty && b.path.isEmpty) "/" + r.path
        else {
          val li = b.path.lastIndexOf('/')
          if (li >= 0) b.path.substring(0, li + 1) + r.path else r.path
        }
      path = removeDotSegments(merged)
    }
    val sb = new java.lang.StringBuilder(base.length + ref.length)
    if (scheme.nonEmpty) sb.append(scheme).append(':')
    if (authority.nonEmpty || base.contains("//")) sb.append("//").append(authority)
    sb.append(path)
    if (query.nonEmpty) sb.append('?').append(query)
    if (r.fragment.nonEmpty) sb.append('#').append(r.fragment)
    sb.toString
  }

  /** Host of a URL (post-split, lowercased), "" if none. */
  def host(url: String): String = {
    if (url == null) return null
    val p = split(url.trim)
    normAuthority(p.authority, p.scheme.toLowerCase(java.util.Locale.ROOT)) match {
      case h =>
        val ai = h.lastIndexOf('@')
        if (ai >= 0) h.substring(ai + 1) else h
    }
  }

  // ---- UTF8String adapters for codegen (static, null-safe callers) ----
  def canonicalizeU8(s: UTF8String): UTF8String =
    UTF8String.fromString(canonicalize(s.toString))
  def resolveU8(b: UTF8String, r: UTF8String): UTF8String =
    UTF8String.fromString(resolve(b.toString, r.toString))
  def hostU8(s: UTF8String): UTF8String =
    UTF8String.fromString(host(s.toString))
}
