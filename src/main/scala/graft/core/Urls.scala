package graft.core

/** URL resolution + canonicalization for the link graph — the crawl-
  * frontier normalization step: every href in [[Links]] output is
  * resolved against its page URL to one absolute canonical form, so
  * graph ops key on real nodes instead of raw attribute strings.
  * (Reference analog: the service keys work by client-supplied file
  * identity and never sees links; URL identity is new surface the
  * web-graph layer needs.)
  *
  * Scope (documented, deterministic):
  *   - RFC 3986 §5.2 reference resolution for http(s) bases: absolute,
  *     protocol-relative (`//h/p`), root-relative, relative with
  *     dot-segment removal, query-only (`?q`), and fragment-only refs.
  *   - Canonical form: lowercase scheme and host, default port dropped
  *     (`:80` http, `:443` https), fragment dropped, dot-segments
  *     removed, empty path rendered as `/`.
  *   - Non-http(s) schemes (`mailto:`, `javascript:`, `data:`, ...)
  *     resolve to None — they are not crawlable graph edges.
  *
  * Pure function of (base, href): no I/O, no locale, no java.net.URL
  * (whose equals() does DNS lookups — a classic crawler bug).
  */
object Urls {

  private final case class Base(scheme: String, host: String, port: Int,
                                path: String, query: String)

  /** Parse an absolute http(s) URL. Returns None if the scheme is not
    * http(s) or the authority is empty.
    */
  private def parseAbs(u: String): Option[Base] = {
    val ci = u.indexOf(':')
    if (ci <= 0) return None
    val scheme = u.substring(0, ci).toLowerCase
    if (scheme != "http" && scheme != "https") return None
    if (!u.regionMatches(ci + 1, "//", 0, 2)) return None
    val rest = u.substring(ci + 3)
    var authEnd = rest.length
    var k = 0
    while (k < authEnd) {
      val c = rest.charAt(k)
      if (c == '/' || c == '?' || c == '#') { authEnd = k } else k += 1
    }
    val auth = rest.substring(0, authEnd)
    if (auth.isEmpty) return None
    val (host, port) = auth.lastIndexOf(':') match {
      case -1 => (auth, -1)
      case pi =>
        val ps = auth.substring(pi + 1)
        if (ps.nonEmpty && ps.forall(_.isDigit)) {
          // digit run after ':' IS a port attempt: out-of-range means the
          // authority is invalid (browser behavior), never fall back to
          // treating ':' as a host character. ≤7 digits also guards toInt.
          if (ps.length > 7 || ps.toInt > 65535) return None
          (auth.substring(0, pi), ps.toInt)
        } else (auth, -1)
    }
    if (host.isEmpty) return None // "http://:80/x" — a port with no host
    val tail = rest.substring(authEnd)
    val hi = tail.indexOf('#')
    val noFrag = if (hi >= 0) tail.substring(0, hi) else tail
    val qi = noFrag.indexOf('?')
    val (path, query) =
      if (qi >= 0) (noFrag.substring(0, qi), noFrag.substring(qi + 1))
      else (noFrag, null)
    Some(Base(scheme, host.toLowerCase, port, path, query))
  }

  /** RFC 3986 §5.2.4 remove_dot_segments. */
  private[core] def removeDotSegments(path: String): String = {
    val out = new scala.collection.mutable.ArrayBuffer[String]
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
        val from = if (in.startsWith("/")) 1 else 0
        val si = in.indexOf('/', from)
        val seg = if (si >= 0) in.substring(0, si) else in
        out += seg
        in = if (si >= 0) in.substring(si) else ""
      }
    }
    out.mkString
  }

  private def render(b: Base, path: String, query: String): String = {
    val defPort = if (b.scheme == "http") 80 else 443
    val portStr = if (b.port == -1 || b.port == defPort) "" else ":" + b.port
    val p = if (path.isEmpty) "/" else path
    val q = if (query == null) "" else "?" + query
    b.scheme + "://" + b.host + portStr + p + q
  }

  /** Resolve `href` against absolute http(s) `base` into the canonical
    * absolute form, or None when either the base is unparsable or the
    * href's scheme is not crawlable.
    */
  def resolve(base: String, href: String): Option[String] = {
    val b0 = parseAbs(base).getOrElse(return None)
    // strip the href's fragment first — it never survives resolution
    val hi = href.indexOf('#')
    val h = (if (hi >= 0) href.substring(0, hi) else href).trim
    // scheme present?
    val ci = h.indexOf(':')
    val hasScheme = ci > 0 && {
      var ok = isAlpha(h.charAt(0)); var k = 1
      while (ok && k < ci) { ok = isSchemeChar(h.charAt(k)); k += 1 }
      ok
    }
    if (hasScheme) return parseAbs(h).map(nb => render(nb, removeDotSegments(nb.path), nb.query))
    if (h.startsWith("//")) return parseAbs(b0.scheme + ":" + h)
      .map(nb => render(nb, removeDotSegments(nb.path), nb.query))
    if (h.isEmpty) return Some(render(b0, removeDotSegments(b0.path), b0.query))
    if (h.startsWith("?")) return Some(render(b0, removeDotSegments(b0.path), h.substring(1)))
    val qi = h.indexOf('?')
    val (hp, hq) = if (qi >= 0) (h.substring(0, qi), h.substring(qi + 1)) else (h, null)
    val merged =
      if (hp.startsWith("/")) hp
      else {
        // merge (§5.2.3): base path up to last '/', or "/" for empty path
        val bp = b0.path
        val cut = bp.lastIndexOf('/')
        (if (cut >= 0) bp.substring(0, cut + 1) else "/") + hp
      }
    Some(render(b0, removeDotSegments(if (merged.startsWith("/")) merged else "/" + merged), hq))
  }

  private def isAlpha(c: Char) = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  private def isSchemeChar(c: Char) =
    isAlpha(c) || (c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.'
}
