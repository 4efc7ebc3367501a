package graft.url

/** From-scratch Scala reimplementation of the subset of CPython 3.11
  * `urllib.parse` semantics the reference crawler relies on
  * (crawler.py:24-42: `urlparse`, `urljoin`, and the hand-rolled
  * "scheme://netloc+path[?query]" clean-URL rebuild).
  *
  * Spark's built-in `parse_url` follows different corner-case behavior
  * (java.net/regex based), so byte-exactness vs the reference requires this
  * port. Verified against stdlib-generated golden vectors in
  * `src/test/resources/vectors/url_{clean,join}.tsv` (UrlExprSpec).
  */
object PyUrl {

  /** Result of urlparse: (scheme, netloc, path, params, query, fragment). */
  final case class Parsed(
      scheme: String,
      netloc: String,
      path: String,
      params: String,
      query: String,
      fragment: String)

  // urllib.parse.uses_relative / uses_netloc / uses_params (CPython 3.11)
  private val usesRelative = Set(
    "", "ftp", "http", "gopher", "nntp", "imap", "wais", "file", "https",
    "shttp", "mms", "prospero", "rtsp", "rtspu", "sftp", "svn", "svn+ssh",
    "ws", "wss")
  private val usesNetloc = Set(
    "", "ftp", "http", "gopher", "nntp", "telnet", "imap", "wais", "file",
    "mms", "https", "shttp", "snews", "prospero", "rtsp", "rtspu", "rsync",
    "svn", "svn+ssh", "sftp", "nfs", "git", "git+ssh", "ws", "wss",
    "itms-services")
  private val usesParams = Set(
    "", "ftp", "hdl", "prospero", "http", "imap", "https", "shttp", "rtsp",
    "rtspu", "sip", "sips", "mms", "sftp", "tel")

  private def isSchemeChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.'

  /** urlsplit's WHATWG cleanup: lstrip C0-control-or-space from the url,
    * then remove every tab/CR/LF anywhere.
    */
  private def sanitize(url0: String): String = {
    var start = 0
    while (start < url0.length && url0.charAt(start) <= ' ') start += 1
    var needsCopy = false
    var i = start
    while (i < url0.length && !needsCopy) {
      val c = url0.charAt(i)
      if (c == '\t' || c == '\r' || c == '\n') needsCopy = true
      i += 1
    }
    if (start == 0 && !needsCopy) return url0 // common case: no allocation
    if (!needsCopy) return url0.substring(start)
    val sb = new java.lang.StringBuilder(url0.length - start)
    i = start
    while (i < url0.length) {
      val c = url0.charAt(i)
      if (c != '\t' && c != '\r' && c != '\n') sb.append(c)
      i += 1
    }
    sb.toString
  }

  /** CPython `urlsplit(url, scheme, allow_fragments=True)` → 5-tuple folded
    * into Parsed with params="".
    */
  def urlsplit(url0: String, defaultScheme: String = ""): Parsed = {
    var url = sanitize(url0)
    var scheme = defaultScheme
    var netloc = ""
    var query = ""
    var fragment = ""
    val i = url.indexOf(':')
    if (i > 0 && url.charAt(0) < 128 && Character.isLetter(url.charAt(0))) {
      var ok = true
      var j = 0
      while (ok && j < i) { if (!isSchemeChar(url.charAt(j))) ok = false; j += 1 }
      if (ok) {
        scheme = url.substring(0, i).toLowerCase(java.util.Locale.ROOT)
        url = url.substring(i + 1)
      }
    }
    if (url.startsWith("//")) {
      // _splitnetloc: up to the first of / ? # after position 2
      var delim = url.length
      var k = 2
      var found = false
      while (k < url.length && !found) {
        val c = url.charAt(k)
        if (c == '/' || c == '?' || c == '#') { delim = k; found = true }
        k += 1
      }
      netloc = url.substring(2, delim)
      url = url.substring(delim)
    }
    val h = url.indexOf('#')
    if (h >= 0) { fragment = url.substring(h + 1); url = url.substring(0, h) }
    val q = url.indexOf('?')
    if (q >= 0) { query = url.substring(q + 1); url = url.substring(0, q) }
    Parsed(scheme, netloc, url, "", query, fragment)
  }

  /** CPython `_splitparams`: split `;params` off the LAST path segment. */
  private def splitParams(path: String): (String, String) = {
    val from = path.lastIndexOf('/')
    val i = if (from >= 0) path.indexOf(';', from) else path.indexOf(';')
    if (i < 0) (path, "") else (path.substring(0, i), path.substring(i + 1))
  }

  /** CPython `urlparse(url, scheme, allow_fragments=True)`. */
  def urlparse(url: String, defaultScheme: String = ""): Parsed = {
    val s = urlsplit(url, defaultScheme)
    if (usesParams.contains(s.scheme) && s.path.contains(';')) {
      val (p, params) = splitParams(s.path)
      s.copy(path = p, params = params)
    } else s
  }

  /** CPython 3.11 `urlunsplit` + params reattachment (`urlunparse`).
    * Note the 3.11 authority rule (changed vs older Pythons): `//` is added
    * whenever netloc is non-empty OR the scheme uses_netloc and the path
    * does not already start with `//` — so `http` URLs keep an empty
    * authority (`http:///p`).
    */
  def urlunparse(p: Parsed): String = {
    var url = if (p.params.nonEmpty) p.path + ";" + p.params else p.path
    if (p.netloc.nonEmpty ||
      (p.scheme.nonEmpty && usesNetloc.contains(p.scheme) && !url.startsWith("//"))) {
      if (url.nonEmpty && !url.startsWith("/")) url = "/" + url
      url = "//" + p.netloc + url
    }
    if (p.scheme.nonEmpty) url = p.scheme + ":" + url
    if (p.query.nonEmpty) url = url + "?" + p.query
    if (p.fragment.nonEmpty) url = url + "#" + p.fragment
    url
  }

  /** CPython 3.11 `urljoin(base, url)` — RFC 3986 §5 as urllib implements it
    * (dot-segment removal, empty-href self-link, protocol-relative, foreign
    * schemes pass through). Reference use: crawler.py:36.
    */
  def urljoin(base: String, url: String): String = {
    if (base.isEmpty) return url
    if (url.isEmpty) return base
    val b = urlparse(base, "")
    val r0 = urlparse(url, b.scheme)
    if (r0.scheme != b.scheme || !usesRelative.contains(r0.scheme)) return url
    var r = r0
    if (usesNetloc.contains(r.scheme)) {
      if (r.netloc.nonEmpty) return urlunparse(r)
      r = r.copy(netloc = b.netloc)
    }
    if (r.path.isEmpty && r.params.isEmpty) {
      val q = if (r.query.isEmpty) b.query else r.query
      return urlunparse(r.copy(path = b.path, params = b.params, query = q))
    }
    val baseParts0 = b.path.split("/", -1).toBuffer
    if (baseParts0.nonEmpty && baseParts0.last != "") baseParts0.remove(baseParts0.length - 1)
    val segments: scala.collection.mutable.Buffer[String] =
      if (r.path.startsWith("/")) r.path.split("/", -1).toBuffer
      else {
        val segs = baseParts0 ++ r.path.split("/", -1).toBuffer
        // segments[1:-1] = filter(None, segments[1:-1])
        if (segs.length > 2) {
          val head = segs.head
          val last = segs.last
          val mid = segs.slice(1, segs.length - 1).filter(_.nonEmpty)
          scala.collection.mutable.Buffer(head) ++ mid :+ last
        } else segs
      }
    val resolved = scala.collection.mutable.Buffer.empty[String]
    for (seg <- segments) {
      if (seg == "..") { if (resolved.nonEmpty) resolved.remove(resolved.length - 1) }
      else if (seg == ".") ()
      else resolved.append(seg)
    }
    if (segments.nonEmpty && (segments.last == "." || segments.last == ".."))
      resolved.append("")
    val joined = resolved.mkString("/")
    urlunparse(r.copy(path = if (joined.isEmpty) "/" else joined))
  }

  /** crawler.py:39-41 — clean = scheme://netloc+path, +?query iff non-empty.
    * Drops fragment and ;params; preserves netloc case/port/userinfo and the
    * path verbatim.
    */
  def cleanUrl(url: String): String = {
    val p = urlparse(url, "")
    val base = p.scheme + "://" + p.netloc + p.path
    if (p.query.nonEmpty) base + "?" + p.query else base
  }

  /** Fused per-link pipeline (crawler.py:36-42): urljoin, single urlparse,
    * scheme∈{http,https} filter, clean rebuild. Returns null when filtered —
    * byte-identical to scheme/cleanUrl over urljoin, with one parse of the
    * joined URL instead of three (the reference also parses once).
    *
    * The two href shapes that dominate real link graphs — absolute
    * `http(s)://…` and absolute-path `/…` — take a zero-Buffer fast path
    * ([[resolveCleanFast]]); anything it cannot PROVE equivalent falls back
    * to the full urljoin machinery. Equivalence is differential-fuzzed
    * (UrlExprSpec) in the FastScanSpec style.
    */
  def resolveClean(base: String, href: String): String = {
    val fast = resolveCleanFast(base, href)
    if (fast != null) fast else resolveCleanFull(base, href)
  }

  private[url] def resolveCleanFull(base: String, href: String): String = {
    val joined = urljoin(base, href)
    val p = urlparse(joined, "")
    if (p.scheme != "http" && p.scheme != "https") return null
    val b = p.scheme + "://" + p.netloc + p.path
    if (p.query.nonEmpty) b + "?" + p.query else b
  }

  /** Fast path; null = "not applicable, use the full path" (never a filtered
    * verdict — both handled shapes end in scheme http/https, which passes).
    *
    * Shape A (absolute http(s) href): urljoin either returns the href
    * unchanged (foreign/unequal scheme) or reassembles it verbatim
    * (equal scheme, non-empty netloc → urlunparse with unmodified parts) —
    * either way the final clean is a pure function of the href's own
    * components, so base never matters. Dot segments are NOT removed by
    * urljoin on this shape (netloc short-circuit precedes the path merge).
    *
    * Shape B (absolute-path href, base a lowercase http(s) URL with a
    * non-empty netloc): the merged path is the href path itself, and with
    * no "." or ".." segments the dot-removal pass is the identity, so the
    * clean is base-scheme://base-netloc + href-path-sans-params + ?query.
    * Any "/." occurrence (covers /./, /../, trailing variants) bails.
    *
    * Both shapes bail on any character `sanitize` would strip (leading
    * control/space, embedded tab/CR/LF) so the full path keeps those cases.
    */
  private[url] def resolveCleanFast(base: String, href: String): String = {
    val n = href.length
    if (n == 0 || href.charAt(0) <= ' ') return null
    var i = 0
    while (i < n) {
      val c = href.charAt(i)
      if (c == '\t' || c == '\r' || c == '\n') return null
      i += 1
    }
    if (href.startsWith("https://")) absClean(href, 8, "https")
    else if (href.startsWith("http://")) absClean(href, 7, "http")
    else if (href.charAt(0) == '/' && (n == 1 || href.charAt(1) != '/'))
      absPathClean(base, href)
    else null
  }

  /** netloc end: first of / ? # at or after `from` (CPython _splitnetloc). */
  @inline private def netlocEnd(s: String, from: Int, end: Int): Int = {
    var k = from
    while (k < end) {
      val c = s.charAt(k)
      if (c == '/' || c == '?' || c == '#') return k
      k += 1
    }
    end
  }

  /** scheme://netloc + path-sans-params (+ ?query) from href[schemeLen..). */
  private def absClean(href: String, schemeLen: Int, scheme: String): String = {
    val n = href.length
    val delim = netlocEnd(href, schemeLen, n)
    if (delim == schemeLen) return null // empty authority → full path
    val hash = href.indexOf('#', delim)
    val end = if (hash >= 0) hash else n
    var qpos = href.indexOf('?', delim)
    if (qpos >= end) qpos = -1
    val pathEnd = if (qpos >= 0) qpos else end
    // _splitparams: ';' at or after the last '/' of the path (path is either
    // empty or starts with '/', so lastIndexOf is always within the path)
    var semi = -1
    if (pathEnd > delim) {
      val lastSlash = href.lastIndexOf('/', pathEnd - 1)
      if (lastSlash >= delim) {
        semi = href.indexOf(';', lastSlash)
        if (semi >= pathEnd) semi = -1
      }
    }
    val cut = if (semi >= 0) semi else pathEnd
    val sb = new java.lang.StringBuilder(cut - schemeLen + scheme.length + 4 + (end - pathEnd))
    sb.append(scheme).append("://").append(href, schemeLen, cut)
    if (qpos >= 0 && qpos + 1 < end) sb.append('?').append(href, qpos + 1, end)
    sb.toString
  }

  /** base-scheme://base-netloc + href-path-sans-params (+ ?query). */
  private def absPathClean(base: String, href: String): String = {
    val bSchemeLen =
      if (base.startsWith("https://")) 8
      else if (base.startsWith("http://")) 7
      else return null
    val bn = base.length
    val bDelim = netlocEnd(base, bSchemeLen, bn)
    if (bDelim == bSchemeLen) return null // empty base authority
    // base must survive sanitize unchanged in [0, bDelim)
    var i = 0
    while (i < bDelim) {
      val c = base.charAt(i)
      if (c == '\t' || c == '\r' || c == '\n') return null
      i += 1
    }
    val n = href.length
    val hash = href.indexOf('#')
    val end = if (hash >= 0) hash else n
    var qpos = href.indexOf('?')
    if (qpos >= end) qpos = -1
    val pathEnd = if (qpos >= 0) qpos else end
    // any "/." in the path → possible dot segment → full path
    var k = 0
    while (k + 1 < pathEnd) {
      if (href.charAt(k) == '/' && href.charAt(k + 1) == '.') return null
      k += 1
    }
    if (pathEnd == 0) return null // href was all-fragment/query: base-relative
    var semi = -1
    val lastSlash = href.lastIndexOf('/', pathEnd - 1)
    semi = href.indexOf(';', math.max(lastSlash, 0))
    if (semi >= pathEnd) semi = -1
    val cut = if (semi >= 0) semi else pathEnd
    if (cut == 0) return null // path reduced to empty → base-query branch
    val scheme = if (bSchemeLen == 8) "https" else "http"
    val sb = new java.lang.StringBuilder(bDelim + cut + (end - pathEnd) + 1)
    sb.append(scheme).append("://").append(base, bSchemeLen, bDelim)
      .append(href, 0, cut)
    if (qpos >= 0 && qpos + 1 < end) sb.append('?').append(href, qpos + 1, end)
    sb.toString
  }

  /** crawler.py:37-38 — scheme of the (joined) URL; lowercased by urlparse. */
  def scheme(url: String): String = urlparse(url, "").scheme

  /** crawler.py:24-26 — raw netloc (case/port/userinfo preserved). */
  def netloc(url: String): String = urlparse(url, "").netloc

  /** crawler.py:24-26 — `urlparse(u).netloc.endswith(domain)` verbatim:
    * case-sensitive suffix match, port included, superstrings match.
    */
  def inDomain(url: String, domain: String): Boolean =
    netloc(url).endsWith(domain)

  /** Host portion of netloc: strip userinfo and port (bracketed IPv6 aware).
    * Mirrors urllib's `.hostname` except case is preserved (we lowercase in
    * canonicalize explicitly). Used for politeness/robots keying, NOT for the
    * reference-exact scope filter.
    */
  def host(url: String): String = {
    var n = netloc(url)
    val at = n.lastIndexOf('@')
    if (at >= 0) n = n.substring(at + 1)
    if (n.startsWith("[")) {
      val close = n.indexOf(']')
      if (close >= 0) return n.substring(0, close + 1)
      return n
    }
    val colon = n.indexOf(':')
    if (colon >= 0) n.substring(0, colon) else n
  }

  /** Extended canonicalizer (north_rule): host lowercased, default port
    * stripped, fragment dropped, ;params dropped, query keys sorted (stable,
    * byte order; original key=value text preserved), empty path → "/".
    * Used ONLY for frontier keying/sharding — never for the trace/seen
    * contract (SURVEY.md §A.1: two canonicalization layers).
    */
  def canonicalizeUrl(url: String): String = {
    val p = urlparse(url, "")
    var n = p.netloc
    val at = n.lastIndexOf('@')
    val userinfo = if (at >= 0) n.substring(0, at + 1) else ""
    var hostPort = if (at >= 0) n.substring(at + 1) else n
    hostPort = hostPort.toLowerCase(java.util.Locale.ROOT)
    val defPort = p.scheme match {
      case "http" | "ws"   => ":80"
      case "https" | "wss" => ":443"
      case "ftp"           => ":21"
      case _               => null
    }
    if (defPort != null && hostPort.endsWith(defPort))
      hostPort = hostPort.substring(0, hostPort.length - defPort.length)
    n = userinfo + hostPort
    val path = if (p.path.isEmpty) "/" else p.path
    val query =
      if (p.query.isEmpty) ""
      else p.query.split("&", -1).sorted.mkString("&")
    val base = p.scheme + "://" + n + path
    if (query.nonEmpty) base + "?" + query else base
  }
}
