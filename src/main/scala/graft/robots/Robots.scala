package graft.robots

import graft.url.PyUrl

/** RFC 9309-lite robots.txt support (north_rule addition; the reference has
  * none — SURVEY.md §2.2 politeness row). Agent group `*` only; the engine's
  * UA constant mirrors crawler.py:20 but product-token group matching is out
  * of scope by contract. Longest-path-prefix match wins; allow wins ties;
  * no matching rule → allowed. Byte-for-byte mirror of the Python oracle in
  * tools/gen_site_fixtures.py.
  */
object Robots {

  /** (path_prefix, allow). */
  final case class Rule(prefix: String, allow: Boolean)

  /** Full parse result: rules of the `*` group + its crawl-delay (SURVEY.md
    * §1.2 robots schema). `crawlDelay` = the LAST crawl-delay value in the
    * `*` group that Python `float()` accepts.
    */
  final case class Parsed(rules: Seq[Rule], crawlDelay: Option[Double])

  /** Python `float(str)` on an already-stripped string; None where float()
    * raises ValueError. Matches CPython: Unicode decimal digits (category
    * Nd) normalized to ASCII, single underscores allowed between digits,
    * inf/infinity/nan (case-insensitive, signed — '-nan' keeps the sign
    * bit), C-double grammar otherwise. Differentially pinned by the
    * robots_fuzz vectors.
    */
  def pyFloat(s0: String): Option[Double] = {
    if (s0.isEmpty) return None
    val sb = new java.lang.StringBuilder(s0.length)
    var i = 0
    while (i < s0.length) {
      val c = s0.charAt(i)
      if (Character.getType(c) == Character.DECIMAL_DIGIT_NUMBER) {
        val d = Character.digit(c, 10)
        if (d < 0) return None
        sb.append(('0' + d).toChar)
      } else sb.append(c)
      i += 1
    }
    var s = sb.toString
    var neg = false
    if (s.startsWith("+")) s = s.substring(1)
    else if (s.startsWith("-")) { neg = true; s = s.substring(1) }
    val low = s.toLowerCase(java.util.Locale.ROOT)
    if (low == "inf" || low == "infinity")
      return Some(if (neg) Double.NegativeInfinity else Double.PositiveInfinity)
    if (low == "nan")
      // CPython keeps the sign bit of '-nan' (strtod); NaN compare semantics
      // are signless, but the bit-level contract is pinned by the fuzz TSV
      return Some(if (neg) -Double.NaN else Double.NaN)
    // digits with single underscores BETWEEN digits only
    val D = "\\d(?:_\\d|\\d)*"
    if (!s.matches(s"(?:$D(?:\\.(?:$D)?)?|\\.$D)(?:[eE][+-]?$D)?")) return None
    val v = java.lang.Double.parseDouble(s.replace("_", ""))
    Some(if (neg) -v else v)
  }

  /** Python `str.splitlines()` boundaries — NOT just \n/\r\n: VT FF FS GS RS
    * NEL LS PS all split. The oracle iterates `body.splitlines()`, so a body
    * using exotic separators must parse identically (robots_fuzz differential
    * caught `linesIterator` missing these).
    */
  @inline private def isLineBreak(c: Char): Boolean =
    c == '\n' || c == '\r' || c == 0x0b || c == 0x0c ||
      (c >= 0x1c && c <= 0x1e) || c == 0x85 || c == 0x2028 || c == 0x2029

  private def pySplitlines(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    var start = 0
    while (i < s.length) {
      if (isLineBreak(s.charAt(i))) {
        out += s.substring(start, i)
        if (s.charAt(i) == '\r' && i + 1 < s.length && s.charAt(i + 1) == '\n') i += 1
        i += 1
        start = i
      } else i += 1
    }
    if (start < s.length) out += s.substring(start)
    out.result()
  }

  /** Parse a robots.txt body → rules + crawl-delay of the `*` group. Group
    * semantics: consecutive user-agent lines open a group; any of them being
    * `*` selects it; a rule line (allow/disallow/crawl-delay) closes the
    * user-agent run — sitemap-class records are ignored entirely. Line
    * splitting and stripping follow Python `splitlines`/`str.strip` (the
    * oracle's exact operations — `trim` would miss NBSP/NEL/FS padding);
    * crawl-delay values follow Python `float()` ([[pyFloat]]).
    */
  def parseAll(body: String): Parsed = {
    import graft.html.HtmlTokenizer.pyStrip
    val rules = Seq.newBuilder[Rule]
    var delay: Option[Double] = None
    var inStar = false
    var seenUaSinceRules = true
    for (raw <- pySplitlines(body)) {
      val line = pyStrip(raw.split("#", 2)(0))
      if (line.nonEmpty && line.contains(":")) {
        val idx = line.indexOf(':')
        val field = pyStrip(line.substring(0, idx)).toLowerCase(java.util.Locale.ROOT)
        val value = pyStrip(line.substring(idx + 1))
        field match {
          case "user-agent" =>
            if (seenUaSinceRules) inStar = inStar || value == "*"
            else { inStar = value == "*"; seenUaSinceRules = true }
          case "allow" | "disallow" =>
            seenUaSinceRules = false
            if (inStar && value.nonEmpty) rules += Rule(value, field == "allow")
          case "crawl-delay" =>
            seenUaSinceRules = false
            if (inStar) pyFloat(value).foreach(d => delay = Some(d))
          case _ => ()
        }
      }
    }
    Parsed(rules.result(), delay)
  }

  def parse(body: String): Seq[Rule] = parseAll(body).rules

  /** CPython float floor-division `vx // wx` (floatobject.c float_divmod →
    * floor + 0.5-correction). NOT `floor(vx / wx)`: the rounded double
    * quotient can cross an integer the exact quotient doesn't reach — e.g.
    * 60.0 / 6.666666666666667 rounds to 9.0 but 60.0 // 6.666666666666667
    * is 8.0. The politeness budget uses this so a robots crawl-delay
    * computes bit-exactly the oracle's `int(window // d)`. Java's `%` on
    * doubles is C fmod, matching CPython's fmod use.
    */
  def pyFloorDiv(vx: Double, wx: Double): Double = {
    var mod = vx % wx
    var div = (vx - mod) / wx
    if (mod != 0.0) {
      if ((wx < 0.0) != (mod < 0.0)) { mod += wx; div -= 1.0 }
    }
    val fd = math.floor(div)
    if (div - fd > 0.5) fd + 1.0 else fd
  }

  def allowed(url: String, rules: Seq[Rule]): Boolean = {
    val p = PyUrl.urlparse(url).path
    val path = if (p.isEmpty) "/" else p
    var best: Rule = null
    for (r <- rules) {
      if (path.startsWith(r.prefix)) {
        if (best == null || r.prefix.length > best.prefix.length ||
          (r.prefix.length == best.prefix.length && r.allow)) best = r
      }
    }
    best == null || best.allow
  }

  /** Politeness/robots host key: lowercased host sans port/userinfo —
    * matches the oracle's host_key().
    */
  def hostKey(url: String): String =
    PyUrl.host(url).toLowerCase(java.util.Locale.ROOT)
}
