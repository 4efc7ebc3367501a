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

  /** Parse a robots.txt body → rules of the `*` group. Group semantics:
    * consecutive user-agent lines open a group; any of them being `*`
    * selects it; a rule line closes the user-agent run.
    */
  def parse(body: String): Seq[Rule] = {
    val rules = Seq.newBuilder[Rule]
    var inStar = false
    var seenUaSinceRules = true
    for (raw <- body.linesIterator) {
      val line = raw.split("#", 2)(0).trim
      if (line.nonEmpty && line.contains(":")) {
        val idx = line.indexOf(':')
        val field = line.substring(0, idx).trim.toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(idx + 1).trim
        field match {
          case "user-agent" =>
            if (seenUaSinceRules) inStar = inStar || value == "*"
            else { inStar = value == "*"; seenUaSinceRules = true }
          case "allow" | "disallow" =>
            seenUaSinceRules = false
            if (inStar && value.nonEmpty) rules += Rule(value, field == "allow")
          case _ => ()
        }
      }
    }
    rules.result()
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
