package graft.html

import java.util.regex.Pattern

/** CPython `html.unescape` reimplementation. The html5 named-entity table and
  * the invalid-charref/codepoint tables are exported verbatim from the
  * stdlib by tools/gen_vectors.py into resources, so named-reference
  * semantics (incl. the no-trailing-semicolon longest-match rule) are exact.
  */
object Entities {

  private def loadLines(res: String): Iterator[String] = {
    val in = getClass.getResourceAsStream(res)
    require(in != null, s"missing resource $res")
    scala.io.Source.fromInputStream(in, "UTF-8").getLines()
  }

  private def cps(hexList: String): String = {
    val sb = new java.lang.StringBuilder
    hexList.split(" ").foreach(h => sb.appendCodePoint(Integer.parseInt(h, 16)))
    sb.toString
  }

  /** name (with or without trailing ';') → replacement string. */
  val html5: Map[String, String] = loadLines("/graft/html5_entities.tsv").map { line =>
    val t = line.split("\t")
    t(0) -> cps(t(1))
  }.toMap

  val (invalidCharrefs: Map[Int, String], invalidCodepoints: Set[Int]) = {
    val it = loadLines("/graft/invalid_charrefs.tsv").toVector
    val split = it.indexOf("# invalid_codepoints")
    val refs = it.take(split).map { line =>
      val t = line.split("\t")
      Integer.parseInt(t(0), 16) -> cps(t(1))
    }.toMap
    val cpsSet = it.drop(split + 1).map(l => Integer.parseInt(l.split("\t")(0), 16)).toSet
    (refs, cpsSet)
  }

  // html._charref: &(#[0-9]+;?|#[xX][0-9a-fA-F]+;?|[^\t\n\f <&#;]{1,32};?)
  private val charref = Pattern.compile(
    "&(#[0-9]+;?|#[xX][0-9a-fA-F]+;?|[^\\t\\n\\f <&#;]{1,32};?)")

  private def replaceNumeric(s: String): String = {
    val hex = s.length > 1 && (s.charAt(1) == 'x' || s.charAt(1) == 'X')
    val digits = (if (hex) s.substring(2) else s.substring(1)).stripSuffix(";")
    // Python ints are unbounded: strip leading zeros first (so
    // &#x0000000041; is still 'A'), then anything longer than 7 significant
    // digits is > 0x10FFFF in either radix; 7 digits always fit an Int.
    val sig = digits.dropWhile(_ == '0')
    val num =
      if (sig.isEmpty) 0
      else if (sig.length > 7) 0x110000
      else Integer.parseInt(sig, if (hex) 16 else 10)
    invalidCharrefs.get(num) match {
      case Some(rep) => rep
      case None =>
        if ((num >= 0xD800 && num <= 0xDFFF) || num > 0x10FFFF) "�"
        else if (invalidCodepoints.contains(num)) ""
        else new String(Character.toChars(num))
    }
  }

  private def replaceNamed(s: String): String = {
    html5.get(s) match {
      case Some(rep) => rep
      case None =>
        // longest matching prefix of length >= 2, per the standard
        var x = s.length - 1
        while (x >= 2) {
          html5.get(s.substring(0, x)) match {
            case Some(rep) => return rep + s.substring(x)
            case None      => x -= 1
          }
        }
        "&" + s
    }
  }

  /** `html.unescape(s)` — exact port. */
  def unescape(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val m = charref.matcher(s)
    val sb = new java.lang.StringBuilder(s.length)
    var last = 0
    while (m.find()) {
      sb.append(s, last, m.start())
      val g = m.group(1)
      sb.append(if (g.charAt(0) == '#') replaceNumeric(g) else replaceNamed(g))
      last = m.end()
    }
    sb.append(s, last, s.length)
    sb.toString
  }
}
