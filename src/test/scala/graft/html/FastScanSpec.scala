package graft.html

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** Differential gate for [[HtmlTokenizer.FastScan]]: the hand-rolled
  * start-tag scanners must be indistinguishable from the regex path on
  * every input — function-level against the very patterns they replace
  * (per whitespace dialect), and parse-level over random tag soup plus
  * every committed fixture.
  */
class FastScanSpec extends AnyFunSuite {

  // tag-soup alphabet, heavily weighted toward the structural chars the
  // patterns branch on (quotes, =, /, >, <, comma, every ASCII ws)
  private val asciiAlphabet: Array[Char] =
    ("aZ09" * 2 + "<<>>//==''\"\"  ,\t\n\f\r&;#!?-.[]").toCharArray

  // adds the Python-\s-only chars (NBSP, NEL, FS, em space, ideographic
  // space, line sep) that route parse() onto the Unicode dialect
  private val exoticAlphabet: Array[Char] =
    asciiAlphabet ++ Array('\u00a0', '\u0085', '\u001c', '\u2003', '\u3000', '\u2028')

  private def randString(r: Random, alphabet: Array[Char], maxLen: Int): String = {
    val len = r.nextInt(maxLen)
    val sb = new java.lang.StringBuilder(len)
    (0 until len).foreach(_ => sb.append(alphabet(r.nextInt(alphabet.length))))
    sb.toString
  }

  private def fuzzFunctions(dialect: String, P: HtmlTokenizer.WsPatterns,
      scanner: HtmlTokenizer.FastScan, alphabet: Array[Char], trials: Int,
      seed: Long): Unit = {
    val r = new Random(seed)
    val out = new HtmlTokenizer.AttrResult
    (0 until trials).foreach { _ =>
      // force the anchor shape startTagEnd assumes: '<' + letter + soup
      val s = "<" + (if (r.nextBoolean()) "a" else "A") + randString(r, alphabet, 40)
      val n = s.length

      val mLoc = P.locatestarttagendTolerant.matcher(s)
      mLoc.useTransparentBounds(true)
      mLoc.region(0, n)
      assert(mLoc.lookingAt(), s"[$dialect] locatestarttagend must match at <letter: ${escape(s)}")
      val expectEnd = mLoc.end()
      val gotEnd = scanner.startTagEnd(s, n, 0)
      assert(gotEnd == expectEnd,
        s"[$dialect] startTagEnd $gotEnd != regex $expectEnd on ${escape(s)}")

      // tagFind anchored at 1 (the letter) and at a random position
      Seq(1, 1 + r.nextInt(math.max(1, n - 1))).foreach { p =>
        val mTag = P.tagfindTolerant.matcher(s)
        mTag.useTransparentBounds(true)
        mTag.region(p, n)
        val got = scanner.tagFind(s, n, p)
        if (!mTag.lookingAt())
          assert(got == -1L, s"[$dialect] tagFind matched where regex did not: ${escape(s)} @$p")
        else {
          assert(got != -1L, s"[$dialect] tagFind missed a regex match: ${escape(s)} @$p")
          assert((got >>> 32).toInt == mTag.end(1) && got.toInt == mTag.end(),
            s"[$dialect] tagFind bounds (${(got >>> 32).toInt},${got.toInt}) != regex (${mTag.end(1)},${mTag.end()}) on ${escape(s)} @$p")
        }
      }

      // attrFind at a random anchor
      val k = r.nextInt(n + 1)
      val mAttr = P.attrfindTolerant.matcher(s)
      mAttr.useTransparentBounds(true)
      mAttr.region(k, n)
      val ok = scanner.attrFind(s, n, k, out)
      if (!mAttr.lookingAt())
        assert(!ok, s"[$dialect] attrFind matched where regex did not: ${escape(s)} @$k")
      else {
        assert(ok, s"[$dialect] attrFind missed a regex match: ${escape(s)} @$k")
        assert(s.substring(out.nameStart, out.nameEnd) == mAttr.group(1),
          s"[$dialect] attr name mismatch on ${escape(s)} @$k")
        val expectVal = mAttr.group(3)
        if (mAttr.group(2) == null)
          assert(!out.hasValue, s"[$dialect] attrFind found a value where regex did not: ${escape(s)} @$k")
        else {
          assert(out.hasValue, s"[$dialect] attrFind missed a value: ${escape(s)} @$k")
          assert(s.substring(out.valStart, out.valEnd) == expectVal,
            s"[$dialect] attr value mismatch: '${escape(s.substring(out.valStart, out.valEnd))}' != '${escape(expectVal)}' on ${escape(s)} @$k")
        }
        assert(out.end == mAttr.end(), s"[$dialect] attrFind end ${out.end} != regex ${mAttr.end()} on ${escape(s)} @$k")
      }
    }
  }

  test("ascii dialect: scanners match the regexes they replace on 300k random strings") {
    fuzzFunctions("ascii", HtmlTokenizer.AsciiP, HtmlTokenizer.FastScan.Ascii,
      asciiAlphabet, 300000, 20260816L)
  }

  test("py-\\s dialect: scanners match the Unicode regexes on 300k exotic-ws strings") {
    fuzzFunctions("py", HtmlTokenizer.UnicodeP, HtmlTokenizer.FastScan.Py,
      exoticAlphabet, 300000, 20260817L)
  }

  /** Event recorder for whole-parse comparison. */
  private final class Events extends HtmlEvents {
    val log = List.newBuilder[String]
    override def startTag(name: String, attrs: List[(String, Option[String])]): Unit =
      log += s"start:$name:$attrs"
    override def startEndTag(name: String, attrs: List[(String, Option[String])]): Unit =
      log += s"startend:$name:$attrs"
    override def endTag(name: String): Unit = log += s"end:$name"
    override def data(text: String): Unit = log += s"data:$text"
    override def comment(text: String): Unit = log += s"comment:$text"
    override def decl(text: String): Unit = log += s"decl:$text"
    override def pi(text: String): Unit = log += s"pi:$text"
    override def unknownDecl(text: String): Unit = log += s"unknown:$text"
  }

  private def eventsOf(doc: String, fastScan: Boolean): List[String] = {
    val e = new Events
    HtmlTokenizer.parse(doc, e, useFastScan = fastScan)
    e.log.result()
  }

  test("whole-parse differential: 60k random ascii docs produce identical event streams") {
    val r = new Random(42L)
    (0 until 60000).foreach { _ =>
      val doc = randString(r, asciiAlphabet, 120)
      assert(eventsOf(doc, fastScan = true) == eventsOf(doc, fastScan = false),
        s"event divergence on ${escape(doc)}")
    }
  }

  test("whole-parse differential: 60k random exotic-ws docs produce identical event streams") {
    val r = new Random(43L)
    (0 until 60000).foreach { _ =>
      val doc = randString(r, exoticAlphabet, 120)
      assert(eventsOf(doc, fastScan = true) == eventsOf(doc, fastScan = false),
        s"event divergence on ${escape(doc)}")
    }
  }

  test("whole-parse differential: every committed fixture document") {
    val docs = Seq("/vectors/html_vectors.tsv", "/vectors/html_fuzz.tsv",
      "/vectors/html_fuzz2.tsv").flatMap { res =>
      val in = getClass.getResourceAsStream(res)
      require(in != null)
      val src = scala.io.Source.fromInputStream(in, "UTF-8")
      try src.getLines().drop(1).map { line =>
        val cols = line.split("\t", -1)
        (cols(0), if (cols(1).isEmpty) Array.empty[Byte]
          else java.util.Base64.getDecoder.decode(cols(1)))
      }.toVector
      finally src.close()
    }
    assert(docs.nonEmpty)
    docs.foreach { case (name, bytes) =>
      val doc = HtmlExtract.decode(bytes)
      assert(eventsOf(doc, fastScan = true) == eventsOf(doc, fastScan = false),
        s"event divergence on fixture $name")
    }
  }

  private def escape(s: String): String =
    s.flatMap {
      case c if c >= 0x20 && c < 0x7f => c.toString
      case c => f"\\u${c.toInt}%04x"
    }
}
