package graft.html

import java.nio.charset.StandardCharsets.UTF_8

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** Differential gate for [[ByteLinkScanner]]: on every eligible input the
  * byte-level links scan must equal the decoded-String tokenizer path it
  * bypasses — over committed fixtures, random tag soup, anchor-heavy docs,
  * and malformed-UTF-8 mutations. The eligibility gate itself is checked
  * against the char-level facts it stands in for (charset sniff + exotic
  * whitespace).
  */
class ByteScanSpec extends AnyFunSuite {

  /** byte path when eligible (this is what extractLinks runs). */
  private def byteLinks(bytes: Array[Byte]): Option[List[String]] = {
    val st = ByteLinkScanner.eligibleStart(bytes)
    if (st >= 0) Some(ByteLinkScanner.scan(bytes, st)) else None
  }

  private def checkDoc(bytes: Array[Byte], label: => String): Boolean =
    byteLinks(bytes) match {
      case None => false
      case Some(got) =>
        val want = HtmlExtract.extractLinksViaChars(bytes)
        assert(got == want, s"byte/char divergence on $label\n got=$got\nwant=$want")
        true
    }

  test("eligibility gate is consistent with the char-level facts") {
    val r = new Random(20260817L)
    val exotic = Array('\u00a0', '\u0085', '\u001c', '\u001d', '\u001e',
      '\u001f', '\u1680', '\u2000', '\u2003', '\u200a', '\u2028', '\u2029',
      '\u202f', '\u205f', '\u3000')
    (0 until 20000).foreach { _ =>
      val sb = new java.lang.StringBuilder
      (0 until r.nextInt(60)).foreach { _ =>
        val k = r.nextInt(100)
        if (k < 4) sb.append(exotic(r.nextInt(exotic.length)))
        else if (k < 10) sb.append("\u00e9\u00a2\u20ac\u00df".charAt(r.nextInt(4)))
        else sb.append((32 + r.nextInt(95)).toChar)
      }
      val s = sb.toString
      val bytes = s.getBytes(UTF_8)
      val st = ByteLinkScanner.eligibleStart(bytes)
      val hasExotic = s.exists(c => HtmlTokenizer.isPySpace(c) &&
        !(c == ' ' || (c >= 0x09 && c <= 0x0d)))
      // eligible ⇒ genuinely no exotic whitespace; exotic present ⇒ rejected
      if (st >= 0) assert(!hasExotic, s"eligible despite exotic ws: ${esc(s)}")
      if (hasExotic) assert(st < 0, s"exotic ws not detected: ${esc(s)}")
    }
    // charset redirection must force the fallback
    assert(byteLinks("<meta charset=\"latin1\"><a href=x>".getBytes(UTF_8)).isEmpty)
    assert(byteLinks("<meta charset=\"utf-8\"><a href=x>".getBytes(UTF_8)).nonEmpty)
    // UTF-16 BOMs force the fallback; UTF-8 BOM is consumed
    assert(byteLinks(Array(0xFF, 0xFE, 'a', 0).map(_.toByte)).isEmpty)
    assert(byteLinks(Array(0xFE, 0xFF, 0, 'a').map(_.toByte)).isEmpty)
    val bom = Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
      "<a href=q>".getBytes(UTF_8)
    assert(byteLinks(bom).contains(List("q")))
  }

  test("committed html fixture documents: byte scan ≡ char scan") {
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
    var eligible = 0
    docs.foreach { case (name, bytes) =>
      if (checkDoc(bytes, s"fixture $name")) eligible += 1
    }
    assert(eligible > docs.size / 2, s"only $eligible/${docs.size} took the byte path")
  }

  test("site fixture pages + SiteGen pages: byte scan ≡ char scan") {
    val scenarios = Seq("basic", "quirks", "budget2", "robots", "delay",
      "combo", "multiseed", "priority", "astral", "fuzz1", "fuzz5")
    var checked = 0
    scenarios.foreach { s =>
      val in = getClass.getResourceAsStream(s"/sites/$s/pages.tsv")
      require(in != null)
      val src = scala.io.Source.fromInputStream(in, "UTF-8")
      try src.getLines().foreach { line =>
        val Array(url, b64) = line.split("\t", -1)
        val bytes = java.util.Base64.getDecoder.decode(b64)
        if (checkDoc(bytes, s"$s:$url")) checked += 1
      } finally src.close()
    }
    assert(checked > 50)
    (0 until 500).foreach { i =>
      val b = graft.synth.SiteGen.buildHtml("example.com", 32, 100000L, 12, 42L, i.toLong)
        .getBytes(UTF_8)
      assert(checkDoc(b, s"sitegen $i"), "SiteGen pages must take the byte path")
    }
  }

  // tag-soup alphabet, weighted toward structural chars + entity syntax
  private val soupAlphabet: Array[Char] =
    ("aZ09" * 2 + "<<>>//==''\"\"  ,\t\n\f\r&;#!?-.[]" + "href=achrs").toCharArray

  private def soup(r: Random, maxLen: Int): String = {
    val frags = Array(
      () => soupAlphabet(r.nextInt(soupAlphabet.length)).toString,
      () => "<a href=",
      () => "<A HREF=\"",
      () => "<a href>",
      () => "' >",
      () => "\">x</a>",
      () => "<script>",
      () => "</script >",
      () => "<style>",
      () => "</style>",
      () => "<!--",
      () => "-->",
      () => "<![CDATA[",
      () => "]]>",
      () => "<![if x]>",
      () => "<!doctype html>",
      () => "<?pi?",
      () => "</>",
      () => "</ a>",
      () => "&amp;&#x2f;&#47;&bogus;",
      () => "/>")
    val sb = new java.lang.StringBuilder
    while (sb.length < maxLen) sb.append(frags(r.nextInt(frags.length))())
    sb.toString
  }

  test("120k random tag-soup docs: byte scan ≡ char scan") {
    val r = new Random(7L)
    var eligible = 0
    (0 until 120000).foreach { i =>
      val doc = soup(r, 20 + r.nextInt(140))
      if (checkDoc(doc.getBytes(UTF_8), s"soup#$i ${esc(doc)}")) eligible += 1
    }
    assert(eligible > 100000)
  }

  test("malformed-UTF-8 mutations: byte scan ≡ char scan (replacement-char parity)") {
    val r = new Random(11L)
    var eligible = 0
    (0 until 40000).foreach { i =>
      val doc = soup(r, 20 + r.nextInt(100)) + "é¢€" // multi-byte tail to cut
      val bytes = doc.getBytes(UTF_8)
      // corrupt 1-4 random bytes with random high/low values
      (0 until 1 + r.nextInt(4)).foreach { _ =>
        bytes(r.nextInt(bytes.length)) = r.nextInt(256).toByte
      }
      if (checkDoc(bytes, s"mut#$i ${bytes.map(b => f"$b%02x").mkString}")) eligible += 1
    }
    assert(eligible > 25000, s"eligible=$eligible")
  }

  private def esc(s: String): String =
    s.flatMap {
      case c if c >= 0x20 && c < 0x7f => c.toString
      case c => f"\\u${c.toInt}%04x"
    }
}
