package graft.html

import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}
import java.util.regex.Pattern

/** Page-level extraction over raw html bytes: the bs4-'html.parser' contract
  * adopted in SURVEY.md §2 O-3/§2.2 (text-extraction row).
  *
  * - links: every `a` start/startend tag carrying an `href` attribute, in
  *   document order; valueless href → ""; duplicate attrs → last wins (bs4
  *   on_duplicate_attribute default).
  * - text: concatenation of all character-data tokens in document order,
  *   entities decoded, script/style raw text included, comments/doctype/PI/
  *   marked-section markup excluded.
  * - encoding: BOM > declared <meta charset> (first 1024 bytes) > UTF-8,
  *   malformed bytes replaced (never throws).
  */
object HtmlExtract {

  private val metaCharset = Pattern.compile(
    """<meta[^>]+charset\s*=\s*["']?([A-Za-z0-9_\-.:]+)""",
    Pattern.CASE_INSENSITIVE)

  def sniffCharset(bytes: Array[Byte]): Charset = {
    if (bytes.length >= 3 && bytes(0) == 0xEF.toByte && bytes(1) == 0xBB.toByte &&
      bytes(2) == 0xBF.toByte) return StandardCharsets.UTF_8
    if (bytes.length >= 2 && bytes(0) == 0xFF.toByte && bytes(1) == 0xFE.toByte)
      return StandardCharsets.UTF_16LE
    if (bytes.length >= 2 && bytes(0) == 0xFE.toByte && bytes(1) == 0xFF.toByte)
      return StandardCharsets.UTF_16BE
    val head = new String(bytes, 0, math.min(bytes.length, 1024), StandardCharsets.ISO_8859_1)
    val m = metaCharset.matcher(head)
    if (m.find()) {
      try return Charset.forName(m.group(1))
      catch { case _: Exception => () }
    }
    StandardCharsets.UTF_8
  }

  def decode(bytes: Array[Byte]): String = {
    val cs = sniffCharset(bytes)
    val dec = cs.newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val skip = // drop BOM bytes like Python text decoding with utf-8-sig/utf-16
      if (cs == StandardCharsets.UTF_8 && bytes.length >= 3 &&
        bytes(0) == 0xEF.toByte && bytes(1) == 0xBB.toByte && bytes(2) == 0xBF.toByte) 3
      else if ((cs == StandardCharsets.UTF_16LE || cs == StandardCharsets.UTF_16BE) &&
        bytes.length >= 2) 2
      else 0
    bb.position(skip)
    dec.decode(bb).toString
  }

  private final class Collector(collectText: Boolean) extends HtmlEvents {
    val links = List.newBuilder[String]
    val text = new java.lang.StringBuilder
    override def wantsData: Boolean = collectText
    override def wantsAllTags: Boolean = collectText
    override def tagFilter(name: String): Boolean = name == "a"

    override def startTag(name: String, attrs: List[(String, Option[String])]): Unit =
      if (name == "a") {
        // bs4 builder: value None → ""; duplicate keys → last wins
        var href: String = null
        var has = false
        attrs.foreach { case (k, v) =>
          if (k == "href") { has = true; href = v.getOrElse("") }
        }
        if (has) links += href
      }

    override def data(t: String): Unit = if (collectText) text.append(t)
  }

  /** (hrefs in document order, extracted text). Never throws. */
  def extract(htmlBytes: Array[Byte]): (List[String], String) = {
    try {
      val c = new Collector(collectText = true)
      HtmlTokenizer.parse(decode(htmlBytes), c)
      (c.links.result(), c.text.toString)
    } catch {
      case _: Exception => (Nil, "") // crawler.py:45-46: any parse error → empty
    }
  }

  /** Links only — skips text accumulation (hot path of the crawl loop).
    * Eligible documents (UTF-8, no exotic whitespace — the overwhelming
    * majority) take [[ByteLinkScanner]] directly over the raw bytes, skipping
    * the bytes→UTF-16 decode entirely; the rest take the decoded-String
    * tokenizer. Byte ≡ char equivalence is fuzz-pinned by ByteScanSpec.
    */
  def extractLinks(htmlBytes: Array[Byte]): List[String] =
    extractLinksErr(htmlBytes)._1

  /** extractLinks plus an error flag: `true` iff extraction gave up and
    * returned no links because BOTH scan paths threw (the crawler.py:45-46
    * swallow path) — the per-partition `parse_errors` metric signal. A
    * malformed document the never-throw tokenizer handles is NOT an error.
    */
  def extractLinksErr(htmlBytes: Array[Byte]): (List[String], Boolean) =
    try {
      val st = ByteLinkScanner.eligibleStart(htmlBytes)
      if (st >= 0) {
        // a latent byte-scanner bug on an eligible input must not silently
        // drop the page's links — fall back to the pinned char path
        try (ByteLinkScanner.scan(htmlBytes, st), false)
        catch { case _: Throwable => extractLinksViaCharsErr(htmlBytes) }
      } else extractLinksViaCharsErr(htmlBytes)
    } catch { case _: Exception => (Nil, true) }

  /** The decoded-String links path — fallback target and the byte scanner's
    * differential reference (ByteScanSpec).
    */
  private[graft] def extractLinksViaChars(htmlBytes: Array[Byte]): List[String] =
    extractLinksViaCharsErr(htmlBytes)._1

  private def extractLinksViaCharsErr(htmlBytes: Array[Byte]): (List[String], Boolean) =
    try {
      val c = new Collector(collectText = false)
      HtmlTokenizer.parse(decode(htmlBytes), c)
      (c.links.result(), false)
    } catch { case _: Exception => (Nil, true) } // crawler.py:45-46

  def extractText(htmlBytes: Array[Byte]): String = extract(htmlBytes)._2
}
