package graft.html

import java.nio.charset.StandardCharsets

/** Links-only tokenizer over RAW UTF-8 bytes — the crawl loop's dominant
  * kernel without the bytes→UTF-16 decode (which halves memory traffic and
  * was measured at ~2.8 of the 13 µs/page extraction cost, degrading 2.8×
  * at 32 threads on this box's bandwidth wall).
  *
  * Strategy: every structural character of the HTMLParser grammar is ASCII,
  * and in UTF-8 no multi-byte sequence contains an ASCII byte, so the
  * ASCII-whitespace-dialect scan ([[HtmlTokenizer.FastScan.Ascii]] + the
  * regex control flow of [[HtmlTokenizer.parse]] in links-only mode) can run
  * directly on the byte array; only extracted href VALUES are materialized
  * (UTF-8 decode with replacement — identical to substringing the decoded
  * document, since value boundaries are ASCII syntax bytes that no malformed
  * or multi-byte sequence can span).
  *
  * [[eligibleStart]] gates the path to inputs where byte≡char equivalence
  * holds: UTF-8 content (no UTF-16 BOM, no non-UTF-8 <meta charset>) with
  * none of the Python-`\s`-beyond-Java-`\s` whitespace chars (whose
  * canonical encodings are detected byte-wise; the decoder rejects overlong
  * forms, so those sequences are exhaustive). Everything else falls back to
  * the decoded-String path. Equivalence is enforced by ByteScanSpec's
  * byte-vs-char differential over fixtures, tag soup, and malformed-UTF-8
  * mutations.
  */
object ByteLinkScanner {

  @inline private def isWs(c: Int): Boolean = c == ' ' || (c >= 0x09 && c <= 0x0d)
  @inline private def isLetter(c: Int): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  // tag-name continuation [^\t\n\r\f />\x00] — VT allowed, high bytes allowed
  @inline private def isNameCh(c: Int): Boolean =
    c != ' ' && c != '/' && c != '>' && c != 0x00 &&
      c != '\t' && c != '\n' && c != '\r' && c != '\f'
  @inline private def isLookbehind(c: Int): Boolean =
    c == '\'' || c == '"' || c == '/' || isWs(c)
  // endtagfind name continuation [-.a-zA-Z0-9:_]
  @inline private def isEndNameCh(c: Int): Boolean =
    isLetter(c) || (c >= '0' && c <= '9') || c == '-' || c == '.' || c == ':' || c == '_'
  // declname continuation [-_.a-zA-Z0-9]
  @inline private def isDeclNameCh(c: Int): Boolean =
    isLetter(c) || (c >= '0' && c <= '9') || c == '-' || c == '_' || c == '.'

  /** Eligibility gate. Returns the scan start offset (0, or 3 past a UTF-8
    * BOM), or -1 when the input must take the decoded-String path.
    */
  def eligibleStart(b: Array[Byte]): Int = {
    val n = b.length
    if (n >= 2 && ((b(0) == 0xFF.toByte && b(1) == 0xFE.toByte) ||
        (b(0) == 0xFE.toByte && b(1) == 0xFF.toByte))) return -1 // UTF-16 BOM
    val start =
      if (n >= 3 && b(0) == 0xEF.toByte && b(1) == 0xBB.toByte && b(2) == 0xBF.toByte) 3
      else 0
    // a declared <meta charset> can only redirect the decode if the word
    // "charset" appears in the sniff window — only then pay the full sniff
    if (headHasCharsetWord(b) &&
      (HtmlExtract.sniffCharset(b) ne StandardCharsets.UTF_8)) return -1
    var i = start
    while (i < n) {
      val c = b(i) & 0xff
      if (c >= 0x1c && c <= 0x1f) return -1 // FS GS RS US
      else if (c == 0xc2 && i + 1 < n && {
        val d = b(i + 1) & 0xff; d == 0x85 || d == 0xa0 // NEL, NBSP
      }) return -1
      else if (c == 0xe1 && i + 2 < n && (b(i + 1) & 0xff) == 0x9a &&
        (b(i + 2) & 0xff) == 0x80) return -1 // U+1680
      else if (c == 0xe2 && i + 2 < n && {
        val d = b(i + 1) & 0xff; val e = b(i + 2) & 0xff
        (d == 0x80 && ((e >= 0x80 && e <= 0x8a) || e == 0xa8 || e == 0xa9 || e == 0xaf)) ||
          (d == 0x81 && e == 0x9f) // U+2000-200A, LS, PS, NNBSP, MMSP
      }) return -1
      else if (c == 0xe3 && i + 2 < n && (b(i + 1) & 0xff) == 0x80 &&
        (b(i + 2) & 0xff) == 0x80) return -1 // U+3000
      i += 1
    }
    start
  }

  private def headHasCharsetWord(b: Array[Byte]): Boolean = {
    val lim = math.min(b.length, 1024)
    var i = 0
    while (i + 7 <= lim) {
      if ((b(i) | 0x20) == 'c' && (b(i + 1) | 0x20) == 'h' && (b(i + 2) | 0x20) == 'a' &&
        (b(i + 3) | 0x20) == 'r' && (b(i + 4) | 0x20) == 's' && (b(i + 5) | 0x20) == 'e' &&
        (b(i + 6) | 0x20) == 't') return true
      i += 1
    }
    false
  }

  private final class AttrB {
    var nameStart = 0
    var nameEnd = 0
    var hasValue = false
    var valStart = 0
    var valEnd = 0
    var end = 0
  }

  // ---- byte ports of FastScan.Ascii (fuzz-pinned via the char twin) --------

  /** end of `(?:[ws]|/(?!>))*` from q0 */
  @inline private def trailEnd(s: Array[Byte], n: Int, q0: Int): Int = {
    var q = q0
    var go = true
    while (go && q < n) {
      val c = s(q) & 0xff
      if (isWs(c)) q += 1
      else if (c == '/' && (q + 1 >= n || (s(q + 1) & 0xff) != '>')) q += 1
      else go = false
    }
    q
  }

  private def valTry(s: Array[Byte], n: Int, from: Int): Long = {
    var q = from
    while (q < n && isWs(s(q) & 0xff)) q += 1
    if (q >= n || (s(q) & 0xff) != '=') return -1L
    val eqStart = q
    while (q < n && (s(q) & 0xff) == '=') q += 1
    val eqEnd = q
    while (q < n && isWs(s(q) & 0xff)) q += 1
    if (q < n && { val c = s(q) & 0xff; c == '\'' || c == '"' }) {
      val e = findByte(s, n, s(q) & 0xff, q + 1)
      if (e >= 0) return (q.toLong << 32) | (e + 1).toLong
      if (q > eqEnd) return ((q - 1).toLong << 32) | (q - 1).toLong
      if (eqEnd - eqStart >= 2) {
        val st = eqEnd - 1
        var b = st
        while (b < n && { val c = s(b) & 0xff; c != '>' && !isWs(c) }) b += 1
        return (st.toLong << 32) | b.toLong
      }
      -1L
    } else {
      val st = q
      while (q < n && { val c = s(q) & 0xff; c != '>' && !isWs(c) }) q += 1
      (st.toLong << 32) | q.toLong
    }
  }

  /** tagfindTolerant at p: -1 if s(p) is not a letter, else packed
    * (nameEnd, matchEnd).
    */
  private def tagFind(s: Array[Byte], n: Int, p: Int): Long = {
    if (p >= n) return -1L
    if (!isLetter(s(p) & 0xff)) return -1L
    var q = p + 1
    while (q < n && isNameCh(s(q) & 0xff)) q += 1
    (q.toLong << 32) | trailEnd(s, n, q).toLong
  }

  private def attrFind(s: Array[Byte], n: Int, k: Int, out: AttrB): Boolean = {
    if (k >= n || k <= 0) return false
    if (!isLookbehind(s(k - 1) & 0xff)) return false
    val c0 = s(k) & 0xff
    if (isWs(c0) || c0 == '/' || c0 == '>') return false
    out.nameStart = k
    var q = k + 1
    while (q < n && { val c = s(q) & 0xff; !isWs(c) && c != '/' && c != '=' && c != '>' }) q += 1
    out.nameEnd = q
    val v = valTry(s, n, q)
    if (v >= 0L) {
      out.hasValue = true
      out.valStart = (v >>> 32).toInt
      out.valEnd = v.toInt
      q = out.valEnd
    } else out.hasValue = false
    out.end = trailEnd(s, n, q)
    true
  }

  /** locatestarttagendTolerant end position at i (caller established
    * `<letter` at i).
    */
  private def startTagEnd(s: Array[Byte], n: Int, i: Int): Int = {
    var q = i + 2
    while (q < n && isNameCh(s(q) & 0xff)) q += 1
    var r = q
    while (r < n && { val c = s(r) & 0xff; isWs(c) || c == '/' }) r += 1
    var more = true
    while (more) {
      if (r >= n || !isLookbehind(s(r - 1) & 0xff)) more = false
      else {
        val c0 = s(r) & 0xff
        if (isWs(c0) || c0 == '/' || c0 == '>') more = false
        else {
          var r2 = r + 1
          while (r2 < n && { val c = s(r2) & 0xff; !isWs(c) && c != '/' && c != '=' && c != '>' }) r2 += 1
          val v = valTry(s, n, r2)
          if (v >= 0L) {
            r2 = v.toInt
            var go = true
            while (go) {
              var t = r2
              while (t < n && isWs(s(t) & 0xff)) t += 1
              if (t < n && (s(t) & 0xff) == ',') r2 = t + 1 else go = false
            }
          }
          r = trailEnd(s, n, r2)
        }
      }
    }
    while (r < n && isWs(s(r) & 0xff)) r += 1
    r
  }

  // ---- small byte utilities -------------------------------------------------

  private def findByte(s: Array[Byte], n: Int, target: Int, from: Int): Int = {
    var i = math.max(from, 0)
    while (i < n) {
      if ((s(i) & 0xff) == target) return i
      i += 1
    }
    -1
  }

  private def startsWithAscii(s: Array[Byte], n: Int, at: Int, w: String): Boolean = {
    if (at < 0 || at + w.length > n) return false
    var i = 0
    while (i < w.length) {
      if ((s(at + i) & 0xff) != w.charAt(i)) return false
      i += 1
    }
    true
  }

  /** bytes [from,to) equal `w` (ASCII) case-insensitively. */
  private def equalsCI(s: Array[Byte], from: Int, to: Int, w: String): Boolean = {
    if (to - from != w.length) return false
    var i = 0
    while (i < w.length) {
      var c = s(from + i) & 0xff
      if (c >= 'A' && c <= 'Z') c += 32
      if (c != w.charAt(i)) return false
      i += 1
    }
    true
  }

  private def matchesCI(s: Array[Byte], n: Int, at: Int, w: String): Boolean =
    at + w.length <= n && equalsCI(s, at, at + w.length, w)

  // ---- the goahead(end=True) loop, links-only -------------------------------

  /** Hrefs of every `a` start/startend tag in document order; `start` from
    * [[eligibleStart]]. Mirrors `HtmlTokenizer.parse` with a links-only
    * callback (wantsData=false, wantsAllTags=false, tagFilter=="a").
    */
  def scan(raw: Array[Byte], start: Int): List[String] = {
    val n = raw.length
    val links = List.newBuilder[String]
    var cdataName: String = null // "script" | "style" | null
    val ar = new AttrB

    def decodeValue(s0: Int, e0: Int): String = {
      var s = s0
      var e = e0
      if (e - s >= 2) {
        val c0 = raw(s) & 0xff
        val c1 = raw(e - 1) & 0xff
        if ((c0 == '\'' && c1 == '\'') || (c0 == '"' && c1 == '"')) { s += 1; e -= 1 }
      }
      if (e == s) ""
      else Entities.unescape(new String(raw, s, e - s, StandardCharsets.UTF_8))
    }

    def checkForWholeStartTag(i: Int): Int = {
      val j = startTagEnd(raw, n, i)
      val next = if (j < n) raw(j) & 0xff else 0
      if (j < n && next == '>') return j + 1
      if (j < n && next == '/') {
        if (startsWithAscii(raw, n, j, "/>")) return j + 2
        return -1
      }
      if (j >= n) return -1
      if (isLetter(next) || next == '=' || next == '/') return -1
      if (j > i) return j
      -1
    }

    def parseStarttag(i: Int): Int = {
      val endpos = checkForWholeStartTag(i)
      if (endpos < 0) return endpos
      val tf = tagFind(raw, n, i + 1) // first char is a letter per caller
      var k = tf.toInt
      val nameEnd = (tf >>> 32).toInt
      // links-only tag classification (ASCII-ci; a non-ASCII tag name can
      // never lowercase to "a"/"script"/"style")
      val nameLen = nameEnd - (i + 1)
      val isA = nameLen == 1 && { val c = raw(i + 1) & 0xff; c == 'a' || c == 'A' }
      val isScript = !isA && nameLen == 6 && equalsCI(raw, i + 1, nameEnd, "script")
      val isStyle = !isA && !isScript && nameLen == 5 && equalsCI(raw, i + 1, nameEnd, "style")
      if (!isA && !isScript && !isStyle) return endpos // wantsAllTags=false skip
      var href: String = null
      var hasHref = false
      var attrsDone = false
      while (k < endpos && !attrsDone) {
        if (!attrFind(raw, n, k, ar)) attrsDone = true
        else {
          if (isA && equalsCI(raw, ar.nameStart, ar.nameEnd, "href")) {
            hasHref = true
            href = if (ar.hasValue) decodeValue(ar.valStart, ar.valEnd) else ""
          }
          k = ar.end
        }
      }
      // endText = pyStrip(raw[min(k,endpos)..endpos)) must be ">" or "/>"
      var a = math.min(k, endpos)
      var b = endpos
      while (a < b && isWs(raw(a) & 0xff)) a += 1
      while (b > a && isWs(raw(b - 1) & 0xff)) b -= 1
      val len = b - a
      val isGt = len == 1 && (raw(a) & 0xff) == '>'
      val isSlashGt = len == 2 && (raw(a) & 0xff) == '/' && (raw(a + 1) & 0xff) == '>'
      if (!isGt && !isSlashGt) return endpos // data event (ignored)
      if (isA && hasHref) links += href // startEndTag delegates to startTag
      if (isGt && (isScript || isStyle)) cdataName = if (isScript) "script" else "style"
      endpos
    }

    def parseBogusComment(i: Int): Int = {
      val pos = findByte(raw, n, '>', i + 2)
      if (pos == -1) return -1
      pos + 1 // comment event ignored
    }

    /** endtagfind lookingAt at i → packed (nameStart, nameEnd) or -1. */
    def endtagName(i: Int): Long = {
      if (!startsWithAscii(raw, n, i, "</")) return -1L
      var q = i + 2
      while (q < n && isWs(raw(q) & 0xff)) q += 1
      if (q >= n || !isLetter(raw(q) & 0xff)) return -1L
      val ns = q
      q += 1
      while (q < n && isEndNameCh(raw(q) & 0xff)) q += 1
      val ne = q
      while (q < n && isWs(raw(q) & 0xff)) q += 1
      if (q < n && (raw(q) & 0xff) == '>') (ns.toLong << 32) | ne.toLong else -1L
    }

    def parseEndtag(i: Int): Int = {
      val gt = findByte(raw, n, '>', i + 1)
      if (gt < 0) return -1
      val gtpos = gt + 1
      val em = endtagName(i)
      if (em < 0L) {
        if (cdataName != null) return gtpos // data event ignored
        if (i + 2 < n && isLetter(raw(i + 2) & 0xff)) {
          val tf = tagFind(raw, n, i + 2) // matches: first char is a letter
          val gt2 = findByte(raw, n, '>', tf.toInt)
          return gt2 + 1 // endTag event ignored; mirrors the char path
        }
        if (startsWithAscii(raw, n, i, "</>")) return i + 3
        return parseBogusComment(i)
      }
      val ns = (em >>> 32).toInt
      val ne = em.toInt
      if (cdataName != null && !equalsCI(raw, ns, ne, cdataName))
        return gtpos // data event ignored
      cdataName = null // endTag event ignored
      gtpos
    }

    /** `--[ws]*>` find from i+4 (regex find ≡ first "--" whose ws*> follows). */
    def parseComment(i: Int): Int = {
      var j = i + 4
      while (j >= 0) {
        // first "--" at or after j
        var d = findByte(raw, n, '-', j)
        while (d >= 0 && (d + 1 >= n || (raw(d + 1) & 0xff) != '-'))
          d = findByte(raw, n, '-', d + 1)
        if (d < 0) return -1
        var q = d + 2
        while (q < n && isWs(raw(q) & 0xff)) q += 1
        if (q < n && (raw(q) & 0xff) == '>') return q + 1 // comment ignored
        j = d + 1
      }
      -1
    }

    def parsePi(i: Int): Int = {
      val pos = findByte(raw, n, '>', i + 2)
      if (pos == -1) return -1
      pos + 1 // pi event ignored
    }

    def parseMarkedSection(i: Int): Int = {
      // declnameMatch lookingAt at i+3: [a-zA-Z][-_.a-zA-Z0-9]*[ws]*
      var q = i + 3
      if (q >= n || !isLetter(raw(q) & 0xff)) return parseBogusComment(i)
      val ns = q
      q += 1
      while (q < n && isDeclNameCh(raw(q) & 0xff)) q += 1
      val ne = q
      val doubleClose = equalsCI(raw, ns, ne, "temp") || equalsCI(raw, ns, ne, "cdata") ||
        equalsCI(raw, ns, ne, "ignore") || equalsCI(raw, ns, ne, "include") ||
        equalsCI(raw, ns, ne, "rcdata")
      // find `][ws]*][ws]*>` (or `][ws]*>`) from i+3
      var j = i + 3
      while (true) {
        j = findByte(raw, n, ']', j)
        if (j < 0) return -1
        var q2 = j + 1
        while (q2 < n && isWs(raw(q2) & 0xff)) q2 += 1
        if (doubleClose) {
          if (q2 < n && (raw(q2) & 0xff) == ']') {
            q2 += 1
            while (q2 < n && isWs(raw(q2) & 0xff)) q2 += 1
            if (q2 < n && (raw(q2) & 0xff) == '>') return q2 + 1 // unknownDecl ignored
          }
        } else if (q2 < n && (raw(q2) & 0xff) == '>') return q2 + 1
        j += 1
      }
      -1 // unreachable
    }

    def parseHtmlDeclaration(i: Int): Int = {
      if (startsWithAscii(raw, n, i, "<!--")) parseComment(i)
      else if (startsWithAscii(raw, n, i, "<![")) parseMarkedSection(i)
      else if (i + 9 <= n && equalsCI(raw, i, i + 9, "<!doctype")) {
        val gtpos = findByte(raw, n, '>', i + 9)
        if (gtpos == -1) -1 else gtpos + 1 // decl ignored
      } else parseBogusComment(i)
    }

    /** `</[ws]*<cdataName>` CASE_INSENSITIVE find from `from` → match start. */
    def findCdataClose(from: Int): Int = {
      var j = from
      while (j >= 0) {
        var d = findByte(raw, n, '<', j)
        while (d >= 0 && (d + 1 >= n || (raw(d + 1) & 0xff) != '/'))
          d = findByte(raw, n, '<', d + 1)
        if (d < 0) return -1
        var q = d + 2
        while (q < n && isWs(raw(q) & 0xff)) q += 1
        if (matchesCI(raw, n, q, cdataName)) return d
        j = d + 1
      }
      -1
    }

    var i = start
    var break2 = false
    while (i < n && !break2) {
      var j = 0
      if (cdataName == null) {
        j = findByte(raw, n, '<', i)
        if (j < 0) j = n
      } else {
        val m = findCdataClose(i)
        if (m >= 0) j = m
        else { break2 = true; j = i } // unterminated cdata: rest dropped
      }
      if (!break2) {
        i = j // data event ignored
        if (i < n) {
          var k = i + 1 // defensive; raw(i)=='<' here by construction
          if ((raw(i) & 0xff) == '<') {
            if (i + 1 < n && isLetter(raw(i + 1) & 0xff)) k = parseStarttag(i)
            else if (startsWithAscii(raw, n, i, "</")) k = parseEndtag(i)
            else if (startsWithAscii(raw, n, i, "<!--")) k = parseComment(i)
            else if (startsWithAscii(raw, n, i, "<?")) k = parsePi(i)
            else if (startsWithAscii(raw, n, i, "<!")) k = parseHtmlDeclaration(i)
            else k = i + 1 // lone '<' → data("<") ignored
            if (k < 0) {
              // end=True recovery: skip to next '>' (incl.) or '<'
              k = findByte(raw, n, '>', i + 1)
              if (k < 0) {
                k = findByte(raw, n, '<', i + 1)
                if (k < 0) k = i + 1
              } else k += 1
              // recovered text is a data event — ignored
            }
          }
          i = k
        }
      }
    }
    links.result()
  }
}
