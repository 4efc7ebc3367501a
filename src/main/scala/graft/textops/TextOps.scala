package graft.textops

/** Pure text-analysis kernels for the training-data pipeline operators
  * (builder-prompt mandate): language-ID, quality scoring, shingling,
  * MinHash, SimHash, rolling-hash fingerprinting. All deterministic, all
  * driven from Catalyst expressions in [[TextExpressions]].
  */
object TextOps {

  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  @inline def hashString(s: String, seed: Long): Long = {
    var h = 0xcbf29ce484222325L ^ seed
    var i = 0
    while (i < s.length) { h ^= s.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
    mix64(h)
  }

  def whitespaceTokens(text: String): Array[String] =
    text.split("\\s+").filter(_.nonEmpty)

  // --- language ID (n-gram/stopword heuristic) -------------------------------
  private val stopwords: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "a", "in", "is", "it", "that", "for",
      "on", "with", "as", "this", "was", "are", "be", "at", "by", "not"),
    "fr" -> Set("le", "la", "les", "de", "des", "du", "et", "en", "un", "une",
      "est", "que", "qui", "dans", "pour", "sur", "avec", "pas", "au", "ce"),
    "de" -> Set("der", "die", "das", "und", "ist", "in", "den", "von", "zu",
      "mit", "sich", "des", "auf", "für", "im", "dem", "nicht", "ein", "eine", "als"),
    "es" -> Set("el", "la", "los", "las", "de", "y", "en", "un", "una", "es",
      "que", "del", "se", "por", "con", "para", "su", "al", "lo", "como"))

  /** Heuristic language guess: CJK char ratio → zh; else argmax stopword-hit
    * ratio over {en,fr,de,es}; ties/no-hits → "und" (undetermined).
    */
  def langId(text: String): String = {
    if (text.isEmpty) return "und"
    var cjk = 0
    var letters = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (Character.isLetter(c)) {
        letters += 1
        val b = Character.UnicodeBlock.of(c)
        if (b == Character.UnicodeBlock.CJK_UNIFIED_IDEOGRAPHS ||
          b == Character.UnicodeBlock.HIRAGANA || b == Character.UnicodeBlock.KATAKANA ||
          b == Character.UnicodeBlock.HANGUL_SYLLABLES) cjk += 1
      }
      i += 1
    }
    if (letters > 0 && cjk.toDouble / letters > 0.25) return "zh"
    val toks = whitespaceTokens(text.toLowerCase(java.util.Locale.ROOT))
    if (toks.isEmpty) return "und"
    var best = "und"
    var bestHits = 0
    for ((lang, sw) <- stopwords.toSeq.sortBy(_._1)) {
      val hits = toks.count(sw.contains)
      if (hits > bestHits) { bestHits = hits; best = lang }
    }
    if (bestHits == 0) "und" else best
  }

  // --- quality scoring --------------------------------------------------------
  /** (n_chars, n_tokens, mean_token_len·1000, punct_ratio·1000,
    * stopword_ratio·1000, digit_ratio·1000) — integer-scaled so outputs are
    * exactly comparable across engines.
    */
  def qualityStats(text: String): (Long, Long, Long, Long, Long, Long) = {
    val toks = whitespaceTokens(text)
    val nTok = toks.length.toLong
    var punct = 0L
    var digit = 0L
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (!Character.isLetterOrDigit(c) && !Character.isWhitespace(c)) punct += 1
      if (c >= '0' && c <= '9') digit += 1
      i += 1
    }
    val en = stopwords("en")
    val sw = toks.count(t => en.contains(t.toLowerCase(java.util.Locale.ROOT))).toLong
    val n = math.max(text.length.toLong, 1L)
    val nt = math.max(nTok, 1L)
    (text.length.toLong, nTok,
      toks.map(_.length.toLong).sum * 1000L / nt,
      punct * 1000L / n,
      sw * 1000L / nt,
      digit * 1000L / n)
  }

  /** Composite [0,1000] quality score (heuristic; deterministic). */
  def qualityScore(text: String): Long = {
    val (nChars, nTok, meanLen, punct, sw, digit) = qualityStats(text)
    var score = 500L
    if (nChars >= 100 && nChars <= 20000) score += 150
    if (nTok >= 20) score += 100
    if (meanLen >= 3000 && meanLen <= 9000) score += 100
    score += math.min(sw, 150L)
    score -= math.min(punct, 200L)
    score -= math.min(digit, 200L)
    math.max(0L, math.min(1000L, score))
  }

  // --- shingling / MinHash / SimHash -----------------------------------------
  /** Distinct hashed word-level k-shingles, sorted (set semantics). */
  def shingles(text: String, k: Int): Array[Long] = {
    val toks = whitespaceTokens(text.toLowerCase(java.util.Locale.ROOT))
    if (toks.length < k) {
      if (toks.isEmpty) return Array.empty
      return Array(hashString(toks.mkString(" "), 0L))
    }
    val out = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i + k <= toks.length) {
      var h = 0xcbf29ce484222325L
      var j = i
      while (j < i + k) {
        val t = toks(j)
        var c = 0
        while (c < t.length) { h ^= t.charAt(c).toLong; h *= 0x100000001b3L; c += 1 }
        h ^= ' '.toLong; h *= 0x100000001b3L
        j += 1
      }
      out.add(mix64(h))
      i += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var p = 0
    while (it.hasNext) { arr(p) = it.next(); p += 1 }
    arr
  }

  /** MinHash signature over a shingle set: sig(j) = min over shingles of
    * h_j(s) with h_j(s) = mix64(s ^ seed_j). Jaccard(A,B) ≈ fraction of
    * matching signature slots.
    */
  def minHash(sh: Array[Long], numHashes: Int): Array[Long] = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < sh.length) {
      var j = 0
      while (j < numHashes) {
        val h = mix64(sh(i) ^ (0x9E3779B97F4A7C15L * (j + 1)))
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    sig
  }

  /** 64-bit SimHash over word unigrams+bigrams. */
  def simHash(text: String): Long = {
    val toks = whitespaceTokens(text.toLowerCase(java.util.Locale.ROOT))
    val votes = new Array[Int](64)
    def vote(h: Long): Unit = {
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    var i = 0
    while (i < toks.length) {
      vote(hashString(toks(i), 1L))
      if (i + 1 < toks.length) vote(hashString(toks(i) + " " + toks(i + 1), 2L))
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Rabin-style polynomial rolling-hash fingerprint of the whole document
    * (base 257, mod 2^64) — cheap near-identity document id.
    */
  def rollingFingerprint(text: String): Long = {
    var h = 0L
    var i = 0
    while (i < text.length) { h = h * 257L + text.charAt(i).toLong; i += 1 }
    mix64(h)
  }

  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
