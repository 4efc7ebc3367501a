package graft

/** DuckDB SQL twins of the wrapping-64-bit hash kernels in
  * [[graft.textops.TextOps]] (FNV-1a fold, splitmix64 finalizer, MinHash,
  * SimHash, rolling fingerprint), used to promote the hash-sketch operators
  * from rows-only to full driver-oracle verification.
  *
  * DuckDB has no wrapping integer arithmetic (BIGINT/UBIGINT ops error on
  * overflow), so every value is carried as a non-negative HUGEINT in
  * [0, 2^64) and each op is emulated exactly:
  *
  *   - `x * c mod 2^64` for c < 2^63: direct HUGEINT multiply + mod (the
  *     product is < 2^127, inside HUGEINT range).
  *   - `x * c mod 2^64` for c >= 2^63 (splitmix64's two odd constants):
  *     split c into 32-bit halves — `(x*cl mod 2^64 + (x*ch mod 2^32)·2^32)
  *     mod 2^64` — so no intermediate exceeds 2^96.
  *   - `x ^ y`: round-trip through UBIGINT (values are always < 2^64).
  *   - `x >>> n`: integer division by 2^n (x is non-negative).
  *   - Java's SIGNED long compare/storage (MinHash `min`, final columns):
  *     subtract 2^64 above 2^63, then CAST to BIGINT.
  *
  * The corpus contract that makes the string side exact: `documents.text`
  * is ASCII (TESTDATA.md), so DuckDB code points == Java UTF-16 code units,
  * `lower()` == `toLowerCase(ROOT)`, and RE2 `\s` == Java `\s` on the
  * characters present. Spark's LSH band bucket is `xxhash64(band, slice)`;
  * the oracle groups by `(band, slice values)` directly — identical pair
  * sets absent 64-bit xxhash collisions (and exact verification disposes).
  */
object OracleHashSql {

  private[graft] val M64 = "18446744073709551616::HUGEINT" // 2^64

  private[graft] def unsigned(v: Long): String = java.lang.Long.toUnsignedString(v)

  /** x ^ y over [0,2^64) HUGEINTs, via UBIGINT. */
  private[graft] def ubxor(a: String, b: String): String =
    s"CAST(xor(CAST(($a) AS UBIGINT), CAST(($b) AS UBIGINT)) AS HUGEINT)"

  /** (a * c) mod 2^64 for 0 <= c < 2^63. */
  private[graft] def wrapMulSmall(a: String, c: Long): String =
    s"((($a) * ${c}::HUGEINT) % $M64)"

  /** (a * c) mod 2^64 for 2^63 <= c < 2^64, by 32-bit split of c. */
  private[graft] def wrapMulBig(a: String, c: Long): String = {
    val ch = c >>> 32
    val cl = c & 0xffffffffL
    val lo = wrapMulSmall(a, cl)
    val hi = s"(((($a) * ${ch}::HUGEINT) % 4294967296::HUGEINT) * 4294967296::HUGEINT)"
    s"(($lo + $hi) % $M64)"
  }

  /** splitmix64 finalizer ([[graft.textops.TextOps.mix64]]) as a CTE chain
    * over a HUGEINT column `z` of `src`, carrying `carry` columns; returns
    * (cte definitions, final cte name). A chain — not textual nesting —
    * because each xor-shift step references z twice.
    */
  private[graft] def mix64Ctes(src: String, carry: Seq[String]): (Seq[String], String) = {
    val steps = Seq(
      s"((z + ${unsigned(0x9e3779b97f4a7c15L)}::HUGEINT) % $M64)",
      ubxor("z", "z // 1073741824"), // z ^ (z >>> 30)
      wrapMulBig("z", 0xbf58476d1ce4e5b9L),
      ubxor("z", "z // 134217728"), // z ^ (z >>> 27)
      wrapMulBig("z", 0x94d049bb133111ebL),
      ubxor("z", "z // 2147483648")) // z ^ (z >>> 31)
    val cols = (carry :+ "").mkString(", ")
    val defs = steps.zipWithIndex.map { case (step, i) =>
      val from = if (i == 0) src else s"${src}_m${i - 1}"
      s"${src}_m$i AS (SELECT $cols$step AS z FROM $from)"
    }
    (defs, s"${src}_m${steps.length - 1}")
  }

  /** FNV-1a fold over the characters of string expression `s`, seeded with
    * `init` ([[graft.textops.TextOps.hashString]] before the mix64 step).
    * The init is prepended to the char-code list so list_reduce uses it as
    * the accumulator seed; an empty string folds to init. The empty-string
    * guard matters: DuckDB `string_split('', '')` is `['']` and
    * `unicode('')` is -1, so an unguarded fold would xor in a phantom -1
    * (and error on the UBIGINT cast) instead of folding nothing.
    */
  private def fnvFold(init: Long, s: String): String =
    s"list_reduce(list_prepend(${unsigned(init)}::HUGEINT, " +
      s"CASE WHEN $s = '' THEN CAST([] AS HUGEINT[]) " +
      s"ELSE list_transform(string_split($s, ''), c -> CAST(unicode(c) AS HUGEINT)) END), " +
      s"(a, b) -> ${wrapMulSmall(ubxor("a", "b"), 0x100000001b3L)})"

  /** [0,2^64) HUGEINT column `z` reinterpreted as Java's signed long. */
  private val toSigned =
    s"CAST(CASE WHEN z >= 9223372036854775808::HUGEINT THEN z - $M64 ELSE z END AS BIGINT)"

  private val fnvBasis = 0xcbf29ce484222325L

  /** Whitespace tokenization of lowered text — the SQL twin of
    * `TextOps.whitespaceTokens(text.toLowerCase(ROOT))` (exact on ASCII).
    */
  private val toksCte =
    """toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS toks
      |  FROM documents
      |)""".stripMargin

  /** MinHash signature seeds: seed_j = golden-ratio constant × (j+1),
    * wrapping ([[graft.textops.TextOps.minHash]]); band = j / rowsPerBand.
    */
  private def seedsValues(numHashes: Int, rowsPerBand: Int): String = {
    val rows = (0 until numHashes).map { j =>
      s"($j, ${j / rowsPerBand}, ${unsigned(0x9e3779b97f4a7c15L * (j + 1))}::HUGEINT)"
    }.mkString(", ")
    s"(VALUES $rows) AS seeds(j, band, seed)"
  }

  /** Twin of `Dedup.minHashLsh(documents, "doc_id", "text", shingleK=3,
    * numHashes, bands, threshold, maxBucketSize)` — shingle → MinHash →
    * band buckets → candidate pairs (with the hot-bucket chain cap: buckets
    * over `maxBucketSize` emit only consecutive-id pairs, exactly
    * `Dedup.bucketPairs`' deterministic row_number-by-id chain) → exact
    * Jaccard → threshold.
    */
  def minHashLsh(shingleK: Int, numHashes: Int, bands: Int, threshold: Double,
      maxBucketSize: Int = 4096): String = {
    val rowsPerBand = numHashes / bands
    // k-shingle strings: the Scala loop hashes each token's chars then a
    // space, so the fold input is "t_i t_{i+1} t_{i+2} " (trailing space);
    // the <k-token fallback is hashString(mkString(" "), 0) — no trailer.
    val shingleJoin = (0 until shingleK).map(o => s"toks[i+$o]").mkString(" || ' ' || ")
    val (mixDefs, mixLast) = mix64Ctes("shp", Seq("doc_id"))
    val (seedMixDefs, seedMixLast) = mix64Ctes("hseed", Seq("doc_id", "j", "band"))
    s"""WITH $toksCte, shstr AS (
       |  SELECT doc_id, unnest(CASE WHEN len(toks) >= $shingleK THEN
       |      list_transform(generate_series(1, len(toks) - ${shingleK - 1}),
       |        i -> $shingleJoin || ' ')
       |    WHEN len(toks) = 0 THEN [] ELSE [array_to_string(toks, ' ')] END) AS s
       |  FROM toks
       |), shp AS (
       |  SELECT doc_id, ${fnvFold(fnvBasis, "s")} AS z FROM shstr
       |), ${mixDefs.mkString(",\n")},
       |shash AS (
       |  SELECT DISTINCT doc_id, z AS sh FROM $mixLast
       |), hseed AS (
       |  SELECT doc_id, j, band, ${ubxor("sh", "seed")} AS z
       |  FROM shash CROSS JOIN ${seedsValues(numHashes, rowsPerBand)}
       |), ${seedMixDefs.mkString(",\n")},
       |sig AS (
       |  SELECT doc_id, j, band, min($toSigned) AS sv
       |  FROM $seedMixLast GROUP BY doc_id, j, band
       |), bandkey AS (
       |  SELECT doc_id, band, list(sv ORDER BY j) AS bk FROM sig GROUP BY doc_id, band
       |), sized AS (
       |  SELECT doc_id, band, bk,
       |    count(*) OVER (PARTITION BY band, bk) AS bsz,
       |    row_number() OVER (PARTITION BY band, bk ORDER BY doc_id) AS rk
       |  FROM bandkey
       |), pairs AS (
       |  SELECT DISTINCT a, b FROM (
       |    SELECT l.doc_id AS a, r.doc_id AS b
       |    FROM sized l JOIN sized r ON l.band = r.band AND l.bk = r.bk AND l.doc_id < r.doc_id
       |    WHERE l.bsz <= $maxBucketSize
       |    UNION ALL
       |    SELECT l.doc_id AS a, r.doc_id AS b
       |    FROM sized l JOIN sized r ON l.band = r.band AND l.bk = r.bk AND r.rk = l.rk + 1
       |    WHERE l.bsz > $maxBucketSize)
       |), shset AS (
       |  SELECT doc_id, list(sh) AS ss, count(*) AS n FROM shash GROUP BY doc_id
       |), scored AS (
       |  SELECT a, b,
       |    CAST(len(list_intersect(la.ss, lb.ss)) AS BIGINT) AS inter,
       |    la.n + lb.n - len(list_intersect(la.ss, lb.ss)) AS uni
       |  FROM pairs JOIN shset la ON la.doc_id = a JOIN shset lb ON lb.doc_id = b
       |)
       |SELECT a, b,
       |  CASE WHEN uni = 0 THEN 0.0 ELSE CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE) END AS jaccard
       |FROM scored
       |WHERE (CASE WHEN uni = 0 THEN 0.0 ELSE CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE) END) >= $threshold""".stripMargin
  }

  /** Twin of `Dedup.simHash(documents, "doc_id", "text", maxHamming)` —
    * unigram+bigram bit votes → 64-bit fingerprint → 4×16-bit chunk
    * buckets → candidate pairs → exact hamming. Docs with no tokens vote
    * nowhere and fingerprint to 0 (the LEFT JOIN coalesce).
    */
  def simHash(maxHamming: Int): String = {
    val (mixDefs, mixLast) = mix64Ctes("gramh", Seq("doc_id"))
    s"""WITH $toksCte, grams AS (
       |  SELECT doc_id, 1 AS seed, unnest(toks) AS g FROM toks
       |  UNION ALL
       |  SELECT doc_id, 2 AS seed, unnest(CASE WHEN len(toks) >= 2 THEN
       |      list_transform(generate_series(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i+1])
       |    ELSE [] END) AS g
       |  FROM toks
       |), gramh AS (
       |  SELECT doc_id, CASE WHEN seed = 1 THEN ${fnvFold(fnvBasis ^ 1L, "g")}
       |    ELSE ${fnvFold(fnvBasis ^ 2L, "g")} END AS z FROM grams
       |), ${mixDefs.mkString(",\n")},
       |bits AS (
       |  SELECT doc_id, b,
       |    sum(CASE WHEN (z // (1::HUGEINT << b)) % 2 = 1 THEN 1 ELSE 0 END) AS ones,
       |    count(*) AS n
       |  FROM $mixLast CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS b)
       |  GROUP BY doc_id, b
       |), fp AS (
       |  SELECT d.doc_id, coalesce(f.v, 0::HUGEINT) AS z
       |  FROM documents d LEFT JOIN (
       |    SELECT doc_id, sum(CASE WHEN 2 * ones > n THEN (1::HUGEINT << b) ELSE 0::HUGEINT END) AS v
       |    FROM bits GROUP BY doc_id) f ON d.doc_id = f.doc_id
       |), fps AS (
       |  SELECT doc_id, $toSigned AS sh, z FROM fp
       |), chunks AS (
       |  SELECT doc_id, c AS chunk_idx, (z // (1::HUGEINT << (16 * c))) % 65536 AS chunk
       |  FROM fps CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS c)
       |), pairs AS (
       |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
       |  FROM chunks l JOIN chunks r
       |    ON l.chunk_idx = r.chunk_idx AND l.chunk = r.chunk AND l.doc_id < r.doc_id
       |)
       |SELECT a, b, CAST(bit_count(xor(fa.sh, fb.sh)) AS INTEGER) AS hamming
       |FROM pairs JOIN fps fa ON fa.doc_id = a JOIN fps fb ON fb.doc_id = b
       |WHERE bit_count(xor(fa.sh, fb.sh)) <= $maxHamming""".stripMargin
  }

  /** Twin of `fingerprint(text)` ([[graft.textops.TextOps.rollingFingerprint]]):
    * base-257 rolling hash over the raw (un-lowered) text, then mix64 —
    * emitted as CTEs ending in `fpp(doc_id, fp64)` for composition into
    * q_lang_quality.
    */
  def fingerprintCtes: String = {
    val (mixDefs, mixLast) = mix64Ctes("roll", Seq("doc_id"))
    s"""roll AS (
       |  SELECT doc_id, list_reduce(list_prepend(0::HUGEINT,
       |    CASE WHEN text = '' THEN CAST([] AS HUGEINT[])
       |    ELSE list_transform(string_split(text, ''), c -> CAST(unicode(c) AS HUGEINT)) END),
       |    (a, b) -> ((a * 257::HUGEINT + b) % $M64)) AS z
       |  FROM documents
       |), ${mixDefs.mkString(",\n")},
       |fpp AS (SELECT doc_id, $toSigned AS fp64 FROM $mixLast)""".stripMargin
  }
}
