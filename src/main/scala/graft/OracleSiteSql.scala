package graft

import OracleHashSql.{mix64Ctes, ubxor, wrapMulBig, M64}

/** DuckDB SQL twins of the crawl-native queries over the deterministic
  * [[graft.synth.SiteGen]] site — the q_clean_urls "hand-compiled fixed
  * shapes" approach taken to its conclusion: SiteGen is a pure function of
  * (seed, page index) through a counter-based splitmix64 stream, and
  * [[OracleHashSql]] already emulates splitmix64 exactly in DuckDB HUGEINT
  * mod-2^64 arithmetic. So the per-page draw stream — word choices, mailto
  * coin, link targets, href forms — is re-derivable in SQL, which makes the
  * HTML-extraction query and the epoch loop itself hash-oracle-able:
  *
  *   - [[extractLinks]]: per-page link count and extracted-text length,
  *     closed-form from the draw stream (the bs4-get_text contract:
  *     concatenation of all character data, entities decoded, script raw
  *     text included — HtmlExtract.scala:6-16).
  *   - [[crawlVisited]]: the (epoch, url) visited table of a budget-free
  *     crawl from https://<domain>. Epoch 0 = the seed page; epoch 1 = the
  *     seed fanout; epoch 2 (depth 3) = the distinct cleaned in-domain links
  *     of the level-1 pages minus everything seen — target selection, href
  *     forms (fragment/relative/query-variant), the dup anchor, off-domain
  *     and mailto filtering, and the seen-dedup all replayed in SQL.
  *
  * Scale constants mirror SparkEntry.crawlPages: n = max(300, min(60000,
  * |events| / 5)) (events carries 10^6·sf rows); the seed fanout is
  * m = min(n, max(4·outDegree, min(4096, n / 8))) (SiteGen.pages:103-105).
  *
  * Fixed geometry compiled in (SiteGen.buildHtml, outDegree = 8, hosts = 4,
  * domain = "example.com", seed = 42):
  *   - links per body page: 8 structural + dup + off-domain
  *     (+ mailto when draw(i,51) ≡ 0 mod 8) — the script-embedded
  *     pseudo-anchor is CDATA and never parsed.
  *   - text length per body page: title "Page i" (5+d) + h1 "Page i of
  *     example.com" (20+d) + 12 filler words (draw-indexed lengths, 11
  *     single-space + one " & " separator = 14) + script text (31) +
  *     anchor texts t0..t7/dup/off (16+3+3) [+ "m" (1)]
  *     = 92 + 2·digits(i) + Σ wordlen + mailto.
  */
object OracleSiteSql {

  /** WORDS lengths in [[graft.synth.SiteGen]] order (café/naïve are BMP, so
    * Spark `length` == DuckDB `length` == code points).
    */
  private val WordLens = "[5,5,4,5,5,8,4,4,4,5,5,4,5]"

  private val MulConst = 0xd1342543de82ef95L // SiteGen per-page stream constant

  /** n (page count) and m (seed fanout) from the events row count. */
  private val scaleCtes =
    """nn AS (
      |  SELECT GREATEST(300, LEAST(60000, CAST(count(*) // 5 AS BIGINT))) AS n
      |  FROM events
      |), mm AS (
      |  SELECT n, LEAST(n, GREATEST(32, LEAST(4096, n // 8))) AS m FROM nn
      |)""".stripMargin

  /** Per-page splitmix base: pbm.z = mix64(seed ^ (i · MulConst mod 2^64)) —
    * the shared inner term of every draw(seed, i, k).
    */
  private def pageBaseCtes(seed: Long, pagesFrom: String): (String, String) = {
    val (mixDefs, mixLast) = mix64Ctes("pb", Seq("i"))
    val ctes =
      s"""pages_ AS ($pagesFrom),
         |pb AS (
         |  SELECT i, ${ubxor(s"${seed}::HUGEINT", wrapMulBig("CAST(i AS HUGEINT)", MulConst))} AS z
         |  FROM pages_
         |), ${mixDefs.mkString(",\n")}""".stripMargin
    (ctes, mixLast)
  }

  /** CASE url host for page index expression `i` (hosts = 4, apex = h0). */
  private def hostExpr(i: String): String =
    s"CASE WHEN ($i) % 4 = 0 THEN 'example.com' " +
      s"ELSE 'h' || CAST(CAST(($i) % 4 AS INTEGER) AS VARCHAR) || '.example.com' END"

  private def pageUrlExpr(i: String): String =
    s"'https://' || ${hostExpr(i)} || '/p/' || ($i)"

  /** Twin of q_extract_links: (url, n_links, text_len) per synthesized page
    * (n body pages + the seed page).
    */
  def extractLinks: String = {
    val (baseCtes, pbm) = pageBaseCtes(42L,
      "SELECT unnest(generate_series(0, (SELECT n - 1 FROM nn))) AS i")
    val (drawDefs, drawLast) = mix64Ctes("dk", Seq("i", "k"))
    s"""WITH $scaleCtes,
       |$baseCtes,
       |dk AS (
       |  SELECT i, k, ((z + k) % $M64) AS z
       |  FROM $pbm CROSS JOIN (SELECT unnest([51, 100, 101, 102, 103, 104, 105, 106, 107, 108, 109, 110, 111]) AS k)
       |), ${drawDefs.mkString(",\n")},
       |feat AS (
       |  SELECT i,
       |    max(CASE WHEN k = 51 AND z % 8 = 0 THEN 1 ELSE 0 END) AS mailto,
       |    sum(CASE WHEN k >= 100
       |      THEN $WordLens[CAST((z % 2147483648) % 13 AS INTEGER) + 1] ELSE 0 END) AS wsum
       |  FROM $drawLast GROUP BY i
       |), seedpage AS (
       |  SELECT 'https://example.com' AS url,
       |    CAST((SELECT m FROM mm) AS INTEGER) AS n_links,
       |    CAST(11 + (SELECT sum(1 + length(CAST(j AS VARCHAR)))
       |      FROM (SELECT unnest(generate_series(0, (SELECT m - 1 FROM mm))) AS j)) AS INTEGER) AS text_len
       |)
       |SELECT ${pageUrlExpr("i")} AS url,
       |  CAST(10 + mailto AS INTEGER) AS n_links,
       |  CAST(92 + 2 * length(CAST(i AS VARCHAR)) + wsum + mailto AS INTEGER) AS text_len
       |FROM feat
       |UNION ALL SELECT url, n_links, text_len FROM seedpage""".stripMargin
  }

  /** Twin of the budget-free maxEpochs-crawl visited table (epoch, url).
    * Epoch 2 replays SiteGen.buildHtml's link generation: for page i, slot
    * d < 4 targets (2i+d+1) mod n (BFS-local), d ≥ 4 targets
    * (draw(i,d) mod 2^63) mod n (long jump); href form = (draw(i,d)>>>8)
    * mod 10 — fragment (0) and relative (1) clean to the target URL, the
    * query variant (2) survives as url?ref=i, everything else is the plain
    * URL; plus the dup anchor at (2i+1) mod n. Off-domain and mailto links
    * never reach the frontier (domain/scheme gates). A target already
    * visited (index < m, or the seed) is deduped out.
    */
  def crawlVisited(maxEpochs: Int): String = {
    require(maxEpochs == 2 || maxEpochs == 3, s"unsupported maxEpochs $maxEpochs")
    val e01 =
      s"""SELECT CAST(0 AS INTEGER) AS epoch, 'https://example.com' AS url
         |UNION ALL
         |SELECT CAST(1 AS INTEGER) AS epoch, ${pageUrlExpr("j")} AS url
         |FROM (SELECT unnest(generate_series(0, (SELECT m - 1 FROM mm))) AS j)""".stripMargin
    if (maxEpochs == 2) s"WITH $scaleCtes\n$e01"
    else {
      val (baseCtes, pbm) = pageBaseCtes(42L,
        "SELECT unnest(generate_series(0, (SELECT m - 1 FROM mm))) AS i")
      val (drawDefs, drawLast) = mix64Ctes("dk", Seq("i", "k"))
      s"""WITH $scaleCtes,
         |$baseCtes,
         |dk AS (
         |  SELECT i, k, ((z + k) % $M64) AS z
         |  FROM $pbm CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS k)
         |), ${drawDefs.mkString(",\n")},
         |slot AS (
         |  SELECT i, k,
         |    CASE WHEN k < 4 THEN (2 * i + k + 1) % (SELECT n FROM nn)
         |         ELSE CAST((z % 9223372036854775808::HUGEINT) % CAST((SELECT n FROM nn) AS HUGEINT) AS BIGINT)
         |    END AS target,
         |    (z // 256) % 10 AS form
         |  FROM $drawLast
         |), cand AS (
         |  SELECT DISTINCT url FROM (
         |    SELECT CASE WHEN form = 2 THEN ${pageUrlExpr("target")} || '?ref=' || i
         |                ELSE ${pageUrlExpr("target")} END AS url,
         |      CASE WHEN form = 2 THEN FALSE
         |           ELSE target < (SELECT m FROM mm) END AS seen
         |    FROM slot
         |    UNION ALL
         |    SELECT ${pageUrlExpr("(2 * i + 1) % (SELECT n FROM nn)")} AS url,
         |      (2 * i + 1) % (SELECT n FROM nn) < (SELECT m FROM mm) AS seen
         |    FROM pages_
         |  ) WHERE NOT seen
         |)
         |$e01
         |UNION ALL SELECT CAST(2 AS INTEGER) AS epoch, url FROM cand""".stripMargin
    }
  }

  /** Twin of a BUDGETED depth-priority crawl's visited table (epoch, url) at
    * maxEpochs = 3 — the politeness window, deferral carry-over, and the
    * frontier PQ replayed INSIDE the epoch loop, not just standalone:
    *
    *   epoch 0: the seed page (budget ≥ 1).
    *   epoch 1: per-host top-`budget` of the seed fanout by (priority, url)
    *            — all priority 1, so pure url order; the rest defer at
    *            priority 1 (CrawlEngine.politenessSplit's two-phase window
    *            is exactly per-host row_number ≤ budget).
    *   epoch 2: frontier = deferred (p=1) ∪ (links of the epoch-1 FETCHED
    *            pages − visited, p=2), min-merged per url; per-host
    *            top-`budget` again — deferred URLs outrank new discoveries
    *            (O-9 depth priority), exercised because the budget binds.
    *
    * DuckDB VARCHAR ordering is binary like Spark's UTF8_BINARY, so the
    * (priority, url) ranks agree byte-for-byte.
    */
  def crawlBudgetVisited(budget: Int): String =
    budgetedCrawlSql(budget, disallowDigit = None)

  /** Twin of a budgeted depth-priority crawl that ALSO honours a per-host
    * robots.txt "Disallow: /p/<digit>" + "Crawl-delay" pair: page indexes
    * whose decimal string starts with `disallowDigit` are suppressed —
    * both their plain URLs and their ?ref= query variants, because
    * [[graft.robots.Robots.allowed]] matches on the PATH alone — and the
    * politeness cap is min(configured budget, crawl-delay budget), so pass
    * the EFFECTIVE per-host budget here.
    */
  def crawlRobotsVisited(effectiveBudget: Int, disallowDigit: String): String =
    budgetedCrawlSql(effectiveBudget, Some(disallowDigit))

  private def budgetedCrawlSql(budget: Int, disallowDigit: Option[String]): String = {
    val (baseCtes, pbm) = pageBaseCtes(42L, "SELECT i FROM s1")
    val (drawDefs, drawLast) = mix64Ctes("dk", Seq("i", "k"))
    def denied(idx: String): String = disallowDigit match {
      case Some(d) => s"CAST(($idx) AS VARCHAR) LIKE '$d%'"
      case None => "FALSE"
    }
    s"""WITH $scaleCtes,
       |fanout AS (
       |  SELECT j AS i, ${pageUrlExpr("j")} AS url, ${hostExpr("j")} AS host
       |  FROM (SELECT unnest(generate_series(0, (SELECT m - 1 FROM mm))) AS j)
       |  WHERE NOT (${denied("j")})
       |), ranked1 AS (
       |  SELECT i, url, host,
       |    row_number() OVER (PARTITION BY host ORDER BY url) AS r
       |  FROM fanout
       |), s1 AS (SELECT i, url, host FROM ranked1 WHERE r <= $budget),
       |defer1 AS (SELECT url, host FROM ranked1 WHERE r > $budget),
       |$baseCtes,
       |dk AS (
       |  SELECT i, k, ((z + k) % $M64) AS z
       |  FROM $pbm CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS k)
       |), ${drawDefs.mkString(",\n")},
       |slot AS (
       |  SELECT i, k,
       |    CASE WHEN k < 4 THEN (2 * i + k + 1) % (SELECT n FROM nn)
       |         ELSE CAST((z % 9223372036854775808::HUGEINT) % CAST((SELECT n FROM nn) AS HUGEINT) AS BIGINT)
       |    END AS target,
       |    (z // 256) % 10 AS form
       |  FROM $drawLast
       |), cand2 AS (
       |  -- links of the FETCHED epoch-1 pages, minus visited (seed ∪ s1) and
       |  -- minus robots-suppressed targets (path-only match: the ?ref query
       |  -- variant of a disallowed index is suppressed too); deferred targets
       |  -- are NOT visited — they merge below at min priority
       |  SELECT DISTINCT url, host FROM (
       |    SELECT CASE WHEN form = 2 THEN ${pageUrlExpr("target")} || '?ref=' || i
       |                ELSE ${pageUrlExpr("target")} END AS url,
       |      ${hostExpr("target")} AS host,
       |      CASE WHEN form = 2 THEN FALSE
       |           ELSE EXISTS (SELECT 1 FROM s1 WHERE s1.i = slot.target) END AS seen,
       |      ${denied("target")} AS denied
       |    FROM slot
       |    UNION ALL
       |    SELECT ${pageUrlExpr("(2 * i + 1) % (SELECT n FROM nn)")} AS url,
       |      ${hostExpr("(2 * i + 1) % (SELECT n FROM nn)")} AS host,
       |      EXISTS (SELECT 1 FROM s1
       |        WHERE s1.i = (2 * pages_.i + 1) % (SELECT n FROM nn)) AS seen,
       |      ${denied("(2 * pages_.i + 1) % (SELECT n FROM nn)")} AS denied
       |    FROM pages_
       |  ) WHERE NOT seen AND NOT denied
       |), frontier2 AS (
       |  SELECT url, host, min(priority) AS priority FROM (
       |    SELECT url, host, 1 AS priority FROM defer1
       |    UNION ALL SELECT url, host, 2 AS priority FROM cand2
       |  ) GROUP BY url, host
       |), fetch2 AS (
       |  SELECT url FROM (
       |    SELECT url,
       |      row_number() OVER (PARTITION BY host ORDER BY priority, url) AS r
       |    FROM frontier2) WHERE r <= $budget
       |)
       |SELECT CAST(0 AS INTEGER) AS epoch, 'https://example.com' AS url
       |UNION ALL SELECT CAST(1 AS INTEGER) AS epoch, url FROM s1
       |UNION ALL SELECT CAST(2 AS INTEGER) AS epoch, url FROM fetch2""".stripMargin
  }

  /** Twin of q_media_features' metadata projection: the synthetic corpus
    * assigns media type, dims, and duration as pure functions of doc_id
    * (MediaOps.synthesize), and the feature pass emits exactly one row per
    * blob with frames = the REAL decoded container frame count (video:
    * max(1, min(6, durationMs/500)) = 1 + (id mod 10)/2 for durations
    * 500..2750 ms) — so the oracle pins that every encoded JPEG/GIF/TIFF/
    * PNG/BMP/WAV/GFTV blob decodes through the real codec path and that the
    * GFTV container round-trips its frame count. (The pooled float features
    * are decoder output and deliberately not in the driver projection.)
    */
  def mediaFeatures(dim: Int, outW: Int, outH: Int): String =
    s"""SELECT doc_id,
       |  CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
       |       WHEN 1 THEN 'audio' ELSE 'video' END AS mediaType,
       |  CAST(CASE WHEN doc_id % 3 = 2
       |    THEN 1 + CAST(doc_id % 10 AS INTEGER) // 2 ELSE 1 END AS INTEGER) AS frames,
       |  CAST($dim AS INTEGER) AS featureDim,
       |  CAST($outW AS INTEGER) AS outWidth,
       |  CAST($outH AS INTEGER) AS outHeight
       |FROM documents""".stripMargin
}
