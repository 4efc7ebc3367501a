package graft.synth

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.html.HtmlExtract

/** Pins the closed-form invariants [[graft.OracleSiteSql]] compiles into its
  * DuckDB twins against the REAL engine output (SiteGen html → HtmlExtract),
  * so a drift in SiteGen's draw stream or the extractor's text contract
  * breaks `sbt test` here, not just the driver's oracle gate:
  *
  *   n_links(i)  = outDegree + dup + off (+ mailto when draw(i,51) ≡ 0 mod 8)
  *   text_len(i) = 92 + 2·digits(i) + Σ wordlen(draw(i,100+k) mod-31b mod 13)
  *                 (+1 for the mailto anchor text)
  *   epoch-2 candidates(i) = BFS/long-jump targets with the form-2 query
  *                 variant surviving cleaning, everything else → plain URL,
  *                 plus the dup anchor's plain URL
  */
class OracleSiteSpec extends AnyFunSuite {

  private val Domain = "example.com"
  private val Hosts = 4
  private val N = 300L
  private val OutDegree = 8
  private val Seed = 42L

  // splitmix64 twin of SiteGen.draw (the stream OracleSiteSql emulates in SQL)
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private def draw(i: Long, k: Int): Long =
    mix64(mix64(Seed ^ (i * 0xd1342543de82ef95L)) + k)

  private val WordLens = Array(5, 5, 4, 5, 5, 8, 4, 4, 4, 5, 5, 4, 5)

  private def html(i: Long): Array[Byte] =
    SiteGen.buildHtml(Domain, Hosts, N, OutDegree, Seed, i)
      .getBytes(StandardCharsets.UTF_8)

  test("n_links and text_len match the closed form OracleSiteSql compiles") {
    for (i <- 0L until N) {
      val bytes = html(i)
      val links = HtmlExtract.extractLinks(bytes)
      val text = HtmlExtract.extractText(bytes)
      val mailto = if ((draw(i, 51) & 7) == 0) 1 else 0
      val wsum = (0 until 12)
        .map(k => WordLens(((draw(i, 100 + k) & 0x7fffffff) % 13).toInt)).sum
      assert(links.size === OutDegree + 2 + mailto, s"n_links page $i")
      assert(text.length === 92 + 2 * i.toString.length + wsum + mailto,
        s"text_len page $i")
    }
  }

  test("epoch-2 candidate set matches the depth-3 oracle's slot replay") {
    def pageUrl(j: Long) = SiteGen.pageUrl(Domain, Hosts, j)
    for (i <- 0L until 64L) {
      // ground truth: extract → resolve → clean → scheme+domain gates, the
      // engine's own per-page pipeline (PyUrl twins of crawler.py)
      val base = pageUrl(i)
      val engine = HtmlExtract.extractLinks(html(i)).flatMap { href =>
        val joined = graft.url.PyUrl.urljoin(base, href)
        val cleaned = graft.url.PyUrl.cleanUrl(joined)
        val scheme = graft.url.PyUrl.scheme(cleaned)
        if ((scheme == "http" || scheme == "https") &&
          graft.url.PyUrl.inDomain(cleaned, Domain)) Some(cleaned) else None
      }.toSet
      // oracle replay (OracleSiteSql.crawlVisited's slot CTE)
      val replay = ((0 until OutDegree).map { d =>
        val r = draw(i, d)
        val target =
          if (d < OutDegree / 2) (2 * i + d + 1) % N
          else (r & 0x7fffffffffffffffL) % N
        if ((r >>> 8) % 10 == 2) s"${pageUrl(target)}?ref=$i" else pageUrl(target)
      } :+ pageUrl((2 * i + 1) % N)).toSet
      assert(engine === replay, s"candidates page $i")
    }
  }
}
