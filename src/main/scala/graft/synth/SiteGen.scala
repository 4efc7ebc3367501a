package graft.synth

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.html.HtmlExtract

/** Deterministic Common-Crawl-style site synthesis (FIXTURES.md §2): every
  * page is a pure function of (seed, page index) via a counter-based
  * splitmix64 stream — partition-count and partition-order independent, so
  * local[8] and local[32] see byte-identical input (the scaling-evidence
  * precondition, SURVEY.md §7.3 #4).
  *
  * Shape: `hosts` subdomains of `domain` (host 0 = the apex). Page i lives at
  * https://<host(i)>/p/i and links to `outDegree` targets (BFS-local + long
  * jumps) plus quirk links (fragments, queries, dups, off-domain, relative,
  * dead). `text` is generated with the engine's own extractor, whose
  * byte-equality to the stdlib oracle is proven by HtmlExtractSpec.
  */
object SiteGen {

  @inline private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** k-th draw of the per-page stream — pure in (seed, i, k). */
  @inline private def draw(seed: Long, i: Long, k: Int): Long =
    mix64(mix64(seed ^ (i * 0xd1342543de82ef95L)) + k)

  private def hostName(h: Int, domain: String): String =
    if (h == 0) domain else s"h$h.$domain"

  def pageUrl(domain: String, hosts: Int, i: Long): String =
    s"https://${hostName((i % hosts).toInt, domain)}/p/$i"

  private val WORDS = Array("lorem", "ipsum", "data", "spark", "crawl",
    "frontier", "page", "link", "café", "naïve", "query", "host", "graph")

  def buildHtml(domain: String, hosts: Int, n: Long, outDegree: Int,
      seed: Long, i: Long): String = {
    val sb = new StringBuilder(1024)
    sb ++= s"""<html><head><meta charset="utf-8"><title>Page $i</title></head><body><h1>Page $i of $domain</h1>"""
    // filler text with entities
    var k = 0
    sb ++= "<p>"
    while (k < 12) {
      sb ++= WORDS((draw(seed, i, 100 + k) & 0x7fffffff).toInt % WORDS.length)
      sb ++= (if (k == 5) " &amp; " else " ")
      k += 1
    }
    sb ++= "</p><script>var x = '<a href=/not-a-link>';</script>"
    // structural links
    var d = 0
    while (d < outDegree) {
      val r = draw(seed, i, d)
      val target =
        if (d < outDegree / 2) (i * 2 + d + 1) % n // BFS-local fanout
        else (r & 0x7fffffffffffffffL) % n // long jump
      val tUrl = pageUrl(domain, hosts, target)
      val form = (r >>> 8) % 10
      val href = form match {
        case 0 => s"$tUrl#frag$d" // fragment (stripped by CleanUrl)
        case 1 => // relative, only valid when same host
          if (target % hosts == i % hosts) s"/p/$target" else tUrl
        case 2 => s"$tUrl?ref=$i" // query variant (usually dead)
        case _ => tUrl
      }
      sb ++= s"""<a href="$href">t$d</a>"""
      d += 1
    }
    // quirks: dup of first link, off-domain, mailto
    sb ++= s"""<a href="${pageUrl(domain, hosts, (i * 2 + 1) % n)}">dup</a>"""
    sb ++= s"""<a href="https://ext${(draw(seed, i, 50) & 0xff)}.example.org/x/$i">off</a>"""
    if ((draw(seed, i, 51) & 7) == 0) sb ++= """<a href="mailto:a@b.c">m</a>"""
    sb ++= "</body></html>"
    sb.toString
  }

  /** The pages table (exact input_hint shape). Includes the seed page
    * https://<domain> (linking to a spread of early pages) and, optionally,
    * a robots.txt per host.
    */
  def pages(spark: SparkSession, domain: String, nPages: Long,
      hosts: Int = 8, outDegree: Int = 12, seed: Long = 42L,
      numPartitions: Int = 32, robotsBody: Option[String] = None): DataFrame = {
    import spark.implicits._
    require(hosts >= 1 && nPages >= 1)
    val baseTs = 1700000000000L
    val body = spark.range(0, nPages, 1, numPartitions).mapPartitions { it =>
      it.map { i =>
        val html = buildHtml(domain, hosts, nPages, outDegree, seed, i)
        val bytes = html.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        (pageUrl(domain, hosts, i),
          new java.sql.Timestamp(baseTs + i),
          bytes,
          HtmlExtract.extractText(bytes),
          if ((draw(seed, i, 60) & 3) == 0L) "fr" else "en")
      }
    }.toDF("url", "warc_ts", "html", "text", "lang")
    // wide seed fanout keeps BFS depth ~O(log) at bench scale
    val seedLinks = (0L until math.min(nPages, math.max(outDegree * 4L,
      math.min(4096L, nPages / 8))))
      .map(j => s"""<a href="${pageUrl(domain, hosts, j)}">s$j</a>""").mkString
    val seedHtml =
      s"""<html><head><meta charset="utf-8"><title>$domain</title></head><body>$seedLinks</body></html>"""
    val seedBytes = seedHtml.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val extra = Seq(
      (s"https://$domain", new java.sql.Timestamp(baseTs), seedBytes,
        HtmlExtract.extractText(seedBytes), "en")) ++
      robotsBody.toSeq.flatMap { rb =>
        (0 until hosts).map { h =>
          val rbytes = rb.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          (s"https://${hostName(h, domain)}/robots.txt",
            new java.sql.Timestamp(baseTs), rbytes, rb, "en")
        }
      }
    body.union(extra.toDF("url", "warc_ts", "html", "text", "lang"))
  }
}
