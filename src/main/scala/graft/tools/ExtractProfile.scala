package graft.tools

import graft.html.{HtmlEvents, HtmlExtract, HtmlTokenizer}
import graft.synth.SiteGen

/** Phase breakdown of the extraction hot path (the steady-kernel dominator):
  * bytes→String decode, exotic-whitespace scan, tokenizer passes in both
  * links-only and full-text mode. Single-threaded; pair with MicroBench for
  * the thread-scaling view.
  */
object ExtractProfile {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 20000
    val htmls = (0 until n).map(i =>
      SiteGen.buildHtml("example.com", 32, 1000000, 12, 42L, i.toLong)
        .getBytes("UTF-8")).toArray
    val totalBytes = htmls.map(_.length.toLong).sum

    def time(label: String, reps: Int)(work: () => Long): Unit = {
      (0 until 2).foreach(_ => work()) // warmup
      var best = Long.MaxValue
      var acc = 0L
      (0 until reps).foreach { _ =>
        val t0 = System.nanoTime()
        acc = work()
        best = math.min(best, System.nanoTime() - t0)
      }
      println(f"PROF $label%-22s ${best / 1e3 / n}%8.2f us/page  (acc=$acc)")
    }

    println(f"pages=$n bytes/page=${totalBytes / n}")
    time("decode", 5) { () =>
      var a = 0L; htmls.foreach(h => a += HtmlExtract.decode(h).length); a
    }
    val decoded = htmls.map(h => HtmlExtract.decode(h))
    time("exotic-ws-scan", 5) { () =>
      var a = 0L
      decoded.foreach(d => a += (if (HtmlTokenizer.hasExoticWsProbe(d)) 1 else 0))
      a
    }
    final class CountEvents(linksOnly: Boolean) extends HtmlEvents {
      var tags = 0L
      var hrefs = 0L
      override def wantsData: Boolean = !linksOnly
      override def wantsAllTags: Boolean = !linksOnly
      override def tagFilter(name: String): Boolean = name == "a"
      override def startTag(name: String, attrs: List[(String, Option[String])]): Unit = {
        tags += 1
        if (name == "a" && attrs.exists(_._1 == "href")) hrefs += 1
      }
    }
    time("tokenize-linksonly", 5) { () =>
      val c = new CountEvents(true)
      decoded.foreach(d => HtmlTokenizer.parse(d, c))
      c.hrefs
    }
    time("tokenize-fulltext", 3) { () =>
      val c = new CountEvents(false)
      decoded.foreach(d => HtmlTokenizer.parse(d, c))
      c.tags
    }
    time("extractLinks e2e", 5) { () =>
      var a = 0L; htmls.foreach(h => a += HtmlExtract.extractLinks(h).size); a
    }
    time("linksViaChars e2e", 5) { () =>
      var a = 0L; htmls.foreach(h => a += HtmlExtract.extractLinksViaChars(h).size); a
    }
    time("extract e2e", 3) { () =>
      var a = 0L; htmls.foreach(h => a += HtmlExtract.extract(h)._2.length); a
    }

    // threaded phase scaling: is the 32-thread ceiling the scan or the
    // decode's char[] traffic? (MicroBench gives only whole-pipeline.)
    def threaded(label: String, threads: Int)(work: Int => Long): Unit = {
      val counter = new java.util.concurrent.atomic.AtomicLong()
      val t0 = System.nanoTime()
      val ts = (0 until threads).map { t =>
        val th = new Thread(() => {
          var i = t
          var acc = 0L
          while (i < n * 2) { acc += work(i % n); i += threads }
          counter.addAndGet(acc)
        })
        th.start(); th
      }
      ts.foreach(_.join())
      val perCore = (System.nanoTime() - t0) / 1e3 / (n * 2) * threads
      println(f"PROF $label%-22s $perCore%8.2f us-core/page @${threads}t (${counter.get()})")
    }
    Seq(1, 32).foreach { t =>
      threaded(s"decode", t)(i => HtmlExtract.decode(htmls(i)).length.toLong)
      threaded(s"linksonly e2e", t)(i => HtmlExtract.extractLinks(htmls(i)).size.toLong)
    }
  }
}
