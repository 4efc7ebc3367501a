package graft.tools
import graft.html.HtmlExtract
import graft.synth.SiteGen
import graft.url.PyUrl

object MicroBench {
  def main(args: Array[String]): Unit = {
    val n = 20000
    val htmls = (0 until n).map(i =>
      SiteGen.buildHtml("example.com", 32, 1000000, 12, 42L, i.toLong)
        .getBytes("UTF-8")).toArray
    // warmup
    (0 until 5000).foreach(i => HtmlExtract.extract(htmls(i % n)))
    var t0 = System.nanoTime()
    var links = 0L
    htmls.foreach { h => links += HtmlExtract.extract(h)._1.size }
    val perPage = (System.nanoTime() - t0) / 1e3 / n
    println(f"MICRO extract 1-thread: $perPage%.1f us/page ($links links)")
    // concurrent threads over the same corpus
    val threads = sys.env.getOrElse("MICRO_THREADS", "32").toInt
    val counter = new java.util.concurrent.atomic.AtomicLong()
    t0 = System.nanoTime()
    val ts = (0 until threads).map { t =>
      val th = new Thread(() => {
        var i = t
        var acc = 0L
        while (i < n * 4) { acc += HtmlExtract.extractLinks(htmls(i % n)).size; i += threads }
        counter.addAndGet(acc)
      })
      th.start(); th
    }
    ts.foreach(_.join())
    val perCore = (System.nanoTime() - t0) / 1e3 / (n * 4) * threads
    println(f"MICRO extract $threads%d-thread: $perCore%.1f us-core/page (${counter.get()})")
    val base = "https://h7.example.com/p/12345"
    val hrefs = Array("/p/999", "../x?q=1#f", "https://h3.example.com/p/7")
    t0 = System.nanoTime()
    var m = 0
    (0 until 200000).foreach { i =>
      val j = PyUrl.urljoin(base, hrefs(i % 3))
      if (PyUrl.scheme(j) == "https") m += PyUrl.cleanUrl(j).length
    }
    println(f"MICRO url chain: ${(System.nanoTime() - t0) / 1e3 / 200000}%.2f us/link ($m)")
    // the engine's actual per-link kernel (fused + fast-path classified)
    (0 until 100000).foreach(i => PyUrl.resolveClean(base, hrefs(i % 3)))
    t0 = System.nanoTime()
    var m2 = 0
    (0 until 400000).foreach { i =>
      val c = PyUrl.resolveClean(base, hrefs(i % 3))
      if (c != null) m2 += c.length
    }
    println(f"MICRO resolveClean: ${(System.nanoTime() - t0) / 1e3 / 400000}%.2f us/link ($m2)")
  }
}
