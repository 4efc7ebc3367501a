package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Seen-sketch mode equivalence + the warm-up-gap regression: URLs fetched
  * BEFORE the bloom activates must still be covered by the sketch when it
  * does (ADVICE r1-high) — otherwise cyclic back-links re-enter the frontier
  * and produce duplicate (epoch, url) visits.
  */
class BloomModeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val domain = "example.com"
  private val n = 24

  /** Chain 0→1→…→n-1→0, every page also back-links to pages 0 and 1: one new
    * fetch per epoch, and every epoch re-proposes the earliest URLs.
    */
  private def cyclicPages: DataFrame = {
    def url(i: Int) = s"https://$domain/p/$i"
    (0 until n).map { i =>
      val html =
        s"""<a href="${url((i + 1) % n)}">next</a>
           |<a href="${url(0)}">home</a><a href="${url(1)}">one</a>""".stripMargin
      val bytes = html.getBytes("UTF-8")
      (url(i), new java.sql.Timestamp(1700000000000L), bytes,
        graft.html.HtmlExtract.extractText(bytes), "en")
    }.toDF("url", "warc_ts", "html", "text", "lang")
  }

  private def crawl(cfg: CrawlConfig): (Seq[(Int, String)], Seq[String]) = {
    val wh = Files.createTempDirectory("graft-bloommode-").toString
    val r = new CrawlEngine(spark, cfg).run(cyclicPages, s"https://$domain/p/0", wh)
    (r.trace.select("epoch", "url").as[(Int, String)].collect().toSeq,
      r.links.select("url").orderBy("url").as[String].collect().toSeq)
  }

  private lazy val plain = crawl(CrawlConfig(domain, numPartitions = 4,
    bloomMinSeen = Long.MaxValue, // sketch never activates…
    seenDedup = "anti")) // …and the authoritative check is the left_anti join

  test("bucket-local sorted-shard dedup ≡ plain anti-join (sketch off and on)") {
    // default seenDedup=bucketlocal: the authoritative check reads only the
    // SeenUrlStore shard files — never re-shuffles the cumulative seen set
    val noSketch = crawl(CrawlConfig(domain, numPartitions = 4,
      bloomMinSeen = Long.MaxValue)) // every candidate takes the store probe
    assert(noSketch == plain)
    val withSketch = crawl(CrawlConfig(domain, numPartitions = 4,
      bloomMinSeen = 4, bloomExpectedTotal = 1024)) // only maybe-seen rows probe
    assert(withSketch == plain)
  }

  test("periodic seen-shard compaction mid-crawl and across truncate-resume " +
    "keeps the trace exact") {
    val cfg = CrawlConfig(domain, numPartitions = 4, bloomMinSeen = 4,
      bloomExpectedTotal = 1024, seenCompactEvery = 2)
    // ~n epochs on the cyclic site ⇒ many compaction points
    val (trace, links) = crawl(cfg)
    assert((trace, links) == plain)
    // truncate past several compactions and resume: bases newer than the
    // resumed epoch are ignored (epoch-bounded reader) and the re-run
    // regenerates identical state
    val wh = Files.createTempDirectory("graft-seencompact-").toString
    new CrawlEngine(spark, cfg.copy(maxEpochs = 8))
      .run(cyclicPages, s"https://$domain/p/0", wh)
    new graft.snapshot.SnapshotStore(spark, wh).truncateAfter(3)
    val resumed = new CrawlEngine(spark, cfg).run(cyclicPages, s"https://$domain/p/0", wh)
    val got = (resumed.trace.select("epoch", "url").as[(Int, String)].collect().toSeq,
      resumed.links.select("url").orderBy("url").as[String].collect().toSeq)
    assert(got == plain)
    // compaction actually produced base files
    val buckets = new java.io.File(s"$wh/seenstore").listFiles()
    assert(buckets != null &&
      buckets.exists(d => d.isDirectory &&
        d.listFiles().exists(_.getName.startsWith("c"))), "no base files written")
  }

  test("resume with a changed seen-store bucket count rebuilds the index " +
    "from the authoritative parquet (trace exact)") {
    // the store's _meta.json records its bucket count; a resume under a
    // different count must NOT trust the mis-bucketed shards — the gate
    // clears and rebuilds from visited, and the crawl stays exact
    val wh = Files.createTempDirectory("graft-bucketchange-").toString
    new CrawlEngine(spark, CrawlConfig(domain, numPartitions = 4,
      seenStoreBuckets = 3, maxEpochs = 8))
      .run(cyclicPages, s"https://$domain/p/0", wh)
    new graft.snapshot.SnapshotStore(spark, wh).truncateAfter(5)
    val resumed = new CrawlEngine(spark, CrawlConfig(domain, numPartitions = 4,
      seenStoreBuckets = 7)).run(cyclicPages, s"https://$domain/p/0", wh)
    val got = (resumed.trace.select("epoch", "url").as[(Int, String)].collect().toSeq,
      resumed.links.select("url").orderBy("url").as[String].collect().toSeq)
    assert(got == plain)
  }

  test("warm-up: bloom activating mid-crawl never re-visits early URLs") {
    // activates around epoch 3; pages 0..2 were fetched before activation
    val (trace, links) = crawl(CrawlConfig(domain, numPartitions = 4,
      bloomMinSeen = 4, bloomExpectedTotal = 1024))
    val urls = trace.map(_._2)
    assert(urls.distinct.size == urls.size, "duplicate visits")
    assert((trace, links) == plain)
  }

  test("broadcast bloom auto-resizes when the crawl outgrows bloomExpectedTotal") {
    // 24 urls vs a sketch designed for 8: the resize branch must rebuild
    // from the full seen set (results stay exact) and the recorded capacity
    // must have grown past the configured expectation
    val wh = Files.createTempDirectory("graft-bloomresize-").toString
    val r = new CrawlEngine(spark, CrawlConfig(domain, numPartitions = 4,
      bloomMinSeen = 4, bloomExpectedTotal = 8))
      .run(cyclicPages, s"https://$domain/p/0", wh)
    val got = (r.trace.select("epoch", "url").as[(Int, String)].collect().toSeq,
      r.links.select("url").orderBy("url").as[String].collect().toSeq)
    assert(got == plain)
    val cap = new graft.snapshot.SnapshotStore(spark, wh)
      .latest().get.metrics("sketch_capacity")
    assert(cap > 8, s"sketch capacity never grew: $cap")
  }

  test("sharded shard-file probe ≡ broadcast probe ≡ plain anti-join") {
    val wh = Files.createTempDirectory("graft-bloomfile-").toString
    val r = new CrawlEngine(spark, CrawlConfig(domain, numPartitions = 4,
      bloomMinSeen = 4, bloomExpectedTotal = 1024, bloomShards = 8,
      bloomFileProbe = Some(true)))
      .run(cyclicPages, s"https://$domain/p/0", wh)
    val trace = r.trace.select("epoch", "url").as[(Int, String)].collect().toSeq
    val links = r.links.select("url").as[String].collect().sorted.toSeq
    assert((trace, links) == plain)
    // the sketch lives as per-bucket files, built executor-side
    val shardDir = new java.io.File(s"$wh/sketch")
    val shards = Option(shardDir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".bloom"))
    assert(shards.nonEmpty, "no shard files written")
  }

  test("cuckoo seen-sketch probe ≡ plain anti-join (north_star fallback wired)") {
    val (trace, links) = crawl(CrawlConfig(domain, numPartitions = 4,
      sketchKind = "cuckoo", bloomMinSeen = 4, bloomExpectedTotal = 1024))
    val urls = trace.map(_._2)
    assert(urls.distinct.size == urls.size, "duplicate visits")
    assert((trace, links) == plain)
  }

  test("saturated (degraded) cuckoo sketch still crawls exactly") {
    // expectedTotal 1 ⇒ 64-bucket filter saturates mid-crawl and degrades to
    // always-maybe; every row then takes the authoritative anti-join — the
    // trace must stay identical (correctness never rides on the sketch)
    val (trace, links) = crawl(CrawlConfig(domain, numPartitions = 4,
      sketchKind = "cuckoo", bloomMinSeen = 4, bloomExpectedTotal = 1))
    assert((trace, links) == plain)
  }

  test("BloomShardStore: no false negatives across delta merges; misses stay mostly false") {
    val dir = Files.createTempDirectory("graft-shardstore-").toString
    val store = new graft.sketch.BloomShardStore(dir, 8, 64L * 64, 4)
    val d1 = (0 until 300).map(i => s"https://a.com/$i").toDF("url")
    val d2 = (300 until 600).map(i => s"https://a.com/$i").toDF("url")
    store.mergeDelta(d1)
    store.mergeDelta(d2)
    val probed = store.probe((0 until 600).map(i => s"https://a.com/$i").toDF("url"), "url")
    assert(probed.filter(!probed("maybe_seen")).count() == 0, "false negative")
    val misses = store.probe(
      (0 until 500).map(i => s"https://other.org/$i").toDF("url"), "url")
    val fp = misses.filter(misses("maybe_seen")).count()
    assert(fp < 100, s"FPP implausibly high: $fp/500")
  }
}
