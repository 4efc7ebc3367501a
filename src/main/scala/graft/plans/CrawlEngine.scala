package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.html.htmlfns._
import graft.plans.planfns._
import graft.sketch.BloomSketch
import graft.snapshot.{BucketedPages, SnapshotStore}
import graft.snapshot.SnapshotStore.Snapshot
import graft.url.urlfns._

/** Engine configuration.
  *
  * @param domain          scope suffix (crawler.py:12; O-8 endswith filter)
  * @param budget          per-host per-epoch politeness budget (north_rule);
  *                        None ⇒ ∞ ⇒ reference-exact trace mode (§A.1)
  * @param numPartitions   explicit hash-partition count for frontier state
  * @param saltBuckets     pre-aggregation salt for the per-host budget window
  *                        (hot-host skew mitigation, SURVEY.md §4.3)
  * @param saltMinRows     below this frontier size the budget window runs
  *                        single-phase (one row_number per host): a frontier
  *                        this small cannot produce a window shuffle whose
  *                        skew matters, and the salted path costs a second
  *                        window shuffle + cache per epoch. Scale-adaptive —
  *                        driven by the measured frontier count, not a core
  *                        count. The fetch/defer SETS are identical either
  *                        way (the salted phase-1 top-K is provably a
  *                        superset of the exact per-host top-K).
  * @param bloomFpp        seen-sketch false-positive rate
  * @param bloomMinSeen    below this seen-set size, skip the sketch entirely
  *                        (the anti-join alone is cheaper). The sketch is
  *                        built lazily from the FULL visited set the first
  *                        time this threshold is crossed (and on resume), then
  *                        maintained with per-epoch deltas — so it always
  *                        covers every visited URL (no-false-negative
  *                        invariant).
  * @param bloomExpectedTotal broadcast-bloom design capacity; a crawl that
  *                        outgrows it triggers an automatic rebuild from the
  *                        full seen set at 2× the running estimate (FPP is
  *                        restored; correctness never depended on it — the
  *                        anti-join is authoritative)
  * @param bloomShards     url-hash buckets for the sharded file-backed sketch
  * @param bloomFileProbe  Some(true) forces the sharded shard-file probe
  *                        (the 10^10-scale path: no monolithic broadcast),
  *                        Some(false) forces the broadcast probe, None = auto
  *                        by sketch size vs bloomBroadcastMaxBytes
  * @param sketchKind      "bloom" (default) or "cuckoo" — the north_star's
  *                        cuckoo-filter fallback for the URL-seen set
  *                        ([[graft.sketch.SeenSketch]]: deletable membership;
  *                        saturation degrades to always-maybe, never a false
  *                        negative). Cuckoo is broadcast-only — the shard-file
  *                        store is bloom-format — so it forces the broadcast
  *                        probe regardless of bloomFileProbe.
  * @param seenDedup       "bucketlocal" (default): the authoritative
  *                        candidates−seen check runs against the
  *                        [[graft.sketch.SeenUrlStore]] sorted shard files —
  *                        bucket-local, no per-epoch re-shuffle of the
  *                        cumulative O(total-crawled) seen set, probe cost
  *                        tracks the CANDIDATES (BASELINE.md's "dedup is
  *                        bucket-local" accounting). The SUPPRESSED set rides
  *                        a second store under the same contract (url-keyed
  *                        epoch deltas, aligned probes), so robots crawls
  *                        stop paying two O(cumulative-suppressed) anti-join
  *                        shuffles per epoch. "anti": the plain `left_anti`
  *                        joins against the visited/suppressed tables (the
  *                        differential-test reference path).
  * @param seenStoreBuckets url-hash buckets for the seen/suppressed shard
  *                        stores; 0 ⇒ the session's shuffle-partition count
  *                        (`spark.sql.shuffle.partitions`) — candidates leave
  *                        their groupBy/distinct exchange partitioned
  *                        `pmod(hash(url), numShufflePartitions)`, which is
  *                        the store's own bucket function, so matching counts
  *                        make every store probe ZERO-exchange. Size so one
  *                        shard (total-seen × ~60 B / buckets) fits task
  *                        memory for the bulk-probe path (2^14 at 10^10).
  * @param seenCompactEvery every this many epochs, fold each bucket's seen
  *                        delta shards into one base file (DRUM-style merge;
  *                        probe cost stops growing with epoch count;
  *                        amortized O(seen/every) per epoch; deltas kept for
  *                        exact resume). ≤ 0 disables.
  * @param linksCompactFactor links is an append-only delta table whose
  *                        global distinct is taken at read; when its
  *                        cumulative row count grows past this factor × the
  *                        last compacted size, the epoch commit rewrites it
  *                        as distinct rows (SnapshotStore.compactDistinct) —
  *                        amortized O(total/factor) per epoch, so reads stop
  *                        paying an O(total-ever-appended) scan forever.
  *                        ≤ 0 disables.
  * @param linksCompactMinRows no compaction below this row count (small
  *                        crawls never pay the rewrite).
  */
final case class CrawlConfig(
    domain: String,
    budget: Option[Int] = None,
    numPartitions: Int = 32,
    saltBuckets: Int = 16,
    saltMinRows: Long = 100000L,
    bloomFpp: Double = 0.01,
    bloomMinSeen: Long = 100000L,
    bloomExpectedTotal: Long = 10000000L,
    bloomShards: Int = 32,
    bloomFileProbe: Option[Boolean] = None,
    sketchKind: String = "bloom",
    seenDedup: String = "bucketlocal",
    seenStoreBuckets: Int = 0,
    seenCompactEvery: Int = 64,
    linksCompactFactor: Double = 3.0,
    linksCompactMinRows: Long = 1000000L,
    bloomBroadcastMaxBytes: Long = 256L << 20,
    broadcastFetchMax: Long = 100000L,
    robotsBroadcastMax: Long = 100000L,
    depthPriority: Boolean = false,
    crawlDelayWindowSec: Double = 60.0,
    maxEpochs: Int = Int.MaxValue)

final case class CrawlResult(
    trace: DataFrame, // (epoch, url) — visit order = orderBy(epoch, url) (§A.1)
    links: DataFrame, // (url) — crawler.py all_links equivalent
    visited: DataFrame, // (epoch, url)
    epochs: Int,
    lastSnapshot: Snapshot) {

  /** O-11 parity sink (crawler.py:93-97): sorted unique links, one per
    * line, UTF-8, each line \n-terminated. Single-file output mirrors the
    * reference's links.txt. Note Spark string order is UTF-16 code-unit
    * order; BMP-only corpora make it equal to the reference's code-point
    * sort (SURVEY.md §2 O-11 caveat).
    */
  def saveLinks(path: String): Unit =
    links.orderBy("url").coalesce(1).write.mode("overwrite").text(path)

  /** O-13 trace sink: the "Analizzando:" sequence under the §A.1 canonical
    * order.
    */
  def saveTrace(path: String): Unit =
    trace.select("url").coalesce(1).write.mode("overwrite").text(path)

  /** Sharded links sink for web scale — the parity sink's single write task
    * cannot finish at 10^10 links. Range-partitioned on url and sorted
    * within each shard, so concatenating the part files in name order
    * reproduces the parity sink's bytes exactly (the documented
    * concatenation contract).
    */
  def saveLinksSharded(path: String, shards: Int): Unit =
    links.repartitionByRange(shards, col("url")).sortWithinPartitions("url")
      .write.mode("overwrite").text(path)

  /** Sharded trace sink — the same web-scale contract for the visit trace:
    * range-partitioned on the §A.1 canonical order (epoch, url) and sorted
    * within each shard, so concatenating part files in name order
    * reproduces [[saveTrace]]'s bytes exactly. (10^10 visited URLs cannot
    * funnel through the parity sink's single write task either.)
    */
  def saveTraceSharded(path: String, shards: Int): Unit =
    trace.repartitionByRange(shards, col("epoch"), col("url"))
      .sortWithinPartitions("epoch", "url")
      .select("url")
      .write.mode("overwrite").text(path)
}

object CrawlEngine {
  /** Python-str `<` = Unicode code-point order (crawler.py:94's sort). Spark
    * string sorts are already code-point order (UTF8_BINARY = UTF-8 byte
    * order — verified incl. astral plane), but Java's String ordering is
    * UTF-16 code-unit order, which differs above U+FFFF — so every
    * driver-side sort must use this ordering instead of `Ordering.String`.
    */
  def codePointCompare(a: String, b: String): Int = {
    var i = 0
    while (i < a.length && i < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(i)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca)
    }
    Integer.compare(a.length - i, b.length - i)
  }
  val codePointOrdering: Ordering[String] =
    (a: String, b: String) => codePointCompare(a, b)
}

/** Distributed level-synchronous BFS crawl over a pages table — the Spark
  * re-expression of crawler.py's worker loop (SURVEY.md §3.4). One epoch =
  * one deterministic job chain:
  *
  *   frontier(e) → politeness window (budget, salted two-phase)
  *              → fetch left-join pages on url
  *              → ExtractHrefs → explode → UrlResolve → scheme filter → CleanUrl
  *              → links delta (anti-join links)
  *              → in-domain filter → robots gate (broadcast)
  *              → ∪ deferred → bloom-prefiltered anti-join vs visited
  *              → frontier(e+1); snapshot commit
  *
  * State (visited / links / suppressed) is append-only parquet deltas under
  * the snapshot store; every epoch's outputs are written once and re-read
  * from disk, truncating lineage and making resume exact.
  */
final class CrawlEngine(spark: SparkSession, config: CrawlConfig) {
  import spark.implicits._

  private val P = config.numPartitions

  /** robots.txt rules per host, parsed once from the pages table. One row
    * per host: when both http://h/robots.txt and https://h/robots.txt exist,
    * the https body wins (then first-by-url) — duplicate host keys would
    * fan out the left join and let one URL take both the allowed and the
    * suppressed path.
    */
  def robotsTable(pages: DataFrame): DataFrame = {
    val raw = pages
      .filter(col("url").endsWith("/robots.txt"))
      .select(col("url"), col("html"))
      .as[(String, Array[Byte])]
    val parsed = raw.flatMap { case (url, html) =>
      if (html == null) None
      else {
        val p = graft.url.PyUrl.urlparse(url)
        if (p.path != "/robots.txt") None
        else {
          val body = new String(html, java.nio.charset.StandardCharsets.UTF_8)
          val parsed = graft.robots.Robots.parseAll(body)
          Some((graft.robots.Robots.hostKey(url), url,
            parsed.rules.map(_.prefix).toArray,
            parsed.rules.map(_.allow).toArray,
            parsed.crawlDelay))
        }
      }
    }.toDF("host", "src_url", "prefixes", "allows", "crawl_delay")
    parsed
      .withColumn("__r", row_number().over(Window.partitionBy("host")
        .orderBy(col("src_url").startsWith("https://").desc, col("src_url"))))
      .filter(col("__r") === 1)
      .select("host", "prefixes", "allows", "crawl_delay")
  }

  /** Per-host budget gate: salted two-phase top-K so one hot host cannot
    * serialize the window shuffle. Phase 1 ranks within (host, salt) — the
    * global per-host top-K is a subset of the per-salt top-Ks — phase 2
    * ranks the ≤ K·S survivors exactly. Returns (fetchNow, deferred).
    *
    * `delayBudgets` (host, delay_budget) — derived from robots crawl-delay
    * — tightens the per-host cap to min(configured, delay_budget); hosts
    * absent from it keep the configured budget (or no cap). The budget is a
    * per-host CONSTANT, so the salted phase-1 top-K remains a superset of
    * the exact per-host top-K.
    */
  private def politenessSplit(frontier: DataFrame,
      delayBudgets: Option[DataFrame],
      robotsCount: Long, frontierCount: Long): (DataFrame, DataFrame, Seq[DataFrame]) = {
    if (config.budget.isEmpty && delayBudgets.isEmpty)
      return (frontier, frontier.limit(0), Nil)
    // priority-queue order (O-9): (priority asc, url asc). Trace-match
    // mode uses constant priority, which degenerates to the SURVEY §A.1
    // lexicographic contract.
    val withB = delayBudgets match {
      case None =>
        frontier.withColumn("__b", lit(config.budget.get.toLong))
      case Some(db) =>
        val joined = frontier.join(
          if (robotsCount <= config.robotsBroadcastMax) broadcast(db)
          else db.repartition(P, col("host")),
          Seq("host"), "left")
        val delayCap = coalesce(col("delay_budget"), lit(Long.MaxValue))
        joined.withColumn("__b", config.budget
          .map(cb => least(delayCap, lit(cb.toLong))).getOrElse(delayCap))
          .drop("delay_budget")
    }
    if (frontierCount <= config.saltMinRows) {
      // single-phase: one exact per-host ranking. A frontier this small
      // cannot skew a window shuffle; the salted second phase would cost an
      // extra window shuffle + cache per epoch for nothing. The fetch/defer
      // sets are IDENTICAL to the salted path's (exact per-host top-K by
      // (priority, url) either way).
      val r = withB.withColumn("r",
        row_number().over(Window.partitionBy("host").orderBy("priority", "url")))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val fetchNow = r.filter(col("r") <= col("__b")).select("url", "host", "priority")
      val defer = r.filter(col("r") > col("__b")).select("url", "host", "priority")
      return (fetchNow, defer, Seq(r))
    }
    val salted = withB.withColumn(
      "salt", pmod(xxhash64(col("url")), lit(config.saltBuckets)))
    val r1 = salted.withColumn("r1",
      row_number().over(Window.partitionBy("host", "salt").orderBy("priority", "url")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val survivors = r1.filter(col("r1") <= col("__b"))
    val r2 = survivors.withColumn("r2",
      row_number().over(Window.partitionBy("host").orderBy("priority", "url")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val fetchNow = r2.filter(col("r2") <= col("__b")).select("url", "host", "priority")
    val defer = r1.filter(col("r1") > col("__b")).select("url", "host", "priority")
      .union(r2.filter(col("r2") > col("__b")).select("url", "host", "priority"))
    (fetchNow, defer, Seq(r1, r2))
  }

  /** candidates − seen, with the O-7b bloom fast path: `probe` adds a
    * `maybe_seen` flag (broadcast-sketch expression or sharded shard-file
    * lookup); !maybe_seen rows skip the authoritative check entirely.
    * `exactSeen` is the AUTHORITATIVE filter (rows NOT in the seen set):
    * either the bucket-local sorted-shard lookup (seenDedup=bucketlocal — no
    * O(seen) exchange) or the plain `left_anti` join (seenDedup=anti).
    * Exactness comes from `exactSeen` either way — the sketch only prunes.
    */
  private def dedupAgainst(candidates: DataFrame,
      exactSeen: DataFrame => DataFrame,
      probe: Option[DataFrame => DataFrame]): DataFrame = probe match {
    case None =>
      exactSeen(candidates)
    case Some(p) =>
      val flagged = p(candidates)
      val definitelyNew = flagged.filter(!col("maybe_seen")).drop("maybe_seen")
      val maybeSeen = exactSeen(flagged.filter(col("maybe_seen")).drop("maybe_seen"))
      definitelyNew.union(maybeSeen)
  }

  /** Single-seed form (crawler.py:13 — seed = https://domain). */
  def run(pages: DataFrame, seedUrl: String, warehouse: String): CrawlResult =
    run(pages, Seq(seedUrl), warehouse)

  def run(pages: DataFrame, seedUrls: Seq[String], warehouse: String): CrawlResult =
    runSource(() => pages, None, seedUrls, warehouse)

  /** Bucket-manifest pages source: each epoch's fetch join pre-selects data
    * files against the frontier's bucket set before spark.read — the scan
    * cost tracks the FRONTIER, not the corpus (the 100-TB fetch-join story;
    * BASELINE.md 10^10 accounting).
    */
  def run(pages: BucketedPages, seedUrl: String, warehouse: String): CrawlResult =
    run(pages, Seq(seedUrl), warehouse)

  def run(pages: BucketedPages, seedUrls: Seq[String], warehouse: String): CrawlResult =
    runSource(() => pages.full, Some(pages), seedUrls, warehouse)

  /** Run the crawl to fixpoint (≡ queue.join(), crawler.py:85) from a SEED
    * LIST (north_star: "given the same seed list"), committing a snapshot
    * per epoch under `warehouse`. Resumes from the newest valid snapshot if
    * one exists. Epoch-0 frontier = sorted distinct allowed seeds.
    *
    * `pagesPlain` is a THUNK: a bucketed run never materializes the
    * whole-table frame (whose spark.read eagerly lists every data file on
    * the driver — the manifest makes that listing unnecessary).
    */
  private def runSource(pagesPlain: () => DataFrame, bucketed: Option[BucketedPages],
      seedUrls: Seq[String], warehouse: String): CrawlResult = {
    lazy val pages: DataFrame = pagesPlain()
    val store = new SnapshotStore(spark, warehouse)
    require(config.seenDedup == "bucketlocal" || config.seenDedup == "anti",
      s"unknown seenDedup '${config.seenDedup}' (bucketlocal|anti)")
    val useSeenStore = config.seenDedup == "bucketlocal"
    // bucket count matches the session's shuffle partitioning by default:
    // candidates leave their distinct/groupBy exchange partitioned by
    // pmod(hash(url), numShufflePartitions) — the store's own bucket
    // function — so equal counts make every store probe zero-exchange
    val storeBuckets =
      if (config.seenStoreBuckets > 0) config.seenStoreBuckets
      else spark.sessionState.conf.numShufflePartitions
    val seenStore =
      if (useSeenStore)
        new graft.sketch.SeenUrlStore(s"$warehouse/seenstore", storeBuckets)
      else null
    // the suppressed set rides a second store under the same contract: its
    // two per-epoch consumers (newSuppressed − suppressedSoFar and the
    // frontier subtraction) were the last O(cumulative-state) anti-join
    // shuffles left in the epoch loop
    val suppressedStore =
      if (useSeenStore)
        new graft.sketch.SeenUrlStore(s"$warehouse/suppressedstore", storeBuckets)
      else null
    // url-only robots existence probe: parsing robots needs the html column,
    // and a predicate on url cannot row-group-prune an endsWith match — so a
    // corpus with NO robots.txt files would pay a full url+html scan just to
    // learn that. Probe the url column alone first (a few % of the bytes;
    // superset filter of robotsTable's exact path=="/robots.txt" check) and
    // parse only when candidates exist.
    // a bucket-manifest source narrows further: its robots-bucket stat was
    // computed at adoption with the SAME superset filter, so the probe job is
    // skipped entirely — the manifest already knows the answer
    val robotsSource = bucketed.map(_.robotsCandidates).getOrElse(pages)
    val robotsMayExist: Boolean = bucketed.flatMap(_.robotsBucketCount) match {
      case Some(c) => c > 0 // manifest stat — no probe job at all
      case None => robotsSource
        .filter(col("url").endsWith("/robots.txt")).select("url").count() > 0
    }
    val robots: DataFrame =
      if (!robotsMayExist) null
      else robotsTable(robotsSource).persist(StorageLevel.MEMORY_AND_DISK)
    // no robots rows (the common case) ⇒ the gate is a constant-true filter
    // and the whole suppression machinery is skipped (2 jobs/epoch saved)
    val robotsCount = if (robots == null) 0L else robots.count()
    val hasRobots = robotsCount > 0

    // robots crawl-delay → per-host politeness budget (SURVEY §1.2 schema):
    // delay d caps a host at max(1, int(window // d)) fetches per epoch with
    // CPython floordiv semantics (Robots.pyFloorDiv — floor(window/d) of the
    // ROUNDED double quotient is off by one for thousands of representable
    // delays). NaN needs the explicit isnan guard: Spark SQL orders NaN
    // greater than every value, so `NaN > 0.0` is TRUE here while Python's
    // `nan > 0` is False (no cap); +inf passes both and caps at 1.
    // Both run-start probes below only READ the materialized robots cache
    // and are independent — run them concurrently (guide §2.6), so a robots
    // crawl's setup pays max(two jobs), not their sum.
    val (delayBudgets, collectedRules): (Option[DataFrame],
        Map[String, Seq[graft.robots.Robots.Rule]]) =
      if (!hasRobots) (None, Map.empty)
      else {
        import scala.concurrent.{Await, Future}
        import scala.concurrent.ExecutionContext.Implicits.global
        import scala.concurrent.duration.Duration
        val dbF = Future {
          val db = robots
            .filter(col("crawl_delay") > 0.0 && !isnan(col("crawl_delay")))
            .select(col("host"),
              crawl_delay_budget(col("crawl_delay"), config.crawlDelayWindowSec)
                .as("delay_budget"))
            .persist(StorageLevel.MEMORY_AND_DISK)
          if (db.count() == 0) { db.unpersist(); None } else Some(db)
        }
        // Seed gating needs rules only for the SEED hosts — semi-join before
        // collecting, so a 10^8-host robots table never reaches the driver.
        val rulesF = Future {
          val seedHosts = seedUrls.map(graft.robots.Robots.hostKey).distinct.toDF("host")
          robots.join(broadcast(seedHosts), Seq("host"), "left_semi")
            .select("host", "prefixes", "allows")
            .as[(String, Array[String], Array[Boolean])].collect()
            .map { case (h, ps, as) =>
              h -> ps.zip(as).map { case (p, a) => graft.robots.Robots.Rule(p, a) }.toSeq
            }.toMap
        }
        (Await.result(dbF, Duration.Inf), Await.result(rulesF, Duration.Inf))
      }
    def seedAllowed(u: String): Boolean =
      graft.robots.Robots.allowed(u,
        collectedRules.getOrElse(graft.robots.Robots.hostKey(u), Nil))
    val (allowedSeeds, blockedSeeds) =
      seedUrls.distinct.sorted(CrawlEngine.codePointOrdering).partition(seedAllowed)

    var snapshot: Snapshot = null
    var frontier: DataFrame = null
    var epoch = 0

    store.latest() match {
      case Some(s) =>
        snapshot = s
        epoch = s.epoch + 1
        frontier = store.readTable(s, "frontier")
        if (useSeenStore) {
          val hconf = spark.sparkContext.hadoopConfiguration
          // resume gate: the store is only trusted when its metadata proves
          // it — bucket count matches AND its covered-epoch watermark reaches
          // the resumed snapshot (mere shard-file existence cannot
          // distinguish a valid index from one left by a different bucket
          // count or by epochs that ran with seenDedup=anti). Anything else
          // is cleared and rebuilt from the authoritative parquet, tagged
          // with the resume epoch so every later probe (upToEpoch ≥ s.epoch)
          // sees all of it.
          def syncStore(st: graft.sketch.SeenUrlStore, table: String): Unit = {
            if (s.tables(table).totalRows > 0 && !st.validFor(hconf, s.epoch)) {
              st.clear(hconf)
              st.writeDelta(store.readTable(s, table).select("url"), s.epoch)
            }
            // bases compacted by a LATER, now-truncated timeline would hide
            // the re-run's own deltas once it reaches the base's epoch —
            // bases are derived state, drop the stale ones
            st.dropBasesAbove(hconf, s.epoch)
          }
          syncStore(seenStore, "visited")
          syncStore(suppressedStore, "suppressed")
        }
      case None =>
        val seedDf = allowedSeeds
          .map(u => (u, graft.robots.Robots.hostKey(u), 0L))
          .toDF("url", "host", "priority")
        val suppressedSeed = blockedSeeds.toDF("url")
        // epoch "-1" bootstrap snapshot: seed frontier, empty state. The
        // four tiny writes are independent — run them concurrently so the
        // bootstrap pays one job latency, not four (guide §2.6)
        import scala.concurrent.{Await, Future}
        import scala.concurrent.ExecutionContext.Implicits.global
        import scala.concurrent.duration.Duration
        val fStateF = Future(
          store.writeDelta("frontier", 0, seedDf, None, fullRewrite = true))
        val vStateF = Future(store.writeDelta("visited", -1,
          Seq.empty[(Int, String)].toDF("epoch", "url"), None))
        val lStateF = Future(
          store.writeDelta("links", -1, Seq.empty[String].toDF("url"), None))
        val sStateF = Future {
          val st = store.writeDelta("suppressed", -1, suppressedSeed, None)
          if (useSeenStore) {
            if (blockedSeeds.nonEmpty)
              suppressedStore.writeDelta(suppressedSeed, -1)
            else suppressedStore.markEpoch(
              spark.sparkContext.hadoopConfiguration, -1)
          }
          st
        }
        snapshot = store.commit(-1, Map(
          "frontier" -> Await.result(fStateF, Duration.Inf),
          "visited" -> Await.result(vStateF, Duration.Inf),
          "links" -> Await.result(lStateF, Duration.Inf),
          "suppressed" -> Await.result(sStateF, Duration.Inf)), Map("seed" -> 1L))
        frontier = store.readTable(snapshot, "frontier")
        epoch = 0
    }

    var frontierCount = frontier.count()

    // links-compaction base: the row count the table last held in compacted
    // (or first-delta) form; persisted in the manifest metrics so resume
    // keeps the amortization schedule
    var linksBaseRows = snapshot.metrics.getOrElse("links_base_rows", 0L)

    // Incrementally-maintained seen sketch (O-7b). Activation is LAZY: the
    // first epoch where the seen estimate crosses bloomMinSeen, the sketch is
    // built from the FULL visited-so-far ∪ this epoch's fetch (also the
    // resume path — file shards are re-merged idempotently); every later
    // epoch folds in only the fetch delta. Invariant: whenever the probe is
    // active, the sketch covers every URL in the authoritative seen set — no
    // false negatives, so the dedup split is exact.
    //
    // Two physical forms:
    //  - broadcast: one in-memory sketch, per-partition build + treeAggregate
    //    merge of the delta (north_star path), rebroadcast + destroyed per
    //    epoch. Right up to ~bloomBroadcastMaxBytes.
    //  - sharded files (the 10^10 path): url-hash-bucketed shard files built
    //    and probed executor-side (BloomShardStore) — the full sketch never
    //    exists in one JVM and probes touch only each task's buckets.
    require(config.sketchKind == "bloom" || config.sketchKind == "cuckoo",
      s"unknown sketchKind '${config.sketchKind}' (bloom|cuckoo)")
    val useCuckoo = config.sketchKind == "cuckoo"
    val (sketchBits, sketchHashes) =
      BloomSketch.sizing(config.bloomExpectedTotal, config.bloomFpp)
    val fileProbe = !useCuckoo && config.bloomFileProbe
      .getOrElse(sketchBits / 8 > config.bloomBroadcastMaxBytes)
    val nShuffle = spark.sessionState.conf.numShufflePartitions
    val shardStore =
      if (fileProbe) {
        // keep shards ≤ ~16 MiB regardless of scale (10^10 urls ⇒ ~2^10
        // buckets of ~12 MB — BASELINE.md's accounting): a probe task loads
        // one shard, so shard size bounds per-task memory, not total size.
        // When that cap allows it, use the session's shuffle-partition count
        // instead: the sketch's bucket function is Spark's HashPartitioning
        // id (same as the seen store's), so matching counts give the sketch
        // probe — and the exact probe behind it — ZERO exchanges on the
        // already-hash-partitioned candidate frame.
        val desired = math.max(config.bloomShards,
          ((sketchBits / 8) / (16L << 20) + 1).toInt)
        val shards = if (desired <= nShuffle) nShuffle else desired
        new graft.sketch.BloomShardStore(s"$warehouse/sketch", shards,
          ((sketchBits / shards + 63) >> 6) << 6, sketchHashes)
      } else null
    var seenSketch: BloomSketch = null
    var seenCuckoo: graft.sketch.SeenSketch = null
    var sketchActive = false
    // broadcast-bloom capacity — grows by rebuild when the crawl outgrows
    // the configured expectation (see the resize branch below)
    var sketchCapacity = config.bloomExpectedTotal
    def mergeIntoSketch(urls: DataFrame): Unit = {
      // few, larger leaf tasks: every treeAggregate leaf ships one
      // full-size sketch, so bound the leaf count rather than the row count
      def deltaRdd = {
        val rdd0 = urls.select("url").as[String].rdd
        if (rdd0.getNumPartitions > 8) rdd0.coalesce(8) else rdd0
      }
      if (fileProbe) shardStore.mergeDelta(urls.select("url"))
      else if (useCuckoo) {
        if (seenCuckoo == null)
          seenCuckoo = new graft.sketch.SeenSketch(config.bloomExpectedTotal)
        // a saturating merge degrades the sketch to always-maybe (every row
        // then takes the authoritative anti-join) — never a false negative
        seenCuckoo.merge(
          graft.sketch.SeenSketch.build(deltaRdd, config.bloomExpectedTotal))
      } else {
        if (seenSketch == null)
          seenSketch = BloomSketch.forExpected(sketchCapacity, config.bloomFpp)
        seenSketch.merge(BloomSketch.build(deltaRdd, sketchCapacity, config.bloomFpp))
      }
    }

    // plan-evidence hook (optimization rounds): when `graft.explain.dir` is
    // set (PlanDump), dump the formatted physical plan of the per-epoch
    // internal frames — zero cost when unset
    val explainDir = Option(System.getProperty("graft.explain.dir"))
    def dumpPlan(name: String, df: DataFrame): Unit = explainDir.foreach { d =>
      val tag = Option(System.getProperty("graft.explain.tag")).getOrElse("crawl")
      try java.nio.file.Files.writeString(
        java.nio.file.Paths.get(d, s"${tag}_$name.txt"),
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      catch { case _: Exception => () }
    }

    while (frontierCount > 0 && epoch < config.maxEpochs) {
      val t0 = System.nanoTime()
      var tLast = t0
      val stepMs = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      def lap(name: String): Unit = {
        val now = System.nanoTime()
        stepMs(s"ms_$name") = (now - tLast) / 1000000L
        tLast = now
      }
      val visitedSoFar = store.readTable(snapshot, "visited")
      val suppressedSoFar = store.readTable(snapshot, "suppressed")
      val visitedRows = snapshot.tables("visited").totalRows

      // 1. politeness gate. The frontier parquet was hash-distributed at
      // write time; no re-shuffle here — the budget window (when enabled)
      // shuffles by (host, salt) itself.
      val (fetchNowRaw, defer, gateCaches) =
        politenessSplit(frontier, delayBudgets, robotsCount, frontierCount)

      // 2. visited delta = fetched this epoch. fetchNowRaw reads straight
      // from the frontier manifest files (1-hop lineage), so the write runs
      // CONCURRENTLY with extraction on a separate action thread. The exact
      // seen index gets the SAME delta (O(epoch) rows — the only state that
      // is new) on ITS OWN action thread, concurrent with the visited
      // parquet write (both scan the same gate cache); the sorted shard
      // files must exist before this epoch's dedup probe, which awaits
      // seenStoreF — not the parquet write it no longer depends on.
      val fetchNow = fetchNowRaw
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      val vStateF = Future {
        store.writeDelta("visited", epoch,
          fetchNow.select(lit(epoch).as("epoch"), col("url")),
          Some(snapshot.tables("visited")))
      }
      val seenStoreF: Future[Unit] =
        if (useSeenStore) Future(seenStore.writeDelta(fetchNow.select("url"), epoch))
        else Future.successful(())
      lap("visited_write_launch")

      // 3. fetch join + extract + clean (crawler.py:30-42). INNER join is
      // semantics-preserving: visited-marking happened above (step 2) and a
      // missing page row contributes an empty link set either way
      // (crawler.py:45-46). Small epochs broadcast the frontier side and
      // stream the pages scan (no pages shuffle); huge epochs fall back to a
      // shuffled join that AQE can re-plan.
      //
      // Bucket-manifest pruning (the 100-TB lever): with a BucketedPages
      // source, the epoch's frontier names its bucket set (≤ numBuckets ints,
      // driver-collected) and the scan below is built from ONLY those data
      // files — an epoch touching 1% of buckets reads 1% of the corpus
      // instead of all of it.
      var pagesFilesRead = -1L
      val pagesForEpoch = bucketed match {
        case None => pages
        case Some(bp) =>
          val bucketSet = fetchNow
            .select(bp.bucketExpr(col("url")).as("b"))
            .distinct().as[Int].collect().toSet
          pagesFilesRead = bp.filesFor(bucketSet).size.toLong
          bp.scanBuckets(bucketSet)
      }
      lap("bucket_prune")
      val fetchKeys =
        if (frontierCount <= config.broadcastFetchMax)
          broadcast(fetchNow.select("url"))
        else fetchNow.select("url").repartition(P, col("url"))
      val fetched = pagesForEpoch.select("url", "html").join(fetchKeys, Seq("url"))
      // per-partition fetch/extract metrics (§1.2 schema) ride the extraction
      // expression itself as an accumulator — no extra pass, no extra job;
      // fresh per epoch so each snapshot reports its own partitions
      val extractAcc = new graft.html.ExtractMetricsAcc
      spark.sparkContext.register(extractAcc, s"extract_metrics_e$epoch")
      val cleanLinks = fetched
        .select(col("url").as("page_url"),
          explode_outer(extract_hrefs_metered(col("html"), extractAcc)).as("href"))
        .filter(col("href").isNotNull)
        .select(graft.url.urlfns2.resolve_clean(col("page_url"), col("href")).as("url"))
        .filter(col("url").isNotNull) // null = scheme-filtered (O-5)
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)

      // 4. links delta (O-10): append this epoch's per-epoch-distinct links;
      // the global distinct is taken once at read time (distinct of unions ==
      // union of distincts for set semantics) — avoids an O(|links|) anti-join
      // shuffle per epoch. Runs on its own action thread, OVERLAPPED with the
      // gates/frontier chain below: the two consumers share the persisted
      // cleanLinks cache (per-partition block locking makes the concurrent
      // materialization safe), and lState is only needed at commit. At small
      // epochs this halves the per-epoch fixed job latency; at scale the two
      // jobs pipeline on free task slots.
      val lStateF = Future {
        store.writeDelta("links", epoch, cleanLinks, Some(snapshot.tables("links")))
      }
      lap("links_write_launch")

      // 5. in-domain + robots gates
      val inDom = cleanLinks
        .filter(url_in_domain(col("url"), lit(config.domain)))
        .withColumn("host", host_key(col("url")))
      val gated =
        if (hasRobots)
          inDom
            // size-gated: broadcast only a small rule table; a web-scale one
            // (10^8 hosts) falls back to a shuffled equi-join on host
            .join(
              if (robotsCount <= config.robotsBroadcastMax) broadcast(robots)
              else robots.repartition(P, col("host")),
              Seq("host"), "left")
            .withColumn("allowed",
              coalesce(robots_allowed(col("url"), col("prefixes"), col("allows")), lit(true)))
            .persist(StorageLevel.MEMORY_AND_DISK)
        else inDom.withColumn("allowed", lit(true))
      lap("gate_build")
      // the suppressed write overlaps the candidates chain below (the same
      // action-thread pattern as visited/links: both consumers share the
      // persisted `gated` cache, and the frontier chain — the only reader of
      // this epoch's suppressed delta — awaits the future before it
      // subtracts). Synchronous, this cost ~0.7 s/epoch on robots crawls.
      // Bucket-local path: `disallowed − suppressedSoFar` is a shard probe
      // against the suppressed store (upToEpoch = e−1), not a left_anti over
      // the CUMULATIVE suppressed set — the probe cost tracks this epoch's
      // disallowed rows, not the crawl's age. `gated` preserves the
      // cleanLinks-distinct url hash partitioning when robots was broadcast,
      // so the probe skips its exchange too. No distinct is needed on the
      // store path: cleanLinks is distinct and the gates only filter, so
      // urls are unique by construction (the anti path keeps the reference
      // left_anti + distinct shape for the differential).
      val gatedAligned = robotsCount <= config.robotsBroadcastMax
      val sStateF =
        if (hasRobots) Future {
          val disallowed = gated.filter(!col("allowed")).select("url")
          if (useSeenStore) {
            val newSuppressed = suppressedStore
              .filterUnseen(disallowed, "url", epoch - 1,
                assumeDistributed =
                  gatedAligned && suppressedStore.numBuckets == nShuffle)
              .persist(StorageLevel.MEMORY_AND_DISK)
            // the parquet delta and the shard-index delta are independent
            // consumers of the (O(delta)) cached frame — write them
            // concurrently; the epoch pays max(two writes), not their sum
            val pF = Future(store.writeDelta("suppressed", epoch,
              newSuppressed, Some(snapshot.tables("suppressed"))))
            val stF = Future(suppressedStore.writeDelta(newSuppressed, epoch))
            Await.result(stF, scala.concurrent.duration.Duration.Inf)
            val ss = Await.result(pF, scala.concurrent.duration.Duration.Inf)
            newSuppressed.unpersist()
            ss
          } else {
            val newSuppressed = disallowed
              .join(suppressedSoFar.select("url"), Seq("url"), "left_anti")
              .distinct()
            store.writeDelta("suppressed", epoch, newSuppressed,
              Some(snapshot.tables("suppressed")))
          }
        } else scala.concurrent.Future.successful(
          snapshot.tables("suppressed").copy(deltaRows = 0L))
      lap("suppressed_write_launch")

      // 6. next frontier = (allowed ∪ deferred) − visited(≤e) − suppressed(≤e).
      // O-9 priority: discovery depth when depthPriority (deferred older URLs
      // outrank newly discovered ones in the (priority, url) schedule);
      // constant 0 in trace-match mode (reference FIFO ⇒ exact). A URL both
      // deferred and rediscovered keeps its MINIMUM priority — groupBy-min
      // rather than dropDuplicates, whose surviving row is nondeterministic.
      val newPriority = if (config.depthPriority) (epoch + 1).toLong else 0L
      // grouping is by url ALONE (host is a pure function of url on every
      // input row — frontier rows were keyed with the same host_key — so
      // the groups are identical and host is recomputed after the agg):
      // the links-distinct upstream already hash-partitioned by url, and
      // with no deferred union in the plan Catalyst reuses that exchange —
      // the candidate set crosses the wire once, not twice, per epoch, and
      // the rows that do cross carry (url, priority) only
      val base = gated.filter(col("allowed"))
        .select(col("url"), lit(newPriority).as("priority"))
      // no deferred union ⇒ base's urls are ALREADY distinct (cleanLinks is
      // distinct, the gates only filter) and priority is a constant, so the
      // groupBy-min is an identity — skip its aggregate pair outright; the
      // distinct's exchange still provides the url hash partitioning the
      // dedup-probe alignment relies on
      val candidates = (if (gateCaches.isEmpty) base
        else base.union(defer.select("url", "priority"))
          .groupBy(col("url"))
          .agg(min(col("priority")).as("priority")))
        .select(col("url"), host_key(col("url")).as("host"), col("priority"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      // BASELINE.json metric numerator (URLs scheduled + entering dedup).
      // Counting FIRST materializes the candidates cache, so the fixpoint
      // epoch (0 candidates) skips the sketch merge, anti-join, and probe
      // below entirely, and the frontier write of a non-empty epoch scans
      // the cache instead of recomputing. (An observe() on the candidates
      // plan would not surface through the cache boundary —
      // InMemoryRelation swallows the CollectMetrics node.)
      val visitedAll = visitedSoFar.select("url")
        .union(fetchNow.select("url"))
      val seenCountNow = visitedRows + frontierCount // upper bound estimate
      // the sketch merge's whole decision tree depends only on pre-epoch
      // state (seen estimate, activation flags) — never on the candidate
      // count — so it runs on its own action thread OVERLAPPED with the
      // candidates compute+count below, instead of serializing a
      // treeAggregate/shard merge of the epoch's fetch between the count
      // and the frontier write. (The fixpoint epoch now pays one final
      // small merge the old count-gated form skipped; bloom adds are
      // idempotent and every non-final epoch stops paying the merge's
      // wall-clock.) The vars it mutates are read only after the Await.
      val sketchMergeF: Future[Unit] = Future {
        if (sketchActive && !fileProbe && !useCuckoo && seenCountNow > sketchCapacity) {
          // outgrown: a bloom at >1× its design load answers maybe for nearly
          // everything (correct — the anti-join is authoritative — but it
          // stops pruning). Rebuild from the FULL seen set at 2× the current
          // estimate, restoring the configured FPP. The sharded file sketch
          // has fixed geometry (the 10^10 path is pre-sized per BASELINE.md)
          // and cuckoo has its own degrade-to-maybe story.
          sketchCapacity = math.max(seenCountNow * 2, sketchCapacity * 2)
          seenSketch = null
          mergeIntoSketch(visitedAll)
        } else if (sketchActive) mergeIntoSketch(fetchNow) // maintain full coverage
        else if (seenCountNow >= config.bloomMinSeen) {
          mergeIntoSketch(visitedAll) // first activation: cover ALL seen urls
          sketchActive = true
        }
      }
      val candidatesIn = candidates.count()
      lap("candidates_count")
      Await.result(sketchMergeF, scala.concurrent.duration.Duration.Inf)
      lap("sketch_merge_wait")
      val bloomBcast =
        if (candidatesIn > 0 && sketchActive && !fileProbe && !useCuckoo)
          spark.sparkContext.broadcast(seenSketch)
        else null
      val cuckooBcast =
        if (candidatesIn > 0 && sketchActive && useCuckoo)
          spark.sparkContext.broadcast(seenCuckoo)
        else null
      val probe: Option[DataFrame => DataFrame] =
        if (!sketchActive) None
        else if (fileProbe)
          // aligned (shard count == the candidate exchange's partition
          // count, same HashPartitioning bucket function): the sketch probe
          // consumes the candidates' own exchange and PRESERVES it for the
          // exact probe behind it — the 10^10 configuration keeps the
          // zero-exchange chain. Misaligned counts pay one routing exchange;
          // correctness never depends on it.
          Some(df => shardStore.probe(df, "url",
            assumeDistributed = shardStore.numBuckets == nShuffle))
        else if (useCuckoo)
          Some(df => df.withColumn("maybe_seen", cuckoo_might_contain(cuckooBcast, col("url"))))
        else Some(df => df.withColumn("maybe_seen", bloom_might_contain(bloomBcast, col("url"))))
      // the authoritative candidates−seen filter: bucket-local sorted-shard
      // lookup by default (no O(seen) exchange — the store's delta for THIS
      // epoch covers fetchNow, so probing up to `epoch` equals the
      // visited∪fetchNow anti-join), or the plain left_anti reference path
      val exactSeen: DataFrame => DataFrame =
        if (useSeenStore) { df =>
          // the shard files for this epoch are written by seenStoreF — they
          // must be on disk before the probe job launches
          Await.result(seenStoreF, scala.concurrent.duration.Duration.Inf)
          // candidates flow out of the groupBy/distinct url exchange, the
          // broadcast sketch probe is narrow, and the file-probe preserves
          // the partitioning when ITS shard count matches — so when the
          // store's bucket count matches the exchange's partitioning the
          // probe needs NO exchange of its own. Alignment is a perf hint
          // only; the probe is correct under any distribution.
          val aligned = seenStore.numBuckets == nShuffle &&
            (!fileProbe || shardStore.numBuckets == nShuffle)
          seenStore.filterUnseen(df, "url", epoch, assumeDistributed = aligned)
        } else { df =>
          df.join(visitedAll.select("url"), Seq("url"), "left_anti")
        }
      // deduped is already hash-partitioned (dropDuplicates/bucket-probe
      // shuffles); writing it directly keeps that distribution in the files
      // and lets AQE coalesce small epochs to few files. The fixpoint epoch
      // (0 candidates) writes the empty delta without the join machinery.
      val sState = Await.result(sStateF, scala.concurrent.duration.Duration.Inf)
      lap("suppressed_wait")
      val next =
        if (candidatesIn == 0) candidates
        else {
          val deduped = dedupAgainst(candidates, exactSeen, probe)
          if (sState.totalRows > 0) {
            if (useSeenStore)
              // bucket-local subtraction of suppressed(≤ e) — the store's
              // delta for THIS epoch is on disk (sStateF awaited above). The
              // frame reaching here is always bucket-pure per partition
              // (either it kept the candidates' url hash partitioning, or a
              // store/sketch probe routed it by the same bucket function),
              // so the probe never needs its own exchange — this replaces
              // the left_anti that re-shuffled the CUMULATIVE suppressed set
              // every robots epoch.
              suppressedStore.filterUnseen(deduped, "url", epoch,
                assumeDistributed = true)
            else deduped.join(spark.read.parquet(sState.files: _*).select("url"),
              Seq("url"), "left_anti")
          } else deduped
        }
      dumpPlan(s"e${epoch}_candidates", candidates)
      if (candidatesIn > 0) dumpPlan(s"e${epoch}_frontier", next)
      val fState = store.writeDelta("frontier", epoch + 1, next,
        Some(snapshot.tables("frontier")), fullRewrite = true)
      lap("frontier_write")
      val vState = Await.result(vStateF, scala.concurrent.duration.Duration.Inf)
      // the seen-index delta must be durable before this epoch commits (the
      // fixpoint epoch never probes, so the dedup chain may not have awaited)
      Await.result(seenStoreF, scala.concurrent.duration.Duration.Inf)
      lap("visited_wait")
      val lStateRaw = Await.result(lStateF, scala.concurrent.duration.Duration.Inf)
      lap("links_wait")
      // threshold-triggered links compaction (amortized: only when the delta
      // pile outgrows the last compacted size by linksCompactFactor)
      val doCompact = config.linksCompactFactor > 0 && linksBaseRows > 0 &&
        lStateRaw.totalRows >= config.linksCompactMinRows &&
        lStateRaw.totalRows >= (config.linksCompactFactor * linksBaseRows).toLong
      val lState =
        if (doCompact) store.compactDistinct("links", epoch, lStateRaw)
        else lStateRaw
      if (doCompact) lap("links_compact")
      if (linksBaseRows == 0 || doCompact) linksBaseRows = lState.totalRows
      // periodic seen-shard merge (amortized; the per-epoch delta for this
      // epoch is already on disk via vStateF)
      val seenCompacted = useSeenStore && config.seenCompactEvery > 0 &&
        epoch > 0 && epoch % config.seenCompactEvery == 0
      if (seenCompacted) {
        seenStore.compact(spark, epoch)
        // the suppressed index follows the same DRUM schedule (it is the
        // same store mechanism over the other cumulative url set)
        if (sState.totalRows > 0) suppressedStore.compact(spark, epoch)
        lap("seen_compact")
      }
      // the per-epoch sketch broadcast is consumed only by the frontier
      // write above — release it so long crawls don't accumulate broadcast
      // state on the driver/executors
      if (bloomBcast != null) bloomBcast.destroy()
      if (cuckooBcast != null) cuckooBcast.destroy()

      // extraction accumulator is final here: both cleanLinks consumers
      // (links write + frontier chain) are awaited above, so every cached
      // partition has been materialized exactly once
      val pmetrics = extractAcc.value.toSeq.sortBy(_._1).map { case (pid, s) =>
        SnapshotStore.PartitionMetric(pid, s.pages, s.bytesHtml, s.linksOut,
          s.parseErrors)
      }
      val wallMs = (System.nanoTime() - t0) / 1000000L
      snapshot = store.commit(epoch, Map(
        "frontier" -> fState, "visited" -> vState,
        "links" -> lState, "suppressed" -> sState),
        metrics = Map(
          "urls_in" -> frontierCount,
          "fetched" -> vState.deltaRows,
          "deferred" -> (frontierCount - vState.deltaRows),
          "new_links" -> lState.deltaRows,
          "new_suppressed" -> sState.deltaRows,
          "candidates_in" -> candidatesIn,
          "next_frontier" -> fState.deltaRows,
          "sketch_capacity" -> (if (sketchActive) sketchCapacity else 0L),
          "seen_bucketlocal" -> (if (useSeenStore) 1L else 0L),
          "links_base_rows" -> linksBaseRows,
          "links_compacted" -> (if (doCompact) 1L else 0L),
          "seen_compacted" -> (if (seenCompacted) 1L else 0L),
          "pages_hit" -> pmetrics.map(_.pages).sum,
          "bytes_html" -> pmetrics.map(_.bytesHtml).sum,
          "links_out" -> pmetrics.map(_.linksOut).sum,
          "parse_errors" -> pmetrics.map(_.parseErrors).sum,
          "wall_ms" -> wallMs) ++ stepMs ++
          (if (pagesFilesRead >= 0)
            Map("pages_files_read" -> pagesFilesRead,
              "pages_files_total" -> bucketed.get.totalFiles.toLong)
          else Map.empty[String, Long]),
        parent = Some(snapshot),
        partitionMetrics = pmetrics)

      candidates.unpersist()
      cleanLinks.unpersist()
      if (hasRobots) gated.unpersist()
      gateCaches.foreach(_.unpersist())
      frontier = store.readTable(snapshot, "frontier")
      frontierCount = fState.deltaRows
      epoch += 1
    }

    delayBudgets.foreach(_.unpersist())
    if (robots != null) robots.unpersist()
    val visited = store.readTable(snapshot, "visited")
    CrawlResult(
      trace = visited.orderBy("epoch", "url"),
      links = store.readTable(snapshot, "links").distinct(),
      visited = visited,
      epochs = epoch,
      lastSnapshot = snapshot)
  }
}
