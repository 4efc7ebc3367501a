package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Committed soak profile: 41 seeded-random site scenarios checked against
  * the Python trace oracle on every `sbt test` run, so trace/frontier
  * exactness cannot silently regress between rounds. Composition (r6): 34
  * standard scenarios (seeds 3000-3033, 14-22 pages) + 6 DEEP scenarios
  * (seeds 5000-5005, 60-110 pages, up to ~30 deferral epochs) so
  * delay + depth-priority + multiseed + deep-deferral combos are exercised
  * in every run, the crawl-delay pool includes nan / inf /
  * floordiv-divergent long decimals — plus 1 COMPACTION scenario (seed
  * 6000, 23 budget-1 epochs whose config.json sets seen_compact_every=2 and
  * tight links-compaction thresholds) so seen-shard + links compaction runs
  * inside the oracle-equality loop of every `sbt test`, not just in the
  * dedicated compaction suites.
  *
  * Regenerate (deterministic; only needed if the oracle contract changes):
  *   python3 tools/gen_site_fixtures.py --soak 34 3000 src/test/resources/soak
  *   python3 tools/gen_site_fixtures.py --soak 6 5000 src/test/resources/soak 60 110
  *   python3 tools/gen_site_fixtures.py --soak 1 6000 src/test/resources/soak 60 110
  *     (then re-add the compaction knobs to soak6000/config.json)
  */
class SoakSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("soak profile: 41 fixed-seed scenarios match the Python oracle exactly") {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val root = new java.io.File(getClass.getResource("/soak").toURI)
    val dirs = root.listFiles().filter(_.isDirectory).sortBy(_.getName)
    assert(dirs.length == 41, s"expected 41 committed soak scenarios, found ${dirs.length}")
    // scenarios are independent (own warehouses); the per-epoch cost is
    // driver-side job latency, so 4 concurrent crawls on the shared session
    // overlap it — ~4x faster wall clock than sequential, same checks
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val fails = Await.result(
        Future.sequence(dirs.toSeq.map(d =>
          Future(graft.tools.SoakCheck.checkScenario(spark, d.toPath)))),
        Duration.Inf).flatten
      assert(fails.isEmpty, fails.mkString("\n"))
    } finally pool.shutdown()
  }
}
