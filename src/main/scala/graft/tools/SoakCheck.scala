package graft.tools

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths}
import java.util.Base64

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.plans.{CrawlConfig, CrawlEngine}

/** Bulk engine-vs-Python-oracle soak over generated scenario directories
  * (same format as the committed fixtures, produced uncommitted in bulk):
  *
  *   python3 tools/gen_site_fixtures.py --soak 30 2000 /tmp/soak
  *   sbt -batch "runMain graft.tools.SoakCheck /tmp/soak"
  *
  * Checks the full exact contract per scenario — trace sequence, visited
  * set, links.txt lines, per-epoch frontiers — and exits nonzero on any
  * divergence. Widens trace coverage far beyond the committed fixtures
  * without growing the repo; a failing seed gets promoted to a committed
  * fixture. A COMMITTED 40-scenario profile (fixed seeds 3000-3039,
  * src/test/resources/soak) runs in `sbt test` via graft.plans.SoakSpec so
  * trace exactness cannot silently regress between rounds.
  */
object SoakCheck {

  private def lines(p: Path): Seq[String] =
    Files.readAllLines(p, UTF_8).asScala.toVector

  /** Run one scenario dir through the engine and diff every exactness
    * artifact against the committed goldens. Returns failure descriptions
    * (empty = exact match). Shared by the bulk main and the committed
    * SoakSpec profile.
    */
  def checkScenario(spark: SparkSession, dir: Path): Seq[String] = {
    import spark.implicits._
    val name = dir.getFileName.toString
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(lines(dir.resolve("config.json")).mkString)
    val domain = node.get("domain").asText()
    val budget = Option(node.get("budget")).filterNot(_.isNull).map(_.asInt())
    val seeds = Option(node.get("seeds")).map { arr =>
      (0 until arr.size()).map(arr.get(_).asText())
    }.getOrElse(Seq(s"https://$domain"))
    val depthPriority =
      Option(node.get("depth_priority")).exists(_.asBoolean(false))
    // optional compaction knobs (engine-only — they cannot change results,
    // which is exactly what the scenario asserts): a committed scenario with
    // tight thresholds exercises seen-shard + links compaction inside every
    // `sbt test`, not just in the dedicated compaction suites
    val seenCompactEvery =
      Option(node.get("seen_compact_every")).map(_.asInt()).getOrElse(64)
    val linksCompactFactor =
      Option(node.get("links_compact_factor")).map(_.asDouble()).getOrElse(3.0)
    val linksCompactMinRows =
      Option(node.get("links_compact_min_rows")).map(_.asLong()).getOrElse(1000000L)

    val pages: DataFrame = lines(dir.resolve("pages.tsv")).map { line =>
      val Array(url, b64) = line.split("\t", -1)
      val html = Base64.getDecoder.decode(b64)
      (url, new java.sql.Timestamp(1700000000000L), html,
        graft.html.HtmlExtract.extractText(html), "en")
    }.toDF("url", "warc_ts", "html", "text", "lang")

    val wh = Files.createTempDirectory(s"graft-soak-$name-").toString
    val result = new CrawlEngine(spark,
      CrawlConfig(domain, budget, numPartitions = 4,
        depthPriority = depthPriority,
        seenCompactEvery = seenCompactEvery,
        linksCompactFactor = linksCompactFactor,
        linksCompactMinRows = linksCompactMinRows)).run(pages, seeds, wh)

    val fails = Seq.newBuilder[String]
    def diff(what: String, got: Seq[String], want: Seq[String]): Unit =
      if (got != want) {
        val d = got.zipAll(want, "<missing>", "<missing>")
          .find { case (a, b) => a != b }
        fails += s"$name $what: ${got.size} vs ${want.size} rows; first diff: $d"
      }

    diff("trace", result.trace.select("url").as[String].collect().toSeq,
      lines(dir.resolve("trace.txt")))
    diff("visited",
      result.visited.select("url").orderBy("url").as[String].collect().toSeq,
      lines(dir.resolve("visited.txt")))
    diff("links",
      result.links.select("url").orderBy("url").as[String].collect().toSeq,
      lines(dir.resolve("links.txt")))
    val wantEpochs = lines(dir.resolve("frontier_epochs.txt"))
      .map { l => val Array(e, u) = l.split("\t", 2); (e.toInt, u) }
      .groupBy(_._1).view
      .mapValues(_.map(_._2).sorted(CrawlEngine.codePointOrdering)).toMap
    for ((e, urls) <- wantEpochs.toSeq.sortBy(_._1)) {
      diff(s"frontier epoch $e",
        spark.read.parquet(s"$wh/frontier/epoch=$e")
          .select("url").orderBy("url").as[String].collect().toSeq,
        urls)
    }
    if (result.epochs != wantEpochs.size)
      fails += s"$name epochs: ${result.epochs} vs ${wantEpochs.size}"
    fails.result()
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SoakCheck <sitesDir>")
    val root = Paths.get(args(0))
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-soak")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    var failures = 0
    val dirs = Files.list(root).iterator().asScala.filter(Files.isDirectory(_))
      .toSeq.sortBy(_.getFileName.toString)
    require(dirs.nonEmpty, s"no scenario dirs under $root")
    for (dir <- dirs) {
      val bad = checkScenario(spark, dir)
      bad.foreach(f => println(s"FAIL $f"))
      if (bad.nonEmpty) failures += 1
      else println(s"OK   ${dir.getFileName}")
    }
    println(s"SOAK ${dirs.size} scenarios, $failures failures")
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
