package graft.plans

import org.apache.spark.sql.SparkSession

/** spark-submit entry point (north_rule: "run via spark-submit on
  * multi-executor clusters"):
  *
  *   spark-submit --class graft.plans.CrawlJob graft.jar \
  *     --pages <parquet path|synth:N> --domain <domain> \
  *     --warehouse <dir> [--budget K] [--partitions P] [--max-epochs E] \
  *     [--buckets B] [--links-out dir [--links-shards N]] [--trace-out dir]
  *
  * `--buckets B` adopts the pages table into the bucket-manifest layout
  * under <warehouse>-pages (one-time; reused on resume via its manifest) so
  * every epoch's fetch join pre-selects data files against the frontier's
  * bucket set instead of scanning the corpus.
  *
  * Resumes automatically from the newest valid snapshot in the warehouse.
  * With `--pages synth:N` the input is the deterministic SiteGen table
  * (scaling/bench runs); otherwise any parquet with the input_hint schema
  * (url, warc_ts, html, text, lang).
  */
object CrawlJob {

  private def parseArgs(args: Array[String]): Map[String, String] =
    args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.stripPrefix("--") -> v
    }.toMap

  def main(args: Array[String]): Unit = {
    val a = parseArgs(args)
    val domain = a.getOrElse("domain", "example.com")
    val warehouse = a.getOrElse("warehouse",
      sys.error("--warehouse is required"))
    val partitions = a.get("partitions").map(_.toInt).getOrElse(32)
    val budget = a.get("budget").map(_.toInt)
    val maxEpochs = a.get("max-epochs").map(_.toInt).getOrElse(Int.MaxValue)

    val builder = SparkSession.builder().appName(s"graft-crawl-$domain")
    // under spark-submit the master comes from the launcher; default local
    val spark = (if (sys.props.contains("spark.master") ||
        sys.env.contains("SPARK_MASTER")) builder
      else builder.master(s"local[$partitions]")
        .config("spark.sql.shuffle.partitions", partitions))
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // --robots default ⇒ synthesize a per-host robots.txt (Disallow: /p/1*)
    // for the synth table, exercising the gate end-to-end
    val robotsBody = a.get("robots").map {
      case "default" => "User-agent: *\nDisallow: /p/1\n"
      case body      => body.replace("\\n", "\n")
    }
    val pages = a.getOrElse("pages", "synth:10000") match {
      case s if s.startsWith("synth:") =>
        graft.synth.SiteGen.pages(spark, domain, s.stripPrefix("synth:").toLong,
          hosts = 32, outDegree = 12, numPartitions = partitions,
          robotsBody = robotsBody)
      case path => spark.read.parquet(path)
    }

    val seeds = a.get("seeds").map(_.split(",").toSeq)
      .getOrElse(Seq(s"https://$domain"))
    val engine = new CrawlEngine(spark,
      CrawlConfig(domain, budget = budget, numPartitions = partitions,
        depthPriority = a.get("depth-priority").exists(_.toBoolean),
        maxEpochs = maxEpochs))
    val result = a.get("buckets").map(_.toInt) match {
      case Some(b) =>
        val pagesDir = s"$warehouse-pages"
        val bucketedPages =
          if (graft.snapshot.BucketedPages.manifestExists(spark, pagesDir))
            graft.snapshot.BucketedPages.load(spark, pagesDir)
          else graft.snapshot.BucketedPages.adopt(spark, pages, pagesDir, b)
        engine.run(bucketedPages, seeds, warehouse)
      case None => engine.run(pages, seeds, warehouse)
    }
    // reference-parity artifacts (crawler.py links.txt / the visit trace):
    // --links-out writes the byte-exact single-file sink, or the sharded
    // range-partitioned form when --links-shards is given (name-order concat
    // of the shards reproduces the parity bytes)
    a.get("links-out").foreach { out =>
      a.get("links-shards").map(_.toInt) match {
        case Some(shards) => result.saveLinksSharded(out, shards)
        case None         => result.saveLinks(out)
      }
    }
    a.get("trace-out").foreach(result.saveTrace)
    val links = result.lastSnapshot.tables("links").totalRows
    val visited = result.lastSnapshot.tables("visited").totalRows
    println(s"crawl complete: epochs=${result.epochs} visited=$visited " +
      s"link_rows=$links warehouse=$warehouse")
    spark.stop()
  }
}
