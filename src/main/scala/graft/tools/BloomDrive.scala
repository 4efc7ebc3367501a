package graft.tools
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import graft.plans.{CrawlConfig, CrawlEngine}
import graft.synth.SiteGen

/** Verify-drive: same crawl with and without the bloom prefilter must yield
  * identical links/trace (the sketch only prunes; the anti-join is authority).
  */
object BloomDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val domain = "example.com"
    val pages = SiteGen.pages(spark, domain, nPages = 400, hosts = 4, outDegree = 8, numPartitions = 8)
    def run(minSeen: Long) = {
      val wh = Files.createTempDirectory("graft-bloomdrive-").toString
      new CrawlEngine(spark, CrawlConfig(domain, numPartitions = 8, bloomMinSeen = minSeen))
        .run(pages, s"https://$domain", wh)
    }
    val plain = run(Long.MaxValue)   // never use bloom
    val bloomed = run(1L)            // always use bloom
    val a = plain.links.as[String].collect().sorted.toSeq
    val b = bloomed.links.as[String].collect().sorted.toSeq
    val ta = plain.trace.select("epoch", "url").as[(Int, String)].collect().toSeq
    val tb = bloomed.trace.select("epoch", "url").as[(Int, String)].collect().toSeq
    println(s"BLOOMDRIVE links_equal=${a == b} trace_equal=${ta == tb} links=${a.size} visited=${ta.size}")
    spark.stop()
  }
}
