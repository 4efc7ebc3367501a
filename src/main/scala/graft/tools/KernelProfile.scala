package graft.tools
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import graft.plans.{CrawlConfig, CrawlEngine}
import graft.snapshot.SnapshotStore
import graft.synth.SiteGen

object KernelProfile {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 50000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val domain = "example.com"
    val pages = SiteGen.pages(spark, domain, n, hosts = 32, outDegree = 12,
      numPartitions = cpus.toInt)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pages.count()
    val wh = Files.createTempDirectory("graft-prof-").toString
    val t0 = System.nanoTime()
    val r = new CrawlEngine(spark, CrawlConfig(domain, numPartitions = cpus.toInt,
      bloomMinSeen = 50000L)).run(pages, s"https://$domain", wh)
    val sec = (System.nanoTime() - t0) / 1e9
    val store = new SnapshotStore(spark, wh)
    (0 until r.epochs).foreach { e =>
      store.snapshotAt(e).foreach { s =>
        println(f"PROF epoch=$e%2d ${s.metrics.toSeq.sortBy(_._1).map{case(k,v)=>s"$k=$v"}.mkString(" ")}")
      }
    }
    println(f"PROF total_sec=$sec%.1f epochs=${r.epochs}")
    spark.stop()
  }
}
