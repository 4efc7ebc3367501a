package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.plans.{CrawlConfig, CrawlEngine}
import graft.synth.SiteGen

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: a full domain-bounded crawl (fetch-join → extract → resolve →
    * clean → dedup → epoch loop with snapshots) over a deterministically
    * synthesized 300-page site; returns the discovered-links table
    * (crawler.py all_links equivalent). Driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val domain = "example.com"
    val pages = SiteGen.pages(spark, domain, nPages = 300, hosts = 4,
      outDegree = 8, numPartitions = 8)
    val wh = Files.createTempDirectory("graft-entry-").toString
    val engine = new CrawlEngine(spark, CrawlConfig(domain, numPartitions = 8))
    engine.run(pages, s"https://$domain", wh).links
  }

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map()
}
