package graft.tools

import org.apache.spark.sql.SparkSession

/** Extra benchmark main (guide §1.4): per-query isolation with the noop sink
  * — every column of every row is computed and discarded, so the number is
  * the computation, not the sink — with N reps and per-rep steal jiffies.
  * The frozen `graft.Bench` methodology (count() per query, single pass)
  * remains the driver artifact; this main exists for optimization evidence
  * only (OPTIMIZATION_r06.md).
  *
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *     sbt -batch "runMain graft.tools.BenchExtra <reps> [q1,q2,...]"
  */
object BenchExtra {

  private def stealJiffies(): Long =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try {
        val f = src.getLines().next().trim.split("\\s+")
        if (f.length > 8) f(8).toLong else 0L
      } finally src.close()
    } catch { case _: Exception => 0L }

  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 3
    val only: Set[String] =
      if (args.length > 1) args(1).split(",").toSet else Set.empty
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.multimodal.MediaOps.cachedCorpus(
      spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text",
      cacheKey = sfDir).count()
    graft.SparkEntry.warmCaches(spark, sfDir)
    val queries = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => only.isEmpty || only.contains(q._1))
    // one warm lap (JIT/codegen), then the measured reps
    queries.foreach { case (name, fn) =>
      spark.sparkContext.setJobDescription(s"warm:$name")
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    queries.foreach { case (name, fn) =>
      val times = (1 to reps).map { i =>
        spark.sparkContext.setJobDescription(s"bench:$name:$i")
        val s0 = stealJiffies()
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
        val sec = (System.nanoTime() - t0) / 1e9
        (sec, stealJiffies() - s0)
      }
      val best = times.minBy(_._1)
      val all = times.map(t => f"${t._1}%.3f").mkString("[", ",", "]")
      val steals = times.map(_._2).mkString("[", ",", "]")
      println(f"""{"metric":"noop_query","name":"$name","best_sec":${best._1}%.3f,"reps":$all,"steal_jiffies":$steals}""")
    }
    spark.stop()
  }
}
