package graft.html

import org.apache.spark.util.AccumulatorV2

/** Per-partition fetch/extract counters for one crawl epoch (SURVEY.md §1.2
  * metrics schema: partition_id, fetched, bytes_html, links_out,
  * parse_errors) — the north_rule's "per-partition lineage and fetch/extract
  * metrics", collected the way Spark's own SQLMetrics are: an AccumulatorV2
  * carried INSIDE the extraction expression ([[ExtractHrefsMetered]]), so it
  * serializes into each task, registers on deserialization, and reports
  * through the normal task-completion channel — cluster-correct, and free of
  * any extra pass over the data (the counters ride the one codegen'd
  * extraction already running).
  *
  * Exactly-once caveat (standard for Spark accumulators): a task retry or a
  * cache-evicted recompute re-counts its partition. The engine materializes
  * the extraction output into a persisted cache within the same epoch, so in
  * practice each partition is computed once; the metrics are observability,
  * not inputs to any correctness decision.
  */
final class ExtractMetricsAcc
    extends AccumulatorV2[(Int, Array[Long]), Map[Int, ExtractMetricsAcc.Stat]] {
  import ExtractMetricsAcc.Stat

  private val stats = new java.util.HashMap[Int, Array[Long]]()

  /** Hot-path row update (called from codegen'd extraction). */
  def record(bytesHtml: Long, linksOut: Long, parseErr: Long): Unit = {
    val pid = org.apache.spark.TaskContext.getPartitionId()
    var a = stats.get(pid)
    if (a == null) { a = new Array[Long](4); stats.put(pid, a) }
    a(0) += 1 // pages
    a(1) += bytesHtml
    a(2) += linksOut
    a(3) += parseErr
  }

  override def isZero: Boolean = stats.isEmpty
  override def copy(): ExtractMetricsAcc = {
    val c = new ExtractMetricsAcc
    stats.forEach((k, v) => c.stats.put(k, v.clone()))
    c
  }
  override def reset(): Unit = stats.clear()
  override def add(v: (Int, Array[Long])): Unit = {
    var a = stats.get(v._1)
    if (a == null) { a = new Array[Long](4); stats.put(v._1, a) }
    var i = 0
    while (i < 4) { a(i) += v._2(i); i += 1 }
  }
  override def merge(other: AccumulatorV2[(Int, Array[Long]), Map[Int, Stat]]): Unit =
    other match {
      case o: ExtractMetricsAcc => o.stats.forEach((k, v) => add((k, v)))
      case _ => throw new UnsupportedOperationException(s"cannot merge $other")
    }
  override def value: Map[Int, Stat] = {
    val b = Map.newBuilder[Int, Stat]
    stats.forEach((k, v) => b += (k.toInt -> Stat(v(0), v(1), v(2), v(3))))
    b.result()
  }
}

object ExtractMetricsAcc {
  /** One partition's counters. `pages` = page rows that joined the fetch
    * (frontier urls with no page row are the epoch-level fetched−pages_hit
    * residual); `parseErrors` = null html or both scan paths threw.
    */
  final case class Stat(pages: Long, bytesHtml: Long, linksOut: Long, parseErrors: Long)
}
