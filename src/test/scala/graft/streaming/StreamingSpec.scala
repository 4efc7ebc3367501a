package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.streaming.EventStream.Event

/** Structured-Streaming behavior: watermarked window finalization, late-data
  * drop, and stateful gap sessionization (builder-prompt streaming row).
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(min: Long): Timestamp = new Timestamp(1700000000000L + min * 60000L)

  test("windowed counts finalize on watermark and drop late data") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = EventStream.windowedCounts(input.toDF(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("append").start()
    try {
      // window [t0, t0+60): three clicks; then advance event time far enough
      // that the watermark closes it
      input.addData(
        Event(1, ts(1), 10, "click", 1.0),
        Event(2, ts(5), 11, "click", 2.0),
        Event(3, ts(59), 12, "view", 3.0))
      query.processAllAvailable()
      input.addData(Event(4, ts(200), 13, "click", 4.0)) // watermark → t0+190
      query.processAllAvailable()
      // late arrival for the long-closed first window must be dropped
      input.addData(Event(5, ts(2), 14, "click", 99.0))
      query.processAllAvailable()
      val rows = spark.table("win_counts")
        .select("event_type", "cnt").as[(String, Long)].collect().toSet
      assert(rows.contains(("click", 2L)), rows) // late event 5 NOT counted
      assert(rows.contains(("view", 1L)), rows)
    } finally query.stop()
  }

  test("streaming dedup: first record per key wins, within-watermark duplicates drop") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = EventStream.dedupeStream(input.toDF(), keys = Seq("event_id"),
      watermark = "10 minutes")
      .writeStream.format("memory").queryName("deduped")
      .outputMode("append").start()
    try {
      input.addData(
        Event(1, ts(0), 10, "click", 1.0),
        Event(1, ts(1), 10, "click", 1.0), // dup id, later ts → dropped
        Event(2, ts(2), 11, "view", 2.0))
      query.processAllAvailable()
      input.addData(
        Event(2, ts(3), 11, "view", 2.0), // dup across batches → dropped
        Event(3, ts(4), 12, "click", 3.0))
      query.processAllAvailable()
      val got = spark.table("deduped").select("event_id").as[Long]
        .collect().sorted.toSeq
      assert(got == Seq(1L, 2L, 3L), got.toString)
    } finally query.stop()
  }

  test("sessionize closes sessions on event-time gaps and via timeout") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = EventStream.sessionize(input.toDS(), watermark = "1 minutes",
      gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // user 1: two events 5 min apart (one session), then one 100 min later
      // (gap > 30 → first session closes)
      input.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(5), 1, "view", 2.0))
      query.processAllAvailable()
      input.addData(Event(3, ts(105), 1, "click", 3.0))
      query.processAllAvailable()
      input.addData(Event(4, ts(300), 2, "click", 9.0)) // push watermark far ahead
      query.processAllAvailable()
      input.addData(Event(5, ts(600), 2, "click", 1.0)) // trigger timeouts
      query.processAllAvailable()
      val sessions = spark.table("sessions")
        .as[EventStream.Session].collect().sortBy(_.session_start.getTime)
      val u1 = sessions.filter(_.user_id == 1L)
      assert(u1.length >= 2, sessions.mkString(";"))
      assert(u1.head.n_events == 2 && u1.head.total_value == 3.0)
      assert(u1(1).n_events == 1 && u1(1).total_value == 3.0)
    } finally query.stop()
  }
}
