package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the `events` stream table shape
  * (event_id, ts, user_id, event_type, value, props). The reference has no
  * event-time notion (SURVEY.md §1.3 — the crawl itself is deliberately
  * batch-epoch), so these are the engine's forward-looking streaming surface:
  * watermarked windowed aggregation and custom keyed state via
  * flatMapGroupsWithState, per the builder-prompt streaming checklist row.
  *
  * Both transforms are pure DataFrame→DataFrame functions: they run
  * identically on a `readStream` source (incl. MemoryStream in tests) and on
  * batch frames.
  */
object EventStream {

  final case class Event(
      event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

  final case class Session(
      user_id: Long,
      session_start: Timestamp,
      session_end: Timestamp,
      n_events: Long,
      total_value: Double)

  /** flatMapGroupsWithState state record (public: Spark's state encoder
    * generates constructor calls in codegen'd Java).
    */
  final case class SessionState(start: Long, last: Long, n: Long, total: Double)

  /** Watermarked sliding-window counts per event type: late data beyond the
    * watermark is dropped; windows finalize when the watermark passes.
    */
  def windowedCounts(events: DataFrame, watermark: String = "10 minutes",
      windowLen: String = "1 hour", slide: String = "1 hour"): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("event_type"),
        col("cnt"), col("total_value"))

  /** Ingest-time exact dedup with BOUNDED state — the streaming face of the
    * URL-seen problem (the reference's unbounded in-heap visited set): the
    * first record per key is emitted, later duplicates arriving within the
    * watermark horizon are dropped, and per-key state older than the
    * watermark is evicted, so state size tracks the horizon, not the stream.
    * Duplicates straggling in beyond the watermark are late data by contract
    * (same drop rule as windowed aggregation).
    */
  def dedupeStream(events: DataFrame, keys: Seq[String] = Seq("event_id"),
      watermark: String = "10 minutes"): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Timestamp ↔ microseconds (java.sql.Timestamp is millis + nanos; a bare
    * getTime would truncate the table's microsecond event times).
    */
  private def tsMicros(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
  private def microsTs(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }

  /** Gap-based sessionization via flatMapGroupsWithState: a session closes
    * when no event arrives for `gapMinutes` of event time (enforced by an
    * event-time timeout keyed to the watermark). State tracks MICROSECOND
    * event times — the events table carries µs precision and session bounds
    * must round-trip it exactly.
    */
  def sessionize(events: Dataset[Event], watermark: String = "10 minutes",
      gapMinutes: Int = 30): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60000000L

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, microsTs(s.start),
              microsTs(s.last), s.n, s.total))
          } else {
            val sorted = rows.toSeq.sortBy(e => tsMicros(e.ts))
            var closed = List.empty[Session]
            var cur = state.getOption
            for (e <- sorted) {
              val t = tsMicros(e.ts)
              cur match {
                case Some(s) if t - s.last <= gapUs =>
                  cur = Some(SessionState(s.start, math.max(s.last, t),
                    s.n + 1, s.total + e.value))
                case Some(s) =>
                  closed ::= Session(userId, microsTs(s.start),
                    microsTs(s.last), s.n, s.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // timeout API is millisecond-granular: round UP so a session
              // can never time out before its full event-time gap elapses
              state.setTimeoutTimestamp((s.last + gapUs + 999L) / 1000L)
            }
            closed.reverseIterator
          }
      }
  }
}
