package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming analytics over the events stream: watermarked tumbling-window
  * aggregation and custom stateful sessionization — the north-star
  * streaming surface (the reference itself has no real streaming; its
  * 30-minute poll is covered by [[FileStreamIngest]]).
  *
  * Scale notes: windowed aggregation state is bounded by the watermark
  * (late data beyond 10 min is dropped, state evicted); sessionization
  * state is per-key and evicted via processing-time timeout, so state size
  * tracks ACTIVE users, not history. Both run identically on a cluster —
  * state lives in the HDFS-backed state store, keyed by the shuffle
  * partition.
  */
object StreamingAnalytics {

  /** Tumbling 1-minute per-type counts with a 10-minute watermark (late
    * rows older than the watermark are dropped; window state is evicted
    * once the watermark passes — bounded state at any scale).
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(
        col("window.start").as("win_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Stream-stream event-time join: match each impression with clicks on
    * the same key arriving within `windowMinutes` after it. Watermarks on
    * BOTH sides plus the time-range join condition let the engine evict
    * buffered rows once they can no longer match — state is bounded by
    * (watermark delay + window), not by stream length, which is what makes
    * an unbounded⋈unbounded join feasible at all.
    *
    * Expects `impressions(key, imp_ts, …)` and `clicks(key_c, click_ts, …)`.
    */
  def joinWithinWindow(
      impressions: DataFrame,
      clicks: DataFrame,
      windowMinutes: Int = 10,
      watermarkDelay: String = "10 minutes"): DataFrame =
    impressions.withWatermark("imp_ts", watermarkDelay)
      .join(
        clicks.withWatermark("click_ts", watermarkDelay),
        expr(s"""key = key_c AND
                |click_ts >= imp_ts AND
                |click_ts <= imp_ts + interval $windowMinutes minutes""".stripMargin))

  /** Stream-static enrichment join: each micro-batch of the stream joins
    * against a static dimension (re-read per batch, so slowly-changing
    * dims pick up updates). The static side broadcasts when small — the
    * stream is never shuffled for the join, which is the only sane shape
    * when the stream side is unbounded.
    */
  def enrich(
      stream: DataFrame,
      dim: DataFrame,
      on: Seq[String]): DataFrame =
    stream.join(org.apache.spark.sql.functions.broadcast(dim), on, "left")

  /** Streaming dedup: drop re-deliveries of the same `idCols` arriving
    * within the watermark window. `dropDuplicatesWithinWatermark` keeps
    * per-key state only until the watermark passes it — bounded state at
    * any scale (a plain streaming dropDuplicates would retain every key
    * forever), which makes at-least-once sources effectively exactly-once
    * for downstream aggregation.
    */
  def dedupStream(
      events: DataFrame,
      idCols: Seq[String],
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(idCols)

  final case class Event(user_id: Long, ts: Timestamp, event_type: String)
  final case class SessionUpdate(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long, closed: Boolean)
  final case class SessionState(
      start: Long, last: Long, n: Long)

  /** Custom stateful sessionization (flatMapGroupsWithState): a session
    * closes after `gapMs` of EVENT-TIME silence per user — either a later
    * event of the same user arrives past the gap, or the watermark passes
    * `last + gapMs` (event-time timeout) and the state is evicted with a
    * final closed record. ≡ the batch q06_sessionize semantics, continuously.
    *
    * Event-time (not processing-time) timeout on purpose: semantics are
    * deterministic w.r.t. the data (replayable, testable), and the engine
    * only schedules extra batches when the watermark actually advances —
    * a processing-time timeout makes every batch schedule a successor
    * (FlatMapGroupsWithStateExec.shouldRunAnotherBatch is uncondition-
    * ally true there), which busy-loops micro-batches on an idle stream.
    */
  def sessionize(
      events: Dataset[Event],
      gapMs: Long = 30L * 60 * 1000,
      watermarkDelay: String = "10 minutes"): Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionUpdate](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionUpdate(
              userId, new Timestamp(s.start), new Timestamp(s.last), s.n, closed = true))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var out = List.empty[SessionUpdate]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(s.copy(last = t, n = s.n + 1))
                case Some(s) => // gap exceeded: close previous, open new
                  out ::= SessionUpdate(
                    userId, new Timestamp(s.start), new Timestamp(s.last), s.n, closed = true)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // evict once the watermark passes the session gap; max() guards
              // the "timeout must exceed current watermark" engine check when
              // a straggler row arrives just ahead of the watermark
              state.setTimeoutTimestamp(math.max(
                s.last + gapMs, state.getCurrentWatermarkMs() + 1))
            }
            out.reverseIterator
          }
      }
  }
}
