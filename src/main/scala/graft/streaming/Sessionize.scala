package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization — the stateful counterpart of the batch
  * q28 gate (Analytics.qSessionize): split each user's event stream on
  * >gap quiet periods, emitting a session row the moment it CLOSES
  * (a later event opens the next session, or event-time timeout says
  * no in-gap event can still arrive).
  *
  * This is the `flatMapGroupsWithState` shape of SURVEY §2.10: custom
  * per-key state (the one open session), event-time timeout wired to
  * the watermark, Append output. State per user is O(1) — four longs —
  * and closed sessions leave state immediately, so a 1000-executor job
  * holds #active-users tiny records, not event history. Out-of-order
  * events inside the watermark are handled (each micro-batch's slice is
  * sorted before folding); events later than the watermark are dropped
  * by the watermark itself, which is the contract that lets state stay
  * bounded.
  *
  * Money sums fold in integer cents ([[graft.Det]] discipline) so the
  * emitted `session_value` is independent of micro-batch boundaries
  * and event order.
  */
object Sessionize {

  /** Input slice: one event of a user's stream. */
  final case class Event(user_id: Long, ts: Timestamp, value: Double)

  /** Per-key state: the one open session (epoch millis + exact cents). */
  final case class Open(startMs: Long, lastMs: Long, n: Long, cents: Long)

  /** Emitted when a session closes. */
  final case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, session_value: Double)

  /** Sessionize a streaming frame with `user_id`, event-time `ts` and
    * `value` columns. `minEvents` mirrors the batch gate's n≥3 filter
    * when set; the default emits every session.
    */
  def sessions(events: DataFrame, gapMinutes: Int = 30,
      watermarkDelay: String = "2 hours", minEvents: Long = 1L): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes.toLong * 60 * 1000
    events
      .select(col("user_id").cast("long").as("user_id"), col("ts"),
        col("value").cast("double").as("value"))
      .withWatermark("ts", watermarkDelay)
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        update(gapMs, minEvents))
  }

  private def toSession(uid: Long, s: Open): Session =
    Session(uid, new Timestamp(s.startMs), new Timestamp(s.lastMs), s.n,
      s.cents / 100.0)

  private def update(gapMs: Long, minEvents: Long)(
      uid: Long, events: Iterator[Event],
      state: GroupState[Open]): Iterator[Session] = {
    if (state.hasTimedOut) {
      // no event within gap of the open session can still arrive
      // (timeout only fires past the watermark): close and clear
      val out = state.getOption.filter(_.n >= minEvents).map(toSession(uid, _))
      state.remove()
      out.iterator
    } else {
      val closed = Seq.newBuilder[Session]
      var open = state.getOption
      events.toSeq.sortBy(e => (e.ts.getTime, e.value)).foreach { e =>
        val t = e.ts.getTime
        val cents = math.round(e.value * 100)
        open match {
          case Some(s) if t - s.lastMs > gapMs =>
            if (s.n >= minEvents) closed += toSession(uid, s)
            open = Some(Open(t, t, 1L, cents))
          case Some(s) =>
            open = Some(Open(s.startMs, math.max(s.lastMs, t), s.n + 1, s.cents + cents))
          case None =>
            open = Some(Open(t, t, 1L, cents))
        }
      }
      open.foreach { s =>
        state.update(s)
        // must exceed the current watermark or Spark rejects it; the
        // max() only binds when the open session is already older than
        // the watermark, where the timeout then fires next batch
        state.setTimeoutTimestamp(
          math.max(s.lastMs + gapMs, state.getCurrentWatermarkMs + 1))
      }
      closed.result().iterator
    }
  }
}
