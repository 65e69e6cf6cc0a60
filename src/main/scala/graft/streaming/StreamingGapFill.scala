package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-fill / last-value emit — the incremental counterpart
  * of the batch q36 gate (`Analytics.qGapFill`): each user's event
  * stream becomes a regular hourly series with hours of silence
  * carrying the last observed value forward, emitted live as the
  * watermark closes each hour instead of in one batch pass.
  *
  * No built-in streaming operator expresses this: a windowed
  * aggregation emits only OBSERVED windows (the filled rows are
  * precisely the windows with no input), and `last().over(...)` is a
  * batch window. So this is the `flatMapGroupsWithState` formulation
  * (the Sessionize/StreamingFunnel shape), keyed by user:
  *
  *  - an hour H of user u is emittable once (a) some event of u at
  *    hour ≥ H exists — q36's grid spans [first, last] observed hours,
  *    so H is provably inside the grid whatever arrives later — and
  *    (b) the watermark has passed the end of H, so H's closing value
  *    (latest ts, event_id tie-break) and the carry into H are final;
  *  - state per key is the carry value plus the per-hour closing
  *    candidates of the hours still above the watermark — bounded by
  *    the watermark delay, never by stream length;
  *  - emitted hours are dropped from state and late-below-watermark
  *    events for them are discarded on arrival (a closed frame can
  *    never re-open — the r9 fMGWS lesson);
  *  - an event-time timeout at the next hour boundary makes watermark
  *    advance alone drain a silent key (the StreamingAsOf lesson).
  *
  * Equivalence with the batch operator on the same finite input —
  * including randomized cross-batch disorder — is pinned by
  * StreamingGapFillSpec.
  */
object StreamingGapFill {

  private val HourMs = 3600000L

  /** One input event. */
  final case class Ev(user_id: Long, ts: Timestamp, event_id: Long,
      value: Double)

  /** One emitted series point (hour start, observed-vs-filled, value). */
  final case class Point(user_id: Long, h: Timestamp, observed: Boolean,
      value_ff: Double)

  /** Closing-value candidate for one open hour (ms epoch). */
  final case class Open(h: Long, ts: Long, eid: Long, v: Double)

  /** Per-key state: whether any hour was emitted yet, next hour to
    * emit (meaningful once `started`), carry value (last emitted
    * closing value), max observed hour, and the open hours' closing
    * candidates.
    */
  final case class Buf(started: Boolean, nextH: Long, carry: Double,
      hasCarry: Boolean, maxH: Long, open: Seq[Open])

  /** events: (user_id, ts, event_id, value). */
  def fill(events: DataFrame,
      watermarkDelay: String = "10 minutes"): Dataset[Point] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withWatermark("ts", watermarkDelay)
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(step)
  }

  private def hourOf(tsMs: Long): Long = Math.floorDiv(tsMs, HourMs)

  /** Later (ts, event_id) wins — q36's closing-value order. */
  private def better(a: Open, b: Open): Open =
    if (a.ts > b.ts || (a.ts == b.ts && a.eid >= b.eid)) a else b

  private def step(user: Long, it: Iterator[Ev],
      state: GroupState[Buf]): Iterator[Point] = {
    val wm = state.getCurrentWatermarkMs
    val prior = state.getOption

    // fold arrivals into per-hour closing candidates. The emission
    // fence applies only once emission has STARTED: before that, a
    // later micro-batch may legally carry an earlier (above-watermark)
    // hour that extends the grid downward; after it, any event under
    // nextH is for an hour already emitted — necessarily a
    // late-below-watermark straggler (hours only close when the
    // watermark passes them) — and is discarded, because a closed
    // frame never re-opens. (Hour indices may be negative for pre-1970
    // event times, so "fresh" is prior.isEmpty, never a sentinel — the
    // q40 negative-domain lesson.)
    val arrived = (if (state.hasTimedOut) Iterator.empty else it)
      .map(e => Open(hourOf(e.ts.getTime), e.ts.getTime, e.event_id, e.value))
      .filter(o => prior.forall(p => !p.started || o.h >= p.nextH))
      .toSeq
    val openMap = (prior.map(_.open).getOrElse(Nil) ++ arrived)
      .groupBy(_.h).view.mapValues(_.reduce(better)).toMap
    if (openMap.isEmpty && prior.isEmpty) return Iterator.empty

    val maxH = (prior.map(_.maxH).getOrElse(Long.MinValue) +:
      arrived.map(_.h)).max
    // until emission starts, the grid start floats down with whatever
    // earlier hours arrive (openMap is non-empty then: a fresh key has
    // arrivals, and an unstarted saved key keeps all its opens)
    val started0 = prior.exists(_.started)
    var nextH = if (started0) prior.get.nextH else openMap.keys.min
    var carry = prior.map(_.carry).getOrElse(0.0)
    var hasCarry = prior.exists(_.hasCarry)

    // emit every closed hour inside the observed span
    val out = Seq.newBuilder[Point]
    while (nextH <= maxH && (nextH + 1) * HourMs <= wm) {
      openMap.get(nextH) match {
        case Some(o) =>
          carry = o.v; hasCarry = true
          out += Point(user, new Timestamp(nextH * HourMs), observed = true, o.v)
        case None =>
          // nextH > first observed hour by construction, so carry is set
          out += Point(user, new Timestamp(nextH * HourMs), observed = false, carry)
      }
      nextH += 1
    }

    val emitted = out.result()
    val remaining = openMap.view.filterKeys(_ >= nextH).values.toSeq
    // State is NEVER removed: a gap-fill series has no completion
    // point — a future (above-watermark) event at hour H' > maxH must
    // emit the silent hours in between with the carry, and the fence
    // nextH is what stops a late-below-watermark straggler from
    // re-emitting closed hours. The retained Buf is a handful of
    // scalars per drained key (open = Nil), the price of both.
    state.update(Buf(started0 || emitted.nonEmpty, nextH, carry,
      hasCarry, maxH, remaining))
    if (nextH <= maxH)
      // wake when the watermark closes the next pending hour; a fully
      // drained key registers no timeout — only new data revives it
      state.setTimeoutTimestamp((nextH + 1) * HourMs)
    emitted.iterator
  }
}
