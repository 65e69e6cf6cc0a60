package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming cohort contributions — the incremental counterpart of the
  * batch q41 gate (`Analytics.qCohortRetention`): per user, the
  * first-seen day defines the cohort, and activity is bucketed into
  * whole weeks since that day. This operator emits one FINALIZED row
  * per (user, week) — `(user_id, cohort_day, week, n_events)` — as
  * soon as the watermark closes that week; the cohort×week retention
  * matrix is then a plain (streaming or batch) aggregation over these
  * contributions: `COUNT(*)` per cell is `active_users`,
  * `SUM(n_events)` is `n_events` — exactly q41's cells.
  *
  * Why fMGWS and not a windowed aggregation: the week index is
  * relative to each USER's first event (`datediff div 7` from a
  * per-key minimum), not to any fixed calendar grid — no built-in
  * window can express per-key-anchored buckets. The per-user minimum
  * is safe to freeze under the watermark: once any event is seen, new
  * events carry `ts > wm`, so as soon as `wm ≥` the current minimum no
  * earlier first-event can still arrive and the cohort day is final;
  * week k then closes when `wm ≥ cohort + 7·(k+1)` days (no event
  * inside the week can still arrive).
  *
  * State per key: the cohort day plus per-day counts for OPEN weeks
  * only — bounded by the watermark delay in days + 7, never stream
  * length. Quiet users drain by event-time timeout (weeks close on
  * watermark advance alone), and a user with no open days keeps just
  * the single cohort-day row.
  */
object StreamingCohort {

  final case class Tick(user_id: Long, ts: Timestamp)

  /** One finalized cell contribution. */
  final case class Contribution(user_id: Long, cohort_day: Long,
      week: Long, n_events: Long)

  /** Per-key state: first-seen day (epoch-day index) and per-OPEN-DAY
    * event counts. Days, not weeks: while the cohort day is still
    * above the watermark a new event may LOWER it (late-but-valid
    * arrivals inside the delay), which would shift every relative week
    * index — so bucketing into weeks happens only at close time, when
    * the cohort is provably final (a week can only close once the
    * watermark is past its end, which is past the cohort day).
    */
  final case class Buf(cohortDay: Long, days: Map[Long, Long])

  private val DayMs = 86400000L

  /** events: (user_id, ts). Emits finalized (user, cohort, week,
    * n_events) contributions in append mode.
    */
  def contributions(events: DataFrame,
      watermarkDelay: String = "10 minutes"): Dataset[Contribution] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("ts"))
      .withWatermark("ts", watermarkDelay)
      .as[Tick]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(update)
  }

  private[graft] def update(key: Long, it: Iterator[Tick],
      state: GroupState[Buf]): Iterator[Contribution] = {
    val wm = state.getCurrentWatermarkMs
    val prior = state.getOption
    // floorDiv, not /: `/` truncates toward zero, so pre-1970 event
    // times would collapse days -1..0 into one double-width epoch-day
    // (the q40 negative-domain bucketing lesson, applied here too)
    val arrived = if (state.hasTimedOut) Nil
      else it.map(t => Math.floorDiv(t.ts.getTime, DayMs)).toSeq
    val cohort = (prior.map(_.cohortDay).toSeq ++ arrived).minOption match {
      case None => return Iterator.empty
      case Some(c) => c
    }
    val days = arrived.foldLeft(prior.map(_.days).getOrElse(Map.empty[Long, Long])) {
      (m, d) => m.updated(d, m.getOrElse(d, 0L) + 1L)
    }
    // week k spans days [cohort + 7k, cohort + 7(k+1)); a day's week
    // closes once the watermark reaches the first instant after the
    // week's last day — by which point the cohort is final (the week
    // end is past the cohort day, so no earlier first-event can arrive)
    // floorDiv for symmetry with the day bucketing (d >= cohort makes
    // these safe today, but the invariant shouldn't be load-bearing)
    def weekEnd(d: Long): Long =
      (cohort + 7 * (Math.floorDiv(d - cohort, 7L) + 1)) * DayMs
    val (closed, open) = days.partition { case (d, _) => weekEnd(d) <= wm }
    val out = closed.toSeq
      .groupMapReduce { case (d, _) => Math.floorDiv(d - cohort, 7L) } (_._2)(_ + _)
      .toSeq.sorted
      .map { case (wk, n) => Contribution(key, cohort, wk, n) }
    state.update(Buf(cohort, open))
    // next close: the oldest open day's week end (quiet users drain on
    // watermark advance alone); a user with no open days sits on the
    // single cohort-day row and needs no timeout
    open.keys.map(weekEnd).minOption
      .foreach(t => state.setTimeoutTimestamp(math.max(t, wm + 1)))
    out.iterator
  }
}
