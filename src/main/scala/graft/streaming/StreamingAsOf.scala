package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of join — the stateful counterpart of the batch
  * `operators.AsOfJoin.backward` gate (q23/q32 surface): each probe
  * event (a trade) is matched with the latest build event (a quote) of
  * the same key at-or-before its event time, on live streams with
  * out-of-order arrivals.
  *
  * Spark has no native stream-stream as-of join (the interval join
  * emits EVERY in-range pair, not the latest-before), so this is the
  * `flatMapGroupsWithState` formulation (SURVEY §2.10's custom-state
  * shape, like Sessionize): both sides union into one keyed stream; a
  * probe resolves only when the WATERMARK passes its timestamp —
  * at that point no earlier build event can still arrive, so the
  * buffered build history below the probe's time is complete and the
  * match is exactly the batch answer. Batch-streaming equivalence is
  * pinned by StreamingAsOfSpec on randomized disordered streams.
  *
  * State per key is bounded by the watermark delay: pending probes
  * younger than the watermark, build events younger than the
  * watermark, and ONE resolved build row at-or-below it (the match
  * candidate for future probes) — never unbounded history.
  *
  * Semantics match the batch operator: inclusive ties (a build at
  * exactly the probe's timestamp is eligible), largest tie-break wins
  * among equal-timestamp builds, null payload when no build qualifies.
  */
object StreamingAsOf {

  /** One tagged input event: `side` 0 = probe, 1 = build. */
  final case class Tick(key: String, ts: Timestamp, side: Int,
      id: Long, value: Double)

  /** Emitted resolution of one probe. */
  final case class Matched(key: String, probe_id: Long, ts: Timestamp,
      px: Option[Double])

  /** Per-key buffers (ms epoch times; ordering restored on resolve). */
  final case class Buf(probes: Seq[(Long, Long)],
      builds: Seq[(Long, Long, Double)])

  /** probes: (key, id, ts); builds: (key, ts, id, value). `id` on the
    * build side is the tie-break among equal timestamps.
    */
  def backward(probes: DataFrame, builds: DataFrame,
      watermarkDelay: String = "10 minutes"): Dataset[Matched] = {
    val spark = probes.sparkSession
    import spark.implicits._
    val tagged = probes
      .select(col("key"), col("ts"), lit(0).as("side"), col("id"),
        lit(0.0).as("value"))
      .unionByName(builds.select(col("key"), col("ts"), lit(1).as("side"),
        col("id"), col("value")))
      .withWatermark("ts", watermarkDelay)
      .as[Tick]
    tagged
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(update)
  }

  /** Resolve every pending probe the watermark has passed: its build
    * history is complete, so the latest (ts, tie) build at-or-before
    * the probe's time is final. Returns the emissions and the trimmed
    * state.
    */
  private def resolve(key: String, buf: Buf, wm: Long): (Seq[Matched], Buf) = {
    val (ready, pending) = buf.probes.partition(_._2 <= wm)
    val out = ready.sortBy(p => (p._2, p._1)).map { case (pid, pts) =>
      val m = buf.builds.filter(_._1 <= pts)
      val px = if (m.isEmpty) None else Some(m.maxBy(b => (b._1, b._2))._3)
      Matched(key, pid, new Timestamp(pts), px)
    }
    // build history: everything above the watermark stays (future
    // probes may precede it), plus the single best row at-or-below it
    // (the standing match candidate)
    val (old, young) = buf.builds.partition(_._1 <= wm)
    val keep = if (old.isEmpty) young
      else old.maxBy(b => (b._1, b._2)) +: young
    (out, Buf(pending, keep))
  }

  private[graft] def update(key: String, it: Iterator[Tick],
      state: GroupState[Buf]): Iterator[Matched] = {
    val wm = state.getCurrentWatermarkMs
    val prior = state.getOption.getOrElse(Buf(Nil, Nil))
    val arrived = if (state.hasTimedOut) prior else {
      val ticks = it.toSeq
      Buf(prior.probes ++ ticks.filter(_.side == 0)
            .map(t => (t.id, t.ts.getTime)),
        prior.builds ++ ticks.filter(_.side == 1)
          .map(t => (t.ts.getTime, t.id, t.value)))
    }
    val (out, next) = resolve(key, arrived, wm)
    if (next.probes.isEmpty && next.builds.isEmpty) state.remove()
    else {
      state.update(next)
      // fire when the watermark passes the oldest pending probe OR the
      // oldest still-young build (so a key left with only build rows is
      // trimmed to its single standing candidate by watermark advance
      // alone — without this, a quiet key retained every build forever
      // and "state bounded by the watermark delay" held only for keys
      // that kept ticking). Once only the standing at-or-below-wm row
      // remains, no timeout is registered: O(1) state, nothing to trim.
      // Spark requires a timestamp strictly above the current watermark.
      val probeFire = next.probes.map(_._2).minOption
      val buildFire = next.builds.map(_._1).filter(_ > wm).minOption
      (probeFire.toSeq ++ buildFire.toSeq).minOption
        .foreach(t => state.setTimeoutTimestamp(math.max(t, wm + 1)))
    }
    out.iterator
  }
}
