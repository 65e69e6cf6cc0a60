package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming funnel conversion — the incremental counterpart of the
  * batch q40 gate (`Analytics.qFunnel`): each signup event resolves to
  * converted/not-converted (a purchase by the same user inside
  * `(tsu, tsu + window]`) on live streams with out-of-order arrivals.
  *
  * Spark's interval join emits every qualifying PAIR, but the funnel
  * wants one EXISTENCE verdict per signup — including the negative
  * verdict, which no inner join can emit — so this is the
  * `flatMapGroupsWithState` formulation (the Sessionize/StreamingAsOf
  * shape): both sides union into one user-keyed stream; a signup
  * resolves exactly when the WATERMARK passes `tsu + window`, at which
  * point no purchase inside its window can still arrive and the
  * verdict equals the batch answer. Batch-streaming equivalence is
  * pinned by StreamingFunnelSpec on randomized disordered streams.
  *
  * State per key is bounded by window + watermark delay: pending
  * signups (those with `tsu + window` above the watermark) and
  * purchases with `tp > wm − window` (any signup still resolvable has
  * `tsu > wm − window`, so its window lies entirely above that line —
  * older purchases can never decide anything again). Purchase-only
  * keys register an event-time timeout too (the StreamingAsOf r9
  * lesson), so watermark advance alone drains a key that never signs
  * up, and a fully-drained key removes its state outright.
  *
  * Window-edge semantics match the batch operator exactly: a purchase
  * at `tsu` does NOT convert (strict lower bound), a purchase at
  * `tsu + window` DOES (inclusive upper bound).
  */
object StreamingFunnel {

  /** One tagged input event: `side` 0 = signup, 1 = purchase. */
  final case class Tick(user_id: Long, ts: Timestamp, side: Int, sid: Long)

  /** Final verdict for one signup. */
  final case class Converted(user_id: Long, sid: Long, ts: Timestamp,
      converted: Boolean)

  /** Per-key buffers (ms epoch): pending signups (sid, tsu) and the
    * retained purchase times.
    */
  final case class Buf(signups: Seq[(Long, Long)], purchases: Seq[Long])

  /** signups: (user_id, sid, ts); purchases: (user_id, ts). `windowMs`
    * is the conversion window in milliseconds.
    */
  def resolve(signups: DataFrame, purchases: DataFrame, windowMs: Long,
      watermarkDelay: String = "10 minutes"): Dataset[Converted] = {
    val spark = signups.sparkSession
    import spark.implicits._
    val tagged = signups
      .select(col("user_id"), col("ts"), lit(0).as("side"), col("sid"))
      .unionByName(purchases.select(col("user_id"), col("ts"),
        lit(1).as("side"), lit(-1L).as("sid")))
      .withWatermark("ts", watermarkDelay)
      .as[Tick]
    tagged
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(update(windowMs))
  }

  private def update(w: Long)(key: Long, it: Iterator[Tick],
      state: GroupState[Buf]): Iterator[Converted] = {
    val wm = state.getCurrentWatermarkMs
    val prior = state.getOption.getOrElse(Buf(Nil, Nil))
    val arrived = if (state.hasTimedOut) prior else {
      val ticks = it.toSeq
      Buf(prior.signups ++ ticks.filter(_.side == 0)
            .map(t => (t.sid, t.ts.getTime)),
        prior.purchases ++ ticks.filter(_.side == 1).map(_.ts.getTime))
    }
    // a signup is final once the watermark passes its whole window
    val (ready, pending) = arrived.signups.partition(_._2 + w <= wm)
    val out = ready.sortBy(s => (s._2, s._1)).map { case (sid, tsu) =>
      Converted(key, sid, new Timestamp(tsu),
        arrived.purchases.exists(tp => tp > tsu && tp <= tsu + w))
    }
    // purchases at or below wm − w can no longer decide any resolvable
    // signup (those all have tsu > wm − w, window strictly above)
    val keep = arrived.purchases.filter(_ > wm - w)
    if (pending.isEmpty && keep.isEmpty) state.remove()
    else {
      state.update(Buf(pending, keep))
      // fire when the oldest pending signup's window closes, or when
      // the oldest retained purchase ages out (purchase-only keys must
      // drain on watermark advance alone); strictly above wm per Spark
      val signupFire = pending.map(_._2 + w).minOption
      val purchaseFire = keep.map(_ + w).minOption
      (signupFire.toSeq ++ purchaseFire.toSeq).minOption
        .foreach(t => state.setTimeoutTimestamp(math.max(t, wm + 1)))
    }
    out.iterator
  }
}
