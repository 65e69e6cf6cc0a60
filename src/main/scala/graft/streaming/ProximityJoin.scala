package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming temporal proximity join — the stream-stream counterpart of
  * the batch q37 gate (`Analytics.qProximityJoin`): pairs of same-type
  * events from DIFFERENT users where the second lands within
  * `windowSeconds` of the first, emitted continuously as both sides
  * arrive.
  *
  * This is Spark's native stream-stream interval join (SURVEY §2.10
  * surface): both sides carry event-time watermarks and the join
  * condition bounds `tb` inside `(ta, ta + window]`, which is exactly
  * the shape the state store needs to EVICT — each side's rows are
  * retained only until the other side's watermark passes their
  * join-reachable horizon, so state is bounded by
  * (arrival rate × (watermark delay + window)), never by stream
  * length. The equality leg (`event_type`) keys the state store, so
  * matching is a hash lookup per input row, not a scan.
  *
  * Batch parity: the inner join emits exactly the pairs the batch
  * formulation counts; `ProximityJoinSpec` pins multiset equality on a
  * randomized stream split across micro-batches.
  */
object ProximityJoin {

  def pairs(events: DataFrame, windowSeconds: Int,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val lead = events
      .select(col("event_type"), col("user_id").as("ua"),
        col("event_id").as("ea"), col("ts").as("ta"))
      .withWatermark("ta", watermarkDelay)
    val follow = events
      .select(col("event_type").as("et_b"), col("user_id").as("ub"),
        col("event_id").as("eb"), col("ts").as("tb"))
      .withWatermark("tb", watermarkDelay)
    lead.join(follow,
        col("event_type") === col("et_b") &&
        col("ua") =!= col("ub") &&
        col("tb") > col("ta") &&
        col("tb") <= col("ta") + expr(s"interval $windowSeconds seconds"))
      .select(col("event_type"), col("ua"), col("ub"),
        col("ea"), col("eb"), col("ta"), col("tb"))
  }
}
