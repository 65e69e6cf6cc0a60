package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming hourly anomaly detection — the live counterpart of the
  * batch q39 gate (`Analytics.qAnomaly`): hourly event counts per type
  * on a stream, flagged against a STATIC per-type baseline trained on
  * a historical corpus (`Analytics.hourlyStats`). This is the
  * production monitoring shape: last snapshot's statistics score this
  * hour's traffic.
  *
  * Plan shape: watermarked tumbling-window aggregation (append mode —
  * a window emits once, when the watermark passes its end) followed by
  * a stream-static broadcast join against the #types-row baseline and
  * the same pure-bigint z-test as the batch gate
  * (`(n·x − S)² > 4(nQ − S²)`), so batch and stream cannot disagree on
  * a borderline hour. State is one count per open (type, window) —
  * eviction driven by the watermark.
  */
object AnomalyDetect {

  /** `events` needs `event_type` and event-time `ts`; `stats` is the
    * (event_type, n, sx, sq) baseline frame.
    */
  def flags(events: DataFrame, stats: DataFrame,
      watermarkDelay: String = "2 hours"): DataFrame = {
    val hourly = events
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("event_type"), window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("x"))
    val dev = col("n") * col("x") - col("sx")
    hourly.join(broadcast(stats), Seq("event_type"))
      .filter(dev * dev > lit(4L) * (col("n") * col("sq") - col("sx") * col("sx")))
      .select(col("event_type"), col("w.start").as("h"), col("x"),
        (dev > 0).as("spike"))
  }
}
