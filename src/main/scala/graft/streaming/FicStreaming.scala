package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.Row
import graft.fic.{FicLookup, FicSchema, FicTransform}

/** Structured-Streaming surface (SURVEY §2.10): the reference's
  * monthly-folder batch workflow upgraded to an incremental pipeline.
  *
  *  - [[rawJsonStream]] + [[transformStream]]: file-source streaming of
  *    raw FIC documents through the (stateless, shuffle-free) transform
  *    chain — each micro-batch is exactly the batch semantics;
  *  - [[upsertSink]]: `foreachBatch` applying the latest-wins upsert per
  *    micro-batch, which is the reference's per-folder load loop;
  *    no watermark is needed for correctness because the upsert is
  *    idempotent-by-recency (late files lose to newer fecha_corte).
  *  - [[eventCounts]]: watermarked tumbling-window aggregation over an
  *    event stream — the standard stateful-aggregation surface, exposed
  *    for the events-shaped data.
  */
object FicStreaming {

  /** File-source stream of raw FIC JSON documents. */
  def rawJsonStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .option("multiLine", true)
      .option("pathGlobFilter", "*.json")
      .option("maxFilesPerTrigger", 100)
      .schema(FicSchema.raw)
      .json(dir)
      // percent-only decode: input_file_name() percent-encodes (see
      // FicSources.percentDecode — plain url_decode would eat '+')
      .withColumn("filename", regexp_extract(
        graft.sources.FicSources.percentDecode(input_file_name()),
        "([^/]+)$", 1))

  /** The 8-pass chain applied to a streaming DataFrame — stateless
    * narrow ops only, so it lifts to streaming unchanged.
    */
  def transformStream(raw: DataFrame, lookup: FicLookup): DataFrame =
    FicTransform(raw, lookup)

  /** foreachBatch sink running a caller-provided batch merge (e.g.
    * FicUpsert against a snapshot table).
    */
  def upsertSink(transformed: DataFrame)(merge: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    transformed.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch((batch: DataFrame, id: Long) => merge(batch, id))

  /** Watermarked tumbling-window counts over an event stream with
    * event-time column `ts`.
    */
  def eventCounts(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
}
