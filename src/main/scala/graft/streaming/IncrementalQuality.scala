package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.Expectations

/** Incremental data-quality trend state for the monthly-drop pipeline
  * (r13, VERDICT #7): run the expectations rule pass and a t62-style
  * volume rollup over EACH drop's batch and publish them as epoch
  * state, so the recurring pipeline reports quality trends without
  * ever re-scanning the accumulated corpus — the t88/t62 discipline
  * composed onto the [[StreamingState]] epoch layout.
  *
  * Per batch, ONE aggregation pass ([[Expectations.evaluate]], the
  * same builder gate t88 certifies) produces:
  *
  *  - `report`  — (epoch, rule, n_violations, pass): this drop's rule
  *    counts, rules-sized;
  *  - `profile` — (epoch, n_docs, n_chars): this drop's volume row.
  *
  * Both commit atomically under the batch's epoch marker; replays of a
  * committed batch id return the persisted report. Nothing here is
  * ever state-sized: per-drop writes are rules-sized, and the trend /
  * cumulative reads union rules × epochs rows — the whole point is
  * that corpus-wide totals FOLD (row-rule violation counts and volume
  * sums are additive across disjoint drops), so [[readTotals]] is a
  * sum over tiny per-epoch rows, not a corpus scan. Within-drop id
  * uniqueness is the one intentionally batch-scoped rule: cross-drop
  * re-sends are not errors (the dedup index anti-joins them away);
  * a global-uniqueness total would be wrong to fold, so it is not
  * offered.
  */
object IncrementalQuality {

  private val reportSchema: StructType = StructType(Seq(
    StructField("epoch", LongType, nullable = true),
    StructField("rule", StringType, nullable = true),
    StructField("n_violations", LongType, nullable = true),
    StructField("pass", BooleanType, nullable = true)))

  private val profileSchema: StructType = StructType(Seq(
    StructField("epoch", LongType, nullable = true),
    StructField("n_docs", LongType, nullable = true),
    StructField("n_chars", LongType, nullable = true)))

  /** The drop-batch rule set — over the (doc_id, text) schema drops
    * actually carry. Invariants break promotion; screens (empty/short
    * docs) are feed-health trend material.
    */
  def dropRules: Seq[Expectations.Rule] = Seq(
    Expectations.rowRule("doc_id_not_null", col("doc_id").isNull),
    Expectations.unique("doc_id_unique_in_batch", col("doc_id")),
    Expectations.rowRule("text_not_null", col("text").isNull),
    Expectations.rowRule("text_not_empty",
      length(trim(col("text"))) === 0, Expectations.Screen),
    Expectations.rowRule("short_doc",
      length(col("text")) < 20, Expectations.Screen))

  /** Evaluate the drop rules + volume profile over one batch and
    * commit both atomically under `batchId`; returns the batch's
    * (rule, n_violations, pass) report. Replays return the persisted
    * report.
    */
  def processBatch(batch: DataFrame, path: String, batchId: Long): DataFrame = {
    val spark = batch.sparkSession
    StreamingState.guardEpochLayout(spark, path, "IncrementalQuality")
    if (StreamingState.isCommitted(spark, path, batchId))
      return spark.read.schema(reportSchema)
        .parquet(StreamingState.epochRel(path, batchId, "report"))
        .drop("epoch")
    val report = Expectations.evaluate(batch, dropRules)
      .select(lit(batchId).as("epoch"), col("rule"), col("n_violations"),
        col("pass"))
    val profile = batch.agg(
        count(lit(1)).as("n_docs"),
        coalesce(sum(length(col("text"))), lit(0L)).cast("long").as("n_chars"))
      .select(lit(batchId).as("epoch"), col("n_docs"), col("n_chars"))
    StreamingState.commitAppend(spark, path, batchId,
      Map("report" -> report, "profile" -> profile))
    spark.read.schema(reportSchema)
      .parquet(StreamingState.epochRel(path, batchId, "report"))
      .drop("epoch")
  }

  /** Per-drop rule counts across every committed epoch — the quality
    * trend a dashboard plots (epoch ascending, rule).
    */
  def readTrend(spark: SparkSession, path: String): DataFrame = {
    StreamingState.guardEpochLayout(spark, path, "IncrementalQuality")
    StreamingState.readCommittedDeltas(spark, path, "report", reportSchema)
      .orderBy(col("epoch"), col("rule"))
  }

  /** Per-drop volume rows (epoch, n_docs, n_chars), epoch ascending. */
  def readProfile(spark: SparkSession, path: String): DataFrame = {
    StreamingState.guardEpochLayout(spark, path, "IncrementalQuality")
    StreamingState.readCommittedDeltas(spark, path, "profile", profileSchema)
      .orderBy(col("epoch"))
  }

  /** Cumulative rule totals over all drops so far — additive across
    * disjoint batches for every offered rule (the batch-scoped
    * uniqueness rule is summed as "violations seen", documented
    * above). Rules × 1 rows, derived from the rules × epochs trend.
    */
  def readTotals(spark: SparkSession, path: String): DataFrame =
    readTrend(spark, path)
      .groupBy(col("rule"))
      .agg(sum(col("n_violations")).as("n_violations"))
      .withColumn("pass", col("n_violations") === 0L)
      .orderBy(col("rule"))
}
