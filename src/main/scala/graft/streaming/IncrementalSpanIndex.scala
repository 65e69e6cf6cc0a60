package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel
import graft.operators.TrainingOps

/** Incremental exact-substring index (r11, VERDICT #6) — the streaming
  * counterpart of the t82 maximal-span family, closing the gap where
  * the monthly-drop driver deduplicated by MinHash only and a verbatim
  * quote spanning two DROPS (the t82 class: same ≥50-token passage,
  * arbitrary alignment, too little whole-document overlap for LSH)
  * went unseen.
  *
  * The persisted artifact is t82's seeding relation itself: one row
  * per stride-1 token window, (doc_id, pos, h64) with h64 the 60-bit
  * md5-prefix fingerprint (the t65/t83 narrow-key discipline — 4×
  * fewer shuffled/stored bytes than the hex string; a fingerprint
  * collision can seed one false window match, which span extension
  * then caps at window length, the documented contract). Each
  * micro-batch:
  *
  *  1. windows the NEW documents only (old text is never re-read);
  *     replayed batches anti-join away on already-indexed doc ids —
  *     replays append nothing and report nothing;
  *  2. applies the SAME seeding caps as batch t82 over index ∪ fresh:
  *     window document-frequency ≤ SpanDfCap AND intra-document
  *     occurrences ≤ SpanOccCap (periodic/boilerplate windows never
  *     seed, so no batch can go pair-quadratic);
  *  3. probes new-vs-all (never old-vs-old: those pairs were reported
  *     when their younger side arrived) and extends matches to
  *     maximal spans by t82's diagonal gaps-and-islands, emitting
  *     (doc_a, doc_b, start_a, start_b, span_len) for spans ≥
  *     MinSpan;
  *  4. appends the new windows to the index.
  *
  * At 100 TB the shape holds: the window index is the corpus-sized
  * artifact (written once per document, appended per drop), the probe
  * join moves fresh windows plus colliding postings only, and the
  * span extension is window work partitioned by (pair, diagonal) —
  * bounded by matched-window volume, never all-pairs. The per-batch
  * df-cap aggregation scans the index once; at a monthly-drop cadence
  * that is the natural cost (and the scan is the same one the probe
  * join performs).
  */
object IncrementalSpanIndex {

  val indexSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("pos", LongType, nullable = false),
    StructField("h64", LongType, nullable = false)))

  /** Stride-1 window fingerprints for a (doc_id, text) batch — the
    * same SpanL-token window + md5 construction as the batch family,
    * truncated to the 60-bit fingerprint in-row.
    */
  def windowRows(docs: DataFrame): DataFrame = {
    val L = TrainingOps.SpanL
    docs
      .withColumn("words", expr("filter(split(text, ' '), w -> w != '')"))
      .withColumn("n", size(col("words")))
      .filter(col("n") >= L)
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(1, n - $L + 1),
              i -> cast(conv(substring(md5(array_join(slice(words, i, $L), ' ')),
                             1, 15), 16, 10) as bigint))"""))
        .as(Seq("p0", "h64")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"), col("h64"))
  }

  /** Current index contents (empty if never written). */
  def readIndex(spark: SparkSession, path: String): DataFrame =
    StreamingState.readOr(spark, path, indexSchema)

  /** Probe one batch against the index (and itself), append its
    * windows, and return the maximal cross-document spans involving
    * at least one new document.
    */
  def probeAndUpdate(batch: DataFrame, indexPath: String): DataFrame = {
    val spark = batch.sparkSession
    val existing = readIndex(spark, indexPath)
    val fresh = windowRows(batch)
      .join(existing.select(col("doc_id")).distinct(), Seq("doc_id"), "left_anti")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val all = existing.unionByName(fresh)

    // t82's r11 seeding discipline over index ∪ fresh: two-level
    // aggregation gives document frequency AND the max within-doc
    // occurrence per window in one reduce
    val cold = all.groupBy(col("h64"), col("doc_id"))
      .agg(count(lit(1)).as("k"))
      .groupBy(col("h64"))
      .agg(count(lit(1)).as("docf"), max(col("k")).as("maxk"))
      .filter(col("docf") <= TrainingOps.SpanDfCap &&
        col("maxk") <= TrainingOps.SpanOccCap)
      .select(col("h64"))

    val freshC = fresh.join(cold, Seq("h64"))
      .select(col("h64"), col("doc_id").as("f_doc"), col("pos").as("f_pos"))
    val allC = all.join(cold, Seq("h64"))
      .select(col("h64"), col("doc_id").as("t_doc"), col("pos").as("t_pos"))
    val m = freshC.join(allC, Seq("h64"))
      .filter(col("f_doc") =!= col("t_doc"))
      .select(
        least(col("f_doc"), col("t_doc")).as("doc_a"),
        greatest(col("f_doc"), col("t_doc")).as("doc_b"),
        when(col("f_doc") < col("t_doc"), col("f_pos")).otherwise(col("t_pos")).as("pa"),
        when(col("f_doc") < col("t_doc"), col("t_pos")).otherwise(col("f_pos")).as("pb"))
      // a new-vs-new pair matches from both fresh sides — dedup the
      // normalized rows before island construction
      .distinct()
      .withColumn("d", col("pa") - col("pb"))

    val w = Window.partitionBy(col("doc_a"), col("doc_b"), col("d"))
      .orderBy(col("pa"))
    // localCheckpoint (eager): the spans must be MATERIALIZED with
    // lineage truncated before the append below — a lazy result would
    // recompute against the post-append listing, where the batch's own
    // windows are indexed and the anti-join empties `fresh`
    val spans = m.withColumn("isl", col("pa") - row_number().over(w))
      .groupBy(col("doc_a"), col("doc_b"), col("d"), col("isl"))
      .agg(min(col("pa")).as("start_a"), min(col("pb")).as("start_b"),
        (max(col("pa")) - min(col("pa")) + lit(TrainingOps.SpanL.toLong))
          .as("span_len"))
      .filter(col("span_len") >= TrainingOps.MinSpan)
      .select(col("doc_a"), col("doc_b"), col("start_a"), col("start_b"),
        col("span_len"))
      .localCheckpoint(true)
    fresh.write.mode("append").parquet(indexPath)
    fresh.unpersist()
    spans
  }

  /** Streaming surface: foreachBatch maintaining the index, handing
    * each micro-batch's maximal spans to the caller.
    */
  def sink(docs: DataFrame, indexPath: String)
      (onBatch: (DataFrame, Long) => Unit): DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spans = probeAndUpdate(batch, indexPath)
        onBatch(spans, id)
        spans.unpersist()
        ()
      }
}
