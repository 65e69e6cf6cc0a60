package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-snapshot corpus diff (r11, VERDICT #8) — the operational
  * report a RECURRING curation pipeline reads every month: given two
  * written curated snapshots (the `<out>/docs` parquet of
  * [[CurationOps.writeCurated]]/[[CurationOps.writeCuratedFull]],
  * any flag combination), what changed? Which documents were added,
  * removed, rewritten (same id, different bytes — e.g. a substring
  * cut landed), or moved across (split, source) partitions, and how
  * the corpus volume shifted per partition. At 100 TB this is the
  * judgement call before promoting a snapshot: an unexpected
  * `removed` spike means an upstream filter regressed; a `rewritten`
  * wave quantifies a new cleaning stage's blast radius.
  *
  * Scale shape: one full-outer join of the two snapshots keyed by
  * doc_id (both sides shuffle once on the key), md5 comparison in-row
  * — no text ever rides a shuffle key — then a partition-sized
  * aggregation. Nothing is quadratic in either snapshot.
  */
object SnapshotDiff {

  /** Per-document change status between two snapshots: one row per
    * doc_id present in either, status ∈ {added, removed, rewritten,
    * moved, unchanged}. `rewritten` = same id, different text bytes;
    * `moved` = same bytes, different (split, source) partition.
    */
  def docDiff(s: SparkSession, oldPath: String, newPath: String): DataFrame = {
    def side(p: String, tag: String) =
      s.read.parquet(s"$p/docs").select(
        col("doc_id"),
        md5(col("text")).as(s"md5_$tag"),
        col("n_chars").cast("long").as(s"chars_$tag"),
        col("split").as(s"split_$tag"),
        col("source").as(s"source_$tag"))
    side(oldPath, "old").join(side(newPath, "new"), Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("md5_old").isNull, lit("added"))
          .when(col("md5_new").isNull, lit("removed"))
          .when(col("md5_old") =!= col("md5_new"), lit("rewritten"))
          .when(col("split_old") =!= col("split_new") ||
            col("source_old") =!= col("source_new"), lit("moved"))
          .otherwise(lit("unchanged")))
      .select(col("doc_id"), col("status"),
        col("split_old"), col("source_old"), col("split_new"), col("source_new"),
        col("chars_old"), col("chars_new"))
  }

  /** Provenance for the promotion review (r12, VERDICT #8): WHICH
    * stage touched each rewritten/removed document, answered by
    * joining the diff to the pipeline's own memoized stage artifacts
    * over `dir` — no new corpus pass:
    *
    *  - `substring_cut`    — the doc has merged t84 cut intervals, so
    *    the --cut-substrings stage rewrote its bytes;
    *  - `near_dup_loser`   — the doc sits in a MinHash cluster whose
    *    elected survivor is another doc (t52), so the survivor
    *    restriction dropped it;
    *  - `curation_filtered`— the doc is outside t47's curated set
    *    (quality floor / exact-dedup canonical / benchmark
    *    contamination — the chain's own filters);
    *  - `budget_or_external` — none of the above: the token budget's
    *    per-source prefix cut, or a change outside this corpus dir.
    *
    * One row per rewritten/removed doc: (doc_id, status, cause).
    * Causes are checked in the order above (a cut loser reports the
    * cut for rewrites, the loss for removals — the removal is what
    * promotion review audits).
    */
  def provenance(s: SparkSession, dir: String, oldPath: String,
      newPath: String): DataFrame = {
    val diff = docDiff(s, oldPath, newPath)
      .filter(col("status").isin("rewritten", "removed"))
      .select(col("doc_id"), col("status"))
    val cut = TrainingOps.mergedCutIntervals(s, dir)
      .select(col("doc_id")).distinct()
      .withColumn("is_cut", lit(true))
    val losers = TextOps.qDedupClusters(s, dir)
      .select(col("doc_id"), col("cluster_id"))
      .join(TextOps.qDedupSurvivors(s, dir)
        .select(col("cluster_id"), col("survivor_id")), Seq("cluster_id"))
      .filter(col("doc_id") =!= col("survivor_id"))
      .select(col("doc_id")).withColumn("is_loser", lit(true))
    val curated = CurationOps.curatedDocs(s, dir)
      .select(col("doc_id")).withColumn("is_curated", lit(true))
    diff
      .join(cut, Seq("doc_id"), "left")
      .join(losers, Seq("doc_id"), "left")
      .join(curated, Seq("doc_id"), "left")
      .withColumn("cause",
        when(col("status") === "rewritten" && col("is_cut"), lit("substring_cut"))
          .when(col("is_loser"), lit("near_dup_loser"))
          .when(col("is_curated").isNull, lit("curation_filtered"))
          .otherwise(lit("budget_or_external")))
      .select(col("doc_id"), col("status"), col("cause"))
      .orderBy(col("doc_id"))
  }

  /** The promotion-review summary: per NEW-side (split, source)
    * partition (removed docs report under their OLD partition with a
    * null-filled new side), counts by status and the char volume
    * delta. One aggregation over [[docDiff]].
    */
  def report(s: SparkSession, oldPath: String, newPath: String): DataFrame =
    docDiff(s, oldPath, newPath)
      .withColumn("split", coalesce(col("split_new"), col("split_old")))
      .withColumn("source", coalesce(col("source_new"), col("source_old")))
      .groupBy(col("split"), col("source"))
      .agg(
        sum(when(col("status") === "added", 1L).otherwise(0L)).as("n_added"),
        sum(when(col("status") === "removed", 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("status") === "rewritten", 1L).otherwise(0L)).as("n_rewritten"),
        sum(when(col("status") === "moved", 1L).otherwise(0L)).as("n_moved"),
        sum(when(col("status") === "unchanged", 1L).otherwise(0L)).as("n_unchanged"),
        sum(coalesce(col("chars_new"), lit(0L)) -
          coalesce(col("chars_old"), lit(0L))).as("chars_delta"))
      .orderBy(col("split"), col("source"))
}
