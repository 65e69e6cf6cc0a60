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
