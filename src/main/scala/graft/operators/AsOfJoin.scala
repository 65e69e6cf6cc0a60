package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch as-of join — the time-series join Spark's DataFrame API lacks
  * (pandas `merge_asof` / DuckDB `ASOF JOIN` / kdb `aj` shape): each
  * left row picks ONE right row per key, the nearest at-or-before
  * (backward) or at-or-after (forward) its timestamp.
  *
  * Formulation: union the two tagged streams and run a single window
  * over (key, time) that carries the last (resp. first) non-null right
  * payload to each left row. Exactly ONE shuffle on the key columns —
  * no range-join row explosion, no per-key collect, O(1) running state
  * per row — so the plan survives 100 TB the same way a sessionization
  * window does. A broadcast range join would duplicate every left row
  * per candidate right row before filtering; this never materializes a
  * candidate pair at all.
  *
  * Semantics pinned by AsOfJoinSpec:
  *  - ties are INCLUSIVE: a right row at exactly the left timestamp is
  *    eligible (backward and forward);
  *  - among several right rows with the same (key, timestamp), the
  *    winner is deterministic: largest `tieBreak` for backward (the
  *    "latest wins" convention of U1), smallest for forward;
  *  - a left row with no eligible right row gets null payload
  *    (left-outer, like `ASOF LEFT JOIN`).
  *
  * Column contract: `keys` must exist on both sides; `payload` names
  * must not collide with left column names (rename on the right side
  * first — they become output columns as-is).
  */
object AsOfJoin {

  private def joined(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      tieBreak: Seq[String], backward: Boolean): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key column")
    require(payload.nonEmpty, "as-of join needs at least one payload column")
    val tb = tieBreak.zipWithIndex.map { case (c, i) => (c, s"_asof_tb$i") }
    val lt = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("_asof_ts"),
        lit(0).as("_asof_side"),
        struct(left.columns.toIndexedSeq.map(col): _*).as("_asof_l")): _*)
    val rt = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("_asof_ts"),
        lit(1).as("_asof_side"),
        struct(payload.map(col): _*).as("_asof_p")) ++
        tb.map { case (c, n) => col(c).as(n) }: _*)
    // missing columns (left struct on the right side, payload struct +
    // tie-breaks on the left side) fill with null — exactly the "only
    // right rows carry a payload" encoding the window relies on
    val u = lt.unionByName(rt, allowMissingColumns = true)
    // backward: right rows sort BEFORE left rows at the same timestamp
    // (side desc), so `last` over the preceding frame sees a same-ts
    // right row — inclusive ties; larger tie-break sorts later, so it
    // wins `last`. Forward mirrors both choices.
    val order: Seq[Column] =
      if (backward)
        col("_asof_ts").asc +: col("_asof_side").desc +:
          tb.map { case (_, n) => col(n).asc_nulls_first }
      else
        col("_asof_ts").asc +: col("_asof_side").asc +:
          tb.map { case (_, n) => col(n).asc_nulls_last }
    val base = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val matched =
      if (backward)
        last(col("_asof_p"), ignoreNulls = true)
          .over(base.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      else
        first(col("_asof_p"), ignoreNulls = true)
          .over(base.rowsBetween(Window.currentRow, Window.unboundedFollowing))
    val leftCols = left.columns.toIndexedSeq.map(c => col("_asof_l").getField(c).as(c))
    val payCols = payload.map(p => col("_asof_match").getField(p).as(p))
    u.withColumn("_asof_match", matched)
      .filter(col("_asof_side") === 0)
      .select(leftCols ++ payCols: _*)
  }

  /** For each left row: the latest right row of the same key with
    * `rightTs` ≤ `leftTs` (inclusive), its `payload` columns appended;
    * null payload when no right row qualifies.
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      tieBreak: Seq[String] = Nil): DataFrame =
    joined(left, right, keys, leftTs, rightTs, payload, tieBreak, backward = true)

  /** For each left row: the earliest right row of the same key with
    * `rightTs` ≥ `leftTs` (inclusive) — the "next reading" direction.
    */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      tieBreak: Seq[String] = Nil): DataFrame =
    joined(left, right, keys, leftTs, rightTs, payload, tieBreak, backward = false)
}
