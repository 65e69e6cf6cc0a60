package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale utilities (SURVEY §7.4.7 discipline): skew salting and
  * bucketed co-located joins — the two knobs that keep 100 TB joins off
  * the single-hot-partition and full-shuffle cliffs.
  */
object Scale {

  /** Skew-safe inner equi-join: the skewed LEFT side gets a random salt
    * in [0, saltFactor); the (smaller, but not broadcastable) RIGHT side
    * is replicated saltFactor times. The shuffle key becomes
    * (key, salt), splitting each hot key across saltFactor partitions.
    *
    * Use when AQE's skew-join split is not available (e.g. the skew is
    * in a window/aggregation upstream) or the skew is known a priori.
    * Salting trades a saltFactor× replication of the right side for
    * eliminating the straggler — the classic deliberate trade.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    val salted = left.withColumn("__salt",
      (rand(seed = 7) * saltFactor).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Write both sides of a recurring join bucketed on the key: later
    * joins between the two tables shuffle NOTHING (bucket-to-bucket,
    * verified by the absence of Exchange in the plan). This is the
    * pre-partitioning the reference could never express — the right
    * layout for a fact table joined on the same key every day.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
}
