package graft

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Loaders for the driver-generated synthetic corpus (TESTDATA.md):
  * one parquet file per table under /root/testdata/sf{0.001,0.01,0.1}/.
  *
  * All readers are plain parquet scans so Catalyst can push filters and
  * prune columns down to the file source (verify with
  * `.explain("formatted")` → `PushedFilters` / `ReadSchema`).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 does not read
    * natively: read it as raw long nanos and truncate to microseconds —
    * the same truncation DuckDB applies when casting TIMESTAMP_NS to
    * TIMESTAMP, so both engines see identical µs values.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

/** Helpers shared by the oracle-checked query pack.
  *
  * Oracle determinism: the driver hash-compares our parquet output against
  * DuckDB's result for the same SQL. Floating-point SUMs are
  * order-dependent, and Spark/DuckDB will not sum in the same order — so
  * every aggregate over a non-integer double column is computed in decimal
  * arithmetic (exact, order-independent) and cast back to double at the
  * end. The input doubles carry at most 2 decimals, far from any
  * decimal(18,2) rounding boundary, so the per-row cast is engine-agnostic.
  */
object Det {
  /** Cast a ~2-decimal money/rate column to exact decimal. */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Order-independent SUM of a money column, returned as double. */
  def sumMoney(c: Column): Column = sum(dec2(c)).cast("double")

  /** Deterministic average: exact decimal sum / count, divided as double. */
  def avgMoney(c: Column): Column =
    sum(dec2(c)).cast("double") / count(c)
}
