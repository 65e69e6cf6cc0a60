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
  /** Resolved-relation memo (r15): `spark.read.parquet` re-runs file
    * listing and footer schema inference on EVERY call — measured
    * 20–50 ms of driver time per table per query invocation, which for
    * a 6-table star (q5) was the bulk of its per-invocation planning
    * cost. Real deployments resolve a table's schema once in a catalog;
    * this memo is that catalog: the DataFrame (hence its resolved
    * LogicalRelation) is built once per (session, path) and reused.
    * No DATA is cached — every action still scans parquet. Entries are
    * session-keyed and dropped by [[graft.operators.SessionMemo.release]]
    * (Bench/Verify teardown, spec afterAll).
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.operators.SessionMemo.memo(s"tables:$dir/$name", spark, dir) {
      spark.read.parquet(s"$dir/$name.parquet")
    }

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** events.ts has shipped as both parquet TIMESTAMP(NANOS) and
    * TIMESTAMP(MICROS) across corpus generations, so the loader adapts
    * to the physical type it finds instead of assuming one:
    *
    *  - NANOS: Spark 4 has no nanosecond timestamp type, so read the
    *    column as raw long nanos (`nanosAsLong`) and truncate to
    *    microseconds — the same truncation DuckDB applies casting
    *    TIMESTAMP_NS to TIMESTAMP, so both engines see identical µs.
    *  - MICROS (isAdjustedToUTC=false → Spark infers TIMESTAMP_NTZ):
    *    cast to session-zone TimestampType. Sessions here pin UTC, so
    *    the instants are unchanged and downstream ts arithmetic keeps
    *    the type every consumer was built against.
    *  - Already TimestampType: pass through.
    *
    * `nanosAsLong` stays set either way: it only affects NANOS columns,
    * so it is a no-op on micros corpora and keeps old corpora readable.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampType => raw
      case _ =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
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
