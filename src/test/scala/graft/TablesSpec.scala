package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The type-adaptive events loader (the r7 regression class): corpora
  * have shipped `ts` as parquet TIMESTAMP(NANOS) — which Spark 4 reads
  * as raw LongType under `nanosAsLong` — and as TIMESTAMP(MICROS),
  * which reads as a native timestamp. The loader dispatches on the READ
  * schema, so both generations (and anything castable) load; these
  * specs pin each branch with synthesized corpora, since a corpus
  * regeneration exercising only one branch is exactly how five
  * operators silently broke in r7.
  */
class TablesSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("tables-events").toString

  test("raw-long nanos column converts to a microsecond-truncated timestamp") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = tmpDir()
    // Spark cannot WRITE parquet TIMESTAMP(NANOS); a LongType column is
    // byte-for-byte what the reader yields from one under nanosAsLong,
    // which is the exact input the loader's LongType branch dispatches on
    Seq((1L, 1700000000123456789L, 7L, "click", 1.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Tables.events(spark, dir)
    assert(got.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    val t = got.select("ts").head.getTimestamp(0)
    assert(t.getTime == 1700000000123L)
    assert(t.getNanos == 123456000, "nanos must truncate to whole microseconds")
  }

  test("native timestamp column passes through unchanged") {
    import spark.implicits._
    val dir = tmpDir()
    val ts = java.sql.Timestamp.valueOf("2023-11-14 22:13:20.123456")
    Seq((1L, ts, 7L, "view", 2.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Tables.events(spark, dir).select("ts").head.getTimestamp(0)
    assert(got == ts)
  }

  test("castable (string) ts column routes through the cast fallback") {
    import spark.implicits._
    val dir = tmpDir()
    Seq((1L, "2023-11-14 22:13:20.123456", 7L, "error", 0.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Tables.events(spark, dir)
    assert(got.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(got.select("ts").head.getTimestamp(0) ==
      java.sql.Timestamp.valueOf("2023-11-14 22:13:20.123456"))
  }
}
