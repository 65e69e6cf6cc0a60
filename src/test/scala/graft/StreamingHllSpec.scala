package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Analytics
import graft.streaming.StreamingHll

/** Streaming HLL equivalence: registers merge by max, so a corpus
  * streamed in ANY micro-batch split must produce the bit-identical
  * register relation the (oracle-checked) batch q43 construction
  * computes over the union — batch parity IS the correctness story
  * here, the batch side being DuckDB-pinned. Plus: ledger-free replay
  * idempotence (max-merge's own guarantee, the designed contrast with
  * StreamingCms's sum counters), and the estimate's error envelope at
  * a cardinality where the raw formula is in-regime.
  */
class StreamingHllSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("hll").toString + "/sketch"

  private def regMap(df: org.apache.spark.sql.DataFrame): Map[(String, Long), Long] =
    df.collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("randomized micro-batch splits merge to the exact batch registers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(23)
    // two groups, overlapping value ranges, duplicates included — the
    // shuffle ensures group rows are scattered across batches
    val rows = rnd.shuffle(
      (0 until 600).map(i => ("web", (i % 211).toLong)) ++
      (0 until 400).map(i => ("app", (i % 97).toLong)))
    val path = freshDir()

    val in = MemoryStream[(String, Long)]
    val stream = in.toDF().toDF("src", "v")
    val query = StreamingHll.sink(stream, path, col("src"), col("v"))((_, _) => ()).start()
    try {
      rows.grouped(117).foreach { b => in.addData(b); query.processAllAvailable() }
    } finally query.stop()

    val batch = Analytics.hllRegisters(
      rows.toDF("src", "v").select(col("src").as("g"), col("v")), "g", col("v"))
    assert(regMap(StreamingHll.readRegisters(spark, path)) === regMap(batch))
  }

  test("replay is a ledger-free no-op; summary matches the shared batch reduction") {
    import spark.implicits._
    val path = freshDir()
    val batch = (0 until 300).map(i => ("s", i.toLong)).toDF("src", "v")
    StreamingHll.applyBatch(batch, path, col("src"), col("v"))
    val before = regMap(StreamingHll.readRegisters(spark, path))
    // re-deliver the same batch: max(a, a) = a — no ledger required
    StreamingHll.applyBatch(batch, path, col("src"), col("v"))
    assert(regMap(StreamingHll.readRegisters(spark, path)) === before)

    val viaPath = StreamingHll.summary(spark, path).collect()
    val viaBatch = Analytics.hllSummary(
      Analytics.hllRegisters(
        batch.select(col("src").as("g"), col("v")), "g", col("v")), "g")
      .collect()
    assert(viaPath.toSeq === viaBatch.toSeq)
    // 300 distinct values over m=256 registers: raw estimate in-regime
    // within 4σ (σ ≈ 1.04/√256 ≈ 6.5%)
    val est = viaPath.head.getDouble(3)
    assert(math.abs(est - 300.0) / 300.0 < 0.26, s"raw_est $est vs 300")
  }

  test("late-arriving group in a later batch extends, never clobbers") {
    import spark.implicits._
    val path = freshDir()
    val b1 = (0 until 100).map(i => ("a", i.toLong)).toDF("src", "v")
    val b2 = ((0 until 50).map(i => ("a", (i + 100).toLong)) ++
      (0 until 80).map(i => ("b", i.toLong))).toDF("src", "v")
    StreamingHll.applyBatch(b1, path, col("src"), col("v"))
    StreamingHll.applyBatch(b2, path, col("src"), col("v"))
    val whole = Analytics.hllRegisters(
      ((0 until 150).map(i => ("a", i.toLong)) ++
        (0 until 80).map(i => ("b", i.toLong)))
        .toDF("g", "v"), "g", col("v"))
    assert(regMap(StreamingHll.readRegisters(spark, path)) === regMap(whole))
  }
}
