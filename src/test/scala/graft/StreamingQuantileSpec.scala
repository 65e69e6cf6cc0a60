package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Analytics
import graft.streaming.StreamingQuantile

/** Streaming quantile-histogram equivalence: bin counters merge by
  * ADDITION, so a corpus streamed in ANY micro-batch split must sum to
  * the bit-identical bin relation the (oracle-checked) batch q44
  * construction computes over the union — batch parity IS the
  * correctness story, the batch side being DuckDB-pinned. Plus: ledger
  * replay protection (sums, unlike StreamingHll's max registers, are
  * not idempotent), and quantile reads matching the q44 rank
  * semantics.
  */
class StreamingQuantileSpec extends AnyFunSuite {

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
    java.nio.file.Files.createTempDirectory("qsk").toString + "/sketch"

  private def binMap(df: org.apache.spark.sql.DataFrame): Map[(String, Long), Long] =
    df.collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap

  // values spread over many 65536-cent bins, duplicates included
  private def vals(n: Int, seed: Int): Seq[(String, Long)] = {
    val rnd = new scala.util.Random(seed)
    rnd.shuffle((0 until n).map { i =>
      (if (i % 3 == 0) "app" else "web", (i.toLong * 7919) % 4000000)
    })
  }

  test("randomized micro-batch splits sum to the exact batch sketch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = vals(1000, 31)
    val path = freshDir()

    val in = MemoryStream[(String, Long)]
    val stream = in.toDF().toDF("src", "cents")
    val query = StreamingQuantile.sink(
      stream, path, col("src"), col("cents"))((_, _) => ()).start()
    try {
      rows.grouped(173).foreach { b => in.addData(b); query.processAllAvailable() }
    } finally query.stop()

    val batch = Analytics.histSketch(
      rows.toDF("src", "cents").select(col("src").as("g"), col("cents")),
      "g", col("cents"))
    assert(binMap(StreamingQuantile.readSketch(spark, path)) === binMap(batch))
  }

  test("replayed batch id is a ledger no-op") {
    import spark.implicits._
    val path = freshDir()
    val batch = vals(300, 7).toDF("src", "cents")
    assert(StreamingQuantile.applyBatch(batch, path, col("src"), col("cents"), 0L))
    val before = binMap(StreamingQuantile.readSketch(spark, path))
    // same id re-delivered: counters must NOT double
    assert(!StreamingQuantile.applyBatch(batch, path, col("src"), col("cents"), 0L))
    assert(binMap(StreamingQuantile.readSketch(spark, path)) === before)
    // a NEW id with the same data doubles every counter — the ledger,
    // not value-level dedup, is what guards replays
    assert(StreamingQuantile.applyBatch(batch, path, col("src"), col("cents"), 1L))
    val after = binMap(StreamingQuantile.readSketch(spark, path))
    assert(after === before.map { case (k, v) => k -> v * 2 })
  }

  test("quantile reads follow the q44 rank semantics") {
    import spark.implicits._
    val path = freshDir()
    val rows = vals(500, 13)
    StreamingQuantile.applyBatch(
      rows.toDF("src", "cents"), path, col("src"), col("cents"), 0L)
    val got = StreamingQuantile.quantiles(spark, path, Seq(50L, 95L, 99L))
      .collect()
    assert(got.length == 6) // 2 groups x 3 quantiles
    for (r <- got) {
      val g = r.getAs[String]("g")
      val q = r.getAs[Long]("q")
      val n = r.getAs[Long]("n")
      val k = r.getAs[Long]("k")
      val bin = r.getAs[Long]("est_bin")
      assert(n == rows.count(_._1 == g))
      assert(k == (n * q + 99) / 100)
      // the exact rank-k value must fall inside (or, for the clamped
      // top bin, at-or-above) the answered bin
      val sorted = rows.filter(_._1 == g).map(_._2).sorted
      val exact = sorted(k.toInt - 1)
      assert(exact / 65536L == bin || (bin == 255L && exact / 65536L >= 255L),
        s"g=$g q=$q exact=$exact bin=$bin")
    }
  }
}
