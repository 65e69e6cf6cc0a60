package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingFunnel

/** Streaming funnel equivalence: on randomized, disordered streams
  * split across micro-batches, the stateful formulation emits exactly
  * one verdict per signup — including the NEGATIVE verdicts an
  * interval join cannot produce — equal to both a brute-force windowed
  * scan and the batch q40 candidate operator
  * (`Analytics.funnelCandidates`), with the window's exclusive-lower /
  * inclusive-upper edges pinned.
  */
class StreamingFunnelSpec extends AnyFunSuite {

  private val W = 60000L // 1-minute window (ms) keeps the test readable

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(ms: Long): Timestamp = new Timestamp(1700000000000L + ms)

  test("randomized disordered streams match brute force AND the batch operator") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(31)
    val signups = (0 until 60).map(i =>
      (rnd.nextInt(4).toLong, i.toLong, rnd.nextLong(10 * W)))
    val purchases = (0 until 120).map(_ =>
      (rnd.nextInt(4).toLong, rnd.nextLong(10 * W)))

    val in = MemoryStream[StreamingFunnel.Tick]
    val su = in.toDF().filter(col("side") === 0)
      .select(col("user_id"), col("ts"), col("sid"))
    val pu = in.toDF().filter(col("side") === 1)
      .select(col("user_id"), col("ts"))
    // the delay must exceed the shuffled stream's cross-batch disorder
    // span (10 W) or drops are the watermark's correct behavior
    val query = StreamingFunnel.resolve(su, pu, W, watermarkDelay = "20 minutes")
      .writeStream.format("memory").queryName("funnel1")
      .outputMode("append").start()
    try {
      val ticks = rnd.shuffle(
        signups.map { case (u, sid, t) => StreamingFunnel.Tick(u, ts(t), 0, sid) } ++
        purchases.map { case (u, t) => StreamingFunnel.Tick(u, ts(t), 1, -1L) })
      ticks.grouped(40).foreach { batch =>
        in.addData(batch); query.processAllAvailable()
      }
      // advance the watermark far enough to resolve every signup
      in.addData(StreamingFunnel.Tick(999L, ts(100 * W), 1, -1L))
      query.processAllAvailable()
      val got = spark.table("funnel1").as[StreamingFunnel.Converted]
        .collect().map(c => c.sid -> c.converted).toMap

      val brute = signups.map { case (u, sid, tsu) =>
        sid -> purchases.exists { case (up, tp) =>
          up == u && tp > tsu && tp - tsu <= W }
      }.toMap
      assert(got === brute)

      // cross-pin against the batch q40 candidate operator
      val bsu = signups.map { case (u, sid, t) => (u, sid, t, "d") }
        .toDF("user_id", "sid", "tsu", "day")
      val bpu = purchases.toDF("user_id", "tp")
      val batch = graft.operators.Analytics.funnelCandidates(bsu, bpu, W)
        .groupBy(col("sid")).agg(max(when(col("hit"), 1).otherwise(0)).as("c"))
        .collect().map(r => r.getLong(0) -> (r.getInt(1) == 1)).toMap
      assert(got === batch)
    } finally query.stop()
  }

  test("window edges: purchase at tsu never converts, at tsu+w always does") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamingFunnel.Tick]
    val su = in.toDF().filter(col("side") === 0)
      .select(col("user_id"), col("ts"), col("sid"))
    val pu = in.toDF().filter(col("side") === 1)
      .select(col("user_id"), col("ts"))
    val query = StreamingFunnel.resolve(su, pu, W, watermarkDelay = "1 minute")
      .writeStream.format("memory").queryName("funnel2")
      .outputMode("append").start()
    try {
      in.addData(
        StreamingFunnel.Tick(1L, ts(1000), 0, 10L),
        StreamingFunnel.Tick(1L, ts(1000), 1, -1L),      // at tsu: no
        StreamingFunnel.Tick(2L, ts(1000), 0, 20L),
        StreamingFunnel.Tick(2L, ts(1000 + W), 1, -1L),  // at tsu+w: yes
        StreamingFunnel.Tick(3L, ts(1000), 0, 30L))      // no purchase at all
      query.processAllAvailable()
      in.addData(StreamingFunnel.Tick(999L, ts(50 * W), 1, -1L))
      query.processAllAvailable()
      val got = spark.table("funnel2").as[StreamingFunnel.Converted]
        .collect().map(c => c.sid -> c.converted).toMap
      assert(got === Map(10L -> false, 20L -> true, 30L -> false))
    } finally query.stop()
  }
}
