package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Sessionize

/** Stateful streaming sessionization (flatMapGroupsWithState +
  * event-time timeout): sessions close on a later event past the gap,
  * on watermark timeout when the stream goes quiet, and the emitted
  * rows match the batch q28 gap semantics regardless of micro-batch
  * boundaries or in-batch disorder.
  */
class SessionizeSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(minutes: Long): Timestamp =
    new Timestamp(1700000000000L + minutes * 60000L)

  test("gap close, timeout close, and batch-boundary independence") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Sessionize.Event]
    val query = Sessionize.sessions(input.toDF(), gapMinutes = 30,
        watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // batch 1: an open session for user 1, events deliberately
      // OUT OF ORDER inside the batch
      input.addData(
        Sessionize.Event(1L, ts(10), 2.50),
        Sessionize.Event(1L, ts(0), 1.25))
      query.processAllAvailable()
      assert(spark.table("sessions").count() == 0) // still open

      // batch 2: 50-minute gap closes session 1 immediately (no
      // watermark wait — the newer event itself proves the gap)
      input.addData(Sessionize.Event(1L, ts(60), 10.00))
      query.processAllAvailable()
      val closed1 = spark.table("sessions").as[Sessionize.Session].collect()
      assert(closed1.toSeq == Seq(
        Sessionize.Session(1L, ts(0), ts(10), 2, 3.75)))

      // batches 3-4: another user far ahead advances the watermark past
      // 60min + gap; the quiet open session times out and closes with
      // no further user-1 event ever arriving
      input.addData(Sessionize.Event(2L, ts(200), 5.00))
      query.processAllAvailable()
      input.addData(Sessionize.Event(2L, ts(201), 5.00))
      query.processAllAvailable()
      val all = spark.table("sessions").as[Sessionize.Session].collect()
      assert(all.toSet.contains(
        Sessionize.Session(1L, ts(60), ts(60), 1, 10.00)),
        all.mkString("\n"))
    } finally query.stop()
  }

  test("cents-exact money and minEvents mirror the batch gate filter") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Sessionize.Event]
    val query = Sessionize.sessions(input.toDF(), gapMinutes = 30,
        watermarkDelay = "5 minutes", minEvents = 3L)
      .writeStream.format("memory").queryName("sessions_min")
      .outputMode("append").start()
    try {
      // session A: 3 events (kept); a 2-event session B (dropped)
      input.addData(
        Sessionize.Event(7L, ts(0), 0.10),
        Sessionize.Event(7L, ts(5), 0.20),
        Sessionize.Event(7L, ts(10), 0.30))
      query.processAllAvailable()
      input.addData(
        Sessionize.Event(7L, ts(100), 1.00),
        Sessionize.Event(7L, ts(105), 1.00))
      query.processAllAvailable()
      // close B by gap with a third session's opener
      input.addData(Sessionize.Event(7L, ts(300), 9.99))
      query.processAllAvailable()
      val got = spark.table("sessions_min").as[Sessionize.Session].collect()
      assert(got.toSeq == Seq(
        Sessionize.Session(7L, ts(0), ts(10), 3, 0.60)),
        got.mkString("\n"))
    } finally query.stop()
  }
}
