package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingGapFill

/** Streaming gap-fill equivalence: on randomized, disordered streams
  * split across micro-batches, the stateful formulation emits exactly
  * the batch q36 series (`Analytics.gapFill`) — hourly grid per user
  * from first to last observed hour, silence carrying the last value
  * forward — and the emitted-hour fence plus the series-extension path
  * behave under explicit batch control.
  */
class StreamingGapFillSpec extends AnyFunSuite {

  private val HourMs = 3600000L
  private val T0 = 1700000000000L - (1700000000000L % HourMs) // hour-aligned

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

  private def ts(ms: Long): Timestamp = new Timestamp(T0 + ms)

  private def collectPoints(table: String): Seq[(Long, Long, Boolean, Double)] = {
    import spark.implicits._
    spark.table(table).as[StreamingGapFill.Point].collect().toSeq
      .map(p => (p.user_id, p.h.getTime, p.observed, p.value_ff))
      .sortBy(t => (t._1, t._2))
  }

  test("randomized disordered streams match the batch q36 operator exactly") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(41)
    // 4 users, sparse events over a 10-hour span (gaps guaranteed)
    val events = (0 until 80).map { i =>
      (rnd.nextInt(4).toLong, rnd.nextLong(10 * HourMs), i.toLong,
        (rnd.nextInt(1000) - 500).toDouble)
    }

    val in = MemoryStream[StreamingGapFill.Ev]
    // the delay must exceed the shuffled stream's cross-batch disorder
    // span (10 h) or drops are the watermark's correct behavior
    val query = StreamingGapFill.fill(in.toDF(), watermarkDelay = "12 hours")
      .writeStream.format("memory").queryName("gapfill1")
      .outputMode("append").start()
    try {
      val ticks = rnd.shuffle(events.map { case (u, t, eid, v) =>
        StreamingGapFill.Ev(u, ts(t), eid, v) })
      ticks.grouped(25).foreach { b => in.addData(b); query.processAllAvailable() }
      // advance the watermark past every hour end
      in.addData(StreamingGapFill.Ev(999L, ts(100 * HourMs), 9999L, 0.0))
      query.processAllAvailable()

      val got = collectPoints("gapfill1").filter(_._1 != 999L)
      val batch = graft.operators.Analytics.gapFill(
          events.map { case (u, t, eid, v) => (u, ts(t), eid, v) }
            .toDF("user_id", "ts", "event_id", "value"))
        .collect().toSeq
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime,
          r.getBoolean(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2))
      assert(got === batch)
      // sanity: the series actually contains filled rows
      assert(got.exists(!_._3), "test corpus produced no gap to fill")
    } finally query.stop()
  }

  test("extension emits intervening silent hours; emitted hours never re-open") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamingGapFill.Ev]
    val query = StreamingGapFill.fill(in.toDF(), watermarkDelay = "30 minutes")
      .writeStream.format("memory").queryName("gapfill2")
      .outputMode("append").start()
    try {
      // hour 0 observed (closing value 7.0: later ts wins over 3.0)
      in.addData(
        StreamingGapFill.Ev(1L, ts(600000), 1L, 3.0),
        StreamingGapFill.Ev(1L, ts(1200000), 2L, 7.0))
      query.processAllAvailable()
      // watermark passes hour 0: it closes with value 7.0
      in.addData(StreamingGapFill.Ev(1L, ts(2 * HourMs), 3L, 9.0))
      query.processAllAvailable()
      val afterClose = collectPoints("gapfill2")
      assert(afterClose === Seq((1L, T0, true, 7.0)))

      // extension: hour 5 observed later — hours 1..4 must fill with
      // the carry once the watermark passes them (hour 2 is observed
      // with 9.0 from the flush event above)
      in.addData(StreamingGapFill.Ev(1L, ts(5 * HourMs + 60000), 4L, 11.0))
      in.addData(StreamingGapFill.Ev(1L, ts(7 * HourMs), 5L, 13.0))
      query.processAllAvailable()
      // straggler for already-emitted hour 0 (far below watermark):
      // must be discarded, not re-emitted or re-valued
      in.addData(StreamingGapFill.Ev(1L, ts(1500000), 6L, 555.0))
      in.addData(StreamingGapFill.Ev(1L, ts(12 * HourMs), 7L, 17.0))
      query.processAllAvailable()

      val got = collectPoints("gapfill2").filter(t => t._2 < T0 + 6 * HourMs)
      assert(got === Seq(
        (1L, T0, true, 7.0),
        (1L, T0 + 1 * HourMs, false, 7.0),
        (1L, T0 + 2 * HourMs, true, 9.0),
        (1L, T0 + 3 * HourMs, false, 9.0),
        (1L, T0 + 4 * HourMs, false, 9.0),
        (1L, T0 + 5 * HourMs, true, 11.0)))
    } finally query.stop()
  }

  test("micro-batch plan shuffles exactly once (no batch-side repartition leaks)") {
    // r16 (VERDICT #8): the batch q36 operator gained an up-front
    // repartition(user_id); StreamingGapFill is an independent
    // flatMapGroupsWithState formulation sharing no code with it, so
    // the streaming plan must stay at ONE exchange — the stateful
    // operator's own groupByKey shuffle. AQE is off in micro-batch
    // plans; an accidental second exchange would run every batch.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamingGapFill.Ev]
    val query = StreamingGapFill.fill(in.toDF(), watermarkDelay = "30 minutes")
      .writeStream.format("memory").queryName("gapfill_plan")
      .outputMode("append").start()
    try {
      in.addData(
        StreamingGapFill.Ev(1L, ts(600000), 1L, 3.0),
        StreamingGapFill.Ev(1L, ts(2 * HourMs), 2L, 9.0))
      query.processAllAvailable()
      val exec = query
        .asInstanceOf[org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
        .streamingQuery.lastExecution.executedPlan
      val nExchanges = exec.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
      }.size
      assert(nExchanges == 1,
        s"expected exactly 1 shuffle in the micro-batch plan, got $nExchanges:\n$exec")
      val nState = exec.toString.linesIterator
        .count(_.contains("FlatMapGroupsWithState"))
      assert(nState >= 1, "stateful operator missing from the micro-batch plan")
    } finally query.stop()
  }
}
