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

  test("randomized stream equals the batch window formulation (fixed seed)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(7)
    // 12 users × bursty timeline: gaps straddle the 30-minute split
    val events = (1 to 400).map { _ =>
      val uid = 1L + rnd.nextInt(12)
      val minute = rnd.nextInt(600)
      Sessionize.Event(uid, ts(minute), (rnd.nextInt(1000) + 1) / 100.0)
    }
    val input = MemoryStream[Sessionize.Event]
    val query = Sessionize.sessions(input.toDF(), gapMinutes = 30,
        watermarkDelay = "1 minute")
      .writeStream.format("memory").queryName("sessions_eq")
      .outputMode("append").start()
    try {
      // arbitrary micro-batch splits — equivalence must not depend on them.
      // Within one stream, batches must be fed in event-time-ish order or
      // the watermark (1 min) drops stragglers: sort globally, split at
      // random points
      val sorted = events.sortBy(_.ts.getTime)
      val cuts = (Seq(0, sorted.size) ++ Seq.fill(5)(rnd.nextInt(sorted.size))).distinct.sorted
      cuts.sliding(2).foreach { case Seq(a, b) =>
        if (b > a) { input.addData(sorted.slice(a, b)); query.processAllAvailable() }
      }
      // close every open session: a far-future dummy user advances the
      // watermark; one more batch lets the event-time timeouts fire
      input.addData(Sessionize.Event(99L, ts(10000), 0.0))
      query.processAllAvailable()
      input.addData(Sessionize.Event(99L, ts(10001), 0.0))
      query.processAllAvailable()

      val streamed = spark.table("sessions_eq").as[Sessionize.Session]
        .collect().filter(_.user_id != 99L)
        .map(s => (s.user_id, s.session_start.getTime, s.session_end.getTime,
          s.n_events, math.round(s.session_value * 100)))
        .toSet

      // batch reference: the q28 lag/cumulative-boundary formulation
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("value"))
      val gapUs = unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(byUser))
      val batch = events.toDF("user_id", "ts", "value")
        .withColumn("new_session",
          when(gapUs.isNull || gapUs > 30L * 60 * 1000000, 1L).otherwise(0L))
        .withColumn("session_id", sum(col("new_session"))
          .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n"), min(col("ts")).as("s"), max(col("ts")).as("e"),
          sum(round(col("value") * 100).cast("long")).as("cents"))
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(3).getTime,
          r.getTimestamp(4).getTime, r.getLong(2), r.getLong(5)))
        .toSet
      assert(streamed == batch,
        s"only-streamed: ${streamed -- batch}\nonly-batch: ${batch -- streamed}")
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
