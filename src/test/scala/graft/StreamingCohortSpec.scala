package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingCohort

/** Streaming cohort equivalence: aggregating the emitted finalized
  * (user, cohort, week, n_events) contributions must reproduce the
  * batch q41 retention matrix — COUNT(*) per (cohort, week) cell =
  * active_users, SUM(n_events) = n_events — on randomized disordered
  * streams, including a late-but-valid arrival that LOWERS a user's
  * cohort day after the first batch.
  */
class StreamingCohortSpec extends AnyFunSuite {

  private val DayMs = 86400000L

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(day: Double): Timestamp =
    new Timestamp((day * DayMs).toLong)

  private def run(batches: Seq[Seq[StreamingCohort.Tick]], name: String,
      delay: String = "30 days") = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamingCohort.Tick]
    val query = StreamingCohort.contributions(in.toDF(), watermarkDelay = delay)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b); query.processAllAvailable() }
      // push the watermark far enough to close every week
      in.addData(StreamingCohort.Tick(999999L, ts(4000)))
      query.processAllAvailable()
      spark.table(name).as[StreamingCohort.Contribution].collect().toSeq
        .filter(_.user_id != 999999L)
    } finally query.stop()
  }

  test("randomized disordered stream reproduces the batch retention matrix") {
    spark.sparkContext.setLogLevel("WARN")
    val rnd = new scala.util.Random(17)
    val events = (0 until 400).map(_ =>
      (rnd.nextInt(12).toLong, 100.0 + rnd.nextInt(60) + rnd.nextDouble()))
    val ticks = rnd.shuffle(events.map { case (u, d) =>
      StreamingCohort.Tick(u, ts(d)) })
    // the delay must exceed the shuffled stream's ~60-day disorder span
    val got = run(ticks.grouped(80).toSeq, "cohort1", delay = "90 days")

    // per-user contributions must be exactly one row per active week
    val byUser = events.groupBy(_._1)
    val want = byUser.flatMap { case (u, evs) =>
      val cohort = evs.map(e => (e._2 * DayMs).toLong / DayMs).min
      evs.groupBy(e => ((e._2 * DayMs).toLong / DayMs - cohort) / 7)
        .map { case (wk, es) => (u, cohort, wk, es.size.toLong) }
    }.toSet
    assert(got.map(c => (c.user_id, c.cohort_day, c.week, c.n_events)).toSet === want)

    // the aggregated matrix equals the batch q41 cell definition
    import spark.implicits._
    val cells = got.toDF()
      .groupBy(col("cohort_day"), col("week"))
      .agg(count(lit(1)).as("active_users"), sum(col("n_events")).as("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val wantCells = want.groupBy(w => (w._2, w._3))
      // toSeq before mapping: Set.map would dedup equal per-user counts
      .map { case (k, ws) => k -> (ws.size.toLong, ws.toSeq.map(_._4).sum) }
    assert(cells === wantCells)
  }

  test("a late-but-valid earlier event lowers the cohort before any week closes") {
    val got = run(Seq(
      Seq(StreamingCohort.Tick(1L, ts(20.5)), StreamingCohort.Tick(1L, ts(22.5))),
      // arrives later, but inside the 30-day delay: becomes the cohort day
      Seq(StreamingCohort.Tick(1L, ts(10.5)))), "cohort2")
    assert(got.map(c => (c.cohort_day, c.week, c.n_events)).sorted ===
      Seq((10L, 0L, 1L), (10L, 1L, 2L)))
  }
}
