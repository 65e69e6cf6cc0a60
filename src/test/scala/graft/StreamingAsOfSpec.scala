package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingAsOf

/** Streaming as-of join equivalence: on randomized, disordered streams
  * split across micro-batches, the stateful streaming formulation emits
  * exactly the batch `AsOfJoin.backward` answer — inclusive ties,
  * largest tie-break among equal timestamps, null payload when no
  * build precedes.
  */
class StreamingAsOfSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(seconds: Long): Timestamp =
    new Timestamp(1700000000000L + seconds * 1000L)

  test("randomized disordered streams match the batch as-of join") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(23)
    val keys = Seq("aa", "bb", "cc")
    val probes = (1L to 40L).map(i =>
      (keys(rnd.nextInt(3)), i, ts(rnd.nextInt(300).toLong)))
    val builds = (1L to 60L).map(i =>
      (keys(rnd.nextInt(3)), ts(rnd.nextInt(300).toLong), i,
        math.round(rnd.nextDouble() * 10000) / 100.0))

    // batch reference via the oracle-gated operator
    val expected = graft.operators.AsOfJoin.backward(
        probes.toDF("key", "id", "t"),
        builds.toDF("key", "qt", "qid", "px"),
        keys = Seq("key"), leftTs = "t", rightTs = "qt",
        payload = Seq("px"), tieBreak = Seq("qid"))
      .collect()
      .map(r => (r.getAs[Long]("id"),
        Option(r.get(r.fieldIndex("px"))).map(_.asInstanceOf[Double])))
      .toMap

    val in = MemoryStream[StreamingAsOf.Tick]
    val probeDf = in.toDF().filter(col("side") === 0)
      .select(col("key"), col("ts"), col("id"))
    val buildDf = in.toDF().filter(col("side") === 1)
      .select(col("key"), col("ts"), col("id"), col("value"))
    // the shuffled replay disorders events across the full 300 s span,
    // so the allowed lateness must exceed it or the drops are the
    // WATERMARK's (correct) doing, not the join's
    val query = StreamingAsOf.backward(probeDf, buildDf,
        watermarkDelay = "600 seconds")
      .writeStream.format("memory").queryName("asof")
      .outputMode("append").start()
    try {
      // interleave both sides, shuffled, split across 4 micro-batches
      val ticks = rnd.shuffle(
        probes.map { case (k, i, t) => StreamingAsOf.Tick(k, t, 0, i, 0.0) } ++
        builds.map { case (k, t, i, v) => StreamingAsOf.Tick(k, t, 1, i, v) })
      ticks.grouped(25).foreach { g => in.addData(g); query.processAllAvailable() }
      // advance the watermark far past every event so all probes resolve
      in.addData(StreamingAsOf.Tick("zz", ts(10000), 1, 999L, 0.0))
      query.processAllAvailable()
      in.addData(StreamingAsOf.Tick("zz", ts(10001), 1, 1000L, 0.0))
      query.processAllAvailable()

      val got = spark.table("asof")
        .as[StreamingAsOf.Matched].collect()
        .map(m => m.probe_id -> m.px).toMap
      assert(got.keySet == expected.keySet,
        s"resolved ${got.size}/${expected.size} probes")
      expected.foreach { case (id, px) =>
        assert(got(id) == px, s"probe $id: got ${got(id)}, expected $px")
      }
    } finally query.stop()
  }

  test("inclusive tie, tie-break winner, and no-build null are pinned") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamingAsOf.Tick]
    val probeDf = in.toDF().filter(col("side") === 0)
      .select(col("key"), col("ts"), col("id"))
    val buildDf = in.toDF().filter(col("side") === 1)
      .select(col("key"), col("ts"), col("id"), col("value"))
    val query = StreamingAsOf.backward(probeDf, buildDf,
        watermarkDelay = "10 seconds")
      .writeStream.format("memory").queryName("asof2")
      .outputMode("append").start()
    try {
      in.addData(
        StreamingAsOf.Tick("k", ts(10), 1, 1L, 1.0),  // build at t=10
        StreamingAsOf.Tick("k", ts(10), 1, 2L, 2.0),  // same ts, bigger tie wins
        StreamingAsOf.Tick("k", ts(10), 0, 100L, 0),  // probe AT the tie ts
        StreamingAsOf.Tick("k", ts(5), 0, 101L, 0))   // probe before any build
      query.processAllAvailable()
      in.addData(StreamingAsOf.Tick("k", ts(500), 1, 9L, 9.0))
      query.processAllAvailable()
      in.addData(StreamingAsOf.Tick("k", ts(501), 1, 10L, 9.0))
      query.processAllAvailable()
      val got = spark.table("asof2")
        .as[StreamingAsOf.Matched].collect()
        .map(m => m.probe_id -> m.px).toMap
      assert(got(100L).contains(2.0), s"inclusive tie + tie-break: $got")
      assert(got(101L).isEmpty, s"no preceding build must be null: $got")
    } finally query.stop()
  }

  test("build-only keys are trimmed by watermark advance alone") {
    // r8 ADVICE: a key that received only build rows used to register no
    // timeout, so its build history survived until (unless) another tick
    // arrived. Drive the transition function directly with TestGroupState:
    // watermark advance must trim a quiet key to its single standing
    // candidate, after which no further timeout is registered (O(1) state).
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    def run(prior: Option[StreamingAsOf.Buf], ticks: Seq[StreamingAsOf.Tick],
        wm: Long, timedOut: Boolean) = {
      val st = TestGroupState.create[StreamingAsOf.Buf](
        optionalState = prior.map(Optional.of[StreamingAsOf.Buf])
          .getOrElse(Optional.empty[StreamingAsOf.Buf]),
        timeoutConf = GroupStateTimeout.EventTimeTimeout,
        batchProcessingTimeMs = 1L,
        eventTimeWatermarkMs = Optional.of(java.lang.Long.valueOf(wm)),
        hasTimedOut = timedOut)
      StreamingAsOf.update("k", ticks.iterator, st).toSeq
      st
    }
    val b = (sec: Long, id: Long) => StreamingAsOf.Tick("k", ts(sec), 1, id, id * 1.0)
    // batch 1: three builds arrive, no probes, wm = 0
    val s1 = run(None, Seq(b(100, 1), b(200, 2), b(300, 3)), ts(0).getTime, timedOut = false)
    assert(s1.get.builds.size === 3)
    assert(s1.getTimeoutTimestampMs.isPresent,
      "build-only state must register an eviction timeout")
    assert(s1.getTimeoutTimestampMs.get === ts(100).getTime)
    // timeout fires with wm past the first two builds: trimmed to the
    // standing candidate (t=200) + the still-young build (t=300)
    val s2 = run(Some(s1.get), Nil, ts(250).getTime, timedOut = true)
    assert(s2.get.builds.map(_._2).sorted === Seq(2L, 3L))
    assert(s2.getTimeoutTimestampMs.isPresent &&
      s2.getTimeoutTimestampMs.get === ts(300).getTime)
    // wm past everything: one standing row, and NO timeout re-registered
    val s3 = run(Some(s2.get), Nil, ts(400).getTime, timedOut = true)
    assert(s3.get.builds.map(_._2) === Seq(3L))
    assert(!s3.getTimeoutTimestampMs.isPresent,
      "fully-trimmed state must not keep firing timeouts")
  }
}
