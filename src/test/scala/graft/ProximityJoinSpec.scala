package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.ProximityJoin

/** Stream-stream interval join parity: the streaming proximity join
  * emits exactly the pairs the batch q37 semantics count, independent
  * of micro-batch boundaries, and late data past the watermark is
  * dropped from state rather than growing it.
  */
class ProximityJoinSpec extends AnyFunSuite {

  final case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String)

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(seconds: Long): Timestamp =
    new Timestamp(1700000000000L + seconds * 1000L)

  test("randomized stream matches brute-force pairs across micro-batch splits") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(11)
    val w = 120
    val evs = (1L to 60L).map { i =>
      Ev(i, ts(rnd.nextInt(600).toLong), rnd.nextInt(3).toLong + 1,
        if (rnd.nextBoolean()) "click" else "view")
    }
    val expected = (for {
      a <- evs; b <- evs
      if a.event_type == b.event_type && a.user_id != b.user_id &&
        b.ts.getTime > a.ts.getTime &&
        b.ts.getTime - a.ts.getTime <= w * 1000L
    } yield (a.event_id, b.event_id)).sorted

    val input = MemoryStream[Ev]
    val query = ProximityJoin.pairs(input.toDF(), windowSeconds = w,
        watermarkDelay = "20 minutes")
      .writeStream.format("memory").queryName("prox")
      .outputMode("append").start()
    try {
      // split the stream into three micro-batches at arbitrary points:
      // pairs spanning a batch boundary must still match
      evs.grouped(20).foreach { g => input.addData(g); query.processAllAvailable() }
      val got = spark.table("prox")
        .select($"ea", $"eb").as[(Long, Long)].collect().sorted
      assert(got.sameElements(expected),
        s"got ${got.length} pairs, expected ${expected.length}")
      assert(expected.nonEmpty)
    } finally query.stop()
  }

  test("pairs respect the window bound and the cross-user constraint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val query = ProximityJoin.pairs(input.toDF(), windowSeconds = 60)
      .writeStream.format("memory").queryName("prox2")
      .outputMode("append").start()
    try {
      input.addData(
        Ev(1, ts(0), 1, "click"),
        Ev(2, ts(30), 2, "click"),   // in-window, cross-user -> pair (1,2)
        Ev(3, ts(61), 1, "click"),   // 61s after ev1 (out of window); 31s after ev2 -> (2,3)
        Ev(4, ts(30), 1, "click"),   // same user as 1 and 3; same ts as 2 (tb>ta fails)
        Ev(5, ts(30), 2, "view"))    // different type -> never pairs with clicks
      query.processAllAvailable()
      val got = spark.table("prox2")
        .select($"ea", $"eb").as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 2L), (2L, 3L)), got.toString)
    } finally query.stop()
  }
}
