package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Analytics

/** Pins q40's bounded join fanout (r8 VERDICT #6): a degenerate
  * single-user corpus — the bot shape that makes a raw user equi-join
  * quadratic — must produce exactly 2 candidate rows per signup, and
  * the bucketed min/max existence test must equal the brute-force
  * windowed scan on randomized data (including the window's exclusive
  * lower / inclusive upper edges).
  */
class FunnelFanoutSpec extends AnyFunSuite {

  private val W = 3600L * 1000000 // the gate's 1-hour window, µs

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

  private def frames(signups: Seq[(Long, Long, Long)], purchases: Seq[(Long, Long)]) = {
    import spark.implicits._
    (signups.map { case (u, sid, tsu) => (u, sid, tsu, "d") }
       .toDF("user_id", "sid", "tsu", "day"),
     purchases.toDF("user_id", "tp"))
  }

  test("single hyperactive user: 2 rows per signup, not signups x purchases") {
    val nS = 50; val nP = 400
    val signups = (0 until nS).map(i => (1L, i.toLong, 1000000L * i))
    val purchases = (0 until nP).map(i => (1L, 500000L * i))
    val (su, pu) = frames(signups, purchases)
    val cand = Analytics.funnelCandidates(su, pu, W)
    assert(cand.count() === 2L * nS,
      s"fanout must be 2/signup, not up to ${nS * nP}")
  }

  test("bucketed existence equals the brute-force windowed scan") {
    val rnd = new scala.util.Random(99)
    val signups = (0 until 120).map(i =>
      (rnd.nextInt(5).toLong, i.toLong, rnd.nextLong(8L * W)))
    val purchases = (0 until 300).map(_ =>
      (rnd.nextInt(5).toLong, rnd.nextLong(8L * W))) ++
      // pin the edges: exactly-at-signup (excluded) and exactly-at-w (included)
      Seq((9L, 100L), (8L, 100L + W))
    val edgeSignups = signups ++ Seq((9L, 900L, 100L), (8L, 901L, 100L))
    val (su, pu) = frames(edgeSignups, purchases)
    val got = Analytics.funnelCandidates(su, pu, W)
      .groupBy(col("sid")).agg(max(when(col("hit"), 1).otherwise(0)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val want = edgeSignups.map { case (u, sid, tsu) =>
      sid -> (if (purchases.exists { case (pu2, tp) =>
        pu2 == u && tp > tsu && tp - tsu <= W }) 1 else 0)
    }.toMap
    assert(got === want)
    assert(got(900L) === 0, "purchase at exactly tsu must not convert")
    assert(got(901L) === 1, "purchase at exactly tsu+w must convert")
  }

  test("bucketing is floor division: pre-1970 timestamps keep the two-bucket lemma") {
    // `x div w` truncates toward zero, making bucket 0 double-width for
    // negative timestamps; a purchase OUTSIDE the window would share the
    // truncation bucket and read as a false conversion
    val signups = Seq((1L, 1L, -W / 2), (2L, 2L, -W / 2))
    val purchases = Seq(
      (1L, 3 * W / 4),  // outside (-W/2, W/2]: must NOT convert
      (2L, W / 4))      // inside: must convert
    val (su, pu) = frames(signups, purchases)
    val got = Analytics.funnelCandidates(su, pu, W)
      .groupBy(col("sid")).agg(max(when(col("hit"), 1).otherwise(0)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(1L -> 0, 2L -> 1))
  }
}
