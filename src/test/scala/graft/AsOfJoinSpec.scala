package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOfJoin

/** Edge-semantics pins for the as-of join (r7 VERDICT #7): inclusive
  * ties, deterministic winners among duplicate timestamps, and the
  * empty/no-match build side — plus a differential check of the q23
  * gate formulation against a straight-line per-row evaluation of the
  * real corpus.
  */
class AsOfJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def trades = {
    import spark.implicits._
    Seq(
      (1L, "a", 100L), // before any quote
      (2L, "a", 200L), // exactly at a quote ts (tie)
      (3L, "a", 250L),
      (4L, "b", 500L), // key with no quotes at all
      (5L, "a", 400L)
    ).toDF("trade_id", "sym", "t")
  }

  private def quotes = {
    import spark.implicits._
    Seq(
      ("a", 200L, 10.0, 101L),
      ("a", 200L, 11.0, 102L), // duplicate ts — larger qid must win backward
      ("a", 300L, 12.0, 103L)
    ).toDF("sym", "qt", "px", "qid")
  }

  test("backward: inclusive tie, duplicate-ts winner, and no-match null") {
    val got = AsOfJoin.backward(trades, quotes, Seq("sym"),
        leftTs = "t", rightTs = "qt", payload = Seq("px", "qid"),
        tieBreak = Seq("qid"))
      .orderBy(col("trade_id"))
      .collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_ => r.getDouble(3)),
        Option(r.get(4)).map(_ => r.getLong(4))))
    assert(got.toSeq == Seq(
      (1L, None, None),              // nothing at-or-before 100
      (2L, Some(11.0), Some(102L)),  // tie inclusive; larger qid wins
      (3L, Some(11.0), Some(102L)),  // still the 200 quote
      (4L, None, None),              // key never quoted
      (5L, Some(12.0), Some(103L))))
  }

  test("forward: inclusive tie picks the smallest future row") {
    val got = AsOfJoin.forward(trades, quotes, Seq("sym"),
        leftTs = "t", rightTs = "qt", payload = Seq("px", "qid"),
        tieBreak = Seq("qid"))
      .orderBy(col("trade_id"))
      .collect()
      .map(r => (r.getLong(0), Option(r.get(4)).map(_ => r.getLong(4))))
    assert(got.toSeq == Seq(
      (1L, Some(101L)),  // earliest at-or-after 100 is (200, qid 101)
      (2L, Some(101L)),  // tie inclusive; smallest qid wins forward
      (3L, Some(103L)),
      (4L, None),
      (5L, None)))       // latest quote is 300 < 400 — nothing ahead
  }

  test("empty build side yields all-null payload, not an empty result") {
    val noQuotes = quotes.filter(lit(false))
    val got = AsOfJoin.backward(trades, noQuotes, Seq("sym"),
        leftTs = "t", rightTs = "qt", payload = Seq("px"))
      .orderBy(col("trade_id")).collect()
    assert(got.length == trades.count())
    assert(got.forall(_.isNullAt(3)))
  }

  test("q23 gate formulation matches a straight-line per-row evaluation") {
    val dir = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, dir)
      .filter(col("event_type").isin("signup", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime, r.getString(3)))
    val signups = ev.filter(_._4 == "signup").groupBy(_._2)
    val expected = ev.filter(_._4 == "purchase").sortBy(_._1).map {
      case (id, user, ts, _) =>
        val best = signups.getOrElse(user, Array.empty[(Long, Long, Long, String)])
          .filter(_._3 <= ts)
          .sortBy(s => (s._3, s._1)).lastOption.map(_._3)
        (id, best)
    }
    val got = graft.operators.Scalar.qAsofJoin(spark, dir).collect()
      .map(r => (r.getLong(0),
        Option(r.getTimestamp(3)).map(_.getTime)))
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (g, e) => assert(g == e, s"got $g expected $e") }
  }
}
