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

  test("randomized differential vs straight-line reference (fixed seed)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // heavy key/timestamp collision on purpose: 6 keys × ts 0..19
    val ltRows = (1 to 300).map(i =>
      (i.toLong, (rnd.nextInt(6)).toString, rnd.nextInt(20).toLong))
    val rtRows = (1 to 200).map(i =>
      (1000L + i, (rnd.nextInt(6)).toString, rnd.nextInt(20).toLong, rnd.nextDouble()))
    val lt = ltRows.toDF("lid", "k", "t")
    val rt = rtRows.toDF("rid", "k", "rt_ts", "v")
    def refBackward(key: String, ts: Long): Option[Long] =
      rtRows.filter(r => r._2 == key && r._3 <= ts)
        .sortBy(r => (r._3, r._1)).lastOption.map(_._1)
    def refForward(key: String, ts: Long): Option[Long] =
      rtRows.filter(r => r._2 == key && r._3 >= ts)
        .sortBy(r => (r._3, r._1)).headOption.map(_._1)
    val back = AsOfJoin.backward(lt, rt, Seq("k"), "t", "rt_ts",
        payload = Seq("rid", "v"), tieBreak = Seq("rid"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_ => r.getLong(3))))
    assert(back.length == ltRows.length)
    back.foreach { case (lid, k, t, got) =>
      assert(got == refBackward(k, t), s"backward lid=$lid k=$k t=$t")
    }
    val fwd = AsOfJoin.forward(lt, rt, Seq("k"), "t", "rt_ts",
        payload = Seq("rid"), tieBreak = Seq("rid"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_ => r.getLong(3))))
    fwd.foreach { case (lid, k, t, got) =>
      assert(got == refForward(k, t), s"forward lid=$lid k=$k t=$t")
    }
  }

  test("plan: one key shuffle, no join operator, no cartesian") {
    val plan = AsOfJoin.backward(trades, quotes, Seq("sym"),
        leftTs = "t", rightTs = "qt", payload = Seq("px"),
        tieBreak = Seq("qid"))
      .queryExecution.executedPlan.toString
    // the whole operator is union → window: any Join node would mean
    // the formulation regressed to a range join (pair explosion), and
    // more than one hash exchange would mean the union shuffles twice
    assert(!plan.contains("Join"), s"as-of join gained a join node:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected exactly 1 key shuffle, got $exchanges:\n$plan")
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
