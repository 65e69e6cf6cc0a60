package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{CurationOps, TrainingOps, VectorOps}

/** Behavioral contracts of the round-8 additions beyond their DuckDB
  * hash gates: classifier inference (t66), chunk-level retrieval
  * (t67) and the ANN recall gate (v43).
  */
class Round8GatesSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.01"

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

  test("t66 classifier: keep ⇔ positive score, covers every tokenful doc, repartition-invariant") {
    val rows = CurationOps.qClassifierScore(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val score = r.getAs[Long]("score_micro")
      assert(r.getAs[Boolean]("keep") == (score > 0L))
      assert(r.getAs[Long]("n_toks") > 0L)
    }
    // the weight ramp must actually discriminate — a degenerate
    // all-keep/all-drop classifier would gate nothing
    val kept = rows.count(_.getAs[Boolean]("keep"))
    assert(kept > 0 && kept < rows.length)
    val again = CurationOps.qClassifierScore(spark, dir).repartition(7)
      .orderBy(col("doc_id")).collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("t67 chunk retrieval: ranks are 1..k per query and every hit contains a query term") {
    val out = TrainingOps.qChunkRetrieval(spark, dir).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.sameElements(1 to rs.length))
      // scores are positive idf sums and non-increasing down the ranking
      val byRank = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("score"))
      assert(byRank.forall(_ > 0L))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
    // spot-check rank-1 hits really contain a term of their query
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val queries = CurationOps.RetrievalQueries.toMap
    out.filter(_.getAs[Int]("rank") == 1).foreach { r =>
      val qterms = queries(r.getAs[Long]("query_id")).split(' ').filter(_.nonEmpty).toSet
      val words = docs(r.getAs[Long]("doc_id")).split(' ').toSet
      assert(qterms.exists(words.contains))
    }
  }

  test("t68 decontamination: train docs only, contaminated ⇔ n_hit > 0, hits bounded by spans") {
    val rows = TrainingOps.qSpanDecontaminate(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val hits = r.getAs[Long]("n_hit")
      assert(hits >= 0L && hits <= r.getAs[Long]("n_spans"))
      assert(r.getAs[Boolean]("contaminated") == (hits > 0L))
    }
    // the screen must report exactly the train-split docs that carry
    // at least one full-length span — same split rule as t33
    val expected = Tables.documents(spark, dir)
      .withColumn("n", size(expr("filter(split(text, ' '), w -> w != '')")))
      .filter(col("n") >= 20)
      .withColumn("split", graft.operators.TrainingOps.splitCol(col("doc_id")))
      .filter(col("split") === "train")
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted
    assert(rows.map(_.getAs[Long]("doc_id")).sorted.sameElements(expected))
  }

  test("round-8 ops on a degenerate corpus: empty text, sub-span docs, planted contamination") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("r8edge").toString
    val aSpan = (0 until 20).map(i => s"a$i").mkString(" ")
    Seq(
      // doc 0 (train, md5 bucket 207): identical 20-token text to the
      // eval doc below -> its ONLY span collides -> contaminated
      (0L, aSpan, "en", "s", aSpan.length.toLong),
      // doc 1 (train): 25 distinct tokens, no overlap -> clean
      (1L, (0 until 25).map(i => s"b$i").mkString(" "), "en", "s", 100L),
      // doc 2 (train): carries retrieval-query-1 terms -> t67 hit
      (2L, "window agg stream " + (0 until 21).map(i => s"c$i").mkString(" "),
        "en", "s", 120L),
      // doc 3: EMPTY text -> zero tokens -> absent from every token op
      (3L, "", "en", "s", 0L),
      // doc 4 (train): 2 tokens -> in t66, below t68's 20-token span floor
      (4L, "tiny doc", "en", "s", 8L),
      // doc 6 (EVAL, md5 bucket 22): the planted contamination source
      (6L, aSpan, "en", "s", aSpan.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    // t66: every tokenful doc scored, empty-text doc absent
    val clf = CurationOps.qClassifierScore(spark, tmp).collect()
    assert(clf.map(_.getAs[Long]("doc_id")).toSeq == Seq(0L, 1L, 2L, 4L, 6L))
    assert(clf.find(_.getAs[Long]("doc_id") == 4L).get.getAs[Long]("n_toks") == 2L)

    // t68: population = train docs with >= 20 tokens; only doc 0 flagged
    val dec = TrainingOps.qSpanDecontaminate(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("contaminated")).toMap
    assert(dec == Map(0L -> true, 1L -> false, 2L -> false))

    // t67: query 1 ("window agg stream") hits doc 2 chunk 0 with the
    // full idf sum (df=1 per term -> 1_000_000 each); no other query
    // has a term in this corpus
    val ret = TrainingOps.qChunkRetrieval(spark, tmp).collect()
    assert(ret.length == 1)
    val hit = ret.head
    assert(hit.getAs[Long]("query_id") == 1L && hit.getAs[Int]("rank") == 1)
    assert(hit.getAs[Long]("doc_id") == 2L && hit.getAs[Long]("chunk_id") == 0L)
    assert(hit.getAs[Long]("score") == 3000000L)
    graft.operators.SessionMemo.release(spark)
  }

  test("q36 gap fill: contiguous hourly grid per user, first point observed, fill carries last value") {
    val rows = graft.operators.Analytics.qGapFill(spark, dir).collect()
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    byUser.foreach { case (_, rs) =>
      val hours = rs.map(_.getAs[java.sql.Timestamp]("h").getTime).sorted
      // contiguous hourly grid over [min, max]
      assert(hours.zip(hours.tail).forall { case (a, b) => b - a == 3600000L })
      // grid starts at an observed point, so the fill never emits null
      val first = rs.minBy(_.getAs[java.sql.Timestamp]("h").getTime)
      assert(first.getAs[Boolean]("observed"))
      assert(rs.forall(!_.isNullAt(rs.head.fieldIndex("value_ff"))))
    }
    // filled (unobserved) points repeat the previous point's value
    byUser.values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[java.sql.Timestamp]("h").getTime)
      sorted.zip(sorted.tail).foreach { case (prev, cur) =>
        if (!cur.getAs[Boolean]("observed"))
          assert(cur.getAs[Double]("value_ff") == prev.getAs[Double]("value_ff"))
      }
    }
    // observed count equals the distinct (user, hour) pairs in events
    val expected = Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("hour", col("ts"))).distinct().count()
    assert(rows.count(_.getAs[Boolean]("observed")).toLong == expected)
  }

  test("t69 bigram surprise: n_bigrams = tokens − 1, flag discriminates, flagged ⇔ mean > τ") {
    val rows = CurationOps.qBigramSurprise(spark, dir).collect()
    assert(rows.nonEmpty)
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(expr("filter(split(text, ' '), w -> w != '')")).as("n"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n")).toMap
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("n_bigrams") == toks(id) - 1L)
      val mean = r.getAs[Double]("mean_surprise")
      assert(r.getAs[Boolean]("flagged") == (mean > 3.65))
      assert(mean > 0.0)
    }
    // every multi-token doc is scored; the tau actually discriminates
    assert(rows.length == toks.count(_._2 >= 2))
    val flagged = rows.count(_.getAs[Boolean]("flagged"))
    assert(flagged > 0 && flagged < rows.length)
  }

  test("t70 unimax: allocations exhaust the budget, caps respected, water level uniform ±1") {
    val rows = TrainingOps.qUnimaxMix(spark, dir).collect()
    assert(rows.nonEmpty)
    val tt = rows.map(_.getAs[Long]("n_tokens")).sum
    val budget = tt * 19 / 10
    rows.foreach { r =>
      assert(r.getAs[Long]("alloc") <= r.getAs[Long]("cap"))
      assert(r.getAs[Boolean]("capped") ==
        (r.getAs[Long]("alloc") == r.getAs[Long]("cap")))
      // epoch cap: alloc / n_tokens ≤ 2 epochs
      assert(r.getAs[Long]("epochs_micro") <= 2000000L)
    }
    val (capped, uncapped) = rows.partition(_.getAs[Boolean]("capped"))
    // both waterfill regimes must be exercised on this corpus
    assert(capped.nonEmpty && uncapped.nonEmpty)
    // uncapped sources sit at one shared water level (remainder ±1)
    val allocs = uncapped.map(_.getAs[Long]("alloc"))
    assert(allocs.max - allocs.min <= 1L)
    // the budget is spent exactly when any source is uncapped
    assert(rows.map(_.getAs[Long]("alloc")).sum == budget)
  }

  test("v43 recall: n_hit ≤ n_exact = 3, recall consistent, one row per brute-force query") {
    val rows = VectorOps.qAnnRecall(spark, dir).collect()
    val nQueries = VectorOps.qAnnBruteForce(spark, dir)
      .select(col("query_id")).distinct().count()
    assert(rows.length.toLong == nQueries)
    rows.foreach { r =>
      val nExact = r.getAs[Long]("n_exact")
      val nHit = r.getAs[Long]("n_hit")
      assert(nExact == 3L)
      assert(nHit >= 0L && nHit <= nExact)
      assert(r.getAs[Double]("recall") == nHit.toDouble / nExact)
    }
  }

}
