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
