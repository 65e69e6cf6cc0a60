package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** Behavioral contract of v47 reciprocal-rank fusion: scores are the
  * exact integer rank arithmetic the output ranks claim (recomputable
  * from the pinned per-backend ranks), absence from a backend's
  * top-20 is marked 0 and contributes nothing, and fusion genuinely
  * fuses — both backends' contributions are visible in the winners.
  */
class HybridFusionSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private val dir = "/root/testdata/sf0.001"

  private lazy val rows =
    graft.operators.VectorOps.qHybridFusion(spark, dir).collect()

  test("every fused score equals its pinned ranks' integer RRF arithmetic") {
    assert(rows.nonEmpty && rows.length % 5 == 0)
    for (r <- rows) {
      val (score, cr, hr) = (r.getAs[Long]("rrf_score"),
        r.getAs[Long]("cos_rank"), r.getAs[Long]("ham_rank"))
      val expected =
        (if (cr > 0) 1000000L / (60 + cr) else 0L) +
        (if (hr > 0) 1000000L / (60 + hr) else 0L)
      assert(score == expected, s"score $score != $expected (cr=$cr hr=$hr)")
      assert(cr >= 0 && cr <= 20 && hr >= 0 && hr <= 20)
      assert(cr > 0 || hr > 0) // a fused item came from SOME backend
    }
  }

  test("fused order is by (score desc, neighbor_id) within each query") {
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, qs) =>
      val sorted = qs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq == (1L to sorted.length))
      val keys = sorted.map(r =>
        (-r.getAs[Long]("rrf_score"), r.getAs[Long]("neighbor_id")))
      assert(keys.toSeq == keys.sortBy(identity).toSeq)
    }
  }

  test("both backends contribute: dual-list items exist and outrank single-list peers with like ranks") {
    val dual = rows.filter(r =>
      r.getAs[Long]("cos_rank") > 0 && r.getAs[Long]("ham_rank") > 0)
    assert(dual.nonEmpty, "no fused item appeared in both backends' top-20")
    // an item in both lists at ranks (a, b) strictly outscores any
    // single-list item whose one rank is min(a, b) — the additive core
    // of RRF
    for (r <- dual) {
      val best = math.min(r.getAs[Long]("cos_rank"), r.getAs[Long]("ham_rank"))
      val single = 1000000L / (60 + best)
      assert(r.getAs[Long]("rrf_score") > single)
    }
  }
}
