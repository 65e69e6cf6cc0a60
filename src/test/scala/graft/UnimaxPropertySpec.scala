package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TrainingOps

/** Property differential for the r9 in-row UniMax waterfill rewrite
  * (t70): the HOF-fold formulation must equal a straight-line Scala
  * reference of the closed-form algorithm (sort by cap, monotone
  * prefix-feasibility test, equal split of the residual with the
  * integer remainder going to the first uncapped sources) on
  * randomized source distributions — not just the one shape the gate
  * corpus exercises.
  */
class UnimaxPropertySpec extends AnyFunSuite {

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

  /** Straight-line reference waterfill; epochs=2 and budget=19/10·total
    * mirror the operator's constants.
    */
  private def ref(sources: Seq[(String, Long)]): Seq[(String, Long, Long, Boolean, Long, Long)] = {
    val xs = sources.map { case (s, n) => (s, n, n * 2L) }
      .sortBy { case (s, _, c) => (c, s) }
    val n = xs.size
    val budget = xs.map(_._2).sum * 19L / 10L
    var sPrev = 0L
    val flagged = xs.zipWithIndex.map { case ((s, tok, c), i) =>
      val capped = sPrev + c * (n - i) <= budget
      sPrev += c
      (s, tok, c, capped)
    }
    val sc = flagged.filter(_._4).map(_._3).sum
    val k = math.max(flagged.count(!_._4).toLong, 1L)
    var rn = 0L
    flagged.map { case (s, tok, c, capped) =>
      val alloc = if (capped) c else {
        rn += 1
        (budget - sc) / k + (if (rn <= (budget - sc) % k) 1L else 0L)
      }
      (s, tok, c, capped, alloc, alloc * 1000000L / tok)
    }.sortBy(_._1)
  }

  private def run(sources: Seq[(String, Long)]) = {
    import spark.implicits._
    TrainingOps.unimaxAlloc(sources.toDF("source", "n_tokens"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3),
        r.getLong(4), r.getLong(5)))
      .sortBy(_._1).toSeq
  }

  test("constructed shapes: single source, all equal, dominant, cap ties") {
    val shapes = Seq(
      Seq("a" -> 100L),
      Seq("a" -> 50L, "b" -> 50L, "c" -> 50L),
      Seq("big" -> 1000000L, "s1" -> 10L, "s2" -> 20L, "s3" -> 30L),
      Seq("a" -> 40L, "b" -> 40L, "c" -> 41L, "d" -> 400L), // cap ties on a/b
      Seq("a" -> 1L, "b" -> 1L, "c" -> 1L, "d" -> 1L, "e" -> 1L))
    shapes.foreach { s =>
      assert(run(s) === ref(s), s"divergence on $s")
    }
  }

  test("randomized source distributions match the reference waterfill") {
    val rnd = new scala.util.Random(4242)
    (1 to 12).foreach { round =>
      val n = 1 + rnd.nextInt(12)
      val sources = (0 until n).map { i =>
        // mix magnitudes so both regimes (cap-out and water level) occur
        val tok = rnd.nextInt(3) match {
          case 0 => 1L + rnd.nextInt(50)
          case 1 => 1L + rnd.nextInt(5000)
          case _ => 1L + rnd.nextInt(1000000)
        }
        s"src$i" -> tok
      }
      assert(run(sources) === ref(sources), s"divergence round $round on $sources")
    }
  }
}
