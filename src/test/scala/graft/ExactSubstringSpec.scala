package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TrainingOps

/** Behavioral contract of t82 exact-substring dedup (Lee et al. 2022's
  * ExactSubstr statistic) on a planted corpus — the case the window
  * operators cannot express: a verbatim quote at ARBITRARY alignment
  * must come back as ONE maximal (start_a, start_b, span_len) fact,
  * where t63's aligned chunks miss it entirely and t65 only reports it
  * as 41 anonymous repeated windows.
  *
  * Corpus (all tokens unique per region, so no accidental matches):
  *   doc 1 (A): a1..a50  Q1..Q60  c1..c90                 (200 tokens)
  *   doc 2 (B): b1..b37  Q1..Q60  d1..d53                 (150 tokens)
  *   doc 3 (C): e1..e10  Q1..Q60  SEP  c1..c55            (126 tokens)
  *   doc 4 (D): f1..f20  a11..a40  g1..g30                 (80 tokens)
  * The Q-quote sits at offsets 51/38/11 in A/B/C — none equal, none
  * chunk-aligned. C additionally quotes A's c1..c55 (A offset 111)
  * behind a separator token, so A–C must yield TWO spans, not one.
  * D's 30-token quote of A is real but under the 50-token floor.
  */
class ExactSubstringSpec extends AnyFunSuite {

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

  private def toks(prefix: String, from: Int, to: Int): Seq[String] =
    (from to to).map(i => s"$prefix$i")

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("exactsub").toString
    val q = toks("Q", 1, 60)
    val a = toks("a", 1, 50) ++ q ++ toks("c", 1, 90)
    val b = toks("b", 1, 37) ++ q ++ toks("d", 1, 53)
    val c = toks("e", 1, 10) ++ q ++ Seq("SEP") ++ toks("c", 1, 55)
    val dd = toks("f", 1, 20) ++ toks("a", 11, 40) ++ toks("g", 1, 30)
    Seq((1L, a), (2L, b), (3L, c), (4L, dd))
      .map { case (id, ws) => (id, ws.mkString(" "), "en", "s", ws.mkString(" ").length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("arbitrary-offset 60-token quote reported as ONE maximal span per pair") {
    val rows = TrainingOps.qExactSubstring(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(rows == Seq(
      (1L, 2L, 51L, 38L, 60L),   // A-quote in B, unaligned offsets
      (1L, 3L, 51L, 11L, 60L),   // A-quote in C ...
      (1L, 3L, 111L, 72L, 55L),  // ... plus C's second, separator-split quote
      (2L, 3L, 38L, 11L, 60L)),  // B and C share the quote with each other
      s"got $rows")
  }

  test("sub-threshold 30-token quote is screened out (t65 still sees it piecewise)") {
    val spans = TrainingOps.qExactSubstring(spark, dir).collect()
    assert(!spans.exists(r => r.getLong(0) == 4L || r.getLong(1) == 4L))
    // the contrast the operator exists for: t65's fixed windows DO see
    // both quotes, but only as per-window counts with no span identity
    val t65 = TrainingOps.qRepeatedSpans(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(t65(4L) == 11L, "30-token quote = 11 repeated 20-token windows")
    assert(t65(2L) == 41L, "60-token quote = 41 repeated windows, no span fact")
  }
}
