package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TrainingOps

/** Behavioral contract of t83 (within-doc self-repetition) and t84
  * (substring-dedup cut plan) on a planted corpus.
  *
  * Corpus (tokens unique per region, so no accidental matches):
  *   doc 1 (A): a1..a50  Q1..Q60  c1..c90                  (200 tokens)
  *   doc 2 (B): b1..b37  Q1..Q60  d1..d53                  (150 tokens)
  *   doc 3 (E): u1..u10  b30..b37  Q1..Q60  d1..d10  v1..v20 (108 tokens)
  *   doc 4 (S): x1..x30  Q1..Q60  y1..y25  Q1..Q60  z1..z15 (190 tokens)
  * E quotes a 78-token contiguous run OF B (b30..b37 Q d1..d10) that
  * strictly contains the shared Q-quote — so E's cut intervals from
  * the (B,E) and (A,E) pairs OVERLAP and must merge to one cut.
  * S contains the Q-quote TWICE (offsets 31 and 116) — the
  * self-repetition case t82's doc_a < doc_b join cannot see.
  */
class SelfRepetitionSpec extends AnyFunSuite {

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
    val d = java.nio.file.Files.createTempDirectory("selfrep").toString
    val q = toks("Q", 1, 60)
    val a = toks("a", 1, 50) ++ q ++ toks("c", 1, 90)
    val b = toks("b", 1, 37) ++ q ++ toks("d", 1, 53)
    val e = toks("u", 1, 10) ++ toks("b", 30, 37) ++ q ++ toks("d", 1, 10) ++
      toks("v", 1, 20)
    val sdoc = toks("x", 1, 30) ++ q ++ toks("y", 1, 25) ++ q ++ toks("z", 1, 15)
    Seq((1L, a), (2L, b), (3L, e), (4L, sdoc))
      .map { case (id, ws) =>
        (id, ws.mkString(" "), "en", "s", ws.mkString(" ").length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("t83: a doc quoting ITSELF yields one maximal span; clean docs are absent") {
    val rows = TrainingOps.qSelfRepetition(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rows == Seq((4L, 31L, 116L, 60L)), s"got $rows")
    // the contrast: t82 sees S's quote only against OTHER docs, never
    // the intra-doc pair — its output has no (doc_a == doc_b) row shape
  }

  test("t84: overlapping cut intervals from different source pairs merge per doc") {
    val rows = TrainingOps.qSubstringCutPlan(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    // doc 2: one 60-token cut from the (A,B) quote
    // doc 3: [11,88] (78-token run of B) and [19,78] (Q from A) MERGE -> one cut
    // doc 4: both Q copies cut (quoted by A/B/E), disjoint -> two cuts
    // doc 1 is lowest-id everywhere -> keeps all text, absent
    assert(rows == Seq(
      (2L, 1L, 60L, 150L, 60.0 / 150),
      (3L, 1L, 78L, 108L, 78.0 / 108),
      (4L, 2L, 120L, 190L, 120.0 / 190)), s"got $rows")
  }

  test("t85: applying the plan removes exactly the merged spans, keep-first survives whole") {
    def md5(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val rows = TrainingOps.qSubstringApply(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    val aText = (toks("a", 1, 50) ++ toks("Q", 1, 60) ++ toks("c", 1, 90)).mkString(" ")
    val bKept = (toks("b", 1, 37) ++ toks("d", 1, 53)).mkString(" ")
    val eKept = (toks("u", 1, 10) ++ toks("v", 1, 20)).mkString(" ")
    val sKept = (toks("x", 1, 30) ++ toks("y", 1, 25) ++ toks("z", 1, 15)).mkString(" ")
    assert(rows == Seq(
      (1L, 200L, 200L, md5(aText)),   // lowest-id member keeps ALL text
      (2L, 150L, 90L, md5(bKept)),    // 60-token Q cut
      (3L, 108L, 30L, md5(eKept)),    // merged [11,88] cut
      (4L, 190L, 70L, md5(sKept))),   // both Q copies cut
      s"got $rows")
  }

  test("t83 occurrence cap: periodic boilerplate beyond the cap is screened out") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("selfrep2").toString
    // 25 repeats of a 10-token phrase: every window occurs >20 times
    // within the doc -> SelfOccCap excludes it (t36's territory), while
    // doc 2's 2-occurrence self-quote still reports
    val periodic = Seq.fill(25)(toks("p", 1, 10)).flatten
    val quoter = toks("m", 1, 10) ++ toks("Q", 1, 55) ++ toks("n", 1, 10) ++
      toks("Q", 1, 55)
    Seq((1L, periodic), (2L, quoter))
      .map { case (id, ws) =>
        (id, ws.mkString(" "), "en", "s", ws.mkString(" ").length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = TrainingOps.qSelfRepetition(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rows == Seq((2L, 11L, 76L, 55L)), s"got $rows")
  }

  test("t87 sampled companion: exactly t83's rows restricted to the md5-bucket sample (r12)") {
    // the real corpus, not a planted one: the restriction equality must
    // hold on arbitrary data, and the sample must be non-empty
    val real = "/root/testdata/sf0.001"
    val sampledIds = graft.Tables.documents(spark, real)
      .filter(org.apache.spark.sql.functions.expr(
        "cast(conv(substring(md5(cast(doc_id as string)), 1, 2), 16, 10) as int) < 32"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sampledIds.nonEmpty, "sample is empty — rate too low for this corpus")
    val full = TrainingOps.qSelfRepetition(spark, real).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = full.filter(t => sampledIds.contains(t._1)).toSeq
    val sampled = TrainingOps.qSelfRepetitionSampled(spark, real).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(sampled === expected,
      s"sampled gate diverged from t83's restriction: got ${sampled.take(5)}…")
    assert(sampled.nonEmpty, "sampled spans empty at sf0.001 — gate is vacuous")
  }
}
