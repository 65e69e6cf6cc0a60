package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{BpeReference, BpeTrainer}

/** Differential pin of [[BpeReference]] (the code-independent oracle
  * implementation, r8 VERDICT #2) against the gate path's
  * trainLocal/encodeWord: the two were written independently from the
  * published algorithm, and this spec is what entitles the t51/t59/t74
  * VALUES oracles to call BpeReference while the gates run BpeTrainer.
  * Non-circularity was proven by mutation: a deliberate one-line bug in
  * encodeWord (skipping the final merge round) made t59/t74 check.py
  * FAIL against the BpeReference-generated oracle before being reverted.
  */
class BpeReferenceSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

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

  private def asTuples(ms: Seq[BpeTrainer.Merge]): Seq[(Int, String, String, Long)] =
    ms.map(m => (m.rank, m.left, m.right, m.count))

  test("train differential on constructed corpora: ties, overlaps, exhaustion") {
    val corpora = Seq(
      // overlap semantics: "aaa" + (a,a) must collapse forward to [aa, a]
      Seq("aaa" -> 5L, "aa" -> 3L),
      // tie-break: equal counts resolved to lexicographically smallest pair
      Seq("ab" -> 2L, "ba" -> 2L, "cd" -> 2L),
      // exhaustion: fewer possible merges than requested
      Seq("ab" -> 1L),
      // mixed lengths, repeated substructure
      Seq("banana" -> 4L, "bandana" -> 2L, "ana" -> 7L, "nab" -> 1L),
      // single-char words contribute no pairs
      Seq("a" -> 100L, "b" -> 50L, "ab" -> 1L))
    corpora.foreach { words =>
      assert(BpeReference.train(words, 8) ===
        asTuples(BpeTrainer.trainLocal(words, 8)),
        s"divergence on $words")
    }
  }

  test("train differential on the real corpus word counts") {
    val wc = BpeTrainer.wordCounts(Tables.documents(spark, dir))
      .collect().toSeq.map(r => r.getString(0) -> r.getLong(1))
    assert(BpeReference.train(wc, 10) === asTuples(BpeTrainer.trainLocal(wc, 10)))
  }

  test("encode differential: cascade re-application and real vocabulary") {
    // best-rank-first can re-enable an early merge: (a,bc) then (b,c)
    // on "abc" → [abc]; training-order replay would stop at [a, bc]
    val cascade = Map(("a", "bc") -> 1, ("b", "c") -> 2)
    assert(BpeReference.encode("abc", cascade) === List("abc"))
    assert(BpeTrainer.encodeWord("abc", cascade) === Vector("abc"))

    val wc = BpeTrainer.wordCounts(Tables.documents(spark, dir))
      .collect().toSeq.map(r => r.getString(0) -> r.getLong(1))
    val ranks = BpeTrainer.trainLocal(wc, 10)
      .map(m => (m.left, m.right) -> m.rank).toMap
    val refRanks = BpeReference.train(wc, 10)
      .map { case (rank, l, r, _) => (l, r) -> rank }.toMap
    assert(ranks === refRanks)
    wc.map(_._1).distinct.foreach { w =>
      assert(BpeReference.encode(w, ranks) ===
        BpeTrainer.encodeWord(w, ranks).toList, s"encode divergence on '$w'")
    }
  }
}
