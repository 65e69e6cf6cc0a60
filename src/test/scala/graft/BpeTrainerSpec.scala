package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.BpeTrainer

/** Differential pin of the distributed BPE trainer against a
  * straight-line in-memory reference implementation (the same pattern
  * as m42's decoder replay): identical merge sequences — pair, order
  * AND weighted count — on the real corpus, plus tokenization-report
  * invariants.
  */
class BpeTrainerSpec extends AnyFunSuite {

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

  /** Reference BPE (Sennrich-style) over a word-frequency map: greedy
    * left-to-right merge application, ties by (count desc, pair asc).
    */
  private def refBpe(words: Map[String, Long], n: Int): Seq[(String, String, Long)] = {
    // flatten(symbols) == word, so distinct words keep distinct keys
    var vocab: Map[Vector[String], Long] =
      words.map { case (w, c) => w.map(_.toString).toVector -> c }
    val out = Seq.newBuilder[(String, String, Long)]
    var i = 0
    var done = false
    while (i < n && !done) {
      val pairs = vocab.toSeq.flatMap { case (syms, c) =>
        syms.sliding(2).collect { case Vector(a, b) => (a, b) -> c }
      }.groupMapReduce(_._1)(_._2)(_ + _)
      if (pairs.isEmpty) done = true
      else {
        val ((l, r), c) = pairs.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((l, r, c))
        vocab = vocab.map { case (syms, cnt) =>
          val merged = syms.foldLeft(Vector.empty[String]) { (acc, s) =>
            if (acc.nonEmpty && acc.last == l && s == r)
              acc.init :+ (l + r)
            else acc :+ s
          }
          merged -> cnt
        }
        i += 1
      }
    }
    out.result()
  }

  test("both trainer regimes match the reference merge sequence on the corpus") {
    val docs = Tables.documents(spark, dir)
    val words = docs.select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.expr(
          "filter(split(text, ' '), w -> w != '')")).as("w"))
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = refBpe(words, 10)
    // the large-vocab regime, forced regardless of the dispatch limit
    val wc = BpeTrainer.wordCounts(docs)
    val dist = BpeTrainer.trainDistributed(wc, 10).map(m => (m.left, m.right, m.count))
    assert(dist == expected,
      s"distributed merges diverge:\n got: $dist\n ref: $expected")
    // the public API (small vocab here → in-memory regime)
    val got = BpeTrainer.train(docs, 10).map(m => (m.left, m.right, m.count))
    assert(got == expected,
      s"hybrid merges diverge:\n got: $got\n ref: $expected")
  }

  test("token stats: merges only ever shrink the token stream, floor n_words") {
    val docs = Tables.documents(spark, dir)
    val merges = BpeTrainer.train(docs, 8)
    assert(merges.nonEmpty && merges.map(_.rank) == (1 to merges.size))
    val none = BpeTrainer.tokenStats(docs, Nil).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val trained = BpeTrainer.tokenStats(docs, merges).collect()
    trained.foreach { r =>
      val (id, words, toks) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(toks <= none(id), s"doc $id grew under merges")
      assert(toks >= words, s"doc $id has fewer tokens than words")
    }
    // the gate surface returns the ranked merge table
    val gate = BpeTrainer.qBpeTrain(spark, dir).collect()
    assert(gate.length == 10 && gate.head.getAs[Int]("rank") == 1)
  }
}
