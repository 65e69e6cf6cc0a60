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

  /** Straight-line reference encode, written independently of
    * BpeTrainer.encodeWord (recursive best-first, merging one
    * occurrence at a time — same fixpoint, different control flow).
    */
  private def refEncode(word: String, ranks: Map[(String, String), Int]): Vector[String] = {
    def step(syms: Vector[String]): Vector[String] = {
      val cands = syms.indices.dropRight(1)
        .map(i => (ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue), i))
      if (cands.isEmpty) syms
      else {
        val (best, _) = cands.minBy(_._1)
        if (best == Int.MaxValue) syms
        else {
          val (l, r) = {
            val i = cands.find(_._1 == best).get._2
            (syms(i), syms(i + 1))
          }
          // merge the LEFTMOST occurrence only, then recurse: greedy
          // left-to-right all-occurrence merging reaches the same
          // fixpoint one step at a time (leftmost-first ordering)
          val i = syms.indices.dropRight(1)
            .find(j => syms(j) == l && syms(j + 1) == r).get
          step((syms.take(i) :+ (l + r)) ++ syms.drop(i + 2))
        }
      }
    }
    step(word.map(_.toString).toVector)
  }

  test("encode: best-rank-first fixpoint, reconstruction, and the replay distinction") {
    val docs = Tables.documents(spark, dir)
    val merges = BpeTrainer.train(docs, 10)
    val ranks = merges.map(m => (m.left, m.right) -> m.rank).toMap
    // differential on the real vocabulary: independent reference, same result
    val vocab = docs.select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.expr(
          "filter(split(text, ' '), w -> w != '')")).as("w"))
      .distinct().collect().map(_.getString(0))
    vocab.foreach { w =>
      val got = BpeTrainer.encodeWord(w, ranks)
      assert(got == refEncode(w, ranks), s"encode('$w') diverges from reference")
      assert(got.mkString == w, s"encode('$w') does not reconstruct the word")
      // every emitted symbol is a char or a concatenation of merged symbols
      assert(got.forall(_.nonEmpty))
    }
    // the constructed case where best-rank-first differs from training-order
    // replay: merges 1:(a,bc), 2:(b,c) on "abc"
    val r2 = Map(("a", "bc") -> 1, ("b", "c") -> 2)
    assert(BpeTrainer.encodeWord("abc", r2) == Vector("abc"))
    // zero merges → single characters
    assert(BpeTrainer.encodeWord("abc", Map.empty) == Vector("a", "b", "c"))
    // gate surface: per-doc stats bounded by chars and words
    val stats = BpeTrainer.qBpeEncode(spark, dir).collect()
    assert(stats.nonEmpty)
    stats.foreach { r =>
      val (words, toks, chars) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(toks >= words && toks <= chars,
        s"doc ${r.getLong(0)}: n_bpe_tokens $toks outside [words=$words, chars=$chars]")
    }
  }

  test("byte-level mode: remap tables agree, multibyte words disagree with char level, exact round-trip") {
    import graft.operators.BpeReference
    // the gate path's table (imperative sweep) and the reference's
    // (complement scan) must agree on every byte — a transcription
    // slip in either construction fails here, not silently in a gate
    (0 until 256).foreach { b =>
      assert(BpeTrainer.byteToUnicode(b) === BpeReference.byteToChar(b),
        s"byte $b remaps differently")
    }
    // all remapped chars printable (non-control, non-space): the
    // property that makes merge symbols safe VALUES literals
    (0 until 256).foreach { b =>
      val c = BpeTrainer.byteToUnicode(b)
      assert(!Character.isISOControl(c) && !Character.isWhitespace(c))
    }
    // multibyte UTF-8: char-level and byte-level initial symbols differ
    val word = "na\u00efve" // 5 chars, 6 UTF-8 bytes
    assert(word.length === 5)
    assert(BpeTrainer.byteEncodeWord(word).length === 6)
    // and training on a multibyte corpus yields a DIFFERENT merge
    // table: the char-level first merge can pair the 2-byte char
    // atomically, byte level must first merge its two bytes
    val counts = Map(word -> 3L)
    val charMerges = BpeTrainer.trainLocal(counts.toSeq, 3).map(m => (m.left, m.right))
    val byteMerges = BpeTrainer
      .trainLocal(counts.toSeq.map { case (w, c) => BpeTrainer.byteEncodeWord(w) -> c }, 3)
      .map(m => (m.left, m.right))
    assert(charMerges !== byteMerges)
    // exact round-trip through the remapping for multibyte content,
    // including a 4-byte (surrogate-pair) codepoint char-level
    // splitting would tear
    Seq(word, "\u00fcber", "\u65e5\u672c\u8a9e", new String(Character.toChars(0x1F600)))
      .foreach { w =>
        assert(BpeTrainer.byteDecodeTokens(Seq(BpeTrainer.byteEncodeWord(w))) === w)
        assert(BpeReference.byteUnmap(List(BpeReference.byteRemap(w))) === w)
      }
    // gate-vs-reference differential for the byte mode on the real
    // corpus, reproducing the r12 multibyte injection independently
    // (same MultibyteWords data, spec-local counting + reps arithmetic)
    val spark2 = spark
    val gate = BpeTrainer.qBpeByteTrain(spark2, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    val docs = spark2.read.parquet(s"$dir/documents.parquet")
      .selectExpr("filter(split(text, ' '), w -> w != '') as ws").collect()
      .flatMap(_.getSeq[String](0))
    val wc = docs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val reps = math.max(1L, docs.length.toLong / 100L)
    val augmented = wc.toSeq ++
      BpeTrainer.MultibyteWords.map { case (w, c) => w -> c * reps }
    val ref = BpeReference.train(
      augmented.map { case (w, c) => BpeReference.byteRemap(w) -> c }, 10)
    assert(gate.toList === ref.map(t => (t._1, t._2, t._3, t._4)))
    assert(gate.nonEmpty)
  }

  test("t86's gate table diverges from t51's on the augmented corpus (r12: non-vacuous in CORRECTNESS)") {
    val charT = BpeTrainer.qBpeTrain(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    val byteT = BpeTrainer.qBpeByteTrain(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(charT.toSeq !== byteT.toSeq,
      "byte-level and char-level gates trained the same table — the multibyte injection is not reaching the top-k merges")
    // char level sees ñ as ONE symbol; byte level must carry its two
    // remapped UTF-8 bytes as separate symbols somewhere in the table
    assert(charT.exists(t => (t._2 + t._3).exists(_ > 127.toChar)),
      s"char table has no multibyte symbol: ${charT.mkString(", ")}")
    assert(byteT.exists(t => (t._2 + t._3).contains('Ã')),
      s"byte table never merges a remapped UTF-8 lead byte: ${byteT.mkString(", ")}")
    assert(!byteT.exists(t => (t._2 + t._3).contains('ñ')),
      "byte table must never contain a raw multibyte char as one symbol")
  }
}
