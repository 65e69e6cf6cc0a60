package graft

import java.security.MessageDigest
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingCms

/** Streaming CMS equivalence: counters are order-independent sums, so
  * a corpus streamed in ANY micro-batch split must merge to the exact
  * sketch of the whole — pinned here against a straight-line Scala
  * reimplementation of the cell map (independent md5/bucket/sum code,
  * not the Spark expressions), plus the replay-idempotence ledger and
  * the est ≥ true CMS guarantee on probes.
  */
class StreamingCmsSpec extends AnyFunSuite {

  private val Width = 64
  private val Depth = 4

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

  /** Independent reference: cell counts as a plain Scala map. */
  private def refCells(texts: Seq[String]): Map[(Int, Long), Long] = {
    val md = MessageDigest.getInstance("MD5")
    def bucket(d: Int, w: String): Long = {
      val hex = md.digest(s"$d:$w".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 4)
      java.lang.Long.parseLong(hex, 16) % Width
    }
    val words = texts.flatMap(_.split(" ").filter(_.nonEmpty))
    words.flatMap(w => (0 until Depth).map(d => (d, bucket(d, w))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
  }

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("cms").toString + "/sketch"

  test("randomized micro-batch splits merge to the exact whole-corpus sketch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(17)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    val texts = (0 until 40).map(_ =>
      (0 until 1 + rnd.nextInt(20)).map(_ => vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    val path = freshDir()

    val in = MemoryStream[(Long, String)]
    val docs = in.toDF().toDF("doc_id", "text")
    val query = StreamingCms.sink(docs, path)((_, _) => ()).start()
    try {
      rnd.shuffle(texts.zipWithIndex)
        .map { case (t, i) => (i.toLong, t) }
        .grouped(7).foreach { b => in.addData(b); query.processAllAvailable() }
    } finally query.stop()

    val got = StreamingCms.readSketch(spark, path).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === refCells(texts))
  }

  test("replayed batch ids are no-ops; estimates satisfy est >= true tf") {
    import spark.implicits._
    val path = freshDir()
    val batch = Seq((1L, "a b a c"), (2L, "b b d")).toDF("doc_id", "text")
    assert(StreamingCms.applyBatch(batch, path, 0L))
    val before = StreamingCms.readSketch(spark, path).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    // replay: same id again — ledger makes it a no-op
    assert(!StreamingCms.applyBatch(batch, path, 0L))
    val after = StreamingCms.readSketch(spark, path).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(after === before)

    val truth = Map("a" -> 2L, "b" -> 3L, "c" -> 1L, "d" -> 1L, "zz" -> 0L)
    val est = StreamingCms.estimate(spark, path,
        truth.keys.toSeq.toDF("w"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    truth.foreach { case (w, tf) =>
      assert(est(w) >= tf, s"CMS underestimated $w: ${est(w)} < $tf")
    }
    // 7 distinct (d, word) hashes over 4×64 cells: the tiny sketch is
    // collision-free here, so the estimates are exact
    assert(est === truth)
  }
}
