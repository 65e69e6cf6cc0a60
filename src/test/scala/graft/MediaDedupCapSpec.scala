package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MediaGate

/** Pins the hot-bucket guard on the m45 banded near-dup join (r8
  * VERDICT #3): a degenerate constant-payload corpus — every item
  * hashing identically, the worst case for any LSH blocking — must trip
  * [[MediaGate.MediaLshCap]] and produce ZERO candidate pairs instead
  * of a quadratic C(N,2)-per-band stage, while a normal mixed corpus
  * under the cap still reports its duplicate pairs.
  */
class MediaDedupCapSpec extends AnyFunSuite {

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

  private def mediaDf(rows: Seq[(Long, Array[Byte])]) = {
    import spark.implicits._
    rows.toDF("media_id", "content").repartition(4, col("media_id"))
  }

  test("constant-payload corpus trips the cap: zero pairs, not C(N,2)") {
    val payload = Array.tabulate(512)(i => (i * 7).toByte)
    val n = MediaGate.MediaLshCap + 10
    val rows = (0 until n).map(i => (i.toLong, payload.clone()))
    assert(MediaGate.nearDupPairs(mediaDf(rows)).count() === 0L)
  }

  test("a corpus under the cap still reports its near-dup pairs") {
    val rnd = new java.util.Random(42)
    val distinct = (0 until 10).map { i =>
      val b = new Array[Byte](600); rnd.nextBytes(b); (i.toLong, b)
    }
    val copies = distinct.take(3).map { case (id, b) => (100L + id, b.clone()) }
    val pairs = MediaGate.nearDupPairs(mediaDf(distinct ++ copies))
      .select("id_a", "id_b", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // the three exact copies must each pair with their original at
    // Hamming 0; random 600-byte payloads land ~32 bits apart, far
    // over tau, so no spurious pairs join them
    val exact = pairs.filter(_._3 == 0).map(p => (p._1, p._2)).sorted
    assert(exact.toSeq === Seq((0L, 100L), (1L, 101L), (2L, 102L)))
  }

  test("the banded join plan is an equi-join, not a cartesian product") {
    val rnd = new java.util.Random(7)
    val rows = (0 until 20).map { i =>
      val b = new Array[Byte](400); rnd.nextBytes(b); (i.toLong, b)
    }
    val plan = MediaGate.nearDupPairs(mediaDf(rows))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"banded join degenerated to a cartesian product:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"banded join degenerated to a nested-loop join:\n$plan")
  }
}
