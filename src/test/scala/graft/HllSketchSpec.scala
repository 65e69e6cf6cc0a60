package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Analytics

/** Behavioral contract of the q43 register-exact HLL sketch: the
  * register relation is the MERGEABLE state (union + register-wise max
  * of two halves equals the whole-corpus sketch — the property 1000
  * executors' partial sketches rely on), ranks stay in the valid
  * [1, 53] band, and the deterministic raw estimate lands inside the
  * theoretical error envelope for m = 256.
  */
class HllSketchSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def ids(from: Int, to: Int) = {
    import spark.implicits._
    (from to to).map(i => ("g", i.toLong)).toDF("grp", "id")
  }

  test("registers merge: max-union of two halves equals the whole sketch") {
    val whole = Analytics.hllRegisters(ids(1, 10000), "grp", col("id"))
    val merged = Analytics.hllRegisters(ids(1, 6000), "grp", col("id"))
      .union(Analytics.hllRegisters(ids(6001, 10000), "grp", col("id")))
      .groupBy(col("grp"), col("j")).agg(max(col("rr")).as("rr"))
    assert(merged.except(whole).isEmpty && whole.except(merged).isEmpty)
  }

  test("ranks stay in [1, 53] and buckets in [0, 255]") {
    val r = Analytics.hllRegisters(ids(1, 10000), "grp", col("id"))
      .agg(min(col("rr")), max(col("rr")), min(col("j")), max(col("j")))
      .collect()(0)
    assert(r.getLong(0) >= 1L && r.getLong(1) <= 53L)
    assert(r.getLong(2) >= 0L && r.getLong(3) <= 255L)
  }

  test("raw estimate lands within the m=256 error envelope (~2.5 sigma)") {
    // md5 is fixed, so this is ONE deterministic draw: assert the
    // ~1.04/sqrt(256) = 6.5% relative-error sketch landed within 16%
    // (2.5 sigma) of each cardinality across three decades
    for (n <- Seq(1000, 10000, 100000)) {
      val df = ids(1, n)
      val regs = Analytics.hllRegisters(df, "grp", col("id"))
        .agg(count(lit(1)).as("present"),
          sum(expr("shiftleft(cast(1 as bigint), cast(53 - rr as int))")).as("sp"))
        .collect()(0)
      val present = regs.getLong(0)
      val s = regs.getLong(1) + (256 - present) * 9007199254740992L
      val num = 0.7213 / (1 + 1.079 / 256) * 256 * 256 * 9007199254740992.0
      val est = num / s.toDouble
      assert(math.abs(est - n) / n < 0.16, s"n=$n est=$est")
    }
  }
}
