package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Analytics

/** Behavioral contract of the q44 histogram quantile sketch: the bin
  * relation is the MERGEABLE state (sum-union of two halves equals the
  * whole-corpus sketch — counter ADDITION, the same property CMS
  * merges ride), and on the real corpus every estimate obeys the
  * by-construction error bound exact − est_edge ∈ [0, binWidth).
  */
class QuantileSketchSpec extends AnyFunSuite {

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

  private def cents(from: Int, to: Int) = {
    import spark.implicits._
    // spread across many bins: values up to 4M cents at 65536-cent bins
    (from to to).map(i => ("g", (i.toLong * 7919) % 4000000)).toDF("grp", "c")
  }

  test("sketch merges by addition: half + half equals the whole") {
    val whole = Analytics.histSketch(cents(1, 5000), "grp", col("c"))
    val merged = Analytics.histSketch(cents(1, 3000), "grp", col("c"))
      .unionByName(Analytics.histSketch(cents(3001, 5000), "grp", col("c")))
      .groupBy(col("grp"), col("bin")).agg(sum(col("cnt")).as("cnt"))
    assert(merged.except(whole).isEmpty && whole.except(merged).isEmpty)
  }

  test("gate rows obey the by-construction bound and exact rank semantics") {
    val rows = Analytics.qQuantileSketch(spark, dir).collect()
    assert(rows.length % 3 == 0 && rows.nonEmpty)
    for (r <- rows) {
      val q = r.getAs[Long]("q")
      val n = r.getAs[Long]("n")
      val k = r.getAs[Long]("k")
      val est = r.getAs[Long]("est_edge_cents")
      val exact = r.getAs[Long]("exact_cents")
      assert(Seq(50L, 95L, 99L).contains(q))
      assert(k == (n * q + 99) / 100 && k >= 1 && k <= n)
      // exact rank-k value falls inside the bin the sketch answered
      // with (the top bin clamps, so only the lower edge is certain)
      assert(exact >= est, s"q=$q exact=$exact below est edge $est")
      val bin = r.getAs[Long]("est_bin")
      if (bin < 255L)
        assert(exact < est + 65536L, s"q=$q exact=$exact outside bin $bin")
    }
  }

  test("state reductions pin the histogram: perturbing one counter moves them") {
    val h = Analytics.histSketch(cents(1, 2000), "grp", col("c"))
    def reduce(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("grp"))
        .agg(sum(col("cnt")).as("n"), sum(col("bin") * col("cnt")).as("ss"),
          count(lit(1)).as("nb"))
        .collect()(0)
    val base = reduce(h)
    val bumped = reduce(h.withColumn("cnt",
      when(col("bin") === 3L, col("cnt") + 1L).otherwise(col("cnt"))))
    assert(base.getLong(1) != bumped.getLong(1) ||
      base.getLong(2) != bumped.getLong(2))
  }
}
