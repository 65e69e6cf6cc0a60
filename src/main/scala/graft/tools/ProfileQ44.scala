package graft.tools

import graft.operators.Analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Stage-level profiler for q44 (quantile sketch) — the r10 judge
  * measured a 2.30 s floor (~10× its DuckDB oracle) and demanded
  * attribution between the vals exchange, the two cumulative
  * windows, and the three joins. Usage:
  * runMain graft.tools.ProfileQ44 <dir> [passes]
  */
object ProfileQ44 {
  private def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[q44-prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val passes = if (args.length > 1) args(1).toInt else 3

    val QsB = 256
    val QsW = 65536L
    val cents = graft.Tables.lineitem(spark, dir)
      .select(col("l_returnflag"),
        expr("cast(round(l_extendedprice * 100) as bigint)").as("cents"))
    val vals = cents.groupBy(col("l_returnflag"), col("cents"))
      .agg(count(lit(1)).as("vc"))
      .persist()
    time("vals build+cache")(vals.count())

    def hist = vals
      .withColumn("bin", least(expr(s"cents div $QsW"), lit(QsB - 1L)))
      .groupBy(col("l_returnflag"), col("bin"))
      .agg(sum(col("vc")).as("cnt"))
    val wb = Window.partitionBy(col("l_returnflag")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wv = Window.partitionBy(col("l_returnflag")).orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    (1 to passes).foreach { i =>
      time(s"hist ($i)")(hist.count())
      time(s"hcum ($i)")(hist.withColumn("cum", sum(col("cnt")).over(wb)).count())
      time(s"vcum ($i)")(vals.withColumn("vcum", sum(col("vc")).over(wv)).count())
      val state = hist.groupBy(col("l_returnflag"))
        .agg(sum(col("cnt")).as("n"), sum(col("bin") * col("cnt")).as("state_sum"),
          count(lit(1)).as("nonzero_bins"))
      val ks = state
        .select(col("l_returnflag"), col("n"), col("state_sum"),
          col("nonzero_bins"), explode(expr("array(50L, 95L, 99L)")).as("q"))
        .withColumn("k", expr("(n * q + 99) div 100"))
      time(s"ks ($i)")(ks.count())
      val vcum = vals.withColumn("vcum", sum(col("vc")).over(wv))
      time(s"exact join ($i)")(ks.join(vcum, Seq("l_returnflag"))
        .filter(col("vcum") >= col("k"))
        .groupBy(col("l_returnflag"), col("q"))
        .agg(min(col("cents")).as("exact_cents")).count())
      time(s"full gate ($i)")(Analytics.qQuantileSketch(spark, dir).collect())
    }
    spark.stop()
  }
}
