package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level profiler for q36 (gap fill) — r10 sf10 profile flagged
  * an 18.2× time ratio on 10× data; attribute it between the per-hour
  * reduction, the grid explode, and the join+fill window.
  *
  * Usage: runMain graft.operators.ProfileQ36 <dir> [dir …]
  */
object ProfileQ36 {
  private def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[q36-prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
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
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("target/sf1", "target/sf10")
    dirs.foreach { dir =>
      println(s"\n== $dir ==")
      val ev = graft.Tables.events(spark, dir)
        .select(col("user_id"), date_trunc("hour", col("ts")).as("h"),
          col("ts"), col("event_id"), col("value"))
      time("events scan")(ev.count())
      val byHour = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"), col("h"))
        .orderBy(col("ts").desc, col("event_id").desc)
      val hourly = ev.withColumn("rn", row_number().over(byHour))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("h"), col("value"), lit(true).as("obs"))
      time("hourly reduce")(hourly.count())
      val grid = ev.groupBy(col("user_id"))
        .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
        .select(col("user_id"),
          explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
      time("grid explode")(grid.count())
      (1 to 2).foreach { i =>
        time(s"full gapFill ($i)")(Analytics.gapFill(
          graft.Tables.events(spark, dir)
            .select(col("user_id"), col("ts"), col("event_id"),
              col("value"))).count())
      }
    }
    spark.stop()
  }
}
