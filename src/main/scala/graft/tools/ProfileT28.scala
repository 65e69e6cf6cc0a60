package graft.operators

import org.apache.spark.sql.SparkSession

/** Stage-level profiler for t28 (MinHash+LSH) — VERDICT r9 #1: attribute
  * the 11.6× up-scale ratio between signature build, band join, and the
  * exact-Jaccard verify join. Times each stage cold (fresh memo) and the
  * full query warm (the bench's steady-state shape) at each dir given.
  *
  * Usage: runMain graft.operators.ProfileT28 <dir> [dir …]
  */
object ProfileT28 {
  private def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[t28-prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "target/sf1")
    dirs.foreach { dir =>
      println(s"\n== $dir ==")
      SessionMemo.release(spark)
      time("shingles (cold)") {
        TextOps.docShingles(spark, dir).count()
      }
      time("sigs (incremental)") {
        TextOps.minhashSigsForProfile(spark, dir).count()
      }
      time("candidates (warm sigs)") {
        TextOps.lshCandidatesForProfile(spark, dir).count()
      }
      time("full qMinhashLsh (1st)") {
        TextOps.qMinhashLsh(spark, dir).count()
      }
      (1 to 3).foreach { i =>
        time(s"full qMinhashLsh (warm $i)") {
          TextOps.qMinhashLsh(spark, dir).count()
        }
      }
    }
    spark.stop()
  }
}
