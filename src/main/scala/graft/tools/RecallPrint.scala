// Dev tool: print the ANN recall report (every approximate method vs
// the exact brute-force ranking).
// Run: sbt "runMain graft.tools.RecallPrint [sfDir]"
package graft.tools

import org.apache.spark.sql.SparkSession

object RecallPrint {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.operators.VectorOps.annRecallReport(spark, dir).show(false)
    spark.stop()
  }
}
