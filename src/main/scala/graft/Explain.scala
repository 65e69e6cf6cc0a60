package graft
import org.apache.spark.sql.SparkSession

/** Plan-audit main: print the formatted physical plan of named gate
  * queries (or all of them) against a corpus dir WITHOUT executing —
  * the `.explain("formatted")` pass the scale review runs after
  * correctness goes green.
  *
  * Usage: runMain graft.Explain <sfDir> [name …]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = args.drop(1)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val all = SparkEntry.queries
    val picked = if (names.isEmpty) all.keys.toSeq.sorted else names.toSeq
    picked.foreach { name =>
      all.get(name) match {
        case None => println(s"== $name: NOT A REGISTERED QUERY ==")
        case Some(fn) =>
          println(s"\n==== $name ====")
          try println(fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
          catch { case e: Throwable =>
            println(s"[explain] $name failed: ${e.getMessage}") }
      }
    }
  }
}
