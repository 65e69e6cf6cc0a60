package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** CI leg of tools/DropCheck (the CcCheck pattern): the incremental
  * drop pipeline — IncrementalDedup probe + IncrementalCluster fold
  * over 3 drops of the real sf0.01 corpus — must converge to the batch
  * t28/t40/t52 answers and to an independent union-find, row-for-row.
  */
class DropCheckSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("incremental drops converge to the batch dedup/cluster/survivor answers at sf0.01") {
    val errs = graft.tools.DropCheck.check(spark, "/root/testdata/sf0.01", drops = 3)
    assert(errs.isEmpty, s"\n${errs.mkString("\n")}")
  }
}
