package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.tools.CcCheck

/** The t40/t52 independent checker in CI (r11, VERDICT #2): a
  * code-independent driver-side union-find over the collected
  * near-dup edge list must reproduce every cluster label, size,
  * canonical flag, and survivor selection at sf0.1 — the same check
  * that closes the sf10 verification hole where the DuckDB
  * recursive-CTE oracle dies (>75 GB spill).
  */
class CcCheckSpec extends AnyFunSuite {

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

  test("t40/t52/t78 match a driver-side union-find at sf0.1") {
    val errs = CcCheck.check(spark, "/root/testdata/sf0.1")
    assert(errs.isEmpty, errs.mkString("; "))
  }

  test("q37 matches a driver-side two-pointer sweep at sf0.1") {
    val errs = graft.tools.ProximityCheck.check(spark, "/root/testdata/sf0.1")
    assert(errs.isEmpty, errs.mkString("; "))
  }
}
