package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** CI leg of the kill-anywhere crash differential (r14, VERDICT #3):
  * the composed graft-drop fold — dedup → cluster → span → ann →
  * quality — killed at seeded-random step boundaries (plus torn
  * mid-write files) and replayed must equal an uninterrupted run on
  * the real sf0.01 corpus, across every public state and report
  * stream. The heavier multi-seed runs happen as tool invocations
  * (`runMain graft.tools.CrashCheck <dir> <drops> <seed>`).
  */
class CrashCheckSpec extends AnyFunSuite {

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

  test("kill-anywhere replay converges all five states to the uninterrupted answer (sf0.01)") {
    val errs = graft.tools.CrashCheck.check(spark, "/root/testdata/sf0.01",
      drops = 3, seed = 42L)
    assert(errs.isEmpty, errs.mkString("\n"))
  }
}
