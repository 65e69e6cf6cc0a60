package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Analysis-only smoke gate over the ENTIRE registered query surface.
  *
  * Round 7 lesson: a corpus regeneration changed one column's physical
  * parquet type and five registered queries started failing at PLAN
  * time — no spec caught it because each spec exercises its own
  * operator path, and the failure only surfaced as five rows silently
  * vanishing from the round's correctness artifact. This spec closes
  * that hole: every `SparkEntry.queries` entry must at least ANALYZE
  * against the real sf0.001 corpus. `.queryExecution.analyzed` resolves
  * the plan (reads schemas, binds columns, type-checks expressions)
  * without running a job, so the whole sweep is seconds, and a loader/
  * schema regression becomes one red line at commit time.
  *
  * Eager-artifact operators (BPE train, connected components, Bloom) DO
  * run bounded jobs during plan construction — that is their documented
  * contract (GraftSql.EagerArtifactViews) — so they are included: a few
  * extra seconds buys full-surface coverage.
  */
class AnalysisSmokeSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("every registered query analyzes against the sf0.001 corpus") {
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, build) =>
        try { build(spark, dir).queryExecution.analyzed; None }
        catch { case e: Exception =>
          Some(s"$name: ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").linesIterator.take(2).mkString(" / ")}")
        }
    }
    assert(failures.isEmpty,
      s"\n${failures.size} queries fail analysis:\n  ${failures.mkString("\n  ")}")
    graft.operators.TextOps.releaseCache(spark)
  }

  test("zero-global-window red line: no unpartitioned Window in any gate plan") {
    // r8 VERDICT #1: an unpartitioned WindowExec funnels the whole frame
    // through one reducer — the repo forbids it everywhere (bounded
    // frames must fold in-row instead, the qBpePairs/qUnimaxMix
    // pattern). This makes the invariant machine-checked: any gate whose
    // analyzed plan carries a Window with an empty partitionSpec fails
    // here, instead of hiding as a "No Partition Defined" log warning.
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, build) =>
        build(spark, dir).queryExecution.analyzed.collect {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window
              if w.partitionSpec.isEmpty =>
            s"$name: global window over [${w.windowExpressions.map(_.name).mkString(", ")}]"
        }
    }
    assert(offenders.isEmpty,
      s"\nunpartitioned Window nodes (red line):\n  ${offenders.mkString("\n  ")}")
    graft.operators.TextOps.releaseCache(spark)
  }

  test("entry flagship query analyzes and the SQL surface initializes") {
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.entry(spark).queryExecution.analyzed
    // init must survive even with every loader pointed at the real
    // corpus; per-table isolation is covered by SqlSurfaceSpec
    graft.sql.GraftSql.init(spark, "/root/testdata/sf0.001")
    assert(spark.catalog.tableExists("events"))
    assert(spark.catalog.tableExists("lineitem"))
    graft.operators.TextOps.releaseCache(spark)
  }
}
