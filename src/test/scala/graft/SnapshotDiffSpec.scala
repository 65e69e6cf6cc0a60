package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{CurationOps, SnapshotDiff}

/** Cross-snapshot diff contracts (r11, VERDICT #8): diffing a plain
  * curated snapshot against (a) the substring-cut variant must report
  * exactly the cut survivors as `rewritten` and everything else
  * `unchanged`, and (b) a token-budgeted variant must report the
  * budgeted-out documents as `removed` — with the per-partition
  * report consistent with the doc-level statuses.
  */
class SnapshotDiffSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.01"

  private lazy val spark = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def fresh(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"snap_$tag").toString

  test("plain vs cut snapshot: exactly the cut survivors are rewritten") {
    val a = fresh("a"); val b = fresh("b")
    CurationOps.writeCuratedFull(spark, dir, a)
    CurationOps.writeCuratedFull(spark, dir, b, cutSubstrings = true)
    val dd = SnapshotDiff.docDiff(spark, a, b)
    val byStatus = dd.groupBy(col("status")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStatus.getOrElse("added", 0L) === 0L)
    assert(byStatus.getOrElse("removed", 0L) === 0L)
    assert(byStatus.getOrElse("moved", 0L) === 0L)
    assert(byStatus.getOrElse("rewritten", 0L) > 0L)
    // the rewritten set IS the set of written docs with cuts
    val rewritten = dd.filter(col("status") === "rewritten")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val cutDocs = spark.read.parquet(s"$b/docs")
      .filter(col("n_tokens_cut") > 0L)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(rewritten === cutDocs)
    // report consistency: per-partition sums equal doc-level counts
    val rep = SnapshotDiff.report(spark, a, b).collect()
    assert(rep.map(_.getAs[Long]("n_rewritten")).sum === rewritten.size.toLong)
    assert(rep.map(_.getAs[Long]("n_removed")).sum === 0L)
    // rewritten docs only ever shrink (cuts remove tokens)
    assert(rep.map(_.getAs[Long]("chars_delta")).sum < 0L)
  }

  test("plain vs budgeted snapshot: budgeted-out docs report as removed") {
    val a = fresh("a2"); val c = fresh("c2")
    CurationOps.writeCuratedFull(spark, dir, a)
    CurationOps.writeCuratedFull(spark, dir, c, budget = Some(500L))
    val rep = SnapshotDiff.report(spark, a, c).collect()
    assert(rep.map(_.getAs[Long]("n_removed")).sum > 0L)
    assert(rep.map(_.getAs[Long]("n_added")).sum === 0L)
    assert(rep.map(_.getAs[Long]("n_rewritten")).sum === 0L)
  }

  test("provenance attributes every rewrite to the cut stage and budget removals past the artifacts (r12)") {
    // cut snapshot: every rewritten doc must attribute to substring_cut
    val a = fresh("p1"); val b = fresh("p2")
    CurationOps.writeCuratedFull(spark, dir, a)
    CurationOps.writeCuratedFull(spark, dir, b, cutSubstrings = true)
    val provCut = SnapshotDiff.provenance(spark, dir, a, b).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(provCut.nonEmpty)
    assert(provCut.forall { case (_, st, cause) =>
      st == "rewritten" && cause == "substring_cut" },
      s"unexpected attribution: ${provCut.take(5).mkString(", ")}")

    // budgeted snapshot: removed docs were written deliberately by the
    // budget stage — they are curated survivors, so no artifact claims
    // them and they fall through to budget_or_external
    val c = fresh("p3")
    CurationOps.writeCuratedFull(spark, dir, c, budget = Some(500L))
    val provBud = SnapshotDiff.provenance(spark, dir, a, c).collect()
      .map(r => (r.getString(1), r.getString(2)))
    assert(provBud.nonEmpty)
    assert(provBud.forall { case (st, cause) =>
      st == "removed" && cause == "budget_or_external" },
      s"unexpected attribution: ${provBud.take(5).mkString(", ")}")
  }
}
