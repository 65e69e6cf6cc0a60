package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.DataLayout

class DataLayoutSpec extends AnyFunSuite {

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

  /** Scala reference interleave — independent of the Column expression
    * construction (loop over result bit positions, not over input
    * bits), so a shift/mask slip in either formulation fails the
    * differential.
    */
  private def zRef(vals: Seq[Long], bits: Int): Long = {
    val d = vals.size
    (0 until d * bits).map { p =>
      val i = p / d                // round
      val k = d - 1 - (p % d)      // dim owning this position
      ((vals(k) >> i) & 1L) << p
    }.sum
  }

  test("zValue matches the reference interleave on random buckets, 2 and 3 dims") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)((rnd.nextInt(256).toLong, rnd.nextInt(256).toLong,
      rnd.nextInt(16).toLong))
    val df = rows.toDF("a", "b", "c")
    val got2 = df.select(DataLayout.zValue(Seq(col("a"), col("b")), 8).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got2 == rows.map(r => zRef(Seq(r._1, r._2), 8)))
    val got3 = df.select(DataLayout.zValue(Seq(col("a"), col("b"), col("c")), 4).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got3 == rows.map(r => zRef(Seq(r._1 & 15, r._2 & 15, r._3), 4)))
    // adjacency sanity: cell (1,0) and (0,1) differ only in which
    // dimension owns the high bit within the round
    assert(zRef(Seq(1L, 0L), 8) == 2L && zRef(Seq(0L, 1L), 8) == 1L)
  }

  test("rank buckets are equi-depth and deterministic under ties") {
    import spark.implicits._
    // 1024 rows, heavily tied order values (skew immunity is the point
    // of rank buckets): every bucket must hold exactly 1024/16 rows
    val df = (1 to 1024).map(i => (i.toLong, (i % 7).toLong)).toDF("id", "v")
    val b = DataLayout.rankBucket(df, col("v"), col("id"), 4, "bk",
      d => d.persist())
    val sizes = b.groupBy("bk").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes.keys.toSeq.sorted == (0L to 15L), s"buckets: $sizes")
    assert(sizes.values.forall(_ == 64L), s"equi-depth violated: $sizes")
    // deterministic: a second run bucket-for-bucket identical
    val again = DataLayout.rankBucket(df, col("v"), col("id"), 4, "bk",
        d => d.persist())
      .select("id", "bk").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val first = b.select("id", "bk").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(first == again)
  }

  test("z-ordered files are tight in BOTH dimensions; a 1-D sort is not") {
    // The pruning payoff the layout exists for: write the same rows
    // (a) z-ordered on (bu, bt) and (b) sorted by bt alone, into the
    // same file count; per-file min/max footer stats are emulated by
    // grouping the read-back rows on input_file_name. The z-layout's
    // mean per-file AREA (bu-range x bt-range, the 2-D pruning measure)
    // must be a small fraction of the 1-D sort's, whose bu-range per
    // file is the full axis.
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(16384)((rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
      .zipWithIndex.map { case ((bu, bt), i) => (i.toLong, bu, bt) }
    val df = rows.toDF("id", "bu", "bt")
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    DataLayout.zorderWrite(df, Seq("bu", "bt"), 8, numFiles = 16)
      .write.mode("overwrite").parquet(s"$dir/z")
    df.repartitionByRange(16, col("bt")).sortWithinPartitions(col("bt"))
      .write.mode("overwrite").parquet(s"$dir/lin")
    // per-dimension mean normalized extent = the expected fraction of
    // files a point predicate on that dimension TOUCHES (a file is
    // prunable iff the point falls outside its min/max). This is the
    // metric footer-stats pruning actually obeys; the sum-of-areas
    // metric rewards a 1-D sort for its thin slices while hiding that
    // every file spans the ENTIRE other axis.
    def extents(path: String): (Double, Double) = {
      val per = spark.read.parquet(path)
        .withColumn("f", input_file_name())
        .groupBy("f")
        .agg((max("bu") - min("bu") + 1).cast("double").as("du"),
          (max("bt") - min("bt") + 1).cast("double").as("dt"))
        .collect().map(r => (r.getDouble(1) / 256.0, r.getDouble(2) / 256.0))
      (per.map(_._1).sum / per.length, per.map(_._2).sum / per.length)
    }
    val (zu, zt) = extents(s"$dir/z")
    val (lu, lt) = extents(s"$dir/lin")
    // the 1-D sort's worst dimension is unprunable (every file spans
    // the full bu axis); z-order bounds BOTH dimensions, so its worst
    // dimension must touch well under the full axis
    assert(lu >= 0.99, s"bt-sorted files should span the full bu axis: $lu")
    assert(lt <= 0.15, s"bt-sorted files should be thin in bt: $lt")
    val zWorst = math.max(zu, zt)
    assert(zWorst <= 0.6,
      s"z-order must bound its worst dimension: bu=$zu bt=$zt")
  }

  /** Rows the parquet scan actually SURFACED for `df` — i.e. the rows
    * of the row groups that footer-stat pruning could not skip
    * (vectorized reader: pushed filters prune whole row groups; the
    * residual Filter node above the scan is not counted). Summed over
    * every FileSourceScanExec in the executed plan.
    */
  private def scannedRows(df: DataFrame): Long = {
    df.collect()
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(scans)
    }
    scans(df.queryExecution.executedPlan)
      .map(_.metrics("numOutputRows").value).sum
  }

  test("z-order prunes an actual READ in both dimensions; the 1-D sort is blind in one") {
    // The read-side half of the pruning claim (r13, VERDICT #3): run a
    // length-band query and a doc_id-range query against the SAME rows
    // written (a) through the graft-curate --zorder recipe (rankBucket
    // on the narrow projection -> zValue -> clusterWrite) and (b)
    // 1-D-sorted by n_chars, and read the scan's own metrics. With one
    // row group per file, numOutputRows counts exactly the rows of the
    // files whose min/max stats could not exclude the predicate.
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val n = 32768
    // doc ids shuffled relative to length so the two dimensions are
    // independent, as in a real corpus
    val rows = rnd.shuffle((0 until n).toVector).zipWithIndex.map {
      case (docId, i) => (docId.toLong, (50 + rnd.nextInt(2000)).toLong,
        s"payload_$i")
    }
    val df = rows.toDF("doc_id", "n_chars", "payload")
    val dir = java.nio.file.Files.createTempDirectory("zread").toString

    // (a) the curate recipe: equi-depth buckets over the narrow
    // projection, z-key joined back by doc_id, one range exchange
    val narrow = df.select(col("doc_id"), col("n_chars"))
    val bl = DataLayout.rankBucket(narrow, col("n_chars"), col("doc_id"),
      DataLayout.Bits, "__bl", d => d.persist())
    val zKey = DataLayout.rankBucket(bl, col("doc_id"), col("doc_id"),
        DataLayout.Bits, "__bi", d => d.persist())
      .select(col("doc_id"),
        DataLayout.zValue(Seq(col("__bl"), col("__bi")), DataLayout.Bits)
          .as("__zv"))
    DataLayout.clusterWrite(df.join(zKey, Seq("doc_id")), col("__zv"),
        numFiles = Some(16))
      .drop("__zv")
      .write.mode("overwrite").parquet(s"$dir/z")
    // (b) the 1-D alternative: sorted by n_chars alone, same file count
    df.repartitionByRange(16, col("n_chars"))
      .sortWithinPartitions(col("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/lin")

    def lengthBand(p: String) = spark.read.parquet(p)
      .filter(col("n_chars").between(400, 520))
    def idRange(p: String) = spark.read.parquet(p)
      .filter(col("doc_id").between(1000, 2500))

    val total = spark.read.parquet(s"$dir/z").count()
    assert(total === n.toLong)
    val zLen = scannedRows(lengthBand(s"$dir/z"))
    val zId = scannedRows(idRange(s"$dir/z"))
    val linLen = scannedRows(lengthBand(s"$dir/lin"))
    val linId = scannedRows(idRange(s"$dir/lin"))

    // the length sort is blind to doc_id ranges: ids spread over every
    // file, so stats prune nothing and the scan surfaces ALL rows
    assert(linId === total, s"n_chars-sorted read should be unprunable by id: $linId")
    assert(linLen < total / 4, s"n_chars-sorted read should prune its own axis: $linLen")
    // z-order prunes BOTH families: strictly fewer rows scanned than
    // the table for each predicate, and strictly fewer than the 1-D
    // layout on its blind axis
    assert(zLen < total / 2, s"z-read not pruned on length band: $zLen of $total")
    assert(zId < total / 2, s"z-read not pruned on id range: $zId of $total")
    assert(zId < linId, s"z-read must beat the 1-D layout on its blind axis: $zId vs $linId")
  }
}
