package graft

import org.apache.spark.sql.SparkSession
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
}
