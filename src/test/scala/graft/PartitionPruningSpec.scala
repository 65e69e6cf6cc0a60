package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.Tables

/** Partition layout + pruning: the monthly-folder discipline of the
  * reference expressed as real partition columns, with evidence that
  * Catalyst prunes at file-listing time.
  */
class PartitionPruningSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("date-partitioned writes prune to the queried partitions") {
    spark.sparkContext.setLogLevel("WARN")
    val out = java.nio.file.Files.createTempDirectory("events_part").toString
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    ev.write.mode("overwrite").partitionBy("day").parquet(out)

    val nDays = ev.select("day").distinct().count()
    assert(nDays > 1)

    val read = spark.read.parquet(out)
      .filter(col("day") === ev.select(min("day")).head().getString(0))
    val plan = read.queryExecution.executedPlan.toString
    // partition filter present, and no pushed data filter needed
    assert(plan.contains("PartitionFilters: [isnotnull(day"), plan)
    // execute THIS plan instance so its scan metrics populate
    val exec = read.queryExecution
    exec.toRdd.count()
    val scanned = exec.executedPlan.collectLeaves().head.metrics.get("numFiles")
    // only one day's files were listed/scanned
    assert(scanned.nonEmpty)
    scanned.foreach(m => assert(m.value >= 1 && m.value < nDays, s"numFiles=${m.value}"))
  }

  test("anio/mes document layout round-trips through the partitioned sink") {
    import graft.sources.FicSources
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(
      ("a_f_raw.json", "2025", "7", "x"),
      ("b_f_raw.json", "2025", "8", "y"))
      .toDF("filename", "anio", "mes", "payload")
    val out = java.nio.file.Files.createTempDirectory("docs_part").toString
    FicSources.writePartitionedJson(docs, out)
    val back = spark.read.json(out)
    assert(back.count() == 2)
    assert(back.columns.toSet == Set("filename", "payload", "anio", "mes"))
    assert(new java.io.File(s"$out/anio=2025/mes=7").exists())
  }
}
