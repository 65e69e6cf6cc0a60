package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators.{Analytics, CurationOps, DataLayout, Expectations, FicGate, GateQuery, MediaGate, Relational, Scalar, TextOps, TrainingOps, VectorOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator pack contributes `GateQuery`s (Spark build + DuckDB
  * oracle SQL); this object is just the aggregation point the driver
  * reads.
  */
object SparkEntry {

  private def packs: Seq[GateQuery] =
    Relational.all ++ Scalar.all ++ Analytics.all ++ TextOps.all ++
    TrainingOps.all ++ CurationOps.all ++ VectorOps.all ++ FicGate.all ++
    MediaGate.all ++ DataLayout.all ++ Expectations.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q3TopOrders(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(q => q.oracle.map(o => q.name -> o.trim)).toMap
}
