package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.app.{GraftExtract, GraftLoad, GraftPipeline, GraftTransform, GraftTransformLoad}
import graft.load.JdbcSink
import graft.sources.FicSources

/** The fused one-command drivers (VERDICT r4 #5): each must leave the
  * database in EXACTLY the state the staged commands leave it in —
  * same rows, same deterministic fic_ids — while never re-reading the
  * intermediate JSON folders.
  */
class FusedPipelineSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val AllTables = Seq("fic", "composicion_portafolio",
    "plazo_duracion", "caracteristicas", "calificacion",
    "principales_inversiones", "rentabilidad_historica",
    "volatilidad_historica", "raw_json")

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Whole-table contents as an order-independent canonical form,
    * excluding the created_at audit timestamp (wall-clock).
    */
  private def snapshot(url: String, table: String): Seq[String] = {
    val df = JdbcSink.readTable(spark, url, table).get
    val cols = df.columns.filterNot(_.equalsIgnoreCase("created_at")).sorted
    df.select(cols.map(col): _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted
  }

  test("fused E+T+L run leaves the same Derby state as the staged three commands") {
    spark.sparkContext.setLogLevel("WARN")
    val pdfs = "/root/reference/data/pdfs"
    val stagedWork = tmp("staged_etl")
    val fusedWork = tmp("fused_etl")
    val stagedUrl = "jdbc:derby:memory:stagedEtl;create=true"
    val fusedUrl = "jdbc:derby:memory:fusedEtl;create=true"

    // staged: three commands, each re-reading the previous side-output
    GraftExtract.run(spark, pdfs, s"$stagedWork/raw", workers = 2).unpersist()
    GraftTransform.run(spark, s"$stagedWork/raw", s"$stagedWork/transformed", None)
    val stagedDocs = FicSources
      .transformedJsonFolder(spark, s"$stagedWork/transformed")
      .join(broadcast(FicSources.skipList(spark,
        s"$stagedWork/transformed/skip_list.txt")), Seq("filename"), "left_anti")
    GraftLoad.run(spark, stagedDocs, stagedUrl)

    // fused: one command, frames flowing between stages in memory
    val (n, nReplaced) = GraftPipeline.run(spark, pdfs, fusedWork, fusedUrl,
      ficsPath = None, workers = 2)
    assert(n == 7 && nReplaced == 0)

    // identical side-outputs on disk...
    def names(d: String): Set[String] = {
      val f = new java.io.File(d)
      assert(f.isDirectory, s"$d missing")
      f.listFiles().map(_.getName).filterNot(_.startsWith(".")).toSet
    }
    assert(names(s"$fusedWork/raw") == names(s"$stagedWork/raw"))
    assert(names(s"$fusedWork/transformed") == names(s"$stagedWork/transformed"))

    // ...and identical database state, table by table
    AllTables.foreach { t =>
      assert(snapshot(fusedUrl, t) == snapshot(stagedUrl, t), s"table $t differs")
    }
    assert(snapshot(fusedUrl, "fic").size == 7)
  }

  test("fused T+L run equals staged transform+load on the reference fixtures") {
    val fixtures = "/root/reference/data/json_raw_2025_07"
    val stagedOut = tmp("staged_tl")
    val fusedOut = tmp("fused_tl")
    val stagedUrl = "jdbc:derby:memory:stagedTl;create=true"
    val fusedUrl = "jdbc:derby:memory:fusedTl;create=true"

    GraftTransform.run(spark, fixtures, stagedOut, None)
    val stagedDocs = FicSources.transformedJsonFolder(spark, stagedOut)
      .join(broadcast(FicSources.skipList(spark, s"$stagedOut/skip_list.txt")),
        Seq("filename"), "left_anti")
    GraftLoad.run(spark, stagedDocs, stagedUrl)

    val (n, _) = GraftTransformLoad.run(spark, fixtures, fusedOut, fusedUrl, None)
    // the 2025_07 folder flags progresion_globalVista (fecha 2025-01-31),
    // so 6 of the 7 fixtures load
    assert(n == 6)

    AllTables.foreach { t =>
      assert(snapshot(fusedUrl, t) == snapshot(stagedUrl, t), s"table $t differs")
    }
  }
}
