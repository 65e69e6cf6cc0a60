package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.fic.{FicLookup, FicShredder, FicUpsert}
import graft.streaming.FicStreaming

/** Incremental ingestion end-to-end: two monthly drops stream through
  * the transform chain; foreachBatch merges each micro-batch into a
  * parquet snapshot with latest-wins semantics.
  */
class StreamingUpsertSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streamed drops merge latest-wins into the snapshot") {
    spark.sparkContext.setLogLevel("WARN")
    import java.nio.file.Files
    val in = Files.createTempDirectory("drops").toFile
    val snapDir = Files.createTempDirectory("snapshot").toString + "/fic"

    def writeDoc(name: String, fecha: String): Unit = {
      val json =
        s"""{"fic": {"nombre_fic": "F1", "gestor": "G", "custodio": null,
           | "fecha_corte": "$fecha", "politica_de_inversion": "renta fija"},
           | "caracteristicas": {"tipo": "Abierto", "valor": 10.0,
           | "fecha_inicio_operaciones": "2020-01-01",
           | "no_unidades_en_circulacion": 1.0}}""".stripMargin
      Files.writeString(new java.io.File(in, name).toPath, json)
    }

    def readSnapshot(): DataFrame = spark.read.parquet(snapDir)

    // month 1 lands before the stream starts
    writeDoc("bankx_f1_raw.json", "jun-25")

    val raw = FicStreaming.rawJsonStream(spark, in.getAbsolutePath)
    val transformed = FicStreaming.transformStream(raw, FicLookup(Nil))
    val q = FicStreaming.upsertSink(transformed) { (batch, _) =>
      val incoming = FicShredder(batch).fic
      val merged =
        if (!new java.io.File(snapDir).exists()) incoming
        else FicUpsert.merge(readSnapshot(), incoming).fic
      // two-phase write: never read and overwrite the same files lazily
      val staged = merged.collect()
      spark.createDataFrame(
        spark.sparkContext.parallelize(staged.toIndexedSeq), merged.schema)
        .write.mode("overwrite").parquet(snapDir)
    }.start()
    q.processAllAvailable()

    val snap1 = readSnapshot().collect()
    assert(snap1.length == 1)
    assert(snap1.head.getAs[String]("fecha_corte") == "2025-06-01")

    // month 2 arrives: newer fecha_corte must replace the head row
    writeDoc("bankx_f1_b_raw.json", "jul-25")
    q.processAllAvailable()
    q.stop()

    val snap2 = readSnapshot().collect()
    assert(snap2.length == 1, snap2.mkString(";"))
    assert(snap2.head.getAs[String]("fecha_corte") == "2025-07-01")
  }
}
