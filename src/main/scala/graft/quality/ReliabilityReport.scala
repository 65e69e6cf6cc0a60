package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's `comparacion_resultados.xlsx` report
  * (/root/reference/src/scripts/test_ETL.py:306-323) as a CSV bundle:
  * the container ships no spreadsheet writer and the four sheets are
  * plain tables, so each lands as `<outDir>/<sheet>/part-*.csv` with a
  * header. Sheet names and schemas mirror the workbook:
  *
  *  - `Diferencias_Detalladas` — every leaf-level diff
  *    (banco, fondo, campo, actual, expected);
  *  - `Confiabilidad` — per document: total_campos, diferencias,
  *    confiabilidad (the (1 − diffs/fields)·100 score);
  *  - `Resumen_Campos` — diff occurrences per campo, descending;
  *  - `Resumen_Bancos` — per banco: mean confiabilidad (rounded 2),
  *    summed diferencias, fund count.
  *
  * All four are aggregates of the distributed GoldenDiff frames; only
  * the final (report-sized) sheets coalesce to a single file.
  */
object ReliabilityReport {

  /** banco/fondo from the reference filename convention
    * 'Banco_Fondo_raw_transformed[_PRUEBA].json' (test_ETL.py:9-20);
    * non-matching names yield empty banco/fondo, mirroring the
    * reference's skip of unmatched files.
    */
  private val BancoRe = "^(.+?)_(.+?)_raw_transformed(?:_PRUEBA)?\\.json$"

  private def withBancoFondo(df: DataFrame): DataFrame = df
    .withColumn("banco", regexp_extract(col("doc"), BancoRe, 1))
    .withColumn("fondo", regexp_extract(col("doc"), BancoRe, 2))

  /** The four sheets as (name, frame) pairs. */
  def sheets(actual: DataFrame, expected: DataFrame, keyCol: String,
      tolerance: Double = 1e-10): Seq[(String, DataFrame)] = {
    val diffs = withBancoFondo(
      GoldenDiff.diff(actual, expected, keyCol, tolerance))
    val rel = withBancoFondo(
      GoldenDiff.reliability(actual, expected, keyCol, tolerance))
      .select(col("banco"), col("fondo"),
        col("n_fields").as("total_campos"),
        col("n_diffs").as("diferencias"), col("confiabilidad"))
    val campos = diffs.groupBy(col("campo"))
      .agg(count(lit(1)).as("ocurrencias"))
      .orderBy(col("ocurrencias").desc, col("campo"))
    val bancos = rel.groupBy(col("banco"))
      .agg(round(avg(col("confiabilidad")), 2).as("Confiabilidad_Promedio"),
        sum(col("diferencias")).as("Total_Diferencias"),
        count(lit(1)).as("Cantidad_Fondos"))
      .withColumnRenamed("banco", "Banco")
      .orderBy(col("Banco"))
    Seq(
      "Diferencias_Detalladas" ->
        diffs.select("banco", "fondo", "campo", "actual", "expected"),
      "Confiabilidad" -> rel,
      "Resumen_Campos" -> campos,
      "Resumen_Bancos" -> bancos)
  }

  /** Write all four sheets as headered single-file CSVs under outDir. */
  def writeCsv(actual: DataFrame, expected: DataFrame, keyCol: String,
      outDir: String, tolerance: Double = 1e-10): Unit =
    sheets(actual, expected, keyCol, tolerance).foreach { case (name, df) =>
      df.coalesce(1).write.mode("overwrite")
        .option("header", "true").csv(s"$outDir/$name")
    }

  /** Write the four sheets as ONE `.xlsx` workbook — the reference's
    * actual artifact (`comparacion_resultados.xlsx`, test_ETL.py:306-323)
    * via the dependency-free [[Xlsx]] writer. The sheets are QA-report
    * sized, so collecting them to the driver is the point, not a
    * compromise (the reference builds them from in-memory dicts).
    */
  def writeXlsx(actual: DataFrame, expected: DataFrame, keyCol: String,
      path: String, tolerance: Double = 1e-10): Unit = {
    val rendered = sheets(actual, expected, keyCol, tolerance).map {
      case (name, df) =>
        val header = df.columns.toSeq
        val rows = df.collect().toSeq.map(r =>
          header.indices.map(i => Option(r.get(i)).map(_.toString).orNull))
        name -> (header +: rows)
    }
    Xlsx.write(path, rendered)
  }
}
