package graft.fic

import org.apache.spark.sql.types._

/** Schemas for the FIC fact-sheet JSON documents — the extraction-prompt
  * shape (/root/reference/src/etl/extract.py:25-98, FIXTURES.md §1).
  *
  * Raw leaves that the LLM may emit as string OR number (percentages,
  * monetary values, dates) are read as StringType: Spark's JSON reader
  * renders number tokens as their literal text, so a single string
  * column absorbs both shapes and the transform chain owns the parsing —
  * mirroring the reference's declared-by-prompt / enforced-by-cleanup
  * schema system (SURVEY §1.2). Never inferSchema: the repair pass needs
  * the full expected shape present as (nullable) columns.
  */
object FicSchema {

  private def pct(key: String): ArrayType = ArrayType(StructType(Seq(
    StructField(key, StringType),
    StructField("participacion", StringType))))

  private val horizons = StructType(Seq(
    StructField("ultimo_mes", StringType),
    StructField("ultimos_6_meses", StringType),
    StructField("anio_corrido", StringType),
    StructField("ultimo_anio", StringType),
    StructField("ultimos_2_anios", StringType),
    StructField("ultimos_3_anios", StringType)))

  /** Raw (pre-transform) document schema. */
  val raw: StructType = StructType(Seq(
    StructField("fic", StructType(Seq(
      StructField("nombre_fic", StringType),
      StructField("gestor", StringType),
      StructField("custodio", StringType),
      StructField("fecha_corte", StringType),
      StructField("politica_de_inversion", StringType)))),
    StructField("plazo_duracion", pct("plazo")),
    StructField("composicion_portafolio", StructType(Seq(
      StructField("por_activo", pct("activo")),
      StructField("por_tipo_de_renta", pct("tipo")),
      StructField("por_sector_economico", pct("sector")),
      StructField("por_pais_emisor", pct("pais")),
      StructField("por_moneda", pct("moneda")),
      StructField("por_calificacion", pct("calificacion"))))),
    StructField("caracteristicas", StructType(Seq(
      StructField("tipo", StringType),
      StructField("valor", StringType),
      StructField("fecha_inicio_operaciones", StringType),
      StructField("no_unidades_en_circulacion", StringType)))),
    StructField("calificacion", StructType(Seq(
      StructField("calificacion", StringType),
      StructField("fecha_ultima_calificacion", StringType),
      StructField("entidad_calificadora", StringType)))),
    StructField("principales_inversiones", ArrayType(StructType(Seq(
      StructField("emisor", StringType),
      StructField("participacion", StringType))))),
    StructField("rentabilidad_volatilidad", ArrayType(StructType(Seq(
      StructField("tipo_de_participacion", StringType),
      StructField("rentabilidad_historica_ea", horizons),
      StructField("volatilidad_historica", horizons)))))))

  private def pctD(key: String): ArrayType = ArrayType(StructType(Seq(
    StructField(key, StringType),
    StructField("participacion", DoubleType))))

  private val horizonsD = StructType(Seq(
    StructField("ultimo_mes", DoubleType),
    StructField("ultimos_6_meses", DoubleType),
    StructField("anio_corrido", DoubleType),
    StructField("ultimo_anio", DoubleType),
    StructField("ultimos_2_anios", DoubleType),
    StructField("ultimos_3_anios", DoubleType)))

  /** Transformed document schema (used to read golden files in tests and
    * as the documented output contract of [[FicTransform]]).
    */
  val transformed: StructType = StructType(Seq(
    StructField("fic", StructType(Seq(
      StructField("nombre_fic", StringType),
      StructField("gestor", StringType),
      StructField("custodio", StringType),
      StructField("fecha_corte", StringType),
      StructField("politica_de_inversion", StringType),
      StructField("tipo", StringType),
      StructField("url", StringType)))),
    StructField("plazo_duracion", pctD("plazo")),
    StructField("composicion_portafolio", StructType(Seq(
      StructField("por_activo", pctD("activo")),
      StructField("por_tipo_de_renta", pctD("tipo")),
      StructField("por_sector_economico", pctD("sector")),
      StructField("por_pais_emisor", pctD("pais")),
      StructField("por_moneda", pctD("moneda")),
      StructField("por_calificacion", pctD("calificacion"))))),
    StructField("caracteristicas", StructType(Seq(
      StructField("tipo", StringType),
      StructField("valor", DoubleType),
      StructField("fecha_inicio_operaciones", StringType),
      StructField("no_unidades_en_circulacion", DoubleType)))),
    StructField("calificacion", StructType(Seq(
      StructField("calificacion", StringType),
      StructField("fecha_ultima_calificacion", StringType),
      StructField("entidad_calificadora", StringType),
      StructField("entidad_calificadora_normalizada", BooleanType)))),
    StructField("principales_inversiones", ArrayType(StructType(Seq(
      StructField("emisor", StringType),
      StructField("participacion", DoubleType))))),
    StructField("rentabilidad_volatilidad", ArrayType(StructType(Seq(
      StructField("tipo_de_participacion", StringType),
      StructField("rentabilidad_historica_ea", horizonsD),
      StructField("volatilidad_historica", horizonsD)))))))
}
