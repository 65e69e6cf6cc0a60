package graft.fic

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shred a transformed FIC document DataFrame into the 9-table star
  * schema (/root/reference/src/etl/load.py:239-364,
  * /root/reference/src/config/db.py:48-210).
  *
  * Keys: the reference uses Postgres autoincrement ids; distributed
  * equivalent (SURVEY §7.4.1) is a deterministic natural-key hash —
  * xxhash64 over (url, nombre_fic, fecha_corte, filename) — so children
  * join to parents without any sequence coordination, task retries are
  * idempotent, and re-runs produce identical ids. Every child table is a
  * narrow per-row explode of its parent document: the whole shred is one
  * scan, zero shuffles.
  */
object FicShredder {

  /** Deterministic surrogate key for one document version. */
  def ficIdCol: Column = xxhash64(
    coalesce(col("fic.url"), lit("")),
    coalesce(col("fic.nombre_fic"), lit("")),
    coalesce(col("fic.fecha_corte"), lit("")),
    coalesce(col("filename"), lit("")))

  final case class Shredded(
      fic: DataFrame,
      composicionPortafolio: DataFrame,
      plazoDuracion: DataFrame,
      caracteristicas: DataFrame,
      calificacion: DataFrame,
      principalesInversiones: DataFrame,
      rentabilidadHistorica: DataFrame,
      volatilidadHistorica: DataFrame,
      rawJson: DataFrame) {
    def all: Seq[(String, DataFrame)] = Seq(
      "fic" -> fic,
      "composicion_portafolio" -> composicionPortafolio,
      "plazo_duracion" -> plazoDuracion,
      "caracteristicas" -> caracteristicas,
      "calificacion" -> calificacion,
      "principales_inversiones" -> principalesInversiones,
      "rentabilidad_historica" -> rentabilidadHistorica,
      "volatilidad_historica" -> volatilidadHistorica,
      "raw_json" -> rawJson)
  }

  private val CompCats = Seq(
    // (document field, tipo_composicion value, element key field) —
    // the category alias map of load.py:244-251.
    ("por_activo", "activo", "activo"),
    ("por_tipo_de_renta", "tipo_renta", "tipo"),
    ("por_sector_economico", "sector_economico", "sector"),
    ("por_pais_emisor", "pais_emisor", "pais"),
    ("por_moneda", "moneda", "moneda"),
    ("por_calificacion", "calificacion", "calificacion"))

  /** `df` = output of [[FicTransform]] plus the `filename` column. */
  def apply(df: DataFrame): Shredded = {
    val base = df.withColumn("fic_id", ficIdCol)

    val fic = base.select(
      col("fic_id"),
      coalesce(col("fic.nombre_fic"), lit("")).as("nombre_fic"),
      coalesce(col("fic.gestor"), lit("")).as("gestor"),
      col("fic.custodio").as("custodio"),
      col("fic.fecha_corte").as("fecha_corte"),
      col("fic.politica_de_inversion").as("politica_de_inversion"),
      coalesce(col("fic.tipo"), lit("")).as("tipo"),
      coalesce(col("fic.url"), lit("")).as("url"))

    // U3: six category arrays -> (fic_id, tipo_composicion, categoria,
    // participacion). Falsy category values collapse to '' exactly like
    // the load-side or-chain (load.py:259-260).
    val comp = CompCats.map { case (field, tipo, key) =>
      base.select(col("fic_id"),
          explode(col(s"composicion_portafolio.$field")).as("it"))
        .select(
          col("fic_id"),
          lit(tipo).as("tipo_composicion"),
          coalesce(col(s"it.$key"), lit("")).as("categoria"),
          col("it.participacion").as("participacion"))
    }.reduce(_ unionAll _)

    val plazos = base.select(col("fic_id"), explode(col("plazo_duracion")).as("it"))
      .select(col("fic_id"), col("it.plazo").as("plazo"),
        col("it.participacion").as("participacion"))

    val caracteristicas = base.select(
      col("fic_id"),
      col("caracteristicas.tipo").as("tipo"),
      col("caracteristicas.valor").as("valor"),
      col("caracteristicas.fecha_inicio_operaciones").as("fecha_inicio_operaciones"),
      col("caracteristicas.no_unidades_en_circulacion").as("no_unidades_en_circulacion"))

    val calificacion = base.select(
      col("fic_id"),
      col("calificacion.calificacion").as("calificacion"),
      col("calificacion.fecha_ultima_calificacion").as("fecha_ultima_calificacion"),
      col("calificacion.entidad_calificadora").as("entidad_calificadora"),
      col("calificacion.entidad_calificadora_normalizada")
        .as("entidad_calificadora_normalizada"))

    val inversiones = base.select(col("fic_id"),
        explode(col("principales_inversiones")).as("it"))
      .select(col("fic_id"), col("it.emisor").as("emisor"),
        col("it.participacion").as("participacion"))

    def horizons(st: String): Seq[Column] = Seq(
      "ultimo_mes", "ultimos_6_meses", "anio_corrido",
      "ultimo_anio", "ultimos_2_anios", "ultimos_3_anios")
      .map(h => col(s"rv.$st.$h").as(h))

    val rvBase = base.select(col("fic_id"),
      explode(col("rentabilidad_volatilidad")).as("rv"))
    val rent = rvBase.select(
      col("fic_id") +: col("rv.tipo_de_participacion").as("tipo_participacion") +:
        horizons("rentabilidad_historica_ea"): _*)
    val vol = rvBase.select(
      col("fic_id") +: col("rv.tipo_de_participacion").as("tipo_participacion") +:
        horizons("volatilidad_historica"): _*)

    val rawJson = base.select(
      col("fic_id"),
      to_json(struct(col("fic"), col("plazo_duracion"),
        col("composicion_portafolio"), col("caracteristicas"),
        col("calificacion"), col("principales_inversiones"),
        col("rentabilidad_volatilidad"))).as("json_data"),
      lit("transformed").as("tipo"),
      col("filename").as("filename"))

    Shredded(fic, comp, plazos, caracteristicas, calificacion,
      inversiones, rent, vol, rawJson)
  }
}
