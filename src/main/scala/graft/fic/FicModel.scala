package graft.fic

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed core (SURVEY §1.2): case-class model of the transformed FIC
  * document and the shredded star rows, for `Dataset[T]` pipelines where
  * compile-time field checks help (the transform chain itself stays
  * DataFrame-based — its schema work is dynamic by nature).
  */
object FicModel {

  case class FicHead(
      nombre_fic: String, gestor: String, custodio: Option[String],
      fecha_corte: Option[String], politica_de_inversion: Option[String],
      tipo: Option[String], url: Option[String])

  case class Pct(participacion: Option[Double])
  case class Plazo(plazo: Option[String], participacion: Option[Double])
  case class Inversion(emisor: Option[String], participacion: Option[Double])

  case class Horizontes(
      ultimo_mes: Option[Double], ultimos_6_meses: Option[Double],
      anio_corrido: Option[Double], ultimo_anio: Option[Double],
      ultimos_2_anios: Option[Double], ultimos_3_anios: Option[Double])

  case class RentVol(
      tipo_de_participacion: Option[String],
      rentabilidad_historica_ea: Option[Horizontes],
      volatilidad_historica: Option[Horizontes])

  /** Shredded fact row of the composicion_portafolio child table. */
  case class Composicion(
      fic_id: Long, tipo_composicion: String, categoria: String,
      participacion: Option[Double])

  /** Typed accessor over the shredded composition table. */
  def composiciones(sh: FicShredder.Shredded): Dataset[Composicion] = {
    val spark = sh.composicionPortafolio.sparkSession
    import spark.implicits._
    sh.composicionPortafolio.as[Composicion]
  }

  /** Typed head rows. */
  def heads(sh: FicShredder.Shredded): Dataset[(Long, FicHead)] = {
    val spark = sh.fic.sparkSession
    import spark.implicits._
    sh.fic.map { r =>
      (r.getAs[Long]("fic_id"), FicHead(
        r.getAs[String]("nombre_fic"), r.getAs[String]("gestor"),
        Option(r.getAs[String]("custodio")), Option(r.getAs[String]("fecha_corte")),
        Option(r.getAs[String]("politica_de_inversion")),
        Option(r.getAs[String]("tipo")), Option(r.getAs[String]("url"))))
    }
  }
}
