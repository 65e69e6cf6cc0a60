package graft.functions

import java.time.LocalDate
import scala.util.matching.Regex

/** Robust Spanish-month date parsing — the reference's
  * `_parse_fecha_robusta` (/root/reference/src/etl/transform.py:805-934)
  * re-expressed in Scala with identical outcomes:
  *
  *  1. `jul-25` / `jul-2025`          → first of month
  *  2. `31-jul-25` / `31-jul-2025`    → day validated 1..31 (no calendar check)
  *  3. `jul/25`, 4. `31/jul/2025`     → slash variants
  *  5. numeric fallbacks, in order: d/m/Y, Y-m-d, d-m-Y, m/d/Y, d/m/y,
  *     Y/m/d, d-m-y — calendar-validated, 2-digit years mapped with the
  *     CPython %y pivot (00-68 → 20xx, 69-99 → 19xx), and accepted only
  *     when year ≥ 1990.
  *
  * Quirks preserved deliberately: named-month patterns do NOT validate
  * the year (`jul-199` → `199-07-01`) or the calendar (`31-feb-25` is
  * accepted); 2-digit years in named-month patterns always map to 20xx
  * (`dic-99` → `2099-12-01`).
  */
object SpanishDate {

  private val months: Map[String, String] = Map(
    "ene" -> "01", "enero" -> "01", "feb" -> "02", "febrero" -> "02",
    "mar" -> "03", "marzo" -> "03", "abr" -> "04", "abril" -> "04",
    "may" -> "05", "mayo" -> "05", "jun" -> "06", "junio" -> "06",
    "jul" -> "07", "julio" -> "07", "ago" -> "08", "agosto" -> "08",
    "sep" -> "09", "septiembre" -> "09", "oct" -> "10", "octubre" -> "10",
    "nov" -> "11", "noviembre" -> "11", "dic" -> "12", "diciembre" -> "12")

  private val mesAnioDash: Regex = "^([a-z]+)-(\\d{2,4})$".r
  private val diaMesAnioDash: Regex = "^(\\d{1,2})-([a-z]+)-(\\d{2,4})$".r
  private val mesAnioSlash: Regex = "^([a-z]+)/(\\d{2,4})$".r
  private val diaMesAnioSlash: Regex = "^(\\d{1,2})/([a-z]+)/(\\d{2,4})$".r

  private def year4(s: String): String =
    if (s.length == 2) "20" + s else s

  /** CPython strptime %y pivot. */
  private def pivotYy(yy: Int): Int = if (yy <= 68) 2000 + yy else 1900 + yy

  /** Calendar-validated numeric date; None if invalid or year < 1990. */
  private def valid(y: Int, m: Int, d: Int): Option[String] =
    try {
      LocalDate.of(y, m, d)
      if (y >= 1990) Some(f"$y%04d-$m%02d-$d%02d") else None
    } catch { case _: Exception => None }

  /** Numeric fallback formats, tried in the reference's order. Each is
    * (regex, group-order mapper to (y, m, d)).
    */
  private val numericFormats: Seq[(Regex, Array[String] => (Int, Int, Int))] = Seq(
    ("^(\\d{1,2})/(\\d{1,2})/(\\d{3,4})$".r,
      (g: Array[String]) => (g(2).toInt, g(1).toInt, g(0).toInt)), // d/m/Y
    ("^(\\d{3,4})-(\\d{1,2})-(\\d{1,2})$".r,
      (g: Array[String]) => (g(0).toInt, g(1).toInt, g(2).toInt)), // Y-m-d
    ("^(\\d{1,2})-(\\d{1,2})-(\\d{3,4})$".r,
      (g: Array[String]) => (g(2).toInt, g(1).toInt, g(0).toInt)), // d-m-Y
    ("^(\\d{1,2})/(\\d{1,2})/(\\d{3,4})$".r,
      (g: Array[String]) => (g(2).toInt, g(0).toInt, g(1).toInt)), // m/d/Y
    ("^(\\d{1,2})/(\\d{1,2})/(\\d{1,2})$".r,
      (g: Array[String]) => (pivotYy(g(2).toInt), g(1).toInt, g(0).toInt)), // d/m/y
    ("^(\\d{3,4})/(\\d{1,2})/(\\d{1,2})$".r,
      (g: Array[String]) => (g(0).toInt, g(1).toInt, g(2).toInt)), // Y/m/d
    ("^(\\d{1,2})-(\\d{1,2})-(\\d{1,2})$".r,
      (g: Array[String]) => (pivotYy(g(2).toInt), g(1).toInt, g(0).toInt)), // d-m-y
  )

  /** Port of `_parse_fecha_robusta`: ISO date string or null. */
  def parse(fechaStr: String): String = {
    if (fechaStr == null) return null
    val f = fechaStr.trim.toLowerCase
    if (f.isEmpty && fechaStr.isEmpty) return null

    f match {
      case mesAnioDash(mes, anio) if months.contains(mes) =>
        return s"${year4(anio)}-${months(mes)}-01"
      case _ =>
    }
    f match {
      case diaMesAnioDash(dia, mes, anio) if months.contains(mes) =>
        val d = dia.toInt
        if (d >= 1 && d <= 31) return f"${year4(anio)}%s-${months(mes)}%s-$d%02d"
      case _ =>
    }
    f match {
      case mesAnioSlash(mes, anio) if months.contains(mes) =>
        return s"${year4(anio)}-${months(mes)}-01"
      case _ =>
    }
    f match {
      case diaMesAnioSlash(dia, mes, anio) if months.contains(mes) =>
        val d = dia.toInt
        if (d >= 1 && d <= 31) return f"${year4(anio)}%s-${months(mes)}%s-$d%02d"
      case _ =>
    }

    numericFormats.foreach { case (re, toYmd) =>
      re.findFirstMatchIn(f).foreach { m =>
        val (y, mo, d) = toYmd(m.subgroups.toArray)
        valid(y, mo, d).foreach(iso => return iso)
      }
    }
    null
  }
}
