package graft.quality

import java.io.FileOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Minimal self-contained `.xlsx` writer — closes the reference's one
  * remaining artifact gap (`comparacion_resultados.xlsx`,
  * /root/reference/src/scripts/test_ETL.py:306-323) without any
  * spreadsheet dependency: an xlsx file is a ZIP of OOXML parts, so
  * `java.util.zip` plus hand-built XML is a complete writer for the
  * report's needs (multiple named sheets, string and numeric cells; no
  * styles, formulas or shared strings — inline strings keep the part
  * self-contained).
  *
  * The writer is DRIVER-SIDE by design: it consumes already-collected
  * report-sized sheets (the reference's workbook is a QA summary, not
  * data-plane output), so nothing here touches the distributed path.
  */
object Xlsx {

  private def esc(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case c if c < ' ' && c != '\t' && c != '\n' && c != '\r' => ""
      case c => c.toString
    }

  /** A1-style column letters: 0 → A, 25 → Z, 26 → AA … */
  private[quality] def colRef(i: Int): String = {
    var n = i
    val sb = new StringBuilder
    while (n >= 0) {
      sb.insert(0, ('A' + n % 26).toChar)
      n = n / 26 - 1
    }
    sb.toString
  }

  private val NumericRe = """-?\d+(\.\d+)?([eE][+-]?\d+)?""".r

  private def cellXml(rowIdx: Int, colIdx: Int, v: String): String = {
    val ref = s"${colRef(colIdx)}${rowIdx + 1}"
    if (v == null) ""
    else if (NumericRe.matches(v)) s"""<c r="$ref" t="n"><v>$v</v></c>"""
    else s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${esc(v)}</t></is></c>"""
  }

  private def sheetXml(rows: Seq[Seq[String]]): String = {
    val body = rows.zipWithIndex.map { case (cells, r) =>
      val cs = cells.zipWithIndex.map { case (v, c) => cellXml(r, c, v) }.mkString
      s"""<row r="${r + 1}">$cs</row>"""
    }.mkString
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>$body</sheetData></worksheet>"""
      .stripMargin
  }

  /** Write `sheets` (name → rows of cells, first row = header) as one
    * workbook at `path`. Sheet order is preserved.
    */
  def write(path: String, sheets: Seq[(String, Seq[Seq[String]])]): Unit = {
    require(sheets.nonEmpty, "xlsx needs at least one sheet")
    val zos = new ZipOutputStream(new FileOutputStream(path))
    def part(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes(UTF_8))
      zos.closeEntry()
    }
    val n = sheets.size
    part("[Content_Types].xml",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
         |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
         |<Default Extension="xml" ContentType="application/xml"/>
         |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
         |${(1 to n).map(i => s"""<Override PartName="/xl/worksheets/sheet$i.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""").mkString("\n")}
         |</Types>""".stripMargin)
    part("_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin)
    part("xl/workbook.xml",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
         |<sheets>${sheets.zipWithIndex.map { case ((name, _), i) =>
              s"""<sheet name="${esc(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
            }.mkString}</sheets>
         |</workbook>""".stripMargin)
    part("xl/_rels/workbook.xml.rels",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
         |${(1 to n).map(i => s"""<Relationship Id="rId$i" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet$i.xml"/>""").mkString("\n")}
         |</Relationships>""".stripMargin)
    sheets.zipWithIndex.foreach { case ((_, rows), i) =>
      part(s"xl/worksheets/sheet${i + 1}.xml", sheetXml(rows))
    }
    zos.close()
  }
}
