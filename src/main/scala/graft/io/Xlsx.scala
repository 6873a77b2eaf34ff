package graft.io

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType, LongType}
import java.io.InputStream
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import scala.collection.mutable

/** S1 — minimal xlsx reader (SURVEY.md §7.3: "the one genuine custom
  * build"). Spark has no built-in Excel source; the reference reads
  * `UnemploymentReport.xlsx` sheet1 via pandas (dag1.py:24).
  *
  * An .xlsx file is a ZIP of XML parts (ECMA-376 / ISO 29500 SpreadsheetML,
  * publicly documented). This reader parses, with the JDK's built-in StAX —
  * zero external dependencies:
  *   - `xl/workbook.xml`            sheet name → rId
  *   - `xl/_rels/workbook.xml.rels` rId → worksheet part path
  *   - `xl/sharedStrings.xml`       the shared-string table (`t="s"` cells)
  *   - `xl/worksheets/sheetN.xml`   rows and cells
  *
  * All cell values surface as strings (header surgery + typed casts are
  * downstream ops, matching the reference's promote-header-then-clean flow,
  * dag1.py:26-40). Each row carries `__idx` (0-based sheet row) so the
  * positional ops R1/R2/R4 have an explicit, deterministic order.
  *
  * Driver-side by design: spreadsheets are control-plane inputs (the
  * reference's is 57 rows); fact data arrives via splittable sources. */
object Xlsx {

  private val factory = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f
  }

  /** Column letters "A".."XFD" → 0-based index. */
  private[io] def colIndex(ref: String): Int = {
    val letters = ref.takeWhile(_.isLetter)
    letters.foldLeft(0)((acc, ch) => acc * 26 + (ch - 'A' + 1)) - 1
  }

  private def parseSharedStrings(in: InputStream): IndexedSeq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    val r = factory.createXMLStreamReader(in)
    var inSi = false
    // phonetic guide runs (<rPh>, Japanese furigana) carry their own <t>
    // elements that are NOT part of the cell text — collecting them would
    // concatenate the reading onto the value ("東京" → "東京トウキョウ")
    var inPhonetic = false
    val sb = new StringBuilder
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => inSi = true; inPhonetic = false; sb.clear()
            case "rPh" => inPhonetic = true
            case "t" if inSi && !inPhonetic => sb.append(r.getElementText)
            case _ =>
          }
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "si" => inSi = false; out += sb.toString
            case "rPh" => inPhonetic = false
            case _ =>
          }
        case _ =>
      }
    }
    out.toIndexedSeq
  }

  /** Parse one worksheet part → (0-based row index, cells by column index). */
  private def parseSheet(in: InputStream, shared: IndexedSeq[String])
      : Seq[(Long, Map[Int, String])] = {
    val rows = mutable.ArrayBuffer.empty[(Long, Map[Int, String])]
    val r = factory.createXMLStreamReader(in)
    var rowIdx = -1L
    var cells: mutable.Map[Int, String] = null
    var cellCol = -1
    var cellType = ""
    var value: String = null
    var inPhonetic = false // <rPh> furigana runs are not cell text
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" =>
              val rAttr = Option(r.getAttributeValue(null, "r"))
              rowIdx = rAttr.map(_.toLong - 1).getOrElse(rowIdx + 1)
              cells = mutable.Map.empty
            case "c" =>
              cellCol = Option(r.getAttributeValue(null, "r")).map(colIndex)
                .getOrElse(if (cells.isEmpty) 0 else cells.keys.max + 1)
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("n")
              value = null
              inPhonetic = false
            case "rPh" => inPhonetic = true
            case "v" => value = r.getElementText
            case "t" if cellType == "inlineStr" && !inPhonetic =>
              // rich-text inline cells carry one <t> per formatting run —
              // APPEND runs (Excel emits several when part of a cell is
              // styled); overwriting would keep only the last run
              value = (if (value == null) "" else value) + r.getElementText
            case _ =>
          }
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "rPh" => inPhonetic = false
            case "c" if cells != null =>
              val resolved = cellType match {
                case "s" if value != null => shared(value.toInt)
                case "b" if value != null => if (value == "1") "true" else "false"
                case _                    => value
              }
              if (resolved != null) cells(cellCol) = resolved
            case "row" if cells != null =>
              rows += ((rowIdx, cells.toMap)); cells = null
            case _ =>
          }
        case _ =>
      }
    }
    rows.toSeq
  }

  /** Read sheet `sheet` (1-based, default first) of an xlsx file into a
    * DataFrame of all-string columns `_c0.._cN` plus `__idx` (sheet row
    * order). */
  def read(spark: SparkSession, path: String, sheet: Int = 1): DataFrame = {
    val zip = new ZipFile(path)
    try {
      def entryStream(name: String): Option[InputStream] =
        Option(zip.getEntry(name)).map(zip.getInputStream)

      val shared = entryStream("xl/sharedStrings.xml")
        .map(parseSharedStrings).getOrElse(IndexedSeq.empty)

      // Worksheet part resolution: honor workbook.xml.rels when present,
      // else fall back to the conventional sheetN.xml naming.
      val sheetPath = (for {
        wb   <- entryStream("xl/workbook.xml")
        rels <- entryStream("xl/_rels/workbook.xml.rels")
      } yield {
        val wbXml = new String(wb.readAllBytes(), "UTF-8")
        val relsXml = new String(rels.readAllBytes(), "UTF-8")
        val sheetIds = """<sheet [^>]*r:id="([^"]+)"""".r
          .findAllMatchIn(wbXml).map(_.group(1)).toSeq
        sheetIds.lift(sheet - 1).flatMap { rid =>
          (s"""<Relationship [^>]*Id="$rid"[^>]*Target="([^"]+)"""".r
            .findFirstMatchIn(relsXml) orElse
           s"""<Relationship [^>]*Target="([^"]+)"[^>]*Id="$rid"""".r
            .findFirstMatchIn(relsXml))
            .map(m => "xl/" + m.group(1).stripPrefix("/xl/").stripPrefix("xl/"))
        }
      }).flatten.getOrElse(s"xl/worksheets/sheet$sheet.xml")

      val rows = entryStream(sheetPath)
        .map(parseSheet(_, shared))
        .getOrElse(throw new java.io.FileNotFoundException(s"$path!$sheetPath"))

      val width = if (rows.isEmpty) 0 else rows.iterator.map(r => if (r._2.isEmpty) 0 else r._2.keys.max + 1).max
      val schema = StructType(
        StructField("__idx", LongType, nullable = false) +:
          (0 until width).map(i => StructField(s"_c$i", StringType, nullable = true)))
      val data = rows.map { case (idx, cells) =>
        Row.fromSeq(idx +: (0 until width).map(i => cells.get(i).orNull))
      }
      spark.createDataFrame(spark.sparkContext.parallelize(data.toList, 1), schema)
    } finally zip.close()
  }

  // Quote escaping included: sheetName lands inside an XML ATTRIBUTE value.
  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  /** Write a cell grid as a minimal single-sheet .xlsx (SpreadsheetML zip):
    * numbers as native numeric cells, everything else as inline strings,
    * null cells omitted. Driver-side, like the reader — xlsx is a
    * control-plane format here, not a fact-data sink. */
  def write(path: String, rows: Seq[Seq[Any]], sheetName: String = "Sheet1"): Unit = {
    def colRef(i: Int): String = {
      var n = i + 1; val sb = new StringBuilder
      while (n > 0) { sb.insert(0, ('A' + (n - 1) % 26).toChar); n = (n - 1) / 26 }
      sb.toString
    }
    val sheetXml = new StringBuilder(
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
    rows.zipWithIndex.foreach { case (cells, r) =>
      sheetXml.append(s"""<row r="${r + 1}">""")
      cells.zipWithIndex.foreach { case (v, c) =>
        val ref = s"${colRef(c)}${r + 1}"
        v match {
          case null =>
          case n: Int    => sheetXml.append(s"""<c r="$ref"><v>$n</v></c>""")
          case n: Long   => sheetXml.append(s"""<c r="$ref"><v>$n</v></c>""")
          // NaN/Infinity are not valid SpreadsheetML numbers (Excel flags
          // the workbook corrupt) — emit them as inline strings instead
          case n: Double if java.lang.Double.isFinite(n) =>
            sheetXml.append(s"""<c r="$ref"><v>$n</v></c>""")
          case other =>
            sheetXml.append(
              s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${xmlEscape(other.toString)}</t></is></c>""")
        }
      }
      sheetXml.append("</row>")
    }
    sheetXml.append("</sheetData></worksheet>")

    val entries = Seq(
      "[Content_Types].xml" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
         """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
         """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
         """<Default Extension="xml" ContentType="application/xml"/>""" +
         """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
         """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
         """</Types>"""),
      "_rels/.rels" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
         """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
         """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
         """</Relationships>"""),
      "xl/workbook.xml" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
         """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" """ +
         """xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
         s"""<sheets><sheet name="${xmlEscape(sheetName)}" sheetId="1" r:id="rId1"/></sheets></workbook>"""),
      "xl/_rels/workbook.xml.rels" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
         """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
         """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>""" +
         """</Relationships>"""),
      "xl/worksheets/sheet1.xml" -> sheetXml.toString)

    val out = new ZipOutputStream(java.nio.file.Files.newOutputStream(
      java.nio.file.Paths.get(path)))
    try entries.foreach { case (name, content) =>
      out.putNextEntry(new ZipEntry(name))
      out.write(content.getBytes("UTF-8"))
      out.closeEntry()
    } finally out.close()
  }
}
