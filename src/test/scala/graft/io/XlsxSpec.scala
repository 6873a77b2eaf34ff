package graft.io

import graft.SparkSpec
import java.nio.file.Files

class XlsxSpec extends SparkSpec {

  test("colIndex: A=0, Z=25, AA=26, XFD=16383") {
    assert(Xlsx.colIndex("A1") === 0)
    assert(Xlsx.colIndex("Z9") === 25)
    assert(Xlsx.colIndex("AA12") === 26)
    assert(Xlsx.colIndex("XFD1") === 16383)
  }

  test("write/read round-trip: strings, numbers, nulls, XML escapes, row order") {
    val f = Files.createTempDirectory("graft_xlsx").resolve("t.xlsx").toString
    Xlsx.write(f, Seq[Seq[Any]](
      Seq("name", "qty", "note"),
      Seq("a<b&c", 42, "x"),
      Seq("plain", 3.5, null),
      Seq(null, 7, "end")))
    val df = Xlsx.read(spark, f)
    assert(df.columns.sameElements(Array("__idx", "_c0", "_c1", "_c2")))
    val rows = df.orderBy("__idx").collect()
    assert(rows.length === 4)
    assert(rows(0).getString(1) === "name")
    assert(rows(1).getString(1) === "a<b&c")     // escapes round-trip
    assert(rows(1).getString(2) === "42")        // numbers surface as strings
    assert(rows(2).getString(2) === "3.5")
    assert(rows(2).isNullAt(3))                  // omitted cell → null
    assert(rows(3).isNullAt(1) && rows(3).getString(3) === "end")
  }

  test("sheet name with quotes/ampersands survives attribute escaping") {
    val f = Files.createTempDirectory("graft_xlsx").resolve("q.xlsx").toString
    Xlsx.write(f, Seq[Seq[Any]](Seq("a"), Seq("1")), sheetName = """Q1 "final" & more""")
    val df = Xlsx.read(spark, f)   // parse succeeds → attribute was escaped
    assert(df.count() === 2)
  }

  test("sparse rows: missing cells in the middle keep column alignment") {
    val f = Files.createTempDirectory("graft_xlsx").resolve("s.xlsx").toString
    Xlsx.write(f, Seq[Seq[Any]](Seq("a", "b", "c"), Seq("x", null, "z")))
    val r = Xlsx.read(spark, f).orderBy("__idx").collect()(1)
    assert(r.getString(1) === "x" && r.isNullAt(2) && r.getString(3) === "z")
  }

  test("rich-text runs concatenate; phonetic guides are excluded (reader)") {
    // hand-build a workbook with a multi-run shared string, a furigana
    // (<rPh>) run, and a multi-run inline cell — the shapes real Excel
    // emits for partially-styled and Japanese-annotated cells
    val dir = Files.createTempDirectory("graft_xlsx")
    val f = dir.resolve("rt.xlsx").toString
    Xlsx.write(f, Seq[Seq[Any]](Seq("placeholder")))
    // rewrite the payload with hand-crafted parts: zip surgery via Java
    val src = new java.util.zip.ZipFile(f)
    val names = {
      val es = src.entries(); val b = scala.collection.mutable.ArrayBuffer.empty[String]
      while (es.hasMoreElements) b += es.nextElement().getName
      src.close(); b.toSeq
    }
    assert(names.contains("xl/worksheets/sheet1.xml"))
    val sheetXml =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
      """<row r="1">""" +
      """<c r="A1" t="s"><v>0</v></c>""" +
      """<c r="B1" t="s"><v>1</v></c>""" +
      """<c r="C1" t="inlineStr"><is><r><t>Hello </t></r><r><t>World</t></r></is></c>""" +
      """</row></sheetData></worksheet>"""
    val shared =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="2" uniqueCount="2">""" +
      """<si><r><t>Multi </t></r><r><t>Run</t></r></si>""" +
      """<si><t>東京</t><rPh sb="0" eb="2"><t>トウキョウ</t></rPh><phoneticPr fontId="1"/></si>""" +
      """</sst>"""
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
      """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
      """<Default Extension="xml" ContentType="application/xml"/>""" +
      """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
      """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
      """<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>""" +
      """</Types>"""
    val f2 = dir.resolve("rt2.xlsx").toString
    val out = new java.util.zip.ZipOutputStream(
      java.nio.file.Files.newOutputStream(java.nio.file.Paths.get(f2)))
    val srcZip = new java.util.zip.ZipFile(f)
    try {
      val es = srcZip.entries()
      while (es.hasMoreElements) {
        val e = es.nextElement()
        val content = e.getName match {
          case "xl/worksheets/sheet1.xml" => sheetXml.getBytes("UTF-8")
          case "[Content_Types].xml" => contentTypes.getBytes("UTF-8")
          case _ => srcZip.getInputStream(e).readAllBytes()
        }
        out.putNextEntry(new java.util.zip.ZipEntry(e.getName))
        out.write(content)
        out.closeEntry()
      }
      out.putNextEntry(new java.util.zip.ZipEntry("xl/sharedStrings.xml"))
      out.write(shared.getBytes("UTF-8"))
      out.closeEntry()
    } finally { out.close(); srcZip.close() }

    val r = Xlsx.read(spark, f2).collect()(0)
    assert(r.getString(1) === "Multi Run", "shared-string runs must concatenate")
    assert(r.getString(2) === "東京", "phonetic runs must be excluded")
    assert(r.getString(3) === "Hello World", "inline runs must concatenate")
  }

  test("non-finite doubles write as inline strings, not invalid <v> numbers") {
    val f = Files.createTempDirectory("graft_xlsx").resolve("nf.xlsx").toString
    Xlsx.write(f, Seq[Seq[Any]](Seq(1.5, Double.NaN, Double.PositiveInfinity)))
    val r = Xlsx.read(spark, f).collect()(0)
    assert(r.getString(1) === "1.5")
    assert(r.getString(2) === "NaN")
    assert(r.getString(3) === "Infinity")
    // the workbook contains no numeric <v>NaN</v> cell
    val zf = new java.util.zip.ZipFile(f)
    val sheet = try new String(zf.getInputStream(
      zf.getEntry("xl/worksheets/sheet1.xml")).readAllBytes(), "UTF-8")
    finally zf.close()
    assert(!sheet.contains("<v>NaN</v>") && !sheet.contains("<v>Infinity</v>"))
  }
}
