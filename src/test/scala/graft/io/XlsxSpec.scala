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
}
