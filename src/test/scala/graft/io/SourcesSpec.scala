package graft.io

import graft.SparkSpec
import java.nio.charset.Charset
import java.nio.file.Files

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("detectCharset: strict-UTF-8 probe, windows-1252 fallback on 0x96") {
    val utf8 = Files.createTempFile("graft_cs", ".csv")
    Files.writeString(utf8, "a,b\n1,café\n")
    assert(Sources.detectCharset(utf8.toString) === "UTF-8")
    val w1252 = Files.createTempFile("graft_cs", ".csv")
    Files.write(w1252, "a,b\n1,1968–note\n".getBytes(Charset.forName("windows-1252")))
    assert(Sources.detectCharset(w1252.toString) === "windows-1252")
  }

  test("indexedLines: UTF-8 path is distributed, index = file order") {
    val f = Files.createTempFile("graft_lines", ".txt")
    Files.writeString(f, "first\nsecond\nthird")
    val rows = Sources.indexedLines(spark, f.toString)
      .orderBy("__idx").as[(Long, String)].collect()
    assert(rows.sameElements(Array((0L, "first"), (1L, "second"), (2L, "third"))))
  }

  test("indexedLines: non-UTF-8 path decodes driver-side with same contract") {
    val f = Files.createTempFile("graft_lines", ".txt")
    Files.write(f, "one–dash\nplain".getBytes(Charset.forName("windows-1252")))
    val rows = Sources.indexedLines(spark, f.toString, "windows-1252")
      .orderBy("__idx").as[(Long, String)].collect()
    assert(rows.sameElements(Array((0L, "one–dash"), (1L, "plain"))))
  }

  test("jsonTable re-infers dtypes like pandas read_json (int widens to long)") {
    val json = Seq((1, "x"), (2, "y")).toDF("k", "v").toJSON
    val out = Sources.jsonTable(spark, json)
    assert(out.schema("k").dataType.typeName === "long")
    assert(out.orderBy("k").as[(Long, String)].collect()
      .sameElements(Array((1L, "x"), (2L, "y"))))
  }
}
