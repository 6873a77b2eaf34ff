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

  test("detectCharset reads only the probe prefix on files larger than it") {
    val f = Files.createTempFile("graft_big", ".csv")
    val out = Files.newOutputStream(f)
    val line = "0123456789abcde\n".getBytes("UTF-8")
    (0 until 512).foreach(_ => out.write(line)) // 8 KiB of clean UTF-8
    out.write(0x96) // a windows-1252 byte AFTER the probe window
    out.close()
    assert(Sources.detectCharset(f.toString, probeBytes = 4096) === "UTF-8")
    // and with the bad byte inside the window, the fallback still fires
    assert(Sources.detectCharset(f.toString, probeBytes = 16 * 1024) === "windows-1252")
  }

  test("detectCharset: probe boundary cutting a multi-byte char is not malformed") {
    val f = Files.createTempFile("graft_cut", ".csv")
    Files.write(f, ("a" * 4095 + "é" + "more text").getBytes("UTF-8"))
    // probe = 4096 ends between é's two bytes
    assert(Sources.detectCharset(f.toString, probeBytes = 4096) === "UTF-8")
  }

  test("detectCharset: file EXACTLY probe-sized with a trailing bad byte is not trimmed") {
    // the boundary trim must fire only when the file continues past the
    // probe; a complete file's trailing 0x96 is real evidence of w-1252
    val f = Files.createTempFile("graft_exact", ".csv")
    Files.write(f, ("a" * 4095).getBytes("UTF-8") ++ Array(0x96.toByte))
    assert(Files.size(f) === 4096)
    assert(Sources.detectCharset(f.toString, probeBytes = 4096) === "windows-1252")
  }

  test("detectCharset honors UTF-16/32 BOMs before the content probe") {
    // chardet generality (dag1.py:55-58): a UTF-16LE file read as UTF-8
    // fails the strict probe and would mis-fall-back to windows-1252;
    // the BOM is authoritative. LE and BE both map to Java's
    // endian-autodetecting decoder so the BOM is consumed, not leaked.
    def bomFile(enc: String, bom: Array[Int]): String = {
      val f = Files.createTempFile("graft_bom", ".csv")
      Files.write(f, bom.map(_.toByte) ++ "a,b\n1,x\n".getBytes(Charset.forName(enc)))
      f.toString
    }
    assert(Sources.detectCharset(bomFile("UTF-16LE", Array(0xFF, 0xFE))) === "UTF-16")
    assert(Sources.detectCharset(bomFile("UTF-16BE", Array(0xFE, 0xFF))) === "UTF-16")
    assert(Sources.detectCharset(
      bomFile("UTF-32LE", Array(0xFF, 0xFE, 0x00, 0x00))) === "UTF-32")
    assert(Sources.detectCharset(
      bomFile("UTF-32BE", Array(0x00, 0x00, 0xFE, 0xFF))) === "UTF-32")
    // UTF-8 BOM is still UTF-8 (the probe alone would also say so, but the
    // BOM branch must not misroute it to UTF-16/32)
    val f = Files.createTempFile("graft_bom8", ".csv")
    Files.write(f, Array(0xEF, 0xBB, 0xBF).map(_.toByte) ++ "a,b\n".getBytes("UTF-8"))
    assert(Sources.detectCharset(f.toString) === "UTF-8")
    // and the BOM'd charset round-trips through the detected decoder with
    // the BOM consumed — first char of the decoded text is 'a', not ZWNBSP
    val le = bomFile("UTF-16LE", Array(0xFF, 0xFE))
    val decoded = new String(Files.readAllBytes(java.nio.file.Paths.get(le)),
      Charset.forName(Sources.detectCharset(le)))
    assert(decoded.startsWith("a,b"), s"BOM leaked: ${decoded.take(3).map(_.toInt)}")
  }

  test("detectCharset: scored single-byte ladder — latin-2 text " +
      "out-scores the cp1252 default; cp1252/latin-1 ties keep cp1252") {
    def fixture(text: String, enc: String): String = {
      val f = Files.createTempFile("graft_sbcs", ".csv")
      Files.write(f, s"a,b\n1,$text\n".getBytes(Charset.forName(enc)))
      f.toString
    }
    // Polish under ISO-8859-2: ż=0xBF ó=0xF3 ł=0xB3 ć=0xE6 ę=0xEA ą=0xB1
    // ś=0xB6 ź=0xAC ń=0xF1 — the 0xA1-0xBF bytes are LETTERS in latin-2
    // but symbols (¿ ³ ± ¶ ¬) in latin-1/cp1252, so latin-2 strictly
    // out-scores and wins despite its last-place tie-break
    val pl = fixture("zażółć gęślą " +
      "jaźń łąka żółw", "ISO-8859-2")
    assert(Sources.detectCharset(pl) === "ISO-8859-2")
    // French accents (é è ç à) occupy 0xC0-0xFF — letters under ALL
    // three candidates → scores tie → precedence keeps windows-1252
    // (the reference's chardet answer and the round-16 behavior)
    val fr = fixture("résumé à côté façon",
      "ISO-8859-1")
    assert(Sources.detectCharset(fr) === "windows-1252")
    // cp1252 typographic punctuation (0x96 en-dash, 0x93/0x94 curly
    // quotes) is a C1 control under latin-1/2 → cp1252 strictly wins
    val dash = fixture("1968–note “quoted”", "windows-1252")
    assert(Sources.detectCharset(dash) === "windows-1252")
    // and the detected charset round-trips the Polish text losslessly
    val txt = new String(Files.readAllBytes(java.nio.file.Paths.get(pl)),
      Charset.forName(Sources.detectCharset(pl)))
    assert(txt.contains("zażółć"),
      s"latin-2 text mangled: $txt")
  }

  test("detectCharset: BOM-less UTF-16 found by null pattern, w-1252 not misrouted") {
    // ASCII content encoded UTF-16 without a BOM: fails the UTF-8 probe
    // (NULs) and must resolve by the alternating-null heuristic, per
    // endianness — not fall back to windows-1252.
    val le = Files.createTempFile("graft_nb16", ".csv")
    Files.write(le, "a,b\n1,hello world\n2,plain ascii\n".getBytes("UTF-16LE"))
    assert(Sources.detectCharset(le.toString) === "UTF-16LE")
    val be = Files.createTempFile("graft_nb16", ".csv")
    Files.write(be, "a,b\n1,hello world\n2,plain ascii\n".getBytes("UTF-16BE"))
    assert(Sources.detectCharset(be.toString) === "UTF-16BE")
    // windows-1252 text has no NULs → heuristic declines, fallback holds
    val w = Files.createTempFile("graft_nb16", ".csv")
    Files.write(w, "a,b\n1,1968–note\n".getBytes(Charset.forName("windows-1252")))
    assert(Sources.detectCharset(w.toString) === "windows-1252")
  }

  test("csvDetect reads UTF-16 CSVs correctly (transcode path, BOM'd and BOM-less)") {
    // Hadoop's line reader splits on raw 0x0A bytes, which shreds UTF-16
    // characters (verified: native read returns garbage) — the reader must
    // go through the UTF-8 transcode. Values, not just schema, must
    // round-trip; the BOM must not leak into the header.
    def roundTrip(bytes: Array[Byte]): Seq[Seq[Any]] = {
      val f = Files.createTempFile("graft_u16csv", ".csv")
      Files.write(f, bytes)
      Sources.csvDetect(spark, f.toString).orderBy("a")
        .collect().map(_.toSeq).toSeq
    }
    val expected = Seq(Seq(1, "hello"), Seq(2, "wörld"))
    val csvText = "a,b\n1,hello\n2,wörld\n"
    assert(roundTrip(csvText.getBytes("UTF-16LE")) === expected)      // BOM-less LE
    assert(roundTrip(csvText.getBytes("UTF-16BE")) === expected)      // BOM-less BE
    assert(roundTrip(Array(0xFF.toByte, 0xFE.toByte) ++
      csvText.getBytes("UTF-16LE")) === expected)                     // BOM'd
  }

  test("indexedLines: UTF-8 path is distributed, index = file order") {
    val f = Files.createTempFile("graft_lines", ".txt")
    Files.writeString(f, "first\nsecond\nthird")
    val rows = Sources.indexedLines(spark, f.toString)
      .orderBy("__idx").as[(Long, String)].collect()
    assert(rows.sameElements(Array((0L, "first"), (1L, "second"), (2L, "third"))))
  }

  test("indexedLines: non-UTF-8 path transcodes streaming, same contract") {
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

  test("jdbc scan pushes filters into the remote query (PushedFilters in plan)") {
    // the profiling-over-JDBC path: a filtered scan must ship the predicate
    // to the database, not pull the whole table and filter in Spark
    System.setProperty("derby.system.home", System.getProperty("java.io.tmpdir"))
    val url = "jdbc:derby:memory:graft_pushdown;create=true"
    Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate("CREATE TABLE t (id INT, v DOUBLE)")
      (1 to 20).foreach(i => st.executeUpdate(s"INSERT INTO t VALUES ($i, $i.5)"))
      st.close()
    } finally conn.close()

    val filtered = Sources.jdbc(spark, url, "t").filter($"id" > 15)
    assert(filtered.count() === 5)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.replaceAll("\\s", "").contains("GreaterThan(ID,15)"),
      s"filter must reach the JDBC relation as a pushed filter:\n$plan")
    // column pruning reaches the remote query too: a 1-column projection
    // must not list the other column in the relation's read schema
    val pruned = Sources.jdbc(spark, url, "t").select("v")
    val prunedPlan = pruned.queryExecution.executedPlan.toString
    assert(prunedPlan.contains("[V#") || prunedPlan.contains("ReadSchema: struct<V:double>"),
      s"projection must prune to V only:\n$prunedPlan")
    assert(!prunedPlan.replaceAll("\\s", "").matches("(?s).*JDBCRelation.*ID.*"),
      s"pruned JDBC scan must not read ID:\n$prunedPlan")
  }

  test("csvWithCorruptCapture: bad rows quarantine with raw text, good rows stay typed") {
    val f = Files.createTempFile("graft_corrupt", ".csv")
    Files.writeString(f, "id,v\n1,1.5\nnot_an_int,oops\n3,2.25\n")
    val out = Sources.csvWithCorruptCapture(spark, f.toString, "id INT, v DOUBLE")
    val good = out.filter($"_corrupt".isNull).orderBy("id")
      .select("id", "v").as[(Int, Double)].collect()
    assert(good.sameElements(Array((1, 1.5), (3, 2.25))))
    // Spark disallows queries referencing ONLY the corrupt column of a raw
    // scan — quarantine reads keep a data column alongside (documented)
    val bad = out.filter($"_corrupt".isNotNull)
      .select("id", "_corrupt").as[(Option[Int], String)].collect()
    assert(bad.sameElements(Array((None, "not_an_int,oops"))))
    // the quarantine split loses nothing: good + bad = all lines
    assert(out.count() === 3)
  }
}
