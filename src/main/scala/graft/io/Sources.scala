package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}
import java.nio.file.{Files, Paths}

/** Sources (SURVEY.md §2.1 S1–S6).
  *
  * Reference sites: xlsx read dag1.py:24; CSV reads dag1.py:45,50; chardet
  * charset sniff dag1.py:54-58; JSON XCom decode dag1.py:65-68; JDBC scans
  * finalprojectpandasprofiling.py:33-38 and finalprojectapi.py:24-32.
  *
  * Scale notes: CSV/JSON/JDBC scans are Spark-native (splittable,
  * predicate/limit pushdown via Catalyst). Charset detection reads only a
  * bounded prefix of ONE file driver-side. The xlsx reader is driver-side by
  * design: its reference use is a 57-row spreadsheet — a control-plane
  * input, not a fact table; big data arrives via CSV/parquet/JDBC. */
object Sources {

  /** S2 — CSV scan with header + schema inference (dag1.py:45,50). */
  def csv(spark: SparkSession, path: String, header: Boolean = true,
          inferSchema: Boolean = true, encoding: String = "UTF-8"): DataFrame = {
    // Spark 4 restricts CSV charsets to a short allowlist unless the legacy
    // java-charsets conf is on; windows-1252 (the reference's min-wage file,
    // dag1.py:55-58) needs it.
    if (!Set("utf-8", "us-ascii", "iso-8859-1", "utf-16", "utf-16be",
        "utf-16le", "utf-32").contains(encoding.toLowerCase))
      spark.conf.set("spark.sql.legacy.javaCharsets", "true")
    spark.read
      .option("header", header)
      .option("inferSchema", inferSchema)
      .option("encoding", encoding)
      .csv(path)
  }

  /** S3 — charset auto-detection replacing chardet (dag1.py:54-58): strict
    * UTF-8 decode of a bounded prefix; on failure fall back to
    * windows-1252 (a superset of latin-1 that decodes any byte sequence —
    * matches the reference data, whose only non-ASCII byte is 0x96). */
  def detectCharset(path: String, probeBytes: Int = 1 << 20): String = {
    val all = Files.readAllBytes(Paths.get(path))
    val probe = java.util.Arrays.copyOf(all, math.min(all.length, probeBytes))
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try { dec.decode(java.nio.ByteBuffer.wrap(probe)); "UTF-8" }
    catch { case _: java.nio.charset.CharacterCodingException => "windows-1252" }
  }

  /** S3 — CSV scan with sniffed charset. */
  def csvDetect(spark: SparkSession, path: String, header: Boolean = true): DataFrame =
    csv(spark, path, header = header, encoding = detectCharset(path))

  /** S4 — decode a JSON-serialized table (the XCom hand-off analog,
    * dag1.py:65-68). Schema is re-inferred, mirroring pandas read_json. */
  def jsonTable(spark: SparkSession, jsonLines: org.apache.spark.sql.Dataset[String]): DataFrame =
    spark.read.json(jsonLines)

  /** Raw line scan with a stable per-line index (file order), the basis for
    * positional ops R1/R2/R4 on headerless exports. zipWithIndex assigns
    * ids in partition-then-offset order, which for file sources is exactly
    * file order. */
  def indexedLines(spark: SparkSession, path: String, encoding: String = "UTF-8"): DataFrame = {
    import spark.implicits._
    val raw: Seq[String] = {
      // Bounded driver-side read for non-UTF-8 single files (Spark's text
      // source is UTF-8-only); UTF-8 paths go through the distributed reader.
      if (encoding.equalsIgnoreCase("UTF-8")) null else
        new String(Files.readAllBytes(Paths.get(path)), Charset.forName(encoding))
          .split("\r?\n", -1).toSeq
    }
    if (raw == null)
      spark.read.textFile(path).rdd.zipWithIndex()
        .map { case (l, i) => (i, l) }.toDF("__idx", "line")
    else
      raw.zipWithIndex.map { case (l, i) => (i.toLong, l) }.toDF("__idx", "line")
  }

  /** S5 — JDBC full-table scan (finalprojectpandasprofiling.py:33-38). */
  def jdbc(spark: SparkSession, url: String, table: String,
           props: Map[String, String] = Map.empty): DataFrame = {
    val p = new java.util.Properties()
    props.foreach { case (k, v) => p.setProperty(k, v) }
    spark.read.jdbc(url, table, p)
  }

  /** S6 — JDBC scan with a row limit (the serving API's `LIMIT n`,
    * finalprojectapi.py:24). Catalyst pushes the limit into the remote
    * query (JDBC pushDownLimit), so only n rows cross the wire. */
  def jdbcLimit(spark: SparkSession, url: String, table: String, limit: Int,
                props: Map[String, String] = Map.empty): DataFrame =
    jdbc(spark, url, table, props).limit(limit)
}
