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

  /** Spark 4 restricts CSV charsets to a short allowlist unless the legacy
    * java-charsets conf is on; windows-1252 (the reference's min-wage file,
    * dag1.py:55-58) needs it. Shared by the batch and streaming readers so
    * the allowlist lives in exactly one place. */
  def ensureCharsetReadable(spark: SparkSession, encoding: String): Unit =
    if (!Set("utf-8", "us-ascii", "iso-8859-1", "utf-16", "utf-16be",
        "utf-16le", "utf-32").contains(encoding.toLowerCase))
      spark.conf.set("spark.sql.legacy.javaCharsets", "true")

  /** Charsets whose newline is NOT the single byte 0x0A: Hadoop's line
    * reader splits on raw 0x0A bytes, so a UTF-16/32 file read natively
    * shreds characters across line boundaries (and Java's BOM-autodetect
    * decoders only see the BOM on the FIRST line) — verified garbage, not
    * a hypothetical. These go through the streaming transcode instead. */
  private[graft] def needsTranscode(encoding: String): Boolean =
    encoding.toUpperCase.startsWith("UTF-16") ||
      encoding.toUpperCase.startsWith("UTF-32")

  /** S2 — CSV scan with header + schema inference (dag1.py:45,50).
    * ASCII-newline charsets (UTF-8, latin-1, windows-1252…) use Spark's
    * distributed reader directly; UTF-16/32 are stream-transcoded to a
    * UTF-8 temp first (see [[transcodeToUtf8]]) because Hadoop's 0x0A
    * line splitting is incorrect for them. */
  def csv(spark: SparkSession, path: String, header: Boolean = true,
          inferSchema: Boolean = true, encoding: String = "UTF-8"): DataFrame = {
    val (readPath, readEnc) =
      if (needsTranscode(encoding)) (transcodeToUtf8(path, encoding), "UTF-8")
      else (path, encoding)
    ensureCharsetReadable(spark, readEnc)
    spark.read
      .option("header", header)
      .option("inferSchema", inferSchema)
      .option("encoding", readEnc)
      .csv(readPath)
  }

  /** XML scan — Spark 4's NATIVE xml datasource (`rowTag` selects the
    * repeating record element; schema inferred like csv/json). Splittable
    * and distributed like the other file sources; attribute columns
    * surface with the `_` prefix per the datasource's convention. */
  def xml(spark: SparkSession, path: String, rowTag: String,
          inferSchema: Boolean = true): DataFrame =
    spark.read.format("xml")
      .option("rowTag", rowTag)
      .option("inferSchema", inferSchema)
      .load(path)

  /** CSV scan with malformed-row CAPTURE (production ingest contract): rows
    * that don't parse against `schemaDdl` land in a `_corrupt` column with
    * their raw text instead of poisoning the job (PERMISSIVE) or silently
    * vanishing (DROPMALFORMED) — the quarantine-and-audit shape every real
    * feed needs. Returns the typed frame; `df.filter($"_corrupt".isNotNull)`
    * is the quarantine split. Schema is explicit by design: corrupt-record
    * capture composes with inference badly (inference reads bad rows as
    * strings and never flags them). Spark caveat: a query referencing ONLY
    * `_corrupt` over the raw scan is disallowed
    * (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — keep a data column in quarantine
    * reads, or cache the frame first. */
  def csvWithCorruptCapture(spark: SparkSession, path: String,
                            schemaDdl: String, header: Boolean = true,
                            encoding: String = "UTF-8"): DataFrame = {
    // UTF-16/32 must take the same transcode path as csv(): Hadoop's 0x0A
    // line splitting shreds them, which would quarantine EVERY row instead
    // of the genuinely malformed ones
    val (readPath, readEnc) =
      if (needsTranscode(encoding)) (transcodeToUtf8(path, encoding), "UTF-8")
      else (path, encoding)
    ensureCharsetReadable(spark, readEnc)
    spark.read
      .option("header", header)
      .option("encoding", readEnc)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .schema(schemaDdl + ", _corrupt STRING")
      .csv(readPath)
  }

  /** Stream-transcode a file to a UTF-8 temp file: O(64 KiB) driver heap,
    * never the whole file; BOM-autodetecting charsets ("UTF-16"/"UTF-32")
    * consume the BOM so it never reaches the UTF-8 copy. Deterministic
    * per-source temp name: repeated calls over the same file overwrite one
    * transcode instead of accumulating copies for the JVM lifetime. Keyed
    * by a full digest of the ABSOLUTE path — a 32-bit hashCode can collide
    * across distinct paths, and because readers re-read the temp file
    * lazily, a collision would make an earlier frame read the wrong
    * file's contents. On a real cluster the transcode target belongs on
    * shared storage; the driver-side IO pass is the unavoidable cost of a
    * charset Spark cannot scan.
    *
    * The digest keys on (path, ENCODING): the same file read under two
    * encodings must not share a temp (the second call would silently
    * change the bytes under the first, lazily-evaluated frame). The
    * transcode lands in a unique scratch file first and MOVEs into place
    * atomically, so a concurrent reader of the final path never observes
    * a half-written transcode. */
  private[io] def transcodeToUtf8(path: String, encoding: String): String = {
    val abs = Paths.get(path).toAbsolutePath.normalize.toString
    val key = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s"$abs\u0000${encoding.toUpperCase}".getBytes(StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString.take(32)
    val tmp = Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_transcode_$key.txt")
    tmp.toFile.deleteOnExit()
    val scratch = Files.createTempFile("graft_transcode_part", ".tmp")
    val in = new java.io.InputStreamReader(
      Files.newInputStream(Paths.get(path)), Charset.forName(encoding))
    val out = Files.newBufferedWriter(scratch, StandardCharsets.UTF_8)
    try {
      val buf = new Array[Char](1 << 16)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    } finally { in.close(); out.close() }
    Files.move(scratch, tmp,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    tmp.toString
  }

  /** Byte-order-mark sniff: the unambiguous prefix signatures from the
    * Unicode standard (§23.8). UTF-32 must be tested before UTF-16 —
    * FF FE 00 00 begins with FF FE, and a UTF-16 read of a UTF-32LE file
    * would interleave NUL characters into every line. BOM'd 16/32-bit
    * files map to Java's endian-autodetecting decoders ("UTF-16",
    * "UTF-32"), which consume the BOM; the endian-specific charset names
    * would leak it into the first field as a ZWNBSP. Returns None when no
    * BOM is present (then content probing decides). */
  private def bomCharset(b: Array[Byte]): Option[String] = {
    def at(i: Int, v: Int) = b.length > i && (b(i) & 0xFF) == v
    if (at(0, 0x00) && at(1, 0x00) && at(2, 0xFE) && at(3, 0xFF)) Some("UTF-32")
    else if (at(0, 0xFF) && at(1, 0xFE) && at(2, 0x00) && at(3, 0x00)) Some("UTF-32")
    else if (at(0, 0xEF) && at(1, 0xBB) && at(2, 0xBF)) Some("UTF-8")
    else if (at(0, 0xFE) && at(1, 0xFF)) Some("UTF-16")
    else if (at(0, 0xFF) && at(1, 0xFE)) Some("UTF-16")
    else None
  }

  /** S3 — charset auto-detection replacing chardet (dag1.py:54-58), in
    * precedence order: explicit BOM (UTF-8/16/32), BOM-less UTF-16 by the
    * alternating-NUL pattern, strict UTF-8 decode of a bounded prefix,
    * then windows-1252 (a superset of latin-1 that decodes any byte
    * sequence — matches the reference data, whose only non-ASCII byte is
    * 0x96). */
  def detectCharset(path: String, probeBytes: Int = 1 << 20): String = {
    // Stream at most probeBytes+1 — never the whole file — so sniffing a
    // 100 GB CSV costs 1 MiB of driver heap, not an OOM. The +1 sentinel
    // byte distinguishes "file is exactly probeBytes" (whole file read, no
    // boundary cut) from "file continues past the probe".
    val in = Files.newInputStream(Paths.get(path))
    val raw = try in.readNBytes(probeBytes + 1) finally in.close()
    bomCharset(raw)
      .orElse(probeUtf16(raw, math.min(raw.length, probeBytes)))
      .getOrElse(probeUtf8(raw, probeBytes))
  }

  /** BOM-less UTF-16 content heuristic (chardet's null-pattern check):
    * ASCII-dominant UTF-16 text has a NUL in every other byte — high byte
    * 0x00 on odd positions for LE, even for BE. This must run BEFORE the
    * strict UTF-8 probe: U+0000 is a perfectly valid UTF-8 code point, so
    * a UTF-16LE ASCII file DECODES as "UTF-8" — but genuine UTF-8 text
    * never contains NULs at all, let alone >60% one-sided, so precedence
    * is safe. */
  private def probeUtf16(b: Array[Byte], len: Int): Option[String] = {
    if (len < 16) None
    else {
      val n = len - (len % 2)
      var evenNul = 0; var oddNul = 0
      var i = 0
      while (i < n) {
        if (b(i) == 0) { if (i % 2 == 0) evenNul += 1 else oddNul += 1 }
        i += 1
      }
      val half = n / 2
      if (oddNul > half * 0.6 && evenNul < half * 0.1) Some("UTF-16LE")
      else if (evenNul > half * 0.6 && oddNul < half * 0.1) Some("UTF-16BE")
      else None
    }
  }

  /** Scored single-byte fallback (chardet's SBCS ladder, narrowed to
    * the candidates this pipeline's data actually presents): decode the
    * probe under each candidate and score its NON-ASCII characters —
    * letters are evidence (real text's high bytes are overwhelmingly
    * accented letters), control characters are strong counter-evidence
    * (ISO-8859-1/2 map 0x80–0x9F to C1 controls where windows-1252 puts
    * typographic punctuation — the reference file's own 0x96 en-dash;
    * windows-1252's five undefined bytes decode to controls too, so
    * they penalize it symmetrically). `maxBy` keeps the FIRST maximum,
    * so ties follow the precedence order: byte streams that decode
    * identically under cp1252 and latin-1 (any text without C1-range
    * bytes) still report windows-1252 — the reference's chardet answer
    * for its file — and ISO-8859-2 wins only when its letter assignments
    * in 0xA1–0xBF (Ł ą ż Š …, symbols in latin-1) strictly out-score. */
  private val singleByteCandidates =
    Seq("windows-1252", "ISO-8859-1", "ISO-8859-2")
  private def scoreSingleByte(b: Array[Byte], len: Int): String =
    singleByteCandidates.maxBy { cs =>
      val txt = new String(b, 0, len, Charset.forName(cs))
      var score = 0L
      var i = 0
      while (i < txt.length) {
        val c = txt.charAt(i)
        if (c >= 0x80) {
          if (Character.isLetter(c)) score += 2
          else if (Character.isISOControl(c)) score -= 4
          // non-letter printables (±, §, «, …) are neutral: legitimate
          // in any of the three, diagnostic of none
        }
        i += 1
      }
      score
    }

  /** Strict-decode content probe (no BOM, not UTF-16-patterned): UTF-8
    * if the prefix decodes cleanly, else the scored single-byte
    * fallback. */
  private def probeUtf8(raw: Array[Byte], probeBytes: Int): String = {
    val truncated = raw.length > probeBytes
    val probe = if (truncated) java.util.Arrays.copyOf(raw, probeBytes) else raw
    // Only a truncated probe can cut a multi-byte UTF-8 sequence at the
    // boundary; trim the dangling partial char so the cut doesn't
    // masquerade as malformed input. A complete file is decoded verbatim —
    // trailing high bytes there are genuine evidence of non-UTF-8.
    val safeLen = if (!truncated) probe.length else {
      var end = probe.length
      while (end > math.max(0, probe.length - 4) && (probe(end - 1) & 0xC0) == 0x80) end -= 1
      if (end > 0 && (probe(end - 1) & 0x80) != 0) end - 1 else end
    }
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try { dec.decode(java.nio.ByteBuffer.wrap(probe, 0, safeLen)); "UTF-8" }
    catch {
      case _: java.nio.charset.CharacterCodingException =>
        scoreSingleByte(probe, safeLen)
    }
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
    // SINGLE-FILE contract, enforced: over multiple files Spark's scan
    // orders splits by descending file SIZE, not file order, so __idx
    // would number the biggest file's lines first and the positional ops
    // built on it (R1/R2/R4) would slice the wrong rows — fail fast
    // instead of returning silently misnumbered lines.
    // Resolve through Hadoop's FileSystem (not java.nio, which only sees
    // the local FS): a directory on hdfs:// or s3a:// must hit the same
    // fail-fast, not silently bypass it.
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!(fs.exists(p) && fs.getFileStatus(p).isDirectory),
      s"indexedLines reads ONE file (its row order IS the contract); " +
        s"'$path' is a directory — concatenate parts first or index per file")
    // Spark's text source is UTF-8-only, so non-UTF-8 files are
    // stream-transcoded to a UTF-8 temp file (O(64 KiB) driver heap, never
    // the whole file) and both encodings then share the distributed reader
    // — identical line-splitting semantics either way. On a real cluster
    // the transcode target belongs on shared storage; the driver-side IO
    // pass is the unavoidable cost of a charset Spark cannot scan.
    val readPath =
      if (encoding.equalsIgnoreCase("UTF-8")) path
      else transcodeToUtf8(path, encoding)
    spark.read.textFile(readPath).rdd.zipWithIndex()
      .map { case (l, i) => (i, l) }.toDF("__idx", "line")
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
