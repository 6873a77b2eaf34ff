package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar cleaning expressions (SURVEY.md §2.5 F1–F10).
  *
  * Reference behavior: `final project cleaning & upload dag 1.py` — row-wise
  * pandas lambdas (dag1.py:39-40,88,98,103,106,109,117-118,153). Here each is
  * a composed Catalyst expression: codegen'd, null-safe, zero per-row Scala
  * closures, so every one of them stays inside WholeStageCodegen at scale.
  */
object Exprs {

  /** F1 — zero-pad a numeric FIPS-style key to `width` digits for
    * presentation (dag1.py:39-40). Canonical key stays integer (SURVEY §7.4);
    * this is display-layer only. */
  def fipsPad(c: Column, width: Int = 5): Column =
    lpad(c.cast(StringType), width, "0")

  /** F2+F3 — parse a formatted currency string ("$53,990", "(NA)") to double.
    * `$`/`,` stripped (dag1.py:88), non-numeric → null like pandas
    * `errors='coerce'` (dag1.py:103). try_cast keeps the semantics regardless
    * of the session's ANSI posture. */
  def moneyToDouble(c: Column): Column =
    regexp_replace(c, "[$,]", "").try_cast(DoubleType)

  /** F3 — lenient cast: invalid input → null, never a runtime error
    * (pandas `errors='coerce'`, dag1.py:103,118). */
  def tryDouble(c: Column): Column = c.try_cast(DoubleType)

  /** F3 variant for integers. */
  def tryLong(c: Column): Column = c.try_cast(LongType)

  /** F4 — strip embedded double-quotes (GeoFIPS ` "00000"`, dag1.py:98). */
  def stripQuotes(c: Column): Column = translate(c, "\"", "")

  /** F6 — remove every occurrence of the given literal chars
    * (`*` in GeoName, dag1.py:117). */
  def stripChars(c: Column, chars: String): Column = translate(c, chars, "")

  /** F5+F4+F6 composite used on GeoName-like columns: drop chars then trim. */
  def cleanName(c: Column, chars: String = "*\""): Column =
    trim(translate(c, chars, ""))

  /** F8 — ratio with pandas-mean parity: 0/0 yields NaN for doubles, and
    * pandas `mean` skips NaN while Spark `avg` only skips null — so NaN is
    * normalized to null here (dag1.py:153 + dag1.py:164; SURVEY §7.4). */
  def ratioNanNull(num: Column, den: Column): Column = {
    // try_divide: x/0 → null under any ANSI posture (plain `/` throws with
    // ANSI on, Spark 4's default); pandas 0/0-NaN rows are likewise skipped
    // by mean, so null is the faithful aggregate-visible value.
    val r = try_divide(num.cast(DoubleType), den.cast(DoubleType))
    when(isnan(r), lit(null).cast(DoubleType)).otherwise(r)
  }

  /** A2 helper — NaN → null so downstream avg matches pandas mean. */
  def nanToNull(c: Column): Column =
    when(isnan(c), lit(null).cast(DoubleType)).otherwise(c)

  /** F11/K2 — Spark type → portable ANSI DDL type name
    * (mirrors map_dtype_to_sql, dag1.py:216-226). */
  def ddlType(dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType => "INTEGER"
    case LongType                           => "BIGINT"
    case FloatType | DoubleType             => "DOUBLE PRECISION"
    case _: DecimalType                     => "DECIMAL"
    case BooleanType                        => "BOOLEAN"
    case DateType                           => "DATE"
    case TimestampType | TimestampNTZType   => "TIMESTAMP"
    case _                                  => "TEXT"
  }

  /** F13 — parse human-suffixed magnitudes ("1.2K", "3M", "4.5B",
    * "650", with optional sign and surrounding whitespace) to a DOUBLE —
    * the scraped-table sibling of [[currencyToDouble]]: spreadsheet and
    * crawl sources abbreviate large counts, and a lenient cast silently
    * nulls every suffixed cell. Case-insensitive suffix; anything not
    * matching the strict NUMBER+SUFFIX shape is NULL (the try_cast
    * posture — cleaning pipelines quarantine, not crash). Map-only,
    * codegen'd regex. */
  def parseHumanNumber(c: Column): Column = {
    val t = upper(trim(c))
    // \A..\z, not ^..$: Java's '$' matches BEFORE a trailing newline
    // (trim strips only spaces), so "650\n" would parse as 650 here
    // while an RE2-based oracle returns NULL — and the strict-shape
    // contract says trailing junk is NULL
    val re = "\\A(-?\\d+(?:\\.\\d+)?)([KMB]?)\\z"
    val num = regexp_extract(t, re, 1)
    val suf = regexp_extract(t, re, 2)
    when(num === "", lit(null).cast(DoubleType))
      .otherwise(num.cast(DoubleType) *
        when(suf === "K", lit(1000.0))
          .when(suf === "M", lit(1000000.0))
          .when(suf === "B", lit(1000000000.0))
          .otherwise(lit(1.0)))
  }

  /** K2 — CREATE TABLE DDL from a schema (dag1.py:261-270). Column names
    * arrive verbatim from data (spreadsheet headers), so embedded double
    * quotes are doubled per the SQL quoting rule; the table name is
    * interpolated unquoted into executable DDL ([[graft.io.Sinks]]), so it
    * must be a plain or schema-qualified identifier — anything else is
    * rejected rather than injected. */
  def schemaToDdl(table: String, schema: StructType): String = {
    require(table.split("\\.", -1).forall(_.matches("[A-Za-z_][A-Za-z0-9_]*")),
      s"illegal table name for DDL: '$table' (expected ident or schema.ident)")
    val cols = schema.fields
      .map(f => s""""${f.name.replace("\"", "\"\"")}" ${ddlType(f.dataType)}""")
      .mkString(", ")
    s"""CREATE TABLE IF NOT EXISTS $table ($cols)"""
  }
}
