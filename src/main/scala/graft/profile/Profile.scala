package graft.profile

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dataset profiling (SURVEY.md §2.13 PR1–PR6) — the engine-side analog of
  * the reference's per-table ydata-profiling reports
  * (finalprojectpandasprofiling.py:50-54).
  *
  * Design for scale: ALL per-column statistics are computed in a single
  * `agg(...)` pass (one job, one scan; partial aggregation map-side), never
  * a per-column loop of actions. Distinct counts use HLL++
  * (`approx_count_distinct`) by default, with an exact variant for small
  * dims / oracle checks. Quantiles use `percentile_approx` (GK sketch) by
  * default with an exact variant. Correlations are a second single pass over
  * the numeric columns.
  */
final case class ColumnProfile(
    name: String,
    dataType: String,
    count: Long,
    missing: Long,
    distinct: Long,
    mean: Option[Double],
    stddev: Option[Double],
    min: Option[Double],
    max: Option[Double],
    p25: Option[Double],
    p50: Option[Double],
    p75: Option[Double],
    skewness: Option[Double] = None,
    kurtosis: Option[Double] = None,
    histogram: Seq[Long] = Seq.empty,
    frequent: Seq[(String, Long)] = Seq.empty)

final case class TableProfile(
    table: String,
    rows: Long,
    columns: Int,
    duplicateRows: Long,
    profiles: Seq[ColumnProfile],
    correlations: Map[(String, String), Double])

object Profile {

  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _              => false
  }

  private def isFloating(dt: DataType): Boolean = dt match {
    case FloatType | DoubleType => true
    case _                      => false
  }

  // Backtick-quoted column reference: a plain col(name) parses dots as
  // nested-field access, so a header like "U.S._Rate" (promoted verbatim
  // from a spreadsheet) would crash every aggregation pass. Embedded
  // backticks are doubled per Spark's quoting rule.
  private def q(c: String): Column = col("`" + c.replace("`", "``") + "`")

  /** PR1–PR5 (counts, missing, distinct, moments incl. skewness/kurtosis,
    * quantiles, duplicates) in one aggregation pass, histograms in a second
    * (bucket bounds need pass-1 min/max), PR6 correlations in a third.
    * `exact` switches the distinct/quantile sketches to exact computation
    * (use for tests / oracle parity; default approximate for 100 TB runs). */
  /** Per-column top-N frequent values (the ydata-profiling "Most frequent
    * values" block, finalprojectpandasprofiling.py:50) as a DISTRIBUTED
    * frame: (col_name, value, cnt, rank), rank 1 = most frequent, ties
    * broken by value ascending (binary string order — replayable in SQL).
    * Values are stringified; nulls are excluded (missing is its own
    * statistic in [[profile]]).
    *
    * Scale shape: one posexplode pass turns the table into (colIdx, value)
    * cells, ONE exact groupBy count over (colIdx, value) — map-side
    * partials, the same shuffle a single-column value_counts would pay,
    * amortized over every column at once — then the bounded-heap
    * `topk_desc_str` aggregate reduces each column to N rows with map-side
    * partial heaps: the second shuffle carries ≤ N rows per column per
    * partition, never the distinct-value set of a high-cardinality column. */
  def frequentValues(df: DataFrame, topN: Int = 5): DataFrame = {
    require(topN > 0, s"topN must be > 0, got $topN")
    val fields = df.schema.fields
    require(fields.nonEmpty, "frequentValues needs at least one column")
    val nameMap = map(fields.zipWithIndex.flatMap { case (f, i) =>
      Seq(lit(i), lit(f.name)) }: _*)
    df.select(posexplode(array(fields.map(f => q(f.name).cast(StringType)): _*))
        .as(Seq("__ci", "__v")))
      .filter(col("__v").isNotNull)
      .groupBy(col("__ci"), col("__v"))
      .agg(count(lit(1)).as("__cnt"))
      .groupBy(col("__ci"))
      .agg(call_function("topk_desc_str",
        col("__cnt").cast(DoubleType), col("__v"), lit(topN)).as("__tk"))
      .select(col("__ci"), posexplode(col("__tk")).as(Seq("__pos", "__e")))
      .select(element_at(nameMap, col("__ci")).as("col_name"),
        col("__e.id").as("value"),
        col("__e.score").cast(LongType).as("cnt"),
        (col("__pos") + 1).cast(IntegerType).as("rank"))
  }

  /** [[frequentValues]] for NUMERIC columns with a NUMERIC tie-break:
    * (col_name, value double, cnt, rank), rank 1 = most frequent, ties
    * broken by value ascending in NUMERIC order — the string form breaks
    * ties in binary render order ("10" < "2"), which misorders a numeric
    * report. Same scale shape (one posexplode cell pass, one exact
    * (colIdx, value) count, then the bounded-heap `topk_desc_num`
    * aggregate — map-side partial heaps, ≤ N rows per column per
    * partition on the second shuffle). Nulls and NaNs are excluded
    * (missing is its own statistic in [[profile]]; a NaN frequent-value
    * row is meaningless). Non-numeric columns are ignored; requires at
    * least one numeric column. */
  def frequentValuesNumeric(df: DataFrame, topN: Int = 5): DataFrame = {
    require(topN > 0, s"topN must be > 0, got $topN")
    val fields = df.schema.fields.filter(f => isNumeric(f.dataType))
    require(fields.nonEmpty, "frequentValuesNumeric needs a numeric column")
    val nameMap = map(fields.zipWithIndex.flatMap { case (f, i) =>
      Seq(lit(i), lit(f.name)) }: _*)
    df.select(posexplode(array(fields.map(f => q(f.name).cast(DoubleType)): _*))
        .as(Seq("__ci", "__v")))
      .filter(col("__v").isNotNull && !isnan(col("__v")))
      .groupBy(col("__ci"), col("__v"))
      .agg(count(lit(1)).as("__cnt"))
      .groupBy(col("__ci"))
      .agg(call_function("topk_desc_num",
        col("__cnt").cast(DoubleType), col("__v"), lit(topN)).as("__tk"))
      .select(col("__ci"), posexplode(col("__tk")).as(Seq("__pos", "__e")))
      .select(element_at(nameMap, col("__ci")).as("col_name"),
        col("__e.value").as("value"),
        col("__e.score").cast(LongType).as("cnt"),
        (col("__pos") + 1).cast(IntegerType).as("rank"))
  }

  def profile(df: DataFrame, table: String = "df", exact: Boolean = false,
              topFrequent: Int = 5): TableProfile = {
    val fields  = df.schema.fields
    val numeric = fields.filter(f => isNumeric(f.dataType)).map(_.name)

    // NaN poisons mean/stddev/max (Spark sorts NaN greatest) where
    // ydata-profiling skips it — normalize floating columns through
    // nanToNull so statistics mean what the reference's reports mean.
    def numc(f: StructField): Column =
      if (isFloating(f.dataType)) graft.expr.Exprs.nanToNull(q(f.name)) else q(f.name)
    def distinctAgg(c: String): Column =
      if (exact) count_distinct(q(c)) else approx_count_distinct(q(c))
    def pct(f: StructField, p: Double): Column =
      if (exact) call_function("percentile", numc(f), lit(p)).cast(DoubleType)
      else percentile_approx(numc(f), lit(p), lit(10000)).cast(DoubleType)
    // the full-row distinct also honors `exact`: an exact distinct over
    // every column is the single most expensive aggregate in the pass —
    // precisely what approximate mode exists to avoid at scale
    def rowDistinct: Column = {
      val all = struct(fields.map(f => q(f.name)): _*)
      if (exact) count_distinct(all) else approx_count_distinct(all)
    }

    val aggs: Seq[Column] =
      Seq(count(lit(1)).as("__rows"),
          rowDistinct.as("__distinct_rows")) ++
      fields.flatMap { f =>
        val c = f.name
        val base = Seq(
          count(q(c)).as(s"$c::count"),
          sum(when(q(c).isNull, 1L).otherwise(0L)).as(s"$c::missing"),
          distinctAgg(c).as(s"$c::distinct"))
        val nums =
          if (isNumeric(f.dataType))
            Seq(
              avg(numc(f)).cast(DoubleType).as(s"$c::mean"),
              stddev(numc(f)).cast(DoubleType).as(s"$c::std"),
              min(numc(f)).cast(DoubleType).as(s"$c::min"),
              max(numc(f)).cast(DoubleType).as(s"$c::max"),
              pct(f, 0.25).as(s"$c::p25"),
              pct(f, 0.5).as(s"$c::p50"),
              pct(f, 0.75).as(s"$c::p75"),
              skewness(numc(f)).cast(DoubleType).as(s"$c::skew"),
              kurtosis(numc(f)).cast(DoubleType).as(s"$c::kurt"))
          else Seq.empty
        base ++ nums
      }

    val row: Row = df.agg(aggs.head, aggs.tail: _*).head()
    def get(n: String): Any = row.get(row.fieldIndex(n))
    def getL(n: String): Long = get(n) match {
      case null     => 0L
      case l: Long  => l
      case i: Int   => i.toLong
      case other    => other.toString.toLong
    }
    def getD(n: String): Option[Double] = get(n) match {
      case null      => None
      case d: Double => Some(d)
      case other     => Some(other.toString.toDouble)
    }

    val rows = getL("__rows")

    // Histograms need the min/max from pass 1 to place bucket bounds, so
    // they are a SECOND single aggregation pass over all numeric columns at
    // once (bins × columns conditional sums — still one job, one scan).
    val histBins = 10
    val histTargets = fields.collect {
      case f if isNumeric(f.dataType)
        && getD(s"${f.name}::min").isDefined
        && getD(s"${f.name}::max").exists(_ > getD(s"${f.name}::min").get) =>
        (f.name, getD(s"${f.name}::min").get, getD(s"${f.name}::max").get)
    }.toSeq
    val histograms: Map[String, Seq[Long]] =
      if (histTargets.isEmpty) Map.empty
      else {
        // width_bucket sends x == hi to the overflow bucket bins+1; least()
        // folds the max value into the last in-range bucket instead.
        val fieldByName = fields.map(f => f.name -> f).toMap
        val wb = df.select(histTargets.map { case (c, lo, hi) =>
          // NaN-normalized like the stats pass; the x == hi overflow bin
          // folds into the last in-range bucket with a NULL-PRESERVING
          // cap — least() would resurrect null/NaN rows as bucket `bins`
          // (Spark's least skips nulls) and inflate the tail
          val raw = width_bucket(numc(fieldByName(c)).cast(DoubleType),
            lit(lo), lit(hi), lit(histBins))
          when(raw > histBins, lit(histBins.toLong)).otherwise(raw).as(s"$c::wb")
        }: _*)
        val hAggs = histTargets.flatMap { case (c, _, _) =>
          (1 to histBins).map(b =>
            sum(when(q(s"$c::wb") === b, 1L).otherwise(0L)).as(s"$c::h$b"))
        }
        val hRow = wb.agg(hAggs.head, hAggs.tail: _*).head()
        histTargets.map { case (c, _, _) =>
          c -> (1 to histBins).map(b => hRow.getLong(hRow.fieldIndex(s"$c::h$b"))).toSeq
        }.toMap
      }

    // Frequent values: its own two-shuffle pass (groupBy value needs a
    // shuffle no agg() can absorb); the collected result is bounded at
    // columns × topFrequent rows. `topFrequent <= 0` disables.
    val freq: Map[String, Seq[(String, Long)]] =
      if (topFrequent <= 0) Map.empty
      else frequentValues(df, topFrequent).collect()
        .groupBy(_.getString(0))
        .map { case (c, rs) =>
          c -> rs.sortBy(_.getInt(3)).map(r => (r.getString(1), r.getLong(2))).toSeq
        }

    val profiles = fields.map { f =>
      val c = f.name
      val num = isNumeric(f.dataType)
      ColumnProfile(
        name = c, dataType = f.dataType.simpleString,
        count = getL(s"$c::count"), missing = getL(s"$c::missing"),
        distinct = getL(s"$c::distinct"),
        mean = if (num) getD(s"$c::mean") else None,
        stddev = if (num) getD(s"$c::std") else None,
        min = if (num) getD(s"$c::min") else None,
        max = if (num) getD(s"$c::max") else None,
        p25 = if (num) getD(s"$c::p25") else None,
        p50 = if (num) getD(s"$c::p50") else None,
        p75 = if (num) getD(s"$c::p75") else None,
        skewness = if (num) getD(s"$c::skew") else None,
        kurtosis = if (num) getD(s"$c::kurt") else None,
        histogram = histograms.getOrElse(c, Seq.empty),
        frequent = freq.getOrElse(c, Seq.empty))
    }

    // PR6 — pairwise correlations over numeric columns, one pass.
    val corrs: Map[(String, String), Double] =
      if (numeric.length < 2) Map.empty
      else {
        val pairs = for {
          i <- numeric.indices; j <- (i + 1) until numeric.length
        } yield (numeric(i), numeric(j))
        val corrAggs = pairs.map { case (a, b) => corr(q(a), q(b)).as(s"$a::$b") }
        val crow = df.agg(corrAggs.head, corrAggs.tail: _*).head()
        pairs.zipWithIndex.collect {
          case ((a, b), i) if !crow.isNullAt(i) => (a, b) -> crow.getDouble(i)
        }.toMap
      }

    TableProfile(table, rows, fields.length, rows - getL("__distinct_rows"), profiles, corrs)
  }

  /** K4 — render a profile as a standalone HTML report (the reference's
    * `<table>_report.html`, finalprojectpandasprofiling.py:52-54). */
  def toHtml(p: TableProfile): String = {
    // Locale.ROOT: the f-interpolator formats through the JVM default
    // locale, turning 15.0 into "15,0000" on FR/DE machines; report
    // output must not depend on where it renders. Names/types are
    // escaped — headers arrive verbatim from spreadsheet cells.
    def fmt(o: Option[Double]): String =
      o.map(d => String.format(java.util.Locale.ROOT, "%.4f",
        Double.box(d))).getOrElse("—")
    def esc(s: String): String = s.replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;").replace("\"", "&quot;")
    // frequent values render truncated — a "frequent" TEXT column could
    // otherwise paste whole documents into the report
    def freqCell(c: ColumnProfile): String =
      c.frequent.map { case (v, n) =>
        val shown = if (v.length > 40) v.take(40) + "…" else v
        s"${esc(shown)} (${n})"
      }.mkString(", ")
    val colRows = p.profiles.map { c =>
      s"<tr><td>${esc(c.name)}</td><td>${esc(c.dataType)}</td><td>${c.count}</td>" +
        s"<td>${c.missing}</td><td>${c.distinct}</td><td>${fmt(c.mean)}</td>" +
        s"<td>${fmt(c.stddev)}</td><td>${fmt(c.min)}</td><td>${fmt(c.p50)}</td>" +
        s"<td>${fmt(c.max)}</td><td>${fmt(c.skewness)}</td>" +
        s"<td>${fmt(c.kurtosis)}</td><td>${c.histogram.mkString(" ")}</td>" +
        s"<td>${freqCell(c)}</td></tr>"
    }.mkString("\n")
    val corrRows = p.correlations.toSeq.sortBy(_._1).map { case ((a, b), v) =>
      s"<tr><td>${esc(a)}</td><td>${esc(b)}</td><td>${fmt(Some(v))}</td></tr>"
    }.mkString("\n")
    s"""<!DOCTYPE html><html><head><meta charset="utf-8"><title>${esc(p.table)} profile</title>
       |<style>body{font-family:sans-serif}table{border-collapse:collapse}
       |td,th{border:1px solid #999;padding:4px 8px}</style></head><body>
       |<h1>Profile: ${esc(p.table)}</h1>
       |<p>${p.rows} rows × ${p.columns} columns; ${p.duplicateRows} duplicate rows</p>
       |<h2>Columns</h2>
       |<table><tr><th>column</th><th>type</th><th>count</th><th>missing</th>
       |<th>distinct</th><th>mean</th><th>std</th><th>min</th><th>median</th><th>max</th>
       |<th>skew</th><th>kurtosis</th><th>histogram</th><th>frequent</th></tr>
       |$colRows</table>
       |<h2>Correlations</h2>
       |<table><tr><th>a</th><th>b</th><th>corr</th></tr>
       |$corrRows</table>
       |</body></html>""".stripMargin
  }

  /** Write the HTML report (K4 sink). */
  def writeHtml(p: TableProfile, path: String): Unit = {
    val f = new java.io.File(path)
    Option(f.getParentFile).foreach(_.mkdirs())
    java.nio.file.Files.writeString(f.toPath, toHtml(p))
  }
}
