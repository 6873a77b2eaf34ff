package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.expr.Exprs
import graft.io.{Sources, Xlsx}
import graft.ops.Ops
import graft.quality.Quality

/** The reference's full ETL pipeline re-expressed as one lazy Spark job:
  * 4 heterogeneous sources → 11 normalized, PK-validated tables
  * (dag1.py:21-180,229-241; table docs Pipeline_Details.pdf pp. 2-4).
  *
  * Where the reference materialized every intermediate through Airflow XCom
  * JSON (dag1.py:42-59,125-129), here each output table is a single lazy
  * plan over the raw files — Catalyst prunes columns and pushes filters all
  * the way to the scans, and nothing is serialized between "tasks".
  *
  * Key semantic decisions carried over (SURVEY §7.4):
  *   - GeoFIPS is a canonical INT key end-to-end; zero-padding is
  *     presentation only (Exprs.fipsPad).
  *   - lenient numeric parsing: "(NA)" → null (try_cast), money strings
  *     parsed with [$,] strip.
  *   - 0-wage states produce 0/0 = NaN inflation multipliers which must be
  *     EXCLUDED from the Year-mean like pandas mean does → nanToNull before
  *     avg (dag1.py:153,164).
  *   - inner joins on state name intentionally drop jurisdictions absent
  *     from table_location (e.g. territories; dag1.py:139,157).
  *   - surrogate school-expense-type ids are ordinal over the natural key
  *     ordering — stable and 1:1, may renumber vs the reference's file
  *     order (dag1.py:134-135). */
final case class EconomicsInputs(
    unemploymentXlsx: String,
    gdpCsv: String,
    schoolExpenseCsv: String,
    minWageCsv: String)

object StateEconomics {

  /** Run the full build; returns the 11 tables keyed by their reference
    * names (dag1.py:229-241), each already PK-gated. */
  def build(spark: SparkSession, in: EconomicsInputs): Map[String, DataFrame] = {
    // ---- source 1: unemployment xlsx (dag1.py:24-42) -------------------
    // sheet grid → drop 2 junk leading rows, promote header, drop junk
    // first column, drop 1 footer row.
    val rawUnemp = Xlsx.read(spark, in.unemploymentXlsx)
    val noJunk = Ops.dropLeading(rawUnemp, 2, Seq(col("__idx")))
    val promoted = Ops.promoteHeader(noJunk.drop("_c0"), "__idx").drop("__idx")
    val headered = Ops.normalizeColumns(promoted)
    // semantic footer filter: footer rows carry no FIPS (SURVEY §2.3 R2)
    val unempSheet = headered
      .withColumn("GeoFIPS", Exprs.tryLong(trim(col("FIPS"))).cast(IntegerType))
      .filter(col("GeoFIPS").isNotNull)
      .drop("FIPS")

    val yearCols = unempSheet.columns.filter(_.matches("\\d{4}"))
    val unemployment1 = Ops.melt(
        unempSheet.select((Seq("GeoFIPS", "Name") ++ yearCols).map(col): _*),
        ids = Seq("GeoFIPS", "Name"), varName = "Year", valueName = "Unemployment_Rate")
      .withColumn("Unemployment_Rate", Exprs.tryDouble(col("Unemployment_Rate")))
      .filter(col("Unemployment_Rate").isNotNull)
      .select("GeoFIPS", "Year", "Unemployment_Rate")
    val unemployment = Ops.dedupKeys(unemployment1, Seq("GeoFIPS", "Year"),
      Seq(col("Unemployment_Rate")))

    val income = Ops.dedupKeys(
      unempSheet
        .select(col("GeoFIPS"),
          Exprs.moneyToDouble(col("Median_Household_Income_(2021)"))
            .as("Median_Household_Income_2021"))
        .filter(col("Median_Household_Income_2021").isNotNull),
      Seq("GeoFIPS"), Seq(col("Median_Household_Income_2021")))

    // ---- source 2: GDP csv (dag1.py:45-47, 94-123) ---------------------
    val rawGdp = Ops.normalizeColumns(Sources.csv(spark, in.gdpCsv))
    // footer lines have no LineCode → semantic drop (dag1.py:46 drops tail 4)
    val gdpBase = rawGdp
      .withColumn("GeoFIPS",
        Exprs.tryLong(trim(Exprs.stripQuotes(col("GeoFIPS")))).cast(IntegerType))
      .withColumn("Industry_Code", Exprs.tryLong(col("LineCode")).cast(IntegerType))
      .filter(col("GeoFIPS").isNotNull && col("Industry_Code").isNotNull)
      .withColumn("GeoName", Exprs.cleanName(col("GeoName")))
      .withColumn("Region", Exprs.tryDouble(col("Region")))
      .withColumn("Description", trim(col("Description")))

    val gdpYearCols = gdpBase.columns.filter(_.matches("\\d{4}"))
    val gdp = Ops.dedupKeys(
      Ops.melt(
          gdpBase.select((Seq("GeoFIPS", "Industry_Code") ++ gdpYearCols).map(col): _*),
          ids = Seq("GeoFIPS", "Industry_Code"), varName = "Year", valueName = "GDP_In_Millions")
        .withColumn("GDP", Exprs.tryDouble(col("GDP_In_Millions")) * lit(1e6))
        .filter(col("GDP").isNotNull)
        .select("GeoFIPS", "Year", "Industry_Code", "GDP"),
      Seq("GeoFIPS", "Year", "Industry_Code"), Seq(col("GDP")))

    val industry = Ops.dedupKeys(
      gdpBase.select(col("Industry_Code"), col("Description")),
      Seq("Industry_Code"), Seq(col("Description")))

    // ---- location dim: GDP geos ⟗ unemployment geos (dag1.py:108-118) --
    val gdpGeo = Ops.dedupKeys(
      gdpBase.select(col("GeoFIPS"), col("GeoName"), col("Region")),
      Seq("GeoFIPS"), Seq(col("GeoName"), col("Region")))
    val unempGeo = Ops.dedupKeys(
      unempSheet.select(col("GeoFIPS"), trim(col("Name")).as("Name")),
      Seq("GeoFIPS"), Seq(col("Name")))
    val location = gdpGeo.join(unempGeo, Seq("GeoFIPS"), "full_outer")
      .select(col("GeoFIPS"),
        coalesce(col("GeoName"), col("Name")).as("GeoName"),   // F10 backfill
        col("Region"))

    // ---- source 3: school expenses (dag1.py:50-51, 131-149) ------------
    val school = Ops.normalizeColumns(Sources.csv(spark, in.schoolExpenseCsv))
    val expenseType = Ops.surrogateKey(
        school, Seq("Type", "Length", "Expense"), "School_Expense_Type_Id")
      .select(col("School_Expense_Type_Id"), col("Type").as("School_Type"),
        col("Length"), col("Expense").as("Expense_Type"))
    val schoolExpenses = school
      .join(broadcast(expenseType),
        school("Type") === expenseType("School_Type") &&
        school("Length") === expenseType("Length") &&
        school("Expense") === expenseType("Expense_Type"))
      .join(broadcast(location.select(col("GeoFIPS"), col("GeoName"))),
        school("State") === col("GeoName"))  // inner: drops non-location rows
      // try_cast, not cast: ANSI mode (Spark 4 default) makes a hard cast
      // THROW on junk cells like '(NA)' — lenient parse-to-null is this
      // pipeline's documented contract (same as every Exprs.try* site)
      .select(col("Year").try_cast(IntegerType).as("Year"), col("GeoFIPS"),
        col("School_Expense_Type_Id"),
        col("Value").try_cast(IntegerType).as("Expense_Amount"))
    val schoolExpensesDeduped = Ops.dedupKeys(schoolExpenses,
      Seq("Year", "GeoFIPS", "School_Expense_Type_Id"), Seq(col("Expense_Amount")))

    // ---- source 4: minimum wage csv, windows-1252 (dag1.py:54-59, 151-180)
    val mw = Ops.normalizeColumns(
      Sources.csv(spark, in.minWageCsv, encoding = Sources.detectCharset(in.minWageCsv)))
      .withColumn("Year", col("Year").try_cast(IntegerType))

    val stateMinWage = mw
      .join(broadcast(location.select(col("GeoFIPS"), col("GeoName"))),
        mw("State") === col("GeoName"))      // inner: drops territories (J4)
      .select(col("Year"), col("GeoFIPS"),
        Exprs.tryDouble(col("State_Minimum_Wage")).as("State_Min_Wage"),
        Exprs.tryDouble(col("Department_Of_Labor_Cleaned_Low_Value"))
          .as("Small_Business_Min_Wage"),
        Exprs.tryDouble(col("Department_Of_Labor_Cleaned_High_Value"))
          .as("Large_Business_Min_Wage"))
    val stateMinWageDeduped = Ops.dedupKeys(stateMinWage, Seq("Year", "GeoFIPS"),
      Seq(col("State_Min_Wage"), col("Small_Business_Min_Wage"),
        col("Large_Business_Min_Wage")))

    // inflation multiplier = 2020$ wage / nominal wage; 0/0 → NaN → null so
    // the Year-mean matches pandas (dag1.py:153,164 + SURVEY §7.4)
    val inflation = mw
      .withColumn("mult", Exprs.ratioNanNull(
        col("State_Minimum_Wage_2020_Dollars"), col("State_Minimum_Wage")))
      .groupBy(col("Year"))
      .agg(avg(col("mult")).as("Inflation_Multiplier_2020"))
      .filter(col("Inflation_Multiplier_2020").isNotNull)

    val cpi = Ops.dedupKeys(
      mw.select(col("Year"), Exprs.tryDouble(col("CPI_Average")).as("CPI_Average")),
      Seq("Year"), Seq(col("CPI_Average")))
    val fedMinWage = Ops.dedupKeys(
      mw.select(col("Year"),
        Exprs.tryDouble(col("Federal_Minimum_Wage")).as("Fed_Min_Wage")),
      Seq("Year"), Seq(col("Fed_Min_Wage")))

    // ---- PK gates — the reference's 11 checks (dag1.py:71-79 + call sites)
    val tables = Map(
      "table_location" -> Quality.checkPrimaryKey(location, Seq("GeoFIPS"), "table_location"),
      "table_Unemployment" -> Quality.checkPrimaryKey(unemployment, Seq("GeoFIPS", "Year"), "table_Unemployment"),
      "table_HouseholdIncome2021" -> Quality.checkPrimaryKey(income, Seq("GeoFIPS"), "table_HouseholdIncome2021"),
      "table_gdp" -> Quality.checkPrimaryKey(gdp, Seq("GeoFIPS", "Year", "Industry_Code"), "table_gdp"),
      "table_industry" -> Quality.checkPrimaryKey(industry, Seq("Industry_Code"), "table_industry"),
      "table_school_expense_type" -> Quality.checkPrimaryKey(expenseType, Seq("School_Expense_Type_Id"), "table_school_expense_type"),
      "table_school_expenses" -> Quality.checkPrimaryKey(schoolExpensesDeduped, Seq("Year", "GeoFIPS", "School_Expense_Type_Id"), "table_school_expenses"),
      "table_state_min_wage" -> Quality.checkPrimaryKey(stateMinWageDeduped, Seq("Year", "GeoFIPS"), "table_state_min_wage"),
      "table_inflation" -> Quality.checkPrimaryKey(inflation, Seq("Year"), "table_inflation"),
      "table_CPI" -> Quality.checkPrimaryKey(cpi, Seq("Year"), "table_CPI"),
      "table_fed_min_wage" -> Quality.checkPrimaryKey(fedMinWage, Seq("Year"), "table_fed_min_wage"))

    // ---- row-level expectations beyond the reference's PK-only checks:
    // domain gates a production load would refuse to ship without. Run
    // AFTER the PK gates so reference-parity violations surface first.
    Quality.expectAll(fedMinWage, Seq(
      "year_in_range" -> col("Year").between(1900, 2100),
      "wage_non_negative" -> (col("Fed_Min_Wage") >= 0)))
    Quality.expectAll(location, Seq(
      "geofips_non_negative" -> (col("GeoFIPS") >= 0)))
    tables
  }

  /** SURVEY §1.5 incremental variant: table_fed_min_wage derived from a
    * FILE STREAM of min-wage CSV drops. With `Trigger.AvailableNow` this is
    * catch-up-then-stop batch semantics over whatever files have landed —
    * the monthly-full-refresh cadence of the reference, made incremental.
    *
    * Same transforms as [[build]]; the keyed dedup is expressed as a
    * streaming `groupBy(Year).min` — equivalent to `Ops.dedupKeys(_,
    * Seq("Year"), Seq(col("Fed_Min_Wage")))` here because the tie-break IS
    * the single value column (windows don't exist in streaming plans).
    * `schema` comes from the batch reader / catalog: file streams cannot
    * infer. Run with `.outputMode("complete")` (the aggregate re-emits the
    * whole small dimension each trigger). */
  def fedMinWageStream(spark: SparkSession, path: String, schema: StructType,
                       encoding: String = "UTF-8"): DataFrame = {
    // the batch csv() path stream-transcodes UTF-16/32 to a temp file; a
    // file STREAM watches a directory and cannot, so fail fast instead of
    // letting Hadoop's 0x0A splitter shred those encodings silently
    require(!Sources.needsTranscode(encoding),
      s"fedMinWageStream cannot read $encoding (file streams can't " +
        "transcode); convert the feed to UTF-8 first")
    Sources.ensureCharsetReadable(spark, encoding)
    val raw = spark.readStream.schema(schema)
      .option("header", true).option("encoding", encoding)
      .csv(path)
    val v = Exprs.tryDouble(col("Federal_Minimum_Wage"))
    Ops.normalizeColumns(raw)
      .withColumn("Year", col("Year").try_cast(IntegerType))
      .groupBy(col("Year"))
      // dedupKeys orders ascending NULLS FIRST, so a group containing any
      // null value resolves to null — count(*)>count(v) reproduces that
      // here; a bare min() would silently skip nulls and diverge from the
      // batch table on dirty data.
      .agg(when(count(lit(1)) > count(v), lit(null).cast(DoubleType))
        .otherwise(min(v)).as("Fed_Min_Wage"))
  }
}
