package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** F1–F11 edge cases from FIXTURES.md §A / dag1.py semantics. */
class ExprsSpec extends SparkSpec {
  import spark.implicits._

  test("F1 fipsPad zero-pads to 5 and leaves 5-digit keys alone") {
    val out = Seq(400, 46, 0, 12345).toDF("k")
      .select(Exprs.fipsPad(col("k")).as("fips")).as[String].collect()
    assert(out.sameElements(Array("00400", "00046", "00000", "12345")))
  }

  test("F2 moneyToDouble parses $/, formatting and coerces (NA) to null") {
    val out = Seq("$53,990", "1234.5", "(NA)", "  $1,000,000.25").toDF("m")
      .select(Exprs.moneyToDouble(col("m")).as("v")).as[Option[Double]].collect()
    assert(out(0).contains(53990.0))
    assert(out(1).contains(1234.5))
    assert(out(2).isEmpty)
    // leading whitespace survives the [$,] strip; cast trims it
    assert(out(3).contains(1000000.25))
  }

  test("F3 tryDouble/tryLong never throw, bad input → null") {
    val out = Seq("12", "x", "", "3.5").toDF("s")
      .select(Exprs.tryDouble(col("s")).as("d"), Exprs.tryLong(col("s")).as("l"))
      .collect()
    assert(out.map(r => Option(r.get(0))) sameElements
      Array(Some(12.0), None, None, Some(3.5)))
    assert(out.map(r => Option(r.get(1))) sameElements
      Array(Some(12L), None, None, None))
  }

  test("F4/F5/F6 strip + trim composites") {
    val out = Seq("""  "00400"  """, "Alaska* ", " x ").toDF("s")
      .select(Exprs.cleanName(col("s")).as("c")).as[String].collect()
    assert(out.sameElements(Array("00400", "Alaska", "x")))
  }

  test("F8 ratioNanNull: 0/0 and x/0 → null (never NaN, never a throw)") {
    val out = Seq((0.0, 0.0), (1.0, 0.0), (6.0, 3.0), (Double.NaN, 1.0))
      .toDF("n", "d")
      .select(Exprs.ratioNanNull(col("n"), col("d")).as("r"))
      .as[Option[Double]].collect()
    assert(out(0).isEmpty && out(1).isEmpty)
    assert(out(2).contains(2.0))
    assert(out(3).isEmpty)
  }

  test("A2 avg over ratioNanNull matches pandas NaN-skipping mean") {
    val mean = Seq((0.0, 0.0), (4.0, 2.0), (9.0, 3.0)).toDF("n", "d")
      .agg(avg(Exprs.ratioNanNull(col("n"), col("d")))).as[Double].head()
    assert(mean === 2.5) // (2 + 3) / 2 — the 0/0 row is excluded
  }

  test("F13 parseHumanNumber: K/M/B suffixes, case/whitespace tolerant, " +
      "junk and bare suffixes → null") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      ("1.2K", Some(1.2 * 1000.0)), (" 3m ", Some(3.0 * 1000000.0)),
      ("-4.5B", Some(-4.5 * 1000000000.0)), ("650", Some(650.0)),
      ("-7", Some(-7.0)), ("0.5k", Some(0.5 * 1000.0)),
      ("K", None), ("1.2.3K", None), ("12KB", None), ("n/a", None),
      ("", None),
      // trim strips only spaces, and Java's '$' would match BEFORE a
      // trailing newline — the \A..\z anchors keep this NULL (and keep
      // the engine agreeing with an RE2 oracle)
      ("650\n", None), ("1.2K\n", None))
    val out = cases.map(_._1).toDF("raw")
      .select(Exprs.parseHumanNumber(col("raw")).as("v"))
      .as[Option[Double]].collect()
    cases.zip(out).foreach { case ((in, want), got) =>
      assert(got === want, s"parseHumanNumber($in)")
    }
  }

  test("F11 ddlType maps Spark types to portable DDL") {
    assert(Exprs.ddlType(IntegerType) === "INTEGER")
    assert(Exprs.ddlType(LongType) === "BIGINT")
    assert(Exprs.ddlType(DoubleType) === "DOUBLE PRECISION")
    assert(Exprs.ddlType(BooleanType) === "BOOLEAN")
    assert(Exprs.ddlType(TimestampType) === "TIMESTAMP")
    assert(Exprs.ddlType(StringType) === "TEXT")
    assert(Exprs.schemaToDdl("t", StructType(Seq(StructField("a", LongType))))
      === """CREATE TABLE IF NOT EXISTS t ("a" BIGINT)""")
  }
}
