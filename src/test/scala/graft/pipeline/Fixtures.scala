package graft.pipeline

import java.nio.charset.Charset
import java.nio.file.{Files, Path}
import graft.io.Xlsx

/** Synthesizes the four reference-shaped raw inputs (FIXTURES.md §A) into a
  * temp directory, reproducing every cleaning edge case:
  * junk rows + header promotion + footer, quoted/zero-padded FIPS, `(NA)`
  * coercion, `$`/`,` money strings, trailing `*` in names, dotted column
  * names, windows-1252 bytes (0x96 en-dash), 0-wage NaN multipliers,
  * territories absent from location. */
object Fixtures {

  def writeAll(dir: Path): EconomicsInputs = {
    val xlsx = dir.resolve("unemployment.xlsx")
    Xlsx.write(xlsx.toString, Seq[Seq[Any]](
      Seq("junk", "junk junk"),
      Seq(null, "more junk"),
      Seq("", "FIPS ", "Name", "2014", "2015", "Median Household Income (2021)"),
      Seq("x", "01000", "Alabama", 4.5, 4.0, "$53,990"),
      Seq("x", "02000", "Alaska", 6.5, 6.0, "$77,790"),
      Seq("x", "08000", "Colorado", 5.0, null, "$82,254"),
      Seq("x", "72000", "Puerto Rico", 13.9, null, null),
      Seq("x", null, "Source: BLS footer", null, null, null)))

    val gdp = dir.resolve("gdp.csv")
    Files.writeString(gdp,
      """GeoFIPS,GeoName,Region,TableName,LineCode,IndustryClassification,Description,Unit,1997,1998
        | "00000","United States *",,SAGDP2N,1,...,All industry total,Millions of current dollars,8577552.0,9062817.0
        | "01000",Alabama,5,SAGDP2N,1,...,All industry total,Millions of current dollars,104218.0,109414.0
        | "01000",Alabama,5,SAGDP2N,2,11,   Farms,Millions of current dollars,1744.0,(NA)
        | "02000",Alaska,8,SAGDP2N,1,...,All industry total,Millions of current dollars,25446.0,26354.0
        | "08000",Colorado,6,SAGDP2N,1,...,All industry total,Millions of current dollars,130342.0,139253.0
        |Note: See the included footnotes file.,,,,,,,,,
        |SOURCE: Bureau of Economic Analysis,,,,,,,,,""".stripMargin)

    val school = dir.resolve("school_expense.csv")
    Files.writeString(school,
      """Year,State,Type,Length,Expense,Value
        |2020,Alabama,Private,4-year,Fees/Tuition,13983
        |2020,Alabama,Private,4-year,Room/Board,9430
        |2020,Alaska,Private,4-year,Fees/Tuition,20342
        |2020,Colorado,Public In-State,2-year,Fees/Tuition,3894
        |2021,Alabama,Private,4-year,Fees/Tuition,14200
        |2020,District of Columbia,Private,4-year,Fees/Tuition,29000""".stripMargin)

    val mw = dir.resolve("min_wage.csv")
    // – below is U+2013; windows-1252 encodes it as the 0x96 byte the
    // reference's chardet sniff exists for.
    Files.write(mw,
      ("""Year,State,State.Minimum.Wage,State.Minimum.Wage.2020.Dollars,Federal.Minimum.Wage,Federal.Minimum.Wage.2020.Dollars,CPI.Average,Department.Of.Labor.Uncleaned.Data,Department.Of.Labor.Cleaned.Low.Value,Department.Of.Labor.Cleaned.High.Value,Footnote
         |1968,Alabama,0,0,1.15,8.55,34.8,,0,0,(b) 1968–series
         |1968,Alaska,2.1,15.61,1.15,8.55,34.8,18.72 - 26.40/wk(b),2.1,2.1,
         |1968,Colorado,1.0,7.43,1.15,8.55,34.8,,1.0,1.0,
         |1968,Guam,1.25,9.29,1.15,8.55,34.8,,1.25,1.25,
         |2017,Alabama,0,0,7.25,7.25,245.1,,0,0,
         |2017,Alaska,9.8,10.33,7.25,7.25,245.1,,9.8,9.8,
         |2017,Colorado,9.3,9.8,7.25,7.25,245.1,,9.3,9.3,""".stripMargin)
        .getBytes(Charset.forName("windows-1252")))

    EconomicsInputs(xlsx.toString, gdp.toString, school.toString, mw.toString)
  }
}
