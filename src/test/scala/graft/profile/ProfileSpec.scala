package graft.profile

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1, Some(10.0), "a"),
    (2, Some(20.0), "b"),
    (3, None, "a"),
    (3, None, "a"))  // duplicate row
    .toDF("k", "v", "s")

  test("single-pass profile: counts, missing, distinct, moments, duplicates (PR1-PR5)") {
    val p = Profile.profile(df, "t", exact = true)
    assert(p.rows === 4 && p.columns === 3 && p.duplicateRows === 1)
    val v = p.profiles.find(_.name == "v").get
    assert(v.count === 2 && v.missing === 2 && v.distinct === 2)
    assert(v.mean.contains(15.0) && v.min.contains(10.0) && v.max.contains(20.0))
    assert(v.p50.contains(15.0))
    val s = p.profiles.find(_.name == "s").get
    assert(s.count === 4 && s.distinct === 2 && s.mean.isEmpty)
  }

  test("skewness/kurtosis (population defs) and 10-bucket histogram") {
    // 0..9 uniform: skew 0, excess kurtosis of discrete uniform(10) =
    // 6*(n^2+1)/(5*(n^2-1)) negated = -1.2242…; one value per bucket.
    val d = Seq.tabulate(10)(i => i.toDouble).toDF("v")
    val p = Profile.profile(d, "t", exact = true).profiles.head
    assert(p.skewness.exists(s => math.abs(s) < 1e-9))
    assert(p.kurtosis.exists(k => math.abs(k - (-1.2242424242)) < 1e-6))
    assert(p.histogram === Seq(1L, 1L, 1L, 1L, 1L, 1L, 1L, 1L, 1L, 1L))
  }

  test("histogram edge cases: constant column and all-null column are skipped") {
    val d = Seq((1.0, Option.empty[Double]), (1.0, None)).toDF("c", "n")
    val p = Profile.profile(d, "t", exact = true)
    assert(p.profiles.find(_.name == "c").get.histogram.isEmpty) // min == max
    assert(p.profiles.find(_.name == "n").get.histogram.isEmpty) // no bounds
  }

  test("correlations over numeric pairs (PR6)") {
    val d = Seq((1, 2.0, 10.0), (2, 4.0, 20.0), (3, 6.0, 31.0))
      .toDF("a", "b", "c")
    val p = Profile.profile(d, "t", exact = true)
    assert(math.abs(p.correlations(("a", "b")) - 1.0) < 1e-12)
    assert(p.correlations(("b", "c")) > 0.99)
  }

  test("approximate mode (HLL distinct + GK quantiles) tracks exact closely") {
    val d = Seq.tabulate(2000)(i => (i, (i % 97).toDouble)).toDF("k", "v")
    val approx = Profile.profile(d, "t", exact = false)
    val k = approx.profiles.find(_.name == "k").get
    assert(math.abs(k.distinct - 2000) < 100)   // HLL++ ~2% error
    val v = approx.profiles.find(_.name == "v").get
    assert(v.p50.exists(m => m >= 40 && m <= 56))
    assert(approx.rows === 2000)
  }

  test("html report renders all columns and stats (K4)") {
    val html = Profile.toHtml(Profile.profile(df, "mytable", exact = true))
    assert(html.contains("<h1>Profile: mytable</h1>"))
    assert(html.contains("4 rows × 3 columns; 1 duplicate rows"))
    assert(html.contains("<td>v</td>") && html.contains("<td>s</td>"))
  }
}
