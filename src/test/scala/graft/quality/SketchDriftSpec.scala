package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Chi-square categorical drift + Theta-sketch set operations. */
class SketchDriftSpec extends SparkSpec {
  import spark.implicits._

  test("chiSquareDrift: integer contingency with cross-terms summing to zero") {
    val a = Seq("x", "x", "y").toDF("c")
    val b = Seq("x", "y", "y", "y").toDF("c")
    val rows = Quality.chiSquareDrift(a, b, "c")
      .orderBy("category").as[(String, Long, Long, Long)].collect()
    // d_x = 2*4 - 1*3 = 5; d_y = 1*4 - 3*3 = -5
    assert(rows.sameElements(Array(("x", 2L, 1L, 5L), ("y", 1L, 3L, -5L))))
    assert(rows.map(_._4).sum === 0L) // Σ d = n_a·n_b − n_b·n_a, always 0
  }

  test("chiSquareDrift: NULL categories are a level; identical slices give d=0") {
    val a = Seq(Some("x"), None, None).toDF("c")
    val b = Seq(Some("x"), None, None).toDF("c")
    val rows = Quality.chiSquareDrift(a, b, "c")
      .as[(Option[String], Long, Long, Long)].collect()
    assert(rows.length === 2 && rows.forall(_._4 === 0L))
    assert(rows.exists(r => r._1.isEmpty && r._2 === 2L && r._3 === 2L))
  }

  test("chiSquareStat matches the direct Σ(o−e)²/e computation") {
    val a = Seq("x", "x", "y").toDF("c")
    val b = Seq("x", "y", "y", "y").toDF("c")
    val (nA, nB, dof, chi2) = Quality.chiSquareStat(Quality.chiSquareDrift(a, b, "c"))
      .as[(Long, Long, Long, Double)].head()
    assert((nA, nB, dof) === ((3L, 4L, 1L)))
    // direct computation on the 2x2 table [[2,1],[1,3]], N=7:
    // e = rowTot*colTot/N; chi2 = sum (o-e)^2/e
    val o = Array(Array(2.0, 1.0), Array(1.0, 3.0))
    val rt = o.map(_.sum); val ct = Array(o(0)(0) + o(1)(0), o(0)(1) + o(1)(1))
    val n = 7.0
    val direct = (for (i <- 0 to 1; j <- 0 to 1) yield {
      val e = rt(i) * ct(j) / n; math.pow(o(i)(j) - e, 2) / e
    }).sum
    assert(math.abs(chi2 - direct) < 1e-12)
  }

  test("chiSquareStat: an empty side yields NULL chi2, not a throw") {
    val a = Seq("x", "y").toDF("c")
    val b = a.filter(lit(false))
    val row = Quality.chiSquareStat(Quality.chiSquareDrift(a, b, "c"))
      .select(col("n_b"), col("chi2")).head()
    assert(row.getLong(0) === 0L && row.isNullAt(1))
  }

  test("snapshotOverlapSketch ≡ snapshotOverlapExact in exact mode") {
    // 600 distinct keys/side < 2^12 nominal entries → theta stays 1 and
    // every estimate is exact; duplicates exercise distinctness.
    val a = (0 until 600).flatMap(i => Seq(i, i)).toDF("k")
    val b = (300 until 900).toDF("k")
    val sk = Quality.snapshotOverlapSketch(a, b, "k")
      .select(col("est_a").cast("long"), col("est_b").cast("long"),
        col("est_union").cast("long"), col("est_intersect").cast("long"),
        col("est_only_a").cast("long"), col("est_only_b").cast("long"))
      .as[(Long, Long, Long, Long, Long, Long)].head()
    val ex = Quality.snapshotOverlapExact(a, b, "k")
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(sk === ex)
    assert(ex === ((600L, 600L, 900L, 300L, 300L, 300L)))
  }

  test("snapshotOverlapExact ignores NULL keys on both sides") {
    val a = Seq(Some(1), Some(2), None).toDF("k")
    val b = Seq(Some(2), None, None).toDF("k")
    val ex = Quality.snapshotOverlapExact(a, b, "k")
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(ex === ((2L, 1L, 2L, 1L, 1L, 0L)))
  }

  test("quantileBucketDrift: integer-rank halves bucket a known range; shifted side detected") {
    val a = (1 to 10).map(_.toDouble).toDF("v")
    val b = (6 to 15).map(_.toDouble).toDF("v")
    // N=10, nBuckets=2 → rank threshold ⌈10/2⌉=5 → boundary = 5.0;
    // bucket 0 = v ≤ 5 (a:1..5), bucket 1 = v > 5 (a:6..10, b:6..15)
    val rows = Quality.quantileBucketDrift(a, b, "v", nBuckets = 2)
      .orderBy("category").as[(String, Long, Long, Long)].collect()
    assert(rows.sameElements(Array(
      ("0", 5L, 0L, 50L), ("1", 5L, 10L, -50L))))
  }

  test("quantileBucketDrift: identical slices give all-zero cross-terms; " +
      "constant column collapses to one bucket; NULLs dropped") {
    val a = Seq(Some(2.0), Some(2.0), Some(2.0), None).toDF("v")
    val rows = Quality.quantileBucketDrift(a, a, "v", nBuckets = 4)
      .as[(String, Long, Long, Long)].collect()
    assert(rows.length === 1)
    assert(rows.head === (("0", 3L, 3L, 0L)))
    intercept[IllegalArgumentException] {
      Quality.quantileBucketDrift(a, a, "v", nBuckets = 1)
    }
  }

  test("quantileBucketDrift deciles feed PSI: near-0 for same distribution, large for shifted") {
    val rnd = new scala.util.Random(11)
    val base = (0 until 2000).map(_ => rnd.nextDouble() * 100)
    val same = (0 until 2000).map(_ => rnd.nextDouble() * 100)
    val shifted = (0 until 2000).map(_ => 40 + rnd.nextDouble() * 100)
    def psi(xs: Seq[Double], ys: Seq[Double]): Double =
      Quality.populationStabilityIndex(
        Quality.quantileBucketDrift(xs.toDF("v"), ys.toDF("v"), "v"))
        .select("psi").as[Double].head()
    val (pSame, pShift) = (psi(base, same), psi(base, shifted))
    assert(pSame < 0.1, s"same-distribution PSI $pSame should be < 0.1")
    assert(pShift > 0.25, s"shifted-distribution PSI $pShift should be > 0.25")
  }

  test("populationStabilityIndex: 0 on identical slices, matches direct sum, grows with shift") {
    val a = Seq("x", "x", "y", "z").toDF("c")
    val same = Quality.populationStabilityIndex(
        Quality.chiSquareDrift(a, a, "c"))
      .select("psi").as[Double].head()
    assert(math.abs(same) < 1e-15)

    val b = Seq("x", "y", "y", "y").toDF("c")     // moderate shift
    val bb = Seq("y", "y", "y", "y").toDF("c")    // x and z vanish entirely
    def direct(ca: Seq[Long], cb: Seq[Long], eps: Double): Double = {
      val (na, nb, c) = (ca.sum.toDouble, cb.sum.toDouble, ca.length)
      (ca zip cb).map { case (x, y) =>
        val pa = (x + eps) / (na + eps * c); val pb = (y + eps) / (nb + eps * c)
        (pa - pb) * math.log(pa / pb)
      }.sum
    }
    val psiB = Quality.populationStabilityIndex(
        Quality.chiSquareDrift(a, b, "c")).select("psi").as[Double].head()
    // categories sorted: x(2,1) y(1,3) z(1,0)
    assert(math.abs(psiB - direct(Seq(2, 1, 1), Seq(1, 3, 0), 0.5)) < 1e-12)
    val psiBB = Quality.populationStabilityIndex(
        Quality.chiSquareDrift(a, bb, "c")).select("psi").as[Double].head()
    assert(psiBB > psiB && psiB > 0)
    intercept[IllegalArgumentException] {
      Quality.populationStabilityIndex(Quality.chiSquareDrift(a, b, "c"), 0.0)
    }
  }

  test("setSketches roll up by theta_union_agg to the ungrouped sketch") {
    // sketch per group, union-merge across groups == one global sketch
    val df = (0 until 500).map(i => (i % 7, i % 250)).toDF("g", "k")
    val perGroup = Quality.setSketches(df, "k", Seq("g"))
    val merged = perGroup
      .agg(theta_sketch_estimate(theta_union_agg(col("key_theta")))
        .as("distinct_est"))
      .select(col("distinct_est").cast("long")).as[Long].head()
    assert(merged === 250L) // exact mode: 250 < 2^12
  }
}
