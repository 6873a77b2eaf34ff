package graft.profile

/** Driver-side numerics for [[Profile.phik]] — the χ² → ρ inversion of
  * Baak et al. 2019 (arXiv:1811.11440, public): bin a standard
  * bivariate normal so its marginals match the observed marginal
  * fractions (bin edges at Φ⁻¹ of the cumulative fractions), compute
  * its χ² against independence as a function of ρ, and bisect for the
  * ρ that reproduces the observed χ². Everything here runs on the
  * DRIVER over a categorical-sized grid (levels × levels — guarded by
  * the caller), never over rows.
  *
  * Numerical recipe (all public classics):
  *   - Φ via erfc (commons-math3 `Erf`, Apache — on the Spark
  *     classpath), Φ⁻¹ via commons-math3 `NormalDistribution`;
  *   - bivariate-normal rectangle mass by reducing the double integral
  *     to ∫ φ(x)·[Φ((y₂−ρx)/√(1−ρ²)) − Φ((y₁−ρx)/√(1−ρ²))] dx per
  *     x-interval (the conditional-distribution factorization) and
  *     integrating with fixed 64-node Gauss–Legendre quadrature per
  *     interval (nodes by the standard Newton-on-Legendre-recurrence
  *     construction — Hildebrand, "Introduction to Numerical
  *     Analysis"; fully deterministic);
  *   - infinite outer edges clip at ±8.5 (Φ beyond is < 1e-17, under
  *     double noise), cell masses renormalize to Σ = 1 to absorb the
  *     ~1e-12 quadrature/clipping residue;
  *   - χ²_bvn(ρ) is monotone increasing on ρ ∈ [0, 1) for
  *     quantile-matched bins, so 60 bisection steps pin ρ to ~1e-10.
  *
  * Resolution envelope: the quadrature is exact to ≲1e-6 through
  * mid-range ρ (ProfileSpec pins the closed-form 2×2 equal-margin case
  * — Sheppard's orthant probability 1/4 + asin ρ / 2π); as ρ → 1 the
  * conditional Φ sharpens past the node spacing, so the reference
  * scale tops out at ρ = 0.9999 and stronger observed association
  * clamps to φk = 1 — the library behaves the same way at its own
  * grid resolution. */
object PhikMath {

  private val SQRT2 = math.sqrt(2.0)
  private val INV_SQRT_2PI = 1.0 / math.sqrt(2.0 * math.Pi)
  private val CLIP = 8.5
  private val RHO_MAX = 0.9999

  /** Standard normal CDF. */
  def stdNormCdf(x: Double): Double =
    0.5 * org.apache.commons.math3.special.Erf.erfc(-x / SQRT2)

  private lazy val stdNorm =
    new org.apache.commons.math3.distribution.NormalDistribution(0.0, 1.0)

  /** Standard normal quantile (Φ⁻¹). */
  def stdNormInv(p: Double): Double = stdNorm.inverseCumulativeProbability(p)

  /** 64-node Gauss–Legendre abscissas/weights on [−1, 1]: Newton on
    * the Legendre three-term recurrence from the Chebyshev initial
    * guess — deterministic, ~1e-15 node accuracy. */
  private lazy val (glNodes, glWeights): (Array[Double], Array[Double]) = {
    val m = 64
    val x = new Array[Double](m)
    val w = new Array[Double](m)
    var i = 0
    while (i < (m + 1) / 2) {
      var z = math.cos(math.Pi * (i + 0.75) / (m + 0.5))
      var pp = 0.0
      var diff = 1.0
      var guard = 0
      while (diff > 1e-15 && guard < 100) {
        var p1 = 1.0
        var p2 = 0.0
        var j = 0
        while (j < m) {
          val p3 = p2; p2 = p1
          p1 = ((2 * j + 1) * z * p2 - j * p3) / (j + 1)
          j += 1
        }
        pp = m * (z * p1 - p2) / (z * z - 1.0)
        val z1 = z
        z = z1 - p1 / pp
        diff = math.abs(z - z1)
        guard += 1
      }
      x(i) = -z; x(m - 1 - i) = z
      val wi = 2.0 / ((1.0 - z * z) * pp * pp)
      w(i) = wi; w(m - 1 - i) = wi
      i += 1
    }
    (x, w)
  }

  private def clamp(v: Double): Double = math.max(-CLIP, math.min(CLIP, v))

  /** Bin edges at Φ⁻¹ of the cumulative marginal fractions; outer
    * edges ±∞ (clipped at integration time). */
  private def edges(p: Array[Double]): Array[Double] = {
    val e = new Array[Double](p.length + 1)
    e(0) = Double.NegativeInfinity
    var cum = 0.0
    var i = 0
    while (i < p.length - 1) {
      cum += p(i)
      e(i + 1) = stdNormInv(math.min(1.0 - 1e-16, math.max(1e-16, cum)))
      i += 1
    }
    e(p.length) = Double.PositiveInfinity
    e
  }

  /** Cell masses of the binned standard bivariate normal at corr ρ,
    * renormalized to Σ = 1. */
  private def cellProbs(rho: Double, xe: Array[Double],
                        ye: Array[Double]): Array[Array[Double]] = {
    val r = xe.length - 1
    val c = ye.length - 1
    val s = math.sqrt(math.max(1e-12, 1.0 - rho * rho))
    val p = Array.ofDim[Double](r, c)
    var i = 0
    while (i < r) {
      val a = math.max(-CLIP, xe(i))
      val b = math.min(CLIP, xe(i + 1))
      if (b > a) {
        // composite rule: 4 equal panels per interval keep the sharp
        // conditional Φ (width ~√(1−ρ²) as ρ → 1) resolved even when
        // its transition lands mid-interval
        val panels = 4
        var pn = 0
        while (pn < panels) {
          val pa = a + (b - a) * pn / panels
          val pb = a + (b - a) * (pn + 1) / panels
          val half = 0.5 * (pb - pa)
          val mid = 0.5 * (pa + pb)
          var m = 0
          while (m < glNodes.length) {
            val xv = mid + half * glNodes(m)
            val wphi = glWeights(m) * half * INV_SQRT_2PI *
              math.exp(-0.5 * xv * xv)
            var prev = stdNormCdf(clamp((ye(0) - rho * xv) / s))
            var j = 0
            while (j < c) {
              val cur = stdNormCdf(clamp((ye(j + 1) - rho * xv) / s))
              p(i)(j) += wphi * (cur - prev)
              prev = cur
              j += 1
            }
            m += 1
          }
          pn += 1
        }
      }
      i += 1
    }
    var tot = 0.0
    var ii = 0
    while (ii < r) {
      var j = 0
      while (j < c) { tot += p(ii)(j); j += 1 }
      ii += 1
    }
    if (tot > 0) {
      ii = 0
      while (ii < r) {
        var j = 0
        while (j < c) { p(ii)(j) /= tot; j += 1 }
        ii += 1
      }
    }
    p
  }

  /** Solve χ²_bvn(ρ) = chi2Obs for ρ ∈ [0, 1] — the φk inversion.
    * `pRow`/`pCol` are the observed marginal fractions (Σ = 1 each). */
  def invert(chi2Obs: Double, n: Long, pRow: Array[Double],
             pCol: Array[Double]): Double = {
    require(n > 0, s"n must be > 0, got $n")
    if (chi2Obs <= 0.0) return 0.0
    val xe = edges(pRow)
    val ye = edges(pCol)
    def chi2At(rho: Double): Double = {
      val p = cellProbs(rho, xe, ye)
      var chi = 0.0
      var i = 0
      while (i < pRow.length) {
        var j = 0
        while (j < pCol.length) {
          val e = pRow(i) * pCol(j)
          if (e > 0) {
            val d = p(i)(j) - e
            chi += d * d / e
          }
          j += 1
        }
        i += 1
      }
      n * chi
    }
    if (chi2Obs >= chi2At(RHO_MAX)) return 1.0
    var lo = 0.0
    var hi = RHO_MAX
    var it = 0
    while (it < 60 && hi - lo > 1e-10) {
      val mid = 0.5 * (lo + hi)
      if (chi2At(mid) < chi2Obs) lo = mid else hi = mid
      it += 1
    }
    0.5 * (lo + hi)
  }
}
