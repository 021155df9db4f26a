package graft.functions

/** Student-t distribution tail math for per-group OLS p-values.
  *
  * The reference relies on scipy.stats.linregress' p-value
  * (/root/reference/deepicedrain/deltamath.py:45-67); Spark SQL has no
  * t-distribution CDF, so we implement the standard regularized
  * incomplete beta function I_x(a,b) (DLMF 8.17: continued-fraction
  * evaluation, modified Lentz algorithm) and the textbook identity
  *   two-sided p = I_{df/(df+t^2)}(df/2, 1/2).
  *
  * Pure, deterministic double math — safe to call from codegen'd
  * expressions (see [[TPValue]]).
  */
object StudentT {

  // Lanczos coefficients (g=7, n=9) — hoisted: lgamma runs 3-6x per
  // incbeta inside the codegen'd TPValue/TCdf row loop, and a fresh
  // 9-element allocation per call is pure garbage pressure there
  private val Lanczos = Array(
    0.99999999999980993, 676.5203681218851, -1259.1392167224028,
    771.32342877765313, -176.61502916214059, 12.507343278686905,
    -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)

  /** log Gamma via Lanczos approximation (g=7, n=9), |err| < 1e-13. */
  def lgamma(x: Double): Double = {
    val c = Lanczos
    if (x < 0.5) {
      // reflection: Γ(x)Γ(1−x) = π/sin(πx)
      math.log(math.Pi / math.sin(math.Pi * x)) - lgamma(1.0 - x)
    } else {
      val z = x - 1.0
      var a = c(0)
      var i = 1
      while (i < 9) { a += c(i) / (z + i); i += 1 }
      val t = z + 7.5
      0.5 * math.log(2.0 * math.Pi) + (z + 0.5) * math.log(t) - t + math.log(a)
    }
  }

  /** Continued fraction for I_x(a,b), modified Lentz algorithm. */
  private def betacf(a: Double, b: Double, x: Double): Double = {
    val FpMin = 1e-300
    val Eps = 1e-15
    val qab = a + b
    val qap = a + 1.0
    val qam = a - 1.0
    var c = 1.0
    var d = 1.0 - qab * x / qap
    if (math.abs(d) < FpMin) d = FpMin
    d = 1.0 / d
    var h = d
    var m = 1
    while (m <= 300) {
      val m2 = 2 * m
      // even step
      var aa = m * (b - m) * x / ((qam + m2) * (a + m2))
      d = 1.0 + aa * d
      if (math.abs(d) < FpMin) d = FpMin
      c = 1.0 + aa / c
      if (math.abs(c) < FpMin) c = FpMin
      d = 1.0 / d
      h *= d * c
      // odd step
      aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
      d = 1.0 + aa * d
      if (math.abs(d) < FpMin) d = FpMin
      c = 1.0 + aa / c
      if (math.abs(c) < FpMin) c = FpMin
      d = 1.0 / d
      val del = d * c
      h *= del
      if (math.abs(del - 1.0) < Eps) return h
      m += 1
    }
    h
  }

  /** Regularized incomplete beta I_x(a, b), 0 <= x <= 1. */
  def incbeta(a: Double, b: Double, x: Double): Double = {
    if (x.isNaN || a.isNaN || b.isNaN) return Double.NaN
    if (x <= 0.0) return 0.0
    if (x >= 1.0) return 1.0
    val lbeta = lgamma(a + b) - lgamma(a) - lgamma(b) +
      a * math.log(x) + b * math.log1p(-x)
    val front = math.exp(lbeta)
    // the symmetry branch's prefactor is the SAME lbeta (the x<->1-x,
    // a<->b swap leaves it invariant) — reuse front instead of paying
    // three more lgamma calls and an exp per row
    if (x < (a + 1.0) / (a + b + 2.0)) front * betacf(a, b, x) / a
    else 1.0 - front * betacf(b, a, 1.0 - x) / b
  }

  /** CDF of Student-t with `df` degrees of freedom. */
  def cdf(t: Double, df: Double): Double = {
    if (t.isNaN || df.isNaN || df <= 0) return Double.NaN
    val p = 0.5 * incbeta(df / 2.0, 0.5, df / (df + t * t))
    if (t >= 0) 1.0 - p else p
  }

  /** Two-sided p-value: P(|T_df| >= |t|) — scipy linregress semantics. */
  def pvalueTwoSided(t: Double, df: Double): Double = {
    if (t.isNaN || df.isNaN) return Double.NaN
    if (df <= 0) return Double.NaN
    if (t.isInfinite) return 0.0
    incbeta(df / 2.0, 0.5, df / (df + t * t))
  }
}
