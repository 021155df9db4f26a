package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.StudentT

/** Golden tests against closed-form t-distribution CDFs:
  * df=1: F(t) = 1/2 + atan(t)/pi; df=2: F(t) = 1/2 + t/(2*sqrt(2+t^2)).
  */
class StudentTSpec extends AnyFunSuite {

  private val ts = Seq(-10.0, -3.0, -1.0, -0.5, 0.0, 0.5, 1.0, 2.5, 10.0)

  test("cdf matches closed form for df=1") {
    for (t <- ts) {
      val want = 0.5 + math.atan(t) / math.Pi
      assert(math.abs(StudentT.cdf(t, 1.0) - want) < 1e-12, s"t=$t")
    }
  }

  test("cdf matches closed form for df=2") {
    for (t <- ts) {
      val want = 0.5 + t / (2.0 * math.sqrt(2.0 + t * t))
      assert(math.abs(StudentT.cdf(t, 2.0) - want) < 1e-12, s"t=$t")
    }
  }

  test("two-sided p-value symmetry and range") {
    for (t <- ts; df <- Seq(1.0, 2.0, 5.0, 30.0)) {
      val p = StudentT.pvalueTwoSided(t, df)
      assert(p >= 0.0 && p <= 1.0)
      assert(math.abs(p - StudentT.pvalueTwoSided(-t, df)) < 1e-13)
      val fromCdf = 2.0 * (1.0 - StudentT.cdf(math.abs(t), df))
      assert(math.abs(p - fromCdf) < 1e-12, s"t=$t df=$df")
    }
  }

  test("cdf is monotone in t and converges to normal-ish tails") {
    val vals = ts.map(StudentT.cdf(_, 7.0))
    assert(vals == vals.sorted)
    assert(StudentT.cdf(0.0, 100.0) == 0.5)
    assert(StudentT.pvalueTwoSided(Double.PositiveInfinity, 5.0) == 0.0)
  }

  test("incbeta endpoints and symmetry I_x(a,b) = 1 - I_{1-x}(b,a)") {
    assert(StudentT.incbeta(2.0, 3.0, 0.0) == 0.0)
    assert(StudentT.incbeta(2.0, 3.0, 1.0) == 1.0)
    for (x <- Seq(0.1, 0.3, 0.5, 0.7, 0.9)) {
      val lhs = StudentT.incbeta(2.5, 1.5, x)
      val rhs = 1.0 - StudentT.incbeta(1.5, 2.5, 1.0 - x)
      assert(math.abs(lhs - rhs) < 1e-12, s"x=$x")
    }
    // I_x(1,1) = x (uniform)
    for (x <- Seq(0.2, 0.5, 0.8))
      assert(math.abs(StudentT.incbeta(1.0, 1.0, x) - x) < 1e-12)
  }
}
