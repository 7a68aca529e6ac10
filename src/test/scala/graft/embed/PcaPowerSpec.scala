package graft.embed

import org.scalatest.funsuite.AnyFunSuite

/** Unit twin for the fixed-point power iteration: the oracle gate
  * (pca_power/pca_project) proves Spark ≡ DuckDB on the same replayed
  * arithmetic; THIS spec proves the arithmetic converges to the actual
  * dominant eigenpair on matrices with known spectra. */
class PcaPowerSpec extends AnyFunSuite {

  // [[4,1],[1,3]]: eigenvalues (7 ± √5)/2 → λ₁ ≈ 4.618, dominant
  // eigenvector direction [1, (√5−1)/2 ≈ 0.618]
  private val lam1 = (7.0 + math.sqrt(5.0)) / 2.0

  test("converges to the dominant eigenpair of a known 2x2") {
    val c = PcaPower.power(Seq((0, 0, 4L), (0, 1, 1L), (1, 1, 3L)))
    assert(c.dims == 2)
    val ratio = c.v(1).toDouble / c.v(0).toDouble
    assert(math.abs(ratio - 0.6180) < 0.01, s"direction off: $ratio")
    assert(c.gdiv == 1L) // tiny magnitudes: no rescale
    assert(math.abs(c.lambdaEst - lam1) < 0.05, s"lambda off: ${c.lambdaEst}")
    // explained-variance share = λ₁ / trace = 4.618 / 7
    assert(math.abs(c.evRatio - lam1 / 7.0) < 0.01, s"ev off: ${c.evRatio}")
  }

  test("rescale path: 2^40-scaled magnitudes keep direction and ev ratio") {
    val k = 1L << 40
    val c = PcaPower.power(Seq((0, 0, 4 * k), (0, 1, k), (1, 1, 3 * k)))
    assert(c.gdiv > 1L) // the rescale actually engaged
    val ratio = c.v(1).toDouble / c.v(0).toDouble
    assert(math.abs(ratio - 0.6180) < 0.01, s"direction off: $ratio")
    assert(math.abs(c.evRatio - lam1 / 7.0) < 0.01, s"ev off: ${c.evRatio}")
    // λ of the original matrix ≈ λ' · gdiv
    assert(math.abs(c.lambdaEst * c.gdiv.toDouble / k.toDouble - lam1) < 0.1)
  }

  test("tdiv is truncate-toward-zero (the floor//abs mirror contract)") {
    assert(PcaPower.tdiv(7, 2) == 3)
    assert(PcaPower.tdiv(-7, 2) == -3) // floor would give -4
    assert(PcaPower.tdiv(0, 5) == 0)
  }

  test("residuals are near-orthogonal to the component (the ABTT contract)") {
    // r = q·‖v‖² − (q·v)·v is exactly orthogonal to v in rationals; the
    // only error is the DIV 2^32 downshift. Check on a synthetic q.
    val c = PcaPower.power(Seq((0, 0, 4L), (0, 1, 1L), (1, 1, 3L)))
    val vn = c.vNormSq
    val q = Array(123456L, -98765L)
    val proj = q(0) * c.v(0) + q(1) * c.v(1)
    val r = Array(q(0) * vn - proj * c.v(0), q(1) * vn - proj * c.v(1))
    // exact form: r·v = (q·v)·‖v‖² − (q·v)·‖v‖² = 0
    assert(r(0) * c.v(0) + r(1) * c.v(1) == 0L)
  }

  test("identity-like diagonal: all-ones start is already the fixpoint scale") {
    val c = PcaPower.power(Seq((0, 0, 5L), (1, 1, 5L)))
    // degenerate spectrum: vector stays proportional to the start
    assert(c.v(0) == c.v(1))
    assert(math.abs(c.lambdaEst - 5.0) < 0.01)
  }
}
