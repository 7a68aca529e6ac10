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

  test("powerK component 0 is bit-identical to power (rounds <= 11 contract)") {
    val gram = Seq((0, 0, 4L << 40), (0, 1, 1L << 40), (1, 1, 3L << 40))
    val one = PcaPower.power(gram)
    val k = PcaPower.powerK(gram, 3)
    assert(k.head.v.sameElements(one.v))
    assert(k.head.rayNumHi == one.rayNumHi)
    assert(k.head.rayNumLo == one.rayNumLo)
    assert(k.head.rayDen == one.rayDen)
    assert(k.head.gdiv == one.gdiv)
  }

  test("powerK recovers a known diagonal spectrum in order via deflation") {
    // diag(100, 50, 20, 5)·2^25 — large magnitudes so the fixed-point
    // truncation noise is relatively tiny; eigenvectors are the axes.
    val m = 1L << 25
    val gram = Seq((0, 0, 100 * m), (1, 1, 50 * m), (2, 2, 20 * m), (3, 3, 5 * m))
    val comps = PcaPower.powerK(gram, 4)
    val evs = Seq(100.0, 50.0, 20.0, 5.0)
    comps.zipWithIndex.foreach { case (c, idx) =>
      val dominantAxis = c.v.zipWithIndex.maxBy { case (x, _) => math.abs(x) }._2
      assert(dominantAxis == idx, s"component $idx locked axis $dominantAxis")
      val lamOrig = c.lambdaEst * c.gdiv.toDouble / m.toDouble
      assert(math.abs(lamOrig - evs(idx)) / evs(idx) < 0.02,
        s"component $idx lambda $lamOrig != ${evs(idx)}")
      assert(math.abs(c.evRatio - evs(idx) / 175.0) < 0.01,
        s"component $idx ev_ratio ${c.evRatio}")
    }
  }

  test("deflated components are near-orthogonal on a dense PSD gram") {
    // Gram of X with correlated columns — deflation must still produce
    // components that are pairwise near-orthogonal (cos < 0.05).
    val rnd = new scala.util.Random(11)
    val d = 6
    val rows = Array.fill(40)(Array.fill(d)(rnd.nextInt(1 << 18).toLong))
    val gram = for (i <- 0 until d; j <- i until d) yield {
      var s = 0L
      rows.foreach(r => s += (r(i) >> 4) * (r(j) >> 4))
      (i, j, s)
    }
    val comps = PcaPower.powerK(gram, 3)
    for (a <- comps.indices; b <- a + 1 until comps.size) {
      val va = comps(a).v; val vb = comps(b).v
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- 0 until d) {
        dot += va(i).toDouble * vb(i).toDouble
        na += va(i).toDouble * va(i).toDouble
        nb += vb(i).toDouble * vb(i).toDouble
      }
      val cos = math.abs(dot) / math.sqrt(na * nb)
      // 12 fixed iterations can't fully separate near-degenerate lower
      // eigenpairs (convergence ∝ (λ_b/λ_a)^Iters), so allow a small mix
      assert(cos < 0.1, s"components $a,$b not orthogonal: cos=$cos")
    }
    // eigenvalue estimates non-increasing in original units
    val lams = comps.map(c => c.lambdaEst * c.gdiv.toDouble)
    assert(lams == lams.sortBy(-_), s"eigenvalues out of order: $lams")
  }
}
