package graft.embed

import org.scalatest.funsuite.AnyFunSuite

/** Unit twin for the fixed-point ridge probe: the oracle gate
  * (linear_probe/probe_eval) proves Spark ≡ DuckDB on the same replayed
  * arithmetic; THIS spec proves the Richardson iteration actually
  * converges to the ridge solution on systems with known answers. */
class ProbeTrainSpec extends AnyFunSuite {

  test("pow2ceil is the smallest power of two >= x") {
    assert(ProbeTrain.pow2ceil(1) == 1)
    assert(ProbeTrain.pow2ceil(2) == 2)
    assert(ProbeTrain.pow2ceil(3) == 4)
    assert(ProbeTrain.pow2ceil(1023) == 1024)
    assert(ProbeTrain.pow2ceil(1024) == 1024)
    assert(ProbeTrain.pow2ceil((1L << 40) + 1) == (1L << 41))
  }

  // Realistic-magnitude 2x2: gram [[4,1],[1,3]]·2^28 (so the rescale
  // engages and λ sits in the regime the ledger assumes), b chosen so
  // the fixed point is well inside the clamp. The exact ridge solution
  // is computed in doubles from the SAME rescaled system.
  test("converges to the ridge solution of a known scaled 2x2") {
    val k = 1L << 28
    val gram = Seq((0, 0, 4 * k), (0, 1, 1 * k), (1, 1, 3 * k))
    val b = Array(5L << 20, -3L << 20)
    val p = ProbeTrain.train(gram, b)
    assert(p.dims == 2)

    // replay the rescales in doubles, then solve (A)w = bm·S exactly
    val gdiv = p.gdiv.toDouble
    val a00 = (4 * k / p.gdiv).toDouble + p.lam.toDouble
    val a01 = (1 * k / p.gdiv).toDouble
    val a11 = (3 * k / p.gdiv).toDouble + p.lam.toDouble
    val bm0 = (b(0) / p.bdiv).toDouble * ProbeTrain.WScale.toDouble
    val bm1 = (b(1) / p.bdiv).toDouble * ProbeTrain.WScale.toDouble
    val det = a00 * a11 - a01 * a01
    val w0 = (a11 * bm0 - a01 * bm1) / det
    val w1 = (a00 * bm1 - a01 * bm0) / det
    assert(gdiv >= 1.0)
    // 48 iterations at contraction <= (1 - lam_min/D) leave a small
    // residual; integer truncation adds O(Iters) more. 2% tolerance.
    assert(math.abs(p.w(0) - w0) <= math.abs(w0) * 0.02 + ProbeTrain.Iters,
      s"w0: got ${p.w(0)}, want ~$w0")
    assert(math.abs(p.w(1) - w1) <= math.abs(w1) * 0.02 + ProbeTrain.Iters,
      s"w1: got ${p.w(1)}, want ~$w1")
    assert(math.abs(p.w(0)) < ProbeTrain.WClamp && math.abs(p.w(1)) < ProbeTrain.WClamp,
      "fixed point must sit strictly inside the clamp in the normal regime")
  }

  test("scoring sign separates a linearly separable toy set") {
    // two clusters on an axis: positives at +e0, negatives at -e0,
    // quantized scale 2^17 per component (the realistic magnitude)
    val s = 1L << 17
    val pos = Seq(Array(4 * s, s), Array(3 * s, -s), Array(5 * s, 0L))
    val neg = Seq(Array(-4 * s, s), Array(-3 * s, -s), Array(-5 * s, 0L))
    val rows = pos.map((_, 1L)) ++ neg.map((_, -1L))
    // gram and b from the rows
    val g = Array.ofDim[Long](2, 2)
    val b = Array.ofDim[Long](2)
    rows.foreach { case (q, y) =>
      for (i <- 0 until 2; j <- 0 until 2) g(i)(j) += q(i) * q(j)
      for (i <- 0 until 2) b(i) += y * q(i)
    }
    val p = ProbeTrain.train(Seq((0, 0, g(0)(0)), (0, 1, g(0)(1)), (1, 1, g(1)(1))), b)
    rows.foreach { case (q, y) =>
      val score = q(0) * p.w(0) + q(1) * p.w(1)
      assert(score.sign == y.sign, s"row $q scored $score, want sign $y")
    }
  }

  test("clamp engages rather than overflowing on a degenerate tiny system") {
    // unscaled O(1) gram: the fixed point S/lambda >> clamp by design;
    // the iterate must saturate at +/-WClamp, not wrap
    val p = ProbeTrain.train(Seq((0, 0, 4L), (0, 1, 1L), (1, 1, 3L)),
      Array(10L, 5L))
    assert(p.w.forall(w => math.abs(w) <= ProbeTrain.WClamp))
    assert(p.w.exists(w => math.abs(w) == ProbeTrain.WClamp))
  }
}
