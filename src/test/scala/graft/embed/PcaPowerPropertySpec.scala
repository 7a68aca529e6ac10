package graft.embed

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property test for the PcaPower overflow ledger (the ProbeTrain
  * twin): on random Grams X^T X built from components at the full
  * quantized magnitude, the 64-bit power iteration must agree EXACTLY
  * with a BigInt op-for-op replay — any silent wraparound in the
  * matrix-vector products, the renormalizing division, or the hi/lo
  * Rayleigh split would diverge the two. */
class PcaPowerPropertySpec extends AnyFunSuite {

  /** BigInt twin of [[PcaPower.power]], op-for-op. Returns (v, rayNumHi,
    * rayNumLo, rayDen). */
  private def powerBig(gramUpper: Seq[(Int, Int, Long)])
  : (Array[BigInt], BigInt, BigInt, BigInt) = {
    def tdiv(x: BigInt, d: BigInt): BigInt = if (x < 0) -((-x) / d) else x / d
    val dims = gramUpper.iterator.map(t => math.max(t._1, t._2)).max + 1
    val g = Array.fill(dims, dims)(BigInt(0))
    gramUpper.foreach { case (i, j, x) => g(i)(j) = BigInt(x); g(j)(i) = BigInt(x) }
    val gmax = gramUpper.iterator.map(t => BigInt(t._3).abs).max
    val gdiv = (gmax / PcaPower.GCap).max(1)
    val gm = Array.tabulate(dims, dims)((i, j) => tdiv(g(i)(j), gdiv))
    var v = Array.fill(dims)(BigInt(PcaPower.VCap))
    var prev = v
    var raw = Array.fill(dims)(BigInt(0))
    for (_ <- 1 to PcaPower.Iters) {
      prev = v
      raw = Array.tabulate(dims)(i => (0 until dims).map(j => gm(i)(j) * prev(j)).sum)
      val m = raw.iterator.map(_.abs).max.max(0)
      val dd = (m / PcaPower.VCap).max(1)
      v = raw.map(tdiv(_, dd))
    }
    val sh = BigInt(PcaPower.RayShift)
    val hi = raw.map(tdiv(_, sh))
    val numHi = (0 until dims).map(i => prev(i) * hi(i)).sum
    val numLo = (0 until dims).map(i => prev(i) * (raw(i) - sh * hi(i))).sum
    val den = prev.iterator.map(x => x * x).sum
    (v, numHi, numLo, den)
  }

  private val gramGen: Gen[Seq[(Int, Int, Long)]] = for {
    d <- Gen.chooseNum(2, 6)
    m <- Gen.chooseNum(1, 12)
    xs <- Gen.listOfN(m, Gen.listOfN(d, Gen.chooseNum(-(1L << 20), 1L << 20)))
  } yield for { i <- 0 until d; j <- i until d } yield {
    var s = 0L
    xs.foreach(row => s += row(i) * row(j))
    (i, j, s)
  }

  test("64-bit power iteration equals the BigInt replay on full-magnitude Grams") {
    var s = Seed(20260814L)
    for (_ <- 1 to 200) {
      val gram = gramGen.apply(Gen.Parameters.default, s)
        .getOrElse(throw new IllegalStateException("gen failed"))
      s = s.next
      val fast = PcaPower.power(gram)
      val (v, numHi, numLo, den) = powerBig(gram)
      fast.v.zip(v).zipWithIndex.foreach { case ((l, bi), i) =>
        assert(BigInt(l) == bi, s"v[$i] diverged: long=$l bigint=$bi (overflow?)")
      }
      assert(BigInt(fast.rayNumHi) == numHi, "Rayleigh hi diverged")
      assert(BigInt(fast.rayNumLo) == numLo, "Rayleigh lo diverged")
      assert(BigInt(fast.rayDen) == den, "Rayleigh den diverged")
    }
  }

  /** BigInt twin of [[PcaPower.powerK]] including the deflation step,
    * op-for-op. Returns per component (v, rayNumHi, rayNumLo, rayDen,
    * cumulative gdiv). */
  private def powerKBig(gramUpper: Seq[(Int, Int, Long)], k: Int)
  : Seq[(Array[BigInt], BigInt, BigInt, BigInt, BigInt)] = {
    def tdiv(x: BigInt, d: BigInt): BigInt = if (x < 0) -((-x) / d) else x / d
    val dims = gramUpper.iterator.map(t => math.max(t._1, t._2)).max + 1
    val g = Array.fill(dims, dims)(BigInt(0))
    gramUpper.foreach { case (i, j, x) => g(i)(j) = BigInt(x); g(j)(i) = BigInt(x) }
    val gmax = gramUpper.iterator.map(t => BigInt(t._3).abs).max
    val gdiv = (gmax / PcaPower.GCap).max(1)
    var gm = Array.tabulate(dims, dims)((i, j) => tdiv(g(i)(j), gdiv))
    var gdivTot = gdiv
    val out = Seq.newBuilder[(Array[BigInt], BigInt, BigInt, BigInt, BigInt)]
    for (c <- 0 until k) {
      var v = Array.fill(dims)(BigInt(PcaPower.VCap))
      var prev = v
      var raw = Array.fill(dims)(BigInt(0))
      for (_ <- 1 to PcaPower.Iters) {
        prev = v
        raw = Array.tabulate(dims)(i => (0 until dims).map(j => gm(i)(j) * prev(j)).sum)
        val m = raw.iterator.map(_.abs).max.max(0)
        val dd = (m / PcaPower.VCap).max(1)
        v = raw.map(tdiv(_, dd))
      }
      val sh = BigInt(PcaPower.RayShift)
      val hi = raw.map(tdiv(_, sh))
      val numHi = (0 until dims).map(i => prev(i) * hi(i)).sum
      val numLo = (0 until dims).map(i => prev(i) * (raw(i) - sh * hi(i))).sum
      val den = prev.iterator.map(x => x * x).sum
      out += ((v, numHi, numLo, den, gdivTot))
      if (c < k - 1) {
        val lam = tdiv(numHi, (den / sh).max(1))
        val vnsq = v.iterator.map(x => x * x).sum
        val vn2 = BigInt(2) * (vnsq / PcaPower.DefShift).max(1)
        val a = v.map(vi => tdiv(lam * vi, PcaPower.DefShift))
        val g2 = Array.tabulate(dims, dims)((i, j) =>
          gm(i)(j) - tdiv(a(i) * v(j) + a(j) * v(i), vn2))
        val m2 = g2.iterator.flatMap(_.iterator).map(_.abs).max.max(0)
        val gs = (m2 / PcaPower.GCap).max(1)
        gm = g2.map(_.map(tdiv(_, gs)))
        gdivTot *= gs
      }
    }
    out.result()
  }

  test("deflated top-k iteration equals the BigInt replay (deflation ledger holds)") {
    var s = Seed(20260812L)
    for (_ <- 1 to 120) {
      val gram = gramGen.apply(Gen.Parameters.default, s)
        .getOrElse(throw new IllegalStateException("gen failed"))
      s = s.next
      val fast = PcaPower.powerK(gram, 3)
      val big = powerKBig(gram, 3)
      fast.zip(big).zipWithIndex.foreach {
        case ((f, (bv, bHi, bLo, bDen, bGdiv)), c) =>
          f.v.zip(bv).zipWithIndex.foreach { case ((l, bi), i) =>
            assert(BigInt(l) == bi, s"c$c v[$i] diverged: long=$l bigint=$bi (overflow?)")
          }
          assert(BigInt(f.rayNumHi) == bHi, s"c$c Rayleigh hi diverged")
          assert(BigInt(f.rayNumLo) == bLo, s"c$c Rayleigh lo diverged")
          assert(BigInt(f.rayDen) == bDen, s"c$c Rayleigh den diverged")
          assert(BigInt(f.gdiv) == bGdiv, s"c$c cumulative gdiv diverged")
      }
    }
  }
}
