package graft.embed

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property test for the ProbeTrain overflow ledger: on random Grams
  * X^T X built from components at the full quantized magnitude
  * (|x| ≤ 2^20, the Similarity.quantized range), the 64-bit integer
  * training must agree EXACTLY with a BigInt replay of the same
  * algorithm — any silent wraparound in the A·w products, the b·S
  * residual, or the Rayleigh-style sums would diverge the two. Plain
  * scalacheck Gen with fixed seeds (scalatestplus bridge not on the
  * offline classpath — the DeriverPropertySpec pattern). */
class ProbeTrainPropertySpec extends AnyFunSuite {

  /** BigInt twin of [[ProbeTrain.train]], op-for-op. */
  private def trainBig(gramUpper: Seq[(Int, Int, Long)], b: Array[Long]): Array[BigInt] = {
    def tdiv(x: BigInt, d: BigInt): BigInt = if (x < 0) -((-x) / d) else x / d
    val dims = gramUpper.iterator.map(t => math.max(t._1, t._2)).max + 1
    val g = Array.fill(dims, dims)(BigInt(0))
    gramUpper.foreach { case (i, j, x) => g(i)(j) = BigInt(x); g(j)(i) = BigInt(x) }
    val gmax = gramUpper.iterator.map(t => BigInt(t._3).abs).max
    val gdiv = (gmax / ProbeTrain.GCap).max(1)
    val a = Array.tabulate(dims, dims)((i, j) => tdiv(g(i)(j), gdiv))
    val trace = (0 until dims).map(i => a(i)(i)).sum
    val lam = (trace / ProbeTrain.RidgeDiv).max(1)
    for (k <- 0 until dims) a(k)(k) += lam
    var dpow = BigInt(1)
    while (dpow < trace + lam) dpow *= 2
    val bmax = b.iterator.map(x => BigInt(x).abs).max.max(1)
    val bdiv = (bmax / ProbeTrain.BCap).max(1)
    val bm = b.map(x => tdiv(BigInt(x), bdiv))
    var w = Array.fill(dims)(BigInt(0))
    val clamp = BigInt(ProbeTrain.WClamp)
    for (_ <- 1 to ProbeTrain.Iters) {
      val prev = w
      w = Array.tabulate(dims) { i =>
        val aw = (0 until dims).map(j => a(i)(j) * prev(j)).sum
        val next = prev(i) + tdiv(bm(i) * ProbeTrain.WScale - aw, dpow)
        if (next > clamp) clamp else if (next < -clamp) -clamp else next
      }
    }
    w
  }

  private val caseGen: Gen[(Seq[(Int, Int, Long)], Array[Long])] = for {
    d <- Gen.chooseNum(2, 6)
    m <- Gen.chooseNum(1, 12)
    // components at the FULL quantized range the ledger assumes
    xs <- Gen.listOfN(m, Gen.listOfN(d, Gen.chooseNum(-(1L << 20), 1L << 20)))
    ys <- Gen.listOfN(m, Gen.oneOf(-1L, 1L))
  } yield {
    val gram = for { i <- 0 until d; j <- i until d } yield {
      var s = 0L
      xs.foreach(row => s += row(i) * row(j))
      (i, j, s)
    }
    val b = Array.tabulate(d) { i =>
      var s = 0L
      xs.zip(ys).foreach { case (row, y) => s += y * row(i) }
      s
    }
    (gram, b)
  }

  test("64-bit training equals the BigInt replay on full-magnitude Grams (no silent wraparound)") {
    val seed = Seed(20260814L)
    var s = seed
    var checked = 0
    for (_ <- 1 to 200) {
      val (params, nextSeed) = caseGen.apply(Gen.Parameters.default, s)
        .map(v => (v, s.next)).getOrElse(throw new IllegalStateException("gen failed"))
      s = nextSeed
      val (gram, b) = params
      val fast = ProbeTrain.train(gram, b)
      val big = trainBig(gram, b)
      assert(fast.w.length == big.length)
      fast.w.zip(big).zipWithIndex.foreach { case ((l, bi), i) =>
        assert(BigInt(l) == bi, s"dim $i diverged: long=$l bigint=$bi (overflow?)")
      }
      checked += 1
    }
    assert(checked == 200)
  }
}
