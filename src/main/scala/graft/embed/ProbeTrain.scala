package graft.embed

import graft.embed.PcaPower.tdiv

/** Ridge-regularized linear probe trained from the Gram matrix — the
  * linear-probe consumer the `gram_matrix` scaffold exists for (the
  * standard "is this embedding space linearly separable for my labels"
  * eval, and the cheap quality-classifier shape web-scale curation
  * pipelines train on weak labels).
  *
  * Formulation: least squares with ridge, solved by fixed-point
  * Richardson iteration on the NORMAL EQUATIONS — the only corpus-sized
  * work is the two distributed aggregations the driver consumes:
  *   G = Xᵀ X   (the shared `gram_matrix` stage, d(d+1)/2 cells)
  *   b = Xᵀ y   (one d-cell aggregation; y = ±1 one-vs-rest)
  * then w_{t+1} = w_t + (b·S − (G' + λI)·w_t) / D on the driver
  * (d = 64 longs; microseconds), and scoring is a map-only pass with
  * the broadcast w. At 100 TB nothing on the driver grows with the
  * data — the same bounded-collect class as PcaPower and the KMeans
  * centroids.
  *
  * Why Richardson and not an exact solve: Gaussian elimination on
  * integers suffers rational blow-up and an IEEE solve sums in
  * engine-dependent order; Richardson with a power-of-two step is pure
  * 64-bit integer arithmetic per iteration, so the DuckDB oracle
  * replays the SAME unrolled iterations (the PcaPower/IvfTrain
  * discipline) and hash-matches bit-for-bit. Convergence is guaranteed:
  * D ≥ trace(G') + λ ≥ λmax(G' + λI) makes the iteration a contraction
  * with factor ≤ 1 − λ/D ≤ 1 − 1/18 (λ = trace/8, D ≤ 2·(trace+λ)),
  * so Iters = 48 leaves < 7 % of the initial error — early-stopped
  * ridge, which is itself a regularizer.
  *
  * Magnitude ledger (no step can overflow signed 64-bit):
  *   - rescaled gram |g'| ≤ 2^31, λ ≤ trace/8 ≤ 2^34, |A| ≤ 2^35
  *   - rescaled |b'| ≤ 2^23, b'·S ≤ 2^47
  *   - iterate |w| ≤ WClamp = 2^21 (defensive clamp; the fixed point
  *     sits near ‖b'‖·S/λ ~ 2^13 in the normal regime, and the
  *     ridge-floor worst case ‖b'‖·S/λmin ≤ 2^23·2^24/2^27 = 2^20
  *     stays strictly inside it)
  *   - A·w sums 64 terms ≤ 2^35·2^21 = 2^56 → ≤ 2^62; r ≤ 2^62
  *   - scoring dot q·w sums 64 terms ≤ 2^20·2^19 → ≤ 2^45.
  */
object ProbeTrain {
  val GCap = PcaPower.GCap // 2^30 — same gram rescale as PcaPower
  val BCap = 1L << 22 // rescaled Xᵀy magnitude target
  val WScale = 1L << 24 // fixed-point scale of the learned w
  val WClamp = 1L << 21 // defensive iterate clamp (mirrored in SQL)
  val RidgeDiv = 8L // λ = max(trace/RidgeDiv, 1)
  val Iters = 48 // unrolled in the oracle — keep both in lockstep
  val PosLabel = 0 // one-vs-rest positive class: y = +1 iff label == 0

  /** Smallest power of two ≥ x (x ≥ 1). SQL mirror: MIN over a
    * 63-row powers-of-two table WHERE p >= x. */
  def pow2ceil(x: Long): Long = {
    require(x >= 1 && x <= (1L << 62), s"pow2ceil domain: $x")
    var p = 1L
    while (p < x) p <<= 1
    p
  }

  /** The trained probe. `w` is the fixed-point weight vector (scale
    * [[WScale]] relative to the rescaled system); only its DIRECTION
    * matters for scoring (sign of q·w), which is invariant to the
    * rescales. `lam`/`d` are the ridge and step denominators the oracle
    * must reproduce. */
  final case class Probe(dims: Int, w: Array[Long], gdiv: Long, bdiv: Long,
                         lam: Long, d: Long)

  /** Train from the upper-triangle Gram rows (i ≤ j) and the class
    * correlation b = Xᵀy. Deterministic: pure integer arithmetic from a
    * zero start vector. */
  def train(gramUpper: Seq[(Int, Int, Long)], b: Array[Long]): Probe = {
    require(gramUpper.nonEmpty, "empty gram")
    val dims = gramUpper.iterator.map(t => math.max(t._1, t._2)).max + 1
    require(b.length == dims, s"b has ${b.length} dims, gram has $dims")
    val g = Array.ofDim[Long](dims, dims)
    gramUpper.foreach { case (i, j, x) => g(i)(j) = x; g(j)(i) = x }
    val gmax = gramUpper.iterator.map(t => math.abs(t._3)).max
    val gdiv = math.max(gmax / GCap, 1L)
    val a = Array.tabulate(dims, dims)((i, j) => tdiv(g(i)(j), gdiv))
    val trace = (0 until dims).iterator.map(i => a(i)(i)).sum
    val lam = math.max(trace / RidgeDiv, 1L)
    var k = 0
    while (k < dims) { a(k)(k) += lam; k += 1 }
    val d = pow2ceil(trace + lam)
    val bmax = math.max(b.iterator.map(math.abs).max, 1L)
    val bdiv = math.max(bmax / BCap, 1L)
    val bm = b.map(tdiv(_, bdiv))

    var w = Array.fill(dims)(0L)
    for (_ <- 1 to Iters) {
      val prev = w
      w = Array.tabulate(dims) { i =>
        var aw = 0L
        var j = 0
        while (j < dims) { aw += a(i)(j) * prev(j); j += 1 }
        val next = prev(i) + tdiv(bm(i) * WScale - aw, d)
        if (next > WClamp) WClamp
        else if (next < -WClamp) -WClamp
        else next
      }
    }
    Probe(dims, w, gdiv, bdiv, lam, d)
  }
}
