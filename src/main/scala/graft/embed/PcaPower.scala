package graft.embed

/** Fixed-point power iteration on the (driver-sized) Gram matrix — the
  * PCA consumer the `gram_matrix` scaffold exists for: top principal
  * component + eigenvalue estimate + explained-variance ratio, then a
  * distributed map-only projection of every embedding onto the
  * component (`pca_project`).
  *
  * Why fixed-point integers and not doubles: the whole pipeline's
  * determinism discipline is "exact integer arithmetic everywhere a SUM
  * happens; IEEE only for element-wise final steps" — a double matrix-
  * vector product sums 64 terms in engine-dependent order and would
  * never hash-match an oracle. Here EVERY iteration is exact 64-bit
  * integer arithmetic (multiplies, adds, sign-decomposed truncating
  * division), so DuckDB replaying the same unrolled iterations (the
  * IvfTrain discipline) produces bit-identical vectors, and the only
  * IEEE steps are two element-wise divides at the very end — mirrored
  * operation-for-operation in the oracle SQL.
  *
  * Scale shape: the Gram collect is d·(d+1)/2 = 2 080 cells regardless
  * of corpus size (the same bounded-collect class as the KMeans
  * centroids), the iteration is O(d²·T) driver work (microseconds), and
  * the projection broadcasts d longs — at 100 TB nothing here grows
  * with the data; the corpus-sized work stays in the distributed Gram
  * aggregation and the map-only projection scan.
  *
  * Magnitude ledger (no step can overflow signed 64-bit):
  *   - rescaled gram |g'| ≤ 2·2^30, iterate |v| ≤ 2·2^15
  *   - raw_i = Σ_j g'·v over d=64 terms ≤ 2^6·2^31·2^16 = 2^53
  *   - Rayleigh hi = Σ v·(raw DIV 2^16) ≤ 64·2^16·2^37 = 2^59;
  *     lo = Σ v·(raw mod-like remainder) ≤ 64·2^16·2^16 = 2^38.
  */
object PcaPower {
  val GCap = 1L << 30 // rescaled-gram magnitude target
  val VCap = 1L << 15 // iterate magnitude target (fixed-point scale)
  val Iters = 12 // unrolled in the oracle — keep both in lockstep
  val RayShift = 65536L // 2^16: Rayleigh numerator downshift
  val DefShift = 256L // 2^8: deflation factor downshift (see deflate)
  val NumComponents = 4 // top-k components learned by powerK

  /** Truncate-toward-zero division, expressed as sign·(abs DIV d) so
    * the SQL mirror (DuckDB `//` is floor division) agrees on
    * negatives: floor(abs)/trunc(abs) coincide on non-negatives. */
  def tdiv(x: Long, d: Long): Long =
    if (x < 0) -(math.abs(x) / d) else x / d

  /** The learned component. `v` is the fixed-point eigenvector (scale
    * ~[[VCap]]); `lambdaEst` estimates the RESCALED gram's dominant
    * eigenvalue (multiply by `gdiv` for the original's); `evRatio` is
    * the explained-variance share λ/trace of the original Gram.
    *
    * The Rayleigh numerator Σ v·raw would need ~2^69 — so it is carried
    * EXACTLY as a hi/lo pair around [[RayShift]]: v·raw = Shift·(v·hi)
    * + v·(raw − Shift·hi), each sum < 2^60, recombined by two
    * element-wise IEEE ops (deterministic — no reassociated double
    * sums anywhere). */
  final case class Component(dims: Int, v: Array[Long], gdiv: Long,
                             rayNumHi: Long, rayNumLo: Long, rayDen: Long,
                             trace: Long) {
    def lambdaEst: Double =
      (rayNumHi.toDouble * RayShift.toDouble + rayNumLo.toDouble) / rayDen.toDouble
    def evRatio: Double = (lambdaEst * gdiv.toDouble) / trace.toDouble
    def vNormSq: Long = v.iterator.map(x => x * x).sum
  }

  /** Power-iterate the upper-triangle Gram rows (i ≤ j). Deterministic:
    * pure integer arithmetic from a fixed all-ones start vector. */
  def power(gramUpper: Seq[(Int, Int, Long)]): Component =
    powerK(gramUpper, 1).head

  /** Top-k components by Hotelling deflation on the driver-sized
    * rescaled Gram — the full ABTT formulation (Mu & Viswanath '18
    * removes the top k ≈ d/100…d/10 directions, not just the first).
    * After each component, subtract its rank-1 term λ·v·vᵀ/‖v‖² in the
    * same exact-integer discipline (see [[deflate]]) and re-rescale so
    * the magnitude ledger of the next iteration is identical to the
    * first's; each [[Component]]'s `gdiv` carries the CUMULATIVE
    * divisor, so `evRatio` (λ·gdiv/trace of the ORIGINAL Gram) stays
    * correct per component. Component 0 is bit-identical to [[power]]
    * of rounds ≤ 11 (same loop, same ledger — PcaPowerSpec pins it).
    *
    * Driver cost is O(k·d²·Iters) integer ops on a d = 64 matrix;
    * nothing grows with the corpus. Degenerate Grams with rank < k
    * yield zero iterates (λ→0) rather than failing — callers see the
    * ev_ratio collapse. */
  def powerK(gramUpper: Seq[(Int, Int, Long)], k: Int): Seq[Component] = {
    require(gramUpper.nonEmpty, "empty gram")
    require(k >= 1, s"k must be >= 1, got $k")
    val dims = gramUpper.iterator.map(t => math.max(t._1, t._2)).max + 1
    val g = Array.ofDim[Long](dims, dims)
    gramUpper.foreach { case (i, j, x) => g(i)(j) = x; g(j)(i) = x }
    val trace = (0 until dims).iterator.map(i => g(i)(i)).sum
    val gmax = gramUpper.iterator.map(t => math.abs(t._3)).max
    val gdiv = math.max(gmax / GCap, 1L)
    var gm = Array.tabulate(dims, dims)((i, j) => tdiv(g(i)(j), gdiv))
    var gdivTot = gdiv
    val out = Seq.newBuilder[Component]
    for (c <- 0 until k) {
      val comp = iterate(gm, dims, gdivTot, trace)
      out += comp
      if (c < k - 1) {
        val (next, gs) = deflate(gm, dims, comp)
        gm = next
        gdivTot *= gs
      }
    }
    out.result()
  }

  /** One full power iteration on a rescaled Gram (|g| ≤ 2·2^30). */
  private def iterate(gm: Array[Array[Long]], dims: Int,
                      gdivTot: Long, trace: Long): Component = {
    var v = Array.fill(dims)(VCap)
    var prev = v
    var raw = new Array[Long](dims)
    for (_ <- 1 to Iters) {
      prev = v
      raw = Array.tabulate(dims) { i =>
        var acc = 0L
        var j = 0
        while (j < dims) { acc += gm(i)(j) * prev(j); j += 1 }
        acc
      }
      val m = math.max(raw.iterator.map(math.abs).max, 0L)
      val dd = math.max(m / VCap, 1L)
      v = raw.map(tdiv(_, dd))
    }
    val hi = raw.map(tdiv(_, RayShift))
    val numHi = (0 until dims).iterator.map(i => prev(i) * hi(i)).sum
    val numLo = (0 until dims).iterator
      .map(i => prev(i) * (raw(i) - RayShift * hi(i))).sum
    val den = prev.iterator.map(x => x * x).sum
    Component(dims, v, gdivTot, numHi, numLo, den, trace)
  }

  /** Exact-integer Hotelling deflation: gm' = gm − λ·(v·vᵀ)/‖v‖²,
    * then re-rescale to the |g| ≤ 2·2^30 ledger. The rank-1 term is
    * symmetrized as (a_i·v_j + a_j·v_i)/(2·‖v‖²>>8) with
    * a = (λ·v)>>8 so every product fits signed 64-bit on a PSD Gram:
    *   λ = numHi DIV max(den>>16, 1) ≤ trace(gm) ≤ 2^37
    *   a_i = λ·v_i DIV 2^8 ≤ 2^45;  a_i·v_j ≤ 2^61, sum of two ≤ 2^62
    *   2·(‖v‖²>>8) ≥ 2^23 (∞-norm of v is ≥ VCap after normalize)
    * The ±1 truncation noise per step is deterministic — the DuckDB
    * oracle replays the identical divisions — and irrelevant to the
    * deflation's purpose (the next iteration re-converges). Returns
    * (rescaled gm', rescale divisor). */
  private[embed] def deflate(gm: Array[Array[Long]], dims: Int,
                             comp: Component): (Array[Array[Long]], Long) = {
    val lam = tdiv(comp.rayNumHi, math.max(comp.rayDen / RayShift, 1L))
    val vn2 = 2L * math.max(comp.vNormSq / DefShift, 1L)
    val a = comp.v.map(vi => tdiv(lam * vi, DefShift))
    val g2 = Array.tabulate(dims, dims)((i, j) =>
      gm(i)(j) - tdiv(a(i) * comp.v(j) + a(j) * comp.v(i), vn2))
    val m = math.max(g2.iterator.flatMap(_.iterator).map(math.abs).max, 0L)
    val gs = math.max(m / GCap, 1L)
    (g2.map(_.map(tdiv(_, gs))), gs)
  }
}
