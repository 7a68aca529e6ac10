package graft.functions

/** The shared Hamming-band width ladder (the RpLsh.widthFor discipline
  * for banded Hamming-≤3 blocking, used by mm_phash_pairs and
  * simhash_pairs and their `*_width` oracle gates).
  *
  * With [[Bands]] = 4 disjoint bands over a 64-bit fingerprint,
  * random-collision candidate mass is 4·C(n,2)/2^16 — quadratic in the
  * corpus. The ladder keeps the mass ≤ 4n by construction: at
  * n = 2^17 exactly, 4·(n²/2)/2^16 = 4n, so [[Tier16MaxN]] is the
  * largest corpus the 16-bit tier serves at linear cost; past it a
  * 128-bit fingerprint's 32-bit bands hold the same bound to n = 2^33.
  * Pigeonhole blocking for Hamming ≤ [[HammingMax]] is
  * width-independent (4 disjoint bands cover ≤3 errors at any width).
  * Both engines derive the choice from the same COUNT(*) by exact
  * integer comparison — the `*_width` gates are the oracle-checked
  * decision rows.
  *
  * Streaming deployments CONFIGURE the width instead (no final n on an
  * unbounded stream — the StreamingEmbedDedup seam); the width is part
  * of any standing band store's layout and must not change across
  * restarts of one deployment.
  */
object BandLadder {
  val Bands = 4
  val HammingMax = Bands - 1
  val Tier16MaxN = 1L << 17

  def bitsFor(n: Long): Int = if (n <= Tier16MaxN) 16 else 32
}
