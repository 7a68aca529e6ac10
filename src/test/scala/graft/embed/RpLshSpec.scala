package graft.embed

import org.scalatest.funsuite.AnyFunSuite

/** Pure-driver properties of the adaptive RP-LSH width ladder — the
  * 100 TB argument as assertions: occupancy stays bounded and the
  * width is an exact integer function of n (no float log), so the
  * Scala side and the oracle's CASE chains can never disagree. */
class RpLshSpec extends AnyFunSuite {

  test("ceilLog2 is exact at and around every power of two") {
    for (b <- 1 to 40) {
      val p = 1L << b
      assert(RpLsh.ceilLog2(p) == b, s"2^$b")
      if (b >= 2) // 2^1 - 1 = 1 has ceil(log2) = 0, not 1
        assert(RpLsh.ceilLog2(p - 1) == b, s"2^$b - 1")
      assert(RpLsh.ceilLog2(p + 1) == b + 1, s"2^$b + 1")
    }
    assert(RpLsh.ceilLog2(1) == 0)
    assert(RpLsh.ceilLog2(0) == 0)
  }

  test("widthFor: occupancy bounded, monotone, clamped over the full ramp") {
    var prevBits = 0
    var prevTables = 0
    for (e <- 6 to 27) { // n = 64 … 134M vectors
      val n = 1L << e
      val (tables, bits) = RpLsh.widthFor(n)
      assert(bits >= RpLsh.MinBits && bits <= RpLsh.MaxBits)
      assert(tables >= 4 && tables <= RpLsh.MaxTables)
      assert(bits >= prevBits, s"bits not monotone at n=2^$e")
      assert(tables >= prevTables, s"tables not monotone at n=2^$e")
      // expected occupancy n / 2^bits stays in [2, 4] inside the
      // unclamped band — the linear-candidate-mass invariant
      if (bits > RpLsh.MinBits && bits < RpLsh.MaxBits) {
        val occ = n.toDouble / (1L << bits)
        assert(occ >= 2.0 && occ <= 4.0, s"occupancy $occ at n=2^$e")
      }
      prevBits = bits; prevTables = tables
    }
  }

  test("widthFor matches the oracle CASE-chain thresholds exactly") {
    // the SQL mirrors these seams; a drift here is what lsh_width gates
    val seams = Seq(
      1024L -> (4, 8), 1025L -> (4, 9),
      2048L -> (4, 9), 2049L -> (4, 10),
      4096L -> (4, 10), 4097L -> (6, 11),
      32768L -> (6, 13), 32769L -> (8, 14),
      131072L -> (8, 15), 131073L -> (8, 16))
    seams.foreach { case (n, want) =>
      assert(RpLsh.widthFor(n) == want, s"n=$n")
    }
  }

  test("plane grid covers the max width with full-dim rows") {
    for (t <- 0 until RpLsh.MaxTables; b <- 0 until RpLsh.MaxBits) {
      val p = RpLsh.plane(t, b)
      assert(p.length == RpLsh.Dim)
      assert(p.forall(x => x >= -1000 && x <= 1000))
    }
    // distinct planes (seeded generation must not alias rows)
    val distinct = (0 until RpLsh.MaxTables * RpLsh.MaxBits)
      .map(i => RpLsh.planes(i).toSeq).distinct.size
    assert(distinct == RpLsh.MaxTables * RpLsh.MaxBits)
  }
}
