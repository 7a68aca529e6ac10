package graft.dedup

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkTestBase, Tables}

/** Banded simhash near-dup search: the 4×8-bit band blocking must be
  * LOSSLESS for Hamming distance ≤ 3 — the query's pair set is compared
  * against a brute-force all-pairs popcount, not merely spot-checked. */
class SimhashPairsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("simhash_pairs equals brute-force all-pairs Hamming <= 3 (lossless blocking)") {
    val got = SparkEntry.queries("simhash_pairs")(spark, sf)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2)))
      .toMap

    val sims = SimHash.simhash(Tables.documents(spark, sf), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (a, sa) <- sims; (b, sb) <- sims if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield ((a, b), h)).toMap

    assert(got == brute,
      s"blocking lost/invented pairs: got ${got.size}, brute ${brute.size}")
    assert(got.nonEmpty, "corpus should contain simhash near-dups")
    // every emitted distance is a true popcount of the two fingerprints
    got.foreach { case (_, h) => assert(h >= 0 && h <= 3) }
  }

  test("16-bit bands cut the candidate budget vs 8-bit bands on the same fingerprints") {
    // The scale argument for the 64-bit/4×16 upgrade, measured: band
    // candidates are the verify stage's input, and an 8-bit band has
    // only 256 bucket values (collision floor ~n²/256 per band) where a
    // 16-bit band has 65 536. Both bandings run over the SAME 64-bit
    // fingerprints here, so the comparison isolates exactly the width
    // lever. (Semantically related docs beyond Hamming 3 still collide
    // on full bands — correlated votes — so an absolute true-pair floor
    // is not assertable; the width RATIO is.)
    def candidates(bandBits: Int): Long = {
      val bands = 64 / bandBits
      val mask = (1L << bandBits) - 1
      (for {
        b <- 0 until bands
        (_, bucket) <- sims.groupBy { case (_, s) => (s >>> (b * bandBits)) & mask }
      } yield bucket.length.toLong * (bucket.length - 1) / 2).sum
    }
    lazy val sims = SimHash.simhash(Tables.documents(spark, sf), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = sims.length.toLong
    val c16 = candidates(16)
    val c8 = candidates(8)
    assert(c16 * 2 <= c8,
      s"16-bit banding should at least halve the 8-bit budget: $c16 vs $c8")
    assert(c16 < n * (n - 1) / 2,
      s"budget must beat all-pairs: $c16 vs ${n * (n - 1) / 2}")
  }

  test("simhash_pairs: pairs are canonical (a < b) and never self-pairs") {
    val df = SparkEntry.queries("simhash_pairs")(spark, sf)
    assert(df.filter(col("a_id") >= col("b_id")).count() == 0)
    // distinct collapsed multi-band collisions: no duplicate pairs
    assert(df.count() == df.select("a_id", "b_id").distinct().count())
  }

  test("simhash128: the low long IS the 64-bit fingerprint") {
    // bits 0-63 vote on the same md5 words as simhash (chars 1-8/9-16
    // of one digest), so the wide tier embeds the narrow one exactly —
    // the seam a Scala<->SQL drift in the new words would break first
    val s64 = SimHash.simhash(Tables.documents(spark, sf), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s128 = SimHash.simhash128(Tables.documents(spark, sf), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(s128.keySet == s64.keySet)
    s128.foreach { case (id, (lo, hi)) =>
      assert(lo == s64(id), s"doc $id lo != simhash")
      assert(hi != 0L || lo == 0L || s128.size < 2,
        s"doc $id hi should carry real votes") // hi is a real fingerprint
    }
  }

  test("32-bit-band tier: lossless blocking vs brute force over 128 bits") {
    val sims = SimHash.simhash128(Tables.documents(spark, sf), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = (for {
      (a, al, ah) <- sims; (b, bl, bh) <- sims if a < b
      h = java.lang.Long.bitCount(al ^ bl) + java.lang.Long.bitCount(ah ^ bh)
      if h <= 3
    } yield ((a, b), h)).toMap
    val got = graft.queries.DedupQueries
      .buildSimhashPairsAt(spark, sf, 32)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(got == brute,
      s"wide-tier blocking lost/invented pairs: got ${got.size}, brute ${brute.size}")
  }

  test("band ladder seam: exact threshold shared with the mm family") {
    import graft.functions.BandLadder
    assert(BandLadder.bitsFor(BandLadder.Tier16MaxN) == 16)
    assert(BandLadder.bitsFor(BandLadder.Tier16MaxN + 1) == 32)
    // the seam is the point where the 16-bit tier's random-collision
    // mass exactly meets the 4n budget
    val n = BandLadder.Tier16MaxN
    assert(4 * (BigInt(n) * (n - 1) / 2) >> 16 <= BigInt(4) * n)
  }
}
