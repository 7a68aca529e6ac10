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

  test("simhash_pairs: pairs are canonical (a < b) and never self-pairs") {
    val df = SparkEntry.queries("simhash_pairs")(spark, sf)
    assert(df.filter(col("a_id") >= col("b_id")).count() == 0)
    // distinct collapsed multi-band collisions: no duplicate pairs
    assert(df.count() == df.select("a_id", "b_id").distinct().count())
  }
}
