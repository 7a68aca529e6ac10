package graft.dedup

import graft.{SparkEntry, SparkTestBase}

/** lsh_recall — the banding frontier must agree with a brute-force
  * re-derivation from the signatures: exact-Jaccard ground truth and
  * per-config band-collision candidacy recomputed in Scala over the
  * same sample, then compared count-for-count. Also pins the frontier
  * shape: more bands of shorter rows can only ADD candidates whose
  * bands are nested refinements, so recall/candidates are monotone in
  * the band count. */
class LshRecallSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def sigRows() = MinHashLSH
    .signatures(graft.Tables.documents(spark, sf), "doc_id", "text")
    .filter(org.apache.spark.sql.functions.col("doc_id") < 200L)
    .collect()
    .map(r => (r.getLong(0), r.getSeq[Long](1).toSet, r.getSeq[Long](2).toVector))

  test("lsh_recall counts equal a brute-force re-derivation over the sample") {
    val out = SparkEntry.queries("lsh_recall")(spark, sf).collect()
      .map(r => ((r.getInt(0), r.getInt(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(out.size == 3)

    val sigs = sigRows()
    val pairs = for {
      (a, ash, asig) <- sigs; (b, bsh, bsig) <- sigs if a < b
    } yield {
      val inter = (ash & bsh).size
      val jac = inter.toDouble / (ash.size + bsh.size - inter)
      (jac >= 0.5, asig, bsig)
    }
    val nTruth = pairs.count(_._1).toLong
    out.foreach { case ((bands, rows), (truth, cands, caught)) =>
      assert(truth == nTruth, s"($bands,$rows) n_truth")
      def collide(x: Vector[Long], y: Vector[Long]): Boolean =
        (0 until bands).exists { b =>
          (0 until rows).forall(r => x(b * rows + r) == y(b * rows + r))
        }
      val bruteCands = pairs.count { case (_, x, y) => collide(x, y) }.toLong
      val bruteCaught = pairs.count { case (t, x, y) => t && collide(x, y) }.toLong
      assert(cands == bruteCands, s"($bands,$rows) n_cands")
      assert(caught == bruteCaught, s"($bands,$rows) n_caught")
    }
  }

  test("lsh_recall frontier is monotone in band count") {
    val rows = SparkEntry.queries("lsh_recall")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(2, 4, 8))
    // with NumHashes fixed, each wide band is the concatenation of two
    // narrower bands, so full agreement on a wide band implies full
    // agreement on both its halves: candidates(2,8) ⊆ candidates(4,4)
    // ⊆ candidates(8,2) — candidates and caught both non-decreasing
    assert(rows.map(_._2).toSeq == rows.map(_._2).sorted.toSeq, "n_cands monotone")
    assert(rows.map(_._3).toSeq == rows.map(_._3).sorted.toSeq, "n_caught monotone")
  }
}
