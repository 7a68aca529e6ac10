package graft.embed

import graft.{SparkEntry, SparkTestBase}

/** Empirical recall of the IVF probe-2 search against brute-force kNN —
  * the approximation tradeoff measured, not asserted by folklore. With
  * 8 cells and nprobe=2 the probed fraction is ~25% of the corpus, so
  * recall well above that fraction demonstrates the cells actually
  * cluster the space (assignment by real cosine, not random routing).
  */
class IvfRecallSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.01"

  test("ivf_search@5 recall vs exact knn@5 is well above the probed fraction") {
    def pairs(name: String): Set[(Long, Long)] =
      SparkEntry.queries(name)(spark, sf)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val exact = pairs("knn_topk")
    val ivf = pairs("ivf_search")
    assert(exact.size == 50 && ivf.size == 50)

    val recall = (exact intersect ivf).size.toDouble / exact.size
    info(f"ivf probe-2 recall@5 = $recall%.2f")
    // probing 2 of 8 cells scans ~25%; random routing would land ~0.25
    assert(recall >= 0.5, f"recall $recall%.2f not above random-probe floor")
  }
}
