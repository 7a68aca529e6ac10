package graft

/** Pins the SharedStages memo contract: one materialization per
  * (session, dir, stage) — the in-session rendering of a pipeline's
  * materialized intermediate tables — and test-isolation via clear(). */
class SharedStagesSpec extends SparkTestBase {

  private val d = "/root/testdata/sf0.001"

  test("stages are memoized per (session, dir) and reset by clear()") {
    SharedStages.clear()
    try {
      val a = SharedStages.minhashSignatures(spark, d)
      val b = SharedStages.minhashSignatures(spark, d)
      assert(a eq b, "second call must return the memoized DataFrame")
      val p1 = SharedStages.verifiedPairs(spark, d)
      assert(p1 eq SharedStages.verifiedPairs(spark, d))
      SharedStages.clear()
      assert(!(a eq SharedStages.minhashSignatures(spark, d)),
        "clear() must drop the memo")
    } finally SharedStages.clear()
  }

  test("the memoized pair graph agrees with a from-scratch rebuild") {
    SharedStages.clear()
    try {
      val memod = SharedStages.verifiedPairs(spark, d)
        .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val sigs = graft.dedup.MinHashLSH
        .signatures(Tables.documents(spark, d), "doc_id", "text")
      val fresh = graft.dedup.MinHashLSH
        .verifiedPairs(graft.dedup.MinHashLSH.candidatePairs(sigs, "doc_id"),
          sigs, "doc_id", 0.5)
        .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(memod == fresh)
    } finally SharedStages.clear()
  }

  test("component labels cover exactly the nodes of the pair graph") {
    SharedStages.clear()
    try {
      val pairs = SharedStages.verifiedPairs(spark, d)
        .collect().flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
      val labeled = SharedStages.componentLabels(spark, d)
        .collect().map(_.getLong(0)).toSet
      assert(labeled == pairs)
    } finally SharedStages.clear()
  }
}
