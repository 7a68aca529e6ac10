package graft.embed

import graft.{SparkEntry, SparkTestBase}

/** Two-stage PQ retrieval (ADC shortlist → exact re-rank): the
  * refinement's value is measured against brute-force kNN, not
  * asserted — exact re-ranking of the top-20 ADC candidates must beat
  * ranking by ADC distance alone on the same codebook. */
class PqRefineSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.01"

  private def pairs(name: String): Set[(Long, Long)] =
    SparkEntry.queries(name)(spark, sf)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("pq_refine: 5 rows per query, exact cosine order, refined recall above unrefined") {
    val refined = SparkEntry.queries("pq_refine")(spark, sf)
      .select("query_id", "neighbor_id", "cos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byQ = refined.groupBy(_._1)
    assert(byQ.size == 10)
    byQ.values.foreach(rs => assert(rs.length == 5))

    val exact = pairs("knn_topk")
    val unref = pairs("pq_search")
    val ref = refined.map(r => (r._1, r._2)).toSet
    val rUnref = (exact intersect unref).size.toDouble / exact.size
    val rRef = (exact intersect ref).size.toDouble / exact.size
    info(f"recall@5: pq_search=$rUnref%.2f pq_refine=$rRef%.2f")
    assert(rRef > rUnref,
      f"exact re-rank did not improve recall ($rRef%.2f vs $rUnref%.2f)")
  }

  test("pq_refine stage 2 re-scores with the TRUE exact quantized cosine") {
    import org.apache.spark.sql.functions._
    // recompute each refined pair's cosine independently from the raw
    // embeddings (the brute-force path) and demand bit-equality — stage
    // 2 must be exact scoring, not another approximation
    val e = graft.Tables.embeddings(spark, sf)
    val qd = Similarity.quantized(e, "vec_id", "embedding")
      .select(col("vec_id"), col("q"), col("nq"))
    val refined = SparkEntry.queries("pq_refine")(spark, sf)
      .select(col("query_id"), col("neighbor_id"), col("cos"))
    val recomputed = refined
      .join(qd.select(col("vec_id").as("query_id"), col("q").as("qq"),
        col("nq").as("qnq")), "query_id")
      .join(qd.select(col("vec_id").as("neighbor_id"), col("q"),
        col("nq")), "neighbor_id")
      .withColumn("dot", Similarity.dotQ("qq", "q"))
      .withColumn("cos2", Similarity.cosine(col("dot"), col("qnq"), col("nq")))
      .select(col("cos"), col("cos2"))
      .collect()
    assert(recomputed.length == 50)
    recomputed.foreach(r => assert(r.getDouble(0) == r.getDouble(1),
      s"refined cosine ${r.getDouble(0)} != exact ${r.getDouble(1)}"))
    // no self-pairs survive refinement
    assert(refined.filter(col("query_id") === col("neighbor_id")).count() == 0)
  }
}
