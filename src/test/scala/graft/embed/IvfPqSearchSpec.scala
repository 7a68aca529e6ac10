package graft.embed

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkTestBase}

/** ivf_pq_search — the three-level composition (IVF cells → PQ ADC →
  * exact re-rank) must stay consistent with its component operators:
  * every result lies inside the query's probed IVF cells, stage-3
  * cosines are the true exact quantized cosines, and the composed
  * search cannot out-return its own candidate set. */
class IvfPqSearchSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.01"

  test("ivf_pq_search results are probed-cell candidates with exact re-rank order") {
    val out = SparkEntry.queries("ivf_pq_search")(spark, sf)
      .select("query_id", "neighbor_id", "adist", "cos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val byQ = out.groupBy(_._1)
    assert(byQ.size == 10)
    byQ.values.foreach { rs =>
      assert(rs.length <= 5 && rs.nonEmpty)
      val sorted = rs.sortBy(r => (-r._4, r._2))
      assert(rs.sortBy(_._2).toSeq == sorted.sortBy(_._2).toSeq)
    }

    // containment: every (query, neighbor) must be assigned to one of
    // the query's nprobe probed cells — recompute cells via ivf_assign
    val cellOf = SparkEntry.queries("ivf_assign")(spark, sf)
      .select("vec_id", "cell")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // probed cells per query: the IVF search must only ever see these
    val e = graft.Tables.embeddings(spark, sf)
    val qd = Similarity.quantized(e, "vec_id", "embedding")
      .select(col("vec_id"), col("q"), col("nq"))
    val seeds = graft.SharedStages.ivfCentroids(spark, sf)
    val probed = qd.filter(col("vec_id") < 10)
      .crossJoin(broadcast(seeds))
      .withColumn("dot", Similarity.dotQ("q", "sq"))
      .withColumn("cos", Similarity.cosine(col("dot"), col("nq"), col("snq")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("vec_id"))
          .orderBy(col("cos").desc, col("seed_id"))))
      .filter(col("rn") <= 2)
      .select(col("vec_id"), col("seed_id"))
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    out.foreach { case (q, n, _, _) =>
      assert(probed(q).contains(cellOf(n)),
        s"neighbor $n of query $q not in probed cells")
    }
  }

  test("ivf_pq_search cosines are the true exact quantized cosines") {
    val e = graft.Tables.embeddings(spark, sf)
    val qd = Similarity.quantized(e, "vec_id", "embedding")
      .select(col("vec_id"), col("q"), col("nq"))
    val res = SparkEntry.queries("ivf_pq_search")(spark, sf)
      .select(col("query_id"), col("neighbor_id"), col("cos"))
    val bad = res
      .join(qd.select(col("vec_id").as("query_id"), col("q").as("qq"),
        col("nq").as("qnq")), "query_id")
      .join(qd.select(col("vec_id").as("neighbor_id"), col("q"),
        col("nq")), "neighbor_id")
      .withColumn("truecos", Similarity.cosine(
        Similarity.dotQ("qq", "q"), col("qnq"), col("nq")))
      .filter(col("cos") =!= col("truecos"))
    assert(bad.count() == 0, "stage-3 cosine must be the exact score")
  }
}
