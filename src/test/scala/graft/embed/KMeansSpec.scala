package graft.embed

import graft.{SparkTestBase, Tables}

/** Lloyd's algorithm over exact integer arithmetic: inertia must be
  * (near-)monotone non-increasing across iterations — assignment
  * minimizes each vector's term, the mean minimizes each cell's term.
  * The integer rounding of centroid components perturbs each vector's
  * term by at most dim (one unit² per dimension), so the assertion
  * carries that slack. */
class KMeansSpec extends SparkTestBase {

  test("inertia is non-increasing across Lloyd iterations (integer slack)") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val n = e.count()
    val inertias = KMeans.lloyd(e, "vec_id", "embedding", k = 8, iters = 4)
    assert(inertias.length == 4)
    // slack: dim units² per vector per step from integer centroid means
    val slack = 64L * n
    inertias.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + slack, s"inertia increased: $inertias")
    }
    // and the first step must actually improve things substantially on
    // real data (seeds are arbitrary vectors, means are better centers)
    assert(inertias.last < inertias.head, inertias.toString)
  }

  test("assignment covers every vector exactly once") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val qd = Similarity.quantized(e, "vec_id", "embedding")
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("q"),
        org.apache.spark.sql.functions.col("nq"))
    val seeds = qd.filter(org.apache.spark.sql.functions.col("vec_id") < 8)
      .select(org.apache.spark.sql.functions.col("vec_id").as("cid"),
        org.apache.spark.sql.functions.col("q").as("cq"),
        org.apache.spark.sql.functions.col("nq").as("cnq"))
    val a = KMeans.assign(qd, seeds)
    assert(a.count() == e.count())
    assert(a.select("vec_id").distinct().count() == e.count())
  }
}
