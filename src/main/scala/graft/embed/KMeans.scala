package graft.embed

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Iterable distributed k-means over quantized embeddings — the
  * operator behind `kmeans_step` (one oracle-gated Lloyd iteration),
  * exposed as a loop: assignment is exact integer squared-L2 against
  * broadcast centroids (map-only), the update is one (cell, dim)
  * aggregation with map-side partial sums, and the new centroids
  * re-enter the quantized integer domain via floor division — so every
  * iteration is deterministic and engine-portable, and inertia is an
  * exact BIGINT (no float accumulation anywhere).
  *
  * Scale shape per iteration: broadcast k centroids, one shuffle
  * keyed (cell, dim) for the update, one tiny collect (k×dim rows) to
  * build the next broadcast. Iterating = classic Lloyd: assignment
  * minimizes each vector's term, the mean minimizes each cell's term,
  * so exact-arithmetic inertia is non-increasing (the integer floor on
  * centroid components perturbs this by at most dim per vector —
  * KMeansSpec pins the property with that slack).
  */
object KMeans {

  /** ||v − c||² in the quantized domain: nq + nc − 2·dot — all exact
    * 64-bit integer via the native int_dot. */
  private def d2(nq: String, nc: String, q: String, cq: String) =
    expr(s"$nq + $nc - 2 * int_dot($q, $cq)")

  /** Assign every vector to its nearest centroid by exact integer
    * squared-L2, ties to the lowest centroid id.
    * `qd`: (vec_id, q, nq); `centroids`: (cid, cq, cnq) — broadcast. */
  def assign(qd: DataFrame, centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("dd"), col("cid"))
    qd.crossJoin(broadcast(centroids)) // bounded: k broadcast rows
      .withColumn("dd", d2("nq", "cnq", "q", "cq"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cid"), col("q"), col("dd"))
  }

  /** One Lloyd update: per-cell integer mean of the member vectors,
    * floored back into the quantized domain. Returns (cid, cq, cnq)
    * ready to broadcast into the next [[assign]]. Empty cells drop
    * (standard Lloyd: a cell no vector chose has no mean). */
  def update(assigned: DataFrame): DataFrame = {
    val spark = assigned.sparkSession
    val perDim = assigned
      .select(col("cid"), posexplode(col("q")).as(Seq("dim", "qc")))
      .groupBy(col("cid"), col("dim"))
      .agg(sum(col("qc")).as("s"), count(lit(1)).as("n"))
      .withColumn("c", expr("s DIV n")) // exact integer mean (toward zero)
    // k×dim rows — tiny; rebuild the array in dim order driver-side to
    // keep the next broadcast a plain small table
    import spark.implicits._
    val rows = perDim.select(col("cid"), col("dim"), col("c"))
      .as[(Long, Int, Long)].collect()
    val cents = rows.groupBy(_._1).toSeq.map { case (cid, ds) =>
      (cid, ds.sortBy(_._2).map(_._3).toSeq)
    }
    cents.toDF("cid", "cq")
      .withColumn("cnq", expr("int_dot(cq, cq)"))
  }

  /** Exact integer inertia of an assignment: Σ ||v − c||².
    * Empty assignment → 0 (SUM over zero rows is NULL). */
  def inertia(assigned: DataFrame): Long = {
    val row = assigned.agg(sum(col("dd"))).first()
    if (row.isNullAt(0)) 0L else row.getLong(0)
  }

  /** Run `iters` Lloyd iterations from the k lowest-id vectors as
    * seeds; returns the inertia after each assignment (length iters). */
  def lloyd(embeds: DataFrame, idCol: String, embCol: String,
            k: Int, iters: Int): Seq[Long] = {
    val qd = Similarity.quantized(embeds, idCol, embCol)
      .select(col(idCol).as("vec_id"), col("q"), col("nq"))
      .persist()
    // true k lowest ids — robust to sparse/offset id spaces, where a
    // `vec_id < k` filter would yield fewer (possibly zero) seeds
    var centroids = qd.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id").as("cid"), col("q").as("cq"),
        col("nq").as("cnq"))
    val out = (1 to iters).map { _ =>
      val a = assign(qd, centroids).persist()
      val in = inertia(a)
      centroids = update(a)
      a.unpersist()
      in
    }
    qd.unpersist()
    out
  }
}
