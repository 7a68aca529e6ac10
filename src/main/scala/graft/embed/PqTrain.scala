package graft.embed

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lloyd-TRAINED product-quantization codebooks — the PQ twin of
  * [[IvfTrain]] (which closed the same gap for the IVF coarse
  * quantizer in round 9): `pq_assign` / `pq_search` / `pq_refine` /
  * `ivf_pq_search` now snap sub-vectors to per-subspace centroids
  * trained by a fixed number of exact-integer Lloyd rounds instead of
  * the raw seed sub-vectors, so each subspace's 16 codes reflect that
  * subspace's distribution (PQ's whole premise — Jégou et al. 2011
  * train each sub-quantizer independently).
  *
  * All M subspaces train in ONE loop: assignment ranks per
  * (vec_id, j) against the broadcast (j, cid) codebook (M·K rows),
  * the update is one (j, cid, dim) aggregation with map-side partials
  * plus an M·K·subDim-row collect to rebuild the next broadcast —
  * identical per-iteration scale shape to [[KMeans]], just keyed by
  * subspace. Determinism is the IvfTrain discipline: exact integer
  * squared-L2, ties to the lowest cid, truncating-division means, a
  * FIXED iteration count — the DuckDB oracle replays the training as
  * an unrolled CTE chain ([[duckdbCodebookCtes]]) ending where the
  * raw-seed `cb` CTE used to sit. Empty cells drop (standard Lloyd),
  * identically in both engines.
  */
object PqTrain {
  val Iters = 3

  /** `subs`: (vec_id, j, sub) — every vector's quantized sub-vectors.
    * Returns (j, cid, csub) after `iters` per-subspace Lloyd rounds
    * from the k lowest-id vectors' sub-vectors. */
  def trainedCodebooks(subs: DataFrame, k: Int, iters: Int = Iters): DataFrame = {
    val spark = subs.sparkSession
    import spark.implicits._
    val sd = subs.withColumn("snn", expr("int_dot(sub, sub)")).persist()
    val seedIds = sd.select(col("vec_id")).distinct()
      .orderBy(col("vec_id")).limit(k)
    var cents = sd.join(broadcast(seedIds), "vec_id")
      .select(col("j"), col("vec_id").as("cid"), col("sub").as("csub"))
      .withColumn("cnn", expr("int_dot(csub, csub)"))
    for (_ <- 1 to iters) {
      val w = Window.partitionBy(col("vec_id"), col("j"))
        .orderBy(col("dd"), col("cid"))
      val assigned = sd.join(broadcast(cents), "j") // bounded: M·K rows
        .withColumn("dd", expr("snn + cnn - 2 * int_dot(sub, csub)"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("j"), col("cid"), col("sub"))
      // M·K·subDim rows — tiny; rebuild arrays in dim order driver-side
      // (the KMeans.update discipline)
      val perDim = assigned
        .select(col("j"), col("cid"), posexplode(col("sub")).as(Seq("dim", "x")))
        .groupBy(col("j"), col("cid"), col("dim"))
        .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
        .withColumn("c", expr("s DIV n")) // exact integer mean (toward zero)
        .select(col("j"), col("cid"), col("dim"), col("c"))
        .as[(Int, Long, Int, Long)].collect()
      val rows = perDim.groupBy(t => (t._1, t._2)).toSeq.map {
        case ((j, cid), ds) => (j, cid, ds.sortBy(_._3).map(_._4).toSeq)
      }
      cents = rows.toDF("j", "cid", "csub")
        .withColumn("cnn", expr("int_dot(csub, csub)"))
    }
    sd.unpersist()
    cents.select(col("j"), col("cid"), col("csub"))
  }

  /** The DuckDB mirror: an unrolled chain pt0 → pa1/pd1/pt1 → … over
    * the caller's `subs`/`qv` CTEs, ending in pt`iters`(j, cid, csub).
    * The squared-L2 is the (a−b)² form — exactly the int_dot identity
    * the Spark side computes. */
  def duckdbCodebookCtes(k: Int, subDims: Int, iters: Int = Iters): String = {
    def dist(a: String, b: String) =
      s"CAST(list_sum(list_transform(range(1, ${subDims + 1}), " +
        s"i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))) AS BIGINT)"
    val init =
      s"""pt0 AS (
         |  SELECT j, vec_id AS cid, sub AS csub FROM subs
         |  WHERE vec_id IN (SELECT vec_id FROM qv ORDER BY vec_id LIMIT $k))""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""pa$i AS (
         |  SELECT j, cid, vec_id, sub FROM (
         |    SELECT s.j, c.cid, s.vec_id, s.sub,
         |      ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.j
         |        ORDER BY ${dist("s.sub", "c.csub")}, c.cid) AS rn
         |    FROM subs s JOIN pt${i - 1} c ON c.j = s.j) WHERE rn = 1),
         |pd$i AS (
         |  -- Spark DIV truncates toward zero; DuckDB // floors — spell
         |  -- out the sign so negative dimension sums divide identically
         |  SELECT j, cid, dim,
         |    CASE WHEN s >= 0 THEN s // n ELSE -((-s) // n) END AS c
         |  FROM (
         |    SELECT a.j, a.cid, CAST(t.i - 1 AS BIGINT) AS dim,
         |      CAST(SUM(a.sub[CAST(t.i AS INT)]) AS BIGINT) AS s,
         |      COUNT(*) AS n
         |    FROM pa$i a, range(1, ${subDims + 1}) t(i)
         |    GROUP BY 1, 2, 3)),
         |pt$i AS (
         |  SELECT j, cid, list(c ORDER BY dim) AS csub
         |  FROM pd$i GROUP BY 1, 2)""".stripMargin
    }
    (init +: rounds).mkString(",\n")
  }
}
