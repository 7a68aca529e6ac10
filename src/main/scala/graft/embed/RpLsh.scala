package graft.embed

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Random-hyperplane LSH for embeddings (SURVEY §7.5 similarity-search
  * scale path): sign-of-dot-product sketches hash similar directions to
  * the same bucket, replacing the all-pairs O(n²) comparison with
  * bucket-local candidate generation + exact verification.
  *
  * Geometry: P(bit agrees) = 1 − θ/π for angle θ. With 4 tables × 8 bits,
  * a cos≈0.9 pair (θ≈0.45 rad) collides in ≥1 table w.p. ≈0.75; random
  * pairs (θ≈π/2) collide w.p. ≈4/256 — the candidate set is ~1.6% of all
  * pairs. Recall/cost tunes via (tables, bits).
  *
  * Determinism: plane components are fixed integer constants (seeded at
  * build time, embedded in the DuckDB oracle SQL verbatim), and vectors
  * are the 2^20-quantized integers of [[Similarity.quantized]] — every
  * dot product is exact 64-bit arithmetic, so bucket assignment and the
  * final cosine are bit-identical across engines.
  *
  * Plan shape: quantize (map-only) → posexplode components → broadcast
  * join the 2 048-row plane table → two keyed aggregations (dot sums,
  * then bit assembly) → bucket self-join. All codegen; the only wide
  * exchanges are on (vec, table) keys.
  */
object RpLsh {
  val NumTables = 4
  val BitsPerTable = 8
  val Dim = 64

  /** Fixed plane components in [-1000, 1000], row = table*bits+bit. */
  val planes: Array[Array[Int]] = {
    val r = new scala.util.Random(7)
    Array.fill(NumTables * BitsPerTable)(Array.fill(Dim)(r.nextInt(2001) - 1000))
  }

  /** (id, t, bucket) — one row per vector per hash table. */
  def buckets(embeds: DataFrame, idCol: String, embCol: String): DataFrame = {
    val spark = embeds.sparkSession
    import spark.implicits._
    val planeRows = for {
      t <- 0 until NumTables; b <- 0 until BitsPerTable; i <- 0 until Dim
    } yield (t, b, i, planes(t * BitsPerTable + b)(i))
    val planesDf = planeRows.toDF("t", "b", "i", "p")

    Similarity.quantized(embeds, idCol, embCol)
      .select(col(idCol), posexplode(col("q")).as(Seq("i", "qx")))
      .join(broadcast(planesDf), "i")
      .groupBy(col(idCol), col("t"), col("b"))
      .agg(sum(col("qx") * col("p")).as("dot"))
      .groupBy(col(idCol), col("t"))
      .agg(sum(when(col("dot") > 0, expr("shiftleft(1, b)")).otherwise(0L))
        .as("bucket"))
  }

  /** Verified ANN pairs: bucket-collision candidates with exact quantized
    * cosine ≥ threshold. */
  def annPairs(embeds: DataFrame, idCol: String, embCol: String,
               threshold: Double): DataFrame = {
    val bk = buckets(embeds, idCol, embCol)
    val cands = bk.as("a").join(bk.as("b"),
        col("a.t") === col("b.t") && col("a.bucket") === col("b.bucket") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("a_id"), col(s"b.$idCol").as("b_id"))
      .distinct()
    val qd = Similarity.quantized(embeds, idCol, embCol)
      .select(col(idCol), col("q"), col("nq"))
    cands
      .join(qd.select(col(idCol).as("a_id"), col("q").as("qa"), col("nq").as("na")), "a_id")
      .join(qd.select(col(idCol).as("b_id"), col("q").as("qb"), col("nq").as("nb")), "b_id")
      // zero-norm guard: cos would be 0/0 = NaN, and Spark's NaN sorts
      // GREATER than any double, so NaN would pass every `cos >=
      // threshold` gate (and crash the oracle's CAST in consumers that
      // bucket the cosine). Mirrored as `a.nq > 0 AND b.nq > 0` in
      // every rp_cand-scoring oracle.
      .filter(col("na") > 0 && col("nb") > 0)
      .withColumn("dot", Similarity.dotQ("qa", "qb"))
      .withColumn("cos", Similarity.cosine(col("dot"), col("na"), col("nb")))
      .filter(col("cos") >= threshold)
      .select(col("a_id"), col("b_id"), col("cos"))
  }

  // ------------------------------------------------------------ oracle

  /** DuckDB CTEs: planes as literal lists; needs
    * [[Similarity.duckdbQuantizedCte]] (`qv`) in scope. Exposes
    * `rp_cand(a_id, b_id)`. */
  def duckdbCandidateCte: String = {
    val planeValues = (for {
      t <- 0 until NumTables; b <- 0 until BitsPerTable
    } yield s"($t, $b, [${planes(t * BitsPerTable + b).mkString(",")}])")
      .mkString(",\n    ")
    s"""planes(t, b, pl) AS (VALUES
       |    $planeValues),
       |rp_dots AS (
       |  SELECT vec_id, t, b,
       |    CAST(list_sum(list_transform(range(1, ${Dim + 1}), i -> q[i] * pl[i])) AS BIGINT) AS dot
       |  FROM qv, planes),
       |rp_bk AS (
       |  SELECT vec_id, t,
       |    CAST(SUM(CASE WHEN dot > 0 THEN (1 << b) ELSE 0 END) AS BIGINT) AS bucket
       |  FROM rp_dots GROUP BY 1, 2),
       |rp_cand AS (
       |  SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
       |  FROM rp_bk a JOIN rp_bk b
       |    ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id)""".stripMargin
  }
}
