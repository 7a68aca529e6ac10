package graft.embed

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding similarity operators (SURVEY §7.5): brute-force cosine
  * top-k as the baseline, coarse-partition (IVF-style) blocking as the
  * scale path for all-pairs near-dup.
  *
  * Determinism design: float components are quantized once by
  * `floor(x * 2^20)` (exact — scaling by a power of two only shifts the
  * exponent), after which dot products and norms are pure 64-bit integer
  * arithmetic: associative, order-free, and bit-identical in any engine.
  * The final cosine is one double division + sqrt on those integers.
  * Quantization error is ~2^-20 relative — irrelevant for ranking, and
  * it makes ranking itself reproducible (float cosines computed in
  * different orders are not).
  *
  * Scale notes: the quantized vector pass is map-only. Top-k per query
  * is a `row_number` window over (query, score) — Spark plans partial
  * top-k per partition before the shuffle when k is a filter on
  * row_number. All-pairs near-dup must never be n²: [[cosinePairsBlocked]]
  * joins only within a coarse-quantizer cell (the `label` column here;
  * a real IVF assignment at 100 TB), which bounds candidates per cell.
  */
object Similarity {
  val Scale = 1048576L // 2^20

  /** (id, embedding: array<float>) → (id, q: array<bigint>, nq: bigint). */
  def quantized(embeds: DataFrame, idCol: String, embCol: String): DataFrame =
    graft.Tables.parallelize(embeds)
      .withColumn("q", expr(
        s"transform($embCol, x -> cast(floor(cast(x AS double) * cast($Scale AS double)) AS bigint))"))
      .withColumn("nq", expr(
        "aggregate(transform(q, x -> x * x), 0L, (acc, v) -> acc + v)"))

  /** Integer dot product of two quantized arrays (column expression). */
  def dotQ(a: String, b: String) = expr(
    s"aggregate(zip_with($a, $b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)")

  /** Cosine from integer dot + norms: one deterministic double division. */
  def cosine(dot: org.apache.spark.sql.Column,
             na: org.apache.spark.sql.Column,
             nb: org.apache.spark.sql.Column) =
    dot.cast("double") / sqrt(na.cast("double") * nb.cast("double"))

  /** Brute-force cosine top-k neighbors for each query vector.
    * `queries`/`candidates` both (idCol, embCol); excludes self-pairs. */
  def knn(queries: DataFrame, candidates: DataFrame, idCol: String,
          embCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = quantized(queries, idCol, embCol)
      .select(col(idCol).as("query_id"), col("q").as("qa"), col("nq").as("na"))
    val c = quantized(candidates, idCol, embCol)
      .select(col(idCol).as("neighbor_id"), col("q").as("qb"), col("nq").as("nb"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    q.crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("dot", dotQ("qa", "qb"))
      .withColumn("cos", cosine(col("dot"), col("na"), col("nb")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rk"))
  }

  /** All-pairs cosine ≥ threshold within a coarse-partition cell
    * (IVF-style blocking): candidates ∝ Σ cell², never n². */
  def cosinePairsBlocked(embeds: DataFrame, idCol: String, embCol: String,
                         cellCol: String, threshold: Double): DataFrame = {
    val qd = quantized(embeds, idCol, embCol)
    val a = qd.select(col(cellCol).as("cell"), col(idCol).as("a_id"),
      col("q").as("qa"), col("nq").as("na"))
    val b = qd.select(col(cellCol).as("cell"), col(idCol).as("b_id"),
      col("q").as("qb"), col("nq").as("nb"))
    a.join(b, "cell")
      .filter(col("a_id") < col("b_id"))
      .withColumn("dot", dotQ("qa", "qb"))
      .withColumn("cos", cosine(col("dot"), col("na"), col("nb")))
      .filter(col("cos") >= threshold)
      .select(col("cell"), col("a_id"), col("b_id"), col("cos"))
  }

  // ------------------------------------------------------------ oracle

  /** DuckDB CTE: `qv(vec_id, label, q, nq)` mirroring [[quantized]]. */
  val duckdbQuantizedCte: String =
    s"""qv AS (
       |  SELECT vec_id, label,
       |    list_transform(embedding,
       |      x -> CAST(floor(CAST(x AS DOUBLE) * CAST($Scale AS DOUBLE)) AS BIGINT)) AS q,
       |    CAST(list_sum(list_transform(embedding,
       |      x -> CAST(floor(CAST(x AS DOUBLE) * CAST($Scale AS DOUBLE)) AS BIGINT)
       |         * CAST(floor(CAST(x AS DOUBLE) * CAST($Scale AS DOUBLE)) AS BIGINT)))
       |      AS BIGINT) AS nq
       |  FROM embeddings)""".stripMargin

  /** DuckDB integer dot product of two quantized list columns. */
  def duckdbDot(a: String, b: String): String =
    s"CAST(list_sum(list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i])) AS BIGINT)"
}
