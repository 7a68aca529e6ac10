package graft.embed

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Random-hyperplane LSH for embeddings (SURVEY §7.5 similarity-search
  * scale path): sign-of-dot-product sketches hash similar directions to
  * the same bucket, replacing the all-pairs O(n²) comparison with
  * bucket-local candidate generation + exact verification.
  *
  * Geometry: P(bit agrees) = 1 − θ/π for angle θ. With `tables` tables
  * × `bits` bits, a cos≈0.9 pair (θ≈0.45 rad, p≈0.857) collides in ≥1
  * table w.p. 1 − (1 − p^bits)^tables; random pairs (θ≈π/2, p=0.5)
  * collide w.p. ≈ tables/2^bits.
  *
  * ADAPTIVE WIDTH (the 100 TB lever): with a FIXED number of buckets,
  * bucket occupancy grows ∝ n and candidate pairs ∝ n²/2^bits — the
  * measured super-linear scaler of every rp_cand consumer. [[widthFor]]
  * instead anchors `bits` to ⌈log2 n⌉ − 2 (expected occupancy 2–4
  * vectors/bucket at any corpus size, so candidate mass stays LINEAR in
  * n), and grows `tables` alongside to hold collision recall for
  * near-pairs as p^bits shrinks — the standard (L, k) trade of
  * Indyk–Motwani LSH. Both engines derive the width from the same
  * integer, COUNT(*) of the corpus, via exact power-of-two thresholds
  * (no floating-point log), so bucket assignment stays bit-identical.
  *
  * Determinism: plane components are fixed integer constants (seeded at
  * build time for the MAX width, embedded in the DuckDB oracle SQL
  * verbatim, width-filtered identically on both sides), and vectors
  * are the 2^20-quantized integers of [[Similarity.quantized]] — every
  * dot product is exact 64-bit arithmetic, so bucket assignment and the
  * final cosine are bit-identical across engines.
  *
  * Plan shape: quantize (map-only) → posexplode components → broadcast
  * join the tables·bits·64-row plane table → two keyed aggregations
  * (dot sums, then bit assembly) → bucket self-join. All codegen; the
  * only wide exchanges are on (vec, table) keys. The corpus count that
  * picks the width is one parquet count-star (metadata-cheap).
  */
object RpLsh {
  /** Streaming width ([[graft.dedup.StreamingEmbedDedup]]): an
    * unbounded stream has no final n, so its stores run the MIN width
    * (occupancy there is bounded by state TTL + per-bucket caps, not
    * bits). Batch paths use [[widthFor]]. */
  val NumTables = 4
  val BitsPerTable = 8

  val Dim = 64
  val MinBits = 8
  val MaxBits = 16
  val MaxTables = 8

  /** Fixed plane components in [-1000, 1000] for the MAX width; row
    * = t*MaxBits + b (use [[plane]], not raw indexing). */
  val planes: Array[Array[Int]] = {
    val r = new scala.util.Random(7)
    Array.fill(MaxTables * MaxBits)(Array.fill(Dim)(r.nextInt(2001) - 1000))
  }

  def plane(t: Int, b: Int): Array[Int] = planes(t * MaxBits + b)

  /** ⌈log2 n⌉ as an exact integer (0 for n ≤ 1). */
  def ceilLog2(n: Long): Int =
    if (n <= 1) 0 else 64 - java.lang.Long.numberOfLeadingZeros(n - 1)

  /** (tables, bits) for corpus size n.
    *
    * bits = clamp(⌈log2 n⌉ − 2, 8, 16): expected occupancy n/2^bits
    * stays in [2, 4] over the whole ramp, so per-table candidate pairs
    * ≈ n·occ/2 grow linearly, never quadratically. tables widens with
    * bits (4 → 6 → 8) to compensate recall: at p=0.857 (cos 0.9) the
    * ≥1-table collision probability stays ≈0.75 / ≈0.61 / ≈0.55 across
    * the three tiers instead of collapsing with p^bits.
    *
    * MUST stay in lockstep with the CASE chains in
    * [[duckdbCandidateCte]] — power-of-two thresholds, exact on both
    * engines. */
  def widthFor(n: Long): (Int, Int) = {
    val bits = math.max(MinBits, math.min(MaxBits, ceilLog2(n) - 2))
    val tables = if (bits <= 10) 4 else if (bits <= 13) 6 else MaxTables
    (tables, bits)
  }

  /** (id, t, bucket) — one row per vector per hash table, at the
    * [[widthFor]] width of this corpus. */
  def buckets(embeds: DataFrame, idCol: String, embCol: String): DataFrame = {
    val spark = embeds.sparkSession
    import spark.implicits._
    val qd = Similarity.quantized(embeds, idCol, embCol)
    val (tables, bits) = widthFor(qd.count())
    val planeRows = for {
      t <- 0 until tables; b <- 0 until bits; i <- 0 until Dim
    } yield (t, b, i, plane(t, b)(i))
    val planesDf = planeRows.toDF("t", "b", "i", "p")

    qd.select(col(idCol), posexplode(col("q")).as(Seq("i", "qx")))
      .join(broadcast(planesDf), "i")
      .groupBy(col(idCol), col("t"), col("b"))
      .agg(sum(col("qx") * col("p")).as("dot"))
      .groupBy(col(idCol), col("t"))
      .agg(sum(when(col("dot") > 0, expr("shiftleft(1, b)")).otherwise(0L))
        .as("bucket"))
  }

  /** Distinct bucket-collision candidate pairs (a_id, b_id) — the
    * candidate half of [[annPairs]], factored so the raw-cosine and
    * residual-cosine consumers can share ONE materialization of the
    * bucket self-join (the same candidates verify under either metric;
    * bucketing is always on the raw vectors). */
  def candPairs(embeds: DataFrame, idCol: String, embCol: String): DataFrame = {
    val bk = buckets(embeds, idCol, embCol)
    bk.as("a").join(bk.as("b"),
        col("a.t") === col("b.t") && col("a.bucket") === col("b.bucket") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("a_id"), col(s"b.$idCol").as("b_id"))
      .distinct()
  }

  /** Exact quantized cosine for every candidate pair, UNthresholded —
    * the shared scored-pair table: every annPairs consumer differs only
    * in its threshold, which is a filter over these rows. `cands` is a
    * parameter so a memoized [[candPairs]] can be passed in. */
  def annScoredFrom(cands: DataFrame, embeds: DataFrame, idCol: String,
                    embCol: String): DataFrame = {
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
      .select(col("a_id"), col("b_id"), col("cos"))
  }

  /** Verified ANN pairs: bucket-collision candidates with exact quantized
    * cosine ≥ threshold. */
  def annPairs(embeds: DataFrame, idCol: String, embCol: String,
               threshold: Double): DataFrame =
    annScoredFrom(candPairs(embeds, idCol, embCol), embeds, idCol, embCol)
      .filter(col("cos") >= threshold)

  // ------------------------------------------------------------ oracle

  /** DuckDB CTEs: planes as literal lists (full MaxTables×MaxBits
    * grid), width chosen from COUNT(*) by the [[widthFor]] CASE chains;
    * needs [[Similarity.duckdbQuantizedCte]] (`qv`) in scope. Exposes
    * `rp_cand(a_id, b_id)`. */
  def duckdbCandidateCte: String = {
    val planeValues = (for {
      t <- 0 until MaxTables; b <- 0 until MaxBits
    } yield s"($t, $b, [${plane(t, b).mkString(",")}])")
      .mkString(",\n    ")
    // exact mirrors of widthFor: bits = clamp(ceil(log2 n) - 2, 8, 16)
    // via power-of-two thresholds; tables tiers on the same thresholds
    s"""rp_w AS (
       |  SELECT
       |    CASE WHEN n <= 1024 THEN 8
       |         WHEN n <= 2048 THEN 9
       |         WHEN n <= 4096 THEN 10
       |         WHEN n <= 8192 THEN 11
       |         WHEN n <= 16384 THEN 12
       |         WHEN n <= 32768 THEN 13
       |         WHEN n <= 65536 THEN 14
       |         WHEN n <= 131072 THEN 15
       |         ELSE 16 END AS bits,
       |    CASE WHEN n <= 4096 THEN 4
       |         WHEN n <= 32768 THEN 6
       |         ELSE ${MaxTables} END AS tbl
       |  FROM (SELECT COUNT(*) AS n FROM qv)),
       |planes(t, b, pl) AS (VALUES
       |    $planeValues),
       |rp_dots AS (
       |  SELECT vec_id, t, b,
       |    CAST(list_sum(list_transform(range(1, ${Dim + 1}), i -> q[i] * pl[i])) AS BIGINT) AS dot
       |  FROM qv, planes, rp_w w WHERE planes.t < w.tbl AND planes.b < w.bits),
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
