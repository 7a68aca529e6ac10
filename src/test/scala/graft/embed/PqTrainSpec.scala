package graft.embed

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Trained PQ codebooks: the oracle gate proves Spark ≡ DuckDB on the
  * replayed training; THIS spec proves the training is worth running —
  * total reconstruction error must not exceed the raw-seed codebook's
  * (Lloyd monotonicity, modulo the integer floor) — and pins the
  * structural contract. */
class PqTrainSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private val PqM = 8
  private val PqSub = 8
  private val PqK = 16

  private def subs = Similarity
    .quantized(graft.Tables.embeddings(spark, sf), "vec_id", "embedding")
    .select(col("vec_id"),
      explode(expr(s"sequence(0, ${PqM - 1})")).as("j"), col("q"))
    .withColumn("sub", expr(s"slice(q, j * $PqSub + 1, $PqSub)"))
    .select(col("vec_id"), col("j"), col("sub"))

  /** Total reconstruction error Σ min-cell ||sub − csub||² under a
    * codebook (j, cid, csub). */
  private def reconError(cb: org.apache.spark.sql.DataFrame): Long = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("vec_id"), col("j"))
      .orderBy(col("dd"), col("cid"))
    subs.join(broadcast(cb), "j")
      .withColumn("dd", expr(
        "int_dot(sub, sub) + int_dot(csub, csub) - 2 * int_dot(sub, csub)"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .agg(sum(col("dd"))).first().getLong(0)
  }

  test("trained codebooks reconstruct no worse than the raw seeds") {
    val raw = subs
      .join(broadcast(subs.select(col("vec_id")).distinct()
        .orderBy(col("vec_id")).limit(PqK)), "vec_id")
      .select(col("j"), col("vec_id").as("cid"), col("sub").as("csub"))
    val trained = PqTrain.trainedCodebooks(subs, PqK)
    val rawErr = reconError(raw)
    val trainedErr = reconError(trained)
    assert(trainedErr <= rawErr,
      s"training made reconstruction WORSE: $trainedErr > $rawErr")
    // and it should actually move (the data is not already centroidal)
    assert(trainedErr < rawErr, "training was a no-op on real data")
  }

  test("structural contract: one codebook per subspace, <= K cells each") {
    val trained = PqTrain.trainedCodebooks(subs, PqK)
    val perJ = trained.groupBy(col("j")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perJ.keySet == (0 until PqM).toSet, s"missing subspace: $perJ")
    assert(perJ.values.forall(n => n >= 1 && n <= PqK), s"cell counts off: $perJ")
    // sub-vectors have the declared width
    val widths = trained.select(size(col("csub"))).distinct()
      .collect().map(_.getInt(0)).toSet
    assert(widths == Set(PqSub), s"csub widths: $widths")
  }
}
