package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming Gram maintenance — the incremental twin of the batch
  * `gram_matrix` aggregation and the ingest-time feeder of the whole
  * linear-algebra family (pca_power/pca_topk, linear_probe, ABTT):
  * X^T X is a MERGEABLE sum of per-row outer products, so a stream of
  * embeddings folds into a running d·(d+1)/2-cell state with one
  * keyed aggregation in Complete mode — state bounded by the cell
  * count REGARDLESS of stream length (the same property that makes
  * the batch exchange bounded per executor).
  *
  * This is the standard shape of streaming/incremental PCA at scale:
  * maintain the Gram online, re-run the (driver-cheap) eigen step on
  * demand — StreamingGramSpec pins that the streamed Gram is
  * bit-equal to the batch Gram of the same rows after every batch,
  * and that [[graft.embed.PcaPower.power]] on the streamed state
  * equals the batch component exactly (pure integer arithmetic end to
  * end; no float drift axis exists).
  *
  * Quantization is the identical int_quantize/int_dot-free component
  * explode used by the batch gram (posexplode + self-pair within the
  * row): map-only per batch, the only exchange is the (i, j) key —
  * 2 080 cells.
  */
object StreamingGram {

  /** (i, j, g) upper-triangle running Gram over a (possibly streaming)
    * frame carrying `embedding: array<float>` — Complete-mode output
    * when streaming. Bit-identical semantics to the batch
    * `gram_matrix` on the rows seen so far. */
  def gram(vecs: DataFrame): DataFrame = {
    val comps = vecs
      .withColumn("q", expr(
        s"int_quantize(embedding, CAST(${graft.embed.Similarity.Scale} AS BIGINT))"))
      .select(posexplode(col("q")).as(Seq("i", "qi")), col("q"))
      // within-row pair expansion (j >= i) — no join needed: the other
      // component rides in the still-attached q array
      .select(col("i"), col("qi"),
        posexplode(col("q")).as(Seq("j", "qj")))
      .filter(col("j") >= col("i"))
    comps.groupBy(col("i"), col("j"))
      .agg(sum(col("qi") * col("qj")).as("g"))
  }
}
