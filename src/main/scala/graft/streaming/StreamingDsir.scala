package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming DSIR scoring — the online form of `dsir_importance`: an
  * ingest stream of documents is scored per micro-batch against the
  * FIXED hashed-bigram lift table built batch-side
  * ([[graft.queries.CurationQueries.dsirLift]]).
  *
  * Why this is the right streaming shape: DSIR's per-document score is
  * STATELESS given the model — the only cross-corpus state is the
  * ≤4096-row bucket table, which is exactly the "train the importance
  * model once, stream the selection" deployment in the paper. So the
  * twin is a `foreachBatch` of the same `dsirScore` function the batch
  * report uses (identical plan per batch, broadcast model join, no
  * streaming state at all), not a stateful operator. Periodic model
  * refresh is a batch-side rebuild swapping the lift table between
  * batches — the same standing-artifact discipline as
  * [[graft.SharedStages.noveltyGramStore]].
  *
  * StreamingDsirSpec pins batch ≡ streaming: the union of per-batch
  * scores over a split stream equals the one-shot batch scoring of the
  * same documents against the same lift.
  *
  * New-data contract: a streamed document whose hashed-bigram buckets
  * were never observed when the model was built still scores — each
  * unseen bucket contributes the add-1 smoothing floor (lift = SCALE,
  * i.e. the value the table itself would hold for a zero-count bucket)
  * via `dsirScore`'s left join, so no document is silently dropped by
  * model staleness. Pinned by the unseen-bucket test in
  * StreamingDsirSpec.
  */
object StreamingDsir {

  /** Start scoring `docsStream` (doc_id, text, source) against `lift`;
    * each micro-batch's per-doc scores are handed to `sink`. */
  def start(docsStream: DataFrame, lift: DataFrame, checkpoint: String)
           (sink: DataFrame => Unit): StreamingQuery =
    docsStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(graft.queries.CurationQueries.dsirScore(batch, lift))
      }
      .start()
}
