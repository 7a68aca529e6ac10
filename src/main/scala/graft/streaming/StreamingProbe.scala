package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming linear-probe scoring — the online form of `probe_eval`:
  * an ingest stream of embeddings is scored per micro-batch against the
  * FIXED probe weights trained batch-side
  * ([[graft.embed.ProbeTrain]] via [[graft.SharedStages.probe]]).
  *
  * Why this is the right streaming shape: the probe's per-vector score
  * is STATELESS given the model — the only cross-corpus state is the
  * d = 64-long weight vector, which is exactly the "train the quality
  * classifier once, stream the filtering" deployment curation pipelines
  * run (score every incoming doc/embedding, route by threshold). So the
  * twin is a `foreachBatch` of the same `probeScores` kernel the batch
  * report uses (identical map-only plan per batch, broadcast weights,
  * no streaming state at all) — the StreamingDsir discipline. Periodic
  * model refresh is a batch-side retrain swapping the weight vector
  * between batches.
  *
  * StreamingProbeSpec pins batch ≡ streaming: the union of per-batch
  * scores over a split stream equals the one-shot batch scoring of the
  * same embeddings against the same weights.
  */
object StreamingProbe {

  /** Start scoring `embedStream` (vec_id, embedding, label) against
    * fixed weights `w`; each micro-batch's per-vector scores are handed
    * to `sink`. */
  def start(embedStream: DataFrame, w: Seq[Long], checkpoint: String)
           (sink: DataFrame => Unit): StreamingQuery =
    embedStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(graft.queries.EmbedQueries.probeScores(batch, w))
      }
      .start()
}
