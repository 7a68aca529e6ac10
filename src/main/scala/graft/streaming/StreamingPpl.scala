package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming LM-perplexity scoring — the online form of `lm_ppl`'s
  * per-doc cross-entropy: an ingest stream of documents is scored per
  * micro-batch against the FIXED reference bigram LM built batch-side
  * ([[graft.queries.TextQueries.lmModelOf]]). This is exactly CCNet's
  * deployment shape (Wenzek et al. 2020): the LM is trained ONCE on the
  * clean reference corpus, then every crawl shard is scored against it
  * — scoring never feeds back into the model.
  *
  * Why this is the right streaming shape: a doc's cross-entropy is
  * STATELESS given the model — the only cross-corpus state is the LM
  * tables (refBi/refUni/vsz), a standing batch-side artifact. So the
  * twin is a `foreachBatch` of the same [[graft.queries.TextQueries
  * .lmDocScores]] kernel the batch stage runs (identical
  * triple-scoring plan per batch; at scale the batch-vs-LM joins are
  * keyed, with AQE broadcasting the LM when it fits), not a stateful
  * operator — the StreamingDsir discipline. Periodic model refresh is
  * a batch-side rebuild swapping the LM tables between batches.
  *
  * The corpus-relative TERCILE (head/middle/tail) deliberately stays
  * batch-side: a tercile is a rank over the whole scored corpus, not a
  * per-doc property — the deployment gates on a FIXED cutoff learned
  * from the reference run (quality_ensemble's "drop tail" gate carries
  * those cutoffs forward), so the stream emits the score and the gate
  * applies the standing threshold.
  *
  * New-data contract: a streamed doc whose bigrams the LM never saw
  * still scores — each unseen bigram contributes the add-one smoothing
  * floor −log2(1/(c1+V)) via the kernel's left joins; a doc in a
  * LANGUAGE the LM does not cover has no defined entropy and is
  * excluded (the inner vsz join), identically to the batch report.
  * Both pinned by StreamingPplSpec.
  */
object StreamingPpl {

  /** Start scoring `docsStream` (doc_id, source, lang, text) against
    * the fixed LM tables; each micro-batch's per-doc scores
    * (doc_id, lang, n_bigrams, h_q8, mean_bits) go to `sink`. */
  def start(docsStream: DataFrame, refBi: DataFrame, refUni: DataFrame,
            vsz: DataFrame, checkpoint: String)
           (sink: DataFrame => Unit): StreamingQuery =
    docsStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(graft.queries.TextQueries.lmDocScores(batch, refBi, refUni, vsz))
      }
      .start()

  /** The Min-K% form: per micro-batch, each doc's top-20%
    * least-likely-occurrence mean against the same fixed LM — the
    * membership/contamination screen (mink_prob) run at ingest, e.g.
    * flagging benchmark text arriving in a crawl before it lands in a
    * training shard. Per-doc like the ppl score, so the same
    * stateless-given-model twin shape applies; emits
    * (doc_id, lang, n_bigrams, k_occ, h_topk_q8, mink_bits). */
  def startMink(docsStream: DataFrame, refBi: DataFrame, refUni: DataFrame,
                vsz: DataFrame, checkpoint: String)
               (sink: DataFrame => Unit): StreamingQuery =
    docsStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val q = graft.queries.TextQueries
        sink(q.minkOf(q.lmScoreBits(q.bigramCountsOf(batch),
          refBi, refUni, vsz)))
      }
      .start()
}
