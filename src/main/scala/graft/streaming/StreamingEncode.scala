package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, when, lit}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming tokenizer materialization — the online form of
  * `encode_shards`: an ingest stream of documents is encoded per
  * micro-batch to token-id sequences against the FIXED per-word
  * encoding table built batch-side
  * ([[graft.queries.TextQueries.encodeWordTable]]), under the
  * tokenizer `tok_gate` chose. This is the shard writer's deployment
  * shape: the vocabulary is trained ONCE on the reference corpus, the
  * gate picks the tokenizer ONCE, and every arriving shard is encoded
  * against the standing table — encoding never feeds back into the
  * vocabulary (periodic retraining is a batch-side rebuild swapping
  * the table between batches, the StreamingPpl/StreamingDsir
  * stateless-given-model discipline).
  *
  * Emits per-doc receipts (doc_id, n_words, n_oov, n_pieces, id_seq)
  * — exactly what the batch writer's `partitionBy(shard)` output
  * carries per document; the shard assignment stays the hash of
  * doc_id, so a downstream sink can route rows without any state.
  * OOV contract: a word outside the gated vocabulary (alphabet,
  * length cap) is counted and skipped in the id stream, identically
  * to the batch path — pinned by StreamingEncodeSpec.
  */
object StreamingEncode {

  /** Start encoding `docsStream` (doc_id, text, …) against the fixed
    * `wordTable` under `chosen` ("bpe" | "unigram"); each micro-batch's
    * per-doc receipts go to `sink`. */
  def start(docsStream: DataFrame, wordTable: DataFrame, chosen: String,
            checkpoint: String)(sink: DataFrame => Unit): StreamingQuery =
    docsStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val enc = graft.queries.TextQueries.encodeDocs(batch, wordTable)
        sink(enc.select(col("doc_id"), col("n_words"), col("n_oov"),
          when(lit(chosen) === "bpe", col("bpe_np"))
            .otherwise(col("uni_np")).as("n_pieces"),
          when(lit(chosen) === "bpe", col("bpe_seq"))
            .otherwise(col("uni_seq")).as("id_seq")))
      }
      .start()
}
