package graft.dedup

import org.apache.spark.sql.DataFrame

/** Streaming exact dedup — the ingest-time guard a training-data
  * pipeline puts in front of the corpus store so replays and
  * at-least-once transports (Kafka, the filelog log) don't duplicate
  * documents.
  *
  * Built on `dropDuplicatesWithinWatermark`: state holds one entry per
  * key seen within the watermark horizon and is PURGED as event time
  * advances — bounded state, unlike stream `dropDuplicates` on keys
  * alone, which retains every key forever and OOMs a 100 TB ingest.
  * The contract is exactly what an idempotent ingest needs: a duplicate
  * arriving within the lateness bound is dropped; one arriving after
  * the horizon is treated as new (by then the batch layer's exact dedup
  * — `dedup_exact` — owns the decision).
  */
object StreamingDedup {

  /** `df` must carry an event-time column already watermarked
    * (`withWatermark`); duplicates share identical values in `keyCols`. */
  def withinWatermark(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.dropDuplicatesWithinWatermark(keyCols)
}
