package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the streaming enrichment operator the
  * reference approximates consumer-side (each violation handler reads
  * the device's latest cached status, `kafkaConsumer.js` state lookups):
  * join a fact stream with a context stream on key, bounded to a time
  * interval, fully inside the engine.
  *
  * Spark-first shape: a watermarked stream-stream equi-join with a
  * range predicate on the two event-time columns. The BOUNDED interval
  * is what makes this safe at scale — it is exactly the condition
  * Structured Streaming needs to compute each side's state-retention
  * horizon (watermark + interval) and purge join state; an unbounded
  * join condition would accumulate state forever. State is keyed by the
  * join key, so the shuffle partitions by key and skew salting applies
  * as in any keyed join.
  *
  * Works identically in batch (plain range join) — specs assert
  * streaming ≡ batch on the same inputs, the oracle pattern used for
  * the demux path.
  */
object StreamJoin {

  /** Join condition: equal keys, and the right event time within
    * `[leftTs − lookbackSeconds, leftTs]` — "context that was current
    * when the fact happened". Both inputs must carry watermarks in
    * streaming (Spark rejects the join otherwise — deliberately not
    * defaulted here; retention is a caller policy). */
  def intervalCondition(leftKey: Column, rightKey: Column,
                        leftTs: Column, rightTs: Column,
                        lookbackSeconds: Int): Column =
    leftKey === rightKey &&
      rightTs >= leftTs - expr(s"INTERVAL $lookbackSeconds SECONDS") &&
      rightTs <= leftTs

  /** Interval join of two (streaming or batch) frames. Column names on
    * the two sides must be disjoint (rename before calling — the
    * streaming planner cannot disambiguate self-referencing columns
    * across stream-stream state). */
  def interval(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTs: String, rightTs: String,
               lookbackSeconds: Int,
               joinType: String = "inner"): DataFrame =
    left.join(right,
      intervalCondition(col(leftKey), col(rightKey),
        col(leftTs), col(rightTs), lookbackSeconds),
      joinType)
}
