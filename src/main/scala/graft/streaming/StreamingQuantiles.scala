package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming windowed quantiles over the mergeable t-digest Aggregator
  * — the streaming form of q17: per (event-time window, key), a p50/p95/
  * p99 summary that a telemetry operator watches live (the reference
  * computes its latency percentiles batch-side over a JSON log,
  * `mqtt_publish.js:84-96`; this keeps them inside the engine,
  * incremental and watermark-bounded).
  *
  * Why this composes at 100 TB: the t-digest is a typed Aggregator with
  * an O(δ) mergeable buffer, so Structured Streaming's stateful
  * aggregation holds ONE digest state per (window, key) group and
  * merges map-side partials per micro-batch — never the raw values. The
  * watermark bounds state: windows older than the allowed lateness are
  * finalized and evicted. Append mode emits each window exactly once at
  * finalization (the downstream-sink-friendly contract); Update mode
  * would stream provisional snapshots.
  *
  * Batch ≡ streaming: the same expression over the same rows yields the
  * same digests (merge-order invariance is property-tested in
  * TDigestSpec), which is what the spec asserts window by window.
  */
object StreamingQuantiles {

  /** ps are integer percentiles (e.g. Seq(50, 95, 99)). `df` must carry
    * `tsCol` (timestamp) and `valueCol` (double). Works on a streaming
    * OR batch frame — streaming callers get state eviction from the
    * watermark; batch callers get the identical windowed digest. */
  def windowed(df: DataFrame, tsCol: String, keyCol: String,
               valueCol: String, windowDur: String, lateness: String,
               ps: Seq[Int]): DataFrame = {
    val td = udaf(new graft.functions.TDigestSketch.Quantiles(ps))
    val in =
      if (df.isStreaming) df.withWatermark(tsCol, lateness) else df
    val qcols: Seq[Column] = ps.zipWithIndex.map { case (p, i) =>
      col("qs").getItem(i).as(s"p$p")
    }
    in.groupBy(window(col(tsCol), windowDur), col(keyCol))
      .agg(td(col(valueCol)).as("qs"), count(lit(1)).as("n"))
      .select(
        Seq(col("window.start").as("win_start"), col(keyCol), col("n")) ++
          qcols: _*)
  }
}
