package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming windowed distinct-count estimation over the mergeable HLL
  * Aggregator — the streaming form of hll_distinct: per (event-time
  * window, key), a cardinality estimate a live dashboard watches
  * (distinct active devices per window) without holding the key set.
  *
  * Why this composes at 100 TB: state per (window, key) group is the
  * 64-byte register array, merged map-side per micro-batch — never the
  * raw identities (contrast dropDuplicates-based exact counting, whose
  * state grows with cardinality). The watermark bounds state lifetime;
  * append mode emits each window once at finalization. Batch ≡
  * streaming: identical registers ⇒ identical estimates, asserted
  * window by window in StreamingDistinctSpec.
  */
object StreamingDistinct {

  /** `df` must carry `tsCol` (timestamp) and `idCol` (string identity
    * to count). Works on a streaming OR batch frame — streaming callers
    * get watermark state eviction; batch callers the identical windowed
    * sketch. The identity is hashed with the portable 60-bit md5 hash,
    * so estimates are reproducible across engines and runs. */
  def windowed(df: DataFrame, tsCol: String, keyCol: String,
               idCol: String, windowDur: String, lateness: String): DataFrame = {
    val hll = udaf(new graft.functions.HllSketch.Distinct)
    val h: Column = graft.text.TextFunctions.portableHash(col(idCol))
    val in = if (df.isStreaming) df.withWatermark(tsCol, lateness) else df
    in.groupBy(window(col(tsCol), windowDur), col(keyCol))
      .agg(hll(h).as("sk"), count(lit(1)).as("n_rows"))
      .select(col("window.start").as("win_start"), col(keyCol),
        col("n_rows"), col("sk.n_buckets").as("n_buckets"),
        col("sk.z_scaled").as("z_scaled"), col("sk.hll_est").as("hll_est"))
  }
}
