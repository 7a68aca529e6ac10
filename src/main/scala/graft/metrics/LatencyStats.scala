package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Latency measurement + statistics (SURVEY §2.6 AG2/AG3, §2.7 ST4).
  *
  * ST4 carry pattern: end-to-end latency is (receive − send) over
  * columns carried through the pipeline (`mqtt_sent_at_ms` carried at
  * `TelematicsViolationDeriverJob.java:179`, subtracted at
  * `kafkaConsumer.js:201-211`) — never a stream-stream join.
  *
  * Two variants (§7.6.7):
  *  - reference-faithful: wall-clock receive time (cross-host skew and
  *    all — the committed latencies.json has negative values);
  *  - monotonic: Kafka log-append time from the source's `timestamp`.
  */
object LatencyStats {

  /** Build latency records (kafkaConsumer.js:203-210 shape). */
  def latencyRecords(events: DataFrame, receivedMsCol: Column): DataFrame =
    events
      .withColumn("kafka_received_at_ms", receivedMsCol)
      .withColumn("latency_ms",
        col("kafka_received_at_ms") - col("mqtt_sent_at_ms"))
      .withColumn("ts_iso", date_format(
        timestamp_millis(col("kafka_received_at_ms")),
        "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"))                 // P12

  /** AG2: reference-exact percentile stats — sorted[floor(n*p)]
    * (`mqtt_publish.js:84-96`) — per group, plus min/max/avg/count.
    * Discrete index selection: one shuffle + per-partition sort; no
    * interpolation, so results are actual data values. */
  def summarize(df: DataFrame, valueCol: String, groupCols: Seq[String],
                ps: Seq[Int] = Seq(50, 95, 99)): DataFrame = {
    val gcols  = groupCols.map(col)
    val w  = Window.partitionBy(gcols: _*).orderBy(col(valueCol))
    val wn = Window.partitionBy(gcols: _*)
    def idx(p: Int): Column = expr(s"((__n * $p) DIV 100) + 1")
    val pAggs = ps.map(p =>
      max(when(col("__rn") === idx(p), col(valueCol))).as(s"p$p"))
    val aggs = Seq(
      count(lit(1)).as("n"),
      min(col(valueCol)).as("min_v"),
      max(col(valueCol)).as("max_v"),
      avg(col(valueCol)).as("avg_v")) ++ pAggs
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wn))
      .groupBy(gcols: _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
