package graft.app

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.derive.{StatusDeriver, ViolationDeriver}
import graft.ingest.KafkaTelemetrySource
import graft.sink.KafkaEventSink

/** End-to-end wiring of the reference's main path (SURVEY §3.1):
  * telemetry.raw → parse → {violation, status} events → two Kafka topics,
  * as ONE streaming query with single-pass demux.
  *
  * Same plan shape as the Flink original: map-only, no shuffle, per-device
  * ordering preserved by the Kafka key. Checkpointing gives exactly-once
  * to idempotent sinks — strictly stronger than the reference's
  * at-least-once consumer (SURVEY §2.7 ST5).
  */
object DerivePipeline {

  /** Batch mode: same transforms, no streaming machinery. */
  def runBatch(telemetry: DataFrame): (DataFrame, DataFrame) =
    (ViolationDeriver(telemetry), StatusDeriver(telemetry))

  /** Streaming mode against Kafka (requires the kafka connector jar at
    * runtime; the plan itself is connector-agnostic). */
  def runStreaming(spark: SparkSession, bootstrap: String,
                   checkpointDir: String): StreamingQuery = {
    val parsed = KafkaTelemetrySource.parsedTelemetry(
      KafkaTelemetrySource.rawStream(spark, bootstrap))
    KafkaEventSink.demuxQuery(parsed, checkpointDir)(
      v => KafkaEventSink.writeKafka(v, bootstrap, "violations.events"),
      s => KafkaEventSink.writeKafka(s, bootstrap, "device-status.events"))
  }
}
