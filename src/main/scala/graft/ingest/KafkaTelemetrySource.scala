package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.schema.TelemetrySchema

/** Kafka stream sources (SURVEY §2.1 S1/S2).
  *
  * Reference: the Flink job subscribes `telemetry.raw` with value-only
  * string deserialization and NO watermarks
  * (`TelematicsViolationDeriverJob.java:51-56,78`); the consumer
  * subscribes both event topics in one group
  * (`kafkaConsumer.js:359,371-374`).
  *
  * The parsing stage ([[parsedTelemetry]]) is a pure transform over any
  * DataFrame with a string `value` column, so the identical plan runs
  * against `format("kafka")`, `MemoryStream`, or a batch DataFrame —
  * Structured Streaming's batch≡stream contract (SURVEY §1.4).
  */
object KafkaTelemetrySource {

  /** S1: raw telemetry stream. `startingOffsets=latest` mirrors the
    * consumer's `fromBeginning:false` (kafkaConsumer.js:371-372, O3). */
  def rawStream(spark: SparkSession, bootstrap: String,
                topic: String = "telemetry.raw",
                startingOffsets: String = "latest"): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()

  /** S2: one source over both derived-event topics; callers branch on the
    * built-in `topic` column (F9) instead of two consumers. */
  def eventsStream(spark: SparkSession, bootstrap: String): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", "violations.events,device-status.events")
      .option("startingOffsets", "latest")
      .load()

  /** Kafka record → parsed telemetry rows. Carries the broker ingest
    * time (`kafka_ts`) for the monotonic latency variant (ST4/§7.6.7).
    * Tolerant parse: unwrap double-encoding, PERMISSIVE, drop nulls. */
  def parsedTelemetry(kafkaDf: DataFrame): DataFrame =
    taggedTelemetry(kafkaDf)
      .filter(col("t").isNotNull && col("t.__corrupt").isNull) // P1 drop
      .select((TelemetrySchema.telemetry.fieldNames.toSeq
        .map(f => col(s"t.$f")) :+ col("kafka_ts")): _*)

  /** One-pass tagged form for dead-letter routing (O5 improvement — the
    * reference logs-and-drops; we keep the raw bytes). PERMISSIVE
    * from_json marks malformed input via columnNameOfCorruptRecord
    * (`t.__corrupt` non-null ⇒ corrupt) rather than nulling the struct;
    * split with filters inside a foreachBatch for single-pass semantics. */
  def taggedTelemetry(kafkaDf: DataFrame): DataFrame = {
    val base =
      if (kafkaDf.columns.contains("timestamp"))
        kafkaDf.select(col("value").cast("string").as("raw"),
          col("timestamp").as("kafka_ts"))
      else
        kafkaDf.select(col("value").cast("string").as("raw"),
          current_timestamp().as("kafka_ts"))
    val schemaWithCorrupt = org.apache.spark.sql.types.StructType(
      TelemetrySchema.telemetry.fields :+
        org.apache.spark.sql.types.StructField("__corrupt",
          org.apache.spark.sql.types.StringType))
    base.select(
      from_json(JsonNormalize.unwrapNative(col("raw")), schemaWithCorrupt,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> "__corrupt")).as("t"),
      col("raw"), col("kafka_ts"))
  }

  /** Corrupt records only (non-blank input that failed the tolerant
    * parse) — route to a dead-letter sink instead of silently dropping. */
  def deadLetters(tagged: DataFrame): DataFrame =
    tagged
      .filter(col("t.__corrupt").isNotNull && trim(col("raw")) =!= "")
      .select(col("raw"), col("kafka_ts"))
}
