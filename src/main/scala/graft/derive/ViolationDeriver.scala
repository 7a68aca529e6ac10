package graft.derive

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.schema.TelemetrySchema

/** The reference engine's core dataflow: derive violation events from raw
  * telemetry (`/root/reference/TelematicsViolationDeriverJob.java:105-183`).
  *
  * Pure `DataFrame => DataFrame` — identical logical plan in batch and
  * Structured Streaming (use via `.transform(ViolationDeriver(_))`).
  *
  * Spark-first shape (SURVEY §3.1): validity gate (F1) → `explode` of
  * `violations[]` (A1, Catalyst Generator — replaces the reference's
  * hand-written element loop) → type allowlist (F5, optimized to `InSet`)
  * → flat event projection (P5-P7). Catalyst pushes the filters below the
  * generate where legal and fuses the whole chain into one
  * WholeStageCodegen stage; at cluster scale this is an embarrassingly
  * parallel map-only plan — no shuffle, which is exactly what the
  * reference's Flink topology was (SURVEY §4.1: "shuffle: none").
  */
object ViolationDeriver {

  /** P7: violation element timestamp if > 0, else payload timestamp
    * (`TelematicsViolationDeriverJob.java:165-166`). */
  def coalesceTimestamp(vTs: Column, payloadTs: Column): Column =
    when(vTs.isNotNull && vTs > 0, vTs).otherwise(payloadTs)

  /** telemetry → one row per allow-listed violation element.
    *
    * Output columns mirror the reference event
    * (`TelematicsViolationDeriverJob.java:156-181`, golden
    * `/root/reference/README.md:632-655`): event_type, violation_type,
    * device_uuid, vehicle_id, account_id, timestamp, location,
    * details{accel_y, speed_kph, delta_speed}, mqtt_sent_at_ms.
    */
  def apply(telemetry: DataFrame): DataFrame = {
    telemetry
      // A1: explode violations[]; missing/null array → no rows (F3).
      // NOTE (F1/F6): unlike the status branch, the reference does NOT
      // apply the (device_uuid, payload-ts) gate to violations — the
      // `deviceUuid != null && ts > 0` check at
      // `TelematicsViolationDeriverJob.java:124` wraps only the status
      // branch; violations (`:143-183`) are emitted unconditionally and
      // the *consumer* drops events with falsy
      // device_uuid/violation_type/timestamp (`kafkaConsumer.js:195-198`).
      // We compose deriver+consumer: gate on device_uuid and the
      // COALESCED event timestamp (below), so a violation whose own
      // ts > 0 survives a payload ts <= 0 exactly as it does end-to-end
      // in the reference.
      .select(col("*"), explode(col("violations")).as("v"))
      // F5: allowlist (Java:98-102,151-154)
      .filter(col("v.type").isin(TelemetrySchema.allowedViolationTypes: _*))
      // P5/P6/P7: event construction
      .select(
        lit("violation").as("event_type"),
        col("v.type").as("violation_type"),
        col("device_uuid"),
        col("vehicle_id"),
        col("account_id"),
        coalesceTimestamp(col("v.timestamp"), col("timestamp")).as("timestamp"),
        col("location"),
        struct(
          col("v.accel_y").as("accel_y"),
          col("v.speed_kph").as("speed_kph"),
          col("v.delta_speed").as("delta_speed")
        ).as("details"),
        col("mqtt_sent_at_ms")
      )
      // F6: consumer-side validity (kafkaConsumer.js:195-198) — JS
      // `!deviceUuid || !ts` drops null/empty device and ts === 0 (a
      // negative ts is truthy in JS and survives; `=!= 0` mirrors that).
      .filter(col("device_uuid").isNotNull && col("device_uuid") =!= "" &&
        col("timestamp") =!= 0)
  }
}
