package graft.schema

import org.apache.spark.sql.types._

/** Canonical schema for raw vehicle telemetry.
  *
  * Mirrors the reference's wire format: generator
  * `/root/reference/mqtt_publish.js:236-284`, documented shape
  * `/root/reference/README.md:439-475`, consumed tolerant-JSON-style by
  * `/root/reference/TelematicsViolationDeriverJob.java:106-214`.
  *
  * Schema-on-read: `from_json` in PERMISSIVE mode yields null for absent /
  * malformed fields, matching the reference's `has()`-guarded access
  * (`TelematicsViolationDeriverJob.java:208-214`).
  */
object TelemetrySchema {

  /** One violation element inside `violations[]`
    * (`/root/reference/mqtt_publish.js:193-229`). */
  val violationType: StructType = StructType(Seq(
    StructField("timestamp", LongType),
    StructField("type", StringType),       // "harsh_brake" | "harsh_accel"
    StructField("accel_y", DoubleType),
    StructField("speed_kph", DoubleType),
    StructField("delta_speed", DoubleType)
  ))

  /** GeoJSON Point (`/root/reference/kafkaConsumer.js:124-127`). */
  val locationType: StructType = StructType(Seq(
    StructField("type", StringType),                       // "Point"
    StructField("coordinates", ArrayType(DoubleType))      // [lon, lat]
  ))

  val telemetry: StructType = StructType(Seq(
    StructField("device_uuid", StringType),
    StructField("mqtt_sent_at_ms", LongType),
    StructField("timestamp", LongType),                    // epoch seconds
    StructField("fix_quality", StringType),
    StructField("temp_C", DoubleType),
    StructField("accel_x", DoubleType),
    StructField("accel_y", DoubleType),
    StructField("accel_z", DoubleType),
    StructField("gyro_x", DoubleType),
    StructField("gyro_y", DoubleType),
    StructField("gyro_z", DoubleType),
    StructField("cpu_temp", IntegerType),
    StructField("soc_temp", IntegerType),
    StructField("main_board_temp", DoubleType),
    StructField("sim_iccid", StringType),
    StructField("sim_imsi", StringType),
    StructField("signal_strength_percent", IntegerType),
    StructField("imu_is_stopped", BooleanType),
    StructField("dashcam_power_source", StringType),       // "battery"|"external"
    StructField("battery_capacity", IntegerType),
    StructField("lat_dir", StringType),
    StructField("lon_dir", StringType),
    StructField("location_changed", StringType),           // int OR bool on wire
    StructField("speed_kph", DoubleType),
    StructField("speed_mph", DoubleType),
    StructField("ontrip", BooleanType),
    StructField("location", locationType),
    StructField("vehicle_id", StringType),
    StructField("account_id", StringType),
    StructField("violations", ArrayType(violationType))
  ))

  /** Violation types passed by the allowlist
    * (`/root/reference/TelematicsViolationDeriverJob.java:98-102`).
    * NOTE: the hyphenated variants in the reference README
    * ("harsh-braking"/"harsh-acceleration", README.md:578,613) are
    * deliberately NOT here — the running system drops them (SURVEY §7.6.2).
    */
  val allowedViolationTypes: Seq[String] = Seq("harsh_brake", "harsh_accel")
}

/** Typed layer for stateful ops that need Encoders (sessionization). */
object TelemetryModel {
  /** Derived device-status event
    * (`/root/reference/TelematicsViolationDeriverJob.java:127-139`). */
  case class StatusEvent(
      event_type: String,       // "device_status"
      status_type: String,      // "cable-unplugged"
      action: String,           // "touch" | "clear"
      device_uuid: String,
      timestamp: Long,          // epoch seconds
      vehicle_id: Option[String],
      account_id: Option[String])

  /** Consolidated session document
    * (`/root/reference/kafkaConsumer.js:322-333`). */
  case class SessionDoc(
      device_uuid: String,
      status_type: String,
      start_timestamp: Long,
      end_timestamp: Long,
      n_touches: Long,
      closed_by: String)        // "ttl" | "clear" | "watermark"
}
