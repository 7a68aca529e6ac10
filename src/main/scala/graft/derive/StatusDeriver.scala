package graft.derive

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Derive device-status ("cable-unplugged" touch) events from telemetry
  * (`/root/reference/TelematicsViolationDeriverJob.java:124-141`).
  *
  * The reference emits a status event for every telemetry record whose
  * power source is "battery" (case-insensitive, Java:125), with
  * action="touch" always (the "clear" branch is dead code in the running
  * system — SURVEY §7.6.1). Pure `DataFrame => DataFrame`; map-only plan.
  */
object StatusDeriver {
  def apply(telemetry: DataFrame): DataFrame = {
    telemetry
      // F1: validity gate (Java:124)
      .filter(col("device_uuid").isNotNull && col("timestamp") > 0)
      // F2/P8: case-insensitive power-source predicate (Java:125)
      .filter(lower(col("dashcam_power_source")) === "battery")
      // P5: status event construction (Java:127-138)
      .select(
        lit("device_status").as("event_type"),
        lit("cable-unplugged").as("status_type"),
        lit("touch").as("action"),
        col("device_uuid"),
        col("timestamp"),
        col("vehicle_id"),
        col("account_id"),
        col("location")
      )
  }
}
