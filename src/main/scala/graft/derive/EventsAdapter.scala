package graft.derive

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic mapping of the shared `events` test table into telemetry
  * records, so the full reference pipeline (parse gates → explode →
  * allowlist → projection, SURVEY §2) can be hash-checked against a
  * DuckDB oracle over the SAME parquet input (FIXTURES.md §B).
  *
  * The mapping intentionally exercises every edge the reference handles:
  *   - `user_id % 37 == 0`         → null device_uuid (F1 validity gate)
  *   - event_type = "signup"       → null violations[] (F3 array gate)
  *   - event_type = "click"        → hyphenated "harsh-braking" type,
  *                                   which the allowlist must DROP
  *                                   (reference quirk, SURVEY §7.6.2)
  *   - event_type = "view"         → 2 elements, first with timestamp=0
  *                                   (P7 timestamp-coalesce path)
  *   - value < 30                  → dashcam_power_source = "battery"
  *                                   (F2 status-event predicate; ~p0.3 vs
  *                                   the reference generator's p0.15,
  *                                   mqtt_publish.js:33)
  *
  * Every expression here uses only integer arithmetic, string concat and
  * IEEE double ops that DuckDB evaluates bit-identically — see
  * `EventsAdapter.duckdbCte` for the mirrored SQL.
  */
object EventsAdapter {

  /** events(event_id, ts, user_id, event_type, value, props) → telemetry. */
  def telemetryFromEvents(events: DataFrame): DataFrame = {
    val tsSec  = expr("unix_millis(ts) DIV 1000")
    val sentMs = expr("unix_millis(ts)")
    val vElem = (t: String, ts0: Boolean) => struct(
      (if (ts0) lit(0L) else tsSec).as("timestamp"),
      lit(t).as("type"),
      (when(col("event_type") === "error", -col("value") / 20.0)
        .otherwise(col("value") / 20.0)).as("accel_y"),
      col("value").as("speed_kph"),
      (when(col("event_type") === "error", lit(-5.0)).otherwise(lit(5.0)))
        .as("delta_speed"))

    events.select(
      when(col("user_id") % 37 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("device-"), col("user_id"))).as("device_uuid"),
      sentMs.as("mqtt_sent_at_ms"),
      tsSec.as("timestamp"),
      when(col("value") < 30.0, lit("battery")).otherwise(lit("external"))
        .as("dashcam_power_source"),
      col("value").as("speed_kph"),
      struct(
        lit("Point").as("type"),
        array(lit(72.0) + (col("user_id") % 100).cast("double") / 100.0,
              lit(21.0) + (col("event_id") % 100).cast("double") / 50.0)
          .as("coordinates")).as("location"),
      concat(lit("veh-"), col("user_id") % 10).as("vehicle_id"),
      concat(lit("acct-"), col("user_id") % 7).as("account_id"),
      when(col("event_type") === "error", array(vElem("harsh_brake", false)))
        .when(col("event_type") === "purchase", array(vElem("harsh_accel", false)))
        .when(col("event_type") === "click", array(vElem("harsh-braking", false)))
        .when(col("event_type") === "view",
          array(vElem("harsh_accel", true), vElem("harsh_brake", false)))
        .otherwise(lit(null)).as("violations")
    )
  }

  /** DuckDB CTE computing the identical telemetry relation from
    * `<sfDir>/events.parquet` — keep in lockstep with
    * [[telemetryFromEvents]]. Reads the `events` view the driver
    * registers over the parquet file. Violations are mirrored as parallel
    * arrays (v_ts/v_type/...) zipped by index, which unnests identically
    * to Spark's explode of an array-of-structs. */
  val duckdbCte: String =
    """telemetry AS (
      |  SELECT
      |    CASE WHEN user_id % 37 = 0 THEN NULL
      |         ELSE 'device-' || CAST(user_id AS VARCHAR) END AS device_uuid,
      |    epoch_ms(ts) AS mqtt_sent_at_ms,
      |    epoch_ms(ts) // 1000 AS ts_sec,
      |    CASE WHEN value < 30.0 THEN 'battery' ELSE 'external' END AS dashcam_power_source,
      |    value AS speed_kph,
      |    72.0 + CAST(user_id % 100 AS DOUBLE) / 100.0 AS lon,
      |    21.0 + CAST(event_id % 100 AS DOUBLE) / 50.0 AS lat,
      |    'veh-' || CAST(user_id % 10 AS VARCHAR) AS vehicle_id,
      |    'acct-' || CAST(user_id % 7 AS VARCHAR) AS account_id,
      |    CASE event_type
      |      WHEN 'error'    THEN [epoch_ms(ts) // 1000]
      |      WHEN 'purchase' THEN [epoch_ms(ts) // 1000]
      |      WHEN 'click'    THEN [epoch_ms(ts) // 1000]
      |      WHEN 'view'     THEN [0, epoch_ms(ts) // 1000]
      |      ELSE NULL END AS v_ts,
      |    CASE event_type
      |      WHEN 'error'    THEN ['harsh_brake']
      |      WHEN 'purchase' THEN ['harsh_accel']
      |      WHEN 'click'    THEN ['harsh-braking']
      |      WHEN 'view'     THEN ['harsh_accel', 'harsh_brake']
      |      ELSE NULL END AS v_type,
      |    CASE WHEN event_type = 'error' THEN -value / 20.0
      |         ELSE value / 20.0 END AS v_accel_y,
      |    CASE WHEN event_type = 'error' THEN CAST(-5 AS DOUBLE)
      |         ELSE CAST(5 AS DOUBLE) END AS v_delta
      |  FROM events
      |)""".stripMargin
}
