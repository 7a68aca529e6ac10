package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.derive.{Detectors, EventsAdapter}

/** Detector + stream-analytics operator exposure (SURVEY §7.5, §2.3
  * P-series JSON ops, tumbling windows, set ops). */
object StreamAnalyticsQueries {

  // ------------------------------------------------- detect_delta_speed
  // Real per-device delta-speed detector over the events-adapted
  // telemetry (lag window; threshold 100 kph over the adapter's
  // value-as-speed column).
  // mqtt_sent_at_ms is tie-free per device in the test data (checked at
  // sf0.1), so the lag order is total.
  private def deltaSpeed(s: SparkSession, d: String): DataFrame =
    Detectors.deltaSpeed(
      EventsAdapter.telemetryFromEvents(Tables.events(s, d)),
      threshold = 100.0,
      orderCols = Seq("mqtt_sent_at_ms"))
      .select(col("device_uuid"), col("mqtt_sent_at_ms"),
        col("speed_kph"), col("prev_speed"), col("delta_speed"),
        col("violation_type"))

  private val deltaSpeedSql =
    s"""WITH ${EventsAdapter.duckdbCte},
       |lagged AS (
       |  SELECT device_uuid, mqtt_sent_at_ms, speed_kph,
       |    LAG(speed_kph) OVER (PARTITION BY device_uuid
       |                         ORDER BY mqtt_sent_at_ms) AS prev_speed
       |  FROM telemetry WHERE device_uuid IS NOT NULL)
       |SELECT device_uuid, mqtt_sent_at_ms, speed_kph, prev_speed,
       |  speed_kph - prev_speed AS delta_speed,
       |  CASE WHEN speed_kph - prev_speed > 0 THEN 'harsh_accel'
       |       ELSE 'harsh_brake' END AS violation_type
       |FROM lagged
       |WHERE speed_kph - prev_speed >= 100.0
       |   OR speed_kph - prev_speed <= -100.0""".stripMargin

  // -------------------------------------------------- detect_geofence
  // Map-only planar geofence over adapter lon/lat; per-device counts.
  private def geofence(s: SparkSession, d: String): DataFrame = {
    val t = EventsAdapter.telemetryFromEvents(Tables.events(s, d))
      .filter(col("device_uuid").isNotNull)
      .withColumn("lon", col("location.coordinates").getItem(0))
      .withColumn("lat", col("location.coordinates").getItem(1))
    t.filter(Detectors.outsideFenceSq(col("lon"), col("lat"), 72.5, 22.0, 0.9))
      .groupBy(col("device_uuid"))
      .agg(count(lit(1)).as("n_geo_violations"))
  }

  private val geofenceSql =
    s"""WITH ${EventsAdapter.duckdbCte}
       |SELECT device_uuid, COUNT(*) AS n_geo_violations
       |FROM telemetry
       |WHERE device_uuid IS NOT NULL
       |  AND (lon - 72.5) * (lon - 72.5) + (lat - 22.0) * (lat - 22.0)
       |      > CAST(0.9 AS DOUBLE) * CAST(0.9 AS DOUBLE)
       |GROUP BY device_uuid""".stripMargin

  // ---------------------------------------------------- q12_json_props
  // P1-family JSON field extraction on the events.props payload.
  private def jsonProps(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(
        count(col("k")).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))

  private val jsonPropsSql =
    """SELECT event_type,
      |  COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n,
      |  SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS sum_k,
      |  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
      |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      |FROM events
      |GROUP BY event_type""".stripMargin

  // ------------------------------------------------- q13_tumbling_agg
  // Tumbling 1-hour event-time windows (the batch plan of the streaming
  // windowed agg; Spark window() start == date_trunc for epoch-aligned
  // widths). Partial aggregation before one shuffle on (window, type).
  private def tumbling(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(
        window(col("ts"), "1 hour").getField("start").as("hour_start"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(38, 2))).cast("double").as("sum_value"))

  private val tumblingSql =
    """SELECT date_trunc('hour', ts) AS hour_start, event_type,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(38,2))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY 1, 2""".stripMargin

  // ------------------------------------------------------- q11_set_ops
  // INTERSECT / EXCEPT over user activity sets.
  private def setOps(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    def users(t: String) =
      ev.filter(col("event_type") === t).select(col("user_id")).distinct()
    val both    = users("purchase").intersect(users("error"))
      .withColumn("cohort", lit("purchase_and_error"))
    val pOnly   = users("purchase").except(users("error"))
      .withColumn("cohort", lit("purchase_only"))
    both.unionByName(pOnly)
      .groupBy(col("cohort")).agg(count(lit(1)).as("n_users"))
  }

  private val setOpsSql =
    """WITH p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
      |e AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error'),
      |tagged AS (
      |  SELECT user_id, 'purchase_and_error' AS cohort FROM (SELECT * FROM p INTERSECT SELECT * FROM e)
      |  UNION ALL
      |  SELECT user_id, 'purchase_only' AS cohort FROM (SELECT * FROM p EXCEPT SELECT * FROM e))
      |SELECT cohort, COUNT(*) AS n_users FROM tagged GROUP BY 1""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("detect_delta_speed", deltaSpeed, Some(deltaSpeedSql)),
    QueryDef("detect_geofence", geofence, Some(geofenceSql)),
    QueryDef("q11_set_ops", setOps, Some(setOpsSql)),
    QueryDef("q12_json_props", jsonProps, Some(jsonPropsSql)),
    QueryDef("q13_tumbling_agg", tumbling, Some(tumblingSql)))
}
