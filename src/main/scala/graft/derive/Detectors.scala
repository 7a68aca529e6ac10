package graft.derive

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytic violation detectors (SURVEY §7.5 "real detectors"): the
  * reference only *carries* generator-produced violations; its job names
  * "overspeed" and "geo_violation" as future types
  * (`TelematicsViolationDeriverJob.java:101`). These compute them.
  *
  * Scale shape: one shuffle on the device key, per-partition sort for
  * the lag window — the canonical keyed-timeline pattern. The geofence
  * check is map-only.
  */
object Detectors {

  /** Per-device speed-delta detector: flags records whose speed changed
    * by ≥ `threshold` kph since the previous sample (lag window).
    * `orderCols` must make the per-device timeline a total order. */
  def deltaSpeed(telemetry: DataFrame, threshold: Double,
                 deviceCol: String = "device_uuid",
                 speedCol: String = "speed_kph",
                 orderCols: Seq[String] = Seq("timestamp")): DataFrame = {
    val w = Window.partitionBy(col(deviceCol)).orderBy(orderCols.map(col): _*)
    telemetry
      .filter(col(deviceCol).isNotNull)
      .withColumn("prev_speed", lag(col(speedCol), 1).over(w))
      .withColumn("delta_speed", col(speedCol) - col("prev_speed"))
      .filter(col("delta_speed") >= threshold || col("delta_speed") <= -threshold)
      .withColumn("violation_type",
        when(col("delta_speed") > 0, lit("harsh_accel"))
          .otherwise(lit("harsh_brake")))
  }

  /** Planar (small-region) geofence: squared-distance in degree space
    * against a circular fence — multiplication-only, so the predicate is
    * bit-deterministic across engines (no libm). For continent-scale
    * fences use [[haversineKm]] instead. */
  def outsideFenceSq(lon: Column, lat: Column, cLon: Double, cLat: Double,
                     radiusDeg: Double): Column = {
    val d2 = (lon - cLon) * (lon - cLon) + (lat - cLat) * (lat - cLat)
    d2 > radiusDeg * radiusDeg
  }

  /** Great-circle distance (km). Library surface only — trig libm results
    * differ in final ulps across engines, so this is not oracle-gated. */
  def haversineKm(lon1: Column, lat1: Column, lon2: Column, lat2: Column): Column = {
    val r = 6371.0088
    val dLat = radians(lat2 - lat1) / 2
    val dLon = radians(lon2 - lon1) / 2
    val a = sin(dLat) * sin(dLat) +
      cos(radians(lat1)) * cos(radians(lat2)) * sin(dLon) * sin(dLon)
    lit(2 * r) * asin(sqrt(a))
  }
}
