package graft.derive

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Literal-row golden tests for the analytic detectors — the
  * oracle-independent twin the detect_* queries lacked in round 9, when a
  * testdata schema shift silenced their DuckDB rows and left the detector
  * logic with no evidence at all. These pin the semantics on hand-built
  * timelines regardless of what the shared test tables look like. */
class DetectorsSpec extends SparkTestBase {
  import spark.implicits._

  private val timeline = Seq(
    // device a: 10 → 120 (+110, harsh_accel) → 15 (-105, harsh_brake)
    ("device-a", 1000L, 10.0),
    ("device-a", 2000L, 120.0),
    ("device-a", 3000L, 15.0),
    // device b: small deltas only — never flagged
    ("device-b", 1000L, 50.0),
    ("device-b", 2000L, 80.0),
    // null device: dropped by the validity gate even with a huge delta
    (null.asInstanceOf[String], 1000L, 0.0),
    (null.asInstanceOf[String], 2000L, 500.0)
  ).toDF("device_uuid", "mqtt_sent_at_ms", "speed_kph")

  test("deltaSpeed golden: flags |delta| >= threshold with signed type") {
    val out = Detectors.deltaSpeed(timeline, threshold = 100.0,
      orderCols = Seq("mqtt_sent_at_ms"))
      .select("device_uuid", "mqtt_sent_at_ms", "prev_speed",
        "delta_speed", "violation_type")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getString(4))).toSet
    assert(out == Set(
      ("device-a", 2000L, 10.0, 110.0, "harsh_accel"),
      ("device-a", 3000L, 120.0, -105.0, "harsh_brake")))
  }

  test("deltaSpeed: first sample per device has no prev and is never flagged") {
    val single = Seq(("device-c", 1000L, 999.0))
      .toDF("device_uuid", "mqtt_sent_at_ms", "speed_kph")
    assert(Detectors.deltaSpeed(single, threshold = 1.0,
      orderCols = Seq("mqtt_sent_at_ms")).count() == 0)
  }

  test("deltaSpeed: threshold boundary is inclusive on both signs") {
    val edge = Seq(
      ("d", 1L, 0.0), ("d", 2L, 100.0), // exactly +100
      ("e", 1L, 100.0), ("e", 2L, 0.0), // exactly -100
      ("f", 1L, 0.0), ("f", 2L, 99.9)   // just under
    ).toDF("device_uuid", "mqtt_sent_at_ms", "speed_kph")
    val flagged = Detectors.deltaSpeed(edge, threshold = 100.0,
      orderCols = Seq("mqtt_sent_at_ms"))
      .select("device_uuid").as[String].collect().toSet
    assert(flagged == Set("d", "e"))
  }

  test("outsideFenceSq golden: strict squared-distance boundary, no libm") {
    // radius 0.5 and the edge point's 0.5 offset are exactly
    // representable doubles, so the on-the-boundary case is a true
    // equality test of the strict `>` (0.9-style offsets round and
    // land epsilon-outside)
    val pts = Seq(
      ("center", 72.5, 22.0),       // d² = 0       → inside
      ("edge", 73.0, 22.0),         // d² = r²      → NOT outside (strict >)
      ("out_lon", 73.125, 22.0),    // d² = 0.390625 → outside
      ("out_diag", 72.875, 22.375), // d² = 0.28125  → outside
      ("in_diag", 72.75, 22.25)     // d² = 0.125    → inside
    ).toDF("name", "lon", "lat")
    val outside = pts.filter(Detectors.outsideFenceSq(
      col("lon"), col("lat"), 72.5, 22.0, 0.5))
      .select("name").as[String].collect().toSet
    assert(outside == Set("out_lon", "out_diag"))
  }
}
