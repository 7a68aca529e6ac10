package graft.session

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase
import graft.schema.TelemetryModel.{SessionDoc, StatusEvent}

class SessionizeSpec extends SparkTestBase {
  import spark.implicits._

  private def touch(dev: String, ts: Long, action: String = "touch") =
    StatusEvent("device_status", "cable-unplugged", action, dev, ts, None, None)

  test("ST1a: session_window groups touches by 300s gaps per device") {
    val rows = Seq(
      ("d1", 1000L), ("d1", 1100L), ("d1", 1399L),
      ("d1", 1699L),  // gap exactly 300 → still merged (windows touch)
      ("d1", 2000L),  // gap 301 → new session
      ("d2", 1000L))
      .map { case (d, t) => (d, new Timestamp(t * 1000)) }
      .toDF("device_uuid", "ts")
    val out = Sessionize.bySessionWindow(rows, "device_uuid", "ts")
      .select($"device_uuid", unix_timestamp($"start_ts").as("s"),
        unix_timestamp($"end_ts").as("e"), $"n_touches")
      .as[(String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq == Seq(
      ("d1", 1000L, 1699L, 4L), ("d1", 2000L, 2000L, 1L), ("d2", 1000L, 1000L, 1L)))
  }

  test("ST1b streaming: TTL lapse closes sessions via watermark timeout") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StatusEvent]
    val sessions = Sessionize.stateful(
      input.toDS()
        .withColumn("event_ts", timestamp_seconds($"timestamp"))
        .withWatermark("event_ts", "0 seconds")
        .as[StatusEvent])
    val q = sessions.writeStream.format("memory").queryName("sess1")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(touch("d1", 1000), touch("d1", 1100), touch("d2", 1000))
      q.processAllAvailable()
      // advance event time far past 1100+300 → d1/d2 sessions time out
      input.addData(touch("d3", 9000))
      q.processAllAvailable()
      input.addData(touch("d3", 20000)) // push watermark again to flush d3's first
      q.processAllAvailable()
      val got = spark.table("sess1").as[SessionDoc].collect()
        .sortBy(s => (s.device_uuid, s.start_timestamp))
      assert(got.map(s => (s.device_uuid, s.start_timestamp, s.end_timestamp,
        s.n_touches, s.closed_by)).toSeq == Seq(
        ("d1", 1000L, 1100L, 2L, "ttl"),
        ("d2", 1000L, 1000L, 1L, "ttl"),
        ("d3", 9000L, 9000L, 1L, "ttl")))
    } finally q.stop()
  }

  test("ST1b streaming: explicit clear closes the session immediately") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StatusEvent]
    val sessions = Sessionize.stateful(
      input.toDS()
        .withColumn("event_ts", timestamp_seconds($"timestamp"))
        .withWatermark("event_ts", "0 seconds")
        .as[StatusEvent])
    val q = sessions.writeStream.format("memory").queryName("sess2")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(touch("d1", 1000), touch("d1", 1050), touch("d1", 1060, "clear"))
      q.processAllAvailable()
      val got = spark.table("sess2").as[SessionDoc].collect()
      assert(got.map(s => (s.device_uuid, s.start_timestamp, s.end_timestamp,
        s.n_touches, s.closed_by)).toSeq == Seq(("d1", 1000L, 1050L, 2L, "clear")))
    } finally q.stop()
  }

  test("ST1a streaming: session_window works in append mode with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val sessions = Sessionize.bySessionWindow(
      input.toDF().toDF("device_uuid", "sec")
        .withColumn("ts", timestamp_seconds($"sec"))
        .withWatermark("ts", "0 seconds"),
      "device_uuid", "ts")
    val q = sessions.writeStream.format("memory").queryName("sessW")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(("d1", 1000L), ("d1", 1100L))
      q.processAllAvailable()
      input.addData(("d1", 99000L)) // watermark passes 1100+300 → emit
      q.processAllAvailable()
      val got = spark.table("sessW")
        .select($"device_uuid", unix_timestamp($"start_ts"),
          unix_timestamp($"end_ts"), $"n_touches")
        .as[(String, Long, Long, Long)].collect().toSeq
      assert(got == Seq(("d1", 1000L, 1100L, 2L)))
    } finally q.stop()
  }

  test("ST1b streaming: stale touch below the watermark does not kill the query") {
    // The watermark is global across devices, so a lagging device's touch
    // can arrive far below it. On Spark ≥ 3.4 flatMapGroupsWithState
    // filters such late rows before the state function (SPARK-40925) —
    // the stale touch is silently dropped, mirroring the reference's
    // Redis path where a touch on an expired key just re-creates and
    // re-expires it. The timeout clamp in Sessionize.sessionFlatMap is
    // defense-in-depth for paths without that filtering. Either way the
    // query must survive.
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StatusEvent]
    val sessions = Sessionize.stateful(
      input.toDS()
        .withColumn("event_ts", timestamp_seconds($"timestamp"))
        .withWatermark("event_ts", "0 seconds")
        .as[StatusEvent])
    val q = sessions.writeStream.format("memory").queryName("sessStale")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(touch("d3", 99000))
      q.processAllAvailable()
      input.addData(touch("d1", 1000)) // stale: far below watermark
      q.processAllAvailable()          // must not throw
      input.addData(touch("d3", 200000), touch("d3", 300000))
      q.processAllAvailable()
      assert(q.exception.isEmpty)
      val got = spark.table("sessStale").as[SessionDoc].collect()
      // d1's stale touch was late-filtered: no d1 session, d3 closed by ttl
      assert(!got.exists(_.device_uuid == "d1"))
      assert(got.exists(s => s.device_uuid == "d3" && s.closed_by == "ttl"))
    } finally q.stop()
  }

  test("ST1b: within-batch gap larger than TTL splits sessions") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StatusEvent]
    val sessions = Sessionize.stateful(
      input.toDS()
        .withColumn("event_ts", timestamp_seconds($"timestamp"))
        .withWatermark("event_ts", "0 seconds")
        .as[StatusEvent])
    val q = sessions.writeStream.format("memory").queryName("sess3")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(touch("d1", 1000), touch("d1", 2000), touch("d1", 2100))
      q.processAllAvailable()
      val got = spark.table("sess3").as[SessionDoc].collect()
      assert(got.map(s => (s.start_timestamp, s.end_timestamp, s.n_touches,
        s.closed_by)).toSeq == Seq((1000L, 1000L, 1L, "ttl")))
    } finally q.stop()
  }
}
