package graft.sink

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase
import graft.schema.TelemetryModel.{SessionDoc, StatusEvent}
import graft.session.Sessionize

/** K3/K4 store sinks + the full session-consolidation composition
  * (SURVEY §3.2): status events → stateful sessionizer → idempotent
  * upsert; final state per key equals the reference's final Mongo doc
  * (§7.6.5 equivalence). */
class EventStoreSinkSpec extends SparkTestBase {
  import spark.implicits._

  test("upsertParquet replaces on key and keeps unrelated rows") {
    val dir = Files.createTempDirectory("upsert").toString + "/docs"
    val b1 = Seq(("d1", 10L, 1L), ("d2", 20L, 1L)).toDF("dev", "end_ts", "v")
    EventStoreSink.upsertParquet(spark, b1, dir, Seq("dev"))
    val b2 = Seq(("d2", 99L, 2L), ("d3", 30L, 1L)).toDF("dev", "end_ts", "v")
    EventStoreSink.upsertParquet(spark, b2, dir, Seq("dev"))
    val got = spark.read.parquet(dir)
      .select($"dev", $"end_ts", $"v").as[(String, Long, Long)]
      .collect().sorted.toSeq
    assert(got == Seq(("d1", 10L, 1L), ("d2", 99L, 2L), ("d3", 30L, 1L)))
    // idempotent: replaying the same batch changes nothing
    EventStoreSink.upsertParquet(spark, b2, dir, Seq("dev"))
    assert(spark.read.parquet(dir).count() == 3)
  }

  test("status stream -> stateful sessions -> upsert store (3.2 end-to-end)") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("sess-store").toString + "/sessions"
    val input = MemoryStream[StatusEvent]
    val sessions = Sessionize.stateful(
      input.toDS()
        .withColumn("event_ts", timestamp_seconds($"timestamp"))
        .withWatermark("event_ts", "0 seconds")
        .as[StatusEvent])
    val q = sessions.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[SessionDoc], _: Long) =>
        EventStoreSink.upsertParquet(spark, batch.toDF(), dir,
          Seq("device_uuid", "start_timestamp"))
      }
      .start()
    try {
      def touch(d: String, t: Long) =
        StatusEvent("device_status", "cable-unplugged", "touch", d, t, None, None)
      input.addData(touch("d1", 1000), touch("d1", 1100))
      q.processAllAvailable()
      input.addData(touch("d1", 5000)) // closes first session via watermark
      q.processAllAvailable()
      input.addData(touch("d1", 99999)) // closes the 5000 session
      q.processAllAvailable()
      val got = spark.read.parquet(dir)
        .select($"device_uuid", $"start_timestamp", $"end_timestamp",
          $"n_touches", $"closed_by")
        .as[(String, Long, Long, Long, String)].collect().sorted.toSeq
      assert(got == Seq(
        ("d1", 1000L, 1100L, 2L, "ttl"),
        ("d1", 5000L, 5000L, 1L, "ttl")))
    } finally q.stop()
  }
}
