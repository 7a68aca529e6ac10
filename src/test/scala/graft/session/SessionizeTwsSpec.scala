package graft.session

import java.nio.file.Files

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase
import graft.schema.TelemetryModel.{SessionDoc, StatusEvent}

/** transformWithState sessionizer ≡ flatMapGroupsWithState sessionizer
  * over identical streamed inputs: touch-merge, explicit clear,
  * watermark-driven TTL lapse, cross-batch gap exceedance. Runs on the
  * RocksDB provider (a transformWithState prerequisite — and the 100 TB
  * state backend). */
class SessionizeTwsSpec extends SparkTestBase {

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def ev(dev: String, ts: Long, action: String) =
    StatusEvent("device_status", "cable-unplugged", action, dev, ts, None, None)

  /** Drive `sessionize` over the scripted batches, return closed docs. */
  private def run(sessionize: Dataset[StatusEvent] => Dataset[SessionDoc])
      : Seq[(String, Long, Long, Long, String)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StatusEvent]
    val outDir = Files.createTempDirectory("tws-out").toString
    val q = sessionize(
      input.toDF()
        .withColumn("event_ts", timestamp_seconds($"timestamp"))
        .withWatermark("event_ts", "0 seconds")
        .as[StatusEvent])
      .writeStream.outputMode(OutputMode.Append)
      .option("checkpointLocation",
        Files.createTempDirectory("tws-ckpt").toString)
      .format("parquet").option("path", outDir)
      .start()
    try {
      // batch 1: two devices open; d1 merges two touches
      input.addData(ev("d1", 1000, "touch"), ev("d1", 1050, "touch"),
        ev("d2", 1020, "touch"))
      q.processAllAvailable()
      // batch 2: explicit clear closes d1 immediately
      input.addData(ev("d1", 1100, "clear"))
      q.processAllAvailable()
      // batch 3: d2 touch past the gap → old session closes as ttl,
      // new one opens; d3 opens
      input.addData(ev("d2", 1500, "touch"), ev("d3", 1510, "touch"))
      q.processAllAvailable()
      // batch 4: advance the watermark far past everyone's end+gap —
      // the timer (TWS) / event-time timeout (fMGWS) fires the lapses
      input.addData(ev("d9", 9000, "touch"))
      q.processAllAvailable()
      input.addData(ev("d9", 9001, "touch"))
      q.processAllAvailable()
    } finally q.stop()
    import spark.implicits._
    spark.read.parquet(outDir).as[SessionDoc].collect()
      .map(d => (d.device_uuid, d.start_timestamp, d.end_timestamp,
        d.n_touches, d.closed_by)).sorted.toSeq
  }

  test("transformWithState sessions == flatMapGroupsWithState sessions") {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    try {
      val tws   = run(SessionizeTws.stateful(_))
      val fmgws = run(Sessionize.stateful(_))
      assert(tws == fmgws, s"tws=$tws fmgws=$fmgws")
      // and both match the scripted expectation
      assert(tws == Seq(
        ("d1", 1000L, 1050L, 2L, "clear"),
        ("d2", 1020L, 1020L, 1L, "ttl"),
        ("d2", 1500L, 1500L, 1L, "ttl"),
        ("d3", 1510L, 1510L, 1L, "ttl")),
        s"unexpected sessions: $tws")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(ProviderKey, v)
        case None    => spark.conf.unset(ProviderKey)
      }
    }
  }
}
