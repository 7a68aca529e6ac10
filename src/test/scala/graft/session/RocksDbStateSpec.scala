package graft.session

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase
import graft.schema.TelemetryModel.{SessionDoc, StatusEvent}

/** Stateful sessionization on the RocksDB state store provider — the
  * 100 TB state backend (the default HDFSBackedStateStore keeps every
  * partition's state map ON HEAP; RocksDB spills to local disk with
  * bounded memory, which is what makes million-key session state
  * viable per executor). The engine code is provider-agnostic; this
  * spec pins that the sessionizer produces identical results and
  * honors checkpoint restart under the RocksDB provider.
  *
  * The provider is a session conf read at query START, so it is set
  * for this spec's queries and restored after — the shared test
  * session's other streaming suites keep the default provider.
  */
class RocksDbStateSpec extends SparkTestBase {

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def ev(dev: String, ts: Long, action: String) =
    StatusEvent("device_status", "cable-unplugged", action, dev, ts, None, None)

  test("sessionize on RocksDB provider: same results, checkpoint restart works") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    try {
      val input = MemoryStream[StatusEvent]
      val ckpt = Files.createTempDirectory("rocks-ckpt").toString
      val outDir = Files.createTempDirectory("rocks-out").toString

      def start() = Sessionize.stateful(
        input.toDF()
          .withColumn("event_ts", timestamp_seconds($"timestamp"))
          .withWatermark("event_ts", "0 seconds")
          .as[StatusEvent])
        .writeStream.outputMode(OutputMode.Append)
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", outDir)
        .start()

      // batch 1: open sessions on two devices, then close d1 explicitly
      val q1 = start()
      try {
        input.addData(ev("d1", 1000, "touch"), ev("d1", 1050, "touch"),
          ev("d2", 1020, "touch"))
        q1.processAllAvailable()
        input.addData(ev("d1", 1100, "clear"))
        q1.processAllAvailable()
      } finally q1.stop()

      // restart from checkpoint: RocksDB state (d2's open session) must
      // reload; a later clear closes it with the full touch history
      val q2 = start()
      try {
        input.addData(ev("d2", 1200, "touch"), ev("d2", 1300, "clear"))
        q2.processAllAvailable()
      } finally q2.stop()

      val sessions = spark.read.parquet(outDir).as[SessionDoc].collect()
        .map(d => (d.device_uuid, d.start_timestamp, d.end_timestamp,
          d.n_touches, d.closed_by)).sorted.toSeq
      assert(sessions == Seq(
        ("d1", 1000L, 1050L, 2L, "clear"),
        ("d2", 1020L, 1200L, 2L, "clear")),
        s"unexpected sessions: $sessions")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(ProviderKey, v)
        case None    => spark.conf.unset(ProviderKey)
      }
    }
  }
}
