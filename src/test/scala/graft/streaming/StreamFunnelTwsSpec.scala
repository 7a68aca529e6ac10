package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase
import StreamFunnel.{Conversion, FunnelEvent}

/** The transformWithState port of the streaming funnel, on RocksDB:
  * identical conversions to the fMGWS form and the batch fold, exactly
  * once, with timer-based idle eviction. */
class StreamFunnelTwsSpec extends SparkTestBase {
  import spark.implicits._

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def ts(s: String) = Timestamp.valueOf(s)

  private def drive(batches: Seq[Seq[FunnelEvent]]): Seq[Conversion] = {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    val sink = s"sftws_sink_${System.nanoTime()}"
    try {
      val input = MemoryStream[FunnelEvent]
      val q = StreamFunnelTws.conversions(
          input.toDS().withWatermark("ts", "10 minutes").as[FunnelEvent])
        .writeStream.outputMode(OutputMode.Append)
        .option("checkpointLocation",
          Files.createTempDirectory("sftws-ckpt").toString)
        .format("memory").queryName(sink)
        .start()
      try {
        batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
        spark.table(sink).as[Conversion].collect().toSeq
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(ProviderKey, v)
        case None    => spark.conf.unset(ProviderKey)
      }
      try spark.catalog.dropTempView(sink) catch { case _: Throwable => () }
    }
  }

  test("TWS conversions equal the fMGWS/batch fold, emitted exactly once") {
    val events = Seq(
      FunnelEvent(ts("2024-01-01 10:00:00"), 1L, "view"),
      FunnelEvent(ts("2024-01-01 10:05:00"), 1L, "click"),
      FunnelEvent(ts("2024-01-01 10:09:00"), 1L, "purchase"),
      // purchase before click: never completes
      FunnelEvent(ts("2024-01-01 10:00:00"), 2L, "view"),
      FunnelEvent(ts("2024-01-01 10:01:00"), 2L, "purchase"),
      FunnelEvent(ts("2024-01-01 10:02:00"), 2L, "click"),
      // click at the same ts as view: strict-after rejects
      FunnelEvent(ts("2024-01-01 10:00:00"), 3L, "view"),
      FunnelEvent(ts("2024-01-01 10:00:00"), 3L, "click"),
      FunnelEvent(ts("2024-01-01 10:30:00"), 3L, "purchase"),
      // full funnel then extra purchases: one emission only
      FunnelEvent(ts("2024-01-01 10:00:00"), 4L, "view"),
      FunnelEvent(ts("2024-01-01 10:10:00"), 4L, "click"),
      FunnelEvent(ts("2024-01-01 10:20:00"), 4L, "purchase"),
      FunnelEvent(ts("2024-01-01 10:40:00"), 4L, "purchase"))

    val sorted = events.sortBy(_.ts.getTime)
    val streamed = drive(Seq(sorted.take(7), sorted.drop(7))).toSet
    assert(streamed.map(_.user_id) == Set(1L, 4L))
    assert(streamed.size == 2) // exactly once despite extra purchase
    // the fMGWS batch fold over the same events agrees byte-for-byte
    val batch = StreamFunnel.conversions(events.toDS()).collect().toSet
    assert(batch == streamed)
  }

  test("TWS idle eviction: stale partial funnels never complete; restart works") {
    val got = drive(Seq(
      Seq(FunnelEvent(ts("2024-01-01 10:00:00"), 1L, "view"),
          FunnelEvent(ts("2024-01-01 10:05:00"), 1L, "click")),
      // >24h of event-time silence for user 1
      Seq(FunnelEvent(ts("2024-01-03 10:00:00"), 2L, "view")),
      // stale purchase must NOT complete; fresh sequence must
      Seq(FunnelEvent(ts("2024-01-03 10:30:00"), 1L, "purchase")),
      Seq(FunnelEvent(ts("2024-01-03 11:00:00"), 1L, "view"),
          FunnelEvent(ts("2024-01-03 11:05:00"), 1L, "click"),
          FunnelEvent(ts("2024-01-03 11:09:00"), 1L, "purchase"))))
    assert(got.length == 1 && got.head.user_id == 1L)
    assert(got.head.t_view == ts("2024-01-03 11:00:00"))
  }
}
