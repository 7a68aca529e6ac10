package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase
import StreamFunnel.{Conversion, FunnelEvent}

/** The streaming funnel state machine: completions match the batch
  * funnel_conversion stage semantics under time-ordered delivery, emit
  * exactly once, and respect the strict-after rule. */
class StreamFunnelSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streamed conversions equal the batch fold, emitted exactly once") {
    val events = Seq(
      // user 1 completes across batches: view | click, purchase
      FunnelEvent(ts("2024-01-01 10:00:00"), 1L, "view"),
      FunnelEvent(ts("2024-01-01 10:05:00"), 1L, "click"),
      FunnelEvent(ts("2024-01-01 10:09:00"), 1L, "purchase"),
      // user 2: purchase BEFORE click — never completes
      FunnelEvent(ts("2024-01-01 10:00:00"), 2L, "view"),
      FunnelEvent(ts("2024-01-01 10:01:00"), 2L, "purchase"),
      FunnelEvent(ts("2024-01-01 10:02:00"), 2L, "click"),
      // user 3: click at the SAME ts as view — strict-after rejects it
      FunnelEvent(ts("2024-01-01 10:00:00"), 3L, "view"),
      FunnelEvent(ts("2024-01-01 10:00:00"), 3L, "click"),
      FunnelEvent(ts("2024-01-01 10:30:00"), 3L, "purchase"),
      // user 4: full funnel, then MORE purchases — one emission only
      FunnelEvent(ts("2024-01-01 10:00:00"), 4L, "view"),
      FunnelEvent(ts("2024-01-01 10:10:00"), 4L, "click"),
      FunnelEvent(ts("2024-01-01 10:20:00"), 4L, "purchase"),
      FunnelEvent(ts("2024-01-01 10:40:00"), 4L, "purchase"))

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FunnelEvent]
    val sink = s"sf_sink_${System.nanoTime()}"
    val q = StreamFunnel.conversions(
        input.toDS().withWatermark("ts", "10 minutes").as[FunnelEvent])
      .writeStream.outputMode(OutputMode.Append)
      .option("checkpointLocation",
        Files.createTempDirectory("sf-ckpt").toString)
      .format("memory").queryName(sink)
      .start()
    try {
      val (b1, b2) = events.sortBy(_.ts.getTime).splitAt(7)
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table(sink).as[Conversion].collect().toSet
    assert(streamed.map(_.user_id) == Set(1L, 4L))
    val u1 = streamed.find(_.user_id == 1L).get
    assert(u1.t_view == ts("2024-01-01 10:00:00") &&
      u1.t_click == ts("2024-01-01 10:05:00") &&
      u1.t_purchase == ts("2024-01-01 10:09:00"))
    // exactly-once emission despite the second qualifying purchase
    assert(spark.table(sink).count() == 2)

    // batch fold over the same events agrees
    val batch = StreamFunnel.conversions(events.toDS()).collect().toSet
    assert(batch == streamed)
  }

  test("idle users are evicted after the horizon; a later funnel restarts from scratch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FunnelEvent]
    val sink = s"sfe_sink_${System.nanoTime()}"
    val q = StreamFunnel.conversions(
        input.toDS().withWatermark("ts", "10 minutes").as[FunnelEvent])
      .writeStream.outputMode(OutputMode.Append)
      .option("checkpointLocation",
        Files.createTempDirectory("sfe-ckpt").toString)
      .format("memory").queryName(sink)
      .start()
    try {
      // partial funnel (view+click), then >24h of event-time silence
      input.addData(
        FunnelEvent(ts("2024-01-01 10:00:00"), 1L, "view"),
        FunnelEvent(ts("2024-01-01 10:05:00"), 1L, "click"))
      q.processAllAvailable()
      input.addData(FunnelEvent(ts("2024-01-03 10:00:00"), 2L, "view"))
      q.processAllAvailable() // watermark passes user 1's idle horizon
      // user 1 returns: a purchase alone must NOT complete the stale
      // funnel (state was evicted); a fresh full sequence completes
      input.addData(FunnelEvent(ts("2024-01-03 10:30:00"), 1L, "purchase"))
      q.processAllAvailable()
      assert(spark.table(sink).count() == 0, "stale funnel must not complete")
      input.addData(
        FunnelEvent(ts("2024-01-03 11:00:00"), 1L, "view"),
        FunnelEvent(ts("2024-01-03 11:05:00"), 1L, "click"),
        FunnelEvent(ts("2024-01-03 11:09:00"), 1L, "purchase"))
      q.processAllAvailable()
      val done = spark.table(sink).as[Conversion].collect()
      assert(done.length == 1 && done.head.user_id == 1L)
      assert(done.head.t_view == ts("2024-01-03 11:00:00"))
    } finally q.stop()
  }

  test("batch funnel stage counts over events agree with funnel_conversion") {
    val d = "/root/testdata/sf0.001"
    val ev = graft.Tables.events(spark, d)
      .selectExpr("ts", "user_id", "event_type").as[FunnelEvent]
    val completions = StreamFunnel.conversions(ev).collect()
    val nFull = graft.SparkEntry.queries("funnel_conversion")(spark, d)
      .select($"n_full_funnel").as[Long].collect().head
    assert(completions.length.toLong == nFull)
    // per-user timestamps respect the strict ordering
    completions.foreach { c =>
      assert(c.t_view.before(c.t_click) && c.t_click.before(c.t_purchase))
    }
  }
}
