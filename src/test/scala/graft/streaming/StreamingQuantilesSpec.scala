package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase

case class ValueEvent(ts: Timestamp, key: String, value: Double)

/** Streaming windowed t-digest quantiles ≡ the identical batch
  * computation, window by window — the batch-parity oracle pattern used
  * for the demux and interval-join paths. */
class StreamingQuantilesSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def events: Seq[ValueEvent] = {
    val rnd = new scala.util.Random(7)
    (0 until 400).map { i =>
      val minute = i % 20 // 20 minutes → four 5-minute windows
      ValueEvent(ts(f"2024-01-01 10:$minute%02d:${i % 60}%02d"),
        if (i % 3 == 0) "a" else "b", math.floor(rnd.nextDouble() * 1000) / 10)
    }
  }

  test("streaming windowed quantiles equal the batch digest per window") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ValueEvent]
    val sink = s"sq_sink_${System.nanoTime()}"
    val q = StreamingQuantiles.windowed(input.toDF(), "ts", "key", "value",
        "5 minutes", "10 minutes", Seq(50, 95, 99))
      .writeStream.outputMode(OutputMode.Append)
      .option("checkpointLocation",
        Files.createTempDirectory("sq-ckpt").toString)
      .format("memory").queryName(sink)
      .start()
    try {
      // batches must be time-ordered: an index split interleaves event
      // times so batch 2 carries rows for windows the batch-1 watermark
      // already finalized — the engine correctly DROPS those as late,
      // and the streamed window then differs from the full batch
      // computation. Time-ordered batches model a real ingest feed.
      val (b1, b2) = events.sortBy(_.ts.getTime).splitAt(250)
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      // advance the watermark far past every window so all finalize
      input.addData(ValueEvent(ts("2024-01-01 12:00:00"), "a", 0.0))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table(sink)
      .select($"win_start", $"key", $"n", $"p50", $"p95", $"p99")
      .as[(Timestamp, String, Long, Double, Double, Double)]
      .collect().toSet

    val batch = StreamingQuantiles.windowed(events.toDF(), "ts", "key",
        "value", "5 minutes", "10 minutes", Seq(50, 95, 99))
      .select($"win_start", $"key", $"n", $"p50", $"p95", $"p99")
      .as[(Timestamp, String, Long, Double, Double, Double)]
      .collect().toSet

    // every batch window must be emitted by the stream, value-identical
    // (merge-order invariance of the digest); the stream may emit one
    // extra window for the watermark-advancing sentinel row
    assert(batch.subsetOf(streamed),
      s"missing/unequal windows:\n${(batch -- streamed).mkString("\n")}")
    assert(streamed.size <= batch.size + 1)
  }

  test("append mode emits each window exactly once") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ValueEvent]
    val sink = s"sq_once_${System.nanoTime()}"
    val q = StreamingQuantiles.windowed(input.toDF(), "ts", "key", "value",
        "5 minutes", "1 minutes", Seq(50))
      .writeStream.outputMode(OutputMode.Append)
      .option("checkpointLocation",
        Files.createTempDirectory("sq-ckpt2").toString)
      .format("memory").queryName(sink)
      .start()
    try {
      input.addData(events.take(100): _*); q.processAllAvailable()
      input.addData(ValueEvent(ts("2024-01-01 13:00:00"), "a", 1.0))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table(sink)
      .select($"win_start", $"key").as[(Timestamp, String)].collect().toSeq
    assert(rows.nonEmpty)
    assert(rows.distinct.size == rows.size, "a window was emitted twice")
  }
}
