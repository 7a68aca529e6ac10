package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase

case class IdEvent(ts: Timestamp, key: String, id: String)

/** Streaming windowed HLL distinct ≡ the identical batch sketch per
  * window (the batch-parity oracle pattern), plus estimate sanity vs
  * the exact distinct count. */
class StreamingDistinctSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // 20 minutes of events → four 5-minute windows; identities repeat
  // heavily so the sketch actually deduplicates
  private def events: Seq[IdEvent] =
    (0 until 600).map { i =>
      val minute = i % 20
      IdEvent(ts(f"2024-01-01 10:$minute%02d:${i % 60}%02d"),
        if (i % 2 == 0) "a" else "b", s"user-${i % 97}")
    }

  test("streaming windowed HLL equals the batch sketch per window") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[IdEvent]
    val sink = s"sd_sink_${System.nanoTime()}"
    val q = StreamingDistinct.windowed(input.toDF(), "ts", "key", "id",
        "5 minutes", "10 minutes")
      .writeStream.outputMode(OutputMode.Append)
      .option("checkpointLocation",
        Files.createTempDirectory("sd-ckpt").toString)
      .format("memory").queryName(sink)
      .start()
    try {
      val (b1, b2) = events.sortBy(_.ts.getTime).splitAt(350)
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      input.addData(IdEvent(ts("2024-01-01 12:00:00"), "a", "tail"))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table(sink)
      .select($"win_start", $"key", $"n_rows", $"n_buckets", $"z_scaled", $"hll_est")
      .as[(Timestamp, String, Long, Long, Long, Double)].collect().toSet
    val batch = StreamingDistinct.windowed(events.toDF(), "ts", "key", "id",
        "5 minutes", "10 minutes")
      .select($"win_start", $"key", $"n_rows", $"n_buckets", $"z_scaled", $"hll_est")
      .as[(Timestamp, String, Long, Long, Long, Double)].collect().toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("windowed estimates sit within HLL error bounds of exact distinct counts") {
    val out = StreamingDistinct.windowed(events.toDF(), "ts", "key", "id",
        "5 minutes", "10 minutes")
      .select($"win_start", $"key", $"n_buckets", $"hll_est")
      .as[(Timestamp, String, Long, Double)].collect()
    assert(out.nonEmpty)
    val truth = events.toDF()
      .select(org.apache.spark.sql.functions.window($"ts", "5 minutes")
        .getField("start").as("win_start"), $"key", $"id")
      .distinct().groupBy($"win_start", $"key")
      .count().as[(Timestamp, String, Long)].collect()
      .map { case (w, k, n) => (w, k) -> n }.toMap
    val m = graft.functions.HllSketch.M.toDouble
    out.foreach { case (w, k, nBuckets, est) =>
      val t = truth((w, k)).toDouble
      val corrected =
        if (est <= 2.5 * m && nBuckets < m) m * math.log(m / (m - nBuckets))
        else est
      assert(math.abs(corrected - t) / t <= 0.39,
        s"($w,$k): corrected $corrected vs true $t")
    }
  }
}
