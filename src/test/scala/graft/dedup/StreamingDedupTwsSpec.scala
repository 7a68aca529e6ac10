package graft.dedup

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase

case class DedupRec(fp: String, ts: Timestamp)

/** transformWithState exact dedup: same first-arrival-wins contract as
  * the stock dropDuplicatesWithinWatermark form, same horizon purge —
  * on RocksDB with per-key timers. */
class StreamingDedupTwsSpec extends SparkTestBase {
  import spark.implicits._

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def drive(batches: Seq[Seq[(String, Long)]],
                    horizonSec: Long): Seq[DedupRec] = {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    val sink = s"dtws_sink_${System.nanoTime()}"
    try {
      val input = MemoryStream[(String, Long)]
      val recs = input.toDF().toDF("fp", "sec")
        .withColumn("ts", timestamp_seconds($"sec"))
        .withWatermark("ts", s"$horizonSec seconds")
        .select($"fp", $"ts").as[DedupRec]
      val q = StreamingDedupTws.withinHorizon[DedupRec](recs, _.fp, _.ts, horizonSec)
        .writeStream.outputMode(OutputMode.Append)
        .option("checkpointLocation",
          Files.createTempDirectory("dtws-ckpt").toString)
        .format("memory").queryName(sink)
        .start()
      try {
        batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
        spark.table(sink).as[DedupRec].collect().toSeq
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(ProviderKey, v)
        case None    => spark.conf.unset(ProviderKey)
      }
      try spark.catalog.dropTempView(sink) catch { case _: Throwable => () }
    }
  }

  test("duplicates within the horizon are dropped across batches (stock parity)") {
    val got = drive(Seq(
      Seq(("a", 1000L), ("b", 1001L), ("a", 1002L)), // in-batch dup
      Seq(("a", 1050L), ("c", 1060L))),              // cross-batch dup
      horizonSec = 100)
    assert(got.map(_.fp).sorted == Seq("a", "b", "c"))
  }

  test("state purges: a key re-appearing past the horizon is new again") {
    val got = drive(Seq(
      Seq(("a", 1000L)),
      Seq(("z", 5000L)), // advances watermark far past a's horizon
      Seq(("a", 5001L))),
      horizonSec = 100)
    assert(got.count(_.fp == "a") == 2)
    assert(got.count(_.fp == "z") == 1)
  }
}
