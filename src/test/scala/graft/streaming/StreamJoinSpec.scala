package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Stream-stream interval join: correctness vs the identical batch
  * join, match windowing, and bounded join state (the watermark +
  * interval purge contract — the property that makes the operator safe
  * on an unbounded stream).
  */
class StreamJoinSpec extends SparkTestBase {
  import spark.implicits._

  private val Lookback = 300 // seconds

  // (device, epoch-second, label)
  private val statusRows = Seq(
    ("dA", 100L, "s1"), ("dA", 700L, "s2"), ("dB", 150L, "s3"))
  private val violationRows = Seq(
    ("dA", 150L, "v1"),  // s1@100 within (−300, 150]
    ("dA", 650L, "v2"),  // s1@100 too old; s2@700 in the future → NO match
    ("dA", 750L, "v3"),  // s2@700 within
    ("dB", 500L, "v4"))  // s3@150 older than 500−300 → NO match

  private def prep(df: DataFrame, prefix: String): DataFrame =
    df.toDF(s"${prefix}_dev", s"${prefix}_ts_s", s"${prefix}_label")
      .withColumn(s"${prefix}_ts", timestamp_seconds(col(s"${prefix}_ts_s")))
      .withWatermark(s"${prefix}_ts", "0 seconds")

  private def joined(v: DataFrame, s: DataFrame): DataFrame =
    StreamJoin.interval(v, s, "v_dev", "s_dev", "v_ts", "s_ts", Lookback)
      .select(col("v_label"), col("s_label"))

  private val expected = Set(("v1", "s1"), ("v3", "s2"))

  test("streaming interval join equals batch; only in-window context matches") {
    implicit val sqlCtx = spark.sqlContext
    val vIn = MemoryStream[(String, Long, String)]
    val sIn = MemoryStream[(String, Long, String)]
    val out = mutable.Buffer[Row]()

    val q = joined(prep(vIn.toDF(), "v"), prep(sIn.toDF(), "s"))
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        out.synchronized { out ++= b.collect() }; ()
      }
      .start()
    try {
      sIn.addData(statusRows: _*)
      vIn.addData(violationRows: _*)
      q.processAllAvailable()

      val got = out.synchronized {
        out.map(r => (r.getString(0), r.getString(1))).toSet
      }
      assert(got == expected, s"streaming matches $got != $expected")

      // the identical join in batch mode — same helper, same condition
      val batch = joined(
        prep(violationRows.toDF(), "v"), prep(statusRows.toDF(), "s"))
        .as[(String, String)].collect().toSet
      assert(got == batch, s"streaming $got != batch $batch")
    } finally q.stop()
  }

  test("join state is purged once the watermark passes the interval") {
    implicit val sqlCtx = spark.sqlContext
    val vIn = MemoryStream[(String, Long, String)]
    val sIn = MemoryStream[(String, Long, String)]

    val q = joined(prep(vIn.toDF(), "v"), prep(sIn.toDF(), "s"))
      .writeStream.format("noop").start()
    try {
      sIn.addData(statusRows: _*)
      vIn.addData(violationRows: _*)
      q.processAllAvailable()
      // push both watermarks far past every buffered row + interval;
      // the state manager must evict the old rows
      sIn.addData(("dZ", 100000L, "sz"))
      vIn.addData(("dZ", 100000L, "vz"))
      q.processAllAvailable()
      sIn.addData(("dZ", 100600L, "sz2"))
      vIn.addData(("dZ", 100600L, "vz2"))
      q.processAllAvailable()

      val state = q.lastProgress.stateOperators
      assert(state.nonEmpty, "no state operator in progress")
      val total = state.map(_.numRowsTotal).sum
      // 7 original + 4 advance rows inserted in total; retention must
      // have evicted the pre-advance rows, keeping only the live window
      assert(total <= 4,
        s"join state not purged: $total rows still buffered")
    } finally q.stop()
  }
}
