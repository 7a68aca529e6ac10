package graft.app

import java.nio.file.Files

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQueryException}

import graft.SparkTestBase
import graft.schema.TelemetryModel.{SessionDoc, StatusEvent}
import graft.session.Sessionize
import graft.sink.BucketStore

/** The reference's entry-point 2 (`kafkaConsumer.js:238-350`) composed
  * end-to-end at exactly-once strength: status events over the
  * Kafka-shaped filelog transport → stateful sessionization
  * (flatMapGroupsWithState) → BucketStore upsert — then a crash is
  * injected AFTER a batch's store upsert but BEFORE its checkpoint
  * commit (the worst-ordered failure window), the query restarts from
  * the checkpoint, replays the uncommitted batch, and the replayed
  * upsert must be idempotent: the final store equals a batch recompute
  * of the same event sequence.
  *
  * Each piece has its own e2e spec (FileLogSpec restart-resume,
  * SessionizeSpec state transitions, BucketStoreSpec idempotent replay);
  * this one proves the COMPOSITION — source offsets, session state and
  * sink generations all recover to a consistent whole.
  */
class PipelineRestartSpec extends SparkTestBase {
  import spark.implicits._

  private val NBuckets = 8
  private val statusSchema = Encoders.product[StatusEvent].schema
  private val sessionSchema = Encoders.product[SessionDoc].schema

  test("filelog -> stateful sessions -> BucketStore: crash after upsert, restart, store == batch recompute") {
    val root = Files.createTempDirectory("pipe-restart").toString
    val topic = "device-status.events"
    val storeDir = s"$root/store"
    val ckpt = s"$root/ckpt"

    def statusJson(dev: String, ts: Long, action: String): String =
      s"""{"event_type":"device_status","status_type":"cable-unplugged",""" +
        s""""action":"$action","device_uuid":"$dev","timestamp":$ts}"""

    def produce(recs: Seq[(String, Long, String)]): Unit =
      recs.map { case (d, ts, a) => (d, statusJson(d, ts, a)) }
        .toDF("key", "value").write.format("filelog")
        .option("path", root).option("topic", topic)
        .option("numPartitions", "2").mode("append").save()

    // crash switch for the injected failure: throw AFTER the upsert of a
    // non-empty batch (store mutated, checkpoint not yet committed)
    @volatile var crashAfterUpsert = false

    def sessionStream(): Dataset[SessionDoc] = {
      val raw = spark.readStream.format("filelog")
        .option("path", root).option("topic", topic)
        .option("numPartitions", "2").option("startingOffsets", "earliest")
        .load()
      val events = raw
        .select(from_json($"value".cast("string"), statusSchema).as("e"))
        .select("e.*")
        .withColumn("event_ts", timestamp_seconds($"timestamp"))
        .withWatermark("event_ts", "0 seconds")
        .as[StatusEvent]
      Sessionize.stateful(events)
    }

    def runOnce(expectCrash: Boolean): Unit = {
      val q = sessionStream().writeStream
        .outputMode(OutputMode.Append)
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: Dataset[SessionDoc], _: Long) =>
          val df = batch.toDF()
          BucketStore.upsert(spark, df, storeDir,
            Seq("device_uuid", "start_timestamp"), NBuckets)
          if (crashAfterUpsert && !df.isEmpty)
            throw new RuntimeException("injected crash: upsert done, commit not")
        }
        .start()
      try {
        q.processAllAvailable()
        assert(!expectCrash, "expected the injected crash to kill the query")
      } catch {
        case e: StreamingQueryException =>
          assert(expectCrash && e.getMessage.contains("injected crash"),
            s"unexpected query failure: $e")
      } finally q.stop()
    }

    // Device event-times are kept roughly aligned across devices: the
    // watermark is GLOBAL, so a lagging device's sessions would TTL
    // before its own later events arrive — real streaming semantics,
    // but SessionizeSpec covers that; this spec isolates crash-restart.

    // --- batch A: two devices, open sessions only -> no output rows yet
    produce(Seq(("d1", 1000L, "touch"), ("d1", 1100L, "touch"),
      ("d2", 1050L, "touch")))
    runOnce(expectCrash = false)

    // --- batch B: both devices jump past the 300 s gap -> closes
    // [1000,1100] and [1050,1050] (ttl) within the batch. The crash
    // fires after those sessions reached the store but before the
    // checkpoint commit.
    produce(Seq(("d1", 5000L, "touch"), ("d2", 5050L, "touch")))
    crashAfterUpsert = true
    runOnce(expectCrash = true)

    // --- restart: batch B replays from the checkpoint; the replayed
    // upsert must be a no-op on the already-stored sessions
    crashAfterUpsert = false
    runOnce(expectCrash = false)

    // --- batch C: explicit clears close every remaining session
    produce(Seq(("d1", 5100L, "clear"), ("d2", 5150L, "clear")))
    runOnce(expectCrash = false)

    val store = BucketStore.read(spark, storeDir, sessionSchema, NBuckets)
      .select($"device_uuid", $"start_timestamp", $"end_timestamp",
        $"n_touches", $"closed_by")
      .as[(String, Long, Long, Long, String)].collect().sorted.toSeq

    // batch recompute of the same event sequence through the same
    // sessionizer (batch mode: every group is final, all sessions emit)
    val allEvents = Seq(
      StatusEvent("device_status", "cable-unplugged", "touch", "d1", 1000L, None, None),
      StatusEvent("device_status", "cable-unplugged", "touch", "d1", 1100L, None, None),
      StatusEvent("device_status", "cable-unplugged", "touch", "d2", 1050L, None, None),
      StatusEvent("device_status", "cable-unplugged", "touch", "d1", 5000L, None, None),
      StatusEvent("device_status", "cable-unplugged", "touch", "d2", 5050L, None, None),
      StatusEvent("device_status", "cable-unplugged", "clear", "d1", 5100L, None, None),
      StatusEvent("device_status", "cable-unplugged", "clear", "d2", 5150L, None, None))
    val recomputed = Sessionize.stateful(allEvents.toDS())
      .select($"device_uuid", $"start_timestamp", $"end_timestamp",
        $"n_touches", $"closed_by")
      .as[(String, Long, Long, Long, String)].collect().sorted.toSeq

    assert(store == recomputed,
      s"store $store != batch recompute $recomputed")
    assert(store == Seq(
      ("d1", 1000L, 1100L, 2L, "ttl"),
      ("d1", 5000L, 5000L, 1L, "clear"),
      ("d2", 1050L, 1050L, 1L, "ttl"),
      ("d2", 5050L, 5050L, 1L, "clear")))
  }
}
