package graft.session

import java.nio.file.Files

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkTestBase

/** State-SCHEMA evolution across a checkpoint restart — the first
  * thing a real upgrade of a stateful pipeline hits (r16 verdict item
  * #6): version N+1 of an operator adds a field to its ValueState and
  * must resume from version N's RocksDB checkpoint without replaying
  * history.
  *
  * The documented upgrade path (docs/UPGRADES.md): transformWithState
  * + `spark.sql.streaming.stateStore.encodingFormat = avro`. Avro
  * value encoding records the writer schema per state file, so a
  * restart whose state case class GAINED a nullable/defaultable field
  * decodes old rows with the new field absent (None) — the same
  * additive-evolution discipline the [[graft.streaming.StreamingMediaDedup]]
  * `_layout` marker applies to its on-disk standing stores. Under the
  * default `unsaferow` encoding the same restart must FAIL LOUDLY
  * (fixed-layout rows cannot be reinterpreted) — pinned here too,
  * because a silent wrong-offset decode would be corruption, and the
  * loud error is what routes an operator without avro encoding to the
  * offline drain-and-rebuild path instead.
  */
object StateEvolutionSpec {
  // version N state and its N+1 evolution: one added OPTIONAL field
  // (top-level so Catalyst can generate encoders without an outer scope)
  case class SessV1(start: Long, end: Long, touches: Long)
  case class SessV2(start: Long, end: Long, touches: Long,
                    lastAction: Option[String])
  case class Doc(device: String, start: Long, end: Long, touches: Long,
                 lastAction: Option[String])
  case class Ev(device: String, timestamp: Long, action: String)

  /** Version N: tracks (start, end, touches); emits on "clear". */
  class ProcV1 extends StatefulProcessor[String, Ev, Doc] {
    @transient private var st: ValueState[SessV1] = _
    override def init(om: OutputMode, tm: TimeMode): Unit =
      st = getHandle.getValueState[SessV1](
        "open", Encoders.product[SessV1], TTLConfig.NONE)
    override def handleInputRows(device: String, rows: Iterator[Ev],
        timers: TimerValues): Iterator[Doc] = {
      val out = List.newBuilder[Doc]
      rows.toSeq.sortBy(_.timestamp).foreach { e =>
        val cur = if (st.exists()) st.get()
                  else SessV1(e.timestamp, e.timestamp, 0)
        if (e.action == "clear") {
          if (st.exists())
            out += Doc(device, cur.start, cur.end, cur.touches, None)
          st.clear()
        } else st.update(SessV1(cur.start,
          math.max(cur.end, e.timestamp), cur.touches + 1))
      }
      out.result().iterator
    }
    override def handleExpiredTimer(device: String, timers: TimerValues,
        info: ExpiredTimerInfo): Iterator[Doc] = Iterator.empty
  }

  /** Version N+1: same logic, state gained `lastAction`. A session
    * whose state was written by V1 must surface lastAction = None. */
  class ProcV2 extends StatefulProcessor[String, Ev, Doc] {
    @transient private var st: ValueState[SessV2] = _
    override def init(om: OutputMode, tm: TimeMode): Unit =
      st = getHandle.getValueState[SessV2](
        "open", Encoders.product[SessV2], TTLConfig.NONE)
    override def handleInputRows(device: String, rows: Iterator[Ev],
        timers: TimerValues): Iterator[Doc] = {
      val out = List.newBuilder[Doc]
      rows.toSeq.sortBy(_.timestamp).foreach { e =>
        val cur = if (st.exists()) st.get()
                  else SessV2(e.timestamp, e.timestamp, 0, None)
        if (e.action == "clear") {
          if (st.exists())
            out += Doc(device, cur.start, cur.end, cur.touches, cur.lastAction)
          st.clear()
        } else st.update(SessV2(cur.start,
          math.max(cur.end, e.timestamp), cur.touches + 1, Some(e.action)))
      }
      out.result().iterator
    }
    override def handleExpiredTimer(device: String, timers: TimerValues,
        info: ExpiredTimerInfo): Iterator[Doc] = Iterator.empty
  }
}

class StateEvolutionSpec extends SparkTestBase {
  import StateEvolutionSpec._

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val EncodingKey = "spark.sql.streaming.stateStore.encodingFormat"

  private val schema = StructType(Seq(
    StructField("device", StringType), StructField("timestamp", LongType),
    StructField("action", StringType)))

  /** One bounded run of `proc` from `srcDir` against `ckpt`. */
  private def runOnce(useV2: Boolean, srcDir: String, ckpt: String,
                      outDir: String): Unit = {
    import spark.implicits._
    val src = spark.readStream.schema(schema).json(srcDir)
      .withColumn("event_ts", timestamp_seconds(col("timestamp")))
      .withWatermark("event_ts", "0 seconds")
      .as[Ev]
    def tws(ds: Dataset[Ev]): Dataset[Doc] = {
      val grouped = ds.groupByKey(_.device)
      if (useV2) grouped.transformWithState(new ProcV2,
        TimeMode.EventTime(), OutputMode.Append())
      else grouped.transformWithState(new ProcV1,
        TimeMode.EventTime(), OutputMode.Append())
    }
    val q = tws(src).writeStream.outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .format("parquet").option("path", outDir)
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  private def withStateConf(encoding: String)(body: => Unit): Unit = {
    val prevP = spark.conf.getOption(ProviderKey)
    val prevE = spark.conf.getOption(EncodingKey)
    spark.conf.set(ProviderKey, RocksDb)
    spark.conf.set(EncodingKey, encoding)
    try body
    finally {
      prevP.fold(spark.conf.unset(ProviderKey))(spark.conf.set(ProviderKey, _))
      prevE.fold(spark.conf.unset(EncodingKey))(spark.conf.set(EncodingKey, _))
    }
  }

  private def writeBatch(dir: java.nio.file.Path, name: String,
                         rows: Seq[(String, Long, String)]): Unit =
    Files.write(dir.resolve(name), rows.map { case (d, t, a) =>
      s"""{"device":"$d","timestamp":$t,"action":"$a"}"""
    }.mkString("\n").getBytes)

  test("avro state encoding: V2 processor resumes V1's RocksDB checkpoint") {
    withStateConf("avro") {
      val root = Files.createTempDirectory("state-evolve")
      val srcDir = root.resolve("src"); Files.createDirectories(srcDir)
      val ckpt = root.resolve("ckpt").toString
      val outDir = root.resolve("out").toString

      // run 1 (V1): open sessions for d1 (2 touches) and d2 (1 touch)
      writeBatch(srcDir, "a.json", Seq(
        ("d1", 1000L, "touch"), ("d1", 1050L, "touch"), ("d2", 1020L, "touch")))
      runOnce(useV2 = false, srcDir.toString, ckpt, outDir)

      // run 2 (V2, same checkpoint): d1 clears immediately → its doc is
      // V1-WRITTEN state decoded under the V2 schema (lastAction None);
      // d2 is touched by V2 first (state rewritten with the new field),
      // then cleared → lastAction Some("touch")
      writeBatch(srcDir, "b.json", Seq(
        ("d1", 1100L, "clear"), ("d2", 1200L, "touch"), ("d2", 1300L, "clear")))
      runOnce(useV2 = true, srcDir.toString, ckpt, outDir)

      import spark.implicits._
      val docs = spark.read.parquet(outDir).as[Doc].collect()
        .sortBy(_.device).toSeq
      assert(docs == Seq(
        Doc("d1", 1000L, 1050L, 2L, None),
        Doc("d2", 1020L, 1200L, 2L, Some("touch"))),
        s"unexpected docs after evolved restart: $docs")
    }
  }

  test("unsaferow state encoding: evolved restart fails loudly, not silently") {
    withStateConf("unsaferow") {
      val root = Files.createTempDirectory("state-evolve-usr")
      val srcDir = root.resolve("src"); Files.createDirectories(srcDir)
      val ckpt = root.resolve("ckpt").toString
      val outDir = root.resolve("out").toString
      writeBatch(srcDir, "a.json", Seq(("d1", 1000L, "touch")))
      runOnce(useV2 = false, srcDir.toString, ckpt, outDir)
      writeBatch(srcDir, "b.json", Seq(("d1", 1100L, "clear")))
      val err = intercept[Exception] {
        runOnce(useV2 = true, srcDir.toString, ckpt, outDir)
      }
      // the state-schema compatibility gate, not a decode of garbage
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(err).exists(m =>
          m.contains("STATE_STORE") || m.toLowerCase.contains("schema")),
        s"expected a state-schema compatibility error, got: ${msgs(err)}")
    }
  }
}
