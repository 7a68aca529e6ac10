package graft.dedup

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Exact within-horizon streaming dedup on `transformWithState` — the
  * arbitrary-state restatement of [[StreamingDedup.withinWatermark]]
  * (which wraps the stock `dropDuplicatesWithinWatermark`). Same
  * contract: the FIRST arrival of a key is emitted, later arrivals of
  * the same key within the horizon are dropped, and the key's state is
  * purged once the watermark passes first-arrival + horizon — bounded
  * state, per-key one ValueState row and one timer.
  *
  * Why carry both forms: the stock operator is the right default; this
  * form is the template an ingest extends when plain key-equality stops
  * being enough (emit-with-count, keep-best-replica, side-output the
  * duplicates — none expressible on the stock operator), and it
  * completes the transformWithState migration of the streaming dedup
  * family next to [[StreamingNearDup]]. */
object StreamingDedupTws {

  /** First-arrival wall time; state lives until watermark passes
    * firstMs + horizon. */
  private case class Seen(firstMs: Long)

  class Processor[T](horizonMs: Long)
      extends StatefulProcessor[String, (Long, T), T] {

    @transient private var seen: ValueState[Seen] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Seen](
        "seen", Encoders.product[Seen], TTLConfig.NONE)

    override def handleInputRows(
        key: String,
        rows: Iterator[(Long, T)],
        timers: TimerValues): Iterator[T] = {
      if (seen.exists()) Iterator.empty
      else rows.nextOption() match {
        case Some((firstMs, row)) =>
          seen.update(Seen(firstMs))
          getHandle.registerTimer(math.max(firstMs + horizonMs,
            timers.getCurrentWatermarkInMs() + 1L))
          Iterator.single(row)
        case None => Iterator.empty
      }
    }

    override def handleExpiredTimer(
        key: String,
        timers: TimerValues,
        info: ExpiredTimerInfo): Iterator[T] = {
      seen.clear()
      Iterator.empty
    }
  }

  /** Dedup `ds` on `key`, keeping the first arrival per key within
    * `horizonSec` of event time (`eventTime` extractor). Callers must
    * watermark the event-time column upstream and run the RocksDB state
    * store provider. */
  def withinHorizon[T](ds: Dataset[T], key: T => String,
                       eventTime: T => Timestamp, horizonSec: Long)(
      implicit enc: Encoder[T]): Dataset[T] = {
    val pairEnc: Encoder[(Long, T)] = Encoders.tuple(Encoders.scalaLong, enc)
    ds.map(t => (eventTime(t).getTime, t))(pairEnc)
      .groupByKey { case (_, t) => key(t) }(Encoders.STRING)
      .transformWithState(new Processor[T](horizonSec * 1000L),
        TimeMode.EventTime(), OutputMode.Append())(enc)
  }
}
