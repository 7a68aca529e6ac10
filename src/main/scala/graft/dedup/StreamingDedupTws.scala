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
/** First-arrival event time; state lives until watermark passes
  * firstMs + horizon. Top-level (not nested/private) so the encoder's
  * generated projection can access the member — a private or
  * locally-scoped state class compiles but fails codegen per batch and
  * silently falls back to interpreted serde. */
case class DedupSeen(firstMs: Long)

object StreamingDedupTws {

  class Processor[T](horizonMs: Long)
      extends StatefulProcessor[String, (Long, T), T] {

    @transient private var seen: ValueState[DedupSeen] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[DedupSeen](
        "seen", Encoders.product[DedupSeen], TTLConfig.NONE)

    override def handleInputRows(
        key: String,
        rows: Iterator[(Long, T)],
        timers: TimerValues): Iterator[T] = {
      if (seen.exists()) Iterator.empty
      else {
        // Deterministic fold: when several rows of the key land in one
        // micro-batch, keep the minimum-event-time row (matching the
        // sort-by-ts discipline of StreamingNearDup / StreamFunnelTws),
        // not whichever the iterator yields first.
        val buf = rows.toVector
        if (buf.isEmpty) Iterator.empty
        else {
          val (firstMs, row) = buf.minBy(_._1)
          seen.update(DedupSeen(firstMs))
          getHandle.registerTimer(math.max(firstMs + horizonMs,
            timers.getCurrentWatermarkInMs() + 1L))
          Iterator.single(row)
        }
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
