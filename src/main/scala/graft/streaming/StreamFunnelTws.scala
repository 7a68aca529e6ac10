package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import StreamFunnel.{Conversion, FunnelEvent, FunnelState, IdleTimeoutMs, StageClick, StagePurchase, StageView}

/** [[StreamFunnel]] on Spark 4's arbitrary-state API
  * (`transformWithState`) — the same CEP state machine with the same
  * strict-after semantics and exactly-once Append emission, restated on
  * the forward-looking surface: a named ValueState slot per user and a
  * first-class event-time TIMER replacing GroupStateTimeout for idle
  * eviction. Requires (and runs on) the RocksDB state store provider —
  * the bounded-memory backend a 100 TB ingest runs anyway.
  *
  * Same timer discipline as [[graft.session.SessionizeTws]]: exactly one
  * live timer per key, deleted and re-registered on every input batch at
  * last-event + horizon, clamped one ms past the current watermark
  * (Spark never fires a timer registered at or below it — and anchoring
  * on the watermark instead of the last event would evict fresh state,
  * the regression [[StreamFunnel.funnelFlatMap]] documents). */
object StreamFunnelTws {

  class Processor extends StatefulProcessor[Long, FunnelEvent, Conversion] {

    @transient private var st: ValueState[FunnelState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[FunnelState](
        "funnel", Encoders.product[FunnelState], TTLConfig.NONE)

    override def handleInputRows(
        user: Long,
        events: Iterator[FunnelEvent],
        timers: TimerValues): Iterator[Conversion] = {
      var s =
        if (st.exists()) st.get() else FunnelState(-1L, -1L, done = false, 0L)
      val out = List.newBuilder[Conversion]
      // identical fold to StreamFunnel.funnelFlatMap: time-sort the
      // micro-batch, strict-after stage transitions, one emission
      events.toSeq.sortBy(_.ts.getTime).foreach { e =>
        s = s.copy(lastMs = math.max(s.lastMs, e.ts.getTime))
        if (!s.done) e.event_type match {
          case StageView if s.tView < 0 =>
            s = s.copy(tView = e.ts.getTime)
          case StageClick if s.tView >= 0 && s.tClick < 0 &&
              e.ts.getTime > s.tView =>
            s = s.copy(tClick = e.ts.getTime)
          case StagePurchase if s.tClick >= 0 && e.ts.getTime > s.tClick =>
            s = s.copy(done = true)
            out += Conversion(user, new Timestamp(s.tView),
              new Timestamp(s.tClick), new Timestamp(e.ts.getTime))
          case _ => () // out-of-pattern event: ignored
        }
      }
      st.update(s)
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      getHandle.registerTimer(math.max(s.lastMs + IdleTimeoutMs,
        timers.getCurrentWatermarkInMs() + 1L))
      out.result().iterator
    }

    override def handleExpiredTimer(
        user: Long,
        timers: TimerValues,
        info: ExpiredTimerInfo): Iterator[Conversion] = {
      st.clear() // idle past the horizon: forget the partial funnel
      Iterator.empty
    }
  }

  /** Streaming conversions; callers must watermark `ts` upstream and run
    * the RocksDB state store provider. Emits the same Conversion stream
    * as [[StreamFunnel.conversions]] (spec-pinned). */
  def conversions(events: Dataset[FunnelEvent]): Dataset[Conversion] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new Processor, TimeMode.EventTime(),
        OutputMode.Append())
  }
}
