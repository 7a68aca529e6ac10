package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** CEP-lite ordered-pattern detection: the STREAMING twin of the batch
  * `funnel_conversion` report — per user, detect the strict-order
  * view → click → purchase sequence and emit ONE completion row the
  * moment the pattern closes (a live conversion feed, not an end-of-day
  * rollup). The general shape is a per-key state machine over an event
  * stream — `flatMapGroupsWithState` beyond gap-sessionization.
  *
  * Semantics match the batch funnel under per-key time-ordered
  * delivery (the keyed-partition ordering the reference's own pipeline
  * guarantees, SURVEY §2.7 ST2): stage timestamps advance monotonically
  * — earliest view, earliest click strictly after it, earliest
  * purchase strictly after that — and within a micro-batch events are
  * time-sorted before folding. Completions emit exactly once (Append
  * mode); state per user is three optional timestamps + a done flag,
  * and an event-time timeout purges users idle past the horizon, so
  * state is bounded by ACTIVE users, never the population.
  */
object StreamFunnel {

  val StageView = "view"
  val StageClick = "click"
  val StagePurchase = "purchase"

  /** Idle horizon: a user with no events for this long (event time) is
    * evicted; an incomplete funnel then restarts from scratch. */
  val IdleTimeoutMs: Long = 24L * 3600 * 1000

  case class FunnelEvent(ts: Timestamp, user_id: Long, event_type: String)
  case class FunnelState(tView: Long, tClick: Long, done: Boolean,
                         lastMs: Long)
  case class Conversion(user_id: Long, t_view: Timestamp, t_click: Timestamp,
                        t_purchase: Timestamp)

  private implicit val stateEnc: Encoder[FunnelState] = Encoders.product[FunnelState]
  private implicit val convEnc: Encoder[Conversion] = Encoders.product[Conversion]

  /** Streaming callers must put a watermark on `ts` upstream; batch
    * callers get the identical fold (every group final — timeouts are
    * meaningless there, and the batch GroupState has no watermark to
    * read, so the batch path runs with NoTimeout). */
  def conversions(events: Dataset[FunnelEvent]): Dataset[Conversion] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (events.isStreaming) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        funnelFlatMap(events.isStreaming))
  }

  private[streaming] def funnelFlatMap(withTimeout: Boolean)(
      user: Long,
      events: Iterator[FunnelEvent],
      state: GroupState[FunnelState]): Iterator[Conversion] = {

    if (events.isEmpty && state.hasTimedOut) {
      state.remove() // idle past the horizon: forget the partial funnel
      return Iterator.empty
    }

    var s = state.getOption.getOrElse(FunnelState(-1L, -1L, done = false, 0L))
    val out = List.newBuilder[Conversion]
    // micro-batch iterators carry no order guarantee → time-sort; the
    // strict-after rule makes equal-timestamp pairs non-qualifying in
    // either processing order, so the fold is deterministic
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
    state.update(s)
    // Idle eviction is EVENT-time based: last event + horizon. Basing
    // it on the watermark instead silently breaks — the watermark lags
    // a batch (0 during the first), so the timeout lands below the
    // post-batch watermark and the next no-data batch evicts every
    // fresh partial funnel (found the hard way; the clamp one past the
    // watermark is the Sessionize discipline — Spark rejects timeouts
    // at or below it).
    // Batch mode has no watermark node and Spark 4 THROWS on
    // getCurrentWatermarkMs there (timeouts never fire in batch, so -1
    // keeps the operator batch-runnable — the Sessionize discipline).
    if (withTimeout)
      state.setTimeoutTimestamp(math.max(s.lastMs + IdleTimeoutMs,
        (try state.getCurrentWatermarkMs()
         catch { case _: UnsupportedOperationException => -1L }) + 1L))
    out.result().iterator
  }
}
