package graft.session

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.schema.TelemetryModel.{SessionDoc, StatusEvent}

/** ST1(b) sessionization on Spark 4's arbitrary-state API
  * (`transformWithState`) — the successor to `flatMapGroupsWithState`
  * used by [[Sessionize.stateful]], with identical semantics: a touch
  * extends the open session, an explicit clear closes it immediately,
  * and an event-time TIMER (the API's first-class replacement for
  * GroupStateTimeout) closes it when the watermark passes
  * last-touch + gap — the Redis `EX 300` TTL
  * (`/root/reference/kafkaConsumer.js:43,312,335-347`).
  *
  * Why carry both implementations: transformWithState is the
  * forward-looking surface (typed named state slots, first-class
  * timers, state TTL, schema evolution) and REQUIRES the RocksDB state
  * store provider — which is also the 100 TB backend (bounded-memory
  * state, local-disk spill). The fMGWS form stays as the
  * any-provider fallback; `SessionizeTwsSpec` pins the two emit
  * byte-identical session docs over the same inputs.
  */
object SessionizeTws {
  import Sessionize.{GapSeconds, OpenSession}

  /** One named value-state slot ("open") + one event-time timer per
    * device. Timer bookkeeping: exactly one live timer per key — every
    * input batch deletes whatever is registered and re-registers at
    * (end + gap, clamped one ms past the watermark — registering at or
    * below it would never fire). */
  class Processor(gapSeconds: Int)
      extends StatefulProcessor[String, StatusEvent, SessionDoc] {

    @transient private var open: ValueState[OpenSession] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[OpenSession](
        "open", Encoders.product[OpenSession], TTLConfig.NONE)

    private def doc(device: String, s: OpenSession, closedBy: String) =
      SessionDoc(device, "cable-unplugged", s.start, s.end, s.touches, closedBy)

    override def handleInputRows(
        device: String,
        rows: Iterator[StatusEvent],
        timers: TimerValues): Iterator[SessionDoc] = {
      // batch order is not guaranteed (reference relies on Kafka per-key
      // ordering, SURVEY §2.7 ST2) — same sort as Sessionize.sessionFlatMap
      val sorted = rows.toSeq.sortBy(e => (e.timestamp, e.action))
      val closed = List.newBuilder[SessionDoc]
      var cur: Option[OpenSession] = if (open.exists()) Some(open.get()) else None

      sorted.foreach { e =>
        e.action match {
          case "clear" =>
            cur.foreach(s => closed += doc(device, s, "clear"))
            cur = None
          case _ => // "touch"
            cur = cur match {
              case Some(s) if e.timestamp - s.end <= gapSeconds =>
                Some(s.copy(end = math.max(s.end, e.timestamp),
                            touches = s.touches + 1))
              case Some(s) => // gap already exceeded between batches
                closed += doc(device, s, "ttl")
                Some(OpenSession(e.timestamp, e.timestamp, 1))
              case None =>
                Some(OpenSession(e.timestamp, e.timestamp, 1))
            }
        }
      }

      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t))
      cur match {
        case Some(s) =>
          open.update(s)
          val target = (s.end + gapSeconds) * 1000L
          getHandle.registerTimer(
            math.max(target, timers.getCurrentWatermarkInMs() + 1L))
        case None =>
          open.clear()
      }
      closed.result().iterator
    }

    override def handleExpiredTimer(
        device: String,
        timers: TimerValues,
        info: ExpiredTimerInfo): Iterator[SessionDoc] = {
      // watermark passed last-touch + gap: TTL lapse (stale timers were
      // deleted on every input batch, so an expiry always means lapse)
      val out =
        if (open.exists()) Iterator.single(doc(device, open.get(), "ttl"))
        else Iterator.empty
      open.clear()
      out
    }
  }

  /** Streaming sessionizer: requires a watermark on the event-time
    * column and the RocksDB state store provider (a transformWithState
    * prerequisite). Emits the same SessionDoc stream as
    * [[Sessionize.stateful]]. */
  def stateful(events: Dataset[StatusEvent],
               gapSeconds: Int = GapSeconds): Dataset[SessionDoc] = {
    import events.sparkSession.implicits._
    events
      .filter(_.status_type == "cable-unplugged") // F8
      .groupByKey(_.device_uuid)
      .transformWithState(new Processor(gapSeconds),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
