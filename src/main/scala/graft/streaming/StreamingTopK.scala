package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Streaming per-group heavy hitters with BOUNDED state — the
  * ingest-time companion to the batch `vocab_topk`/`heavy_cms`
  * operators: track the (approximately) most frequent tokens per group
  * (language, source, shard) while the stream runs, without ever
  * holding the full vocabulary.
  *
  * Algorithm: space-saving (Metwally et al., the standard bounded
  * heavy-hitter summary). Per group a capped counter map of `capacity`
  * entries; a token outside the map evicts the minimum-count entry and
  * inherits its count + 1. Guarantees: estimated count overshoots the
  * true count by at most N/capacity (N = group's stream length), and
  * any token with true frequency > N/capacity is IN the map — exactly
  * the bound a curation pipeline needs for "what dominates this shard
  * so far".
  *
  * Spark 4 surface: `transformWithState` with a named MapState slot
  * (token → (count, overestimate)) — per-entry state-store rows, so a
  * group's map never materializes except during its own batch, and the
  * RocksDB provider keeps memory bounded. Emits each group's current
  * top-k after every batch that touches it (OutputMode.Update
  * semantics: downstream sinks upsert by (group, token)).
  */
object StreamingTopK {

  case class TokenEvent(group: String, token: String)
  case class TopEntry(group: String, token: String,
                      est_count: Long, max_err: Long)
  /** (count, err): err is the count the entry inherited at eviction —
    * true count ∈ [est − err, est]. */
  case class Cnt(count: Long, err: Long)

  class Processor(capacity: Int, k: Int)
      extends StatefulProcessor[String, TokenEvent, TopEntry] {
    require(k <= capacity)

    @transient private var counts: org.apache.spark.sql.streaming.MapState[String, Cnt] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Cnt](
        "counts", Encoders.STRING, Encoders.product[Cnt], TTLConfig.NONE)

    override def handleInputRows(
        group: String,
        rows: Iterator[TokenEvent],
        timers: TimerValues): Iterator[TopEntry] = {
      // batch-local mirror: the per-entry state-store gets one read of
      // the map and one write per touched/evicted entry, not one per row
      val m = scala.collection.mutable.Map.empty[String, Cnt]
      counts.iterator().foreach { case (t, c) => m(t) = c }
      val touched = scala.collection.mutable.Set.empty[String]
      rows.foreach { e =>
        m.get(e.token) match {
          case Some(c) =>
            m(e.token) = c.copy(count = c.count + 1); touched += e.token
          case None if m.size < capacity =>
            m(e.token) = Cnt(1, 0); touched += e.token
          case None =>
            // space-saving eviction: smallest count (ties by token for
            // determinism) is replaced; newcomer inherits count + 1
            // with err = the evicted count
            val (minTok, minCnt) = m.minBy { case (t, c) => (c.count, t) }
            m.remove(minTok)
            touched -= minTok // may have been touched earlier this batch
            counts.removeKey(minTok)
            m(e.token) = Cnt(minCnt.count + 1, minCnt.count)
            touched += e.token
        }
      }
      touched.foreach(t => counts.updateValue(t, m(t)))
      m.toSeq
        .sortBy { case (t, c) => (-c.count, t) }
        .take(k)
        .map { case (t, c) => TopEntry(group, t, c.count, c.err) }
        .iterator
    }
  }

  /** Per-group streaming top-k. Drive with OutputMode.Update and the
    * RocksDB state store provider. */
  def topK(events: Dataset[TokenEvent], capacity: Int = 256,
           k: Int = 10): Dataset[TopEntry] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.group)
      .transformWithState(new Processor(capacity, k),
        TimeMode.None(), OutputMode.Update())
  }
}
