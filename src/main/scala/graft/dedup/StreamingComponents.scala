package graft.dedup

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Online cluster label: doc's current canonical (keeper) id at `ts`. */
case class CompLabel(doc_id: Long, label: Long, ts: Timestamp)

/** One component's member list + newest edge time (for horizon purge).
  * Top-level case class — nested/private state classes fail encoder
  * codegen with a per-batch interpreted fallback. */
case class CompMembers(ids: Seq[Long], lastMs: Long)

/** Streaming CANONICALIZATION downstream of [[StreamingNearDup]] — the
  * ingest-time twin of the batch detection→components→keeper
  * composition (`dedup_components` / `dedup_keep_best`): a stream of
  * near-dup candidate pairs maintains connected-component labels
  * online, so every document's cluster keeper (component-minimum id,
  * the same canonical-id contract as [[Components.minLabel]]) is
  * available the moment the edge arrives, not at the next batch run.
  *
  * Incremental union-find on `transformWithState` MapState, eager form:
  * `root` maps doc → component root, `members` maps root → member list.
  * A new edge unions by MIN-id root; the losing component's members are
  * relabeled and re-emitted. Because the union root is always the
  * minimum id, a document's emitted label sequence is monotonically
  * NON-INCREASING — the current label is simply the MINIMUM emission
  * per doc, and after any replay the final labels equal the batch
  * fixpoint on the same edge set (StreamingComponentsSpec pins this
  * against [[Components.minLabel]]).
  *
  * Scale shape, stated honestly: the label state is grouped on ONE key
  * — cross-component unions are inherently global, and a keyed split
  * would need a merge protocol between state partitions. That is sound
  * here because the input is the COLLISION stream (near-dup pairs, ∝
  * true duplicates within the horizon — orders of magnitude below
  * ingest rate), state is bounded by docs that actually near-dup
  * within the horizon (whole components expire by event-time timer
  * once their newest edge passes it), and per-edge work is point
  * lookups plus relabel cost ∝ the smaller-losing component. At a
  * duplicate rate where one reducer saturates, the production form is
  * the lambda split the batch layer already provides: streaming labels
  * serve the hot window, the batch `components_star` pass
  * (O(log n) star contraction) re-canonicalizes wholesale.
  */
object StreamingComponents {

  class Processor(horizonMs: Long)
      extends StatefulProcessor[String, StreamingNearDup.CandidatePair, CompLabel] {

    @transient private var root: MapState[Long, Long] = _
    @transient private var members: MapState[Long, CompMembers] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      root = getHandle.getMapState[Long, Long](
        "root", Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
      members = getHandle.getMapState[Long, CompMembers](
        "members", Encoders.scalaLong, Encoders.product[CompMembers],
        TTLConfig.NONE)
    }

    private def rearm(timers: TimerValues): Unit = {
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      val clocks = members.iterator().map(_._2.lastMs).toSeq
      if (clocks.nonEmpty)
        getHandle.registerTimer(math.max(clocks.min + horizonMs,
          timers.getCurrentWatermarkInMs() + 1L))
    }

    override def handleInputRows(
        key: String,
        rows: Iterator[StreamingNearDup.CandidatePair],
        timers: TimerValues): Iterator[CompLabel] = {
      val out = List.newBuilder[CompLabel]
      // deterministic fold (the sibling-processor discipline)
      rows.toSeq.sortBy(p => (p.ts.getTime, p.a_id, p.b_id)).foreach { p =>
        val tsMs = p.ts.getTime
        def find(x: Long): Long =
          if (root.containsKey(x)) root.getValue(x) else x
        val ra = find(p.a_id)
        val rb = find(p.b_id)
        if (ra == rb) {
          // known component: refresh its horizon clock
          val m = members.getValue(ra)
          if (m != null && tsMs > m.lastMs)
            members.updateValue(ra, CompMembers(m.ids, tsMs))
        } else {
          val keep = math.min(ra, rb)
          val lose = math.max(ra, rb)
          val keepM = Option(members.getValue(keep))
            .getOrElse(CompMembers(Seq(keep), tsMs))
          val loseM = Option(members.getValue(lose))
            .getOrElse(CompMembers(Seq(lose), tsMs))
          // relabel the losing component (cost ∝ its size) and re-emit
          loseM.ids.foreach { m =>
            root.updateValue(m, keep)
            out += CompLabel(m, keep, p.ts)
          }
          if (!root.containsKey(keep)) {
            root.updateValue(keep, keep)
            out += CompLabel(keep, keep, p.ts)
          }
          members.updateValue(keep,
            CompMembers(keepM.ids ++ loseM.ids,
              math.max(tsMs, math.max(keepM.lastMs, loseM.lastMs))))
          if (lose != keep) members.removeKey(lose)
        }
      }
      rearm(timers)
      out.result().iterator
    }

    override def handleExpiredTimer(
        key: String,
        timers: TimerValues,
        info: ExpiredTimerInfo): Iterator[CompLabel] = {
      val wm = timers.getCurrentWatermarkInMs()
      val expired = members.iterator()
        .filter { case (_, m) => m.lastMs + horizonMs <= wm }.toSeq
      expired.foreach { case (r, m) =>
        m.ids.foreach(root.removeKey)
        members.removeKey(r)
      }
      rearm(timers)
      Iterator.empty
    }
  }

  /** Online labels for a candidate-pair stream (est_sim ≥ `minSim`).
    * `pairs` must carry an assigned event-time `ts` column (the
    * [[StreamingNearDup.candidatePairs]] output does). The CURRENT
    * label of a doc is the minimum emission — labels only ever
    * decrease. */
  def labels(pairs: Dataset[StreamingNearDup.CandidatePair],
             minSim: Double = 0.5,
             horizonSec: Long = 600): Dataset[CompLabel] = {
    import pairs.sparkSession.implicits._
    pairs
      .filter(_.est_sim >= minSim)
      .groupByKey(_ => "")(Encoders.STRING)
      .transformWithState(new Processor(horizonSec * 1000L), "ts",
        OutputMode.Append())
  }
}
