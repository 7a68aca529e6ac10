package graft.dedup

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

import graft.embed.{RpLsh, Similarity}

/** Streaming EMBEDDING near-dup detection — the semantic twin of
  * [[StreamingNearDup]] (which hashes lexical shingles): flag a vector
  * whose cosine against one already ingested within the horizon clears
  * the threshold, the moment it arrives. Same three-stage shape:
  *
  *   1. map-only per-row quantization + random-hyperplane bucket keys —
  *      bit-identical to the batch [[RpLsh]] pipeline (same 2^20
  *      quantization, same fixed integer planes, spec-pinned),
  *   2. ONE keyed exchange to (table, bucket) groups; a bounded
  *      MapState store of quantized vectors per bucket — an arrival
  *      emits a pair per co-bucket vector whose EXACT integer-quantized
  *      cosine ≥ threshold (collisions only, never all-pairs),
  *   3. cross-table pair dedup via the event-time-column
  *      `transformWithState` overload + `dropDuplicatesWithinWatermark`.
  *
  * State per entry is 64 longs + norm + timestamp (~0.5 KB), purged by
  * event-time timer and capacity-capped per bucket — RocksDB-bounded
  * like every stateful operator here.
  */
object StreamingEmbedDedup {
  import RpLsh.{BitsPerTable, NumTables}

  case class VecEvent(vec_id: Long, embedding: Seq[Float], ts: Timestamp)
  case class BucketedVec(bk: String, vec_id: Long, q: Seq[Long], nq: Long,
                         ts: Timestamp)
  case class EmbedPair(a_id: Long, b_id: Long, cos: Double, ts: Timestamp)
  case class StoredVec(q: Seq[Long], nq: Long, tsMs: Long)

  /** 2^20 integer quantization + self-norm, bit-identical to
    * [[Similarity.quantized]] (float → double → ·2^20 → floor). */
  def quantize(emb: Seq[Float]): (Array[Long], Long) = {
    val q = new Array[Long](emb.length)
    var nq = 0L
    var i = 0
    while (i < q.length) {
      q(i) = math.floor(emb(i).toDouble * Similarity.Scale.toDouble).toLong
      nq += q(i) * q(i)
      i += 1
    }
    (q, nq)
  }

  /** One "t:bucket" key per hash table — sign-of-dot bits against the
    * fixed integer planes, matching [[RpLsh.buckets]]. */
  def bucketKeys(q: Array[Long]): Seq[String] =
    (0 until NumTables).map { t =>
      var bucket = 0L
      var b = 0
      while (b < BitsPerTable) {
        val plane = RpLsh.plane(t, b)
        var dot = 0L
        var i = 0
        while (i < plane.length && i < q.length) {
          dot += q(i) * plane(i); i += 1
        }
        if (dot > 0) bucket |= (1L << b)
        b += 1
      }
      s"$t:$bucket"
    }

  /** Exact quantized cosine, the [[Similarity.cosine]] double chain. */
  private def cos(a: StoredVec, q: Seq[Long], nq: Long): Double = {
    var dot = 0L
    var i = 0
    val n = math.min(a.q.length, q.length)
    while (i < n) { dot += a.q(i) * q(i); i += 1 }
    dot.toDouble / math.sqrt(a.nq.toDouble * nq.toDouble)
  }

  class Processor(threshold: Double, horizonMs: Long, capacity: Int)
      extends StatefulProcessor[String, BucketedVec, EmbedPair] {

    @transient private var store: MapState[Long, StoredVec] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      store = getHandle.getMapState[Long, StoredVec](
        "vecs", Encoders.scalaLong, Encoders.product[StoredVec], TTLConfig.NONE)

    private def rearm(liveTs: Iterable[Long], timers: TimerValues): Unit = {
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      if (liveTs.nonEmpty)
        getHandle.registerTimer(math.max(liveTs.min + horizonMs,
          timers.getCurrentWatermarkInMs() + 1L))
    }

    override def handleInputRows(
        bk: String,
        rows: Iterator[BucketedVec],
        timers: TimerValues): Iterator[EmbedPair] = {
      val wm = timers.getCurrentWatermarkInMs()
      val m = scala.collection.mutable.Map.empty[Long, StoredVec]
      store.iterator().foreach { case (id, v) => m(id) = v }
      m.filterInPlace { (id, v) =>
        val live = v.tsMs + horizonMs > wm
        if (!live) store.removeKey(id)
        live
      }
      val out = List.newBuilder[EmbedPair]
      rows.toSeq.sortBy(r => (r.ts.getTime, r.vec_id)).foreach { r =>
        if (!m.contains(r.vec_id)) {
          m.foreach { case (id, v) =>
            val c = cos(v, r.q, r.nq)
            if (c >= threshold)
              out += EmbedPair(math.min(id, r.vec_id),
                math.max(id, r.vec_id), c, r.ts)
          }
          if (m.size < capacity) {
            m(r.vec_id) = StoredVec(r.q, r.nq, r.ts.getTime)
            store.updateValue(r.vec_id, m(r.vec_id))
          }
        }
      }
      rearm(m.values.map(_.tsMs), timers)
      out.result().iterator
    }

    override def handleExpiredTimer(
        bk: String,
        timers: TimerValues,
        info: ExpiredTimerInfo): Iterator[EmbedPair] = {
      val wm = timers.getCurrentWatermarkInMs()
      val live = scala.collection.mutable.ArrayBuffer.empty[Long]
      store.iterator().foreach { case (id, v) =>
        if (v.tsMs + horizonMs > wm) live += v.tsMs
        else store.removeKey(id)
      }
      rearm(live, timers)
      Iterator.empty
    }
  }

  /** Streaming verified near pairs over `vecs` (vec_id, embedding, ts —
    * not yet watermarked; the horizon doubles as the watermark delay).
    * Requires the RocksDB state store provider. Each qualifying pair
    * exactly once (cross-table dedup included). */
  def nearPairs(vecs: Dataset[VecEvent], threshold: Double,
                horizonSec: Long = 600,
                capacity: Int = 256): Dataset[EmbedPair] = {
    import vecs.sparkSession.implicits._
    vecs.flatMap { v =>
      val (q, nq) = quantize(v.embedding)
      bucketKeys(q).map(bk => BucketedVec(bk, v.vec_id, q.toSeq, nq, v.ts))
    }
      .withWatermark("ts", s"$horizonSec seconds")
      .groupByKey(_.bk)
      .transformWithState(new Processor(threshold, horizonSec * 1000L, capacity),
        "ts", OutputMode.Append())
      .dropDuplicatesWithinWatermark(Seq("a_id", "b_id"))
  }
}
