package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase
import graft.streaming.StreamingTopK.{TokenEvent, TopEntry}

/** Space-saving streaming top-k on transformWithState MapState: the
  * summary's guarantees hold across micro-batches and groups —
  * (a) every token with true frequency > N/capacity is in the final
  *     summary,
  * (b) estimates bound the true count (est − err ≤ true ≤ est),
  * (c) an exactly-counted regime (distinct tokens ≤ capacity) is exact. */
class StreamingTopKSpec extends SparkTestBase with Matchers {

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Deterministic skewed stream: low token ids much more frequent. */
  private def zipfish(group: String, seed: Int, n: Int, vocab: Int): Seq[TokenEvent] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { _ =>
      val t = math.min(rnd.nextInt(vocab), rnd.nextInt(vocab))
      TokenEvent(group, f"tok$t%03d")
    }
  }

  /** Drive the stream; returns the emissions of the FINAL batch only
    * (the memory sink accumulates update-mode snapshots in batch
    * order — the final batch's rows are the end-state summaries of the
    * groups it touches). */
  private def runFinal(batches: Seq[Seq[TokenEvent]], capacity: Int,
                       k: Int): Seq[TopEntry] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    val sink = s"topk_sink_${System.nanoTime()}"
    try {
      val input = MemoryStream[TokenEvent]
      val q = StreamingTopK.topK(input.toDS(), capacity, k)
        .writeStream.outputMode(OutputMode.Update)
        .option("checkpointLocation",
          Files.createTempDirectory("topk-ckpt").toString)
        .format("memory").queryName(sink)
        .start()
      try {
        batches.dropRight(1).foreach { b =>
          input.addData(b: _*); q.processAllAvailable()
        }
        val nBefore = spark.table(sink).count().toInt
        input.addData(batches.last: _*)
        q.processAllAvailable()
        spark.table(sink).as[TopEntry].collect().toSeq.drop(nBefore)
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(ProviderKey, v)
        case None    => spark.conf.unset(ProviderKey)
      }
      try spark.catalog.dropTempView(sink) catch { case _: Throwable => () }
    }
  }

  test("exact regime: distinct tokens <= capacity counts exactly across batches") {
    val b1 = Seq.fill(5)(TokenEvent("g", "a")) ++ Seq.fill(3)(TokenEvent("g", "b"))
    val b2 = Seq.fill(4)(TokenEvent("g", "a")) ++ Seq.fill(6)(TokenEvent("g", "c"))
    val fin = runFinal(Seq(b1, b2), capacity = 16, k = 16)
    fin.map(e => (e.token, e.est_count, e.max_err)).toSet shouldBe
      Set(("a", 9L, 0L), ("c", 6L, 0L), ("b", 3L, 0L))
  }

  test("space-saving bound: heavy tokens in final summary, estimates bound truth") {
    val capacity = 64
    val g1 = zipfish("g1", seed = 7, n = 4000, vocab = 400)
    val g2 = zipfish("g2", seed = 11, n = 3000, vocab = 300)
    // interleave so every batch touches both groups; the LAST batch
    // touches both too, so its emissions are both final summaries
    val events = (g1.grouped(800).toSeq zip g2.grouped(600).toSeq)
      .flatMap { case (a, b) => Seq(a ++ b) }
    // emit the whole summary (k = capacity) so coverage is checkable
    val fin = runFinal(events, capacity, k = capacity)

    for ((g, evs) <- Seq("g1" -> g1, "g2" -> g2)) {
      val truth = evs.groupBy(_.token).view.mapValues(_.size.toLong).toMap
      val n = truth.values.sum
      val summary = fin.filter(_.group == g)
      summary should not be empty
      summary.size should be <= capacity
      summary.foreach { e =>
        val t = truth.getOrElse(e.token, 0L)
        e.est_count should be >= t            // never undercounts
        (e.est_count - e.max_err) should be <= t // err bounds the overshoot
        e.max_err should be <= (n / capacity)    // space-saving bound
      }
      // coverage: every token with true count > N/capacity is present
      val mustHave = truth.filter(_._2 > n / capacity).keySet
      (mustHave -- summary.map(_.token).toSet) shouldBe empty
    }
  }
}
