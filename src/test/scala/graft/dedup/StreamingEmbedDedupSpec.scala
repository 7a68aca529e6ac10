package graft.dedup

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase
import graft.dedup.StreamingEmbedDedup.{EmbedPair, VecEvent}
import graft.embed.{RpLsh, Similarity}

/** Streaming embedding near-dup: quantization and bucket routing are
  * bit-identical to the batch RP-LSH pipeline, and the streamed pair
  * set equals the batch annPairs verdict on the same vectors. */
class StreamingEmbedDedupSpec extends SparkTestBase {
  import spark.implicits._

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val Threshold = 0.35

  /** Real corpus vectors: the first 120 of sf0.001's embeddings. */
  private lazy val vecs: Seq[(Long, Seq[Float])] =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .orderBy(col("vec_id")).limit(120)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq

  private def drive(batches: Seq[Seq[VecEvent]]): Seq[EmbedPair] = {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    val sink = s"sembed_sink_${System.nanoTime()}"
    try {
      val input = MemoryStream[VecEvent]
      val q = StreamingEmbedDedup.nearPairs(input.toDS(), Threshold)
        .writeStream.outputMode(OutputMode.Append)
        .option("checkpointLocation",
          Files.createTempDirectory("sembed-ckpt").toString)
        .format("memory").queryName(sink)
        .start()
      try {
        batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
        spark.table(sink).as[EmbedPair].collect().toSeq
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(ProviderKey, v)
        case None    => spark.conf.unset(ProviderKey)
      }
      try spark.catalog.dropTempView(sink) catch { case _: Throwable => () }
    }
  }

  test("per-row quantization and buckets match the batch RP-LSH pass") {
    val df = vecs.toDF("vec_id", "embedding")
    val batchQ = Similarity.quantized(df, "vec_id", "embedding")
      .select(col("vec_id"), col("q"), col("nq"))
      .as[(Long, Seq[Long], Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val batchBk = RpLsh.buckets(df, "vec_id", "embedding")
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).view
      .mapValues(_.map(r => s"${r._2}:${r._3}").toSet).toMap
    vecs.foreach { case (id, emb) =>
      val (q, nq) = StreamingEmbedDedup.quantize(emb)
      assert((q.toSeq, nq) == batchQ(id), s"quantization mismatch vec $id")
      assert(StreamingEmbedDedup.bucketKeys(q).toSet == batchBk(id),
        s"bucket mismatch vec $id")
    }
  }

  test("streaming == batch: same verified pairs and cosines across batches") {
    val events = vecs.zipWithIndex.map { case ((id, emb), i) =>
      VecEvent(id, emb, new Timestamp((1000L + i) * 1000L))
    }
    val got = drive(events.grouped(40).toSeq) // three micro-batches
      .map(p => (p.a_id, p.b_id, p.cos)).toSet
    val want = RpLsh.annPairs(vecs.toDF("vec_id", "embedding"),
        "vec_id", "embedding", Threshold)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == want, s"streaming $got != batch $want")
    assert(want.nonEmpty, "corpus slice produced no verified pairs — widen it")
  }
}
