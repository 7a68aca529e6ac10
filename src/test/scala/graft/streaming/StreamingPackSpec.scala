package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}
import graft.streaming.StreamingPack.PackDoc

/** Streaming pack assignment ≡ batch: a doc stream split across
  * micro-batches (doc_id order — the ingest contract), folded through
  * the per-source running-offset state, must produce exactly the
  * chunk assignment of the batch distributed-prefix-sum
  * (`CurationQueries.packedDocs`). */
class StreamingPackSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def docRows: Seq[PackDoc] =
    Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"),
        size(graft.text.TextFunctions.tokens(col("text"))).cast("long").as("n_tok"))
      .as[PackDoc].collect().toSeq.sortBy(_.doc_id)

  test("split-stream chunk assignment equals the batch prefix-sum assignment") {
    val docs = docRows
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[PackDoc]
    val collected = scala.collection.mutable.ArrayBuffer.empty[StreamingPack.PackAssign]
    val q = StreamingPack.assign(input.toDS()).writeStream
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("pack-ckpt").toString)
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[StreamingPack.PackAssign], _: Long) =>
          collected.synchronized { collected ++= b.collect() }: Unit
      }
      .start()
    try {
      val (b1, rest) = docs.splitAt(docs.length / 3)
      val (b2, b3) = rest.splitAt(rest.length / 2)
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      input.addData(b3: _*); q.processAllAvailable()
    } finally q.stop()

    def key(a: StreamingPack.PackAssign) = (a.source, a.doc_id, a.n_tok, a.chunk_id)
    val streamed = collected.map(key).toSet
    val batch = graft.queries.CurationQueries.packedDocs(spark, sf)
      .as[StreamingPack.PackAssign].collect().map(key).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch)
    assert(collected.size == docs.size) // every doc assigned exactly once
  }

  test("batch-mode fold equals the streaming fold on the same rows") {
    // the same assign() on a plain Dataset (every group final)
    val ds = docRows.toDS()
    def key(a: StreamingPack.PackAssign) = (a.source, a.doc_id, a.n_tok, a.chunk_id)
    val folded = StreamingPack.assign(ds).collect().map(key).toSet
    val batch = graft.queries.CurationQueries.packedDocs(spark, sf)
      .as[StreamingPack.PackAssign].collect().map(key).toSet
    assert(folded == batch)
  }
}
