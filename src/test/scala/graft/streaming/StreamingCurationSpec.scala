package graft.streaming

import java.nio.file.{Files, Path}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkTestBase

/** The composed ingest-time curation funnel: streaming (micro-batched,
  * with a checkpoint restart in the middle) must produce EXACTLY the
  * batch funnel's flags on the same corpus, and the batch form must
  * match the registered dedup_funnel semantics on real data. */
class StreamingCurationSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("source", StringType),
    StructField("text", StringType)))

  private val base =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa"
  private val corpus = Seq(
    (1L, "web", base),
    (2L, "web", base), // exact dup of 1
    (3L, "wiki", base.replace("kappa", "lambda")), // near-dup: 7/9 trigram jaccard
    (4L, "wiki", base.split(" ").reverse.mkString(" ")), // same token SET (simhash 0-ham), shingles disjoint
    (5L, "web", "completely different content about spark plans and exchanges"),
    (6L, "wiki", "yet another unrelated document mentioning parquet footers only"))

  private def docsDf(rows: Seq[(Long, String, String)]): DataFrame =
    rows.toDF("doc_id", "source", "text")

  private def collectFlags(df: DataFrame): Map[Long, (Long, Long, Long, Long)] =
    df.select("doc_id", "rm_quality", "rm_exact", "rm_minhash", "rm_simhash")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap

  private def freshRoot(): Path = Files.createTempDirectory("curation-funnel")

  test("batch funnel flags each stage on the crafted corpus") {
    val flags = collectFlags(StreamingCuration.flagBatch(
      docsDf(corpus), freshRoot().resolve("stores").toString))
    assert(flags(1L) == ((0L, 0L, 0L, 0L)), s"doc 1 should survive: ${flags(1L)}")
    assert(flags(2L) == ((0L, 1L, 0L, 0L)), s"doc 2 is an exact dup: ${flags(2L)}")
    assert(flags(3L) == ((0L, 0L, 1L, 0L)), s"doc 3 is a near dup: ${flags(3L)}")
    assert(flags(4L) == ((0L, 0L, 0L, 1L)), s"doc 4 is a simhash dup: ${flags(4L)}")
    assert(flags(5L) == ((0L, 0L, 0L, 0L)))
    assert(flags(6L) == ((0L, 0L, 0L, 0L)))
  }

  test("quality gate removes short docs before any dedup work") {
    val withShort = corpus :+ (7L, "web", "tiny doc")
    val flags = collectFlags(StreamingCuration.flagBatch(
      docsDf(withShort), freshRoot().resolve("stores").toString,
      minTokens = 8))
    assert(flags(7L) == ((1L, 0L, 0L, 0L)), s"doc 7 fails quality: ${flags(7L)}")
    // the rest are unchanged by the gate
    assert(flags(2L)._2 == 1L && flags(3L)._3 == 1L && flags(4L)._4 == 1L)
  }

  test("streaming across 3 micro-batches with a mid-stream checkpoint restart equals batch") {
    val root = freshRoot()
    val srcDir = root.resolve("src"); Files.createDirectories(srcDir)
    val stores = root.resolve("stores").toString
    val outDir = root.resolve("flags").toString
    val ckpt = root.resolve("ckpt").toString

    def writeBatch(name: String, rows: Seq[(Long, String, String)]): Unit = {
      val lines = rows.map { case (id, src, text) =>
        s"""{"doc_id":$id,"source":"$src","text":"$text"}"""
      }
      Files.write(srcDir.resolve(name), String.join("\n", lines: _*).getBytes)
    }
    def runOnce(): Unit = {
      val q = StreamingCuration.attach(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").json(srcDir.toString),
        stores, outDir, ckpt)
      try q.processAllAvailable() finally q.stop()
    }

    // docs arrive in doc_id order: in-batch dup (1,2 together) AND
    // cross-batch dup/near-dup/simhash paths all exercised
    writeBatch("a.json", corpus.take(2))
    writeBatch("b.json", corpus.slice(2, 4))
    runOnce()
    // restart: fresh query object, same checkpoint — offsets resume
    writeBatch("c.json", corpus.drop(4))
    runOnce()

    val streamed = StreamingCuration.readFlags(spark, outDir)
    assert(streamed.count() == corpus.size,
      "each doc flagged exactly once across restarts")
    val got = collectFlags(streamed)
    val want = collectFlags(StreamingCuration.flagBatch(
      docsDf(corpus), freshRoot().resolve("stores").toString))
    assert(got == want, s"streaming != batch:\n  got  $got\n  want $want")

    // per-source funnel counts agree too
    val cs = StreamingCuration.funnelCounts(streamed)
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    val cb = StreamingCuration.funnelCounts(StreamingCuration.flagBatch(
      docsDf(corpus), freshRoot().resolve("stores").toString))
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(cs == cb)
  }

  test("batch funnel matches the registered dedup_funnel on real data") {
    val d = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, d)
      .select(col("doc_id"), col("source"), col("text"))
    val got = StreamingCuration.funnelCounts(StreamingCuration.flagBatch(
        docs, freshRoot().resolve("stores").toString))
      .select("source", "n_docs", "rm_exact", "rm_minhash", "rm_simhash",
        "survivors")
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    val want = graft.SparkEntry.queries("dedup_funnel")(spark, d)
      .select("source", "n_docs", "rm_exact", "rm_minhash", "rm_simhash",
        "survivors")
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(got == want, s"funnel semantics drifted:\n  got  $got\n  want $want")
  }

  test("store retention: horizon eviction bounds stores, dedup-within-horizon") {
    val root = freshRoot().resolve("stores").toString
    // two advancing batches far apart in doc_id
    StreamingCuration.flagBatch(docsDf(Seq((1L, "web", base))), root)
    StreamingCuration.flagBatch(docsDf(Seq(
      (100L, "web", "completely different content about spark plans"))), root)
    // pre-eviction: a new exact copy of doc 1 is flagged against the store
    val before = collectFlags(StreamingCuration.flagBatch(
      docsDf(Seq((101L, "web", base))), root, advance = false))
    assert(before(101L)._2 == 1L, s"expected exact-dup flag: $before")

    // horizonMinId = 0 keeps everything — a no-op pass that returns the
    // store's total row count (and pins eviction idempotence)
    val total = StreamingCuration.evictStores(spark, root, 0L)
    // TTL to the horizon: doc 1's fingerprint/band/signature rows expire
    val kept = StreamingCuration.evictStores(spark, root, 100L)
    assert(kept > 0 && kept < total, s"stores did not shrink: $kept / $total")

    // post-eviction: the same copy no longer matches the expired partner
    // (dedup-within-horizon — the StreamingNearDup bounded-state trade)
    val after = collectFlags(StreamingCuration.flagBatch(
      docsDf(Seq((102L, "web", base))), root, advance = false))
    assert(after(102L) == ((0L, 0L, 0L, 0L)),
      s"expired partner still matched: $after")
  }
}
