package graft.dedup

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkTestBase, Tables}
import graft.text.TextFunctions

/** C4/CCNet-style passage dedup invariants: the keep-first policy keeps
  * every distinct chunk fingerprint exactly once corpus-wide, never
  * keeps more chunks than a document has, and the chunk layout covers
  * each document exactly. */
class ChunkDedupSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("chunk_dedup: per-doc bounds and exact corpus-wide keep-first accounting") {
    val df = SparkEntry.queries("chunk_dedup")(spark, sf)
      .select("doc_id", "n_chunks", "kept_chunks", "retained")
      .collect()
    assert(df.nonEmpty)
    df.foreach { r =>
      val (n, kept, ret) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(kept >= 0 && kept <= n, s"doc ${r.getLong(0)}: kept $kept of $n")
      assert(ret > 0 || kept == 0)
      assert(ret <= 1.0)
      assert(ret == kept.toDouble / n.toDouble)
    }

    // independent recomputation of the chunk expansion: the number of
    // kept chunks across the corpus must equal the number of DISTINCT
    // chunk fingerprints (keep-first keeps each exactly once), and the
    // per-doc chunk count must be ceil(n_tok / 32)
    val chunks = Tables.documents(spark, sf)
      .withColumn("toks", TextFunctions.tokens(col("text")))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), col("toks"),
        expr("CAST(ceil(size(toks) / 32.0) AS BIGINT)").as("n_chunks"))
    val distinctFps = chunks
      .withColumn("i", explode(expr("sequence(0L, n_chunks - 1)")))
      .select(md5(concat_ws(" ",
        expr("slice(toks, CAST(i * 32 + 1 AS INT), 32)"))).as("fp"))
      .distinct().count()
    val keptTotal = df.map(_.getLong(2)).sum
    assert(keptTotal == distinctFps,
      s"kept $keptTotal != distinct fingerprints $distinctFps")

    val expectedN = chunks.select(col("doc_id"), col("n_chunks"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    df.foreach(r => assert(r.getLong(1) == expectedN(r.getLong(0))))
  }
}
