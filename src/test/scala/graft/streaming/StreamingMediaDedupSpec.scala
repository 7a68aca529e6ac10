package graft.streaming

import java.nio.file.{Files, Path}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Online media cascade: micro-batched flags against standing stores
  * must equal the one-shot batch flags on the same corpus (the
  * StreamingCuration equivalence contract applied to blobs), a
  * replayed batch must be a no-op, and both band tiers must agree on
  * the crafted fixture. */
class StreamingMediaDedupSpec extends SparkTestBase {
  import spark.implicits._

  // the MmPhashSpec blob family: ~6.9 KB ASCII stands the media bytes
  private val base = (0 until 256).map(i => f"word$i%05d tokentext filler ").mkString
  private def editAt(s: String, pos: Int): String =
    s.substring(0, pos) + (if (s.charAt(pos) != 'X') 'X' else 'Y') + s.substring(pos + 1)
  private val other = (0 until 256).map(i => f"other$i%05d differing payload ").mkString
    .substring(0, base.length)

  // ids chosen so every cascade edge fires ACROSS batches too:
  //   batch 1: 1=base, 2=near(base), 3=base (exact dup of 1), 4=other
  //   batch 2: 5=near(other)  [cross-batch phash vs 4],
  //            6=other        [cross-batch exact dup of 4],
  //            7=near(base,2) [cross-batch phash vs 1]
  //   batch 3: 8=base         [cross-batch exact dup of 1],
  //            9=fresh blob, 10=near(9) [in-batch phash]
  private val fresh = (0 until 256).map(i => f"third$i%05d payload chunkss ").mkString
    .substring(0, base.length)
  private val corpus = Seq(
    1L -> base, 2L -> editAt(base, 2000), 3L -> base, 4L -> other,
    5L -> editAt(other, 300), 6L -> other, 7L -> editAt(base, 5000),
    8L -> base, 9L -> fresh, 10L -> editAt(fresh, 1234))
  private val expected = Map( // (rm_exact, rm_phash)
    1L -> ((0L, 0L)), 2L -> ((0L, 1L)), 3L -> ((1L, 0L)), 4L -> ((0L, 0L)),
    5L -> ((0L, 1L)), 6L -> ((1L, 0L)), 7L -> ((0L, 1L)),
    8L -> ((1L, 0L)), 9L -> ((0L, 0L)), 10L -> ((0L, 1L)))

  private def blobsDf(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")
      .select($"doc_id", encode($"text", "UTF-8").as("blob"))

  private def collectFlags(df: DataFrame): Map[Long, (Long, Long)] =
    df.select("doc_id", "rm_exact", "rm_phash").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  private def freshRoot(): Path = Files.createTempDirectory("media-dedup")

  test("one-shot batch flags match the cascade rules (both tiers)") {
    for (bits <- Seq(16, 32)) {
      val flags = collectFlags(StreamingMediaDedup.flagBatch(
        blobsDf(corpus), freshRoot().resolve("stores").toString,
        bandBits = bits))
      assert(flags == expected, s"tier $bits: $flags")
    }
  }

  test("streaming over 3 micro-batches == one-shot batch; replay is a no-op") {
    val root = freshRoot().resolve("stores").toString
    val batches = Seq(corpus.take(4), corpus.slice(4, 7), corpus.drop(7))
    val streamed = batches.map { rows =>
      collectFlags(StreamingMediaDedup.flagBatch(blobsDf(rows), root))
    }.reduce(_ ++ _)
    assert(streamed == expected, s"streamed: $streamed")
    // crash-replay of the last micro-batch: probes filter stored_id <
    // doc_id and upserts replace-on-key, so flags are identical
    val replayed = collectFlags(
      StreamingMediaDedup.flagBatch(blobsDf(batches.last), root))
    assert(replayed == expected.view.filterKeys(_ >= 8L).toMap,
      s"replay drifted: $replayed")
  }

  test("width migration: corpus crossing the 16-bit tier migrates with no missed or duplicate flags") {
    // deployment A starts at the 16-bit tier, crosses its linear range
    // after 2 batches, migrates, and continues at 32 — flags across the
    // cutover must equal a from-scratch 32-tier deployment's
    val rootA = freshRoot().resolve("stores").toString
    val batches = Seq(corpus.take(4), corpus.slice(4, 7), corpus.drop(7))
    val before = batches.take(2).map { rows =>
      collectFlags(StreamingMediaDedup.flagBatch(blobsDf(rows), rootA,
        bandBits = 16))
    }.reduce(_ ++ _)
    // a width flip WITHOUT migration is refused loudly (layout marker)
    intercept[IllegalArgumentException] {
      StreamingMediaDedup.flagBatch(blobsDf(batches.last), rootA,
        bandBits = 32)
    }
    val migrated = StreamingMediaDedup.migrateWidth(spark, rootA, 32)
    assert(migrated > 0L)
    val after = collectFlags(StreamingMediaDedup.flagBatch(
      blobsDf(batches.last), rootA, bandBits = 32))
    val flagsA = before ++ after
    // every doc flagged exactly once across the cutover
    assert(flagsA.keySet == corpus.map(_._1).toSet)
    // deployment B: from-scratch 32-tier over the same batches
    val rootB = freshRoot().resolve("stores").toString
    val flagsB = batches.map { rows =>
      collectFlags(StreamingMediaDedup.flagBatch(blobsDf(rows), rootB,
        bandBits = 32))
    }.reduce(_ ++ _)
    assert(after == flagsB.view.filterKeys(_ >= 8L).toMap,
      s"post-cutover flags != from-scratch wide tier:\n  $after\n  $flagsB")
    assert(flagsA == expected && flagsB == expected)
    // the migrated band store is row-identical to the from-scratch one
    // (keyed set compare through the recovering whole-store read)
    def pbRows(root: String) = graft.sink.BucketStore.read(spark,
        s"$root/pb_w32", StreamingMediaDedup.pbSchemaForTest,
        StreamingMediaDedup.NumBuckets)
      .collect().map(_.toSeq).toSet
    assert(pbRows(rootA) == pbRows(rootB), "migrated store != from-scratch")
    // downgrade is refused: the narrow hash is not derivable
    intercept[IllegalArgumentException] {
      StreamingMediaDedup.migrateWidth(spark, rootA, 16)
    }
  }

  test("horizon eviction bounds the stores; dedup-within-horizon after") {
    val root = freshRoot().resolve("stores").toString
    StreamingMediaDedup.flagBatch(blobsDf(corpus), root)
    val keptAll = StreamingMediaDedup.evictStores(spark, root, 0L)
    assert(keptAll > 0L)
    // horizon past everything: stores drain to empty
    val keptNone = StreamingMediaDedup.evictStores(spark, root, 999L)
    assert(keptNone == 0L)
    // a re-arrival of base after eviction is NOT flagged (the horizon
    // trade: partners older than the horizon no longer match)
    val flags = collectFlags(StreamingMediaDedup.flagBatch(
      blobsDf(Seq(1000L -> base)), root))
    assert(flags(1000L) == ((0L, 0L)), s"horizon semantics: $flags")
  }
}
