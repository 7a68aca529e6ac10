package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

import graft.multimodal.Multimodal
import graft.sink.BucketStore

/** Online twin of the media-curation cascade (`mm_dedup` →
  * `mm_phash_pairs`): micro-batches of arriving blobs are flagged
  * against standing [[BucketStore]]s — stage 1 exact content digest,
  * keep-first by id; stage 2 perceptual near-dup over Hamming-banded
  * phash collisions among exact survivors. The [[StreamingCuration]]
  * architecture verbatim (foreachBatch + bucket-pruned store probes +
  * idempotent replace-on-key upserts), applied to the media column:
  * each batch runs the IDENTICAL batch stage logic (same codec seam,
  * same banding, same Hamming rule), so streaming ≡ batch holds by
  * construction when blobs arrive in id order —
  * StreamingMediaDedupSpec pins it, including a replayed batch.
  *
  * Band width is CONFIGURED, not derived: an unbounded stream has no
  * final n for `mm_phash_width`'s count-based ladder (the
  * [[graft.dedup.StreamingEmbedDedup]] seam, same reasoning), so a
  * rolling crawl deploys the wide tier (128-cell hash, 4×32-bit
  * bands — linear candidate mass to n = 2^33) and small fixtures pass
  * 16. The width is part of the store layout: changing it re-keys
  * every band row, so like StreamingEmbedDedup's StateLayoutVersion it
  * must not change across restarts of one deployment.
  *
  * Dedup rule (the funnel's documented non-transitive keep-first
  * greedy, restated for blobs):
  *   - rm_exact: a SMALLER-id blob with the same digest exists
  *     (in-batch or stored);
  *   - rm_phash: an exact-survivor with a smaller-id exact-SURVIVOR
  *     partner within Hamming ≤ 3 over band collisions (the partner
  *     may itself be phash-removed — keep-first, not clustering).
  *
  * Scale: per batch the cost is O(batch + touched buckets); only
  * 8-byte hashes and digests ever sit in the stores — media bytes
  * stay in the source. Stores are horizon-evictable
  * ([[evictStores]]) for the rolling-crawl deployment.
  */
object StreamingMediaDedup {

  val NumBuckets = 32
  private val Bands = 4
  private val HammingMax = Bands - 1

  private def dgPath(root: String) = s"$root/dg"
  private def pbPath(root: String) = s"$root/pb"

  private val dgSchema = StructType(Seq(
    StructField("fp", StringType), StructField("doc_id", LongType)))
  private val pbSchema = StructType(Seq(
    StructField("b", IntegerType), StructField("v", LongType),
    StructField("doc_id", LongType),
    StructField("lo", LongType), StructField("hi", LongType)))

  /** (doc_id, lo, hi, b, v) band rows of a two-long phash table at the
    * deployment's band width — the mm_phash_pairs banding. */
  private def bandRows(ph: DataFrame, bandBits: Int): DataFrame = {
    val mask = (1L << bandBits) - 1
    ph.withColumn("b", explode(expr(s"sequence(0, ${Bands - 1})")))
      .withColumn("v",
        when(col("b") * bandBits < 64,
          expr(s"shiftright(lo, CAST(b * $bandBits AS INT)) & ${mask}L"))
        .otherwise(
          expr(s"shiftright(hi, CAST(b * $bandBits - 64 AS INT)) & ${mask}L")))
      .select(col("id").as("doc_id"), col("b").cast("int").as("b"),
        col("v"), col("lo"), col("hi"))
  }

  /** Flag one batch of (doc_id, blob) against the standing stores and
    * advance them. Output one row per input blob:
    * (doc_id, rm_exact, rm_phash). */
  def flagBatch(batch: DataFrame, root: String, bandBits: Int = 32,
                advance: Boolean = true): DataFrame = {
    val spark = batch.sparkSession
    val in = batch.select(col("doc_id"), col("blob")).localCheckpoint()

    // ---- stage 1: exact digest, keep-first by id (mm_dedup's key)
    val fps = in.withColumn("fp", md5(col("blob")))
    val inBatch = fps.withColumn("keep_id",
      min(col("doc_id")).over(Window.partitionBy(col("fp"))))
    val dgStored = BucketStore.readBuckets(spark, dgPath(root), dgSchema,
        BucketStore.touchedBuckets(fps.select("fp"), Seq("fp"), NumBuckets))
      .withColumnRenamed("doc_id", "stored_id")
    val ex = inBatch.join(dgStored, Seq("fp"), "left")
      .withColumn("rm_exact",
        ((col("doc_id") =!= col("keep_id")) ||
          (col("stored_id").isNotNull && col("stored_id") < col("doc_id")))
          .cast("long"))
      .select(col("doc_id"), col("blob"), col("fp"), col("rm_exact"))
      .localCheckpoint()
    val s1 = ex.filter(col("rm_exact") === 0)

    // ---- stage 2: phash Hamming bands among exact survivors
    val hashed =
      (if (bandBits == 16)
        Multimodal.perceptualHashes(s1, "doc_id", "blob").toDF()
          .select(col("id"), col("phash").as("lo"), lit(0L).as("hi"))
      else
        Multimodal.perceptualHashes128(s1, "doc_id", "blob").toDF())
      .localCheckpoint()
    val bands = bandRows(hashed, bandBits)
    val ham = expr(
      s"bit_count(x.lo ^ y.lo) + bit_count(x.hi ^ y.hi) <= $HammingMax")
    val inPairs = bands.as("x").join(bands.as("y"),
        col("x.b") === col("y.b") && col("x.v") === col("y.v") &&
          col("x.doc_id") < col("y.doc_id"))
      .filter(ham)
      .select(col("y.doc_id").as("doc_id"))
    val pbStored = BucketStore.readBuckets(spark, pbPath(root), pbSchema,
      BucketStore.touchedBuckets(bands, Seq("b", "v"), NumBuckets))
    val xPairs = bands.as("y").join(pbStored.as("x"),
        col("x.b") === col("y.b") && col("x.v") === col("y.v") &&
          col("x.doc_id") < col("y.doc_id"))
      .filter(ham)
      .select(col("y.doc_id").as("doc_id"))
    val rm2 = inPairs.unionByName(xPairs).distinct()
      .withColumn("rm_phash", lit(1L))

    val flagged = ex.select(col("doc_id"), col("rm_exact"))
      .join(rm2, Seq("doc_id"), "left")
      .na.fill(0L, Seq("rm_phash"))
      .localCheckpoint() // flags are final BEFORE the stores advance

    if (advance) {
      val newDg = ex.filter(col("rm_exact") === 0)
        .select(col("fp"), col("doc_id"))
      if (!newDg.isEmpty) {
        BucketStore.upsert(spark, newDg, dgPath(root), Seq("fp"), NumBuckets)
        // rows keyed (b, v, doc_id) but probed by (b, v)
        BucketStore.upsert(spark, bands, pbPath(root),
          Seq("b", "v", "doc_id"), NumBuckets, bucketCols = Seq("b", "v"))
      }
    }
    flagged
  }

  /** Horizon retention over both stores (the [[StreamingCuration
    * .evictStores]] policy): drop rows behind `horizonMinId` —
    * dedup-within-horizon semantics for a rolling crawl. Returns rows
    * kept. */
  def evictStores(spark: org.apache.spark.sql.SparkSession, root: String,
                  horizonMinId: Long): Long = {
    val keep = col("doc_id") >= lit(horizonMinId)
    BucketStore.evict(spark, dgPath(root), dgSchema, keep,
      Seq("fp"), NumBuckets) +
      BucketStore.evict(spark, pbPath(root), pbSchema, keep,
        Seq("b", "v", "doc_id"), NumBuckets, bucketCols = Seq("b", "v"))
  }

  /** Attach to a streaming blob source (doc_id, blob). Flags land
    * under `outDir/batch=<id>` (overwritten on replay — idempotent). */
  def attach(blobs: DataFrame, storeRoot: String, outDir: String,
             checkpoint: String, bandBits: Int = 32): StreamingQuery =
    blobs.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        flagBatch(batch.select(col("doc_id"), col("blob")),
            storeRoot, bandBits)
          .write.mode("overwrite").parquet(s"$outDir/batch=$id")
        ()
      }
      .option("checkpointLocation", checkpoint)
      .start()
}
