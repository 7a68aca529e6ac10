package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Hash-bucketed upsert store: the scale path for the reference's
  * upsert-by-id session document sink (`kafkaConsumer.js:304-307`,
  * K4) when no transactional table format (Delta/Iceberg MERGE) is on
  * the classpath.
  *
  * Layout: `<path>/b<k>/` — one parquet directory per hash bucket of
  * the key. An upsert rewrites ONLY the buckets containing the batch's
  * keys: per-batch cost is O(batch + touched-bucket bytes), not
  * O(store) like [[EventStoreSink.upsertParquet]]'s full rewrite. With
  * `numBuckets` sized so each bucket fits executor memory, a
  * micro-batch touching d devices rewrites at most min(d, numBuckets)
  * buckets regardless of store size; untouched buckets are never read.
  *
  * Each touched bucket promotes through the same rename-aside protocol
  * as the flat store (`b<k>_old` kept until the new generation is
  * live), so a crash mid-promote loses no prior rows — the in-flight
  * micro-batch is replayed from the streaming checkpoint. Single
  * writer; readers go through [[read]] for recovery.
  *
  * The true O(batch) production swap-in remains a MERGE-capable table
  * format; the call shape here is identical (upsert(batch, keys)).
  */
object BucketStore {

  private def bucketDir(path: String, b: Int) = s"$path/b$b"

  private def bucketCol(keyCols: Seq[String], numBuckets: Int) =
    pmod(hash(keyCols.map(col): _*), lit(numBuckets))

  /** Recovering read of many buckets as ONE relation where possible:
    * every live (promoted) bucket dir goes into a single multi-path
    * parquet scan — one FileIndex, one plan leaf — and only buckets
    * caught mid-promote (dir missing, `_old` generation present) fall
    * back to per-bucket scans union'd on top. The former shape union'd
    * one scan PER bucket: at 64 buckets the serialized plan reached
    * ~35 MiB per task binary, and any projection chain above it was
    * replicated into every union branch by CollapseProject. Per-bucket
    * recovery semantics are unchanged (live dir wins, else its `_old`
    * generation, else the bucket contributes nothing); row order may
    * differ — stores are keyed sets, no caller is order-sensitive.
    * Schema is explicit: inference would pay a footer-read job per
    * read (the caller always knows the store schema). */
  private def readMany(spark: SparkSession, path: String, buckets: Seq[Int],
                       schema: StructType): DataFrame = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val (live, rest) = buckets.partition(b =>
      fs.exists(new org.apache.hadoop.fs.Path(bucketDir(path, b))))
    val liveDf =
      if (live.isEmpty) None
      else Some(spark.read.schema(schema)
        .parquet(live.map(bucketDir(path, _)): _*))
    val restDf =
      rest.filter(b =>
          fs.exists(new org.apache.hadoop.fs.Path(bucketDir(path, b) + "_old")))
        .map(b => spark.read.schema(schema).parquet(bucketDir(path, b) + "_old"))
    val parts = liveDf.toSeq ++ restDf
    if (parts.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else parts.reduce(_ unionByName _)
  }

  /** Replace-on-key upsert touching only the batch's hash buckets.
    * `bucketCols` (default: the key) chooses the PLACEMENT hash — pass
    * the probe key when the store is probed by a prefix of the row key
    * (e.g. rows keyed (band, bucket, doc_id) probed by (band, bucket));
    * bucketing by the full key would scatter a probe key's rows across
    * buckets the pruned read never opens. */
  def upsert(spark: SparkSession, batch: DataFrame, path: String,
             keyCols: Seq[String], numBuckets: Int = 64,
             bucketCols: Seq[String] = Nil): Unit = {
    val bc = bucketCol(if (bucketCols.isEmpty) keyCols else bucketCols,
      numBuckets)
    // ≤ numBuckets ints — a driver-side list, never the data
    val touched = batch.select(bc.as("__b")).distinct()
      .collect().map(_.getInt(0)).sorted
    if (touched.isEmpty) return

    val existing = readMany(spark, path, touched, batch.schema)
    val merged = existing
      .join(batch.select(keyCols.map(col): _*).distinct(), keyCols, "left_anti")
      .unionByName(batch)
      .withColumn("__bucket", bc)

    // one job writes every touched bucket's new generation. Repartition
    // on the bucket column first: otherwise every shuffle partition that
    // holds rows of a bucket emits its own part-file (32 fragments per
    // bucket per batch — compounding small-files fragmentation that
    // every later read of the bucket pays for). One task per touched
    // bucket writes one coherent file; a bucket too big for one task is
    // a numBuckets sizing problem, not a write-parallelism one.
    val tmpRoot = path + "_tmp"
    merged.repartition(touched.length, col("__bucket"))
      .write.mode("overwrite").partitionBy("__bucket").parquet(tmpRoot)
    // ...then each bucket promotes independently via rename-aside
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    touched.foreach { b =>
      val staged = s"$tmpRoot/__bucket=$b"
      if (fs.exists(new org.apache.hadoop.fs.Path(staged)))
        EventStoreSink.promote(fs, staged, bucketDir(path, b))
    }
    fs.delete(new org.apache.hadoop.fs.Path(tmpRoot), true)
  }

  /** Whole-store read with per-bucket crash recovery. */
  def read(spark: SparkSession, path: String, schema: StructType,
           numBuckets: Int = 64): DataFrame =
    readMany(spark, path, 0 until numBuckets, schema)

  /** The bucket ids a probe batch's keys hash into (≤ numBuckets ints —
    * a driver-side list, same bound as [[upsert]]'s touched set). */
  def touchedBuckets(batch: DataFrame, keyCols: Seq[String],
                     numBuckets: Int = 64): Seq[Int] =
    batch.select(bucketCol(keyCols, numBuckets).as("__b")).distinct()
      .collect().map(_.getInt(0)).sorted.toSeq

  /** Pruned read of only the named buckets — the probe path: a lookup
    * batch reads the buckets its keys hash into, never the store. */
  def readBuckets(spark: SparkSession, path: String, schema: StructType,
                  buckets: Seq[Int]): DataFrame =
    if (buckets.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else readMany(spark, path, buckets, schema)
}
