package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All engine operators take DataFrames; these helpers only resolve the
  * per-scale-factor directory layout `<sfDir>/<table>.parquet`. Column
  * pruning / predicate pushdown happen in Catalyst — callers should
  * `.select`/`.filter` and let the parquet scan prune.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Spread a DataFrame across the cluster before a CPU-bound stage.
    *
    * The test parquet files are single-row-group, so Spark reads each as
    * ONE partition — every pre-shuffle expression (md5, regex, HOF
    * lambdas) would run on one core of 32. At 100 TB inputs arrive as
    * thousands of splits and this is a no-op decision; on small inputs
    * the round-robin shuffle (a few MB) buys full-width parallelism for
    * the expensive map stage that follows. AQE cannot help here — it
    * only re-plans *after* a shuffle exists. */
  def parallelize(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 only reads as
    * a long (`spark.sql.legacy.parquet.nanosAsLong=true`, set by
    * [[GraftSession.tune]]). Truncate nanos → micros exactly like DuckDB
    * does when it loads TIMESTAMP_NS into its microsecond timestamps, so
    * oracle comparisons see identical instants. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
