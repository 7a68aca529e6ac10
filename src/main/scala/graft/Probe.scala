package graft

/** Ad-hoc stage timing probe (dev tool, not part of the contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.text.TextFunctions
    import org.apache.spark.sql.functions._

    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s   $n")
    }

    val docs = Tables.documents(spark, sfDir)
    docs.count()

    def pipeline = Tables.parallelize(docs)
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
      .select(col("doc_id"), array_distinct(TextFunctions.shingles("toks", 3)).as("sh"))
      .filter(size(col("sh")) > 0)

    // partition distribution of the filtered result
    import spark.implicits._
    time("partition sizes") {
      pipeline.select(spark_partition_id().as("p")).groupBy("p").count()
        .orderBy(desc("count")).limit(5).collect().mkString(" ")
    }
    time("pipeline.count")(pipeline.count())

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("pipeline.count (AQE off)")(pipeline.count())
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    // hand-fused single task check: how expensive is ONE interpreted pass?
    val one = docs.limit(200)
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
      .select(col("doc_id"), array_distinct(TextFunctions.shingles("toks", 3)).as("sh"))
      .filter(size(col("sh")) > 0)
    time("200 docs single partition")(one.count())
    spark.stop()
  }
}
