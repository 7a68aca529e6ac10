package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftSession, SparkEntry, Tables}
import graft.dedup.MinHashLSH

/** Stage-level timing diagnostic for the slow bench queries — not part
  * of the driver contract; run ad hoc via `runMain graft.tools.Profile`.
  */
object Profile {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label%-38s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def mat(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val which = args.headOption.getOrElse("all")

    // warm scans
    Seq("documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$d/$t.parquet").write.format("noop").mode("overwrite").save()
    }

    if (which == "all" || which == "minhash") {
      // stage-by-stage of the dup_cluster_sizes pipeline, cold cache
      val sigs = time("signatures build+persist+count") {
        val s = MinHashLSH.signatures(Tables.documents(spark, d), "doc_id", "text").persist()
        s.count(); s
      }
      val pairs = time("cands+verify+localCheckpoint") {
        MinHashLSH.verifiedPairs(
          MinHashLSH.candidatePairs(sigs, "doc_id"), sigs, "doc_id", 0.5)
          .localCheckpoint()
      }
      time("sigs.unpersist")(sigs.unpersist(true))
      val labels = time("minLabel") {
        graft.dedup.Components.minLabel(pairs, "a_id", "b_id")
      }
      time("histogram agg") {
        mat(labels.groupBy(col("root")).agg(count(lit(1)).as("cluster_size"))
          .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_clusters")))
      }
    }

    if (which == "all" || which == "queries") {
      // end-to-end per-query, in bench (alphabetical) order
      val qs = args.drop(1) match {
        case a if a.nonEmpty => a.toSeq
        case _ => Seq("dedup_components", "dedup_embed", "dedup_minhash_lsh",
          "dup_cluster_sizes", "split_leakage", "detect_delta_speed",
          "doc_fingerprint")
      }
      qs.foreach { n => time(n)(mat(SparkEntry.queries(n)(spark, d))) }
    }
    spark.stop()
  }
}
