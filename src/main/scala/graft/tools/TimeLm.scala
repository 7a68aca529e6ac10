package graft.tools

import org.apache.spark.sql.functions._

/** Dev profiling main: times the lmDocBits stage build piecewise at a
  * given SF dir (occurrence-counts checkpoint, LM build, triple scoring
  * + rollup) so stage-cost claims in BENCH_NOTES are measured, not
  * guessed. Not part of the driver contract. */
object TimeLm {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession
      .builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val q = graft.queries.TextQueries
    // warm the parquet scan so piece 1 measures compute, not I/O
    spark.read.parquet(s"$d/documents.parquet")
      .write.format("noop").mode("overwrite").save()
    val occ = t("occ (tokenize+explode+groupBy+ckpt)") {
      q.bigramCountsOf(graft.Tables.parallelize(graft.Tables.documents(spark, d)))
        .localCheckpoint()
    }
    println(s"  occ rows: ${occ.count()}")
    val (refBi, refUni, vsz) = t("lmModelOf (refBi ckpt)") { q.lmModelOf(occ) }
    println(s"  refBi rows: ${refBi.count()}")
    val bits = t("lmScoreBits (trip distinct + 3 joins + ilog + join back)") {
      val b = q.lmScoreBits(occ, refBi, refUni, vsz).localCheckpoint(); b
    }
    println(s"  bits rows: ${bits.count()}")
    t("rollup + window (buildLmPpl shape)") {
      bits.groupBy(col("doc_id"), col("lang"))
        .agg(sum(col("cnt")).as("n"), sum(col("cnt") * col("bits_q8")).as("h"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
