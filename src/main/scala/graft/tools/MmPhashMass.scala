package graft.tools

import org.apache.spark.sql.functions._

/** mm_phash_pairs cost-curve probe (dev tooling): measures, per SF dir
  * and band tier, the ACTUAL band-collision candidate mass against the
  * BandLadder's 4n budget, plus the end-to-end pairs wall time — the
  * data behind the "linear to n = 2^33" claim (BENCH_NOTES).
  *
  * For each (sfDir, bits ∈ {16, 32}) it prints one JSON line:
  *   n          blob count (raw corpus — no planted twins, so the
  *              curve measures pure corpus scaling)
  *   rand_cand  the ladder's predicted random-collision mass
  *              4·(n·(n−1)/2)/2^bits (exact integer arithmetic — the
  *              mm_phash_width oracle's column)
  *   budget     4n (the ladder's linear-cost budget)
  *   cand       MEASURED candidates reaching the popcount (post
  *              a_id<b_id, pre Hamming filter) — rand_cand plus the
  *              corpus's real near-dup collision structure
  *   pairs      surviving Hamming ≤ 3 pairs (distinct)
  *   sec_cand / sec_pairs  wall seconds for each count (cold within
  *              this process; the hash build is inside both)
  *
  * Usage: runMain graft.tools.MmPhashMass <sfDir> [<sfDir> ...]
  */
object MmPhashMass {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: MmPhashMass <sfDir> [<sfDir> ...]")
    val spark = graft.GraftSession
      .builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (dir <- args; bits <- Seq(16, 32)) {
      val docs = graft.Tables.parallelize(graft.Tables.documents(spark, dir))
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
        .localCheckpoint()
      val n = docs.count()
      val randCand = 4L * (n * (n - 1) / 2) / (1L << bits)
      val t0 = System.nanoTime()
      val cand = graft.queries.MultimodalQueries.mmPhashCandAt(docs, bits).count()
      val t1 = System.nanoTime()
      val pairs = graft.queries.MultimodalQueries.mmPhashPairsAt(docs, bits).count()
      val t2 = System.nanoTime()
      println(
        s"""{"sf_dir":"$dir","bits":$bits,"n":$n,"rand_cand":$randCand,""" +
        s""""budget":${4 * n},"cand":$cand,"pairs":$pairs,""" +
        s""""sec_cand":${(t1 - t0) / 1e9},"sec_pairs":${(t2 - t1) / 1e9}}""")
    }
    spark.stop()
  }
}
