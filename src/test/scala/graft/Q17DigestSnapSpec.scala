package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** q17_tdigest's digest-GUIDED exact quantile: the oracle pins it at SFs
  * where groups fit the digest's raw buffer (exact regime), so this spec
  * pins the path the oracle can't see cheaply — a group large enough
  * that the digest COMPRESSES, where the counts+snap passes must correct
  * the approximate answer back to the true order statistic. A small
  * group rides along to cover the exact regime (snap with kneed=1). */
class Q17DigestSnapSpec extends SparkTestBase {
  import spark.implicits._

  private def exactQ(sorted: Array[Double], p: Int): Double =
    sorted((sorted.length * p) / 100) // rank ((n*p) DIV 100)+1, 0-based

  test("compressed regime: snap recovers the exact order statistic") {
    // 200k values in one group: partial buffers merge past rawCap
    // (1<<16) at the final combine, forcing k1 compression — the digest
    // alone would return an approximate rank here (sf1's failure mode).
    val rnd = new scala.util.Random(41)
    val big = Array.fill(200000)(rnd.nextDouble() * 1000.0)
    val small = Array.fill(500)(rnd.nextDouble() * 10.0)
    val rows =
      big.zipWithIndex.map { case (v, i) => ("big", v, i.toLong) } ++
      small.zipWithIndex.map { case (v, i) => ("small", v, i.toLong) }
    val dir = Files.createTempDirectory("q17snap").toString
    rows.toSeq.toDF("event_type", "value", "eid")
      .withColumn("ts", timestamp_micros(col("eid")))
      .repartition(8)
      .write.parquet(s"$dir/events.parquet")

    val got = SparkEntry.queries("q17_tdigest")(spark, dir)
      .select("event_type", "p50", "p95", "p99", "n")
      .as[(String, Double, Double, Double, Long)]
      .collect().map(r => r._1 -> r).toMap

    for ((name, xs) <- Seq("big" -> big, "small" -> small)) {
      val sorted = xs.sorted
      val (_, p50, p95, p99, n) = got(name)
      assert(n === xs.length.toLong)
      assert(p50 === exactQ(sorted, 50), s"$name p50")
      assert(p95 === exactQ(sorted, 95), s"$name p95")
      assert(p99 === exactQ(sorted, 99), s"$name p99")
    }
  }
}
