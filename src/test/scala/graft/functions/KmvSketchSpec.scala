package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class KmvSketchSpec extends SparkTestBase {
  import spark.implicits._

  test("exact below k, estimate within expected error above k") {
    val kmv = udaf(new KmvSketch(64))
    def est(n: Int): Double =
      (1 to n).flatMap(i => Seq(i, i)) // duplicates must not distort
        .toDF("v")
        .withColumn("h", expr(
          "cast(conv(substring(md5(concat('u', cast(v AS string))), 1, 15), 16, 10) AS bigint)"))
        .agg(kmv($"h")).as[Double].collect().head
    assert(est(40) == 40.0)               // < k → exact
    val e = est(5000)                     // ≥ k → estimate, se ≈ 13%
    assert(math.abs(e - 5000) / 5000 < 0.5, s"estimate $e too far from 5000")
  }

  test("merge associativity: estimate is partition-order independent") {
    val kmv = udaf(new KmvSketch(16))
    val df = (1 to 1000).toDF("v")
      .withColumn("h", expr(
        "cast(conv(substring(md5(cast(v AS string)), 1, 15), 16, 10) AS bigint)"))
    val a = df.repartition(1).agg(kmv($"h")).as[Double].collect().head
    val b = df.repartition(13).agg(kmv($"h")).as[Double].collect().head
    assert(a == b)
  }
}
