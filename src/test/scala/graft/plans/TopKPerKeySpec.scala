package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class TopKPerKeySpec extends SparkTestBase {
  import spark.implicits._

  private lazy val df = Seq(
    ("a", 1, 10.0), ("a", 2, 30.0), ("a", 3, 20.0), ("a", 4, 40.0),
    ("b", 5, 5.0), ("b", 6, 5.0),   // tie broken by id
    ("c", 7, 1.0))
    .toDF("k", "id", "v")

  test("custom operator equals the window formulation") {
    val custom = TopK.perKey(df, Seq("k"), Seq(("v", false), ("id", true)), 2)
      .select($"k", $"id").as[(String, Int)].collect().sorted.toSeq
    val w = Window.partitionBy($"k").orderBy($"v".desc, $"id")
    val window = df.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 2).select($"k", $"id")
      .as[(String, Int)].collect().sorted.toSeq
    assert(custom == window)
    assert(custom == Seq(("a", 2), ("a", 4), ("b", 5), ("b", 6), ("c", 7)))
  }

  test("plans partial below and final above one hash exchange, no sort") {
    val p = TopK.perKey(df, Seq("k"), Seq(("v", false), ("id", true)), 2)
      .queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKeyPartial"), p)
    assert("TopKPerKey ".r.findAllIn(p).size == 1, p)
    assert(p.contains("Exchange hashpartitioning"), p)
    // exchange must sit between partial (below) and final (above)
    assert(p.indexOf("TopKPerKey ") < p.indexOf("Exchange"), p)
    assert(p.indexOf("Exchange") < p.indexOf("TopKPerKeyPartial"), p)
    assert(!p.contains("Sort "), s"unexpected sort in:\n$p")
  }

  test("works on larger-than-k and smaller-than-k groups at scale") {
    val big = spark.range(10000)
      .select(($"id" % 100).as("k"), $"id", rand(42).as("v"))
    val custom = TopK.perKey(big.toDF(), Seq("k"), Seq(("v", false), ("id", true)), 5)
    val w = Window.partitionBy($"k").orderBy($"v".desc, $"id")
    val window = big.withColumn("rn", row_number().over(w)).filter($"rn" <= 5)
      .select($"k", $"id")
    assert(custom.select($"k", $"id").as[(Long, Long)].collect().sorted.toSeq ==
      window.as[(Long, Long)].collect().sorted.toSeq)
  }
}
