package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The window-rank→heap optimizer rule: the idiomatic
  * row_number-filter-project top-k plans the TopKPerKey operator (no
  * Window, no per-key sort), produces the identical row set, and leaves
  * rank-observing or tie-unsafe shapes untouched. */
class WindowTopKRewriteSpec extends SparkTestBase {
  import spark.implicits._

  private def scored = (1 to 400).map { i =>
    (s"k${i % 7}", (i * 37) % 101, s"row$i")
  }.toDF("key", "score", "payload")

  private def rankTopK(k: Int) = {
    val w = Window.partitionBy($"key").orderBy($"score".desc, $"payload")
    scored.withColumn("rk", row_number().over(w))
      .filter($"rk" <= k)
      .select($"key", $"score", $"payload")
  }

  test("row_number rank<=k with rank dropped plans TopKPerKey, not Window") {
    val p = rankTopK(3).queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey"), s"rule did not fire:\n$p")
    assert(!p.contains("Window"), s"window survived the rewrite:\n$p")
  }

  test("rewritten plan returns exactly the window form's rows") {
    // compute the expected set WITHOUT the rewrite firing: keep the
    // rank column in the output (observable rank blocks the rule)
    val w = Window.partitionBy($"key").orderBy($"score".desc, $"payload")
    val viaWindow = scored.withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3)
      .select($"key", $"score", $"payload", $"rk")
    assert(viaWindow.queryExecution.executedPlan.toString.contains("Window"))
    val expected = viaWindow.select($"key", $"score", $"payload")
      .as[(String, Int, String)].collect().toSet
    val got = rankTopK(3).as[(String, Int, String)].collect().toSet
    assert(got == expected)
    assert(got.groupBy(_._1).forall(_._2.size == 3))
  }

  test("rank = 1 form fires too") {
    val w = Window.partitionBy($"key").orderBy($"score".desc, $"payload")
    val top1 = scored.withColumn("rk", row_number().over(w))
      .filter($"rk" === 1)
      .select($"key", $"payload")
    assert(top1.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    assert(top1.count() == 7)
  }

  test("rank observed in the output blocks the rewrite") {
    val w = Window.partitionBy($"key").orderBy($"score".desc, $"payload")
    val p = scored.withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3)
      .select($"key", $"payload", $"rk")
      .queryExecution.executedPlan.toString
    assert(p.contains("Window") && !p.contains("TopKPerKey"), p)
  }

  test("rank() (ties admit >k survivors) is not rewritten") {
    val w = Window.partitionBy($"key").orderBy($"score".desc)
    val p = scored.withColumn("rk", rank().over(w))
      .filter($"rk" <= 3)
      .select($"key", $"payload")
      .queryExecution.executedPlan.toString
    assert(p.contains("Window") && !p.contains("TopKPerKey"), p)
  }

  test("unpartitioned (global) rank filter is left to the window path") {
    val w = Window.orderBy($"score".desc, $"payload")
    val p = scored.withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3)
      .select($"key", $"payload")
      .queryExecution.executedPlan.toString
    assert(!p.contains("TopKPerKey"), p)
  }
}
