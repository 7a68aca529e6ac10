package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class IntDotSpec extends SparkTestBase {
  import spark.implicits._

  test("int_dot equals the interpreted HOF formulation") {
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),
      (Seq(-7L, 0L), Seq(2L, 9L)),
      (Seq.empty[Long], Seq.empty[Long]))
      .toDF("a", "b")
      .withColumn("native", expr("int_dot(a, b)"))
      .withColumn("hof", expr(
        "aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"))
    val rows = df.select($"native", $"hof").as[(Long, Long)].collect()
    rows.foreach { case (n, h) => assert(n == h) }
    assert(rows.head._1 == 32L)
  }

  test("int_dot: null array yields null; shorter array bounds the loop") {
    val df = Seq(
      (Option(Seq(1L, 2L)), Option.empty[Seq[Long]]),
      (Option(Seq(1L, 2L, 3L)), Option(Seq(10L))))
      .toDF("a", "b")
      .withColumn("d", expr("int_dot(a, b)"))
    val got = df.select($"d").as[Option[Long]].collect().toSeq
    assert(got == Seq(None, Some(10L)))
  }

  test("int_dot participates in whole-stage codegen") {
    // a literal table would fold to LocalTableScan at plan time; range()
    // forces a real codegen pipeline with the projection inside it
    val df = spark.range(100)
      .select(expr("transform(sequence(0, 9), i -> i + id)").as("a"),
        expr("cast(transform(sequence(0, 9), i -> i * 2) as array<bigint>)").as("b"))
      .withColumn("d", expr("int_dot(a, b)"))
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" marks a WholeStageCodegen stage in the compact rendering —
    // the project evaluating int_dot must carry it
    assert("\\*\\(\\d+\\) Project .*int_dot".r.findFirstIn(plan).isDefined, plan)
    assert(df.agg(sum($"d")).as[Long].head() > 0)
  }
}
