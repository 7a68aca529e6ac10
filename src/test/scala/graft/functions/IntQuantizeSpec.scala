package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class IntQuantizeSpec extends SparkTestBase {
  import spark.implicits._

  private val S = graft.embed.Similarity.Scale

  test("int_quantize is bit-identical to the transform(floor(...)) HOF it replaced") {
    val df = Seq(
      Seq(0.5f, -0.25f, 0.0f, 1.0f),
      Seq(0.123456f, -0.999999f, 3.14159f),
      Seq.empty[Float])
      .toDF("e")
      .withColumn("native", expr(s"int_quantize(e, CAST($S AS BIGINT))"))
      .withColumn("hof", expr(
        s"transform(e, x -> cast(floor(cast(x AS double) * cast($S AS double)) AS bigint))"))
    val rows = df.select($"native", $"hof").as[(Seq[Long], Seq[Long])].collect()
    rows.foreach { case (n, h) => assert(n == h) }
    // floor, not truncate: -0.25 * 2^20 = -262144 exactly; -0.999999
    // lands on the floor side
    assert(rows.head._1 == Seq(524288L, -262144L, 0L, 1048576L))
  }

  test("int_quantize: null array yields null") {
    val df = Seq(Option.empty[Seq[Float]], Option(Seq(1.0f)))
      .toDF("e")
      .withColumn("q", expr(s"int_quantize(e, CAST($S AS BIGINT))"))
    val got = df.select($"q").as[Option[Seq[Long]]].collect().toSeq
    assert(got == Seq(None, Some(Seq(S))))
  }

  test("int_quantize participates in whole-stage codegen") {
    val df = spark.range(100)
      .select(expr("cast(transform(sequence(0, 9), i -> i / 10.0) as array<float>)").as("e"))
      .withColumn("q", expr(s"int_quantize(e, CAST($S AS BIGINT))"))
      .withColumn("nq", expr("int_dot(q, q)"))
    val plan = df.queryExecution.executedPlan.toString
    assert("\\*\\(\\d+\\) Project .*int_quantize".r.findFirstIn(plan).isDefined, plan)
    assert(df.agg(sum($"nq")).as[Long].head() > 0)
  }
}
