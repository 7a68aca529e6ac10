package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class CharDiversitySpec extends SparkTestBase {
  import spark.implicits._

  test("char_diversity matches a hand-computed histogram") {
    // "aab": n=3, distinct=2, sum_sq = 2² + 1² = 5
    // "": n=0, distinct=0, sum_sq=0
    // "abcd": n=4, distinct=4, sum_sq=4
    val got = Seq("aab", "", "abcd").toDF("t")
      .select(expr("char_diversity(t)").as("cd"))
      .select($"cd.n_chars", $"cd.n_distinct", $"cd.sum_sq")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((3L, 2L, 5L), (0L, 0L, 0L), (4L, 4L, 4L)))
  }

  test("char_diversity counts code points, not UTF-16 units") {
    // U+1F600 is a surrogate pair in UTF-16 but ONE code point
    val got = Seq("a😀😀").toDF("t")
      .select(expr("char_diversity(t)").as("cd"))
      .select($"cd.n_chars", $"cd.n_distinct", $"cd.sum_sq")
      .as[(Long, Long, Long)].head()
    assert(got == ((3L, 2L, 5L)))
  }

  test("char_diversity: null string yields null struct") {
    val got = Seq(Option.empty[String], Option("x")).toDF("t")
      .select(expr("char_diversity(t)").as("cd")).collect()
    assert(got(0).isNullAt(0))
    assert(!got(1).isNullAt(0))
  }

  test("char_diversity participates in whole-stage codegen") {
    val df = spark.range(50)
      .select(concat(lit("doc"), $"id".cast("string")).as("t"))
      .withColumn("cd", expr("char_diversity(t)"))
      .select($"cd.sum_sq".as("s"))
    val plan = df.queryExecution.executedPlan.toString
    assert("\\*\\(\\d+\\) Project .*char_diversity".r.findFirstIn(plan).isDefined, plan)
    assert(df.agg(sum($"s")).as[Long].head() > 0)
  }

  test("interpreted eval equals codegen eval") {
    val strs = Seq("", "a", "aa", "mississippi", "a b c a b", "Ωδε ωδε")
    val fromExpr = strs.toDF("t")
      .withColumn("cd", expr("char_diversity(t)"))
      .select($"cd.n_chars", $"cd.n_distinct", $"cd.sum_sq")
      .as[(Long, Long, Long)].collect().toSeq
    val expected = strs.map { s =>
      val cps = s.codePoints().toArray.toSeq
      val counts = cps.groupBy(identity).values.map(_.size.toLong)
      (cps.size.toLong, counts.size.toLong, counts.map(c => c * c).sum)
    }
    assert(fromExpr == expected)
  }
}
