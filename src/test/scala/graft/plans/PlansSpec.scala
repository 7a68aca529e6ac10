package graft.plans

import java.sql.Timestamp

import graft.SparkTestBase

class PlansSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("asof backward: latest at-or-before match per key, inclusive ties") {
    val left = Seq(
      (1L, ts(100), "e1"), (1L, ts(200), "e2"), (1L, ts(50), "e0"),
      (2L, ts(100), "e3"))
      .toDF("k", "ts", "ev")
    val right = Seq(
      (1L, ts(60), "p60"), (1L, ts(100), "p100"), (1L, ts(150), "p150"),
      (2L, ts(999), "late"))
      .toDF("k", "rts", "p")
    val out = AsOfJoin.backward(left, right, "k", "ts", "rts", Seq("p"))
      .select($"ev", $"p").as[(String, String)].collect().toMap
    assert(out == Map(
      "e1" -> "p100",  // equal ts matches (inclusive)
      "e2" -> "p150"))
    // e0 (no prior right) and e3 (right only later) dropped
  }

  test("asof backward: payload carries across many left rows") {
    val left = (1 to 10).map(i => (7L, ts(i * 100), i)).toDF("k", "ts", "i")
    val right = Seq((7L, ts(250), "a"), (7L, ts(750), "b")).toDF("k", "rts", "p")
    val out = AsOfJoin.backward(left, right, "k", "ts", "rts", Seq("p"))
      .select($"i", $"p").as[(Int, String)].collect().toMap
    assert(out == Map(3 -> "a", 4 -> "a", 5 -> "a", 6 -> "a", 7 -> "a",
      8 -> "b", 9 -> "b", 10 -> "b"))
  }

  test("asof backward: matched right row stays atomic with NULL payload cols") {
    // r2 has p2 = NULL; the left row at ts 300 must take BOTH payload
    // values from r2 (p1="x2", p2=null) — never p2 carried from r1.
    val left = Seq((1L, ts(300), "e")).toDF("k", "ts", "ev")
    val right = Seq(
      (1L, ts(100), "x1", Option("y1")),
      (1L, ts(200), "x2", Option.empty[String]))
      .toDF("k", "rts", "p1", "p2")
    val out = AsOfJoin.backward(left, right, "k", "ts", "rts", Seq("p1", "p2"))
      .select($"ev", $"p1", $"p2").as[(String, String, Option[String])]
      .collect().toSeq
    assert(out == Seq(("e", "x2", None)))
  }

  test("salted join equals plain join") {
    val left = Seq((1, "a"), (1, "b"), (2, "c"), (3, "d"), (1, "e"))
      .toDF("k", "v")
    val right = Seq((1, 10.0), (2, 20.0), (4, 40.0)).toDF("k", "w")
    val plain = left.join(right, "k")
      .select($"k", $"v", $"w").as[(Int, String, Double)].collect().sorted
    val salted = SkewJoin.saltedInner(left, right, "k", 8)
      .select($"k", $"v", $"w").as[(Int, String, Double)].collect().sorted
    assert(salted.toSeq == plain.toSeq)
  }
}
