package graft

import org.apache.spark.sql.functions._

/** epoch_shuffle — the deterministic training-order contract: every
  * (epoch, doc) assigned exactly once, positions contiguous per shard,
  * and the two epochs produce genuinely different permutations. */
class EpochShuffleSpec extends SparkTestBase {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("epoch_shuffle covers every (epoch, doc) once with contiguous positions") {
    val out = SparkEntry.queries("epoch_shuffle")(spark, d)
    val nDocs = Tables.documents(spark, d).count()
    assert(out.count() == 2 * nDocs)
    assert(out.select($"epoch", $"doc_id").distinct().count() == 2 * nDocs)
    assert(out.filter($"shard" < 0 || $"shard" >= 8).count() == 0)
    // pos is a 1..n ranking within each (epoch, shard)
    val bad = out.groupBy($"epoch", $"shard")
      .agg(count(lit(1)).as("n"), min($"pos").as("lo"), max($"pos").as("hi"),
        countDistinct($"pos").as("nd"))
      .filter($"lo" =!= 1 || $"hi" =!= $"n" || $"nd" =!= $"n")
    assert(bad.count() == 0)
  }

  test("epoch_shuffle permutations differ between epochs and rerun identically") {
    val out = SparkEntry.queries("epoch_shuffle")(spark, d)
    def order(e: Int) = out.filter($"epoch" === e)
      .orderBy($"shard", $"pos").select($"doc_id").as[Long].collect().toSeq
    assert(order(0) != order(1), "epochs must reshuffle")
    // determinism: a second evaluation reproduces the exact assignment
    val again = SparkEntry.queries("epoch_shuffle")(spark, d)
      .orderBy($"epoch", $"shard", $"pos").collect().toSeq
    val first = out.orderBy($"epoch", $"shard", $"pos").collect().toSeq
    assert(first == again)
  }
}
