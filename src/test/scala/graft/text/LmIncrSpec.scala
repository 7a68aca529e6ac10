package graft.text

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}
import graft.queries.TextQueries

/** lm_incr: incremental maintenance of the standing bigram-LM count
  * store. Pins the additive-merge invariant directly (merged store ≡
  * from-scratch reference counts, row for row) — the oracle gate checks
  * the same thing through per-language rollups; this spec localizes a
  * failure to the store path (bootstrap write, touched-bucket probe,
  * keyed sum, upsert, read-back) when the rollup goes red. */
class LmIncrSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("merged store equals the from-scratch reference LM, row for row") {
    val (merged, b) = TextQueries.lmIncrStore(spark, sf)
    val scratch = TextQueries
      .bigramCountsOf(Tables.parallelize(Tables.documents(spark, sf)))
      .filter(col("source").isin((0 to 4).map(i => s"src$i"): _*))
      .groupBy(col("lang"), col("w1"), col("w2"))
      .agg(sum(col("cnt")).as("c12"))
    val keys = Seq("lang", "w1", "w2")
    // symmetric difference on (key, count) must be empty
    val mismatch = merged.join(scratch.withColumnRenamed("c12", "c12_s"),
        keys, "full_outer")
      .filter(col("c12").isNull || col("c12_s").isNull ||
        col("c12") =!= col("c12_s"))
      .count()
    assert(mismatch === 0L)
    assert(merged.count() > 0L)
    // batch B is a strict subset of the merged triples (every touched
    // triple exists in the store after the merge)
    val orphaned = b.select("lang", "w1", "w2")
      .join(merged, keys, "left_anti").count()
    assert(orphaned === 0L)
    graft.SharedStages.clear()
  }
}
