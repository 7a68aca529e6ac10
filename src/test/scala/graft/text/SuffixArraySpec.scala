package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The per-shard suffix-array window pass emits exactly the (h, doc, c)
  * pre-aggregation the stride-1 hash formulation produces — same
  * portable hashes, same per-doc counts, short docs dropped. */
class SuffixArraySpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    // 1 and 2 share the 4-token window "b c d e"; 1 repeats "a b c d"
    (1L, "a b c d e a b c d"),
    (2L, "x b c d e y z w"),
    (3L, "completely different tokens here entirely"),
    (4L, "shrt doc"), // shorter than the window: contributes nothing
    (5L, "")).toDF("doc_id", "text")

  private val W = 4

  private def viaGrams: Set[(Long, Long, Long)] =
    TextFunctions.ngramRows(docs, "doc_id", "text", W)
      .select(col("doc_id"), TextFunctions.portableHash(col("s")).as("h"))
      .groupBy(col("h"), col("doc_id")).agg(count(lit(1)).as("c"))
      .as[(Long, Long, Long)].collect().toSet

  test("suffix-array window occurrences == stride-1 hash pre-agg") {
    val sa = SuffixArray.windowOccurrences(docs, "doc_id", "text", W)
      .as[(Long, Long, Long)].collect().toSet
    assert(sa == viaGrams)
    assert(sa.nonEmpty)
    // the shared window really is cross-doc: one h carried by docs 1 and 2
    val byH = sa.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(byH.values.exists(ds => ds == Set(1L, 2L)))
    // the repeated in-doc window carries c = 2 for doc 1
    assert(sa.exists { case (_, d, c) => d == 1L && c == 2L })
  }

  test("shard-local pass is partitioning-invariant (docs never split)") {
    val one = SuffixArray.windowOccurrences(docs.coalesce(1), "doc_id", "text", W)
      .as[(Long, Long, Long)].collect().toSet
    val many = SuffixArray.windowOccurrences(docs.repartition(7), "doc_id", "text", W)
      .as[(Long, Long, Long)].collect().toSet
    assert(one == many && one == viaGrams)
  }

  test("multi-width single pass == per-width passes, every rung") {
    // the r19 dup_span_ladder optimization: one interned shard pass
    // emitting every rung must be row-identical to running the
    // single-width pass once per rung over the same documents
    val ws = Seq(2, 4, 8)
    val multi = SuffixArray
      .windowOccurrencesMulti(docs, "doc_id", "text", ws)
      .as[(Int, Long, Long, Long)].collect().toSet
    val perWidth = ws.flatMap { w =>
      SuffixArray.windowOccurrences(docs, "doc_id", "text", w)
        .as[(Long, Long, Long)].collect()
        .map { case (h, d, c) => (w, h, d, c) }
    }.toSet
    assert(multi == perWidth)
    // every rung is populated down to the widest that fits a doc
    assert(ws.forall(w => multi.exists(_._1 == w)))
  }
}
