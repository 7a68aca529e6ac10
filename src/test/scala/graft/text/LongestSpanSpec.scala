package graft.text

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkTestBase}

/** `dup_longest_span` gates: exact agreement with an independent
  * set-based brute force on real data, boundary stitching under forced
  * tiny partitions, and the single-range-exchange plan pin. */
class LongestSpanSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  /** Independent brute force: per doc, the longest L ∈ [8, 64] such
    * that some L-token window of the doc appears verbatim in ANOTHER
    * doc — computed from per-L window→doc sets, no suffix machinery. */
  private def bruteForce(docs: Seq[(Long, Array[String])]): Map[Long, Long] = {
    val best = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    var l = 8
    var any = true
    while (l <= 64 && any) {
      any = false
      val byWin = scala.collection.mutable.Map.empty[Seq[String], Set[Long]]
      docs.foreach { case (id, t) =>
        (0 to t.length - l).foreach { i =>
          val w = t.slice(i, i + l).toSeq
          byWin.update(w, byWin.getOrElse(w, Set.empty) + id)
        }
      }
      byWin.valuesIterator.filter(_.size >= 2).foreach { ids =>
        any = true
        ids.foreach(id => best(id) = math.max(best(id), l.toLong))
      }
      l += 1
    }
    best.toMap.withDefaultValue(0L)
  }

  test("dup_longest_span matches the set-based brute force exactly") {
    val got = SparkEntry.queries("dup_longest_span")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+"))
      .toSeq
    val expected = bruteForce(docs)
    assert(got.size == docs.size)
    got.foreach { case (id, v) =>
      assert(v == expected(id), s"doc $id: got $v expected ${expected(id)}")
    }
  }

  test("boundary stitching: forced tiny partitions agree with one partition") {
    import spark.implicits._
    // overlapping suffix runs that straddle any partitioning
    val cand = (0 until 40).map { i =>
      val doc = (i % 5).toLong
      val suf = (i until i + 12).map(j => s"t${j % 9}")
      (doc, suf)
    }.toDF("doc_id", "suf")
    val one = LcpWalk.maxSharedSpan(cand, Some(1))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val many = LcpWalk.maxSharedSpan(cand, Some(13))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(one == many, s"one=$one many=$many")
    assert(one.nonEmpty)
  }

  test("plan: the suffix layout is ONE range exchange (single pass)") {
    val docs = graft.Tables.documents(spark, sf)
    val cand = docs
      .select(col("doc_id"), split(col("text"), "\\s+").as("suf"))
    val s = LcpWalk.sortedSuffixes(cand).queryExecution.executedPlan.toString
    val cur = s.indexOf("== Initial Plan ==") match {
      case -1 => s
      case i  => s.substring(0, i)
    }
    val ranges = "(?m)^.*\\bExchange rangepartitioning".r.findAllIn(cur).size
    assert(ranges == 1, s"expected exactly one range exchange:\n$s")
    assert(!cur.contains("Exchange SinglePartition"),
      s"single-partition bottleneck in:\n$s")
  }
}
