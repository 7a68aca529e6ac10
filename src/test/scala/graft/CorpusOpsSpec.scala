package graft

import org.apache.spark.sql.functions._

/** Behavior specs for the round-7 corpus-analysis operators at sf0.001
  * (value-level cross-engine gate = DuckDB oracle at sf0.01). */
class CorpusOpsSpec extends SparkTestBase {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("substr_dup: ratio bounded, dup windows never exceed windows") {
    val rows = SparkEntry.queries("substr_dup")(spark, d)
      .select($"n_windows", $"n_dup_windows", $"dup_ratio", $"keep")
      .as[(Long, Long, Double, Boolean)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (w, dw, r, k) =>
      w > 0 && dw >= 0 && dw <= w &&
        r >= 0.0 && r <= 1.0 && k == (r <= 0.5)
    })
  }

  test("substr_dup: only docs with >= 8 tokens appear") {
    val out = SparkEntry.queries("substr_dup")(spark, d)
    val short = Tables.documents(spark, d)
      .filter(size(graft.text.TextFunctions.tokens(col("text"))) < 8)
      .select(col("doc_id"))
    assert(out.join(short, "doc_id").count() == 0)
  }

  test("dedup_containment: bounded by (threshold, 1] and dominates jaccard") {
    val cont = SparkEntry.queries("dedup_containment")(spark, d)
      .select($"a_id", $"b_id", $"containment")
      .as[(Long, Long, Double)].collect()
    assert(cont.forall { case (_, _, c) => c >= 0.8 && c <= 1.0 })
    // containment >= jaccard for the same pair, so every verified pair
    // with jaccard >= 0.8 must surface here too
    val contSet = cont.map(t => (t._1, t._2)).toSet
    val highJ = SparkEntry.queries("dedup_ngram_jaccard")(spark, d)
      .filter($"jaccard" >= 0.8)
      .select($"a_id", $"b_id").as[(Long, Long)].collect()
    assert(highJ.forall(contSet.contains))
  }

  test("dup_source_matrix: cells are canonical and partition the pair set") {
    val cells = SparkEntry.queries("dup_source_matrix")(spark, d)
      .select($"source_a", $"source_b", $"n_pairs")
      .as[(String, String, Long)].collect()
    assert(cells.nonEmpty)
    assert(cells.forall { case (a, b, n) => a <= b && n > 0 })
    val nPairs = SparkEntry.queries("dedup_ngram_jaccard")(spark, d).count()
    assert(cells.map(_._3).sum == nPairs)
  }

  test("bpe_merge_step: 2-char pairs, descending counts, multiplicity-weighted") {
    val rows = SparkEntry.queries("bpe_merge_step")(spark, d)
      .select($"pair", $"pair_count").as[(String, Long)].collect()
    assert(rows.nonEmpty && rows.length <= 50)
    assert(rows.forall { case (p, c) => p.length == 2 && c > 0 })
    // registry order is (count desc, pair asc)
    assert(rows.sliding(2).forall {
      case Array((pa, ca), (pb, cb)) => ca > cb || (ca == cb && pa < pb)
      case _ => true
    })
    // the top pair's count must equal a direct recount over the corpus
    val (topPair, topCount) = rows.head
    val direct = Tables.documents(spark, d)
      .select(explode(graft.text.TextFunctions.tokens(col("text"))).as("w"))
      .as[String].collect()
      .map(w => (0 until math.max(0, w.length - 1))
        .count(i => w.substring(i, i + 2) == topPair))
      .sum
    assert(topCount == direct.toLong)
  }

  test("colloc_topk: lift recomputes exactly from brute-force counts") {
    val rows = SparkEntry.queries("colloc_topk")(spark, d)
      .select($"w1", $"w2", $"c_ab", $"c_a", $"c_b", $"lift")
      .as[(String, String, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty && rows.length <= 20)
    // brute-force the corpus token stream per doc
    val docs = Tables.documents(spark, d)
      .select(graft.text.TextFunctions.tokens(col("text")))
      .as[Seq[String]].collect()
    val nTok = docs.map(_.length.toLong).sum
    val nBig = docs.map(t => math.max(0, t.length - 1).toLong).sum
    val uni = docs.flatten.groupBy(identity).view.mapValues(_.length.toLong)
    val big = docs.flatMap(t => t.zip(t.drop(1)))
      .groupBy(identity).view.mapValues(_.length.toLong)
    rows.foreach { case (w1, w2, cab, ca, cb, lift) =>
      assert(cab >= 5 && big((w1, w2)) == cab)
      assert(uni(w1) == ca && uni(w2) == cb)
      val expect = (cab.toDouble * nTok * nTok) / (nBig.toDouble * ca * cb)
      assert(lift == expect, s"lift mismatch for ($w1,$w2)")
      assert(lift > 0)
    }
    // descending by (lift, w1, w2): the registry order
    assert(rows.sliding(2).forall {
      case Array(a, b) => a._6 > b._6 ||
        (a._6 == b._6 && (a._1 < b._1 || (a._1 == b._1 && a._2 <= b._2)))
      case _ => true
    })
  }

  test("tok_fertility: strata cover the corpus, fertility >= 1") {
    val rows = SparkEntry.queries("tok_fertility")(spark, d)
      .select($"lang", $"n_docs", $"n_words", $"n_subtokens", $"fertility")
      .as[(String, Long, Long, Long, Option[Double])].collect()
    assert(rows.map(_._2).sum == Tables.documents(spark, d).count())
    // the BPE-ish pattern splits at least at whitespace-word granularity
    assert(rows.forall { case (_, _, w, t, f) =>
      w == 0 || (t >= w && f.exists(_ >= 1.0))
    })
  }
}
