package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.text.TextFunctions

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    (3L, "completely different content about spark engines and plans"),
    (4L, "the quick brown fox jumps over the lazy dog")  // exact dup of 1
  ).toDF("doc_id", "text")

  test("tokens/shingles: trigram construction and short-doc guard") {
    val out = Seq((1L, "a b c d"), (2L, "a b"), (3L, ""))
      .toDF("doc_id", "text")
      .withColumn("toks", TextFunctions.tokens(col("text")))
      .withColumn("sh", TextFunctions.shingles("toks", 3))
      .select($"doc_id", $"sh").as[(Long, Seq[String])].collect().toMap
    assert(out(1L) == Seq("a b c", "b c d"))
    assert(out(2L) == Seq.empty)
    assert(out(3L) == Seq.empty)
  }

  test("components: min-label fixpoint over chains and separate clusters") {
    // 1-2-3 is a chain (needs 2 propagation rounds), 10-11 and 4-5 are
    // separate pairs; every node must label with its component minimum
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (5L, 4L))
      .toDF("a_id", "b_id")
    val got = Components.minLabel(edges, "a_id", "b_id")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 4L -> 4L, 5L -> 4L))
  }

  test("components: round count is O(diameter) on a within-budget chain") {
    // a 7-node path (diameter 6, under the propagation budget) — the
    // worst shape for min-label propagation: the label crosses one hop
    // per round. Pins the cost model: rounds ≤ diameter + 1 (the +1 is
    // the fixpoint-detection round) with NO escalation below the budget.
    val chain = (0L until 6L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val (labels, rounds) = Components.minLabelCounted(chain, "a_id", "b_id")
    val got = labels.as[(Long, Long)].collect().toMap
    assert(got == (0L to 6L).map(_ -> 0L).toMap)
    assert(rounds <= 7, s"expected <= diameter+1 rounds, took $rounds")
    assert(rounds >= 6, s"a 6-hop chain cannot converge in $rounds rounds")
  }

  test("components: past the budget, escalation finishes a deep chain") {
    // a 200-node path (diameter 199 ≫ the 8-round propagation budget):
    // the round-7 implementation ABORTED here; now propagation escalates
    // to star contraction and the chain labels correctly in O(log n)
    // total rounds, never O(diameter).
    val chain = (0L until 199L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val (labels, rounds) = Components.minLabelCounted(chain, "a_id", "b_id")
    val got = labels.as[(Long, Long)].collect().toMap
    assert(got == (0L to 199L).map(_ -> 0L).toMap)
    assert(rounds <= 40, s"escalated convergence must be ≪ diameter, took $rounds")
  }

  test("components: star contraction labels chains, cliques and pairs") {
    // mixed shapes in one edge set: an 11-node chain (star contraction's
    // reason to exist), a 4-clique, a pair, plus a duplicate edge and a
    // reversed edge (input need not be oriented or distinct)
    val edges = ((100L until 110L).map(i => (i, i + 1)) ++
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L), (2L, 4L), (4L, 1L)) ++
      Seq((51L, 50L), (50L, 51L))).toDF("a_id", "b_id")
    val got = Components.starLabel(edges, "a_id", "b_id")
      .as[(Long, Long)].collect().toMap
    val want = (100L to 110L).map(_ -> 100L).toMap ++
      (1L to 4L).map(_ -> 1L).toMap ++ Map(50L -> 50L, 51L -> 50L)
    assert(got == want)
  }

  test("components: star contraction is O(log n) rounds on a deep chain") {
    val chain = (0L until 199L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val (labels, rounds) = Components.starLabelCounted(chain, "a_id", "b_id")
    assert(labels.as[(Long, Long)].collect().toMap ==
      (0L to 199L).map(_ -> 0L).toMap)
    // alternating star contraction halves chain height per alternation:
    // ~log2(199) ≈ 8 alternations, generous slack for the constant
    assert(rounds <= 20, s"star contraction took $rounds alternations")
    assert(rounds >= 2, s"a 199-hop chain cannot be a star after $rounds")
  }

  test("components: star contraction handles empty and converged inputs") {
    import org.apache.spark.sql.types._
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("a_id", LongType), StructField("b_id", LongType))))
    val (l0, r0) = Components.starLabelCounted(empty, "a_id", "b_id")
    assert(l0.isEmpty && r0 == 0)
    // an already-star graph (plus self-loop noise) converges in 1 round
    val star = Seq((5L, 1L), (7L, 1L), (9L, 1L), (3L, 3L)).toDF("a_id", "b_id")
    val (l1, r1) = Components.starLabelCounted(star, "a_id", "b_id")
    assert(l1.as[(Long, Long)].collect().toMap ==
      Map(1L -> 1L, 5L -> 1L, 7L -> 1L, 9L -> 1L))
    assert(r1 == 1, s"a star must be a 1-round fixpoint, took $r1")
  }

  test("minhash: exact dup has est_sim 1.0 and identical signature") {
    val sigs = MinHashLSH.signatures(docs, "doc_id", "text")
    val cands = MinHashLSH.candidatePairs(sigs, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(cands((1L, 4L)) == 1.0)
    // near-dup pair must be found as a candidate with high estimate
    assert(cands.contains((1L, 2L)) || cands.contains((2L, 4L)))
    // unrelated doc 3 never pairs
    assert(!cands.keys.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("jaccard verify: exact dup 1.0, near-dup in (0,1), computed exactly") {
    val sigs  = MinHashLSH.signatures(docs, "doc_id", "text")
    val cands = MinHashLSH.candidatePairs(sigs, "doc_id")
    val pairs = MinHashLSH.verifiedPairs(cands, sigs, "doc_id", 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((1L, 4L)) == 1.0)
    // docs 1/2 share 6 of their 7 trigrams → jaccard 6/8
    pairs.get((1L, 2L)).foreach(j => assert(j == 6.0 / 8.0))
  }

  test("simhash: identical text → identical fingerprint; different text differs") {
    val out = SimHash.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == out(4L))
    assert(out(1L) != out(3L))
    // 64-bit fingerprints use the full signed range (bit 63 is real);
    // a nonzero fingerprint shows the vote→bit assembly actually fired
    assert(out.values.exists(_ != 0L))
  }

  test("simhash golden: pinned 64-bit fingerprint for a known sentence") {
    // independently computed (python hashlib md5, two 32-bit halves,
    // ±1 votes over distinct tokens, bit-63 = sign bit) — any silent
    // change to the hash scheme, half split, vote rule or bit assembly
    // breaks this literal, not just self-consistency
    import spark.implicits._
    val one = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val fp = SimHash.simhash(one, "doc_id", "text")
      .collect().head.getLong(1)
    assert(fp == -4248259749728733000L, s"fingerprint drifted: $fp")
  }
}
