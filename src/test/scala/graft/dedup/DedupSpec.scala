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

  test("components: round count is O(diameter) on a pathological chain") {
    // a 17-node path (diameter 16) — the worst shape for min-label
    // propagation: the label crosses one hop per round. Pins the cost
    // model the scale note documents: rounds ≤ diameter + 1 (the +1 is
    // the fixpoint-detection round), NOT O(log n) (that's the
    // star-contraction upgrade) and NOT quadratic.
    val chain = (0L until 16L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val (labels, rounds) = Components.minLabelCounted(chain, "a_id", "b_id")
    val got = labels.as[(Long, Long)].collect().toMap
    assert(got == (0L to 16L).map(_ -> 0L).toMap)
    assert(rounds <= 17, s"expected <= diameter+1 rounds, took $rounds")
    assert(rounds >= 16, s"a 16-hop chain cannot converge in $rounds rounds")
  }

  test("components: exceeding the round cap aborts loudly, not silently") {
    // adversarial guard: a chain deeper than maxRounds must throw the
    // documented error (pointing at star-contraction), never loop on
    val chain = (0L until 8L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val e = intercept[IllegalStateException] {
      Components.minLabelCounted(chain, "a_id", "b_id", maxRounds = 3)._1
        .collect()
    }
    assert(e.getMessage.contains("star"))
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
    assert(out.values.forall(v => v >= 0 && v < (1L << 32)))
  }
}
