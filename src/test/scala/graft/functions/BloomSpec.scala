package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

class BloomSpec extends SparkTestBase with Matchers {
  import spark.implicits._

  test("bloom: zero false negatives, false-positive rate near theory") {
    val members = (0L until 4000L).map(_ * 7 + 3)
    val nonMembers = (0L until 20000L).map(_ * 7 + 1) // disjoint residue
    val words = BloomSketch.buildFilter(
      members.toDF("k"), col("k"))

    // every inserted key must pass — the invariant bloom_prune's
    // correctness rests on (a false negative silently drops join rows)
    val fn = members.toDF("k")
      .filter(!BloomSketch.mightContain(col("k"), words))
      .count()
    fn shouldBe 0L

    // ε at m=2^16, k=5, n=4000: (1 - e^(-kn/m))^k ≈ 0.26% — allow 4×
    val fp = nonMembers.toDF("k")
      .filter(BloomSketch.mightContain(col("k"), words))
      .count()
    fp.toDouble / nonMembers.size should be < 0.011
  }

  test("bloom: auto-sizing scales m with the build side, filter stays exact") {
    // 40k keys overflow the default 2^16 bits (≥ 6 bits/key → ε ~ 40%);
    // the sized build must pick a bigger power of two and stay FN-free
    val keys = (0L until 40000L).map(_ * 3 + 1)
    val (words, mBits) = BloomSketch.buildFilterSized(
      keys.toDF("k"), col("k"))
    mBits should be >= (40000 * 10)
    (mBits & (mBits - 1)) shouldBe 0 // power of two
    words.length shouldBe mBits / 64
    val fn = keys.toDF("k")
      .filter(!BloomSketch.mightContain(col("k"), words, mBits))
      .count()
    fn shouldBe 0L
  }

  test("bloom: auto-sizing is CAPPED — oversized build sides stop at maxBits") {
    // the 100 TB guard: m must never track the build side unboundedly
    // (a 10⁹-key build would otherwise collect a ~1.2 GB literal onto
    // the driver and into every task binary). Past the cap the filter
    // degrades in ε only — zero false negatives by construction, so
    // bloom_prune's value-identity is unaffected. The production cap is
    // 2²⁷ bits = 16 MB (the same order as Spark's own runtime bloom
    // limit); the test pins the mechanism with a small cap so the
    // build side genuinely overflows it.
    val capBits = 1 << 12 // 4096 bits; 1000 keys want 10·1000 > 4096
    val keys = (0L until 1000L).map(_ * 11 + 5)
    val (words, mBits) = BloomSketch.buildFilterSized(
      keys.toDF("k"), col("k"), maxBits = capBits)
    mBits shouldBe capBits // at the cap, not 2^14
    words.length shouldBe capBits / 64
    val fn = keys.toDF("k")
      .filter(!BloomSketch.mightContain(col("k"), words, mBits))
      .count()
    fn shouldBe 0L
    // and the production cap is the documented 2^27 = 16 MB
    BloomSketch.MaxBits shouldBe (1 << 27)
  }

  test("bloom: build aggregation merges across partitions") {
    // the same filter must result no matter how the build side is
    // partitioned (merge = OR is the mergeability contract)
    val keys = (0L until 1000L).toDF("k")
    val w1 = BloomSketch.buildFilter(keys.repartition(1), col("k"))
    val w8 = BloomSketch.buildFilter(keys.repartition(8), col("k"))
    w1.toSeq shouldBe w8.toSeq
  }

  test("bloom: native probe ≡ the declarative k-probe composition, bit for bit") {
    // the native expression exists to ship ONE copy of the words per
    // task; its DECISIONS (true positives AND false positives — the
    // same xxhash64 fold, pmod, bit test) must match the legacy Column
    // form on every key, or the prune set silently shifts
    val members = (0L until 3000L).map(_ * 13 + 7)
    val words = BloomSketch.buildFilter(members.toDF("k"), col("k"))
    val probe = (0L until 50000L).toDF("k")
    val diff = probe.filter(
      BloomSketch.mightContain(col("k"), words) =!=
        BloomSketch.mightContainColumns(col("k"), words))
      .count()
    diff shouldBe 0L
    // interpreted twin agrees with the generated loop
    val nat = probe.filter(BloomSketch.mightContain(col("k"), words))
      .collect().map(_.getLong(0)).toSet
    (0L until 50000L).filter(k =>
      BloomMightContain.test(k, words, BloomSketch.DefaultBits,
        BloomSketch.DefaultK)).toSet shouldBe nat
  }

  test("bloom: native probe null contract and type check") {
    val words = BloomSketch.buildFilter((0L until 10L).toDF("k"), col("k"))
    val r = Seq(Some(3L), None).toDF("k")
      .select(BloomSketch.mightContain(col("k"), words).as("hit"))
      .collect()
    r.exists(_.isNullAt(0)) shouldBe true // null key → null, not false
    // non-BIGINT keys are rejected at analysis (the build hashed longs;
    // an int key would hash differently and silently miss)
    an[Exception] should be thrownBy
      Seq(1).toDF("k")
        .select(BloomSketch.mightContain(col("k"), words)).collect()
  }

  test("bloom: probe filter stays codegen (no UDF, no interpreted HOF)") {
    val words = BloomSketch.buildFilter((0L until 10L).toDF("k"), col("k"))
    // spark.range, not a local Seq: Catalyst folds filters over a
    // LocalRelation at optimization time, leaving no plan to inspect
    val plan = spark.range(100).toDF("k")
      .filter(BloomSketch.mightContain(col("k"), words))
      .queryExecution.executedPlan.toString()
    plan should not include "BatchEvalPython"
    // treeString marks whole-stage-codegen membership with a "*(n)"
    // prefix; the filter must sit inside the stage, not fall back
    plan should include("*(1) Filter")
  }
}
