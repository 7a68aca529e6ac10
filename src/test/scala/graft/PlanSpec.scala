package graft

import org.apache.spark.sql.execution.SparkPlan

/** Physical-plan audits (the 100 TB design gates): broadcast joins for
  * dims, parquet filter/column pushdown, bounded shuffle counts, no
  * cartesian products where a key join exists. These assert the *plan*,
  * so a regression that silently de-optimizes a query fails CI even
  * though results stay correct. */
class PlanSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): SparkPlan =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan

  private def planString(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.executedPlan.toString
  }

  /** Shuffle exchanges in the rendered plan (AQE's inputPlan field holds
    * the pre-EnsureRequirements tree, so a tree walk undercounts; the
    * rendered string always shows the planned exchanges). Broadcast
    * exchanges are deliberately not counted — broadcasting a dim is the
    * desired alternative to shuffling. */
  private def countShuffles(p: SparkPlan): Int = {
    // An executed AdaptiveSparkPlan renders BOTH "Final Plan" and
    // "Initial Plan" sections — counting the whole string then counts
    // every exchange twice. A plan can arrive executed here through the
    // shared session's CacheManager: another suite persisting a
    // structurally identical subtree (e.g. the sf0.001 MinHash
    // signatures) swaps an already-executed cached relation into this
    // suite's plan. Count only the current/final section.
    val s = p.toString
    val cur = s.indexOf("== Initial Plan ==") match {
      case -1 => s
      case i  => s.substring(0, i)
    }
    "(?m)^.*\\bExchange (hash|range|RoundRobin|SinglePartition)".r
      .findAllIn(cur).size
  }

  test("q2 star join broadcasts the dimension tables") {
    val s = planString("q2_revenue_by_nation")
    assert(s.contains("BroadcastHashJoin"), s"no broadcast join in:\n$s")
  }

  test("q1 pushes the shipdate filter into the parquet scan") {
    val s = planString("q1_pricing_summary")
    assert(s.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"filter not pushed to scan:\n$s")
  }

  test("q1 prunes columns: scan reads only the 7 needed") {
    val s = planString("q1_pricing_summary")
    assert(!s.contains("l_orderkey"), "scan did not prune l_orderkey")
    assert(s.contains("l_returnflag"))
  }

  test("viol_derive is map-only: zero shuffles (matches the Flink topology)") {
    assert(countShuffles(plan("viol_derive")) == 0)
  }

  test("status_derive is map-only: zero shuffles") {
    assert(countShuffles(plan("status_derive")) == 0)
  }

  test("sessionize needs exactly one shuffle (key partitioning)") {
    val p = plan("sessionize")
    assert(countShuffles(p) == 1, p.toString)
  }

  test("minhash signatures need <= 2 shuffles (gram rows are shuffle-free)") {
    // parallelize round-robin + the signature groupBy's doc-key
    // exchange; the slice/arrays_zip gram builder must NOT add a
    // window/sort exchange of raw token rows on top
    val sigs = graft.dedup.MinHashLSH.signatures(
      Tables.documents(spark, sf), "doc_id", "text")
    assert(countShuffles(sigs.queryExecution.executedPlan) <= 2,
      sigs.queryExecution.executedPlan.toString)
  }

  test("q3 top-k plans TakeOrderedAndProject, not a global sort") {
    val s = planString("q3_top_orders")
    assert(s.contains("TakeOrderedAndProject"), s)
  }

  test("whole-stage codegen covers the derivation path") {
    // codegen stages render as "*(n) Op" in the plan string
    val s = planString("viol_derive")
    assert(s.contains("*(1)"), s)
  }

  test("knn broadcasts the query side and bounds the shuffle with top-k heaps") {
    val s = planString("knn_topk")
    assert(!s.contains("CartesianProduct"), s"cartesian product in:\n$s")
    assert(s.contains("BroadcastNestedLoopJoin"),
      s"query side not broadcast in:\n$s")
    assert(s.contains("TopKPerKeyPartial"),
      s"no map-side partial top-k in:\n$s")
  }

  test("vocab_topk plans partial aggregation and TakeOrderedAndProject") {
    val s = planString("vocab_topk")
    assert(s.contains("TakeOrderedAndProject"), s"global sort in:\n$s")
    assert(s.contains("partial_count") || s.contains("partial count"),
      s"no map-side combine in:\n$s")
  }

  test("samp_quota runs through the custom partial/final top-k operator") {
    val s = planString("samp_quota")
    assert(s.contains("TopKPerKeyPartial") && s.contains("TopKPerKey"),
      s"quota sampling not planned via TopKPerKey:\n$s")
  }

  test("samp_hash is map-only: zero shuffles") {
    assert(countShuffles(plan("samp_hash")) == 0)
  }

  test("ivf_assign broadcasts the seed table (no shuffle of the vectors for scoring)") {
    val s = planString("ivf_assign")
    assert(s.contains("BroadcastNestedLoopJoin"), s"seeds not broadcast in:\n$s")
    assert(!s.contains("CartesianProduct"), s"cartesian product in:\n$s")
  }

  test("q17 digest-guided snap bounds candidates map-side") {
    // q17 runs three passes; the returned frame is the SNAP pass. Its
    // candidate set must be bounded BEFORE the exchange (partial per-key
    // heaps ship ≤ partitions·groups·3·k rows), and the only full-input
    // work is the scan + broadcast boundary join — never a per-group
    // sort of events (that is q9's deliberate exactness-twin shape).
    // The digest pass itself (pass 1) executes eagerly inside the query
    // builder; its partial-aggregation shape is pinned by the udaf
    // Aggregator contract and TDigestSpec's merge tests.
    val s = planString("q17_tdigest")
    assert(s.contains("TopKPerKeyPartial"),
      s"snap candidates not bounded map-side:\n$s")
    val n = countShuffles(plan("q17_tdigest"))
    assert(n <= 2, s"q17 snap should shuffle only bounded candidates " +
      s"(topk final + result agg), got $n shuffles:\n${planString("q17_tdigest")}")
  }

  test("quality_deciles_digest has no window and no single-partition exchange") {
    // the scale path for deciles: boundaries via one mergeable digest
    // aggregation, bucketing as a map-only when-chain — unlike the exact
    // NTILE twin there must be NO Window operator and NO
    // Exchange SinglePartition anywhere in the plan
    val s = planString("quality_deciles_digest")
    assert(!s.contains("Window"), s"window operator in digest path:\n$s")
    assert(!s.contains("Exchange SinglePartition"),
      s"single-partition exchange in digest path:\n$s")
  }

  test("tfidf_top_terms runs through the custom top-k operator, no global sort") {
    // the df window is KEYED by term (fine — one shuffle, no skew sink);
    // what must never appear: a per-doc rank window replacing TopKPerKey,
    // a global sort, or a single-partition exchange
    val s = planString("tfidf_top_terms")
    assert(s.contains("TopKPerKey"), s"custom top-k not planned:\n$s")
    assert(!s.contains("Exchange rangepartitioning"), s"global sort in:\n$s")
    assert(!s.contains("Exchange SinglePartition"),
      s"single-partition exchange in:\n$s")
  }

  test("doc_fingerprint joins on the fingerprint key, never all-pairs") {
    val s = planString("doc_fingerprint")
    assert(!s.contains("CartesianProduct") &&
      !s.contains("BroadcastNestedLoopJoin"),
      s"all-pairs join in fingerprint path:\n$s")
  }

  test("rep_ngram reuses one doc partitioning across its aggregations") {
    // repartition(doc) -> groupBy(doc, bigram) -> groupBy(doc): hash
    // partitioning on doc_id satisfies all three, so the whole bigram
    // pipeline needs ONE shuffle; + the parallelize round-robin (the
    // token-stats join side broadcasts)
    val n = countShuffles(plan("rep_ngram"))
    assert(n <= 2, s"expected <= 2 shuffles, got $n")
  }

  test("samp_weighted plans a bounded top-k, not a global sort") {
    val s = planString("samp_weighted")
    assert(s.contains("TakeOrderedAndProject"), s"no bounded top-k in:\n$s")
    assert(!s.contains("Exchange rangepartitioning"),
      s"global sort exchange in:\n$s")
  }

  test("pii_redact and char_diversity are map-only after the spread: one shuffle each") {
    // the only exchange is Tables.parallelize's round-robin spread of
    // the single-row-group scan; the scrub/histogram work itself never
    // shuffles (pure scan-rewrite at scale)
    assert(countShuffles(plan("pii_redact")) == 1,
      plan("pii_redact").toString)
    assert(countShuffles(plan("char_diversity")) == 1,
      plan("char_diversity").toString)
  }

  test("chunk_stride never shuffles beyond the spread (sequence explode, no window)") {
    val p = plan("chunk_stride")
    assert(countShuffles(p) == 1, p.toString)
    assert(!p.toString.contains("Window"), p.toString)
  }

  test("kmeans_step broadcasts the seeds; the Lloyd update is one hash aggregation") {
    val s = planString("kmeans_step")
    assert(s.contains("BroadcastNestedLoopJoin"), s"seeds not broadcast in:\n$s")
    assert(!s.contains("CartesianProduct"), s"cartesian product in:\n$s")
    assert(s.contains("partial_sum") || s.contains("partial sum"),
      s"no map-side partial sums in the centroid update:\n$s")
  }

  test("oov_rate broadcasts the vocabulary against the token stream") {
    val s = planString("oov_rate")
    assert(s.contains("BroadcastHashJoin"), s"vocab not broadcast in:\n$s")
  }

  test("resample_locf: one keyed window pass, no cross join") {
    val s = planString("resample_locf")
    assert(!s.contains("CartesianProduct"), s)
    // exactly one Window operator instance family (two last() calls
    // share the one per-user sort)
    assert("(?m)^\\s*(\\*\\(\\d+\\) )?Window ".r.findAllIn(s).size <= 2, s)
  }

  test("vocab_drift: totals ride a broadcast, vocabulary head is a bounded top-k") {
    val s = planString("vocab_drift")
    assert(s.contains("BroadcastNestedLoopJoin") || s.contains("BroadcastHashJoin"), s)
    assert(s.contains("TakeOrderedAndProject"), s"global sort in:\n$s")
  }

  test("substr_dup: one hash-keyed exchange serves pre-agg and window, no self-join") {
    val p = plan("substr_dup")
    val s = p.toString
    assert(!s.contains("CartesianProduct"), s)
    assert(!s.contains("SortMergeJoin") && !s.contains("BroadcastHashJoin"),
      s"occurrence stream self-join crept in:\n$s")
    // parallelize spread + the explicit hash(h) repartition + the final
    // doc rollup — the (h, doc) pre-agg and the per-h window must REUSE
    // the h exchange, not add their own
    assert(countShuffles(p) <= 3, s)
  }

  test("substr_scrub: keyed exchanges only, no occurrence self-join") {
    val p = plan("substr_scrub")
    val s = p.toString
    assert(!s.contains("CartesianProduct"), s)
    assert(!s.contains("BroadcastNestedLoopJoin"), s)
    // spread + the hash(h) exchange (pre-agg and per-hash stats reuse
    // it) + the removed-position doc rollup + the rewrite join's two
    // sides — all keyed; anything beyond ~7 means a stage stopped
    // reusing its parent's partitioning
    assert(countShuffles(p) <= 7, s)
  }

  test("mm_phash: the perceptual-hash pass is map-only after the spread") {
    val p = plan("mm_phash")
    val s = p.toString
    assert(!s.contains("Join"), s"decode pass should join nothing:\n$s")
    // parallelize spread only — the codec seam itself must add no
    // exchange (at 100 TB the media bytes never move)
    assert(countShuffles(p) <= 1, s)
  }

  test("mm_phash_pairs: banded join keyed on (band,value), never all-pairs") {
    val p = plan("mm_phash_pairs")
    val s = p.toString
    assert(!s.contains("CartesianProduct"), s)
    assert(!s.contains("BroadcastNestedLoopJoin"), s)
    // spread + two (b,v)-keyed join sides + the distinct rollup
    assert(countShuffles(p) <= 5, s)
  }

  test("lex_df_gate: one gram pass, term-keyed join, no cartesian sweep") {
    val p = plan("lex_df_gate")
    val s = p.toString
    assert(!s.contains("CartesianProduct"), s)
    // (a BroadcastNestedLoopJoin IS present — it is the deliberate
    // 1-row × 1-row combine of the rets/terms reports, bounded by
    // construction; the corpus-sized join below is hash-keyed on s)
    // the three-cap sweep must NOT multiply the pipeline: the pruned
    // posting table is materialized once (localCheckpoint) and the
    // conditional sums ride the single widest-cap pair join. Budget:
    // pair rollup + norms agg + two norm-join sides + df-table
    // distinct + the two 1-row aggs
    assert(countShuffles(p) <= 8, s)
  }

  test("encode_shards: word table broadcast, corpus side never shuffled for the join") {
    val s = planString("encode_shards")
    assert(!s.contains("CartesianProduct"), s)
    // the doc-words → word-encodings join must be broadcast (the word
    // table is vocab-sized); a SortMergeJoin here would shuffle every
    // token row of the corpus
    assert(s.contains("BroadcastHashJoin"), s)
  }

  test("dedup_containment joins candidates by id, never all-pairs") {
    val s = planString("dedup_containment")
    assert(!s.contains("CartesianProduct"), s)
    assert(!s.contains("BroadcastNestedLoopJoin"), s)
  }

  test("bpe_merge_step: pre-aggregated words, partial sums, bounded top-k") {
    val s = planString("bpe_merge_step")
    assert(s.contains("TakeOrderedAndProject"), s"global sort in:\n$s")
    assert(s.contains("partial_sum") || s.contains("partial sum"),
      s"no map-side combine on pair counts:\n$s")
  }

  test("tok_fertility aggregates with map-side partial sums, no window") {
    val s = planString("tok_fertility")
    assert(!s.contains("Window"), s)
    assert(s.contains("partial_sum") || s.contains("partial sum"),
      s"no map-side combine:\n$s")
  }

  test("hll_distinct: two hash aggregations, both with map-side partials, no window") {
    val s = planString("hll_distinct")
    assert(!s.contains("Window"), s)
    assert(!s.contains("CartesianProduct"), s)
    assert(s.contains("partial_max") || s.contains("partial max"),
      s"register max has no map-side combine:\n$s")
    assert(s.contains("partial_sum") || s.contains("partial sum"),
      s"register sum has no map-side combine:\n$s")
  }

  test("winnow_fingerprint: generator-only expansion, no join, bounded shuffles") {
    val p = plan("winnow_fingerprint")
    val s = p.toString
    assert(!s.contains("Join"), s"selection must not join:\n$s")
    assert(!s.contains("Window"), s"no window operator expected:\n$s")
    // parallelize spread + the (doc, t) selection groupBy + the distinct
    assert(countShuffles(p) <= 3, s)
  }

  test("ngram_novelty: one hash-keyed exchange serves pre-agg and first-doc window") {
    val p = plan("ngram_novelty")
    val s = p.toString
    assert(!s.contains("Join"), s"novelty must not self-join:\n$s")
    // parallelize spread + the explicit hash(h) repartition + the doc
    // rollup — the (h, doc) pre-agg and per-h window reuse the h
    // exchange (the substr_dup discipline)
    assert(countShuffles(p) <= 3, s)
  }

  test("hard_negatives broadcasts the query side; no cartesian over the corpus") {
    val s = planString("hard_negatives")
    assert(s.contains("BroadcastNestedLoopJoin") || s.contains("BroadcastHashJoin"),
      s"query side not broadcast:\n$s")
    assert(!s.contains("CartesianProduct"), s)
    assert(s.contains("TopKPerKey"), s"bounded top-k operator missing:\n$s")
  }

  test("scd2_intervals: one user-keyed exchange, both window passes reuse it") {
    val p = plan("scd2_intervals")
    assert(!p.toString.contains("Join"), p.toString)
    assert(countShuffles(p) == 1, p.toString)
  }

  test("cohort_retention: user exchange shared by distinct and first-seen window") {
    val p = plan("cohort_retention")
    val s = p.toString
    assert(!s.contains("Join"), s"first-seen must ride the window, not a join:\n$s")
    // the explicit user repartition + the final (cohort, offset) rollup
    assert(countShuffles(p) <= 2, s)
  }

  test("funnel_conversion: stage joins are keyed by user, no stream self-cartesian") {
    val s = planString("funnel_conversion")
    assert(!s.contains("CartesianProduct"), s)
    // the three single-row stage counts cross as broadcast scalars
    assert(s.contains("BroadcastNestedLoopJoin"), s)
  }

  test("topic_assign is map-only after the spread: one shuffle, no UDF") {
    val p = plan("topic_assign")
    val s = p.toString
    assert(countShuffles(p) <= 1, s) // the parallelize round-robin only
    assert(!s.contains("BatchEvalPython") && !s.contains("ScalaUDF"), s)
  }

  test("dedup_keep_best: keyed joins over the shared labels, no cartesian") {
    val s = planString("dedup_keep_best")
    assert(!s.contains("CartesianProduct"), s)
    assert(!s.contains("BroadcastNestedLoopJoin"), s)
  }

  test("substr_dup (SA production path): suffix-array rows into one h exchange, no self-join") {
    val p = plan("substr_dup")
    val s = p.toString
    assert(!s.contains("CartesianProduct"), s)
    assert(!s.contains("SortMergeJoin") && !s.contains("BroadcastHashJoin"),
      s"occurrence self-join crept in:\n$s")
    // parallelize spread + the explicit hash(h) repartition + the doc
    // rollup; the defensive (h, doc) agg and the per-h window REUSE the
    // h exchange (identical budget to the gram-hash twin)
    assert(countShuffles(p) <= 3, s)
  }

  test("ann_frontier: sweep and seeds ride broadcasts, no cartesian blowup") {
    // audit the BUILDER's plan — the registered query reads the
    // SharedStages materialization (a checkpointed scan) shared with
    // ivf_nprobe_gate
    val s = graft.queries.EmbedQueries.buildAnnFrontier(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!s.contains("CartesianProduct"), s)
    // the 8 seeds, the 3-row nprobe sweep, and the exact side cross as
    // bounded broadcasts; the candidate join stays keyed by cell
    assert(s.contains("BroadcastNestedLoopJoin"), s)
  }

  test("novelty_incr: bucket-pruned probe joins on h, no full-store scan shapes") {
    val p = plan("novelty_incr")
    val s = p.toString
    assert(!s.contains("CartesianProduct"), s)
    assert(!s.contains("BroadcastNestedLoopJoin"), s)
  }

  test("chunk_dedup: digest-keyed exchanges only, no window over token rows") {
    val p = plan("chunk_dedup")
    val s = p.toString
    assert(!s.contains("CartesianProduct"), s)
    assert(!s.contains("Join"), s"chunk accounting must not self-join:\n$s")
    // parallelize round-robin + the fp window + the doc rollup — the
    // chunk expansion itself must add no exchange
    assert(countShuffles(p) <= 3, s)
  }

  test("pack_chunks: distributed prefix sum — no per-source unbounded window remains") {
    // the registered query reads the SharedStages checkpoint of the
    // prefix sum, so the shape lives in the lazy builder's plan
    val (cum, cleanup) = graft.queries.CurationQueries.packedCumPlan(spark, sf)
    val s = cum.queryExecution.executedPlan.toString
    cleanup()
    // the prefix-sum signature: a range exchange on (source, doc_id)
    assert(s.contains("rangepartitioning(source"),
      s"no range partitioning — prefix sum degraded to a hash shape:\n$s")
    // the data-scale cumsum window must be keyed by (pid, source) —
    // bounded by the range partition size, never by a source's size
    assert("windowspecdefinition\\(pid#\\d+, source#".r.findFirstIn(s).isDefined,
      s"partition-local cumsum window missing:\n$s")
    // the scale-killer shape: a window partitioned by source alone and
    // ordered by doc_id puts a whole source in one task — must be gone
    // (the offsets window orders by pid over a ≤P×|sources| side table,
    // which this pattern deliberately does not match)
    assert("windowspecdefinition\\(source#\\d+, doc_id#".r.findFirstIn(s).isEmpty,
      s"per-source unbounded window still present:\n$s")
    // offsets ride a broadcast back onto the big side
    assert(s.contains("BroadcastHashJoin"), s)
    assert(!s.contains("CartesianProduct"), s)
  }

  test("pca_project: projection is a map-only scan — no joins, component rides as a literal") {
    val p = plan("pca_project")
    val s = p.toString
    // the component is a driver-side literal array, not a join side
    assert(!s.contains("Join"), s"projection must not join:\n$s")
    assert(!s.contains("CartesianProduct"), s)
    // only the parallelize round-robin exchange — nothing data-keyed
    assert(countShuffles(p) <= 1, s)
  }

  test("abtt_pairs: residual pair join stays cell-keyed, never a cartesian") {
    val s = planString("abtt_pairs")
    assert(!s.contains("CartesianProduct"), s)
    assert(!s.contains("BroadcastNestedLoopJoin"), s)
    // the join key is the blocking cell (label), like embed_cosine_pairs
    assert(s.contains("SortMergeJoin") || s.contains("BroadcastHashJoin") ||
      s.contains("ShuffledHashJoin"), s"no keyed join found:\n$s")
  }

  test("pq_refine: shortlist and queries ride broadcasts; corpus never shuffles for stage 2") {
    val s = planString("pq_refine")
    assert(!s.contains("CartesianProduct"), s)
    // both stage-2 joins are broadcast-hash on the bounded shortlist
    assert(s.contains("BroadcastHashJoin"), s)
  }

  test("cluster_purity: codebook broadcast keeps assignment map-only") {
    val s = planString("cluster_purity")
    assert(!s.contains("CartesianProduct"), s)
    assert(s.contains("BroadcastNestedLoopJoin") || s.contains("BroadcastHashJoin"), s)
  }

  test("simhash_pairs: band-bucket join, no cartesian, popcount stays codegen") {
    val s = planString("simhash_pairs")
    assert(!s.contains("CartesianProduct"), s)
    assert(!s.contains("BroadcastNestedLoopJoin"),
      s"band join must be keyed on (b, v):\n$s")
    assert(!s.toLowerCase.contains("udf"), s)
  }

  test("semdedup_prune: LSH-keyed candidates, broadcast codebook, no cartesian") {
    val s = planString("semdedup_prune")
    assert(!s.contains("CartesianProduct"), s)
    // the ≤8-row IVF codebook must broadcast (nested-loop over a
    // broadcast dim is the bounded assignment pass, not a data×data join)
    assert(s.contains("BroadcastNestedLoopJoin") || s.contains("BroadcastHashJoin"), s)
  }

  test("dsir_importance: hashed-LM lift table broadcasts to the scorer") {
    // audit the BUILDER, not the registered query: the registry serves
    // the memoized localCheckpoint (a Scan ExistingRDD), which hides
    // the build plan this test exists to pin
    val s = graft.queries.CurationQueries.dsirReport(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!s.contains("CartesianProduct"), s)
    assert(s.contains("BroadcastHashJoin"),
      s"the ≤4096-row lift table must broadcast:\n$s")
  }

  test("ccnet_buckets: NTILE window is language-partitioned, not global") {
    val s = planString("ccnet_buckets")
    // a global (unpartitioned) window renders an Exchange SinglePartition
    // feeding the Window node — per-lang bucketing must never do that
    assert(!s.contains("Exchange SinglePartition"),
      s"per-language window collapsed to one partition:\n$s")
  }

  test("winnow_pairs: fingerprint join keyed on the hash, no cartesian") {
    val s = planString("winnow_pairs")
    assert(!s.contains("CartesianProduct"), s)
    assert(!s.contains("BroadcastNestedLoopJoin"),
      s"fingerprint self-join must be keyed on h:\n$s")
  }

  test("minhash_bbit: candidate join stays keyed, bit-match sum stays codegen") {
    val s = planString("minhash_bbit")
    assert(!s.contains("CartesianProduct"), s)
    assert(!s.toLowerCase.contains("udf"), s)
  }

  test("lex_cosine_pairs: posting-list join keyed on the term, no cartesian") {
    val s = planString("lex_cosine_pairs")
    assert(!s.contains("CartesianProduct"), s)
    assert(!s.contains("BroadcastNestedLoopJoin"),
      s"posting-list self-join must be keyed on s:\n$s")
  }

  test("partitioned layout prunes partitions at the scan (time-series layout)") {
    // the biggest 100 TB lever for the telemetry tables: a layout
    // partitioned on the routing column must turn an equality filter
    // into directory pruning — the scan lists ONE partition, the
    // filter never touches row data
    val dir = java.nio.file.Files.createTempDirectory("prune").toString
    SparkEntry.queries("viol_derive")(spark, sf)
      .write.partitionBy("violation_type").mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
      .filter(org.apache.spark.sql.functions.col("violation_type") === "harsh_brake")
    val scan = back.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no file scan"))
    assert(scan.partitionFilters.nonEmpty, "no partition filters at scan")
    assert(scan.metadata("PartitionFilters").contains("violation_type"),
      s"filter not pushed to partitioning: ${scan.metadata("PartitionFilters")}")
    val rows = back.count()
    assert(rows > 0 && rows < SparkEntry.queries("viol_derive")(spark, sf).count())
  }

  test("bucketed tables join with zero exchanges (co-located join)") {
    // the 100 TB co-location story: pre-bucketed fact/dim join needs no
    // shuffle at read time — both sides' bucketing satisfies the join's
    // distribution requirement
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.orders(spark, sf).write.mode("overwrite")
        .bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("b_orders")
      Tables.customer(spark, sf).write.mode("overwrite")
        .bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable("b_customer")
      val j = spark.table("b_orders").join(spark.table("b_customer"),
        org.apache.spark.sql.functions.col("o_custkey") ===
          org.apache.spark.sql.functions.col("c_custkey"))
      assert(countShuffles(j.queryExecution.executedPlan) == 0,
        j.queryExecution.executedPlan.toString)
      assert(j.count() > 0)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("gap_histogram: lag window is user-keyed, never a global sort") {
    val s = planString("gap_histogram")
    assert("windowspecdefinition\\(user_id#".r.findFirstIn(s).isDefined,
      s"lag window must partition by user_id:\n$s")
    // a window with no partition key would single-task the event stream
    assert("windowspecdefinition\\(ts#".r.findFirstIn(s).isEmpty,
      s"unkeyed window over the event stream:\n$s")
    assert(!s.contains("CartesianProduct"), s)
  }

  test("dedup_funnel: stage joins stay id-keyed, never a cartesian") {
    val s = planString("dedup_funnel")
    assert(!s.contains("CartesianProduct"), s)
    assert(!s.contains("BroadcastNestedLoopJoin"), s)
  }

  test("budget_select: prefix sum over the quality order — no data-scale global window") {
    val s = planString("budget_select")
    // range exchange on the (quality DESC, doc_id) order keys
    assert(s.contains("rangepartitioning(n_chars"),
      s"no range partitioning on the quality order:\n$s")
    // the data-scale cumsum window must be pid-keyed (bounded by the
    // range partition), never a global ORDER BY over the corpus
    assert("windowspecdefinition\\(pid#\\d+, n_chars#".r.findFirstIn(s).isDefined,
      s"partition-local cumsum window missing:\n$s")
    // offsets ride a broadcast back onto the big side
    assert(s.contains("BroadcastHashJoin"), s)
    assert(!s.contains("CartesianProduct"), s)
  }

  test("probe_eval: scoring is a map-only scan — weights ride as a literal, no joins") {
    val p = plan("probe_eval")
    val s = p.toString
    // the trained w is a driver-side literal array (the broadcast-model
    // read path), never a join side; the only exchanges are the
    // parallelize round-robin and the label aggregation
    assert(!s.contains("Join"), s"scoring must not join:\n$s")
    assert(!s.contains("CartesianProduct"), s)
    assert(countShuffles(p) <= 2, s)
  }

  test("knn_classify: candidate join stays bucket-keyed, never a cartesian") {
    val s = planString("knn_classify")
    assert(!s.contains("CartesianProduct"), s)
    assert(!s.contains("BroadcastNestedLoopJoin"), s)
    // the custom bounded-heap top-k operator carries the 5-NN cut
    assert(s.contains("TopKPerKey"), s"expected the top-k physical operator:\n$s")
  }

  test("whiten_gate: the chosen branch is the cell-keyed pair join, no cartesian") {
    val s = planString("whiten_gate")
    assert(!s.contains("CartesianProduct"), s)
    assert(!s.contains("BroadcastNestedLoopJoin"), s)
    // the fixture corpus takes the raw branch = the memoized embedPairs
    // stage (a checkpointed scan — its own cell-keyed join shape is
    // pinned by the embed_cosine_pairs audits); the abtt branch would
    // show the cell-keyed join inline
    assert(s.contains("SortMergeJoin") || s.contains("BroadcastHashJoin") ||
      s.contains("ShuffledHashJoin") || s.contains("Scan ExistingRDD"),
      s"neither a keyed join nor the shared checkpointed stage:\n$s")
  }

  test("lm_ppl: LM joins stay keyed; the tercile window is lang-partitioned") {
    // audit the BUILDERS' plans — the registered query reads the
    // SharedStages materialization (a checkpointed scan), so the shapes
    // worth pinning are the ones the first caller executes: the
    // lmDocBits stage (LM joins + the codegen log chain) and the
    // rollup/window on top of it
    val stage = graft.queries.TextQueries.buildLmDocBits(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!stage.contains("CartesianProduct"), stage)
    assert(!stage.contains("BroadcastNestedLoopJoin"), stage)
    // the integer log chain must stay codegen — no UDF anywhere
    assert(!stage.contains("BatchEvalPython") && !stage.contains("ScalaUDF"),
      stage)
    val s = graft.queries.TextQueries.buildLmPpl(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!s.contains("CartesianProduct"), s)
    // the NTILE window partitions by lang — a global (empty-key) window
    // renders as "Window [...], [mean_bits ..." with no partition spec
    assert(!s.matches("(?s).*Window \\[[^\\]]*\\], \\[mean_bits.*"),
      s"tercile window lost its lang partitioning:\n$s")
  }

  test("quality_auc: within-score window is bucket-partitioned, no cartesian") {
    val s = planString("quality_auc")
    assert(!s.contains("CartesianProduct"), s)
    assert(!s.contains("BatchEvalPython") && !s.contains("ScalaUDF"), s)
    // the within-bucket cumulative window partitions by b — a global
    // (empty-key) cum_n_in window would sort every distinct score on
    // one task; the only unpartitioned window allowed is the bounded
    // ≤13 825-row bucket table's cum_nb_before
    assert(!s.matches("(?s).*Window \\[[^\\]]*\\], \\[cum_n_in.*"),
      s"within-bucket window lost its bucket partitioning:\n$s")
    // the 1-row total joins as a broadcast, never a shuffled cartesian
    assert(!s.contains("CartesianProduct"), s)
  }

  test("mink_prob: no cartesian; the top-k window is doc-partitioned") {
    val s = planString("mink_prob")
    assert(!s.contains("CartesianProduct"), s)
    assert(!s.contains("BroadcastNestedLoopJoin"), s)
    assert(!s.contains("BatchEvalPython") && !s.contains("ScalaUDF"), s)
    // the cumulative window partitions by doc_id — a global window here
    // would sort the whole corpus on one task
    assert(!s.matches("(?s).*Window \\[[^\\]]*\\], \\[cum.*"),
      s"cumulative window lost its doc partitioning:\n$s")
  }
}
