package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped materialized intermediates shared by query families.
  *
  * The MinHash signature pass (shingle → portable md5 hash → 16
  * min-hash aggregates, [[graft.dedup.MinHashLSH.signatures]]) is the
  * shared input of five reports: dedup_minhash_lsh,
  * dedup_ngram_jaccard, dedup_components, dup_cluster_sizes and
  * split_leakage. At 100 TB a pipeline materializes that pass ONCE as
  * an intermediate table and fans the reports out from it — recomputing
  * the corpus-wide hash pass per report would dominate every one of
  * them. This memo is the single-session rendering of that
  * materialization: the first caller pays the pass and localCheckpoints
  * the result (tiny — one row per document); later callers reuse the
  * materialized RDD.
  *
  * Two deliberate properties, learned from rounds 5/6:
  *   - Deterministic reuse. The previous discipline leaned on the
  *     session CacheManager matching structurally identical subtrees,
  *     which made per-query cost depend on which query happened to run
  *     first — and one caller's unpersist() silently dropped the entry
  *     everyone else was reusing (the round-6 bench saw a 5× swing on
  *     dup_cluster_sizes from exactly that).
  *   - Construction-time execution. localCheckpoint is eager: the first
  *     `queries(...)` call for any family member executes the signature
  *     job before returning the DataFrame. Callers that only want the
  *     plan/schema of a family query pay it too — acceptable for a
  *     materialized-intermediate seam, but worth knowing in plan tests.
  *
  * On a real cluster with executor loss in play, swap localCheckpoint
  * for a checkpoint-dir-backed `.checkpoint()` (same contract,
  * reliable storage) — or an actual intermediate table.
  */
object SharedStages {
  private val memo =
    new ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  // ------------------------------------------------ build-cost ledger
  // One-time stage builds are real pipeline cost that min-of-N warm
  // benching deliberately discards (the first sample pays it, the min
  // doesn't). Round 13's lmDocBits build was 16.2 s at sf0.1 — ~23% of
  // the warm registry total — and lived only in BENCH_NOTES prose,
  // invisible to an artifact diff. Every stage build therefore records
  // its wall seconds here, keyed by (dir, stage), and graft.Bench emits
  // the map for its SF dir as `stage_build_sec` in BENCH_DETAIL.json
  // next to the warm numbers. merge-accumulate: a stage rebuilt after
  // clear() adds up (the honest total paid in the JVM's lifetime).
  private val buildLedger = new ConcurrentHashMap[(String, String), Double]()

  private def recordBuild(dir: String, name: String, sec: Double): Unit =
    buildLedger.merge((dir, name), sec, (a, b) => Double.box(a + b))

  /** Wall-seconds of every one-time stage build paid for `dir` in this
    * JVM (stage name → seconds). Duplicate concurrent builds both count
    * — they were both paid. */
  def buildSeconds(dir: String): Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    buildLedger.asScala.collect { case ((d, n), s) if d == dir => n -> s }.toMap
  }

  // NOT computeIfAbsent: stage builders call other stages (pairs →
  // cands → sigs), and a nested computeIfAbsent on the same
  // ConcurrentHashMap throws IllegalStateException("Recursive update")
  // whenever the keys land in the same bin — a hash-placement-dependent
  // failure that surfaced only when the key set grew. Build OUTSIDE the
  // map lock; a concurrent duplicate build is deterministic and merely
  // discarded by putIfAbsent.
  private def stage(s: SparkSession, dir: String, name: String)
                   (build: => DataFrame): DataFrame = {
    val key = (s, dir, name)
    val existing = memo.get(key)
    if (existing != null) existing
    else {
      val t0 = System.nanoTime()
      val built = build
      recordBuild(dir, name, (System.nanoTime() - t0) / 1e9)
      val prev = memo.putIfAbsent(key, built)
      if (prev != null) prev else built
    }
  }

  /** Materialized MinHash signatures of `documents(dir)`:
    * (doc_id, sh: distinct shingle hashes, sig: array[16]). */
  def minhashSignatures(s: SparkSession, dir: String): DataFrame =
    stage(s, dir, "sigs") {
      graft.dedup.MinHashLSH
        .signatures(Tables.documents(s, dir), "doc_id", "text")
        .localCheckpoint()
    }

  /** Materialized LSH candidate pairs (a_id, b_id, est_sim) — the
    * band-bucket join output consumed directly by dedup_minhash_lsh and
    * dedup_containment and fed to the verify stage. ∝ true collisions,
    * so the checkpoint is small. */
  def candidatePairs(s: SparkSession, dir: String): DataFrame =
    stage(s, dir, "cands") {
      graft.dedup.MinHashLSH
        .candidatePairs(minhashSignatures(s, dir), "doc_id")
        .localCheckpoint()
    }

  /** Materialized verified near-dup pairs (a_id, b_id, jaccard) at the
    * family's canonical 0.5 threshold — the edge set shared by
    * dedup_ngram_jaccard, dedup_components, dup_cluster_sizes and
    * split_leakage. Tiny (∝ true duplicates), so the checkpoint is a
    * few KB; what it saves is the candidate join + shingle-set verify
    * re-running once per report. */
  def verifiedPairs(s: SparkSession, dir: String): DataFrame =
    stage(s, dir, "pairs05") {
      graft.dedup.MinHashLSH
        .verifiedPairs(candidatePairs(s, dir),
          minhashSignatures(s, dir), "doc_id", 0.5)
        .localCheckpoint()
    }

  /** Materialized component labeling (id, root) of [[verifiedPairs]] —
    * the iterative min-label fixpoint runs once per session, not once
    * per report that consumes the clustering (dedup_components AND
    * dup_cluster_sizes both do). minLabel's final round is already a
    * localCheckpoint, so no extra materialization is needed. */
  def componentLabels(s: SparkSession, dir: String): DataFrame =
    stage(s, dir, "labels05") {
      graft.dedup.Components.minLabel(verifiedPairs(s, dir), "a_id", "b_id")
    }

  /** Materialized blocked cosine near-dup pairs over `embeddings(dir)`
    * (cell, a_id, b_id, cos) at the canonical 0.35 threshold — shared
    * by embed_cosine_pairs (the report) and dedup_embed (the
    * canonicalization over the same edges). */
  def embedPairs(s: SparkSession, dir: String): DataFrame =
    stage(s, dir, "embedPairs035") {
      graft.embed.Similarity
        .cosinePairsBlocked(
          Tables.embeddings(s, dir), "vec_id", "embedding", "label", 0.35)
        .localCheckpoint()
    }

  /** Component labeling of [[embedPairs]] (dedup_embed's clustering). */
  def embedLabels(s: SparkSession, dir: String): DataFrame =
    stage(s, dir, "embedLabels035") {
      graft.dedup.Components.minLabel(embedPairs(s, dir), "a_id", "b_id")
    }

  /** Lloyd-TRAINED IVF codebook (seed_id, sq, snq) over
    * `embeddings(dir)` — [[graft.embed.IvfTrain.trainedCentroids]],
    * trained once per (session, dir) and shared by every IVF consumer
    * (ivf_assign, ivf_search, ann_recall, ann_frontier). The result is
    * k×1 driver-local rows, so the memo holds the tiny table itself. */
  def ivfCentroids(s: SparkSession, dir: String): DataFrame =
    stage(s, dir, "ivfCentroids") {
      import org.apache.spark.sql.functions.col
      graft.embed.IvfTrain.trainedCentroids(
        graft.embed.Similarity
          .quantized(Tables.embeddings(s, dir), "vec_id", "embedding")
          .select(col("vec_id"), col("q"), col("nq")))
        .localCheckpoint()
    }

  /** Lloyd-TRAINED per-subspace PQ codebook (j, cid, csub) —
    * [[graft.embed.PqTrain.trainedCodebooks]], trained once per
    * (session, dir) and shared by every PQ consumer (pq_train,
    * pq_assign, pq_search, pq_refine, ivf_pq_search). M·K driver-local
    * rows. */
  def pqCodebook(s: SparkSession, dir: String): DataFrame =
    stage(s, dir, "pqCodebook") {
      graft.queries.EmbedQueries.buildPqCodebook(s, dir).localCheckpoint()
    }

  /** Banded SimHash Hamming≤3 near-dup pairs (a_id, b_id, hamming) —
    * consumed by the simhash_pairs report (ADAPTIVE width, the
    * BandLadder gate) AND the cascade funnel's third stage
    * (dedup_funnel — PINNED at the 16-bit production width, matching
    * its streaming twin StreamingCuration, whose standing band stores
    * fix the width as part of their layout). The memo is keyed by
    * tier, so below the ladder seam both consumers share one build. */
  def simhashPairs(s: SparkSession, dir: String): DataFrame =
    simhashPairsAt(s, dir, graft.functions.BandLadder.bitsFor(
      graft.Tables.documents(s, dir).count()))

  def simhashPairsAt(s: SparkSession, dir: String, bandBits: Int): DataFrame =
    stage(s, dir, s"simPairs$bandBits") {
      graft.queries.DedupQueries.buildSimhashPairsAt(s, dir, bandBits)
        .localCheckpoint()
    }

  /** Winnowed fingerprint selection (winnow_fingerprint) — consumed by
    * the per-doc report AND the MOSS overlap pair join (winnow_pairs).
    * The gram-explode + rolling-min selection is the expensive pass;
    * its output is ~2/(w+1) of the gram stream. */
  def winnowFingerprints(s: SparkSession, dir: String): DataFrame =
    stage(s, dir, "winnow") {
      graft.queries.MiningQueries.winnowFingerprint(s, dir).localCheckpoint()
    }

  /** Per-doc DSIR importance report (dsir_importance) — consumed by the
    * standalone report AND the resampling draw (dsir_resample). One row
    * per doc; the corpus-wide bigram hash pass + lift build runs once. */
  def dsirScores(s: SparkSession, dir: String): DataFrame =
    stage(s, dir, "dsirScores") {
      graft.queries.CurationQueries.dsirReport(s, dir).localCheckpoint()
    }

  /** Materialized per-doc repetition report (rep_ngram) — consumed by
    * the standalone report AND the curation funnel. One row per doc. */
  def repNgramReport(s: SparkSession, dir: String): DataFrame =
    stage(s, dir, "repNgram") {
      graft.queries.FingerprintQueries.repNgram(s, dir).localCheckpoint()
    }

  /** Materialized per-doc corpus-LM rarity report (lm_rare_bigrams). */
  def lmRareReport(s: SparkSession, dir: String): DataFrame =
    stage(s, dir, "lmRare") {
      graft.queries.FingerprintQueries.lmRareBigrams(s, dir).localCheckpoint()
    }

  /** Materialized per-(doc, bigram) occurrence counts of
    * `documents(dir)` — the corpus tokenize + pair-explode pass, run
    * once per (session, dir); consumed by the LM build ([[lmDocBits]])
    * AND the incremental LM maintenance path (lm_incr), which batches
    * the reference slice of exactly this table into its count store. */
  def bigramCounts(s: SparkSession, dir: String): DataFrame =
    stage(s, dir, "bigramCounts") {
      graft.queries.TextQueries
        .bigramCountsOf(Tables.parallelize(Tables.documents(s, dir)))
        .localCheckpoint()
    }

  /** Materialized per-(doc, score) occurrence counts under the
    * reference bigram LM — the LM build + triple scoring over
    * [[bigramCounts]], run once per (session, dir); consumed by the
    * lm_ppl rollup ([[lmPplReport]]) and mink_prob's top-k% selection. */
  def lmDocBits(s: SparkSession, dir: String): DataFrame =
    stage(s, dir, "lmDocBits") {
      graft.queries.TextQueries.buildLmDocBits(s, dir).localCheckpoint()
    }

  /** Materialized IVF recall/compute frontier (ann_frontier) —
    * consumed by the standalone report AND the nprobe decision gate
    * (ivf_nprobe_gate). 30 rows (3 sweep points × 10 queries); what it
    * saves is the sweep's candidate scoring re-running per consumer. */
  def annFrontier(s: SparkSession, dir: String): DataFrame =
    stage(s, dir, "annFrontier") {
      graft.queries.EmbedQueries.buildAnnFrontier(s, dir).localCheckpoint()
    }

  /** Materialized per-doc bigram-LM cross-entropy report (lm_ppl) —
    * consumed by the standalone report AND the quality_ensemble
    * composition (whose ppl gate is exactly this table's tercile). One
    * row per scored doc; a rollup of [[lmDocBits]]. */
  def lmPplReport(s: SparkSession, dir: String): DataFrame =
    stage(s, dir, "lmPpl") {
      graft.queries.TextQueries.buildLmPpl(s, dir).localCheckpoint()
    }

  /** Materialized corpus-wide DISTINCT (doc_id, h) n-gram occurrence
    * table, h-keyed — the one gram+hash pass of the novelty family,
    * shared by ngram_novelty (whole table: first-occurrence scoring),
    * the incremental probe side (odd ids — novelty_incr AND
    * novelty_probe each previously re-ran the pass per invocation) and
    * the prior-store build ([[priorGramSet]], even ids). At 100 TB the
    * corpus gram table is a maintained intermediate of the ingest
    * pipeline; this memo is its single-session rendering. The h
    * partitioning survives the checkpoint, so every consumer's
    * h-clustered aggregation/window reuses it exchange-free. */
  def gramOcc(s: SparkSession, dir: String, n: Int): DataFrame =
    stage(s, dir, s"gramOcc_$n") {
      import org.apache.spark.sql.functions.col
      graft.text.TextFunctions
        .ngramRows(Tables.parallelize(Tables.documents(s, dir)),
          "doc_id", "text", n)
        .select(col("doc_id"),
          graft.text.TextFunctions.portableHash(col("s")).as("h"))
        .repartition(col("h"))
        .distinct()
        .localCheckpoint()
    }

  /** Materialized distinct prior-batch gram hashes (even doc_ids,
    * n-gram size n) — the shared input of the standing novelty store
    * build ([[noveltyGramStore]]) AND novelty_incr's per-run store
    * write. A projection of [[gramOcc]] (same gram pass; the even/odd
    * split is a filter over the shared table). novelty_incr still pays
    * the store WRITE each run (the honest incremental-ingest cost) —
    * only the corpus-wide hash pass is shared. */
  def priorGramSet(s: SparkSession, dir: String, n: Int): DataFrame =
    stage(s, dir, s"priorGrams_$n") {
      import org.apache.spark.sql.functions.col
      gramOcc(s, dir, n)
        .filter(col("doc_id") % 2 === 0)
        .select(col("h"))
        .distinct()
        .localCheckpoint()
    }

  /** Materialized df-annotated pruned trigram posting table
    * (doc_id, s, tf, df) at the WIDEST sweep cap (df ≤ 50) — the corpus
    * tf pass + term-keyed df window shared by lex_df_gate (consumes it
    * whole) and lex_cosine_pairs (its production pruned table is
    * exactly the df ≤ 25 subset: df is a pure function of the full tf
    * table, so filtering the widest materialization is bit-identical
    * to re-deriving at the narrower cap). */
  def lexPruned(s: SparkSession, dir: String): DataFrame =
    stage(s, dir, "lexPruned50") {
      graft.queries.MiningQueries.buildLexPruned(s, dir).localCheckpoint()
    }

  /** Materialized distinct RP-LSH bucket-collision candidate pairs
    * (a_id, b_id) over `embeddings(dir)` at the gated
    * [[graft.embed.RpLsh.widthFor]] width — ONE bucket pass + self-join
    * shared by the raw-cosine scored table ([[rpScored]]) AND the
    * ABTT-residual twin ([[abttRpPairs]]): bucketing is always on the
    * raw vectors, so both metrics verify the same candidate set. */
  def rpCands(s: SparkSession, dir: String): DataFrame =
    stage(s, dir, "rpCands") {
      graft.embed.RpLsh
        .candPairs(Tables.embeddings(s, dir), "vec_id", "embedding")
        .localCheckpoint()
    }

  /** Materialized UNthresholded exact-cosine RP candidate scores
    * (a_id, b_id, cos) — every raw-metric annPairs consumer differs
    * only in its threshold (ann_rp_lsh 0.35, semdedup_prune 0.4,
    * cos_calibration −1.0, whiten gate raw branch 0.35), which is a
    * filter over these rows; each previously re-ran the bucket pass,
    * candidate self-join and scoring joins per invocation. */
  def rpScored(s: SparkSession, dir: String): DataFrame =
    stage(s, dir, "rpScored") {
      graft.embed.RpLsh
        .annScoredFrom(rpCands(s, dir), Tables.embeddings(s, dir),
          "vec_id", "embedding")
        .localCheckpoint()
    }

  /** Materialized ABTT-residual RP pair table (a_id, b_id, cos ≥ τ) —
    * consumed by the abtt_pairs_rp report AND whiten_force_rp's abtt
    * branch, each of which previously re-ran the residual projection +
    * candidate scoring per invocation. */
  def abttRpPairs(s: SparkSession, dir: String): DataFrame =
    stage(s, dir, "abttRpPairs") {
      graft.queries.EmbedQueries.buildAbttPairsRp(s, dir).localCheckpoint()
    }

  /** Materialized stride-1 window-hash position table (doc_id, pos, h)
    * at the substring-dedup width W = 8, h-keyed — the corpus gram+md5
    * pass shared by substr_scrub (position-level excision) and
    * substr_dup_gram (whose per-(h, doc) occurrence counts are a
    * rollup of the same rows). */
  def subWinPos(s: SparkSession, dir: String): DataFrame =
    stage(s, dir, "subWinPos8") {
      graft.queries.FingerprintQueries.buildSubWinPos(s, dir).localCheckpoint()
    }

  /** Materialized per-doc Gopher rule report (doc_id, rule verdicts,
    * keep) — one row per doc; consumed by gopher_rules (the report),
    * quality_auc (the gate side of the AUC) and quality_ensemble (the
    * rule stage), each of which previously re-ran the map-only rule
    * pass per invocation. */
  def gopherReport(s: SparkSession, dir: String): DataFrame =
    stage(s, dir, "gopherReport") {
      graft.queries.TextQueries.buildGopherRules(s, dir).localCheckpoint()
    }

  /** Materialized per-doc language-ID report (doc_id, lang_label,
    * lang_pred, per-language scores) — consumed by lang_id,
    * lang_confusion and quality_ensemble. */
  def langIdReport(s: SparkSession, dir: String): DataFrame =
    stage(s, dir, "langIdReport") {
      graft.queries.TextQueries.buildLangId(s, dir).localCheckpoint()
    }

  /** Materialized per-doc BM25 report (doc_id, s_<term>…, score) — one
    * row per doc; consumed by bm25_topk (the top-10 report) AND
    * hybrid_rrf (the lexical arm of the rank fusion), each of which
    * previously re-ran the tokenize + scoring pass and its two driver
    * scalars (N, avgdl). */
  def bm25PerDoc(s: SparkSession, dir: String): DataFrame =
    stage(s, dir, "bm25PerDoc") {
      graft.queries.QualityQueries.buildBm25PerDoc(s, dir).localCheckpoint()
    }

  /** Materialized budget-independent packing prefix sum (source,
    * doc_id, n_tok, cum) — shared by pack_chunks, pack_mask and
    * pack_sweep (each previously rebuilt it and leaked the internal
    * persisted tokenize pass). One row per doc; the eager
    * localCheckpoint lets the builder release its persist immediately. */
  def packedCum(s: SparkSession, dir: String): DataFrame =
    stage(s, dir, "packedCum") {
      val (cum, cleanup) = graft.queries.CurationQueries.packedCumPlan(s, dir)
      val out = cum.localCheckpoint()
      cleanup()
      out
    }

  // --------------------------------------------------- PCA component
  // The fixed-point power-iteration component over the distributed
  // Gram matrix ([[graft.embed.PcaPower]]) — d·(d+1)/2 bounded cells
  // collected once per (session, dir), shared by the pca_power report
  // and the pca_project projection scan. Same build-outside-the-lock
  // discipline as [[stage]] (the Gram aggregation is deterministic, so
  // a concurrent duplicate build is merely discarded).
  private val gramMemo =
    new ConcurrentHashMap[(SparkSession, String), Seq[(Int, Int, Long)]]()

  /** Collected upper-triangle Gram rows — d(d+1)/2 = 2 080 cells
    * regardless of corpus size; shared by the PCA component and the
    * linear probe so the distributed aggregation runs once. */
  def gramUpper(s: SparkSession, dir: String): Seq[(Int, Int, Long)] = {
    val key = (s, dir)
    val existing = gramMemo.get(key)
    if (existing != null) existing
    else {
      val t0 = System.nanoTime()
      val rows = graft.queries.EmbedQueries.gramMatrix(s, dir).collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
      recordBuild(dir, "gramUpper", (System.nanoTime() - t0) / 1e9)
      val prev = gramMemo.putIfAbsent(key, rows)
      if (prev != null) prev else rows
    }
  }

  private val pcaMemo =
    new ConcurrentHashMap[(SparkSession, String), Seq[graft.embed.PcaPower.Component]]()

  /** Top-[[graft.embed.PcaPower.NumComponents]] deflated components —
    * shared by pca_power/pca_topk, the k-component projection
    * (pca_project) and the full-ABTT residual pass (abtt_pairs).
    * Driver work on the collected Gram; computed once per
    * (session, dir). */
  def pcaTopK(s: SparkSession, dir: String): Seq[graft.embed.PcaPower.Component] = {
    val key = (s, dir)
    val existing = pcaMemo.get(key)
    if (existing != null) existing
    else {
      val t0 = System.nanoTime()
      val built = graft.embed.PcaPower.powerK(gramUpper(s, dir),
        graft.embed.PcaPower.NumComponents)
      recordBuild(dir, "pcaTopK", (System.nanoTime() - t0) / 1e9)
      val prev = pcaMemo.putIfAbsent(key, built)
      if (prev != null) prev else built
    }
  }

  /** The dominant component — head of [[pcaTopK]] (bit-identical to the
    * standalone top-1 power iteration). */
  def pcaComponent(s: SparkSession, dir: String): graft.embed.PcaPower.Component =
    pcaTopK(s, dir).head

  // ---------------------------------------------------- linear probe
  // Ridge probe trained from the shared Gram + one Xᵀy aggregation
  // ([[graft.embed.ProbeTrain]]) — trained once per (session, dir),
  // shared by the weight report (linear_probe) and the scoring/accuracy
  // report (probe_eval).
  private val probeMemo =
    new ConcurrentHashMap[(SparkSession, String), graft.embed.ProbeTrain.Probe]()

  def probe(s: SparkSession, dir: String): graft.embed.ProbeTrain.Probe = {
    val key = (s, dir)
    val existing = probeMemo.get(key)
    if (existing != null) existing
    else {
      val t0 = System.nanoTime()
      val built = graft.queries.EmbedQueries.trainProbe(s, dir)
      recordBuild(dir, "probe", (System.nanoTime() - t0) / 1e9)
      val prev = probeMemo.putIfAbsent(key, built)
      if (prev != null) prev else built
    }
  }

  // --------------------------------------------------- BPE training
  // The iterated BPE vocabulary ([[graft.text.BpeTrain]]) — NMerges
  // distributed top-1 rounds, trained once per (session, dir) and
  // shared by the merge-table report (bpe_train) and the
  // learned-vocabulary report (bpe_tokenize).
  private val bpeMemo =
    new ConcurrentHashMap[(SparkSession, String), graft.text.BpeTrain.Trained]()

  def bpeTrained(s: SparkSession, dir: String): graft.text.BpeTrain.Trained = {
    val key = (s, dir)
    val existing = bpeMemo.get(key)
    if (existing != null) existing
    else {
      val t0 = System.nanoTime()
      val built = graft.text.BpeTrain.train(s, dir)
      recordBuild(dir, "bpeTrained", (System.nanoTime() - t0) / 1e9)
      val prev = bpeMemo.putIfAbsent(key, built)
      if (prev != null) prev else built
    }
  }

  // ---------------------------------------------- deep BPE training
  // The realistic-depth trainer ([[graft.text.BpeDeep]]): one
  // distributed corpus pass builds the capped candidate table, then
  // DeepMerges driver-side argmax rounds — trained once per
  // (session, dir), shared by bpe_train_deep and bpe_deep_encode.
  private val bpeDeepMemo =
    new ConcurrentHashMap[(SparkSession, String), graft.text.BpeDeep.DeepTrained]()

  def bpeDeepTrained(s: SparkSession, dir: String): graft.text.BpeDeep.DeepTrained = {
    val key = (s, dir)
    val existing = bpeDeepMemo.get(key)
    if (existing != null) existing
    else {
      val t0 = System.nanoTime()
      val built = graft.text.BpeDeep.train(s, dir)
      recordBuild(dir, "bpeDeepTrained", (System.nanoTime() - t0) / 1e9)
      val prev = bpeDeepMemo.putIfAbsent(key, built)
      if (prev != null) prev else built
    }
  }

  // --------------------------------------------- unigram-LM training
  // The EM-trained unigram tokenizer ([[graft.text.UnigramTrain]]) —
  // two segmentation passes + vocab-sized collects, trained once per
  // (session, dir) and shared by unigram_train and unigram_tokenize.
  private val unigramMemo =
    new ConcurrentHashMap[(SparkSession, String), graft.text.UnigramTrain.Trained]()

  def unigramTrained(s: SparkSession, dir: String): graft.text.UnigramTrain.Trained = {
    val key = (s, dir)
    val existing = unigramMemo.get(key)
    if (existing != null) existing
    else {
      val t0 = System.nanoTime()
      val built = graft.text.UnigramTrain.train(s, dir)
      recordBuild(dir, "unigramTrained", (System.nanoTime() - t0) / 1e9)
      val prev = unigramMemo.putIfAbsent(key, built)
      if (prev != null) prev else built
    }
  }

  // ---------------------------------------- DEEP unigram-LM training
  // The depth-matched EM-trained unigram tokenizer
  // ([[graft.text.UnigramDeep]]) — driver-side over the SAME capped
  // chunk table bpeDeepTrained built (recovered from its finalWords,
  // so the corpus pass is paid once), shared by unigram_train_deep /
  // unigram_deep_encode / tok_deep_gate.
  private val unigramDeepMemo =
    new ConcurrentHashMap[(SparkSession, String), graft.text.UnigramDeep.DeepTrained]()

  def unigramDeepTrained(s: SparkSession, dir: String): graft.text.UnigramDeep.DeepTrained = {
    val key = (s, dir)
    val existing = unigramDeepMemo.get(key)
    if (existing != null) existing
    else {
      val bpe = bpeDeepTrained(s, dir) // memoized corpus pass
      val t0 = System.nanoTime()
      val built = graft.text.UnigramDeep.trainFromChunks(
        graft.text.UnigramDeep.chunksFrom(bpe))
      recordBuild(dir, "unigramDeepTrained", (System.nanoTime() - t0) / 1e9)
      val prev = unigramDeepMemo.putIfAbsent(key, built)
      if (prev != null) prev else built
    }
  }

  // ------------------------------------------------- on-disk scratch
  // Per-JVM scratch root for query-internal stores (the BucketStore
  // gram store behind novelty_incr/novelty_probe). One root, removed on
  // JVM exit — repeated Verify/Bench invocations no longer leak parquet
  // stores in /tmp (each previously called createTempDirectory and
  // never deleted it).
  private lazy val scratchRoot: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory("graft_scratch")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursive(p)))
    p
  }

  private def deleteRecursive(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(p)) {
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(f => try java.nio.file.Files.delete(f)
        catch { case _: Throwable => () })
    }
  }

  /** A fresh scratch directory under the session root — removed with
    * the root at JVM exit; callers that finish with a store earlier can
    * [[discardScratch]] it immediately. */
  def newScratchDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(scratchRoot, prefix).toString

  def discardScratch(dir: String): Unit =
    deleteRecursive(java.nio.file.Paths.get(dir))

  private val storeMemo =
    new ConcurrentHashMap[(SparkSession, String, String), String]()

  /** The STANDING prior-gram store of `documents(dir)` (even doc_ids'
    * distinct n-gram hashes in a hash-bucketed
    * [[graft.sink.BucketStore]]), built ONCE per (session, dir) — the
    * steady-state form of an ingest loop's membership store. The
    * bootstrap build cost is paid by the first caller; every later
    * probe (novelty_probe) reads only the buckets its batch touches.
    * At 100 TB this is a persistent table maintained by the ingest
    * pipeline; the memo is its single-session rendering. */
  def noveltyGramStore(s: SparkSession, dir: String,
                       n: Int, numBuckets: Int): String = {
    val key = (s, dir, s"noveltyStore_${n}_$numBuckets")
    val existing = storeMemo.get(key)
    if (existing != null) existing
    else {
      val t0 = System.nanoTime()
      val path = newScratchDir("novelty_store")
      graft.sink.BucketStore.upsert(s, priorGramSet(s, dir, n), path,
        Seq("h"), numBuckets)
      recordBuild(dir, s"noveltyGramStore_${n}_$numBuckets",
        (System.nanoTime() - t0) / 1e9)
      val prev = storeMemo.putIfAbsent(key, path)
      if (prev != null) { discardScratch(path); prev } else path
    }
  }

  /** Drop every memoized stage (end of a batch run / test isolation).
    * The checkpointed blocks are freed when the RDDs are GC'd; on-disk
    * scratch stores are removed eagerly. */
  def clear(): Unit = {
    memo.clear()
    gramMemo.clear()
    pcaMemo.clear()
    probeMemo.clear()
    bpeMemo.clear()
    bpeDeepMemo.clear()
    unigramMemo.clear()
    import scala.jdk.CollectionConverters._
    storeMemo.values().asScala.foreach(discardScratch)
    storeMemo.clear()
  }
}
