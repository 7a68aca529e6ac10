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
      val built = build
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

  /** Drop every memoized stage (end of a batch run / test isolation).
    * The checkpointed blocks are freed when the RDDs are GC'd. */
  def clear(): Unit = memo.clear()
}
