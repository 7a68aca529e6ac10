package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.{MinHashLSH, SimHash}
import graft.text.TextFunctions

/** Deduplication operator family over `documents` (SURVEY §7.5): exact
  * hash dedup, normalized fingerprint, MinHash-LSH candidates, exact
  * n-gram Jaccard verification, SimHash fingerprints. All hashing is the
  * portable md5 scheme, so even the LSH pipeline is oracle-checked
  * bit-for-bit against DuckDB. */
object DedupQueries {

  // -------------------------------------------------------- dedup_exact
  // Exact dedup on a normalized content fingerprint: one shuffle on the
  // hash; keeper = min doc_id per group (at 100 TB: hash is 32 bytes vs
  // full text — group on the digest, never on the document body).
  private def dedupExact(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("fp", md5(lower(trim(col("text")))))
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper_id"))

  private val dedupExactSql =
    """SELECT md5(lower(trim(text))) AS fp, COUNT(*) AS n_docs,
      |  MIN(doc_id) AS keeper_id
      |FROM documents
      |GROUP BY 1""".stripMargin

  // ------------------------------------------------------- dedup_prefix
  // Leading-k-token fingerprint dedup: catches boilerplate families
  // (shared headers/templates) that full-content hashing misses and
  // MinHash only scores partially. Hash is over the first 10 tokens —
  // one md5 of ≤ ~100 bytes per doc, one shuffle on the digest.
  private def dedupPrefix(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("toks", TextFunctions.tokens(col("text")))
      .withColumn("fp", md5(concat_ws(" ", slice(col("toks"), 1, 10))))
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper_id"))

  private def dedupPrefixSql = {
    val toks = TextFunctions.tokensSql("text")
    s"""WITH t AS (
       |  SELECT doc_id, $toks AS toks FROM documents)
       |SELECT md5(array_to_string(toks[1:10], ' ')) AS fp,
       |  COUNT(*) AS n_docs, MIN(doc_id) AS keeper_id
       |FROM t
       |GROUP BY 1""".stripMargin
  }

  // -------------------------------------------------- dedup_minhash_lsh
  // LSH candidate generation: signatures are map-only; the only shuffle
  // groups (band, bucket) keys. Candidate count scales with true
  // collisions, not n².
  private def minhashCands(s: SparkSession, d: String): DataFrame =
    graft.SharedStages.candidatePairs(s, d)

  private def minhashCandsSql =
    s"""WITH ${MinHashLSH.duckdbSignatureCte},
       |${MinHashLSH.duckdbCandidateCte}
       |SELECT a_id, b_id, est_sim FROM cands""".stripMargin

  // ------------------------------------------------ dedup_ngram_jaccard
  // Exact word-3-gram Jaccard, verified only on LSH candidates (the
  // scale path: verification cost ∝ candidates). Threshold 0.5.
  private def ngramJaccard(s: SparkSession, d: String): DataFrame =
    // candidate generation + shingle-set verification both run inside
    // the shared materialized pair stage ([[graft.SharedStages]])
    graft.SharedStages.verifiedPairs(s, d)

  private def ngramJaccardSql =
    s"""WITH ${MinHashLSH.duckdbSignatureCte},
       |${MinHashLSH.duckdbCandidateCte},
       |verified AS (
       |  SELECT c.a_id, c.b_id,
       |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
       |      (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
       |  FROM cands c
       |  JOIN sigs a ON a.doc_id = c.a_id
       |  JOIN sigs b ON b.doc_id = c.b_id)
       |SELECT a_id, b_id, jaccard FROM verified WHERE jaccard >= 0.5""".stripMargin

  // ------------------------------------------------------- minhash_bbit
  // b-bit minwise hashing (Li & König, WWW'10): store only the LOWEST
  // bit of each minhash value — signature memory ÷ 64 vs full 64-bit
  // values — and recover Jaccard from the bit-match fraction M with the
  // estimator Ĵ = (M − C)/(1 − C), where C = 1/2^b is the random-
  // collision floor (b = 1 here: Ĵ = 2M − 1, clipped at 0). The report
  // scores every LSH candidate pair three ways — b-bit estimate, full-
  // signature estimate, exact shingle Jaccard — so the storage/accuracy
  // tradeoff is measured, not asserted. At 100 TB the b-bit sketch is
  // what a dedup index actually persists (1 bit × k per doc); banding
  // still runs on the full values before they are thrown away, exactly
  // the paper's deployment. All counts are exact integers; the three
  // divisions are the only IEEE steps, mirrored in the oracle.
  private def minhashBbit(s: SparkSession, d: String): DataFrame = {
    val k = MinHashLSH.NumHashes
    val sigs = graft.SharedStages.minhashSignatures(s, d)
    val a = sigs.select(col("doc_id").as("a_id"), col("sh").as("a_sh"),
      col("sig").as("a_sig"))
    val b = sigs.select(col("doc_id").as("b_id"), col("sh").as("b_sh"),
      col("sig").as("b_sig"))
    val matchTerms = (1 to k).map(i =>
      s"IF(element_at(a_sig, $i) % 2 = element_at(b_sig, $i) % 2, 1, 0)")
      .mkString(" + ")
    graft.SharedStages.candidatePairs(s, d)
      .join(a, "a_id").join(b, "b_id")
      .withColumn("n_match", expr(matchTerms).cast("long"))
      .withColumn("j_bbit", greatest(lit(0.0),
        (col("n_match") * 2 - k).cast("double") / k))
      .withColumn("inter",
        size(array_intersect(col("a_sh"), col("b_sh"))).cast("long"))
      .withColumn("j_exact", col("inter").cast("double") /
        ((size(col("a_sh")) + size(col("b_sh"))).cast("long") - col("inter")))
      .select(col("a_id"), col("b_id"), col("n_match"), col("j_bbit"),
        col("est_sim").as("j_minhash"), col("j_exact"))
  }

  private def minhashBbitSql = {
    val k = MinHashLSH.NumHashes
    val matchTerms = (1 to k).map(i =>
      s"CASE WHEN a.sig[$i] % 2 = b.sig[$i] % 2 THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH ${MinHashLSH.duckdbSignatureCte},
       |${MinHashLSH.duckdbCandidateCte},
       |scored AS (
       |  SELECT c.a_id, c.b_id, c.est_sim,
       |    CAST($matchTerms AS BIGINT) AS n_match,
       |    a.sh AS a_sh, b.sh AS b_sh
       |  FROM cands c
       |  JOIN sigs a ON a.doc_id = c.a_id
       |  JOIN sigs b ON b.doc_id = c.b_id)
       |SELECT a_id, b_id, n_match,
       |  greatest(CAST(0 AS DOUBLE),
       |    CAST(n_match * 2 - $k AS DOUBLE) / $k) AS j_bbit,
       |  est_sim AS j_minhash,
       |  CAST(len(list_intersect(a_sh, b_sh)) AS DOUBLE)
       |    / (len(a_sh) + len(b_sh) - len(list_intersect(a_sh, b_sh)))
       |    AS j_exact
       |FROM scored""".stripMargin
  }

  // --------------------------------------------------- dedup_components
  // Canonicalization: near-dup verified pairs → connected components →
  // (doc_id, canonical keeper = component min id). The step that turns
  // pairwise similarity into an actual dedup decision. Oracle is a
  // recursive-CTE transitive closure over the same pair graph.
  private def dedupComponents(s: SparkSession, d: String): DataFrame =
    // the min-label fixpoint over the shared verified-pair graph runs
    // once per session ([[graft.SharedStages.componentLabels]]) — this
    // report and dup_cluster_sizes both consume the same clustering
    graft.SharedStages.componentLabels(s, d)
      .select(col("id").as("doc_id"), col("root").as("canonical_id"))

  private def dedupComponentsSql =
    s"""WITH RECURSIVE ${MinHashLSH.duckdbSignatureCte},
       |${MinHashLSH.duckdbCandidateCte},
       |verified AS (
       |  SELECT c.a_id, c.b_id
       |  FROM cands c
       |  JOIN sigs a ON a.doc_id = c.a_id
       |  JOIN sigs b ON b.doc_id = c.b_id
       |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
       |    (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5),
       |edges AS (
       |  SELECT a_id AS src, b_id AS dst FROM verified
       |  UNION
       |  SELECT b_id, a_id FROM verified),
       |reach (id, r) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id)
       |SELECT id AS doc_id, MIN(r) AS canonical_id
       |FROM reach GROUP BY id""".stripMargin

  // --------------------------------------------------- components_star
  // The same canonicalization computed by the O(log n) scale path:
  // alternating large-star/small-star contraction over the identical
  // verified-pair graph. Deliberately bypasses the memoized label stage
  // so the contraction code itself is oracle-gated — the recursive-CTE
  // closure is independent evidence that contraction and propagation
  // agree on real near-dup graphs (DedupSpec covers the chain shapes
  // where only contraction survives).
  private def componentsStar(s: SparkSession, d: String): DataFrame =
    graft.dedup.Components.starLabel(
      graft.SharedStages.verifiedPairs(s, d), "a_id", "b_id")
      .select(col("id").as("doc_id"), col("root").as("canonical_id"))

  // -------------------------------------------------- dedup_containment
  // Asymmetric containment dedup: |A∩B| / min(|A|,|B|) over the shingle
  // sets of LSH candidate pairs. Catches the quote/boilerplate case
  // symmetric Jaccard misses — a short document embedded verbatim in a
  // long one has low Jaccard (the union is large) but containment ≈ 1.
  // Same scale shape as the Jaccard verify: candidates-only, shingle
  // HASH sets through the join (never strings), threshold 0.8.
  private val ContainMin = 0.8

  private def dedupContainment(s: SparkSession, d: String): DataFrame = {
    val sigs = graft.SharedStages.minhashSignatures(s, d)
    val cands = graft.SharedStages.candidatePairs(s, d)
      .select(col("a_id"), col("b_id"))
    val a = sigs.select(col("doc_id").as("a_id"), col("sh").as("a_sh"))
    val b = sigs.select(col("doc_id").as("b_id"), col("sh").as("b_sh"))
    cands.join(a, "a_id").join(b, "b_id")
      .withColumn("containment",
        size(array_intersect(col("a_sh"), col("b_sh"))).cast("double") /
          least(size(col("a_sh")), size(col("b_sh"))))
      .filter(col("containment") >= ContainMin)
      .select(col("a_id"), col("b_id"), col("containment"))
  }

  private def dedupContainmentSql =
    s"""WITH ${MinHashLSH.duckdbSignatureCte},
       |${MinHashLSH.duckdbCandidateCte}
       |SELECT a_id, b_id, containment FROM (
       |  SELECT c.a_id, c.b_id,
       |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |      / LEAST(len(a.sh), len(b.sh)) AS containment
       |  FROM cands c
       |  JOIN sigs a ON a.doc_id = c.a_id
       |  JOIN sigs b ON b.doc_id = c.b_id)
       |WHERE containment >= $ContainMin""".stripMargin

  // ---------------------------------------------------- dedup_keep_best
  // Quality-aware canonicalization: within each near-dup cluster the
  // keeper is the HIGHEST-QUALITY member (longest document, ties to
  // lowest id), not the minimum id — the keep-policy an actual curation
  // run applies once clustering is decided (min-id keeps whichever copy
  // was crawled first; quality-keep keeps the least-truncated one).
  // Composes the session-shared component labels with a two-phase
  // argmax (max-quality per cluster, then min-id among maximizers) —
  // relational on both engines, no struct aggregates. Cluster count and
  // membership are post-LSH tiny, so all three joins ride broadcasts at
  // scale.
  private def dedupKeepBest(s: SparkSession, d: String): DataFrame = {
    val lab = graft.SharedStages.componentLabels(s, d)
      .select(col("id").as("doc_id"), col("root"))
      .join(Tables.documents(s, d).select(col("doc_id"), col("n_chars")),
        "doc_id")
    val best = lab.groupBy(col("root")).agg(max(col("n_chars")).as("best_chars"))
    val keeper = lab.join(best, "root")
      .filter(col("n_chars") === col("best_chars"))
      .groupBy(col("root")).agg(min(col("doc_id")).as("keeper_id"))
    lab.join(keeper, "root")
      .select(col("doc_id"), col("keeper_id"),
        (col("doc_id") === col("keeper_id")).as("keep"))
  }

  private def dedupKeepBestSql =
    s"""WITH RECURSIVE ${MinHashLSH.duckdbSignatureCte},
       |${MinHashLSH.duckdbCandidateCte},
       |verified AS (
       |  SELECT c.a_id, c.b_id
       |  FROM cands c
       |  JOIN sigs a ON a.doc_id = c.a_id
       |  JOIN sigs b ON b.doc_id = c.b_id
       |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
       |    (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5),
       |edges AS (
       |  SELECT a_id AS src, b_id AS dst FROM verified
       |  UNION
       |  SELECT b_id, a_id FROM verified),
       |reach (id, r) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
       |labeled AS (
       |  SELECT id, MIN(r) AS root FROM reach GROUP BY id),
       |lab AS (
       |  SELECT l.id AS doc_id, l.root, d.n_chars
       |  FROM labeled l JOIN documents d ON d.doc_id = l.id),
       |best AS (
       |  SELECT root, MAX(n_chars) AS best_chars FROM lab GROUP BY 1),
       |keeper AS (
       |  SELECT lab.root, MIN(lab.doc_id) AS keeper_id
       |  FROM lab JOIN best
       |    ON lab.root = best.root AND lab.n_chars = best.best_chars
       |  GROUP BY 1)
       |SELECT lab.doc_id, keeper.keeper_id,
       |  lab.doc_id = keeper.keeper_id AS keep
       |FROM lab JOIN keeper ON lab.root = keeper.root""".stripMargin

  // --------------------------------------------------- fuzzy_name_match
  // Entity-resolution fuzzy match (PassJoin family, Li et al.): find
  // same-length name pairs within edit distance 1 WITHOUT an all-pairs
  // levenshtein — the data-cleaning primitive behind product/entity
  // dedup. Blocking is provably COMPLETE for same-length distance ≤ 1:
  // split every name at h = len div 2; one substitution sits in one
  // half, so the OTHER half matches exactly — every qualifying pair
  // shares a (len, left-half) or (len, right-half) block key. One
  // keyed exchange on the block key, candidates ∝ collisions, exact
  // levenshtein verify only on candidates. (Distance k generalizes to
  // k+1 segments — same shape, k+1 block rows per name.) Probe side:
  // the first 100 part keys, the knn_topk query-set discipline.
  private def fuzzyNameMatch(s: SparkSession, d: String): DataFrame = {
    val parts = Tables.part(s, d)
      .select(col("p_partkey").as("key"), col("p_name").as("name"))
      .withColumn("len", length(col("name")))
      .withColumn("lh", expr("substring(name, 1, len div 2)"))
      .withColumn("rh", expr("substring(name, len div 2 + 1)"))
    def blocks(df: DataFrame, p: String) = df
      .select(col("key").as(s"${p}_key"), col("name").as(s"${p}_name"),
        col("len"),
        explode(array(
          concat_ws("|", lit("L"), col("len"), col("lh")),
          concat_ws("|", lit("R"), col("len"), col("rh")))).as("blk"))
    blocks(parts.filter(col("key") < 100), "a")
      .join(blocks(parts, "b"), Seq("blk"))
      .filter(col("a_key") =!= col("b_key"))
      .select(col("a_key"), col("b_key"), col("a_name"), col("b_name"))
      .distinct() // a pair can share both halves (equal names)
      .withColumn("dist",
        levenshtein(col("a_name"), col("b_name")).cast("int"))
      .filter(col("dist") <= 1)
  }

  private val fuzzyNameMatchSql =
    """WITH p AS (
      |  SELECT p_partkey AS key, p_name AS name, len(p_name) AS l,
      |    substr(p_name, 1, len(p_name) // 2) AS lh,
      |    substr(p_name, len(p_name) // 2 + 1) AS rh
      |  FROM part),
      |blocks AS (
      |  SELECT key, name, concat_ws('|', 'L', l, lh) AS blk FROM p
      |  UNION ALL
      |  SELECT key, name, concat_ws('|', 'R', l, rh) AS blk FROM p),
      |cand AS (
      |  SELECT DISTINCT a.key AS a_key, b.key AS b_key,
      |    a.name AS a_name, b.name AS b_name
      |  FROM blocks a JOIN blocks b ON a.blk = b.blk AND a.key <> b.key
      |  WHERE a.key < 100)
      |SELECT a_key, b_key, a_name, b_name,
      |  CAST(levenshtein(a_name, b_name) AS INTEGER) AS dist
      |FROM cand
      |WHERE levenshtein(a_name, b_name) <= 1""".stripMargin

  // ------------------------------------------------------ dedup_simhash
  private def simhashQ(s: SparkSession, d: String): DataFrame =
    SimHash.simhash(Tables.documents(s, d), "doc_id", "text")

  private def simhashSql =
    s"""WITH ${SimHash.duckdbCte}
       |SELECT doc_id, simhash FROM sim""".stripMargin

  // ------------------------------------------------------ simhash_pairs
  // Banded Hamming-distance near-dup search over the SimHash
  // fingerprints (Manku/Jain/Sarma, WWW'07 — the production form of
  // dedup_simhash, which only emits fingerprints): the 64-bit simhash
  // splits into 4 disjoint 16-bit bands; by pigeonhole, any pair within
  // Hamming distance 3 agrees EXACTLY on at least one band, so the
  // band-bucket self-join is a LOSSLESS blocking for the ≤3 search.
  // Candidates come only from band collisions — never all-pairs — and
  // the verify step is one xor + bit_count per candidate. Plan: the
  // band expansion is map-only over the signature pass (4 rows per
  // doc); the join is keyed on (band, value); distinct collapses
  // multi-band collisions before the popcount filter. The 16-bit bands
  // are the 100 TB shape: 65 536 bucket values per band keeps candidate
  // fan-out at O(n²/65 536) per band vs the O(n²/256) the former
  // 32-bit/8-bit layout allowed; the blocking guarantee is the same
  // pigeonhole argument at any width.
  private val SimBands = graft.functions.BandLadder.Bands
  private val SimHammingMax = graft.functions.BandLadder.HammingMax
  private val SimTier16MaxN = graft.functions.BandLadder.Tier16MaxN
  // the cascade funnel's PINNED production width (see the rm3 note)
  private val SimBandBits = SimHash.Bits / SimBands
  private val SimBandMask = (1L << SimBandBits) - 1

  /** The banded pair builder behind [[graft.SharedStages.simhashPairs]]
    * — the registered query and the cascade funnel both read the
    * materialized stage. ADAPTIVE band width (the mm_phash_pairs
    * ladder, [[graft.functions.BandLadder]]): 64-bit fingerprint /
    * 16-bit bands while 4·C(n,2)/2^16 stays within the 4n budget
    * (n ≤ 2^17), the 128-bit [[SimHash.simhash128]] / 32-bit bands past
    * it — `simhash_width` is the oracle-gated decision. At the wide
    * tier Hamming ≤ 3 is measured over 128 bits (finer votes — the
    * documented semantic of the tier, mirrored exactly in the oracle). */
  private[graft] def buildSimhashPairs(s: SparkSession, d: String): DataFrame =
    buildSimhashPairsAt(s, d,
      graft.functions.BandLadder.bitsFor(Tables.documents(s, d).count()))

  private[graft] def buildSimhashPairsAt(s: SparkSession, d: String,
                                         bandBits: Int): DataFrame = {
    val docs = Tables.documents(s, d)
    val hashed =
      if (bandBits == 16)
        SimHash.simhash(docs, "doc_id", "text")
          .select(col("doc_id"), col("simhash").as("lo"), lit(0L).as("hi"))
      else SimHash.simhash128(docs, "doc_id", "text")
    val mask = (1L << bandBits) - 1
    val banded = hashed
      .withColumn("b", explode(expr(s"sequence(0, ${SimBands - 1})")))
      .withColumn("v",
        when(col("b") * bandBits < 64,
          expr(s"shiftright(lo, CAST(b * $bandBits AS INT)) & ${mask}L"))
        .otherwise(
          expr(s"shiftright(hi, CAST(b * $bandBits - 64 AS INT)) & ${mask}L")))
    val a = banded.select(col("b"), col("v"), col("doc_id").as("a_id"),
      col("lo").as("a_lo"), col("hi").as("a_hi"))
    val bs = banded.select(col("b"), col("v"), col("doc_id").as("b_id"),
      col("lo").as("b_lo"), col("hi").as("b_hi"))
    // verify BEFORE distinct: the popcount is one codegen'd op per
    // candidate row, and filtering at <=3 first shrinks the distinct's
    // exchange from every band collision to only true near-dup pairs
    a.join(bs, Seq("b", "v"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("hamming",
        expr("CAST(bit_count(a_lo ^ b_lo) + bit_count(a_hi ^ b_hi) AS INT)"))
      .filter(col("hamming") <= SimHammingMax)
      .select(col("a_id"), col("b_id"), col("hamming"))
      .distinct()
  }

  // Tier guards replicate BandLadder.bitsFor on the same COUNT(*);
  // exactly one fingerprint table is row-live under its guard.
  private def simhashPairsSql =
    s"""WITH nrow AS (SELECT COUNT(*) AS n FROM documents),
       |params AS (
       |  SELECT CASE WHEN n <= $SimTier16MaxN THEN 16 ELSE 32 END AS w
       |  FROM nrow),
       |${SimHash.duckdbCte},
       |${SimHash.duckdbCte128},
       |ph AS (
       |  SELECT doc_id, simhash AS lo, CAST(0 AS BIGINT) AS hi FROM sim
       |  WHERE (SELECT w FROM params) = 16
       |  UNION ALL
       |  SELECT doc_id, lo, hi FROM sim128
       |  WHERE (SELECT w FROM params) = 32),
       |banded AS (
       |  SELECT doc_id, lo, hi, CAST(u.b AS INTEGER) AS b,
       |    CASE WHEN u.b * p.w < 64
       |      THEN (lo >> CAST(u.b * p.w AS INTEGER))
       |        & ((CAST(1 AS BIGINT) << p.w) - 1)
       |      ELSE (hi >> CAST(u.b * p.w - 64 AS INTEGER))
       |        & ((CAST(1 AS BIGINT) << p.w) - 1) END AS v
       |  FROM ph, params p,
       |    LATERAL (SELECT unnest(range(0, $SimBands)) AS b) u),
       |cand AS (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       |    CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi))
       |      AS INTEGER) AS hamming
       |  FROM banded a JOIN banded b ON a.b = b.b AND a.v = b.v
       |    AND a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi))
       |    <= $SimHammingMax)
       |SELECT DISTINCT a_id, b_id, hamming FROM cand""".stripMargin

  // ------------------------------------------------------ simhash_width
  // The measure→act decision row for the simhash band ladder — same
  // shape as mm_phash_width (exact integer arithmetic off one
  // COUNT(*)); a drift in the threshold seam desyncs this oracle before
  // it can desync simhash_pairs.
  private def simhashWidth(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .agg(count(lit(1)).as("n_docs"))
      .select(col("n_docs"),
        expr(s"$SimBands * ((n_docs * (n_docs - 1)) DIV 2) DIV ${1L << 16}")
          .as("rand_cand_16"),
        expr(s"$SimBands * ((n_docs * (n_docs - 1)) DIV 2) DIV ${1L << 32}")
          .as("rand_cand_32"),
        expr(s"$SimBands * n_docs").as("cand_budget"),
        when(col("n_docs") <= SimTier16MaxN, 16).otherwise(32)
          .as("band_bits"))

  private val simhashWidthSql =
    s"""SELECT n_docs,
       |  CAST($SimBands * ((n_docs * (n_docs - 1)) // 2) // ${1L << 16}
       |    AS BIGINT) AS rand_cand_16,
       |  CAST($SimBands * ((n_docs * (n_docs - 1)) // 2) // ${1L << 32}
       |    AS BIGINT) AS rand_cand_32,
       |  CAST($SimBands * n_docs AS BIGINT) AS cand_budget,
       |  CASE WHEN n_docs <= $SimTier16MaxN THEN 16 ELSE 32 END AS band_bits
       |FROM (SELECT COUNT(*) AS n_docs FROM documents)""".stripMargin

  // -------------------------------------------------------- chunk_dedup
  // C4/CCNet-style passage-level dedup — the removal step between
  // whole-document hashing (dedup_exact) and window counting
  // (substr_dup): each document splits into non-overlapping 32-token
  // chunks; a chunk whose content fingerprint already occurred earlier
  // in the corpus (keep-first: lowest (doc_id, chunk_idx) wins) is
  // dropped, and the report prices what survives per document. This is
  // the operator that strips repeated boilerplate passages from
  // otherwise-distinct pages. Plan: the chunk expansion is map-only
  // (sequence explode + slice, no window over token rows); the ONLY
  // data-sized exchanges are the fp-keyed rank and the doc-keyed
  // rollup, and both ship (digest, doc_id, chunk_idx) triples — never
  // document text. At 100 TB the fp exchange carries ~24 bytes per
  // chunk, and the keep-first window is a bounded per-group rank over
  // true collisions only.
  private val ChunkC = 32

  private def chunkDedup(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val chunks = Tables.parallelize(Tables.documents(s, d))
      .withColumn("toks", TextFunctions.tokens(col("text")))
      .withColumn("n_tok", size(col("toks")).cast("long"))
      .filter(col("n_tok") > 0)
      .withColumn("n_chunks", expr(s"(n_tok + ${ChunkC - 1}) DIV $ChunkC"))
      .withColumn("chunk_idx", explode(expr("sequence(0L, n_chunks - 1)")))
      .withColumn("fp", md5(concat_ws(" ",
        expr(s"slice(toks, CAST(chunk_idx * $ChunkC + 1 AS INT), $ChunkC)"))))
      .select(col("doc_id"), col("chunk_idx"), col("n_chunks"), col("fp"))
    val w = Window.partitionBy(col("fp"))
      .orderBy(col("doc_id"), col("chunk_idx"))
    chunks.withColumn("rn", row_number().over(w))
      .groupBy(col("doc_id"))
      .agg(max(col("n_chunks")).as("n_chunks"),
        count(when(col("rn") === 1, lit(1))).as("kept_chunks"))
      .withColumn("retained",
        col("kept_chunks").cast("double") / col("n_chunks").cast("double"))
  }

  private def chunkDedupSql = {
    val toks = TextFunctions.tokensSql("text")
    s"""WITH t AS (
       |  SELECT doc_id, $toks AS toks FROM documents),
       |c AS (
       |  SELECT doc_id, toks,
       |    CAST((len(toks) + ${ChunkC - 1}) // $ChunkC AS BIGINT) AS n_chunks
       |  FROM t WHERE len(toks) > 0),
       |x AS (
       |  SELECT doc_id, toks, n_chunks, CAST(u.i AS BIGINT) AS chunk_idx
       |  FROM c, LATERAL (SELECT unnest(range(0, n_chunks)) AS i) u),
       |y AS (
       |  SELECT doc_id, chunk_idx, n_chunks,
       |    md5(array_to_string(
       |      toks[CAST(chunk_idx * $ChunkC + 1 AS INT)
       |           : CAST(chunk_idx * $ChunkC + $ChunkC AS INT)], ' ')) AS fp
       |  FROM x),
       |r AS (
       |  SELECT doc_id, n_chunks,
       |    ROW_NUMBER() OVER (PARTITION BY fp
       |                       ORDER BY doc_id, chunk_idx) AS rn
       |  FROM y)
       |SELECT doc_id, MAX(n_chunks) AS n_chunks,
       |  COUNT(CASE WHEN rn = 1 THEN 1 END) AS kept_chunks,
       |  CAST(COUNT(CASE WHEN rn = 1 THEN 1 END) AS DOUBLE)
       |    / CAST(MAX(n_chunks) AS DOUBLE) AS retained
       |FROM r GROUP BY 1""".stripMargin
  }

  // ----------------------------------------------------------- cdc_dedup
  // Content-defined chunking dedup — the variable-boundary twin of
  // chunk_dedup. Fixed 32-token chunks miss a duplicated passage the
  // moment one token is inserted upstream of it (every later boundary
  // shifts); CDC (Muthitacharoen et al., LBFS, SOSP'01 — the rsync/
  // backup-dedup trick applied to corpus text) instead opens a new
  // chunk wherever the ROLLING CONTENT HASH of a w-token window hits
  // 0 mod D, so boundaries re-synchronize right after any edit and
  // shared passages fingerprint identically regardless of their offset
  // in the document. w = 4, D = 8 → expected chunk ≈ 8 tokens.
  // Plan: the gram pass is the shared zero-shuffle slice/arrays_zip
  // builder; chunk assignment is ONE doc-keyed window (running count
  // of boundary grams); the chunk rebuild reuses that same doc_id
  // clustering (groupBy on a superset of the partitioning keys adds no
  // exchange); then the keep-first rank and per-doc rollup ship
  // (digest, doc_id, chunk_idx) triples exactly like chunk_dedup —
  // document text never crosses a fp-keyed exchange. Trailing w−1
  // tokens of each doc have no gram row and stay outside chunk text
  // (documented, mirrored in the oracle); docs under w tokens are out
  // of scope of the report on both engines.
  private val CdcW = 4 // rolling-window width (tokens)
  private val CdcD = 8 // boundary divisor: P(boundary) = 1/D

  private def cdcDedup(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grams = TextFunctions
      .ngramRowsPos(Tables.parallelize(Tables.documents(s, d)),
        "doc_id", "text", CdcW)
      .select(col("doc_id"), col("pos"), col("n"),
        element_at(split(col("s"), " "), 1).as("tok"),
        when(TextFunctions.portableHash(concat(lit("cdc"), col("s"))) % CdcD === 0
          && col("pos") > 1, 1L).otherwise(0L).as("bnd"))
    val wChunk = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val chunks = grams
      .withColumn("chunk_idx", sum(col("bnd")).over(wChunk))
      .groupBy(col("doc_id"), col("chunk_idx"))
      .agg(max(col("n")).as("n_grams"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          e => e.getField("tok")), " ")).as("fp"))
    val wKeep = Window.partitionBy(col("fp"))
      .orderBy(col("doc_id"), col("chunk_idx"))
    chunks.withColumn("rn", row_number().over(wKeep))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        count(when(col("rn") === 1, lit(1))).as("kept_chunks"),
        max(col("n_grams")).as("n_grams"))
      .withColumn("retained",
        col("kept_chunks").cast("double") / col("n_chunks").cast("double"))
  }

  private def cdcDedupSql = {
    val toks = TextFunctions.tokensSql("text")
    val sh = TextFunctions.shinglesSql("toks", CdcW)
    val h = TextFunctions.portableHashSql("concat('cdc', CAST(u.g[2] AS VARCHAR))")
    s"""WITH tok AS (
       |  SELECT doc_id, $toks AS toks FROM documents),
       |shl AS (
       |  SELECT doc_id, $sh AS sh FROM tok),
       |grams AS (
       |  SELECT doc_id, CAST(u.g[1] AS BIGINT) AS pos, len(sh) AS n,
       |    string_split(CAST(u.g[2] AS VARCHAR), ' ')[1] AS tok,
       |    CASE WHEN $h % $CdcD = 0 AND CAST(u.g[1] AS BIGINT) > 1
       |         THEN 1 ELSE 0 END AS bnd
       |  FROM shl, unnest(list_zip(range(1, len(sh) + 1), sh)) AS u(g)
       |  WHERE len(sh) > 0),
       |asg AS (
       |  SELECT doc_id, pos, n, tok,
       |    CAST(SUM(bnd) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS chunk_idx
       |  FROM grams),
       |chunks AS (
       |  SELECT doc_id, chunk_idx, MAX(n) AS n_grams,
       |    md5(string_agg(tok, ' ' ORDER BY pos)) AS fp
       |  FROM asg GROUP BY 1, 2),
       |r AS (
       |  SELECT doc_id, chunk_idx, n_grams,
       |    ROW_NUMBER() OVER (PARTITION BY fp
       |                       ORDER BY doc_id, chunk_idx) AS rn
       |  FROM chunks)
       |SELECT doc_id, COUNT(*) AS n_chunks,
       |  COUNT(CASE WHEN rn = 1 THEN 1 END) AS kept_chunks,
       |  MAX(n_grams) AS n_grams,
       |  CAST(COUNT(CASE WHEN rn = 1 THEN 1 END) AS DOUBLE)
       |    / CAST(COUNT(*) AS DOUBLE) AS retained
       |FROM r GROUP BY 1""".stripMargin
  }

  // ---------------------------------------------------------- lsh_recall
  // LSH banding-parameter frontier — the lexical twin of ann_frontier:
  // re-band the SAME 16-hash MinHash signature at (bands, rows/band) ∈
  // {(2,8), (4,4), (8,2)} and report candidate volume, recall and
  // precision against exact-Jaccard ground truth (threshold 0.5, the
  // family's canonical cut). More bands of shorter rows = more
  // candidates = higher recall / lower precision — this report is how
  // b×r gets chosen BEFORE a 100 TB run, from a cheap sample.
  // Cost discipline: ground truth needs all-pairs exact Jaccard, so it
  // is SAMPLE-BOUNDED — doc_id < 200 gives ≤19 900 pairs whatever the
  // corpus size (estimation error shrinks with sample size, not corpus
  // size), and signatures come from the shared memoized pass. All six
  // per-config counters compute in ONE projection over one bounded
  // nested-loop pair join; the single agg row explodes into the three
  // config rows — one job, no per-config rescans.
  private val LshSampleMax = 200L
  private val LshConfigs = Seq((2, 8), (4, 4), (8, 2)) // (bands, rows/band)

  /** Band-collision predicate over a_sig/b_sig for a (bands, rows)
    * re-banding of the 16-position signature; `elem` renders one
    * signature element access (engine-specific syntax). */
  private def lshCandSql(bands: Int, rows: Int,
                         elem: (String, Int) => String): String =
    (0 until bands).map { b =>
      (1 to rows).map { r =>
        val i = b * rows + r
        s"${elem("a_sig", i)} = ${elem("b_sig", i)}"
      }.mkString("(", " AND ", ")")
    }.mkString(" OR ")

  private def lshRecall(s: SparkSession, d: String): DataFrame = {
    val sample = graft.SharedStages.minhashSignatures(s, d)
      .filter(col("doc_id") < LshSampleMax)
    val a = sample.select(col("doc_id").as("a_id"), col("sh").as("a_sh"),
      col("sig").as("a_sig"))
    val b = sample.select(col("doc_id").as("b_id"), col("sh").as("b_sh"),
      col("sig").as("b_sig"))
    def cand(bands: Int, rows: Int) =
      expr(lshCandSql(bands, rows, (c, i) => s"element_at($c, $i)"))
    val pairs = a.join(b, col("a_id") < col("b_id"))
      .withColumn("inter",
        size(array_intersect(col("a_sh"), col("b_sh"))).cast("long"))
      .withColumn("uni",
        (size(col("a_sh")) + size(col("b_sh"))).cast("long") - col("inter"))
      .withColumn("is_true", col("inter").cast("double") / col("uni") >= 0.5)
    val cfgAggs = LshConfigs.zipWithIndex.flatMap { case ((nb, nr), i) =>
      Seq(sum(when(cand(nb, nr), 1L).otherwise(0L)).as(s"nc_$i"),
        sum(when(cand(nb, nr) && col("is_true"), 1L).otherwise(0L)).as(s"ng_$i"))
    }
    val totals = pairs.agg(
      sum(when(col("is_true"), 1L).otherwise(0L)).as("n_truth"), cfgAggs: _*)
    val cfgRows = LshConfigs.zipWithIndex.map { case ((nb, nr), i) =>
      struct(lit(nb).as("bands"), lit(nr).as("rows_per_band"),
        col("n_truth"), col(s"nc_$i").as("n_cands"),
        col(s"ng_$i").as("n_caught"))
    }
    totals.select(explode(array(cfgRows: _*)).as("cfg"))
      .select(col("cfg.*"))
      .withColumn("recall",
        when(col("n_truth") === 0, lit(null).cast("double"))
          .otherwise(col("n_caught").cast("double") / col("n_truth")))
      .withColumn("prec",
        when(col("n_cands") === 0, lit(null).cast("double"))
          .otherwise(col("n_caught").cast("double") / col("n_cands")))
  }

  private def lshRecallSql = {
    def cfgCols(i: Int, nb: Int, nr: Int) = {
      val c = lshCandSql(nb, nr, (col, j) => s"$col[$j]")
      s"""    CAST(SUM(CASE WHEN $c THEN 1 ELSE 0 END) AS BIGINT) AS nc_$i,
         |    CAST(SUM(CASE WHEN ($c) AND is_true THEN 1 ELSE 0 END) AS BIGINT) AS ng_$i""".stripMargin
    }
    val aggCols = LshConfigs.zipWithIndex
      .map { case ((nb, nr), i) => cfgCols(i, nb, nr) }.mkString(",\n")
    val cfgSelects = LshConfigs.zipWithIndex.map { case ((nb, nr), i) =>
      s"""SELECT $nb AS bands, $nr AS rows_per_band, n_truth,
         |  nc_$i AS n_cands, ng_$i AS n_caught,
         |  CASE WHEN n_truth = 0 THEN NULL
         |       ELSE CAST(ng_$i AS DOUBLE) / n_truth END AS recall,
         |  CASE WHEN nc_$i = 0 THEN NULL
         |       ELSE CAST(ng_$i AS DOUBLE) / nc_$i END AS prec
         |FROM agg""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH ${MinHashLSH.duckdbSignatureCte},
       |samp AS (
       |  SELECT doc_id, sh, sig FROM sigs WHERE doc_id < $LshSampleMax),
       |pairs AS (
       |  SELECT a.sig AS a_sig, b.sig AS b_sig,
       |    (CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
       |     (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))))
       |      >= 0.5 AS is_true
       |  FROM samp a JOIN samp b ON a.doc_id < b.doc_id),
       |agg AS (
       |  SELECT
       |    CAST(SUM(CASE WHEN is_true THEN 1 ELSE 0 END) AS BIGINT) AS n_truth,
       |$aggCols
       |  FROM pairs)
       |$cfgSelects""".stripMargin
  }

  // ------------------------------------------------------ dedup_funnel
  // The PRODUCTION cascade: exact hash → MinHash-verified Jaccard →
  // SimHash Hamming, each stage applied only to the previous stage's
  // survivors — cheapest-first ordering is how web-scale pipelines
  // (C4/RefinedWeb-era) actually sequence dedup, because every doc the
  // exact stage removes never pays the shingle pass. Removal rule per
  // near-dup stage: a doc is removed iff it has ANY smaller-id
  // surviving partner (the deterministic keep-first greedy; documented
  // non-transitive — a chain c<a<b removes both a and b). Per-source
  // funnel report; all three pair sets come from the SHARED memoized
  // stages, so the funnel prices only the joins. Scale shape: one
  // fp-keyed window for the exact stage, id-keyed semi-joins for the
  // two pair stages — candidates ∝ collisions, never n².
  private def dedupFunnel(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.parallelize(Tables.documents(s, d))
      .select(col("doc_id"), col("source"), col("text"))
    val ex = docs
      .withColumn("fp", md5(lower(trim(col("text")))))
      .withColumn("keep_id", min(col("doc_id")).over(Window.partitionBy(col("fp"))))
      .withColumn("rm_exact", (col("doc_id") =!= col("keep_id")).cast("long"))
      .select(col("doc_id"), col("source"), col("rm_exact"))
    val s1 = ex.filter(col("rm_exact") === 0).select(col("doc_id"))
    val rm2 = graft.SharedStages.verifiedPairs(s, d)
      .join(s1.withColumnRenamed("doc_id", "a_id"), "a_id")
      .join(s1.withColumnRenamed("doc_id", "b_id"), "b_id")
      .select(col("b_id").as("doc_id")).distinct()
    val s2 = s1.join(rm2, Seq("doc_id"), "left_anti")
    // the cascade's simhash stage runs the PINNED 16-bit production
    // width (its streaming twin StreamingCuration fixes the width in
    // the standing band stores' layout; the funnel oracle mirrors 16);
    // the standalone simhash_pairs report is the BandLadder-gated one
    val rm3 = graft.SharedStages.simhashPairsAt(s, d, 16)
      .join(s2.withColumnRenamed("doc_id", "a_id"), "a_id")
      .join(s2.withColumnRenamed("doc_id", "b_id"), "b_id")
      .select(col("b_id").as("doc_id")).distinct()
    ex.join(rm2.withColumn("rm_minhash", lit(1L)), Seq("doc_id"), "left")
      .join(rm3.withColumn("rm_simhash", lit(1L)), Seq("doc_id"), "left")
      .na.fill(0L, Seq("rm_minhash", "rm_simhash"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("rm_exact")).as("rm_exact"),
        sum(col("rm_minhash")).as("rm_minhash"),
        sum(col("rm_simhash")).as("rm_simhash"),
        sum(when(col("rm_exact") === 0 && col("rm_minhash") === 0 &&
          col("rm_simhash") === 0, 1L).otherwise(0L)).as("survivors"))
  }

  /** The funnel stage chain ex -> rm3 over a caller-provided `fps`
    * CTE (the signature/candidate/simhash CTEs cover ALL docs, but
    * every pair stage joins s1/s2 on both ends, so extra signatures of
    * docs the fps gate excluded can never affect the result) — shared
    * by dedup_funnel and funnel_quality. */
  private def funnelStageCtes: String =
    s"""ex AS (
       |  SELECT doc_id, source,
       |    CASE WHEN doc_id <> MIN(doc_id) OVER (PARTITION BY fp)
       |    THEN 1 ELSE 0 END AS rm_exact
       |  FROM fps),
       |s1 AS (SELECT doc_id FROM ex WHERE rm_exact = 0),
       |verified AS (
       |  SELECT c.a_id, c.b_id
       |  FROM cands c
       |  JOIN sigs a ON a.doc_id = c.a_id
       |  JOIN sigs b ON b.doc_id = c.b_id
       |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
       |    (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
       |      >= CAST(0.5 AS DOUBLE)),
       |rm2 AS (
       |  SELECT DISTINCT v.b_id AS doc_id
       |  FROM verified v
       |  JOIN s1 a ON a.doc_id = v.a_id
       |  JOIN s1 b ON b.doc_id = v.b_id),
       |s2 AS (
       |  SELECT doc_id FROM s1
       |  WHERE doc_id NOT IN (SELECT doc_id FROM rm2)),
       |sbanded AS (
       |  SELECT doc_id, simhash, CAST(u.b AS INTEGER) AS b,
       |    (simhash >> CAST(u.b * $SimBandBits AS INTEGER)) & $SimBandMask AS v
       |  FROM sim, LATERAL (SELECT unnest(range(0, $SimBands)) AS b) u),
       |spairs AS (
       |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM sbanded a JOIN sbanded b ON a.b = b.b AND a.v = b.v
       |    AND a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.simhash, b.simhash)) <= $SimHammingMax),
       |rm3 AS (
       |  SELECT DISTINCT p.b_id AS doc_id
       |  FROM spairs p
       |  JOIN s2 a ON a.doc_id = p.a_id
       |  JOIN s2 b ON b.doc_id = p.b_id)""".stripMargin

  private def dedupFunnelSql =
    s"""WITH ${MinHashLSH.duckdbSignatureCte},
       |${MinHashLSH.duckdbCandidateCte},
       |${SimHash.duckdbCte},
       |fps AS (
       |  SELECT doc_id, source, md5(lower(trim(text))) AS fp FROM documents),
       |$funnelStageCtes
       |SELECT e.source, COUNT(*) AS n_docs,
       |  CAST(SUM(e.rm_exact) AS BIGINT) AS rm_exact,
       |  CAST(SUM(CASE WHEN m.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS rm_minhash,
       |  CAST(SUM(CASE WHEN h.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS rm_simhash,
       |  CAST(SUM(CASE WHEN e.rm_exact = 0 AND m.doc_id IS NULL
       |    AND h.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS survivors
       |FROM ex e
       |LEFT JOIN rm2 m ON m.doc_id = e.doc_id
       |LEFT JOIN rm3 h ON h.doc_id = e.doc_id
       |GROUP BY 1""".stripMargin

  // ---------------------------------------------------- funnel_quality
  // The FULL curation cascade with the stage-0 quality gate in front
  // (quality → exact → MinHash-verified → SimHash, cheapest-first) —
  // the batch twin of the composed streaming ingest funnel
  // ([[graft.streaming.StreamingCuration]]; its spec already pins
  // streaming ≡ this computation), now oracle-gated as a registered
  // report. The Spark side IS flagBatch against fresh stores (one
  // batch = the whole corpus = the pure batch funnel), so the oracle
  // gate certifies the exact code path the streaming deployment runs.
  // Quality-failed docs never enter the dedup stages (their duplicates
  // survive on their behalf — the cheapest-first contract).
  private val FunnelMinTokens = 8

  private def funnelQuality(s: SparkSession, d: String): DataFrame = {
    val root = graft.SharedStages.newScratchDir("funnelq")
    try {
      // advance = false: the one-shot batch funnel discards the scratch
      // stores, so the flags (checkpointed before any store write) are
      // computed without paying four store builds; the store-advance
      // path itself is pinned by StreamingCurationSpec's multi-batch
      // streaming ≡ batch equivalence
      val flags = graft.streaming.StreamingCuration.flagBatch(
        Tables.parallelize(Tables.documents(s, d))
          .select(col("doc_id"), col("source"), col("text")),
        root, minTokens = FunnelMinTokens, advance = false)
      // flags are localCheckpointed inside flagBatch, so the scratch
      // stores can be dropped as soon as it returns
      graft.streaming.StreamingCuration.funnelCounts(flags)
    } finally graft.SharedStages.discardScratch(root)
  }

  private def funnelQualitySql = {
    val toks = graft.text.TextFunctions.tokensSql("text")
    s"""WITH ${MinHashLSH.duckdbSignatureCte},
       |${MinHashLSH.duckdbCandidateCte},
       |${SimHash.duckdbCte},
       |qual AS (
       |  SELECT doc_id, source,
       |    CASE WHEN len($toks) < $FunnelMinTokens THEN 1 ELSE 0 END
       |      AS rm_quality
       |  FROM documents),
       |fps AS (
       |  SELECT d.doc_id, d.source, md5(lower(trim(d.text))) AS fp
       |  FROM documents d
       |  JOIN qual q ON q.doc_id = d.doc_id AND q.rm_quality = 0),
       |$funnelStageCtes
       |SELECT q.source, COUNT(*) AS n_docs,
       |  CAST(SUM(q.rm_quality) AS BIGINT) AS rm_quality,
       |  CAST(SUM(COALESCE(e.rm_exact, 0)) AS BIGINT) AS rm_exact,
       |  CAST(SUM(CASE WHEN m.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS rm_minhash,
       |  CAST(SUM(CASE WHEN h.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS rm_simhash,
       |  CAST(SUM(CASE WHEN q.rm_quality = 0 AND e.rm_exact = 0
       |    AND m.doc_id IS NULL AND h.doc_id IS NULL THEN 1 ELSE 0 END)
       |    AS BIGINT) AS survivors
       |FROM qual q
       |LEFT JOIN ex e ON e.doc_id = q.doc_id
       |LEFT JOIN rm2 m ON m.doc_id = q.doc_id
       |LEFT JOIN rm3 h ON h.doc_id = q.doc_id
       |GROUP BY 1""".stripMargin
  }

  // ------------------------------------------------- dup_quality_matrix
  // Quality-quartile × duplication-status counts — the "are duplicates
  // concentrated in low-quality content" diagnostic that decides
  // whether dedup and quality filtering are redundant or complementary
  // gates. Quartiles come from n_chars VALUE cuts (min/max driver
  // scalars — the vocab_growth discipline, no global NTILE sort);
  // duplication status is membership in any verified near-dup pair
  // (the SHARED MinHash-verified edge set). Output ≤ 8 rows at any
  // corpus size.
  private def dupQualityMatrix(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.parallelize(Tables.documents(s, d))
      .select(col("doc_id"), col("n_chars"))
    val b = docs.agg(min(col("n_chars")), max(col("n_chars"))).head()
    val (lo, hi) = (b.getLong(0), b.getLong(1))
    val pairs = graft.SharedStages.verifiedPairs(s, d)
    val dupIds = pairs.select(col("a_id").as("doc_id"))
      .union(pairs.select(col("b_id").as("doc_id"))).distinct()
    docs.join(dupIds.withColumn("is_dup", lit(1L)), Seq("doc_id"), "left")
      .na.fill(0L, Seq("is_dup"))
      .withColumn("qbin",
        expr(s"((n_chars - $lo) * 4) DIV ${hi - lo + 1}"))
      .groupBy(col("qbin"), col("is_dup"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"))
  }

  private def dupQualityMatrixSql =
    s"""WITH ${MinHashLSH.duckdbSignatureCte},
       |${MinHashLSH.duckdbCandidateCte},
       |verified AS (
       |  SELECT c.a_id, c.b_id
       |  FROM cands c
       |  JOIN sigs a ON a.doc_id = c.a_id
       |  JOIN sigs b ON b.doc_id = c.b_id
       |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
       |    (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
       |      >= CAST(0.5 AS DOUBLE)),
       |dup AS (
       |  SELECT DISTINCT doc_id FROM (
       |    SELECT a_id AS doc_id FROM verified
       |    UNION ALL
       |    SELECT b_id AS doc_id FROM verified)),
       |bd AS (SELECT MIN(n_chars) AS lo, MAX(n_chars) AS hi FROM documents)
       |SELECT CAST((d.n_chars - bd.lo) * 4 // (bd.hi - bd.lo + 1) AS BIGINT)
       |    AS qbin,
       |  CASE WHEN p.doc_id IS NOT NULL THEN CAST(1 AS BIGINT)
       |       ELSE CAST(0 AS BIGINT) END AS is_dup,
       |  COUNT(*) AS n_docs,
       |  CAST(SUM(d.n_chars) AS BIGINT) AS sum_chars
       |FROM documents d
       |CROSS JOIN bd
       |LEFT JOIN dup p ON p.doc_id = d.doc_id
       |GROUP BY 1, 2""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("dedup_exact", dedupExact, Some(dedupExactSql)),
    QueryDef("dedup_funnel", dedupFunnel, Some(dedupFunnelSql)),
    QueryDef("funnel_quality", funnelQuality, Some(funnelQualitySql)),
    QueryDef("dup_quality_matrix", dupQualityMatrix, Some(dupQualityMatrixSql)),
    QueryDef("dedup_prefix", dedupPrefix, Some(dedupPrefixSql)),
    QueryDef("dedup_minhash_lsh", minhashCands, Some(minhashCandsSql)),
    QueryDef("minhash_bbit", minhashBbit, Some(minhashBbitSql)),
    QueryDef("dedup_ngram_jaccard", ngramJaccard, Some(ngramJaccardSql)),
    QueryDef("dedup_components", dedupComponents, Some(dedupComponentsSql)),
    QueryDef("components_star", componentsStar, Some(dedupComponentsSql)),
    QueryDef("dedup_keep_best", dedupKeepBest, Some(dedupKeepBestSql)),
    QueryDef("dedup_containment", dedupContainment, Some(dedupContainmentSql)),
    QueryDef("dedup_simhash", simhashQ, Some(simhashSql)),
    QueryDef("fuzzy_name_match", fuzzyNameMatch, Some(fuzzyNameMatchSql)),
    QueryDef("chunk_dedup", chunkDedup, Some(chunkDedupSql)),
    QueryDef("simhash_pairs",
      (s, d) => graft.SharedStages.simhashPairs(s, d), Some(simhashPairsSql)),
    QueryDef("simhash_width", simhashWidth, Some(simhashWidthSql)),
    QueryDef("cdc_dedup", cdcDedup, Some(cdcDedupSql)),
    QueryDef("lsh_recall", lshRecall, Some(lshRecallSql)))
}
