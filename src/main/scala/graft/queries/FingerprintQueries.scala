package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.TextFunctions._

/** Document fingerprinting + repetition analysis + term weighting over
  * `documents` — the remaining text-curation operators from SURVEY §7.5
  * (rolling-hash fingerprinting, Gopher-style repetition filters,
  * TF-IDF term extraction). All hashing is the portable md5 scheme so
  * every query has a bit-exact DuckDB mirror.
  *
  * Scale shapes:
  *  - fingerprints: map + one doc-keyed window shuffle + one
  *    fingerprint-keyed join, candidates ∝ shared-fingerprint
  *    collisions (df-capped) — never all-pairs;
  *  - repetition: two doc-keyed aggregations (the second reuses the
  *    first's partitioning);
  *  - tf-idf: two keyed aggregations + a broadcast scalar, top-k via
  *    the custom TopKPerKey physical operator (no per-doc sort).
  */
object FingerprintQueries {

  /** Shared n-gram rows: (doc_id, s) one row per n-gram occurrence —
    * the zero-shuffle slice/arrays_zip builder
    * ([[graft.text.TextFunctions.ngramRows]]; replaced the posexplode +
    * `lead`-window form, which shuffled and sorted every token row). */
  private def ngramRows(docs: DataFrame, n: Int): DataFrame =
    graft.text.TextFunctions.ngramRows(
      Tables.parallelize(docs), "doc_id", "text", n)

  // ------------------------------------------------------ doc_fingerprint
  // Mod-p selection over rolling k-gram hashes (Manber's approximate
  // fingerprints / MOSS-family): keep the k-grams whose portable hash
  // ≡ 0 (mod SelP) as the document's fingerprints, then report document
  // pairs sharing ≥ MinShared fingerprints. Deterministic on any
  // engine/partitioning (selection is a pure function of content), and
  // the candidate join is keyed by fingerprint with a document-frequency
  // cap — ubiquitous boilerplate fingerprints (df > MaxDf) are dropped
  // exactly like LSH stop-buckets, so no fingerprint fans out
  // quadratically.
  private val FpN = 3
  private val SelP = 4
  private val MinShared = 2
  private val MaxDf = 50

  private def docFingerprint(s: SparkSession, d: String): DataFrame = {
    // Bucket-explode shape, not a self-join: collect each fingerprint's
    // doc set in ONE aggregation (collect_set dedups per-doc repeats,
    // the df cap bounds every set at MaxDf), then two generators expand
    // ordered pairs. The n-gram + md5 pipeline runs exactly once — the
    // equivalent fps-join-fps form re-executes it for every plan branch
    // (measured 3.0 s → this form 2 shuffles total).
    val buckets = ngramRows(Tables.documents(s, d), FpN)
      .select(col("doc_id"), portableHash(col("s")).as("h"))
      .filter(pmod(col("h"), lit(SelP)) === 0)
      .groupBy(col("h")).agg(collect_set(col("doc_id")).as("ids"))
      .filter(size(col("ids")).between(2, MaxDf))
    buckets.select(explode(col("ids")).as("a_id"), col("ids"))
      .select(col("a_id"), explode(col("ids")).as("b_id"))
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= MinShared)
  }

  private val docFingerprintSql = {
    val toks = tokensSql("text")
    val sh = shinglesSql("toks", FpN)
    s"""WITH tok AS (
       |  SELECT doc_id, $toks AS toks FROM documents),
       |grams AS (
       |  SELECT doc_id, unnest($sh) AS s FROM tok),
       |fp AS (
       |  SELECT DISTINCT doc_id, ${portableHashSql("s")} AS h FROM grams
       |  WHERE ${portableHashSql("s")} % $SelP = 0),
       |kept AS (
       |  SELECT doc_id, h FROM fp
       |  WHERE h IN (SELECT h FROM fp GROUP BY h
       |              HAVING COUNT(*) BETWEEN 2 AND $MaxDf))
       |SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_shared
       |FROM kept a JOIN kept b ON a.h = b.h AND a.doc_id < b.doc_id
       |GROUP BY 1, 2
       |HAVING COUNT(*) >= $MinShared""".stripMargin
  }

  // ----------------------------------------------------------- substr_dup
  // Per-document duplicated-substring ratio (the decision report of
  // exact-substring dedup à la "Deduplicating Training Data Makes
  // Language Models Better": memorization risk comes from long token
  // spans shared across documents, which whole-doc Jaccard misses).
  // Every 8-token window (stride 1) is hashed; a window occurrence is
  // "duplicated" if its hash occurs in ≥ 2 DISTINCT documents; the doc
  // report is the duplicated fraction + a keep gate. Shapes: one gram
  // pass, ONE explicit hash-keyed exchange that the (h, doc) pre-agg
  // AND the per-hash distinct-doc window both reuse (partitioning by h
  // clusters (h, doc) — the rep_ngram discipline), then one doc-keyed
  // rollup. Never a self-join on the occurrence stream. At 100 TB the
  // production twin replaces the stride-1 hash set with a suffix-array
  // pass per shard; the report contract (duplicated-window fraction) is
  // identical.
  private val SubW = 8
  private val SubDupMax = 0.5

  /** The stride-1 window-hash position table (doc_id, pos, h) at the
    * substring-dedup width — the corpus gram+md5 pass shared by
    * substr_scrub (position-level excision) and substr_dup_gram (whose
    * per-(h, doc) occurrence counts are a rollup of the same rows),
    * via [[graft.SharedStages.subWinPos]]. h-keyed so every consumer's
    * h-clustered window/aggregation reuses the one exchange. */
  private[graft] def buildSubWinPos(s: SparkSession, d: String): DataFrame =
    graft.text.TextFunctions
      .ngramRowsPos(Tables.parallelize(Tables.documents(s, d)),
        "doc_id", "text", SubW)
      .select(col("doc_id"), col("pos"), portableHash(col("s")).as("h"))
      .repartition(col("h"))

  private def substrDup(s: SparkSession, d: String): DataFrame = {
    // occurrence counts are a rollup of the shared position table —
    // one row per window occurrence either way, so the per-(h, doc)
    // counts are identical to hashing the position-free gram stream
    val occ = graft.SharedStages.subWinPos(s, d)
      .select(col("doc_id"), col("h"))
      .groupBy(col("h"), col("doc_id")).agg(count(lit(1)).as("c"))
    occ
      // one row per (h, doc) ⇒ the window count IS the distinct-doc count
      .withColumn("n_docs", count(lit(1)).over(Window.partitionBy(col("h"))))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_windows"),
        sum(when(col("n_docs") >= 2, col("c")).otherwise(0L))
          .as("n_dup_windows"))
      .withColumn("dup_ratio",
        col("n_dup_windows").cast("double") / col("n_windows"))
      .withColumn("keep", col("dup_ratio") <= SubDupMax)
  }

  // -------------------------------------------------------- substr_dup_sa
  // The PRODUCTION TWIN of substr_dup the scale note above names: the
  // same duplicated-window report computed from a per-shard suffix-array
  // pass ([[graft.text.SuffixArray]]) instead of hashing every stride-1
  // occurrence — one digest per DISTINCT window per shard, sorted-run
  // grouping, identical (h, doc, c) rows into the identical global
  // exchange + rollup. Oracle: the SAME DuckDB mirror as substr_dup, so
  // a green row certifies the two formulations agree bit-for-bit.
  private def substrDupSa(s: SparkSession, d: String): DataFrame = {
    val occ = graft.text.SuffixArray
      .windowOccurrences(Tables.documents(s, d), "doc_id", "text", SubW)
      .repartition(col("h"))
      // (h, doc) rows are unique per shard and docs never span shards;
      // this agg only folds the vanishing md5-collision case and rides
      // the same h-keyed exchange
      .groupBy(col("h"), col("doc_id")).agg(sum(col("c")).as("c"))
    occ
      .withColumn("n_docs", count(lit(1)).over(Window.partitionBy(col("h"))))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_windows"),
        sum(when(col("n_docs") >= 2, col("c")).otherwise(0L))
          .as("n_dup_windows"))
      .withColumn("dup_ratio",
        col("n_dup_windows").cast("double") / col("n_windows"))
      .withColumn("keep", col("dup_ratio") <= SubDupMax)
  }

  private val substrDupSql = {
    val toks = tokensSql("text")
    val sh = shinglesSql("toks", SubW)
    s"""WITH tok AS (
       |  SELECT doc_id, $toks AS toks FROM documents),
       |grams AS (
       |  SELECT doc_id, unnest($sh) AS s FROM tok),
       |occ AS (
       |  SELECT doc_id, ${portableHashSql("s")} AS h, COUNT(*) AS c
       |  FROM grams GROUP BY 1, 2),
       |nd AS (
       |  SELECT h, COUNT(*) AS n_docs FROM occ GROUP BY 1)
       |SELECT o.doc_id,
       |  CAST(SUM(c) AS BIGINT) AS n_windows,
       |  CAST(SUM(CASE WHEN n_docs >= 2 THEN c ELSE 0 END) AS BIGINT)
       |    AS n_dup_windows,
       |  CAST(CAST(SUM(CASE WHEN n_docs >= 2 THEN c ELSE 0 END) AS BIGINT)
       |      AS DOUBLE) / CAST(SUM(c) AS BIGINT) AS dup_ratio,
       |  (CAST(CAST(SUM(CASE WHEN n_docs >= 2 THEN c ELSE 0 END) AS BIGINT)
       |      AS DOUBLE) / CAST(SUM(c) AS BIGINT)) <= $SubDupMax AS keep
       |FROM occ o JOIN nd USING (h)
       |GROUP BY o.doc_id""".stripMargin
  }

  // ----------------------------------------------------------- substr_scrub
  // The ACT edge of the substring-dedup family (the production step of
  // Lee et al.'s exact-substring dedup): substr_dup / dup_span_ladder
  // REPORT duplicated windows; this transform REWRITES the corpus.
  // Every token covered by a duplicated 8-token window occurrence is
  // excised UNLESS the occurrence sits in the window hash's CANONICAL
  // document — the lowest doc_id containing the window. Canonical-by-
  // min-doc is deterministic on any engine/partitioning/subset, so
  // exactly one document keeps each duplicated passage and a re-run
  // never flip-flops which copy survives. Output is the per-doc rewrite
  // receipt: token conservation (n_kept + n_removed = n_tok, pinned by
  // SubstrScrubSpec) and the md5 of the cleaned space-rejoined text —
  // hash-gating the REWRITE itself, not just its counts.
  //
  // Scale shape: ONE h-keyed exchange, ONE gram pass. The excision
  // test needs no per-hash aggregate at all: an occurrence is removed
  // iff doc_id ≠ min(doc_id) over its window hash — "some LOWER doc
  // carries this window", which already implies ≥ 2 distinct docs, so
  // the n_docs gate is redundant and the whole per-hash-stats join
  // disappears into a min window over the h partitioning (the
  // substr_dup exchange discipline; the first cut aggregated
  // (n_docs, canon) per hash and joined back — column pruning made the
  // aggregate's child and the probe's child DIFFERENT exchanges, so
  // the corpus gram pass ran twice). Removed positions are
  // ∝ duplicated-window occurrences, so remByDoc is sparse (rows only
  // for docs that lose tokens) and the final join ships each doc's
  // token array once. The kept-token step is LINEAR in the doc:
  // `array_except(positions, rem)` builds one hash set over the
  // removal list and walks the position sequence once
  // (O(n_tok + |rem|)); the former per-token `array_contains(rem, …)`
  // lambda rescanned the removal array per token — O(n_tok·|rem|),
  // quadratic for a mostly-duplicated long doc. Docs are row-sized so
  // neither form could dominate a stage, but the linear form is the
  // one that holds for arbitrarily long documents (SubstrScrubSpec
  // pins both the equivalence and the long-doc case).
  private def substrScrub(s: SparkSession, d: String): DataFrame = {
    // the gram+md5 position table is the family's shared materialized
    // pass ([[graft.SharedStages.subWinPos]], also consumed by
    // substr_dup_gram); the canonical-doc window reuses its h keying
    val win = graft.SharedStages.subWinPos(s, d)
    val remByDoc = win
      .withColumn("canon", min(col("doc_id"))
        .over(Window.partitionBy(col("h"))))
      .filter(col("doc_id") =!= col("canon"))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (SubW - 1))).as("tpos"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("tpos"))).as("rem"))
    Tables.documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .join(remByDoc, Seq("doc_id"), "left")
      .withColumn("rem", coalesce(col("rem"), array().cast("array<long>")))
      // sequence(1, 0) would count DOWN — guard the empty-doc case
      .withColumn("kept", expr(
        """transform(
          |  array_except(
          |    CASE WHEN size(toks) > 0
          |      THEN sequence(CAST(1 AS BIGINT), CAST(size(toks) AS BIGINT))
          |      ELSE CAST(array() AS array<bigint>) END,
          |    rem),
          |  p -> toks[CAST(p - 1 AS INT)])""".stripMargin))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tok"),
        size(col("rem")).cast("long").as("n_removed"),
        (size(col("toks")) - size(col("rem"))).cast("long").as("n_kept"),
        md5(array_join(col("kept"), " ")).as("clean_md5"))
  }

  private val substrScrubSql = {
    val toks = tokensSql("text")
    s"""WITH tok AS (
       |  SELECT doc_id, $toks AS toks FROM documents),
       |grams AS (
       |  SELECT doc_id,
       |    unnest(range(1, len(toks) - ${SubW - 2})) AS pos,
       |    unnest(list_transform(range(1, len(toks) - ${SubW - 2}),
       |      i -> array_to_string(toks[i : i + ${SubW - 1}], ' '))) AS s
       |  FROM tok),
       |win AS (
       |  SELECT doc_id, pos, ${portableHashSql("s")} AS h FROM grams),
       |-- removed iff a LOWER doc carries the window (implies >= 2 docs)
       |rem AS (
       |  SELECT DISTINCT w.doc_id, w.pos + q.o AS tpos
       |  FROM (SELECT doc_id, pos,
       |          MIN(doc_id) OVER (PARTITION BY h) AS canon FROM win) w,
       |    LATERAL (SELECT unnest(range(0, $SubW)) AS o) q
       |  WHERE w.doc_id <> w.canon),
       |remc AS (
       |  SELECT doc_id, COUNT(*) AS n_removed FROM rem GROUP BY 1),
       |tokpos AS (
       |  SELECT doc_id, unnest(toks) AS tok,
       |    unnest(range(1, len(toks) + 1)) AS tpos
       |  FROM tok),
       |keptagg AS (
       |  SELECT t.doc_id, string_agg(t.tok, ' ' ORDER BY t.tpos) AS txt
       |  FROM tokpos t
       |  LEFT JOIN rem r ON r.doc_id = t.doc_id AND r.tpos = t.tpos
       |  WHERE r.tpos IS NULL
       |  GROUP BY 1)
       |SELECT b.doc_id,
       |  CAST(len(b.toks) AS BIGINT) AS n_tok,
       |  CAST(COALESCE(rc.n_removed, 0) AS BIGINT) AS n_removed,
       |  CAST(len(b.toks) - COALESCE(rc.n_removed, 0) AS BIGINT) AS n_kept,
       |  md5(COALESCE(k.txt, '')) AS clean_md5
       |FROM tok b
       |LEFT JOIN remc rc USING (doc_id)
       |LEFT JOIN keptagg k USING (doc_id)""".stripMargin
  }

  // ------------------------------------------------------- dup_span_ladder
  // Variable-length duplicated-SPAN report at log-spaced resolution:
  // substr_dup answers "how much of this doc sits in duplicated 8-token
  // windows"; the memorization-risk question is "how LONG a span does
  // this doc share with the rest of the corpus" (a 64-token shared span
  // is a verbatim-copy signal, a lone 8-token one is a idiom). Exact
  // longest-span needs cross-shard LCP machinery; the doubling ladder
  // L ∈ {8,16,32,64} brackets it within 2× using the SAME fixed-window
  // pipeline per rung — each rung is one per-shard suffix-array pass
  // ([[graft.text.SuffixArray]], windows shrink as L grows) feeding one
  // h-keyed exchange + doc rollup. Long-format output; max duplicated
  // span per doc = max span_len with n_dup_windows > 0.
  private val SpanLadder = Seq(8, 16, 32, 64)

  private def dupSpanLadder(s: SparkSession, d: String): DataFrame = {
    // ONE shard pass emits every rung (the corpus is read, tokenized and
    // interned once — [[graft.text.SuffixArray.windowOccurrencesMulti]];
    // the former per-rung form paid 4 full scan+tokenize+intern passes)
    // and ONE h-keyed exchange serves all rungs' pre-agg, window and
    // rollup: partitioning by h clusters (w, h) too, so the per-rung
    // stages reuse it — 4 exchanges → 1, with identical per-rung rows
    // (w rides the rows; rungs never mix because w is in every key).
    // A/B'd at sf1 on one box: fused 5.0 s vs the union-of-rungs form
    // 7.2 s (the committed r18 sf1 number was a friendlier-box draw);
    // widening the fused exchange or the shard spread to rungs×
    // parallelism measured WORSE (more, smaller shuffle blocks), so
    // both stay at the session defaults.
    val occ = graft.text.SuffixArray
      .windowOccurrencesMulti(Tables.documents(s, d), "doc_id", "text",
        SpanLadder)
      .repartition(col("h"))
      .groupBy(col("w"), col("h"), col("doc_id")).agg(sum(col("c")).as("c"))
    occ
      .withColumn("n_docs",
        count(lit(1)).over(Window.partitionBy(col("w"), col("h"))))
      .groupBy(col("doc_id"), col("w"))
      .agg(sum(col("c")).as("n_windows"),
        sum(when(col("n_docs") >= 2, col("c")).otherwise(0L))
          .as("n_dup_windows"))
      .select(col("doc_id"), col("w").cast("int").as("span_len"),
        col("n_windows"), col("n_dup_windows"))
  }

  /** [[graft.text.TextFunctions.shinglesSql]] builds an n-term `||`
    * chain, which left-nests past DuckDB's 128-deep binder recursion at
    * n = 64; the slice + array_to_string form is flat at any width and
    * produces identical strings. */
  private def shingleSliceSql(toksCol: String, n: Int): String =
    s"CASE WHEN len($toksCol) < $n THEN [] ELSE " +
      s"list_transform(range(1, len($toksCol) - ${n - 2}), " +
      s"i -> array_to_string($toksCol[i : i + ${n - 1}], ' ')) END"

  private val dupSpanLadderSql = {
    val toks = tokensSql("text")
    val rungs = SpanLadder.map { l =>
      val sh = shingleSliceSql("toks", l)
      s"""grams$l AS (
         |  SELECT doc_id, unnest($sh) AS s FROM tok),
         |occ$l AS (
         |  SELECT doc_id, ${portableHashSql("s")} AS h, COUNT(*) AS c
         |  FROM grams$l GROUP BY 1, 2),
         |nd$l AS (
         |  SELECT h, COUNT(*) AS n_docs FROM occ$l GROUP BY 1),
         |rep$l AS (
         |  SELECT o.doc_id, $l AS span_len,
         |    CAST(SUM(c) AS BIGINT) AS n_windows,
         |    CAST(SUM(CASE WHEN n_docs >= 2 THEN c ELSE 0 END) AS BIGINT)
         |      AS n_dup_windows
         |  FROM occ$l o JOIN nd$l USING (h)
         |  GROUP BY o.doc_id)""".stripMargin
    }.mkString(",\n")
    val union = SpanLadder
      .map(l => s"SELECT doc_id, span_len, n_windows, n_dup_windows FROM rep$l")
      .mkString("\nUNION ALL\n")
    s"""WITH tok AS (
       |  SELECT doc_id, $toks AS toks FROM documents),
       |$rungs
       |$union""".stripMargin
  }

  // ----------------------------------------------------- dup_longest_span
  // The EXACT variable-length answer dup_span_ladder brackets: per doc,
  // the longest token span shared verbatim with ANY other document —
  // floor 8 (below the ladder's bottom rung reports 0), cap 64 (the
  // ladder's top rung; a 64+ span reports 64). ONE global suffix sort +
  // LCP walk ([[graft.text.LcpWalk]]) instead of four fixed-W passes:
  // stride-1 suffixes capped at 64 tokens, prefiltered to positions
  // whose 8-token prefix window is duplicated across docs (exactness-
  // preserving — a cross-doc LCP ≥ 8 implies that duplicated window —
  // and it makes candidates ∝ duplicated positions, not corpus size),
  // then range-partitioned sort + per-partition adjacent-pair LCPs +
  // driver-stitched partition boundaries. The oracle replays the same
  // adjacent-pair maximum under DuckDB's own sort order — valid
  // because the adjacent-different-doc-pair lemma makes the per-doc
  // max order-independent (see LcpWalk's scaladoc).
  private val SpanMin = 8
  private val SpanCap = 64

  private def dupLongestSpan(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val tok = graft.Tables.parallelize(docs)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= SpanMin)
    // Narrow position table: prefix-window hash ONLY. The 64-token
    // suffix slice is deliberately NOT built here — in the previous
    // shape it rode the h-keyed prefilter exchange at up to 64 strings
    // per position (profiled as the query's dominant cost; this was
    // the slowest registry query two rounds running). Now the
    // prefilter exchanges carry 3 scalars per position, and the slices
    // are built AFTER the filter for surviving positions only
    // (∝ duplicated positions) via one doc_id-keyed join that ships
    // each doc's token array once.
    val posH = tok
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(1), size(col("toks")) - (SpanMin - 1))).as("i"))
      .select(col("doc_id"), col("i"),
        portableHash(array_join(
          slice(col("toks"), col("i"), lit(SpanMin)), " ")).as("h"))
    val dupH = posH.select(col("h"), col("doc_id")).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 2).select(col("h"))
    val surv = posH.join(dupH, "h").select(col("doc_id"), col("i"))
    val cand = surv.join(tok, "doc_id")
      .select(col("doc_id"), slice(col("toks"), col("i"), lit(SpanCap)).as("suf"))
    val per = graft.text.LcpWalk.maxSharedSpan(cand)
    docs.select(col("doc_id")).join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(coalesce(col("m"), lit(0)) >= SpanMin, coalesce(col("m"), lit(0)))
          .otherwise(lit(0)).cast("long").as("longest_dup_span"))
  }

  private val dupLongestSpanSql = {
    val toks = tokensSql("text")
    s"""WITH tok AS (
       |  SELECT doc_id, $toks AS toks FROM documents),
       |pos0 AS (
       |  -- parallel unnest (lateral range over a column is unsupported)
       |  SELECT doc_id,
       |    unnest(list_transform(range(1, len(toks) - ${SpanMin - 2}),
       |      i -> array_to_string(toks[i : i + ${SpanMin - 1}], ' '))) AS w8,
       |    unnest(list_transform(range(1, len(toks) - ${SpanMin - 2}),
       |      i -> toks[i : i + ${SpanCap - 1}])) AS suf
       |  FROM tok),
       |pos AS (
       |  SELECT doc_id, ${portableHashSql("w8")} AS h, suf FROM pos0),
       |dup AS (
       |  SELECT h FROM (SELECT DISTINCT h, doc_id FROM pos)
       |  GROUP BY h HAVING COUNT(*) >= 2),
       |cand AS (
       |  SELECT p.doc_id, p.h, p.suf FROM pos p JOIN dup USING (h)),
       |-- The Spark side walks ONE globally sorted suffix layout (the
       |-- scale path). The oracle deliberately does NOT mirror that
       |-- adjacency walk: a global-ORDER-BY window over this derived
       |-- input returns intermittently wrong lag() rows under DuckDB
       |-- 1.0's parallel window execution (observed ~1-in-5 at sf0.1;
       |-- stable and correct at threads=1 — list- and string-typed sort
       |-- keys alike). Instead it exploits that any cross-doc LCP ≥ 8
       |-- pair shares its first-8-token window, so the per-doc max is
       |-- computable WITHIN h-groups: a pairwise LCP join keyed by the
       |-- duplicated-window hash — deterministic, no sort, and bounded
       |-- by the dup-group sizes (max 4, Σc² ≈ 45k at sf0.1).
       |lc AS (
       |  SELECT a.doc_id,
       |    -- list_position yields 0 (not NULL) when no false exists —
       |    -- nullif routes the all-equal case to the min-length arm
       |    coalesce(nullif(list_position(list_transform(
       |        range(1, least(len(a.suf), len(b.suf)) + 1),
       |        j -> a.suf[j] = b.suf[j]), false), 0) - 1,
       |      least(len(a.suf), len(b.suf))) AS l
       |  FROM cand a JOIN cand b
       |    ON a.h = b.h AND a.doc_id <> b.doc_id),
       |per AS (
       |  SELECT doc_id, MAX(l) AS m FROM lc GROUP BY 1)
       |SELECT t.doc_id,
       |  CAST(CASE WHEN coalesce(m, 0) >= $SpanMin THEN coalesce(m, 0)
       |       ELSE 0 END AS BIGINT) AS longest_dup_span
       |FROM (SELECT doc_id FROM documents) t
       |LEFT JOIN per USING (doc_id)""".stripMargin
  }

  // ------------------------------------------------------------ rep_ngram
  // Gopher/C4-family repetition metrics per document: the fraction of
  // token bigrams taken by the single most frequent bigram, and the
  // fraction of tokens that are repeats of an earlier type. Docs
  // failing either threshold get keep=false — the standard
  // high-repetition filter before training. Two aggregations, both
  // keyed by doc (the bigram groupBy reuses the window's partitioning).
  private val TopBigramMax = 0.2
  private val RepTokenMax = 0.7

  private[graft] def repNgram(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    repNgramStats(docs, ngramRows(docs, 2))
  }

  /** Repetition metrics from an existing bigram-rows DF — lets the
    * curation funnel share ONE gram pipeline across both filters. */
  private def repNgramStats(docs: DataFrame, grams: DataFrame): DataFrame = {
    // one explicit doc-keyed exchange that BOTH aggregations and the
    // final join reuse (HashPartitioning(doc_id) satisfies the
    // (doc_id, s) clustering) — without it each agg plans its own
    // exchange of the near-distinct bigram stream
    val bigramTop = grams
      .repartition(col("doc_id"))
      .groupBy(col("doc_id"), col("s")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_bigrams"), max(col("c")).as("top_bigram_n"))
    // no parallelize: per-row array work is cheap enough that the
    // local-test widening shuffle isn't worth it on this branch
    val tokStats = docs
      .withColumn("toks", tokens(col("text")))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_types"))
    tokStats.join(bigramTop, "doc_id")
      .withColumn("top_bigram_ratio",
        col("top_bigram_n").cast("double") / col("n_bigrams"))
      .withColumn("rep_token_ratio",
        (col("n_tokens") - col("n_types")).cast("double") / col("n_tokens"))
      .withColumn("keep",
        col("top_bigram_ratio") <= TopBigramMax &&
          col("rep_token_ratio") <= RepTokenMax)
  }

  private[queries] val repNgramSql = {
    val toks = tokensSql("text")
    val bigrams = shinglesSql("toks", 2)
    s"""WITH tok AS (
       |  SELECT doc_id, $toks AS toks FROM documents),
       |grams AS (
       |  SELECT doc_id, unnest($bigrams) AS s FROM tok),
       |bg AS (
       |  SELECT doc_id, s, COUNT(*) AS c FROM grams GROUP BY 1, 2),
       |bgtop AS (
       |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
       |    CAST(MAX(c) AS BIGINT) AS top_bigram_n
       |  FROM bg GROUP BY 1),
       |ts AS (
       |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
       |    CAST(len(list_distinct(toks)) AS BIGINT) AS n_types
       |  FROM tok WHERE len(toks) >= 2)
       |SELECT ts.doc_id, n_tokens, n_types, n_bigrams, top_bigram_n,
       |  CAST(top_bigram_n AS DOUBLE) / n_bigrams AS top_bigram_ratio,
       |  CAST(n_tokens - n_types AS DOUBLE) / n_tokens AS rep_token_ratio,
       |  (CAST(top_bigram_n AS DOUBLE) / n_bigrams <= $TopBigramMax AND
       |   CAST(n_tokens - n_types AS DOUBLE) / n_tokens <= $RepTokenMax)
       |    AS keep
       |FROM ts JOIN bgtop ON ts.doc_id = bgtop.doc_id""".stripMargin
  }

  // ------------------------------------------------------ lm_rare_bigrams
  // Corpus-LM quality proxy without transcendentals: train bigram
  // counts on the corpus itself (one aggregation), then score each
  // document by the fraction of its bigram occurrences that are
  // corpus-rare (count ≤ RareMax). High rare-fraction ≈ high LM
  // surprise ≈ noisy/garbled text — the integer-exact stand-in for
  // perplexity filtering (an actual log-prob sum is not bit-portable
  // across libm implementations; a count ratio is). Shapes: bigram
  // window (doc-keyed) → corpus counts (bigram-keyed) → join (reuses
  // the counts partitioning) → per-doc rollup.
  private val RareMax = 3
  private val RareRatioMax = 0.1

  private[graft] def lmRareBigrams(s: SparkSession, d: String): DataFrame =
    lmRareStats(ngramRows(Tables.documents(s, d), 2))

  /** Corpus-LM rarity score from an existing bigram-rows DF (shared by
    * the curation funnel). */
  private def lmRareStats(gramRows: DataFrame): DataFrame = {
    // corpus count via a bigram-keyed window, not groupBy+self-join:
    // the join form re-executes the whole n-gram pipeline for each
    // branch (no shared-subtree reuse across an aggregate); the window
    // reads the one pipeline once. The explicit repartition makes the
    // bigram exchange visible to the planner so the window reuses it.
    val grams = gramRows.repartition(col("s"))
    grams
      .withColumn("cnt",
        count(lit(1)).over(Window.partitionBy(col("s"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("cnt") <= RareMax, 1L).otherwise(0L)).as("n_rare"))
      .withColumn("rare_ratio",
        col("n_rare").cast("double") / col("n_bigrams"))
      .withColumn("keep", col("rare_ratio") <= RareRatioMax)
  }

  private[queries] val lmRareBigramsSql = {
    val toks = tokensSql("text")
    val bigrams = shinglesSql("toks", 2)
    s"""WITH tok AS (
       |  SELECT doc_id, $toks AS toks FROM documents),
       |grams AS (
       |  SELECT doc_id, unnest($bigrams) AS s FROM tok),
       |counts AS (
       |  SELECT s, COUNT(*) AS cnt FROM grams GROUP BY 1)
       |SELECT doc_id, COUNT(*) AS n_bigrams,
       |  CAST(SUM(CASE WHEN cnt <= $RareMax THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_rare,
       |  CAST(SUM(CASE WHEN cnt <= $RareMax THEN 1 ELSE 0 END) AS DOUBLE)
       |    / COUNT(*) AS rare_ratio,
       |  (CAST(SUM(CASE WHEN cnt <= $RareMax THEN 1 ELSE 0 END) AS DOUBLE)
       |    / COUNT(*)) <= $RareRatioMax AS keep
       |FROM grams JOIN counts USING (s)
       |GROUP BY doc_id""".stripMargin
  }

  // ------------------------------------------------------ tfidf_top_terms
  // Per-document top-3 terms by a rarity-weighted term frequency:
  // score = tf · (N+1) / (df+1). Deliberately a RATIONAL weight, not
  // ln-idf: one IEEE division is bit-identical across engines where
  // libm log implementations need not be — same ordering semantics for
  // the top-k, exact-match safe. df and N come from the data (one
  // aggregation + one broadcast scalar); the top-3 runs through the
  // custom TopKPerKey operator (bounded heaps, no per-doc sort), ties
  // broken by term for determinism.
  private def tfidfTopTerms(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    // N from parquet metadata (a count() against the scan — footer
    // rowcounts, no data read; same pattern as the digest-boundary
    // collect). df via a term-keyed window over the ONE tf pipeline —
    // the tf-join-df form re-executes the token explode + aggregation
    // for both branches.
    val nDocs = docs.count()
    val tf = Tables.parallelize(docs)
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val scored = tf
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
      .withColumn("score",
        (col("tf") * (nDocs + 1)).cast("double") / (col("df") + 1))
      .select(col("doc_id"), col("term"), col("tf"), col("score"))
    graft.plans.TopK.perKey(scored, Seq("doc_id"),
      Seq(("score", false), ("term", true)), 3)
  }

  private val tfidfTopTermsSql = {
    val toks = tokensSql("text")
    s"""WITH tok AS (
       |  SELECT doc_id, unnest($toks) AS term FROM documents),
       |tf AS (
       |  SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
       |df AS (
       |  SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
       |scored AS (
       |  SELECT doc_id, tf.term AS term, tf,
       |    CAST(tf * ((SELECT COUNT(*) FROM documents) + 1) AS DOUBLE)
       |      / (df + 1) AS score
       |  FROM tf JOIN df ON tf.term = df.term),
       |ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
       |    ORDER BY score DESC, term) AS rn
       |  FROM scored)
       |SELECT doc_id, term, tf, score FROM ranked WHERE rn <= 3""".stripMargin
  }

  // ------------------------------------------------------ curation_funnel
  // The composed curation gate: every document through BOTH quality
  // filters (repetition + corpus-LM rarity), reported as a per-language
  // funnel — total, survivors of each filter, survivors of all. This is
  // the decision report an actual curation run publishes before
  // training. The per-doc filter reports are the session-shared
  // materialized stages ([[graft.SharedStages]]) — the funnel consumes
  // the same intermediates the standalone rep_ngram / lm_rare_bigrams
  // reports publish, so the gram pipelines run once per session however
  // many reports fan out from them.
  private def curationFunnel(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val rep = graft.SharedStages.repNgramReport(s, d)
      .select(col("doc_id"), col("keep").as("keep_rep"))
    val lm = graft.SharedStages.lmRareReport(s, d)
      .select(col("doc_id"), col("keep").as("keep_lm"))
    docs.select(col("doc_id"), col("lang"))
      .join(rep, "doc_id").join(lm, "doc_id")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep_rep"), 1L).otherwise(0L)).as("n_keep_rep"),
        sum(when(col("keep_lm"), 1L).otherwise(0L)).as("n_keep_lm"),
        sum(when(col("keep_rep") && col("keep_lm"), 1L).otherwise(0L))
          .as("n_keep_all"))
  }

  private val curationFunnelSql =
    s"""WITH rep AS (
       |  SELECT doc_id, keep AS keep_rep FROM ($repNgramSql)),
       |lm AS (
       |  SELECT doc_id, keep AS keep_lm FROM ($lmRareBigramsSql))
       |SELECT d.lang, COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN keep_rep THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_keep_rep,
       |  CAST(SUM(CASE WHEN keep_lm THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_keep_lm,
       |  CAST(SUM(CASE WHEN keep_rep AND keep_lm THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_keep_all
       |FROM documents d
       |JOIN rep ON d.doc_id = rep.doc_id
       |JOIN lm ON d.doc_id = lm.doc_id
       |GROUP BY d.lang""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("doc_fingerprint", docFingerprint, Some(docFingerprintSql)),
    // substr_dup runs the SUFFIX-ARRAY pass as the production path
    // (≈4× faster at sf0.1 — one digest per distinct window per shard
    // vs hashing every stride-1 occurrence); the gram-hash formulation
    // stays registered as the cross-check twin, both on the SAME DuckDB
    // mirror — the quality_deciles exact-gate/production-twin pattern.
    // (Renamed from substr_dup_sa in round 11 when it became the
    // default; the twin carries the _gram suffix now.)
    QueryDef("substr_dup", substrDupSa, Some(substrDupSql)),
    QueryDef("substr_scrub", substrScrub, Some(substrScrubSql)),
    QueryDef("substr_dup_gram", substrDup, Some(substrDupSql)),
    QueryDef("dup_span_ladder", dupSpanLadder, Some(dupSpanLadderSql)),
    QueryDef("dup_longest_span", dupLongestSpan, Some(dupLongestSpanSql)),
    QueryDef("rep_ngram",
      (s, d) => graft.SharedStages.repNgramReport(s, d), Some(repNgramSql)),
    QueryDef("lm_rare_bigrams",
      (s, d) => graft.SharedStages.lmRareReport(s, d), Some(lmRareBigramsSql)),
    QueryDef("tfidf_top_terms", tfidfTopTerms, Some(tfidfTopTermsSql)),
    QueryDef("curation_funnel", curationFunnel, Some(curationFunnelSql)))
}
