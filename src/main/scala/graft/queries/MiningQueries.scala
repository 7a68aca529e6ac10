package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.TextFunctions
import graft.text.TextFunctions._

/** Round-7 corpus-mining operators: a HyperLogLog distinct sketch (the
  * canonical streaming-cardinality structure, completing the sketch
  * family next to KMV / CMS / t-digest), MOSS-style winnowing
  * fingerprint selection, and first-occurrence n-gram novelty scoring.
  * All arithmetic is integer-exact until a final mirrored IEEE step, so
  * every query is hash-gated against its DuckDB oracle.
  */
object MiningQueries {

  // --------------------------------------------------------- hll_distinct
  // HyperLogLog distinct-count sketch (Flajolet et al. 2007) per event
  // type over events.user_id — the fixed-size mergeable alternative to
  // q15's KMV: m = 64 registers, register j = max leading-zero rank of
  // hashes landing in bucket j. The whole sketch is TWO hash
  // aggregations (both with map-side partials — at 100 TB each executor
  // folds its partition into 64 registers before any exchange):
  // (group, bucket) → max(rho), then group → the register sum. Exactness
  // discipline: rho comes from the bin()-string length (integer-exact in
  // both engines, no log2), the harmonic-sum denominator accumulates as
  // BIGINT via shiftleft (2^(55−rho) summed exactly — never a double
  // sum, whose partition-order rounding would break the hash gate), and
  // the final estimate is one mirrored double expression. The raw
  // estimator regime is pinned (no small-range linear-counting branch —
  // it needs ln(); the registers + scaled sum are emitted so any
  // correction is a driver-side afterthought). alpha_64 = 0.709 from
  // the paper.
  // canonical constants live with the mergeable Aggregator twin
  // ([[graft.functions.HllSketch]]) — identical registers/estimate by
  // construction, asserted in MiningQueriesSpec
  private val HllM = graft.functions.HllSketch.M
  private val HllRestBits = graft.functions.HllSketch.RestBits
  private val HllRestMask = graft.functions.HllSketch.RestMask
  private val HllRhoMax = graft.functions.HllSketch.RhoMax

  private def hllDistinct(s: SparkSession, d: String): DataFrame = {
    val h = portableHash(col("user_id").cast("string"))
    val rest = col("h").bitwiseAND(lit(HllRestMask))
    Tables.events(s, d)
      .select(col("event_type"), h.as("h"))
      .withColumn("bucket", shiftright(col("h"), HllRestBits))
      .withColumn("rho",
        when(rest === 0, lit(HllRhoMax))
          .otherwise(lit(HllRhoMax) - length(bin(rest))))
      .groupBy(col("event_type"), col("bucket"))
      .agg(max(col("rho")).as("m"))
      .groupBy(col("event_type"))
      .agg(
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST($HllRhoMax - m AS INT))"))
          .as("z_occ"),
        count(lit(1)).as("n_buckets"))
      .withColumn("z_scaled",
        col("z_occ") +
          (lit(HllM.toLong) - col("n_buckets")) * lit(1L << HllRhoMax))
      .withColumn("hll_est",
        lit(graft.functions.HllSketch.Alpha) * lit(HllM.toDouble * HllM) *
          (lit((1L << HllRhoMax).toDouble) / col("z_scaled").cast("double")))
      .select(col("event_type"), col("n_buckets"), col("z_scaled"),
        col("hll_est"))
  }

  private val hllDistinctSql =
    s"""WITH h AS (
       |  SELECT event_type,
       |    ${portableHashSql("CAST(user_id AS VARCHAR)")} AS h
       |  FROM events),
       |b AS (
       |  SELECT event_type, h >> $HllRestBits AS bucket,
       |    CASE WHEN (h & $HllRestMask) = 0 THEN $HllRhoMax
       |         ELSE $HllRhoMax - length(bin(h & $HllRestMask)) END AS rho
       |  FROM h),
       |reg AS (
       |  SELECT event_type, bucket, MAX(rho) AS m FROM b GROUP BY 1, 2),
       |z AS (
       |  SELECT event_type,
       |    CAST(SUM(CAST(1 AS BIGINT) << ($HllRhoMax - m)) AS BIGINT)
       |      AS z_occ,
       |    COUNT(*) AS n_buckets
       |  FROM reg GROUP BY 1)
       |SELECT event_type, n_buckets,
       |  CAST(z_occ + ($HllM - n_buckets) * (CAST(1 AS BIGINT) << $HllRhoMax)
       |    AS BIGINT) AS z_scaled,
       |  CAST(0.709 AS DOUBLE) * CAST(${HllM * HllM} AS DOUBLE) *
       |    (CAST(CAST(1 AS BIGINT) << $HllRhoMax AS DOUBLE) /
       |     CAST(z_occ + ($HllM - n_buckets) * (CAST(1 AS BIGINT) << $HllRhoMax)
       |       AS DOUBLE)) AS hll_est
       |FROM z""".stripMargin

  // --------------------------------------------------- winnow_fingerprint
  // Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken, MOSS):
  // over the rolling 3-gram hash sequence, every window of w=4
  // consecutive hashes contributes its minimum — rightmost position on
  // ties — and the distinct selected positions are the document's
  // fingerprints. Guarantees every shared substring of ≥ w+n−1 tokens
  // produces a shared fingerprint (the property mod-p selection in
  // doc_fingerprint lacks) with density 2/(w+1). Plan shape: the gram +
  // window expansion is generator-only (posexplode + a bounded
  // sequence explode, ×w rows, no shuffle); selection is ONE doc-keyed
  // aggregation over a PACKED key — hs·2²⁰ + (2²⁰ − pos), whose plain
  // long min IS "min hash, rightmost tie" (a struct-min expresses the
  // same but falls out of codegen into a SortAggregate — measured 3×
  // slower at bench SF) — then a distinct that reuses the same
  // doc-keyed clustering. The selection hash hs is the 40-bit fold of
  // the portable hash so the pack fits a BIGINT; positions must be
  // < 2²⁰ (docs are chunked far below a million grams upstream).
  private val WinN = 3 // k-gram width
  private val WinW = 4 // winnowing window
  private val WinHashMod = 1L << 40 // 40-bit selection hash
  private val WinPosCap = 1L << 20  // position field of the packed key

  private[graft] def winnowFingerprint(s: SparkSession, d: String): DataFrame = {
    val grams = TextFunctions
      .ngramRowsPos(Tables.parallelize(Tables.documents(s, d)),
        "doc_id", "text", WinN)
      .filter(col("n") >= WinW)
      .select(col("doc_id"), col("n"), col("pos"),
        (portableHash(col("s")) % WinHashMod).as("hs"))
    grams
      .select(col("doc_id"),
        (col("hs") * WinPosCap + (lit(WinPosCap) - col("pos"))).as("key"),
        explode(expr(s"sequence(greatest(1L, pos - ${WinW - 1}), " +
          s"least(pos, n - ${WinW - 1}))")).as("t"))
      .groupBy(col("doc_id"), col("t"))
      .agg(min(col("key")).as("k"))
      .select(col("doc_id"),
        (lit(WinPosCap) - col("k") % WinPosCap).as("pos"),
        expr(s"k div $WinPosCap").as("h"))
      .distinct()
  }

  private val winnowFingerprintSql = {
    val toks = tokensSql("text")
    val sh = shinglesSql("toks", WinN)
    s"""WITH tok AS (
       |  SELECT doc_id, $toks AS toks FROM documents),
       |shl AS (
       |  SELECT doc_id, $sh AS sh FROM tok),
       |grams AS (
       |  SELECT doc_id, CAST(u.g[1] AS BIGINT) AS pos,
       |    ${portableHashSql("CAST(u.g[2] AS VARCHAR)")} % $WinHashMod AS hs,
       |    len(sh) AS n
       |  FROM shl, unnest(list_zip(range(1, len(sh) + 1), sh)) AS u(g)
       |  WHERE len(sh) > 0),
       |win AS (
       |  SELECT doc_id, hs * $WinPosCap + ($WinPosCap - pos) AS key,
       |    unnest(range(greatest(1, pos - ${WinW - 1}),
       |                 least(pos, n - ${WinW - 1}) + 1)) AS t
       |  FROM grams WHERE n >= $WinW),
       |wmin AS (
       |  SELECT doc_id, t, MIN(key) AS k FROM win GROUP BY 1, 2)
       |SELECT DISTINCT doc_id,
       |  $WinPosCap - (k % $WinPosCap) AS pos,
       |  k // $WinPosCap AS h
       |FROM wmin""".stripMargin
  }

  // -------------------------------------------------------- winnow_pairs
  // MOSS-style overlap DETECTION from the winnowed fingerprints — the
  // pair-report step the fingerprint selection exists for (Schleimer/
  // Wilkerson/Aiken '03 §5: report pairs sharing selected
  // fingerprints). Shape: the winnow pass already reduced every doc to
  // ~2/(w+1) of its grams, so the pair join runs over the SELECTED
  // hashes only; a df cut (same ≤25 discipline as lex_cosine_pairs)
  // drops boilerplate fingerprints whose posting lists would fan out
  // O(df²), and the report keeps pairs sharing ≥3 fingerprints. The
  // fingerprint exchange is hash-keyed and reused by the df window and
  // both join sides; candidate pairs are collision-proportional, never
  // all-pairs — winnowing IS the 100 TB sampling guarantee (density
  // bounded per document, independent of corpus size).
  private val WinPairMaxDf = 25
  private val WinPairMin = 3

  private def winnowPairs(s: SparkSession, d: String): DataFrame = {
    // the winnow selection is shared with the winnow_fingerprint report
    // ([[graft.SharedStages.winnowFingerprints]]) — the gram pass runs
    // once per (session, dir), not once per consumer
    val fps = graft.SharedStages.winnowFingerprints(s, d)
      .select(col("doc_id"), col("h")).distinct()
      .repartition(col("h"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("h"))))
      .filter(col("df") <= WinPairMaxDf)
      .select(col("doc_id"), col("h"))
    val a = fps.select(col("h"), col("doc_id").as("a_id"))
    val b = fps.select(col("h"), col("doc_id").as("b_id"))
    a.join(b, "h")
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= WinPairMin)
  }

  private def winnowPairsSql =
    s"""WITH wfp AS ($winnowFingerprintSql),
       |dfp AS (SELECT DISTINCT doc_id, h FROM wfp),
       |kept AS (
       |  SELECT doc_id, h FROM dfp
       |  WHERE h IN (SELECT h FROM dfp GROUP BY h
       |              HAVING COUNT(*) <= $WinPairMaxDf))
       |SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_shared
       |FROM kept a JOIN kept b ON a.h = b.h AND a.doc_id < b.doc_id
       |GROUP BY 1, 2
       |HAVING COUNT(*) >= $WinPairMin""".stripMargin

  // ------------------------------------------------------- ngram_novelty
  // First-occurrence novelty scoring: the fraction of a document's
  // distinct 5-grams whose corpus-wide FIRST occurrence (minimum
  // doc_id — ingestion order) is this document. The incremental-dedup /
  // data-valuation report: low novelty = the document adds nothing the
  // corpus hasn't already seen (near-1 for originals, near-0 for late
  // copies — the ordered twin of substr_dup's unordered ratio). Shape:
  // one gram pass, ONE explicit hash-keyed exchange reused by the
  // (h, doc) pre-agg and the per-hash first-doc window (the substr_dup
  // discipline), then one doc-keyed rollup.
  private val NovN = 5

  private def ngramNovelty(s: SparkSession, d: String): DataFrame = {
    // distinct (doc, h) occurrences come from the family's shared
    // materialized gram pass ([[graft.SharedStages.gramOcc]]) — the
    // per-(h, doc) count the former inline pre-agg produced was never
    // consumed (only row existence is), so the shared distinct table is
    // the same input; its h partitioning survives the checkpoint and
    // the first-doc window reuses it exchange-free.
    val occ = graft.SharedStages.gramOcc(s, d, NovN)
    occ
      .withColumn("first_doc",
        min(col("doc_id")).over(Window.partitionBy(col("h"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .withColumn("novelty_ratio",
        col("n_novel").cast("double") / col("n_grams"))
  }

  private val ngramNoveltySql = {
    val toks = tokensSql("text")
    val sh = shinglesSql("toks", NovN)
    s"""WITH tok AS (
       |  SELECT doc_id, $toks AS toks FROM documents),
       |grams AS (
       |  SELECT doc_id, unnest($sh) AS s FROM tok),
       |occ AS (
       |  SELECT DISTINCT doc_id, ${portableHashSql("s")} AS h FROM grams),
       |fst AS (
       |  SELECT h, MIN(doc_id) AS first_doc FROM occ GROUP BY 1)
       |SELECT o.doc_id, COUNT(*) AS n_grams,
       |  CAST(SUM(CASE WHEN f.first_doc = o.doc_id THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_novel,
       |  CAST(SUM(CASE WHEN f.first_doc = o.doc_id THEN 1 ELSE 0 END)
       |    AS DOUBLE) / COUNT(*) AS novelty_ratio
       |FROM occ o JOIN fst f USING (h)
       |GROUP BY o.doc_id""".stripMargin
  }

  // -------------------------------------------------------- novelty_incr
  // INCREMENTAL novelty — the actual data-valuation loop: ngram_novelty
  // scores against the whole corpus at once, but a running pipeline
  // scores each INCOMING batch against the grams of everything ingested
  // BEFORE it, persisted in a store the loop also updates. Two-batch
  // rendering over `documents` (ingestion order = doc_id): the prior
  // batch (even ids) has its distinct gram hashes upserted into a
  // hash-bucketed [[graft.sink.BucketStore]]; the incoming batch (odd
  // ids) probes ONLY the buckets its gram hashes route to
  // (`readBuckets` — probe cost ∝ touched buckets, never store size)
  // and reports, per incoming doc, the fraction of its distinct grams
  // the prior corpus has never seen. The loop's update step is the same
  // `upsert(incomingGrams)` call. The oracle mirrors the semantics
  // (prior-gram anti-membership) — the store is the Spark-side scale
  // machinery under it.
  private val NovBuckets = 16 // sized so sf-scale buckets stay single-file

  /** The probe side shared by both forms: the incoming batch (odd ids)
    * routes its distinct gram hashes to the store's buckets, reads ONLY
    * those buckets, and anti-joins — cost ∝ batch, never store size. */
  private def noveltyProbeAgainst(s: SparkSession, d: String,
                                  storePath: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    // The incoming batch's distinct gram table is a filter over the
    // family's shared materialized pass ([[graft.SharedStages.gramOcc]])
    // — novelty_incr and novelty_probe both consume this identical
    // derivation and previously each re-ran the corpus gram+hash pass
    // (and re-checkpointed it) per invocation. The per-(h, doc) count
    // the former inline pre-agg carried was never consumed. Both probe
    // consumers (the bounded bucket-id collect, then the join) now read
    // the checkpoint.
    val occ = graft.SharedStages.gramOcc(s, d, NovN)
      .filter(col("doc_id") % 2 === 1)
    val schema = StructType(Seq(StructField("h", LongType)))
    val store = graft.sink.BucketStore.readBuckets(s, storePath, schema,
      graft.sink.BucketStore.touchedBuckets(occ, Seq("h"), NovBuckets))
      .withColumn("seen", lit(1L))
    occ.join(store, Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("seen").isNull, 1L).otherwise(0L)).as("n_new"))
      .withColumn("novelty_ratio",
        col("n_new").cast("double") / col("n_grams"))
  }

  /** Bootstrap twin: build the store in-query (the honest first-ingest
    * cost), probe, then discard the scratch store — the result is
    * eagerly materialized first (tiny: one row per incoming doc), so
    * the store files are not needed after this returns and repeated
    * Verify/Bench invocations no longer leak /tmp parquet stores. */
  private def noveltyIncr(s: SparkSession, d: String): DataFrame = {
    val path = graft.SharedStages.newScratchDir("novelty_incr")
    // prior gram hashes come from the shared materialized pass
    // (SharedStages.priorGramSet) — in a real pipeline the prior
    // corpus' gram table is a maintained intermediate; what THIS query
    // prices per run is the store write + the pruned probe
    graft.sink.BucketStore.upsert(s,
      graft.SharedStages.priorGramSet(s, d, NovN), path, Seq("h"), NovBuckets)
    val out = noveltyProbeAgainst(s, d, path).localCheckpoint()
    graft.SharedStages.discardScratch(path)
    out
  }

  /** Steady-state form: probe against the STANDING per-(session, dir)
    * gram store ([[graft.SharedStages.noveltyGramStore]]) — what the
    * registry should price for an ingest loop's per-batch cost. The
    * store build is paid once by the first caller (bench warmup), like
    * any persistent membership table maintained by the pipeline. */
  private def noveltyProbe(s: SparkSession, d: String): DataFrame =
    noveltyProbeAgainst(s, d,
      graft.SharedStages.noveltyGramStore(s, d, NovN, NovBuckets))

  private val noveltyIncrSql = {
    val toks = tokensSql("text")
    val sh = shinglesSql("toks", NovN)
    s"""WITH tok AS (
       |  SELECT doc_id, $toks AS toks FROM documents),
       |grams AS (
       |  SELECT doc_id, unnest($sh) AS s FROM tok),
       |prior AS (
       |  SELECT DISTINCT ${portableHashSql("s")} AS h FROM grams
       |  WHERE doc_id % 2 = 0),
       |occ AS (
       |  SELECT DISTINCT doc_id, ${portableHashSql("s")} AS h FROM grams
       |  WHERE doc_id % 2 = 1)
       |SELECT o.doc_id, COUNT(*) AS n_grams,
       |  CAST(SUM(CASE WHEN p.h IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_new,
       |  CAST(SUM(CASE WHEN p.h IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
       |    / COUNT(*) AS novelty_ratio
       |FROM occ o LEFT JOIN prior p USING (h)
       |GROUP BY o.doc_id""".stripMargin
  }

  // --------------------------------------------------------- kmv_overlap
  // KMV sketch SET ALGEBRA — the reason KMV beats HLL when overlap
  // matters: two sources' k-min sketches compose into union and
  // intersection ESTIMATES without touching the raw sets. Per source,
  // the k smallest distinct gram hashes (the sketch — k longs, however
  // big the source); per source pair, the k-min of the merged sketches
  // IS the union's sketch (k-min of union = k-min of k-mins), so
  // |A∪B| ≈ (k−1)·2⁶⁰/h₍ₖ₎, and the fraction ρ of the union sketch
  // present in BOTH sides estimates |A∩B| ≈ ρ·|A∪B| (the standard KMV
  // intersection estimator). Everything is a pure function of the
  // deterministic portable hash — order-free and DuckDB-mirrored
  // branch-for-branch (exact when the union has < k distinct hashes).
  // The corpus-overlap triage report: which crawl sources duplicate
  // each other, priced at k longs per source instead of a pairwise
  // shingle join.
  private val KmvK = 64
  private val KmvMaxHash = 1152921504606846976L // 2^60 (15 hex digits)

  private def kmvOverlap(s: SparkSession, d: String): DataFrame = {
    // Shingle keyed by SOURCE directly: each input row is one document,
    // so ngramRows(source, text) emits the same (source, gram) stream the
    // former doc_id form produced — the sketch never needs the per-doc
    // identity, so the doc-keyed join that shipped the whole gram stream
    // (and forced its hash pass behind a 1-partition scan) is gone; the
    // parallelize spread puts the md5 pass on every core.
    val hashes = TextFunctions
      .ngramRows(Tables.parallelize(
        Tables.documents(s, d).select(col("source"), col("text"))),
        "source", "text", 3)
      .select(col("source"), portableHash(col("s")).as("h"))
      .distinct()
    val topk = hashes
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("h"))))
      .filter(col("rn") <= KmvK)
      .select(col("source"), col("h"))
    val srcs = topk.select(col("source")).distinct()
    val pairs = srcs.select(col("source").as("sa"))
      .crossJoin(srcs.select(col("source").as("sb")))
      .filter(col("sa") < col("sb")) // bounded: |sources|² tiny rows
    val merged = pairs
      .join(topk.select(col("source").as("sa"), col("h")), Seq("sa"))
      .select(col("sa"), col("sb"), col("h"), lit(1).as("tag_a"), lit(0).as("tag_b"))
      .unionByName(pairs
        .join(topk.select(col("source").as("sb"), col("h")), Seq("sb"))
        .select(col("sa"), col("sb"), col("h"), lit(0).as("tag_a"), lit(1).as("tag_b")))
      .groupBy(col("sa"), col("sb"), col("h"))
      .agg(max(col("tag_a")).as("in_a"), max(col("tag_b")).as("in_b"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("sa"), col("sb")).orderBy(col("h"))))
      .filter(col("rn") <= KmvK)
    merged
      .groupBy(col("sa").as("source_a"), col("sb").as("source_b"))
      .agg(count(lit(1)).as("n_kept"),
        max(col("h")).as("hk"),
        sum(col("in_a") * col("in_b")).cast("long").as("n_both"))
      .withColumn("union_est",
        when(col("n_kept") < KmvK, col("n_kept").cast("double"))
          .otherwise(lit(KmvK - 1).cast("double") *
            lit(KmvMaxHash).cast("double") / col("hk").cast("double")))
      .withColumn("inter_est",
        when(col("n_kept") < KmvK, col("n_both").cast("double"))
          .otherwise(col("n_both").cast("double") / lit(KmvK).cast("double")
            * col("union_est")))
      .select(col("source_a"), col("source_b"), col("n_kept"), col("n_both"),
        col("union_est"), col("inter_est"))
  }

  private val kmvOverlapSql = {
    val toks = tokensSql("text")
    val sh = shinglesSql("toks", 3)
    s"""WITH tok AS (
       |  SELECT doc_id, source, $toks AS toks FROM documents),
       |grams AS (
       |  SELECT source, unnest($sh) AS s FROM tok),
       |hashes AS (
       |  SELECT DISTINCT source, ${portableHashSql("s")} AS h FROM grams),
       |topk AS (
       |  SELECT source, h FROM (
       |    SELECT source, h,
       |      ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn
       |    FROM hashes) WHERE rn <= $KmvK),
       |srcs AS (SELECT DISTINCT source FROM topk),
       |pairs AS (
       |  SELECT a.source AS sa, b.source AS sb
       |  FROM srcs a JOIN srcs b ON a.source < b.source),
       |merged AS (
       |  SELECT sa, sb, h, MAX(tag_a) AS in_a, MAX(tag_b) AS in_b
       |  FROM (
       |    SELECT p.sa, p.sb, t.h, 1 AS tag_a, 0 AS tag_b
       |    FROM pairs p JOIN topk t ON t.source = p.sa
       |    UNION ALL
       |    SELECT p.sa, p.sb, t.h, 0 AS tag_a, 1 AS tag_b
       |    FROM pairs p JOIN topk t ON t.source = p.sb)
       |  GROUP BY 1, 2, 3),
       |kept AS (
       |  SELECT sa, sb, h, in_a, in_b FROM (
       |    SELECT sa, sb, h, in_a, in_b,
       |      ROW_NUMBER() OVER (PARTITION BY sa, sb ORDER BY h) AS rn
       |    FROM merged) WHERE rn <= $KmvK),
       |agg AS (
       |  SELECT sa AS source_a, sb AS source_b, COUNT(*) AS n_kept,
       |    MAX(h) AS hk,
       |    CAST(SUM(in_a * in_b) AS BIGINT) AS n_both
       |  FROM kept GROUP BY 1, 2),
       |est AS (
       |  SELECT source_a, source_b, n_kept, n_both,
       |    CASE WHEN n_kept < $KmvK THEN CAST(n_kept AS DOUBLE)
       |      ELSE CAST(${KmvK - 1} AS DOUBLE)
       |        * CAST($KmvMaxHash AS DOUBLE) / CAST(hk AS DOUBLE) END
       |      AS union_est
       |  FROM agg)
       |SELECT source_a, source_b, n_kept, n_both, union_est,
       |  CASE WHEN n_kept < $KmvK THEN CAST(n_both AS DOUBLE)
       |    ELSE CAST(n_both AS DOUBLE) / CAST($KmvK AS DOUBLE) * union_est
       |  END AS inter_est
       |FROM est""".stripMargin
  }

  // ---------------------------------------------------- lex_cosine_pairs
  // All-pairs lexical similarity through an inverted index (Elsayed/
  // Lin/Oard, ACL'08 pairwise-similarity-in-MapReduce): documents are
  // sparse trigram tf vectors; the pairwise dot product is computed by
  // joining posting lists term-by-term (pairs that share no trigram are
  // NEVER materialized), with a document-frequency cut dropping
  // ubiquitous terms — the standard df-pruning that bounds every
  // posting list to ≤ MaxDf entries and so bounds the join fan-out to
  // df² per term instead of |corpus|² overall. Cosine is defined over
  // the pruned term space: dot and both norms are exact BIGINT sums of
  // tf products (bit-portable — no float accumulation order to
  // diverge), and the only IEEE steps are one sqrt + one division,
  // mirrored in the oracle. Plan: zero-shuffle gram builder → one
  // doc-keyed tf aggregation → term-keyed exchange reused by the df
  // window and both posting-list sides → pair-keyed dot rollup; the
  // norm joins are doc-keyed hash joins. At 100 TB the df cut is the
  // lever: posting lists above it contribute O(df²) candidate pairs
  // each, so capping df caps the quadratic term by construction.
  // LexMaxDf is GATED, not guessed: lex_df_gate below sweeps the cap
  // over one shared tf pipeline and certifies (in both engines) the
  // smallest cap retaining ≥ LexRetainPct % of the widest setting's
  // scored pairs. At sf0.001/0.01/0.1 the gate picks 15 (100 %
  // retention at every measured SF); 25 is kept as the standing
  // production cap — one safety notch above the measured choice —
  // pending the sf10 sweep (BENCH_NOTES carries the numbers).
  private val LexN = 3
  private val LexMaxDf = 25
  private val LexMinCos = 0.5

  /** The corpus trigram tf pass + term-keyed df window, pruned at the
    * family's WIDEST cap — built once per (session, dir) via
    * [[graft.SharedStages.lexPruned]] and consumed by lex_cosine_pairs
    * (filtered to the production cap) and lex_df_gate (whole). The
    * materialization also serves the three-consumer problem the former
    * per-query localCheckpoint solved (both posting-list sides + the
    * norms rollup would otherwise each re-run the corpus gram pass). */
  private[graft] def buildLexPruned(s: SparkSession, d: String): DataFrame =
    TextFunctions.ngramRows(
        Tables.parallelize(Tables.documents(s, d)), "doc_id", "text", LexN)
      .groupBy(col("doc_id"), col("s")).agg(count(lit(1)).as("tf"))
      .repartition(col("s"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("s"))))
      .filter(col("df") <= LexDfCaps.max)

  private def lexCosinePairs(s: SparkSession, d: String): DataFrame = {
    // df is a pure function of the FULL tf table (a count per term), so
    // the production pruned@25 postings are exactly the df ≤ 25 subset
    // of the shared widest-cap materialization — bit-identical to
    // re-deriving at cap 25, without re-running the corpus gram pass.
    val pruned = graft.SharedStages.lexPruned(s, d)
      .filter(col("df") <= LexMaxDf)
      .select(col("doc_id"), col("s"), col("tf"))
    val norms = pruned.groupBy(col("doc_id"))
      .agg(sum(col("tf") * col("tf")).as("n2"))
    val a = pruned.select(col("s"), col("doc_id").as("a_id"),
      col("tf").as("a_tf"))
    val b = pruned.select(col("s"), col("doc_id").as("b_id"),
      col("tf").as("b_tf"))
    val dots = a.join(b, "s")
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(sum(col("a_tf") * col("b_tf")).as("dot"))
    dots
      .join(norms.select(col("doc_id").as("a_id"), col("n2").as("a_n2")),
        "a_id")
      .join(norms.select(col("doc_id").as("b_id"), col("n2").as("b_n2")),
        "b_id")
      .withColumn("cos", col("dot").cast("double") /
        sqrt(col("a_n2").cast("double") * col("b_n2").cast("double")))
      .filter(col("cos") >= LexMinCos)
      .select(col("a_id"), col("b_id"), col("dot"), col("cos"))
  }

  private val lexCosinePairsSql = {
    val toksS = tokensSql("text")
    val sh = shinglesSql("toks", LexN)
    s"""WITH tokd AS (
       |  SELECT doc_id, $toksS AS toks FROM documents),
       |grams AS (
       |  SELECT doc_id, unnest($sh) AS s FROM tokd),
       |tf AS (SELECT doc_id, s, COUNT(*) AS tf FROM grams GROUP BY 1, 2),
       |df AS (SELECT s, COUNT(*) AS df FROM tf GROUP BY 1),
       |pruned AS (
       |  SELECT tf.doc_id, tf.s, tf.tf FROM tf JOIN df USING (s)
       |  WHERE df.df <= $LexMaxDf),
       |norms AS (
       |  SELECT doc_id, CAST(SUM(tf * tf) AS BIGINT) AS n2
       |  FROM pruned GROUP BY 1),
       |dots AS (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       |    CAST(SUM(a.tf * b.tf) AS BIGINT) AS dot
       |  FROM pruned a JOIN pruned b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT a_id, b_id, dot,
       |  CAST(dot AS DOUBLE)
       |    / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)) AS cos
       |FROM dots
       |JOIN norms na ON na.doc_id = a_id
       |JOIN norms nb ON nb.doc_id = b_id
       |WHERE CAST(dot AS DOUBLE)
       |    / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE))
       |  >= $LexMinCos""".stripMargin
  }

  // ------------------------------------------------------- lex_df_gate
  // The measure→act gate for lex_cosine_pairs' df cap — the one tuning
  // lever of the posting-list join's quadratic term (each term
  // contributes O(df²) candidate pairs; the cap bounds it by
  // construction), in the lsh_width / ivf_nprobe_gate mold: sweep
  // MaxDf ∈ {15, 25, 50} off ONE shared tf pipeline and report, per
  // cap, the terms kept, the candidate-pair mass Σ df·(df−1)/2 (the
  // actual join cost), and the scored pairs retained (cos ≥ τ under
  // that cap's term space) — then CHOOSE the smallest cap whose
  // retained count clears LexRetainPct % of the widest setting's, by
  // exact integer comparison, so both engines must derive the same
  // choice. The sweep costs ONE pair join at the widest cap, not
  // three: a pair's dot/norms under cap c are conditional sums over
  // `df ≤ c` inside the same rollup (a pair sharing only (c, 50]-df
  // terms gets dot_c = 0 and drops, exactly as a from-scratch run at
  // cap c would produce). Plan: the same gram pass / term exchange /
  // pair rollup as lex_cosine_pairs, three conditional sums wider;
  // output is |caps| rows at any corpus size.
  private val LexDfCaps = Seq(15, 25, 50)
  private val LexRetainPct = 90

  private def lexDfGate(s: SparkSession, d: String): DataFrame = {
    val widest = LexDfCaps.max
    // one materialized posting table for FIVE consumers (two posting
    // sides, two norm joins' source, the df table) — built once per
    // (session, dir) and shared with lex_cosine_pairs
    // ([[graft.SharedStages.lexPruned]]); without the materialization
    // the plan pin showed the corpus gram pass scheduled five times
    val pruned = graft.SharedStages.lexPruned(s, d)
    val norms = pruned.groupBy(col("doc_id"))
      .agg(
        sum(when(col("df") <= LexDfCaps.head, col("tf") * col("tf"))
          .otherwise(0L)).as(s"n2_${LexDfCaps.head}"),
        LexDfCaps.tail.map(c =>
          sum(when(col("df") <= c, col("tf") * col("tf")).otherwise(0L))
            .as(s"n2_$c")): _*)
    val a = pruned.select(col("s"), col("df"), col("doc_id").as("a_id"),
      col("tf").as("a_tf"))
    val b = pruned.select(col("s"), col("doc_id").as("b_id"),
      col("tf").as("b_tf"))
    val dots = a.join(b, "s")
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(
        sum(when(col("df") <= LexDfCaps.head, col("a_tf") * col("b_tf"))
          .otherwise(0L)).as(s"dot_${LexDfCaps.head}"),
        LexDfCaps.tail.map(c =>
          sum(when(col("df") <= c, col("a_tf") * col("b_tf")).otherwise(0L))
            .as(s"dot_$c")): _*)
    val scored = dots
      .join(norms.select(col("doc_id").as("a_id") +:
        LexDfCaps.map(c => col(s"n2_$c").as(s"a_n2_$c")): _*), "a_id")
      .join(norms.select(col("doc_id").as("b_id") +:
        LexDfCaps.map(c => col(s"n2_$c").as(s"b_n2_$c")): _*), "b_id")
    // coalesce: a corpus with zero candidate pairs makes the global
    // sums NULL in both engines; the gate must still choose (→ 0s,
    // smallest cap wins trivially)
    def retainedAt(c: Int) =
      coalesce(sum(when(col(s"dot_$c") > 0 &&
        col(s"dot_$c").cast("double") /
          sqrt(col(s"a_n2_$c").cast("double") * col(s"b_n2_$c").cast("double"))
          >= LexMinCos, 1L).otherwise(0L)), lit(0L)).as(s"ret_$c")
    val rets = scored.agg(retainedAt(LexDfCaps.head),
      LexDfCaps.tail.map(retainedAt): _*)
    val dfTbl = pruned.select(col("s"), col("df")).distinct()
    val terms = dfTbl.agg(
      sum(when(col("df") <= LexDfCaps.head, 1L).otherwise(0L))
        .as(s"terms_${LexDfCaps.head}"),
      LexDfCaps.tail.map(c =>
        sum(when(col("df") <= c, 1L).otherwise(0L)).as(s"terms_$c")) ++
      LexDfCaps.map(c =>
        sum(when(col("df") <= c, expr("df * (df - 1) DIV 2")).otherwise(0L))
          .as(s"mass_$c")): _*)
    val one = rets.crossJoin(terms)
      .withColumn("chosen_cap",
        LexDfCaps.init.foldRight(lit(widest)) { (c, rest) =>
          when(col(s"ret_$c") * 100 >= col(s"ret_$widest") * LexRetainPct,
            lit(c)).otherwise(rest)
        })
    // NB foldRight builds when(15)...when(25)...otherwise(50) — but a
    // foldRight chain nests the SMALLEST cap outermost, which is the
    // "smallest satisfying cap wins" rule exactly
    one.select(explode(array(LexDfCaps.map(c => struct(
        lit(c.toLong).as("max_df"),
        col(s"terms_$c").as("n_terms"),
        col(s"mass_$c").as("cand_mass"),
        col(s"ret_$c").as("n_pairs"),
        col(s"ret_$widest").as("n_pairs_widest"),
        (lit(c) === col("chosen_cap")).as("chosen"))): _*)).as("r"))
      .select(col("r.*"))
  }

  private val lexDfGateSql = {
    val toksS = tokensSql("text")
    val sh = shinglesSql("toks", LexN)
    val widest = LexDfCaps.max
    val n2Cols = LexDfCaps.map(c =>
      s"CAST(SUM(CASE WHEN df <= $c THEN tf * tf ELSE 0 END) AS BIGINT) AS n2_$c")
      .mkString(",\n    ")
    val dotCols = LexDfCaps.map(c =>
      s"CAST(SUM(CASE WHEN a.df <= $c THEN a.tf * b.tf ELSE 0 END) AS BIGINT) AS dot_$c")
      .mkString(",\n    ")
    val retCols = LexDfCaps.map(c =>
      s"""CAST(COALESCE(SUM(CASE WHEN dot_$c > 0 AND CAST(dot_$c AS DOUBLE)
         |      / sqrt(CAST(a_n2_$c AS DOUBLE) * CAST(b_n2_$c AS DOUBLE))
         |      >= $LexMinCos THEN 1 ELSE 0 END), 0) AS BIGINT) AS ret_$c""".stripMargin)
      .mkString(",\n    ")
    val termCols = (LexDfCaps.map(c =>
      s"CAST(SUM(CASE WHEN df <= $c THEN 1 ELSE 0 END) AS BIGINT) AS terms_$c") ++
      LexDfCaps.map(c =>
        s"CAST(SUM(CASE WHEN df <= $c THEN df * (df - 1) // 2 ELSE 0 END) AS BIGINT) AS mass_$c"))
      .mkString(",\n    ")
    val chosen = LexDfCaps.init.foldRight(widest.toString) { (c, rest) =>
      s"CASE WHEN ret_$c * 100 >= ret_$widest * $LexRetainPct THEN $c ELSE $rest END"
    }
    val perCap = (col: String) => LexDfCaps.init.foldRight(s"${col}_$widest") {
      (c, rest) => s"CASE WHEN u.max_df = $c THEN ${col}_$c ELSE $rest END"
    }
    // AS MATERIALIZED (DuckDB-only syntax; the oracle never runs in
    // Spark): tf is read by df + pruned and pruned by norms + both dot
    // sides — inlined, DuckDB recomputes the corpus gram pipeline per
    // reference, which blew an 85+ GB temp spill at the sf10 surrogate;
    // materialized once, the same query fits and hash-matches there.
    s"""WITH tokd AS (
       |  SELECT doc_id, $toksS AS toks FROM documents),
       |grams AS (
       |  SELECT doc_id, unnest($sh) AS s FROM tokd),
       |tf AS MATERIALIZED (
       |  SELECT doc_id, s, COUNT(*) AS tf FROM grams GROUP BY 1, 2),
       |df AS (SELECT s, COUNT(*) AS df FROM tf GROUP BY 1),
       |pruned AS MATERIALIZED (
       |  SELECT tf.doc_id, tf.s, tf.tf, df.df FROM tf JOIN df USING (s)
       |  WHERE df.df <= $widest),
       |norms AS (
       |  SELECT doc_id,
       |    $n2Cols
       |  FROM pruned GROUP BY 1),
       |dots AS (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       |    $dotCols
       |  FROM pruned a JOIN pruned b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT d.*,
       |    ${LexDfCaps.map(c => s"na.n2_$c AS a_n2_$c").mkString(", ")},
       |    ${LexDfCaps.map(c => s"nb.n2_$c AS b_n2_$c").mkString(", ")}
       |  FROM dots d
       |  JOIN norms na ON na.doc_id = d.a_id
       |  JOIN norms nb ON nb.doc_id = d.b_id),
       |rets AS (
       |  SELECT
       |    $retCols
       |  FROM scored),
       |terms AS (
       |  SELECT
       |    $termCols
       |  FROM df WHERE df <= $widest),
       |pick AS (SELECT $chosen AS chosen_cap FROM rets)
       |SELECT CAST(u.max_df AS BIGINT) AS max_df,
       |  ${perCap("terms")} AS n_terms,
       |  ${perCap("mass")} AS cand_mass,
       |  ${perCap("ret")} AS n_pairs,
       |  ret_$widest AS n_pairs_widest,
       |  u.max_df = chosen_cap AS chosen
       |FROM rets, terms, pick,
       |  (SELECT unnest([${LexDfCaps.mkString(", ")}]) AS max_df) u""".stripMargin
  }

  val all: Seq[QueryDef] = Seq(
    QueryDef("hll_distinct", hllDistinct, Some(hllDistinctSql)),
    QueryDef("lex_df_gate", lexDfGate, Some(lexDfGateSql)),
    QueryDef("winnow_fingerprint",
      (s, d) => graft.SharedStages.winnowFingerprints(s, d),
      Some(winnowFingerprintSql)),
    QueryDef("winnow_pairs", winnowPairs, Some(winnowPairsSql)),
    QueryDef("ngram_novelty", ngramNovelty, Some(ngramNoveltySql)),
    QueryDef("novelty_incr", noveltyIncr, Some(noveltyIncrSql)),
    QueryDef("novelty_probe", noveltyProbe, Some(noveltyIncrSql)),
    QueryDef("kmv_overlap", kmvOverlap, Some(kmvOverlapSql)),
    QueryDef("lex_cosine_pairs", lexCosinePairs, Some(lexCosinePairsSql)))
}
