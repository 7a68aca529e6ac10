package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.TextFunctions._

/** Round-5 curation-quality operators: PII redaction, robust
  * (median/MAD) outlier gating, BM25 retrieval, and the char-diversity
  * quality gate over the native [[graft.functions.CharDiversity]]
  * expression. All map-only or broadcast-joined except the two exact
  * order-statistic medians (documented scale caveat, as q9).
  */
object QualityQueries {

  // ---------------------------------------------------------- pii_redact
  // PII scrub — the mandatory pre-training hygiene pass: count + redact
  // emails, phone numbers and IPv4s with sequential regexp_replace
  // (email → phone → ip), emitting per-doc match counts and the
  // redacted text's length + md5 so the oracle checks the actual
  // rewritten bytes, not just counts. The synthetic corpus carries no
  // PII, so the query injects deterministic doc_id-derived PII into the
  // text first — BOTH engines build the identical string, making this a
  // real parity gate on the regex engines (Java util.regex vs RE2:
  // patterns below avoid constructs where they diverge — no lookaround,
  // no backrefs). Map-only; at 100 TB this is a pure scan-rewrite.
  private val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhonePat = "\\b\\d{3}-\\d{4}\\b"
  private val IpPat    = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  private def piiRedact(s: SparkSession, d: String): DataFrame = {
    val injected = concat(
      col("text"), lit(" contact u"), col("doc_id").cast("string"),
      lit("@example.com or 555-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
      lit(" ip 10."), (col("doc_id") % 256).cast("string"),
      lit(".0."), ((col("doc_id") * 7) % 256).cast("string"))
    Tables.parallelize(Tables.documents(s, d))
      .withColumn("t2", injected)
      .withColumn("red",
        regexp_replace(
          regexp_replace(
            regexp_replace(col("t2"), EmailPat, "<EMAIL>"),
            PhonePat, "<PHONE>"),
          IpPat, "<IP>"))
      .select(
        col("doc_id"),
        regexp_count(col("t2"), lit(EmailPat)).cast("long").as("n_email"),
        regexp_count(col("t2"), lit(PhonePat)).cast("long").as("n_phone"),
        regexp_count(col("t2"), lit(IpPat)).cast("long").as("n_ip"),
        length(col("red")).cast("long").as("red_len"),
        md5(col("red")).as("red_hash"))
  }

  // DuckDB single-quoted strings are escape-free: the Scala "\\b"
  // renders as \b and passes to RE2 verbatim.
  private val piiRedactSql =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    text || ' contact u' || doc_id || '@example.com or 555-' ||
       |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
       |    ' ip 10.' || (doc_id % 256) || '.0.' || ((doc_id * 7) % 256) AS t2
       |  FROM documents),
       |r AS (
       |  SELECT doc_id, t2,
       |    regexp_replace(
       |      regexp_replace(
       |        regexp_replace(t2, '$EmailPat', '<EMAIL>', 'g'),
       |        '$PhonePat', '<PHONE>', 'g'),
       |      '$IpPat', '<IP>', 'g') AS red
       |  FROM t)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(t2, '$EmailPat')) AS BIGINT) AS n_email,
       |  CAST(len(regexp_extract_all(t2, '$PhonePat')) AS BIGINT) AS n_phone,
       |  CAST(len(regexp_extract_all(t2, '$IpPat')) AS BIGINT) AS n_ip,
       |  CAST(length(red) AS BIGINT) AS red_len,
       |  md5(red) AS red_hash
       |FROM r""".stripMargin

  // --------------------------------------------------------- outlier_mad
  // Robust outlier gate: per event_type, median and MAD via the
  // reference's discrete sorted[floor(n·p)] order statistic (q9's
  // definition — an actual data value, no interpolation, bit-exact),
  // flag rows with |value − med| > 4.4478·MAD (3σ under normality;
  // 4.4478 = 3·1.4826 as one literal so both engines parse the same
  // double). Two medians = two per-type sort windows — the same
  // deliberate exactness-twin skew as q9 (5 groups); the mergeable
  // production route is t-digest quantiles (q17).
  private def outlierMad(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("event_type"), col("value"), col("event_id"))
    def medOf(df: DataFrame, valueCol: String, out: String): DataFrame = {
      val w  = Window.partitionBy(col("event_type")).orderBy(col(valueCol), col("event_id"))
      val wn = Window.partitionBy(col("event_type"))
      df.withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(wn))
        .filter(col("rn") === expr("((n * 50) DIV 100) + 1"))
        .select(col("event_type"), col(valueCol).as(out))
    }
    val med = medOf(ev, "value", "med")
    val dev = ev.join(broadcast(med), "event_type")
      .withColumn("adev", abs(col("value") - col("med")))
    val mad = medOf(dev, "adev", "mad")
    dev.join(broadcast(mad), "event_type")
      .filter(col("adev") > lit(4.4478) * col("mad"))
      .select(col("event_id"), col("event_type"), col("value"),
        col("med"), col("mad"))
  }

  private val outlierMadSql =
    """WITH ranked AS (
      |  SELECT event_type, value, event_id,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n
      |  FROM events),
      |med AS (
      |  SELECT event_type, value AS med FROM ranked
      |  WHERE rn = ((n * 50) // 100) + 1),
      |dev AS (
      |  SELECT e.event_id, e.event_type, e.value, m.med,
      |    abs(e.value - m.med) AS adev
      |  FROM events e JOIN med m ON e.event_type = m.event_type),
      |ranked2 AS (
      |  SELECT event_type, adev, event_id,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY adev, event_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n
      |  FROM dev),
      |mad AS (
      |  SELECT event_type, adev AS mad FROM ranked2
      |  WHERE rn = ((n * 50) // 100) + 1)
      |SELECT d.event_id, d.event_type, d.value, d.med, ma.mad
      |FROM dev d JOIN mad ma ON d.event_type = ma.event_type
      |WHERE d.adev > CAST(4.4478 AS DOUBLE) * ma.mad""".stripMargin

  // ----------------------------------------------------------- bm25_topk
  // BM25 retrieval (k1=1.2, b=0.75) for a fixed conjunctive query over
  // the corpus, top-10 docs. The idf is the RATIONAL BM25+ form
  // (N−df+0.5)/(df+0.5) — division is IEEE-exact across engines where
  // libm log is not (same policy as tfidf_top_terms). The per-doc score
  // sums the per-term scores in FIXED lexical term order via
  // conditional aggregation (float addition is not associative; a
  // groupBy SUM's order is partition-dependent). Plan: one tokenize
  // pass, 3-row df table broadcast, scalar N/avgdl from two footer-ish
  // aggregates, TakeOrdered top-10.
  private val Bm25Terms = Seq("spark", "query", "join") // lexical order
  private val Bm25K = 10

  /** Per-doc BM25 scores for [[Bm25Terms]]: (doc_id, s_<term>…, score).
    * Shared by bm25_topk (top-10 report) and hybrid_rrf (lexical arm of
    * the rank fusion) — via the materialized
    * [[graft.SharedStages.bm25PerDoc]], so the tokenize pass, the two
    * driver scalars (N, avgdl) and the scoring rollup run once per
    * (session, dir), not once per consumer. */
  private def bm25PerDoc(s: SparkSession, d: String): DataFrame =
    graft.SharedStages.bm25PerDoc(s, d)

  private[graft] def buildBm25PerDoc(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val nDocs = docs.count()
    val toks = Tables.parallelize(docs)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).cast("long").as("dl"))
    val totalTokens =
      toks.agg(sum(col("dl"))).first().getLong(0)
    val avgdl = totalTokens.toDouble / nDocs
    val tf = toks
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(Bm25Terms: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = ((lit(nDocs) - col("df")).cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5))
    val denom = col("tf").cast("double") +
      lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl").cast("double") / lit(avgdl)))
    val scored = tf.join(broadcast(df.withColumn("idf", idf)), "term")
      .withColumn("w", col("idf") * ((col("tf").cast("double") * lit(2.2)) / denom))
    def termScore(t: String): Column =
      coalesce(max(when(col("term") === t, col("w"))), lit(0.0))
    val perDoc = scored.groupBy(col("doc_id"))
      .agg(Bm25Terms.map(t => termScore(t).as(s"s_$t")).head,
        Bm25Terms.map(t => termScore(t).as(s"s_$t")).tail: _*)
      .withColumn("score",
        Bm25Terms.map(t => col(s"s_$t")).reduceLeft(_ + _))
    perDoc
  }

  private def bm25Topk(s: SparkSession, d: String): DataFrame =
    bm25PerDoc(s, d)
      .orderBy(col("score").desc, col("doc_id"))
      .select(col("doc_id") +: col("score") +:
        Bm25Terms.map(t => col(s"s_$t")): _*)
      .limit(Bm25K)

  private val bm25ScoreSumSql =
    Bm25Terms.map(t => s"s_$t").reduceLeft((a, b) => s"($a + $b)")

  /** DuckDB CTE chain ending in `per_doc(doc_id, s_<term>…)` — the
    * oracle mirror of [[bm25PerDoc]], shared by the bm25_topk and
    * hybrid_rrf oracles. */
  private val bm25PerDocCtesSql = {
    val toks = tokensSql("text")
    val termList = Bm25Terms.map(t => s"'$t'").mkString(", ")
    val termCols = Bm25Terms.map(t =>
      s"COALESCE(MAX(CASE WHEN term = '$t' THEN w END), CAST(0 AS DOUBLE)) AS s_$t")
      .mkString(",\n    ")
    s"""toks AS (
       |  SELECT doc_id, $toks AS toks FROM documents),
       |dl AS (
       |  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS dl FROM toks),
       |consts AS (
       |  SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
       |    CAST((SELECT CAST(SUM(dl) AS BIGINT) FROM dl) AS DOUBLE)
       |      / (SELECT COUNT(*) FROM documents) AS avgdl),
       |tf AS (
       |  SELECT doc_id, dl, term, COUNT(*) AS tf
       |  FROM (SELECT doc_id, dl, unnest(toks) AS term FROM dl)
       |  WHERE term IN ($termList)
       |  GROUP BY 1, 2, 3),
       |df AS (
       |  SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
       |scored AS (
       |  SELECT tf.doc_id, tf.term,
       |    ((CAST(c.n_docs - df.df AS DOUBLE) + 0.5) / (CAST(df.df AS DOUBLE) + 0.5)) *
       |    ((CAST(tf.tf AS DOUBLE) * CAST(2.2 AS DOUBLE)) /
       |     (CAST(tf.tf AS DOUBLE) + CAST(1.2 AS DOUBLE) *
       |      (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) *
       |       (CAST(tf.dl AS DOUBLE) / c.avgdl)))) AS w
       |  FROM tf JOIN df ON tf.term = df.term CROSS JOIN consts c),
       |per_doc AS (
       |  SELECT doc_id,
       |    $termCols
       |  FROM scored GROUP BY doc_id)""".stripMargin
  }

  private val bm25TopkSql =
    s"""WITH $bm25PerDocCtesSql
       |SELECT doc_id, $bm25ScoreSumSql AS score,
       |  ${Bm25Terms.map(t => s"s_$t").mkString(", ")}
       |FROM per_doc
       |ORDER BY score DESC, doc_id
       |LIMIT $Bm25K""".stripMargin

  // ----------------------------------------------------------- hybrid_rrf
  // Hybrid retrieval via reciprocal-rank fusion (Cormack/Clarke/Büttcher,
  // SIGIR'09): fuse the BM25 lexical ranking with an embedding-cosine
  // semantic ranking as Σ 1/(60 + rank), the standard ensembling step a
  // curation/RAG pipeline runs over heterogeneous retrievers. Each arm
  // contributes its top-[[RrfPool]] pool; docs missing from an arm get
  // no contribution from it (ranks stay NULL in the report). RRF is
  // pure rational arithmetic — two exact divisions and one IEEE add in
  // fixed (lexical, semantic) order — so the fusion is oracle-exact.
  // Scale shape: each arm ends in a global top-50 (TakeOrdered — map-
  // side bounded heaps, no full sort), ranks are then assigned by a
  // window over the 50-row materialized pool (single partition over a
  // CONSTANT-size set — not data-sized), and the fusion join is
  // 50×50-bounded. The semantic arm broadcasts the 1-row query vector
  // and scores map-only, same family as knn_topk.
  private val RrfK = 60
  private val RrfPool = 50
  private val RrfOut = 10

  private def hybridRrf(s: SparkSession, d: String): DataFrame = {
    import graft.embed.Similarity
    val lexPool = bm25PerDoc(s, d)
      .select(col("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(RrfPool)
      .localCheckpoint() // RrfPool rows
    val lexRank = lexPool
      .withColumn("r_lex", row_number()
        .over(Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("r_lex"))
    val emb = Tables.embeddings(s, d)
    val q = Similarity.quantized(emb.filter(col("vec_id") === 0),
        "vec_id", "embedding")
      .select(col("q").as("qa"), col("nq").as("na"))
    val scored = Similarity.quantized(emb.filter(col("vec_id") =!= 0),
        "vec_id", "embedding")
      .join(broadcast(q))
      .withColumn("cos",
        Similarity.cosine(Similarity.dotQ("qa", "q"), col("na"), col("nq")))
      .select(col("vec_id").as("doc_id"), col("cos"))
    val semPool = scored
      .orderBy(col("cos").desc, col("doc_id"))
      .limit(RrfPool)
      .localCheckpoint() // RrfPool rows
    val semRank = semPool
      .withColumn("r_sem", row_number()
        .over(Window.orderBy(col("cos").desc, col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("r_sem"))
    lexRank.join(semRank, Seq("doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(RrfK) + col("r_lex")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfK) + col("r_sem")), lit(0.0)))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(RrfOut)
      .select(col("doc_id"), col("r_lex"), col("r_sem"), col("rrf"))
  }

  private val hybridRrfSql = {
    import graft.embed.Similarity
    s"""WITH $bm25PerDocCtesSql,
       |${Similarity.duckdbQuantizedCte},
       |lex_pool AS (
       |  SELECT doc_id, $bm25ScoreSumSql AS score FROM per_doc
       |  ORDER BY score DESC, doc_id LIMIT $RrfPool),
       |lex_rank AS (
       |  SELECT doc_id,
       |    ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS r_lex
       |  FROM lex_pool),
       |sem_scored AS (
       |  SELECT b.vec_id AS doc_id,
       |    CAST(${Similarity.duckdbDot("a.q", "b.q")} AS DOUBLE)
       |      / sqrt(CAST(a.nq AS DOUBLE) * CAST(b.nq AS DOUBLE)) AS cos
       |  FROM qv a JOIN qv b ON a.vec_id = 0 AND b.vec_id <> 0),
       |sem_pool AS (
       |  SELECT doc_id, cos FROM sem_scored
       |  ORDER BY cos DESC, doc_id LIMIT $RrfPool),
       |sem_rank AS (
       |  SELECT doc_id,
       |    ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id) AS r_sem
       |  FROM sem_pool),
       |fused AS (
       |  SELECT COALESCE(l.doc_id, r.doc_id) AS doc_id, l.r_lex, r.r_sem,
       |    COALESCE(CAST(1 AS DOUBLE) / ($RrfK + l.r_lex), CAST(0 AS DOUBLE))
       |      + COALESCE(CAST(1 AS DOUBLE) / ($RrfK + r.r_sem), CAST(0 AS DOUBLE))
       |      AS rrf
       |  FROM lex_rank l FULL OUTER JOIN sem_rank r ON l.doc_id = r.doc_id)
       |SELECT doc_id, r_lex, r_sem, rrf FROM fused
       |ORDER BY rrf DESC, doc_id
       |LIMIT $RrfOut""".stripMargin
  }

  // ------------------------------------------------------ char_diversity
  // Char-distribution quality gate over the native one-pass
  // [[graft.functions.CharDiversity]] expression: code-point count,
  // distinct count, Σcount² — and from those integers the Simpson
  // diversity 1 − Σp² and distinct ratio as single IEEE divisions
  // (rational, bit-exact; no entropy/log parity risk). The oracle
  // recomputes the histogram the relational way (per-char unnest +
  // groupBy) — structurally independent evidence the one-pass loop is
  // right. Map-only at scale vs the oracle's n_chars-row explode.
  private def charDiversity(s: SparkSession, d: String): DataFrame =
    Tables.parallelize(Tables.documents(s, d))
      .withColumn("cd", expr("char_diversity(text)"))
      .select(
        col("doc_id"),
        col("cd.n_chars").as("n_cp"),
        col("cd.n_distinct").as("n_distinct"),
        col("cd.sum_sq").as("sum_sq"))
      .withColumn("simpson",
        when(col("n_cp") > 0,
          lit(1.0) - col("sum_sq").cast("double") /
            (col("n_cp").cast("double") * col("n_cp").cast("double"))))
      .withColumn("distinct_ratio",
        when(col("n_cp") > 0, col("n_distinct").cast("double") / col("n_cp")))

  private val charDiversitySql =
    """WITH ch AS (
      |  SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents),
      |cc AS (
      |  SELECT doc_id, c, COUNT(*) AS cnt FROM ch GROUP BY 1, 2),
      |st AS (
      |  SELECT doc_id,
      |    CAST(SUM(cnt) AS BIGINT) AS n_cp,
      |    CAST(COUNT(*) AS BIGINT) AS n_distinct,
      |    CAST(SUM(cnt * cnt) AS BIGINT) AS sum_sq
      |  FROM cc GROUP BY 1)
      |SELECT d.doc_id,
      |  COALESCE(st.n_cp, 0) AS n_cp,
      |  COALESCE(st.n_distinct, 0) AS n_distinct,
      |  COALESCE(st.sum_sq, 0) AS sum_sq,
      |  CASE WHEN COALESCE(st.n_cp, 0) > 0 THEN
      |    CAST(1 AS DOUBLE) - CAST(st.sum_sq AS DOUBLE) /
      |      (CAST(st.n_cp AS DOUBLE) * CAST(st.n_cp AS DOUBLE)) END AS simpson,
      |  CASE WHEN COALESCE(st.n_cp, 0) > 0 THEN
      |    CAST(st.n_distinct AS DOUBLE) / st.n_cp END AS distinct_ratio
      |FROM documents d LEFT JOIN st ON d.doc_id = st.doc_id""".stripMargin

  // ------------------------------------------------------- ccnet_buckets
  // CCNet-style per-language quality bucketing (Wenzek et al. 2020):
  // within each language, rank documents by an LM quality signal and
  // split into head/middle/tail terciles — the standard pre-training
  // corpus partitioning ("train on head+middle, drop tail"). The LM
  // signal is the corpus-LM rarity ratio ([[graft.SharedStages
  // .lmRareReport]] — shared with lm_rare_bigrams and the curation
  // funnel, built once per session): low rare-bigram ratio ≈ low
  // perplexity ≈ head. NTILE runs per-language (a partitioned window —
  // each language sorts independently, the same per-key discipline as
  // every keyed window here); the exact-NTILE-vs-digest-boundary
  // tradeoff documented at quality_deciles applies unchanged when one
  // language dominates at 100 TB. Report totals are exact BIGINT sums
  // (doc/char/bigram counts) — no float accumulation to diverge.
  private def ccnetBuckets(s: SparkSession, d: String): DataFrame = {
    val lm = graft.SharedStages.lmRareReport(s, d)
      .select(col("doc_id"), col("n_bigrams"), col("n_rare"),
        col("rare_ratio"))
    val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"),
      col("n_chars"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("rare_ratio"), col("doc_id"))
    lm.join(docs, "doc_id")
      .withColumn("bucket",
        element_at(array(lit("head"), lit("middle"), lit("tail")),
          ntile(3).over(w)))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("chars_total"),
        sum(col("n_rare")).cast("long").as("rare_total"),
        sum(col("n_bigrams")).cast("long").as("bigrams_total"))
  }

  private val ccnetBucketsSql =
    s"""WITH lm AS (${graft.queries.FingerprintQueries.lmRareBigramsSql}),
       |ranked AS (
       |  SELECT d.lang, d.n_chars, lm.n_bigrams, lm.n_rare,
       |    (['head', 'middle', 'tail'])[
       |      NTILE(3) OVER (PARTITION BY d.lang
       |                     ORDER BY lm.rare_ratio, lm.doc_id)] AS bucket
       |  FROM lm JOIN documents d ON d.doc_id = lm.doc_id)
       |SELECT lang, bucket, COUNT(*) AS n_docs,
       |  CAST(SUM(n_chars) AS BIGINT) AS chars_total,
       |  CAST(SUM(n_rare) AS BIGINT) AS rare_total,
       |  CAST(SUM(n_bigrams) AS BIGINT) AS bigrams_total
       |FROM ranked GROUP BY 1, 2""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("ccnet_buckets", ccnetBuckets, Some(ccnetBucketsSql)),
    QueryDef("pii_redact", piiRedact, Some(piiRedactSql)),
    QueryDef("outlier_mad", outlierMad, Some(outlierMadSql)),
    QueryDef("bm25_topk", bm25Topk, Some(bm25TopkSql)),
    QueryDef("hybrid_rrf", hybridRrf, Some(hybridRrfSql)),
    QueryDef("char_diversity", charDiversity, Some(charDiversitySql)))
}
