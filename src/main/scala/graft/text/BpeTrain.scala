package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions.tokens

/** Iterated BPE vocabulary training — the loop completing the
  * tokenizer family (`bpe_merge_step` is one iteration of this):
  * learn [[NMerges]] merges over the corpus word multiset, then
  * tokenize the corpus with the learned merges.
  *
  * Algorithm (the standard byte-pair-encoding induction, Sennrich et
  * al. 2016, restricted to an explicit alphabet): words become
  * delimiter-separated symbol sequences; each round counts adjacent
  * symbol pairs weighted by word frequency, picks the most frequent
  * pair (ties: lexicographically smallest), and rewrites every
  * non-overlapping occurrence into the merged symbol.
  *
  * Scale shapes, in order of importance at 100 TB:
  *   - Training runs on the DISTINCT-word frequency table, not the
  *     token stream — the classic BPE trick: pair-counting volume is
  *     Σ|distinct words|, independent of corpus repetition.
  *   - Each round is one map-side-combining aggregation plus a top-1
  *     (TakeOrderedAndProject); only ONE row crosses to the driver per
  *     round. The merge rewrite is a map-only string `replace`.
  *   - The word table's lineage is cut every [[CheckpointEvery]]
  *     rounds (localCheckpoint) so the replay plan stays shallow.
  *
  * Determinism/oracle discipline: the merge rewrite is TWO passes of
  * literal left-to-right `replace` on the delimited form — both
  * engines' `replace` is non-overlapping left-to-right, and two passes
  * make the matching inclusion-maximal (a single pass misses every
  * second occurrence in a chain because adjacent matches share the
  * delimiter). On runs of self-pairs (`aaaa…`) this picks a
  * different — still maximal, still deterministic — matching than
  * textbook greedy-left; documented rather than hidden. The DuckDB
  * oracle replays every round as unrolled MATERIALIZED CTEs (the
  * IvfTrain discipline), so the learned merges are hash-gated, not
  * trusted.
  *
  * The alphabet gate (`[A-Za-z0-9]+`) keeps symbol splitting to ASCII
  * — the standard pre-tokenizer alphabet restriction — and dodges the
  * JVM-code-unit vs RE2-codepoint mismatch on astral characters.
  */
object BpeTrain {
  val NMerges = 12
  val VocabK = 40 // bpe_tokenize: top-k learned-vocabulary report
  val CheckpointEvery = 4
  /** Symbol delimiter: U+001F (unit separator) — cannot appear in the
    * alphabet-gated words. */
  val Sep = "\u001f"

  final case class Trained(
      merges: Seq[(Int, String, String, Long)], // (rank, a, b, pair_count)
      finalWords: DataFrame) // (sym, freq) after all merges

  /** The alphabet-gated distinct-word frequency table with each word
    * in its delimited character-symbol form ("low" → "␟l␟o␟w␟"). */
  private[graft] def wordTable(s: SparkSession, d: String): DataFrame =
    graft.Tables.parallelize(graft.Tables.documents(s, d))
      .select(explode(tokens(col("text"))).as("word"))
      .filter(col("word").rlike("^[A-Za-z0-9]+$"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .withColumn("sym",
        concat(regexp_replace(col("word"), "(.)", Sep + "$1"), lit(Sep)))
      .select(col("sym"), col("freq"))

  /** Adjacent-symbol pair counts of a delimited word table. */
  private def pairCounts(wf: DataFrame): DataFrame =
    wf.withColumn("s", expr(s"filter(split(sym, '$Sep'), x -> x <> '')"))
      .filter(size(col("s")) >= 2)
      .select(col("freq"), explode(expr(
        "transform(sequence(0, size(s) - 2), i -> struct(s[i] AS a, s[i + 1] AS b))"))
        .as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("c"))

  /** Learn [[NMerges]] merges. One distributed top-1 job per round;
    * the rewritten word table stays distributed throughout. */
  def train(s: SparkSession, d: String): Trained =
    trainFromWords(wordTable(s, d), NMerges)

  /** Training core over any delimited word table (sym, freq) —
    * the seam BpeTrainSpec drives with hand-built fixtures. */
  private[graft] def trainFromWords(wf0: DataFrame, nMerges: Int): Trained = {
    var wf = wf0
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    for (rank <- 1 to nMerges) {
      val top = pairCounts(wf)
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(1).collect()
      require(top.nonEmpty,
        s"BPE pair table dried up at rank $rank — corpus too small for $nMerges merges")
      val (a, b, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
      merges += ((rank, a, b, c))
      // two literal passes = inclusion-maximal non-overlapping rewrite
      // (alphabet-gated symbols are SQL-literal-safe: [A-Za-z0-9] only)
      val pat = s"$Sep$a$Sep$b$Sep"
      val rep = s"$Sep$a$b$Sep"
      wf = wf.withColumn("sym",
        expr(s"replace(replace(sym, '$pat', '$rep'), '$pat', '$rep')"))
      if (rank % CheckpointEvery == 0 && rank < nMerges)
        wf = wf.localCheckpoint()
    }
    Trained(merges.result(), wf.localCheckpoint())
  }

  /** Corpus token frequencies under the learned segmentation: the
    * learned-vocabulary head (symbol, weighted count), top [[VocabK]]. */
  def vocab(t: Trained): DataFrame =
    t.finalWords
      .select(col("freq"), explode(
        expr(s"filter(split(sym, '$Sep'), x -> x <> '')")).as("symbol"))
      .groupBy(col("symbol")).agg(sum(col("freq")).as("n"))
      .orderBy(col("n").desc, col("symbol"))
      .limit(VocabK)

  // ------------------------------------------------------------ oracle

  /** Unrolled DuckDB replay: w0/wf0 (alphabet-gated char-split words),
    * then per round t: p_t (pair counts) → m_t (top-1 + pat/rep) →
    * wf_t (two replace passes). MATERIALIZED throughout — plain CTEs
    * inline at each reference and the chain re-expands exponentially. */
  def duckdbTrainCtes(tokensSqlExpr: String): String = {
    val sb = new StringBuilder
    sb.append(
      s"""w0 AS MATERIALIZED (
         |  SELECT word, COUNT(*) AS freq FROM (
         |    SELECT unnest($tokensSqlExpr) AS word FROM documents)
         |  WHERE regexp_full_match(word, '[A-Za-z0-9]+')
         |  GROUP BY 1),
         |wf0 AS MATERIALIZED (
         |  SELECT chr(31) || list_aggregate(list_transform(string_split(word, ''),
         |      ch -> ch || chr(31)), 'string_agg', '') AS sym, freq
         |  FROM w0)""".stripMargin)
    for (t <- 1 to NMerges) {
      val p = s"wf${t - 1}"
      sb.append(
        s""",
           |p$t AS MATERIALIZED (
           |  SELECT s[CAST(i AS INT)] AS a, s[CAST(i AS INT) + 1] AS b,
           |    CAST(SUM(freq) AS BIGINT) AS c
           |  FROM (SELECT list_filter(string_split(sym, chr(31)), x -> x <> '') AS s,
           |          freq FROM $p) q,
           |    LATERAL (SELECT unnest(range(1, len(s))) AS i) t2
           |  GROUP BY 1, 2),
           |m$t AS MATERIALIZED (
           |  SELECT a, b, c,
           |    chr(31) || a || chr(31) || b || chr(31) AS pat,
           |    chr(31) || a || b || chr(31) AS rep
           |  FROM p$t ORDER BY c DESC, a, b LIMIT 1),
           |wf$t AS MATERIALIZED (
           |  SELECT replace(replace(w.sym, m.pat, m.rep), m.pat, m.rep) AS sym,
           |    w.freq
           |  FROM $p w, m$t m)""".stripMargin)
    }
    sb.toString
  }
}
