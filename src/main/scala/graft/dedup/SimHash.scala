package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** SimHash document fingerprinting (SURVEY §7.5 dedup family).
  *
  * Charikar-style: each distinct token votes ±1 on every bit of its
  * 64-bit hash; the fingerprint sets the bits with positive vote sums.
  * Near-identical documents land on fingerprints within a small Hamming
  * distance — at scale, group by fingerprint (or by banded sections for
  * distance-k search, Manku/Jain/Sarma WWW'07) instead of comparing all
  * pairs. 64 bits is the production width: with 4×16-bit bands each band
  * carries 65 536 bucket values, so band buckets stay O(n/65 536) where
  * the former 32-bit/8-bit form packed O(n/256) docs per bucket — the
  * difference between a bounded self-join and a quadratic one at 100 TB.
  *
  * Map-only column expressions (64 codegen'd sum aggregates over the
  * exploded token rows); portable md5 hashing keeps the DuckDB oracle
  * bit-exact. The token hash is carried as two 32-bit halves (`hw_lo` =
  * md5 chars 1-8, `hw_hi` = chars 9-16) rather than one assembled long:
  * the vote for bit b reads one bit of one half, and DuckDB cannot
  * assemble a signed 64-bit value by `<< 32` without tripping its
  * left-shift overflow check — the halves sidestep the problem on both
  * sides identically.
  */
object SimHash {
  val Bits = 64
  private val HalfBits = 32

  /** The signed-64-bit mask with exactly bit `b` set. Bit 63 is the sign
    * bit: `1L << 63` is Long.MinValue, which bitwise-OR assembly handles
    * exactly (no arithmetic overflow path on either engine). */
  private def bitMask(b: Int): Long = 1L << b

  /** docs(idCol, textCol) → (id, simhash: long).
    *
    * Row pipeline (explode distinct tokens → 64 codegen'd sum aggregates
    * → bitwise-OR bit assembly), not array HOFs — same measured rationale
    * as [[MinHashLSH.signatures]]: interpreted lambdas are slow and
    * serialize across task threads. One shuffle on the doc key with
    * map-side partial aggregation. */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val voteAggs: Seq[Column] = (0 until Bits).map { b =>
      val half = if (b < HalfBits) "hw_lo" else "hw_hi"
      sum(expr(s"(shiftright($half, ${b % HalfBits}) & 1) * 2 - 1")).as(s"__v$b")
    }
    val assemble: Column = (0 until Bits).map { b =>
      when(col(s"__v$b") > 0, lit(bitMask(b))).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
    graft.Tables.parallelize(docs)
      .select(col(idCol),
        explode(array_distinct(TextFunctions.tokens(col(textCol)))).as("w"))
      .withColumn("hw_lo", expr(
        "cast(conv(substring(md5(w), 1, 8), 16, 10) AS bigint)"))
      .withColumn("hw_hi", expr(
        "cast(conv(substring(md5(w), 9, 8), 16, 10) AS bigint)"))
      .groupBy(col(idCol))
      .agg(voteAggs.head, voteAggs.tail: _*)
      .withColumn("simhash", assemble)
      .select(col(idCol), col("simhash"))
  }

  /** 128-bit tier for the simhash_width band ladder: bits 64–127 vote
    * on md5 hex chars 17–24 / 25–32 of the SAME token digest (one md5,
    * four independent 32-bit words), so the LOW long of the 128-bit
    * fingerprint is bit-identical to [[simhash]] — SimhashPairsSpec
    * pins it. docs(idCol, textCol) → (id, lo, hi). */
  def simhash128(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = Seq("w1", "w2", "w3", "w4")
    val voteAggs: Seq[Column] = (0 until 2 * Bits).map { b =>
      val word = words(b / HalfBits)
      sum(expr(s"(shiftright($word, ${b % HalfBits}) & 1) * 2 - 1")).as(s"__v$b")
    }
    def assemble(off: Int): Column = (0 until Bits).map { b =>
      when(col(s"__v${off + b}") > 0, lit(bitMask(b))).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
    val hashWords = words.zipWithIndex.map { case (w, i) =>
      expr(s"cast(conv(substring(md5(w), ${i * 8 + 1}, 8), 16, 10) AS bigint)")
        .as(w)
    }
    graft.Tables.parallelize(docs)
      .select(col(idCol),
        explode(array_distinct(TextFunctions.tokens(col(textCol)))).as("w"))
      .select(col(idCol) +: hashWords: _*)
      .groupBy(col(idCol))
      .agg(voteAggs.head, voteAggs.tail: _*)
      .withColumn("lo", assemble(0))
      .withColumn("hi", assemble(Bits))
      .select(col(idCol), col("lo"), col("hi"))
  }

  /** DuckDB mirror of [[simhash128]]: `sim128(doc_id, lo, hi)`. Each
    * token's md5 is computed ONCE (materialized digest list), then the
    * four 32-bit words slice the hex — the Scala side gets the same
    * effect from common-subexpression elimination over `md5(w)`. */
  def duckdbCte128: String = {
    val toks = TextFunctions.tokensSql("text")
    def hashWord(i: Int) =
      s"CAST(concat('0x', substr(s, ${i * 8 + 1}, 8)) AS BIGINT)"
    def maskSql(b: Int): String =
      if (b == 63) "CAST(-9223372036854775808 AS BIGINT)"
      else s"(CAST(1 AS BIGINT) << $b)"
    def bitTerms(off: Int): String = (0 until Bits).map { b =>
      val word = s"w${(off + b) / HalfBits + 1}"
      s"CASE WHEN list_sum(list_transform($word, x -> ((x >> ${(off + b) % HalfBits}) & 1) * 2 - 1)) > 0 " +
      s"THEN ${maskSql(b)} ELSE CAST(0 AS BIGINT) END"
    }.mkString(" |\n      ")
    val wordLists = (0 until 4).map(i =>
      s"list_transform(digs, s -> ${hashWord(i)}) AS w${i + 1}").mkString(",\n    ")
    s"""simtok128 AS (
       |  SELECT doc_id, list_distinct($toks) AS w FROM documents),
       |simdig128 AS MATERIALIZED (
       |  SELECT doc_id, list_transform(w, s -> md5(s)) AS digs
       |  FROM simtok128 WHERE len(w) > 0),
       |simhashed128 AS (
       |  SELECT doc_id,
       |    $wordLists
       |  FROM simdig128),
       |sim128 AS (
       |  SELECT doc_id,
       |    ${bitTerms(0)} AS lo,
       |    ${bitTerms(Bits)} AS hi
       |  FROM simhashed128)""".stripMargin
  }

  /** DuckDB mirror (from the `documents` view): `sim(doc_id, simhash)`.
    * Bit assembly uses `|` (no overflow path) and spells the bit-63 mask
    * as the signed literal — DuckDB rejects `1::BIGINT << 63`. */
  def duckdbCte: String = {
    val toks = TextFunctions.tokensSql("text")
    val hashLo = "CAST(concat('0x', substr(md5(s), 1, 8)) AS BIGINT)"
    val hashHi = "CAST(concat('0x', substr(md5(s), 9, 8)) AS BIGINT)"
    def maskSql(b: Int): String =
      if (b == 63) "CAST(-9223372036854775808 AS BIGINT)"
      else s"(CAST(1 AS BIGINT) << $b)"
    // joined with the OR on the END of each line: this SQL is embedded
    // in stripMargin strings downstream, which would strip a
    // line-LEADING `|` as a margin marker and silently delete the
    // bitwise-or operators
    val bitTerms = (0 until Bits).map { b =>
      val half = if (b < HalfBits) "lo" else "hi"
      s"CASE WHEN list_sum(list_transform($half, x -> ((x >> ${b % HalfBits}) & 1) * 2 - 1)) > 0 " +
      s"THEN ${maskSql(b)} ELSE CAST(0 AS BIGINT) END"
    }.mkString(" |\n      ")
    s"""simtok AS (
       |  SELECT doc_id, list_distinct($toks) AS w FROM documents),
       |simhashed AS (
       |  SELECT doc_id, list_transform(w, s -> $hashLo) AS lo,
       |    list_transform(w, s -> $hashHi) AS hi
       |  FROM simtok WHERE len(w) > 0),
       |sim AS (
       |  SELECT doc_id,
       |    $bitTerms AS simhash
       |  FROM simhashed)""".stripMargin
  }
}
