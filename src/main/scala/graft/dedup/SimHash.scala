package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** SimHash document fingerprinting (SURVEY §7.5 dedup family).
  *
  * Charikar-style: each distinct token votes ±1 on every bit of its
  * 32-bit hash; the fingerprint sets the bits with positive vote sums.
  * Near-identical documents land on fingerprints within a small Hamming
  * distance — at scale, group by fingerprint (or by rotated prefixes for
  * distance-k search) instead of comparing all pairs.
  *
  * Map-only column expressions (one `aggregate` per bit over the token
  * hash array); portable md5 hashing keeps the DuckDB oracle bit-exact.
  */
object SimHash {
  val Bits = 32
  /** Token hash reduced to 32 bits so bit votes stay in Int range. */
  val Mod = 4294967296L // 2^32

  /** docs(idCol, textCol) → (id, simhash: long).
    *
    * Row pipeline (explode distinct tokens → 32 codegen'd sum aggregates
    * → bit assembly), not array HOFs — same measured rationale as
    * [[MinHashLSH.signatures]]: interpreted lambdas are slow and
    * serialize across task threads. One shuffle on the doc key with
    * map-side partial aggregation. */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val voteAggs: Seq[Column] = (0 until Bits).map { b =>
      sum(expr(s"(shiftright(hw, $b) & 1) * 2 - 1")).as(s"__v$b")
    }
    val assemble: Column = (0 until Bits).map { b =>
      when(col(s"__v$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    graft.Tables.parallelize(docs)
      .select(col(idCol),
        explode(array_distinct(TextFunctions.tokens(col(textCol)))).as("w"))
      .withColumn("hw", expr(
        s"cast(conv(substring(md5(w), 1, 15), 16, 10) AS bigint) % $Mod"))
      .groupBy(col(idCol))
      .agg(voteAggs.head, voteAggs.tail: _*)
      .withColumn("simhash", assemble)
      .select(col(idCol), col("simhash"))
  }

  /** DuckDB mirror (from the `documents` view): `sim(doc_id, simhash)`. */
  def duckdbCte: String = {
    val toks = TextFunctions.tokensSql("text")
    val hash = s"CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT) % $Mod"
    val bitTerms = (0 until Bits).map { b =>
      s"CASE WHEN list_sum(list_transform(hw, x -> ((x >> $b) & 1) * 2 - 1)) > 0 " +
      s"THEN CAST(${1L << b} AS BIGINT) ELSE 0 END"
    }.mkString("\n      + ")
    s"""simtok AS (
       |  SELECT doc_id, list_distinct($toks) AS w FROM documents),
       |simhashed AS (
       |  SELECT doc_id, list_transform(w, s -> $hash) AS hw
       |  FROM simtok WHERE len(w) > 0),
       |sim AS (
       |  SELECT doc_id,
       |    CAST($bitTerms AS BIGINT) AS simhash
       |  FROM simhashed)""".stripMargin
  }
}
