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

  /** docs(idCol, textCol) → (id, simhash: long). */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bitCols: Seq[Column] = (0 until Bits).map { b =>
      val votes = expr(
        s"aggregate(hw, 0L, (acc, x) -> acc + (shiftright(x, $b) & 1) * 2 - 1)")
      when(votes > 0, lit(1L << b)).otherwise(lit(0L))
    }
    docs
      .withColumn("toks", TextFunctions.tokens(col(textCol)))
      .withColumn("w", array_distinct(col("toks")))
      .filter(size(col("w")) > 0)
      .withColumn("hw", expr(
        s"transform(w, s -> cast(conv(substring(md5(s), 1, 15), 16, 10) AS bigint) % $Mod)"))
      .withColumn("simhash", bitCols.reduce(_ + _))
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
