package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-expression text analysis for training-data pipelines (SURVEY
  * §7.5). Everything here is codegen-friendly `functions._` / higher-order
  * functions — no UDFs — so the operators stay inside whole-stage codegen
  * and scale as map-only work (no shuffle until an explicit groupBy).
  *
  * Higher-order-function builders take the *name* of an array column
  * (they compile to `expr` lambdas). Each builder has an exact DuckDB
  * mirror (`*Sql`) used by the oracle gate; keep them in lockstep.
  */
object TextFunctions {

  /** Whitespace tokenization of trimmed text. Empty text → empty array
    * (Java split of "" yields [""], so guard). */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  def tokensSql(text: String): String =
    s"CASE WHEN length(trim($text)) = 0 THEN [] " +
    s"ELSE string_split_regex(trim($text), '\\s+') END"

  /** Word n-gram shingles (space-joined) from array column `toksCol`, for
    * near-dup fingerprinting. Docs shorter than n words → empty array
    * (Spark `sequence` would otherwise produce a DESCENDING range —
    * guard explicitly). */
  def shingles(toksCol: String, n: Int): Column = {
    val parts = (0 until n).map(k => s"element_at($toksCol, i + $k)").mkString(", ")
    when(size(col(toksCol)) < n, array().cast("array<string>"))
      .otherwise(expr(
        s"transform(sequence(1, size($toksCol) - ${n - 1}), i -> concat_ws(' ', $parts))"))
  }

  /** DuckDB mirror over a CTE column named `toksCol` (must be a bare
    * column reference, not a nested expression). `range` has an exclusive
    * end, `sequence` an inclusive one — hence the differing bounds. */
  def shinglesSql(toksCol: String, n: Int): String = {
    val parts = (0 until n).map(k => s"$toksCol[i + $k]").mkString(" || ' ' || ")
    s"CASE WHEN len($toksCol) < $n THEN [] ELSE " +
    s"list_transform(range(1, len($toksCol) - ${n - 2}), i -> $parts) END"
  }

  /** Portable 60-bit string hash: first 15 hex chars of md5 as a non-
    * negative bigint. Identical in DuckDB:
    * `CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT)`. Used instead
    * of Spark's xxhash64/hash, which DuckDB cannot reproduce. */
  def portableHash(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  def portableHashSql(s: String): String =
    s"CAST(concat('0x', substr(md5($s), 1, 15)) AS BIGINT)"

  /** Count of tokens (array column `toksCol`) in a fixed marker set,
    * with multiplicity (stopword counting, language scoring).
    *
    * Built as Σ_m (size − size(array_remove(toks, m))) rather than
    * `size(filter(toks, t -> t IN (...)))`: `filter` is a higher-order
    * function (CodegenFallback — interpreted, lambda evaluation
    * serializes across task threads in one JVM), while `array_remove`
    * is a plain codegen'd collection expression; the marker sets are
    * small fixed lists so the expansion is a handful of terms. */
  def markerCount(toksCol: String, markers: Seq[String]): Column = {
    val terms = markers.map(m =>
      s"(size($toksCol) - size(array_remove($toksCol, '$m')))")
    expr(terms.mkString(" + "))
  }

  def markerCountSql(toksSql: String, markers: Seq[String]): String = {
    val inList = markers.map(m => s"'$m'").mkString(", ")
    s"len(list_filter($toksSql, t -> t IN ($inList)))"
  }
}
