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

  /** One row per word n-gram occurrence: (idCol, s) — the shared
    * builder for every shingle pipeline (fingerprints, minhash
    * signatures, repetition metrics).
    *
    * Built WITHOUT a window: n sliced copies of the token array are
    * zipped elementwise (`slice`/`arrays_zip` are codegen'd collection
    * expressions, not interpreted lambda HOFs) and exploded once. The
    * former posexplode → `lead`-window form shuffled and sorted every
    * token row keyed by doc; this form needs ZERO shuffle to produce
    * the gram rows, and because explode keeps a document's rows inside
    * its partition, a following groupBy(id) fully combines map-side —
    * the exchange ships one partial row per document, not per gram.
    * At 100 TB that turns the shingle pass from a full-corpus string
    * shuffle into a map-only stage. Docs shorter than n words yield no
    * rows (matching the window form's trailing-null filter). */
  def ngramRows(docs: org.apache.spark.sql.DataFrame, idCol: String,
                textCol: String, n: Int): org.apache.spark.sql.DataFrame = {
    val slices = (0 until n).map(k => s"slice(__toks, ${k + 1}, __m)")
    docs
      .select(col(idCol), tokens(col(textCol)).as("__toks"))
      .withColumn("__m", size(col("__toks")) - (n - 1))
      .filter(col("__m") >= 1)
      .selectExpr(idCol, s"arrays_zip(${slices.mkString(", ")}) AS __z")
      .select(col(idCol), explode(col("__z")).as("__e"))
      // arrays_zip names fields positionally ("0".."n-1") for
      // non-attribute inputs
      .select(col(idCol), concat_ws(" ",
        (0 until n).map(k => col("__e").getField(k.toString)): _*).as("s"))
  }

  /** [[ngramRows]] with 1-based gram positions and the per-doc gram
    * count: (idCol, pos, n, s). Same zero-shuffle slice/arrays_zip
    * construction (codegen'd collection expressions, never an
    * interpreted `transform` lambda — the HOF form measured 6×+ slower
    * at bench SF because lambda evaluation serializes across the JVM's
    * task threads); posexplode supplies the position the plain explode
    * discards. */
  def ngramRowsPos(docs: org.apache.spark.sql.DataFrame, idCol: String,
                   textCol: String, n: Int): org.apache.spark.sql.DataFrame = {
    val slices = (0 until n).map(k => s"slice(__toks, ${k + 1}, __m)")
    docs
      .select(col(idCol), tokens(col(textCol)).as("__toks"))
      .withColumn("__m", size(col("__toks")) - (n - 1))
      .filter(col("__m") >= 1)
      .selectExpr(idCol, "__m", s"arrays_zip(${slices.mkString(", ")}) AS __z")
      .select(col(idCol), col("__m"), posexplode(col("__z")).as(Seq("__p", "__e")))
      .select(col(idCol),
        (col("__p") + 1).cast("long").as("pos"),
        col("__m").cast("long").as("n"),
        concat_ws(" ",
          (0 until n).map(k => col("__e").getField(k.toString)): _*).as("s"))
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
