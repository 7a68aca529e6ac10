package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass character-distribution statistics over a string — the
  * primitive under repetition/diversity quality gates in a training-data
  * curation pipeline (gibberish and boilerplate both show up as skewed
  * character histograms long before tokenization).
  *
  * Returns `struct(n_chars, n_distinct, sum_sq)` where `sum_sq` is
  * Σ count(c)² over the string's code points. Everything downstream
  * (Simpson diversity 1 − Σp², repeat mass, distinct ratio) is a pure
  * RATIONAL function of these integers — bit-exact across engines, no
  * libm entropy/log parity risk (the same reasoning as
  * tfidf_top_terms' rational idf).
  *
  * Why a native expression and not explode(chars)+groupBy: the explode
  * form shuffles n_chars rows per document (a 100 TB corpus explodes to
  * ~100 T rows); this is a map-only single pass inside whole-stage
  * codegen — §2.10 ladder rung (b), same placement as [[IntDot]].
  */
case class CharDiversity(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_diversity requires a string argument, got ${child.dataType}")

  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("sum_sq", LongType, nullable = false)))

  override def prettyName: String = "char_diversity"

  override def nullSafeEval(s: Any): Any =
    CharDiversity.stats(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharDiversity.stats($c);")

  override protected def withNewChildInternal(newChild: Expression): CharDiversity =
    copy(child = newChild)
}

object CharDiversity {
  /** Shared by the interpreted path and the generated code. Counts are
    * over Unicode code points (matching a SQL engine's per-character
    * string split semantics, not UTF-16 units). ASCII fast path: a
    * 128-slot array; the map engages only for non-ASCII input. */
  def stats(s: UTF8String): InternalRow = {
    val str = s.toString
    val ascii = new Array[Long](128)
    var other: java.util.HashMap[Integer, Array[Long]] = null
    var n = 0L
    var i = 0
    val len = str.length
    while (i < len) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      n += 1
      if (cp < 128) ascii(cp) += 1
      else {
        if (other == null) other = new java.util.HashMap[Integer, Array[Long]]()
        val slot = other.computeIfAbsent(cp, _ => new Array[Long](1))
        slot(0) += 1
      }
    }
    var distinct = 0L
    var sumSq = 0L
    var j = 0
    while (j < 128) {
      val c = ascii(j)
      if (c > 0) { distinct += 1; sumSq += c * c }
      j += 1
    }
    if (other != null) {
      val it = other.values().iterator()
      while (it.hasNext) {
        val c = it.next()(0)
        distinct += 1
        sumSq += c * c
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, distinct, sumSq))
  }
}
