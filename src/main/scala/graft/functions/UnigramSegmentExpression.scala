package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi segmentation of a word under a unigram piece LM —
  * `unigram_segment(word, scores, max_piece_len)` returns the
  * maximum-score split of `word` into vocabulary pieces, where
  * `scores` is a FOLDABLE map literal piece → fixed-point log2
  * probability (q8 integers from [[graft.text.UnigramTrain]]; the
  * vocabulary is driver-sized, so it rides into the plan as a literal
  * the way the PCA components do).
  *
  * DP: dp[j] = max over i ∈ [j−L, j) of dp[i] + score(word[i..j)),
  * ties broken toward the SMALLEST i (the oracle mirrors this with
  * ROW_NUMBER ... ORDER BY val DESC, bp ASC). All arithmetic is exact
  * 64-bit integer addition of q8 scores — bit-identical across
  * engines. Words are guaranteed segmentable because every character
  * of the gated word table is in the vocabulary; an unknown character
  * is a CONTRACT violation and throws rather than silently diverging
  * from the oracle's join-based DP (where the word would just drop).
  *
  * Why a native expression and not an unrolled DataFrame DP: the
  * per-position form needs a join against the vocab per (word,
  * position) — 16 joins of the word table; this is one generated
  * O(len·L) loop with a hash-map probe per candidate, inside
  * whole-stage codegen (§2.10 ladder rung (b), the IntDot placement).
  * The DuckDB oracle replays the unrolled join form and hash-matches.
  */
case class UnigramSegment(first: Expression, second: Expression,
                          third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val mapOk = second.dataType match {
      case MapType(StringType, LongType, _) => true
      case _ => false
    }
    if (first.dataType == StringType && mapOk && third.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "unigram_segment requires (string, map<string,bigint>, int), got " +
        s"${first.dataType}, ${second.dataType}, ${third.dataType}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_segment"

  // the scores map is a foldable literal: build the probe HashMap once
  // per expression instance, not once per row (boxed values — a
  // scala.Long-valued java map would silently unbox a missing key's
  // null to 0, turning "piece absent" into "piece with score 0")
  @transient private lazy val vocab: java.util.HashMap[String, java.lang.Long] = {
    require(second.foldable, "unigram_segment scores must be a literal map")
    val md = second.eval(null).asInstanceOf[MapData]
    val m = new java.util.HashMap[String, java.lang.Long](md.numElements() * 2)
    val keys = md.keyArray()
    val vals = md.valueArray()
    var i = 0
    while (i < md.numElements()) {
      m.put(keys.getUTF8String(i).toString, java.lang.Long.valueOf(vals.getLong(i)))
      i += 1
    }
    m
  }

  @transient private lazy val maxPieceLen: Int = {
    require(third.foldable, "unigram_segment max_piece_len must be a literal")
    third.eval(null).asInstanceOf[Int]
  }

  override def nullSafeEval(w: Any, scores: Any, l: Any): Any =
    UnigramSegment.segment(w.asInstanceOf[UTF8String].toString, vocab, maxPieceLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vocabRef = ctx.addReferenceObj("unigramVocab", vocab,
      "java.util.HashMap<String, Long>")
    val lenRef = ctx.addReferenceObj("unigramMaxLen", Integer.valueOf(maxPieceLen),
      "Integer")
    nullSafeCodeGen(ctx, ev, (w, _, _) =>
      s"""${ev.value} = graft.functions.UnigramSegment.segment(
         |  $w.toString(), $vocabRef, $lenRef.intValue());""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): UnigramSegment =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object UnigramSegment {
  /** Shared by the interpreted path and the generated code. */
  def segment(word: String, vocab: java.util.HashMap[String, java.lang.Long],
              maxPieceLen: Int): ArrayData = {
    val n = word.length
    val NegInf = Long.MinValue / 4
    val dp = Array.fill(n + 1)(NegInf)
    val bp = Array.fill(n + 1)(-1)
    dp(0) = 0L
    var j = 1
    while (j <= n) {
      var best = NegInf
      var bi = -1
      var i = math.max(0, j - maxPieceLen)
      while (i < j) {
        if (dp(i) > NegInf) {
          val sc = vocab.get(word.substring(i, j))
          if (sc != null) {
            val v = dp(i) + sc.longValue()
            if (v > best) { best = v; bi = i } // strict: ties keep smallest i
          }
        }
        i += 1
      }
      dp(j) = if (bi >= 0) best else NegInf
      bp(j) = bi
      j += 1
    }
    require(bp(n) >= 0 || n == 0,
      s"unigram_segment: no path for '$word' — a character is missing " +
        "from the vocabulary (gate violation)")
    var cur = n
    var count = 0
    while (cur > 0) { cur = bp(cur); count += 1 }
    val out = new Array[UTF8String](count)
    cur = n
    var k = count - 1
    while (cur > 0) {
      out(k) = UTF8String.fromString(word.substring(bp(cur), cur))
      cur = bp(cur)
      k -= 1
    }
    new GenericArrayData(out.asInstanceOf[Array[AnyRef]])
  }
}
