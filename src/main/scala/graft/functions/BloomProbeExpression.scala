package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Native codegen bloom membership probe (§2.10 ladder rung (b)) — the
  * map-only prefilter on `bloom_prune`'s probe side.
  *
  * Why not the Column composition (k × `element_at(typedLit(words), …)`)
  * it replaces: whole-stage codegen adds the words literal to the task's
  * reference array PER OCCURRENCE, so a k-probe filter ships k copies of
  * the filter with every task — measured 131 MiB task binaries at the
  * sf10 surrogate (the lm_incr failure class, this time from literal
  * fan-out rather than plan fan-out). Here the words array is ONE
  * `ctx.addReferenceObj`, the k probes are a generated loop over it, and
  * the whole test stays inside whole-stage codegen.
  *
  * Bit positions replicate [[BloomSketch.positions]] EXACTLY (the build
  * side keeps the declarative aggregation): Spark's `xxhash64(key,
  * lit(i))` folds seed 42 through each argument by type —
  * `hashInt(i, hashLong(key, 42))` — then `pmod(…, m)`. The key must be
  * LongType for the hashes to agree with a LongType build column; the
  * type check enforces it.
  *
  * Null semantics: null key → null (UnaryExpression's null-safe
  * contract), matching the Column form (`===` on a null probe is null,
  * filtered as false).
  */
case class BloomMightContain(child: Expression, words: Array[Long],
                             mBits: Int, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires a BIGINT key (the build side's " +
        s"hash input type), got ${child.dataType}")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  protected override def nullSafeEval(input: Any): Any =
    BloomMightContain.test(input.asInstanceOf[Long], words, mBits, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the whole point: ONE reference to the filter words per task
    val w = ctx.addReferenceObj("bloomWords", words, "long[]")
    val xxh = classOf[XXH64].getName
    nullSafeCodeGen(ctx, ev, key => {
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val pos = ctx.freshName("pos")
      val keyHash = ctx.freshName("keyHash")
      s"""
         |${ev.value} = true;
         |long $keyHash = $xxh.hashLong($key, 42L);
         |for (int $i = 0; $i < $k; $i++) {
         |  long $h = $xxh.hashInt($i, $keyHash);
         |  long $pos = (($h % ${mBits}L) + ${mBits}L) % ${mBits}L;
         |  if ((($w[(int) ($pos >>> 6)] >>> ($pos & 63L)) & 1L) == 0L) {
         |    ${ev.value} = false;
         |    break;
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  /** Interpreted twin of the generated loop. */
  def test(key: Long, words: Array[Long], mBits: Int, k: Int): Boolean = {
    val keyHash = XXH64.hashLong(key, 42L)
    var i = 0
    while (i < k) {
      val h = XXH64.hashInt(i, keyHash)
      val pos = ((h % mBits) + mBits) % mBits
      if (((words((pos >>> 6).toInt) >>> (pos & 63L)) & 1L) == 0L) return false
      i += 1
    }
    true
  }
}
