package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native codegen fixed-point quantization `array<float> → array<bigint>`
  * (qᵢ = floor(xᵢ · scale)) — the FIRST step of every embedding
  * operator ([[graft.embed.Similarity.quantized]]), formerly a
  * `transform(...)` higher-order function.
  *
  * Why not the HOF: `transform` has no `doGenCode` — it evaluates
  * interpreted, boxes every element, allocates a lambda frame per
  * element, and its evaluation serializes across task threads in one
  * JVM (the same measured rationale that replaced `aggregate(zip_with)`
  * with [[IntDot]]). This expression is a tight generated primitive
  * loop writing an `UnsafeArrayData`, inside whole-stage codegen —
  * §2.10 ladder rung (b), applied to the quantization pass that feeds
  * int_dot.
  *
  * Semantics are exactly the former expression
  * `transform(e, x -> cast(floor(cast(x AS double) * cast(S AS double))
  * AS bigint))` on non-null elements: widen to double, multiply, floor,
  * truncate to long — bit-identical, so every oracle over `q` is
  * unchanged. Null semantics: null if either argument is null; array
  * ELEMENTS must be non-null (embedding vectors are dense — same
  * contract int_dot already relies on).
  */
case class IntQuantize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), LongType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"int_quantize requires (array<float>, bigint), got $l and $r")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "int_quantize"

  override def nullSafeEval(a: Any, s: Any): Any =
    IntQuantize.quantize(a.asInstanceOf[ArrayData], s.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, s) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val arr = ctx.freshName("arr")
      val sd = ctx.freshName("sd")
      s"""
         |int $n = $a.numElements();
         |double $sd = (double) $s;
         |long[] $arr = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $arr[$i] = (long) java.lang.Math.floor(((double) $a.getFloat($i)) * $sd);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($arr);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntQuantize =
    copy(left = newLeft, right = newRight)
}

object IntQuantize {
  /** Interpreted twin of the generated loop. */
  def quantize(a: ArrayData, scale: Long): ArrayData = {
    val n = a.numElements()
    val out = new Array[Long](n)
    val sd = scale.toDouble
    var i = 0
    while (i < n) {
      out(i) = math.floor(a.getFloat(i).toDouble * sd).toLong
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
