package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the double-encoded JSON unwrap (SURVEY
  * §2.3 P2, §2.10 "optional codegen showcase").
  *
  * Semantics exactly mirror the reference's unwrap
  * (`/root/reference/TelematicsViolationDeriverJob.java:192-196`): after
  * trimming, a value wrapped in literal double quotes loses one quoting
  * layer (`\"` → `"`, `\\` → `\`); anything else passes through.
  *
  * Versus the two-`regexp_replace` column formulation in
  * [[graft.ingest.JsonNormalize.unwrapDoubleEncoded]], this is a single
  * pass with no regex engine and participates in whole-stage codegen via
  * a static-call `doGenCode` — the hot path stays in generated Java.
  */
case class JsonUnwrap(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"json_unwrap requires a string argument, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def prettyName: String = "json_unwrap"

  override def nullSafeEval(input: Any): Any =
    JsonUnwrap.unwrap(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.JsonUnwrap.unwrap($c)")

  override protected def withNewChildInternal(newChild: Expression): JsonUnwrap =
    copy(child = newChild)
}

object JsonUnwrap {
  /** Static helper the generated code calls. Single pass, allocation only
    * when an escape actually occurs. */
  def unwrap(s: UTF8String): UTF8String = {
    val t = s.trimAll()
    val n = t.numBytes()
    if (n < 2 || t.getByte(0) != '"' || t.getByte(n - 1) != '"') return s
    val bytes = t.getBytes
    val out = new Array[Byte](n - 2)
    var i = 1
    var o = 0
    while (i < n - 1) {
      val b = bytes(i)
      if (b == '\\' && i + 1 < n - 1 &&
          (bytes(i + 1) == '"' || bytes(i + 1) == '\\')) {
        out(o) = bytes(i + 1); i += 2
      } else {
        out(o) = b; i += 1
      }
      o += 1
    }
    UTF8String.fromBytes(java.util.Arrays.copyOfRange(out, 0, o))
  }
}
