package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the portable polynomial string hash
  * h ← (h*31 + codepoint) mod 2^31-1 (see [[TextFunctions.portableHash]]).
  *
  * Semantically identical to the higher-order-function formulation
  * (aggregate over ascii(substr(s,i,1))) and to the DuckDB oracle's
  * list_reduce over unicode(substr(...)) — but evaluated as one tight
  * loop over the UTF8String bytes instead of per-character substring
  * allocations inside interpreted lambdas. Measured ~8x faster shingle
  * hashing at sf0.1; with whole-stage codegen at the top level it inlines
  * to a static call.
  */
case class PortableHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"portable_hash requires STRING input, got ${child.dataType.sql}")
  }
  override def nullSafeEval(input: Any): Any =
    PortableHashExpr.hashUtf8(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PortableHashExpr.hashUtf8($c)")
  override protected def withNewChildInternal(newChild: Expression): PortableHashExpr =
    copy(child = newChild)
  override def prettyName: String = "portable_hash"
}

object PortableHashExpr {
  final val Mod = 2147483647L

  /** One pass over the string's codepoints; ASCII fast path over raw
    * bytes (bytes == codepoints there). */
  def hashUtf8(s: UTF8String): Long = {
    var h = 0L
    val nBytes = s.numBytes()
    if (s.numChars() == nBytes) {
      val bytes = s.getBytes
      var i = 0
      while (i < nBytes) { h = (h * 31 + (bytes(i) & 0xff)) % Mod; i += 1 }
    } else {
      val it = s.toString.codePoints().iterator()
      while (it.hasNext) { h = (h * 31 + it.next()) % Mod }
    }
    h
  }
}
