package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native dot product over two float-array columns.
  *
  * For EQUAL-LENGTH inputs (the only shape the embedding tables produce —
  * asserted in the cross-check spec), bit-identical to the
  * zip_with/aggregate formulation in [[VectorFunctions.dotProductHof]]
  * and the DuckDB oracle's list_reduce: an in-order left fold of double
  * products (((0+p₁)+p₂)+…), each pᵢ = double(aᵢ)·double(bᵢ) — the same
  * IEEE operation sequence, as one primitive loop instead of per-element
  * interpreted lambdas. On mismatched lengths this truncates to the
  * shorter array where the HOF formulation yields NULL (zip_with
  * null-pads and the null product poisons the fold) — don't feed it
  * ragged vectors expecting HOF parity.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(l: Any, r: Any): Any =
    DotProductExpr.dot(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DotProductExpr.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "dot_product"
}

object DotProductExpr {
  def dot(l: ArrayData, r: ArrayData): Double = {
    val a = l.toFloatArray()
    val b = r.toFloatArray()
    val n = math.min(a.length, b.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }
}
