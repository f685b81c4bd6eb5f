package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native dot product over two float-array columns.
  *
  * Bit-identical to the zip_with/aggregate formulation in
  * [[VectorFunctions.dotProductHof]] and the DuckDB oracle's
  * list_reduce: an in-order left fold of double products
  * (((0+p₁)+p₂)+…), each pᵢ = double(aᵢ)·double(bᵢ) — the same IEEE
  * operation sequence, as one primitive loop instead of per-element
  * interpreted lambdas.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData].toFloatArray()
    val b = r.asInstanceOf[ArrayData].toFloatArray()
    val n = math.min(a.length, b.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "dot_product"
}
