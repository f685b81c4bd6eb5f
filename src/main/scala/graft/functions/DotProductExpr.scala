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

/** [[DotProductExpr]] generalized to float- OR double-element arrays on
  * either side — the centroid/reconstruction/principal-axis scoring shape,
  * where one side is the float corpus and the other a derived double
  * vector. Same contract as [[DotProductExpr]]: bit-identical to the
  * zip_with/aggregate HOF fold for equal-length arrays with no null
  * elements (identical IEEE operation order: per-element widen to double,
  * multiply, in-order left-fold add), as one codegen'd primitive loop
  * instead of per-element interpreted lambdas — higher-order functions
  * are CodegenFallback, which made every centroid-assignment and
  * rescoring stage an interpreted inner loop (guide §4.1). Truncates on
  * ragged input and ignores element nullability, exactly like the float
  * version — don't feed it ragged or null-holed vectors expecting HOF
  * parity. */
case class DotProductAnyExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  import org.apache.spark.sql.types.{ArrayType, FloatType}
  override def dataType: DataType = DoubleType
  // Analysis-time rejection (Spark expression convention): a non-
  // float/double array child fails the query at analysis with a typed
  // message instead of surfacing as a runtime IllegalArgumentException
  // from isFloat inside eval/codegen.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "dot_product_any requires ARRAY<FLOAT> or ARRAY<DOUBLE> on both " +
        s"sides, got ${left.dataType.sql} and ${right.dataType.sql}")
  }
  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"dot_product_any expects array<float> or array<double>, got $t")
  }
  override def nullSafeEval(l: Any, r: Any): Any =
    DotProductExpr.dotAny(l.asInstanceOf[ArrayData], isFloat(left),
      r.asInstanceOf[ArrayData], isFloat(right))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.DotProductExpr.dotAny($a, ${isFloat(left)}, $b, ${isFloat(right)})")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "dot_product_any"
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

  def dotAny(l: ArrayData, lFloat: Boolean, r: ArrayData, rFloat: Boolean): Double = {
    val n = math.min(l.numElements(), r.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (lFloat) l.getFloat(i).toDouble else l.getDouble(i)
      val y = if (rFloat) r.getFloat(i).toDouble else r.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }
}
