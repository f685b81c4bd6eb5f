package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector primitives over `array<float>` columns.
  *
  * All folds are sequential left-folds in declared order, so double
  * arithmetic is bit-identical between Spark (`aggregate`/`zip_with`)
  * and the DuckDB oracle (`list_reduce`/`list_transform`) — cosine scores
  * can be hash-compared exactly, no rounding tolerance needed.
  */
object VectorFunctions {

  /** Dot product as an in-order left fold over pairwise products.
    * Native expression ([[DotProductExpr]]); [[dotProductHof]] is the
    * pure-builtins cross-check. */
  def dotProduct(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge._
    column(DotProductExpr(expression(a), expression(b)))
  }

  /** Higher-order-function formulation of [[dotProduct]]. */
  def dotProductHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dotProduct(a, a))

  /** Cosine similarity. */
  def cosine(a: Column, b: Column): Column =
    dotProduct(a, b) / (norm(a) * norm(b))

  /** Cosine via the HOF fold — for arrays of ANY numeric element type
    * (one side is a double-array centroid in trained-IVF scoring;
    * [[DotProductExpr]] is float-array-specialized). Same fold order and
    * casts as the oracle's `CAST(x AS DOUBLE)` formulation. */
  def cosineHof(a: Column, b: Column): Column =
    dotProductHof(a, b) / (sqrt(dotProductHof(a, a)) * sqrt(dotProductHof(b, b)))

  /** [[dotProductHof]] as a single codegen'd primitive loop
    * ([[DotProductAnyExpr]]) for float/double arrays — bit-identical fold
    * (per-element widen to double, multiply, in-order left-fold add) on
    * the equal-length, null-free vectors every caller produces, without
    * the interpreted per-element lambdas (HOFs are CodegenFallback). The
    * hot-path form; [[dotProductHof]] stays as the pure-builtins
    * cross-check. */
  def dotProductAny(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge._
    column(DotProductAnyExpr(expression(a), expression(b)))
  }

  /** [[cosineHof]] over the codegen'd fold — same IEEE operation
    * sequence, one primitive loop per row. */
  def cosineAny(a: Column, b: Column): Column =
    dotProductAny(a, b) / (sqrt(dotProductAny(a, a)) * sqrt(dotProductAny(b, b)))

  /** Sign-bucket LSH key: bit i set iff element i+1 > 0, over the first
    * `bits` dimensions. Turns ANN search into an equi-join on bucket —
    * the scale path that avoids the all-pairs cross join. */
  def signBucket(vec: Column, bits: Int): Column =
    aggregate(
      transform(sequence(lit(0), lit(bits - 1)), i =>
        when(element_at(vec, i + 1) > 0f, pow(lit(2.0), i).cast("long"))
          .otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
}
