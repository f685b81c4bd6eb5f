package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the dedup hot path. Semantically
  * identical to their builtin formulations (spec-cross-checked), but one
  * primitive-array pass instead of per-element interpreted lambdas —
  * these run millions of times per near-dup query, where boxing and
  * generic array ops dominate. Both participate in whole-stage codegen
  * via a static-call `doGenCode` (no interpreted-eval fallback on the
  * hot path).
  */

/** Exact Jaccard |a∩b| / |a∪b| of two DISTINCT long arrays (sets) —
  * equals size(array_intersect(a,b)) / size(array_union(a,b)) for
  * deduplicated inputs. Sort-merge on primitive arrays, zero boxing. */
case class SetJaccardExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(l: Any, r: Any): Any =
    SetSimilarityExprs.jaccard(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SetSimilarityExprs.jaccard($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "set_jaccard"
}

/** [[SetJaccardExpr]] for inputs ALREADY sorted ascending (and
  * distinct): merge-only, no per-pair sort. The candidate-verification
  * joins evaluate jaccard once per candidate PAIR but each document's
  * hash set can be sorted once at hashing time — on a quadratic-
  * in-bucket baseline that moves the O(n log n) sort out of the O(n²)
  * pair loop. Callers must guarantee the ordering (sort_array at the
  * materialization barrier); unsorted input silently undercounts the
  * intersection, so this is deliberately NOT the default expression. */
case class SortedSetJaccardExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(l: Any, r: Any): Any =
    SetSimilarityExprs.jaccardSorted(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SetSimilarityExprs.jaccardSorted($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "sorted_set_jaccard"
}

/** Intersection SIZE of two sorted-ascending distinct long arrays —
  * equals size(array_intersect(a,b)) for deduplicated sorted inputs.
  * The building block for asymmetric overlap measures (containment
  * |a∩b|/min(|a|,|b|)) where Jaccard's union normalization hides
  * subset relations. Same sortedness contract as
  * [[SortedSetJaccardExpr]]. */
case class SortedSetOverlapExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(l: Any, r: Any): Any =
    SetSimilarityExprs.overlapSorted(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SetSimilarityExprs.overlapSorted($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "sorted_set_overlap"
}

/** MinHash signature: sig[j] = min over the hash set of
  * ((2j+1)*h + 7j+3) mod 2^31-1, j = 0..k-1.
  *
  * Equals the transform/array_min formulation in
  * [[TextFunctions.minhashSignature]] (same arithmetic) for NON-EMPTY
  * hash sets — asserted in the cross-check spec. On an empty input this
  * returns sig[j]=0 (a stable sentinel signature) where the HOF's
  * array_min over an empty transform would yield NULL; callers shingle
  * first, so empty sets occur only for empty documents, which both
  * formulations bucket deterministically. */
case class MinHashSigExpr(child: Expression, k: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    SetSimilarityExprs.minhashSig(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SetSimilarityExprs.minhashSig($c, $k)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "minhash_sig"
}

/** Static eval kernels — one compiled body shared by interpreted eval and
  * generated code, like [[PortableHashExpr.hashUtf8]]. */
object SetSimilarityExprs {

  def jaccard(l: ArrayData, r: ArrayData): Double = {
    val a = l.toLongArray()
    val b = r.toLongArray()
    java.util.Arrays.sort(a); java.util.Arrays.sort(b)
    merged(a, b)
  }

  /** [[jaccard]] when both inputs are already sorted ascending. */
  def jaccardSorted(l: ArrayData, r: ArrayData): Double =
    merged(l.toLongArray(), r.toLongArray())

  /** Intersection size of two sorted-ascending distinct arrays. */
  def overlapSorted(l: ArrayData, r: ArrayData): Int = {
    val a = l.toLongArray(); val b = r.toLongArray()
    var i = 0; var j = 0; var inter = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    inter
  }

  private def merged(a: Array[Long], b: Array[Long]): Double = {
    var i = 0; var j = 0; var inter = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    val union = a.length + b.length - inter
    if (union == 0) 0.0 else inter.toDouble / union.toDouble
  }

  def minhashSig(input: ArrayData, k: Int): ArrayData = {
    val hs = input.toLongArray()
    val sig = new Array[Long](k)
    var j = 0
    while (j < k) {
      val a = j * 2 + 1; val b = j * 7 + 3
      var m = Long.MaxValue
      var i = 0
      while (i < hs.length) {
        val v = (a * hs(i) + b) % TextFunctions.HashMod
        if (v < m) m = v
        i += 1
      }
      sig(j) = if (hs.isEmpty) 0L else m
      j += 1
    }
    new GenericArrayData(sig)
  }
}
