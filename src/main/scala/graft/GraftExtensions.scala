package graft

import graft.functions.{BottomK, DotProductExpr, ExactDistinctLong, HllSketchAgg, MinHashSigExpr, PortableHashExpr, SetJaccardExpr}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{LongType, StringType}
import org.apache.spark.sql.SparkSessionExtensions

/** Registers graft's native expressions under SQL names so `spark.sql`
  * users call them like builtins:
  *
  *   - `portable_hash(str)` — polynomial string hash mod 2^31-1
  *   - `set_jaccard(arr, arr)` — exact Jaccard of two long-hash sets
  *   - `minhash_sig(arr, k)` — MinHash signature (k literal)
  *   - `dot_product(arr, arr)` — in-order double dot product
  *   - `hll_distinct(x[, p])` — deterministic HyperLogLog distinct count
  *     (aggregate; the analyzer wraps the AggregateFunction)
  *   - `exact_distinct(x)` — exact distinct count of a long column
  *     (aggregate; the sketch's oracle-side twin)
  *   - `kmv_minvalues(x, k)` — ascending k smallest distinct values
  *     (aggregate; the KMV set-operation sketch, see ns51)
  *
  * Two entry points: `GraftExtensions` for cluster config
  * (`spark.sql.extensions=graft.GraftExtensions`, applied at session
  * build) and [[GraftFunctions.register]] for an already-running session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.definitions.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), builder))
    }
}

object GraftFunctions {
  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def arity(es: Seq[Expression], n: Int, name: String): Unit =
    if (es.size != n) throw new IllegalArgumentException(
      s"$name expects $n arguments, got ${es.size}")

  // SQL callers get the same coercions the Column helpers apply — the
  // aggregates' update paths cast their inputs (Long/UTF8String), so an
  // un-coerced INT or numeric column would pass analysis and then throw
  // ClassCastException on executors.
  private def asLong(e: Expression): Expression =
    org.apache.spark.sql.catalyst.expressions.Cast(e, LongType)
  private def asString(e: Expression): Expression =
    org.apache.spark.sql.catalyst.expressions.Cast(e, StringType)

  val definitions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "portable_hash" -> (es => PortableHashExpr(es.head)),
    "set_jaccard" -> (es => SetJaccardExpr(es.head, es(1))),
    "minhash_sig" -> (es => MinHashSigExpr(es.head, intLit(es(1), "minhash_sig k"))),
    "dot_product" -> (es => DotProductExpr(es.head, es(1))),
    "hll_distinct" -> (es =>
      if (es.size >= 2) HllSketchAgg(es.head, intLit(es(1), "hll_distinct p"))
      else HllSketchAgg(es.head)),
    "exact_distinct" -> (es => ExactDistinctLong(es.head)),
    "bottom_k" -> (es => { arity(es, 3, "bottom_k")
      BottomK(asLong(es.head), asLong(es(1)), intLit(es(2), "bottom_k k")) }),
    "heavy_hitters" -> (es => { arity(es, 3, "heavy_hitters")
      graft.functions.SpaceSavingTopK(asString(es.head),
        intLit(es(1), "heavy_hitters capacity"),
        intLit(es(2), "heavy_hitters k")) }),
    "kmv_minvalues" -> (es => { arity(es, 2, "kmv_minvalues")
      graft.functions.KmvSketchAgg(asLong(es.head),
        intLit(es(1), "kmv_minvalues k")) }))

  /** Register into a live session's function registry. */
  def register(spark: SparkSession): Unit =
    definitions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")
    }
}
