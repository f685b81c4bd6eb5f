package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

import java.io.ByteArrayInputStream

/** `might_contain(key)` over a pre-built [[BloomFilter]], embedded in the
  * plan as serialized bytes — the explicit form of Spark's runtime
  * row-level filtering (its internal `BloomFilterMightContain`), usable
  * where the optimizer's cost model wouldn't inject one.
  *
  * The expression travels to executors as its byte payload; each JVM
  * deserializes the filter once (transient lazy) and whole-stage codegen
  * calls straight into `mightContainLong` — no UDF, no boxing. A bloom
  * has no false negatives, so using it as a pre-join filter can only
  * drop rows the join would drop anyway: plans stay exact while the
  * fact-side shuffle shrinks to the dim selectivity (+fpp).
  */
case class BloomMightContainExpr(child: Expression, bloomBytes: Array[Byte])
  extends UnaryExpression {

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  /** Called from generated code — keep public and stable. */
  def mightContain(v: Long): Boolean = bloom.mightContainLong(v)

  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires BIGINT input, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    mightContain(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomExpr", this,
      classOf[BloomMightContainExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContain($c)")
  }

  // A case class with an Array[Byte] field would compare the array by
  // reference, so two semantically identical instances would never be
  // `semanticEquals` — defeating common-subexpression elimination and
  // exchange reuse. Compare (and hash) the byte CONTENT instead.
  override def equals(other: Any): Boolean = other match {
    case that: BloomMightContainExpr =>
      child == that.child && java.util.Arrays.equals(bloomBytes, that.bloomBytes)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(bloomBytes)

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainExpr =
    copy(child = newChild)
  override def prettyName: String = "bloom_might_contain"
}
