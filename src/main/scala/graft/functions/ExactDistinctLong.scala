package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

import java.nio.ByteBuffer
import scala.collection.mutable

/** Custom `TypedImperativeAggregate` — the imperative sketch-style
  * aggregation tier (the buffer is an arbitrary JVM object serialized
  * between partial and final aggregation, exactly how HLL/KMV sketches
  * plug into Catalyst). This one keeps an exact long hash set so its
  * result equals COUNT(DISTINCT x) and stays oracle-verifiable; swap the
  * buffer for a sketch to trade memory for approximation without
  * touching the integration surface.
  */
case class ExactDistinctLong(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashSet[Long]] {

  override def createAggregationBuffer(): mutable.HashSet[Long] =
    mutable.HashSet.empty[Long]

  override def update(buffer: mutable.HashSet[Long], input: InternalRow): mutable.HashSet[Long] = {
    val v = child.eval(input)
    if (v != null) buffer += v.asInstanceOf[Long]
    buffer
  }

  override def merge(b: mutable.HashSet[Long], o: mutable.HashSet[Long]): mutable.HashSet[Long] = {
    b ++= o; b
  }

  override def eval(buffer: mutable.HashSet[Long]): Any = buffer.size.toLong

  override def serialize(buffer: mutable.HashSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buffer.size * 8)
    bb.putInt(buffer.size)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = mutable.HashSet.empty[Long]
    var i = 0
    while (i < n) { s += bb.getLong; i += 1 }
    s
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
  override def withNewMutableAggBufferOffset(offset: Int): ExactDistinctLong =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ExactDistinctLong =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "exact_distinct_long"
}

object ExactDistinctLong {
  /** Expose as an aggregate Column. */
  def distinctCount(c: Column): Column =
    ColumnBridge.column(
      ExactDistinctLong(ColumnBridge.expression(c)).toAggregateExpression())
}
