package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** K-minimum-values (KMV) distinct sketch over a long-hash column
  * (Bar-Yossef et al., "Counting distinct elements in a data stream",
  * RANDOM 2002; Beyer et al., "On synopses for distinct-value estimation
  * under multiset operations", SIGMOD 2007).
  *
  * The buffer is the set of the k SMALLEST distinct hash values seen —
  * fixed size, order-insensitive, and mergeable by union-then-trim, so
  * it composes associatively across any partitioning: one map-side
  * partial per partition, and the shuffle carries ≤ k longs per group
  * instead of the value set.
  *
  * What HLL (q22) cannot do and KMV can: SET OPERATIONS. Because two
  * sketches over the same hash function are uniform samples of their
  * unions' k-minima, Jaccard, union and intersection cardinalities are
  * all estimable from the sketches alone (Beyer et al. §4) — the scale
  * path for cross-corpus overlap where the exact pairwise join (ns48)
  * would shuffle every distinct gram of every source.
  *
  * The caller supplies the hash (here: the portable polynomial hash,
  * range [0, 2^31−1)), so the sketch is DETERMINISTIC for a given input
  * set — the DuckDB oracle recomputes the identical k-minima and the
  * identical estimates, bit for bit (see ns51).
  *
  * eval() returns the ascending k-minima array; estimate arithmetic
  * stays in the query so both engines share one formula.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 2 && k <= (1 << 20), s"k must be in [2, 2^20], got $k")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      if (buf.size < k) buf.add(h)
      else if (h < buf.last()) { if (buf.add(h)) buf.pollLast() }
    }
    buf
  }

  override def merge(b: java.util.TreeSet[java.lang.Long],
                     o: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = o.iterator()
    while (it.hasNext) {
      val h = it.next()
      if (b.size < k) b.add(h)
      else if (h < b.last()) { if (b.add(h)) b.pollLast() }
      else return b // o is ascending: the rest can only be larger
    }
    b
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { s.add(bb.getLong); i += 1 }
    s
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
  override def withNewMutableAggBufferOffset(offset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "kmv_sketch"
}

object KmvSketchAgg {
  /** The ascending k smallest distinct values of a long(-hash) column. */
  def kMinValues(c: Column, k: Int): Column =
    ColumnBridge.column(
      KmvSketchAgg(ColumnBridge.expression(c.cast("long")), k)
        .toAggregateExpression())
}
