package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

import java.nio.ByteBuffer
import scala.collection.mutable

/** Bounded bottom-k aggregate: the k smallest `(sortKey, payload)` pairs
  * per group, ordered lexicographically (payload breaks sort-key ties, so
  * the result is total and reproducible).
  *
  * This is the scale path for "k rows per group": the window form
  * (`row_number() <= k`, see q05) shuffles EVERY row to sort it, while
  * this aggregate keeps a k-bounded heap per group per partition, so
  * partial aggregation ships at most k pairs per (partition, group) into
  * the final shuffle — on a 100 TB corpus sampled at k=1000 per source,
  * the shuffle carries the sample, not the corpus. Paired with a
  * deterministic hash sort key ([[TextFunctions.portableHash]]) it is a
  * distributed uniform sampler with no RNG: the same k rows come back on
  * any cluster size, any engine (ns17's DuckDB oracle replays it
  * exactly).
  *
  * Null handling: rows where sortKey OR payload is null are SKIPPED —
  * unlike the window form, where Spark's nulls-first ascending sort
  * would rank a null key ahead of every non-null one. The equivalence
  * with `row_number() over (order by h, id)` therefore holds on
  * null-free inputs (hash keys never are null over non-null ids; ns17
  * and the streaming spec satisfy this by construction).
  */
case class BottomK(
    sortKey: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, Long)]] {

  require(k > 0, s"bottom_k requires k > 0, got $k")

  // max-heap: head is the LARGEST retained pair, evicted first
  private implicit val ord: Ordering[(Long, Long)] =
    Ordering.Tuple2(Ordering.Long, Ordering.Long)

  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, Long)] =
    mutable.PriorityQueue.empty[(Long, Long)]

  private def offer(buf: mutable.PriorityQueue[(Long, Long)],
                    pair: (Long, Long)): Unit = {
    if (buf.size < k) buf.enqueue(pair)
    else if (ord.lt(pair, buf.head)) { buf.dequeue(); buf.enqueue(pair) }
  }

  override def update(buf: mutable.PriorityQueue[(Long, Long)],
                      input: InternalRow): mutable.PriorityQueue[(Long, Long)] = {
    val s = sortKey.eval(input)
    val p = payload.eval(input)
    if (s != null && p != null)
      offer(buf, (s.asInstanceOf[Long], p.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Long, Long)],
                     other: mutable.PriorityQueue[(Long, Long)]): mutable.PriorityQueue[(Long, Long)] = {
    other.foreach(offer(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Long, Long)]): Any =
    new GenericArrayData(buf.toSeq.sorted.map { case (h, id) =>
      InternalRow(h, id)
    })

  override def serialize(buf: mutable.PriorityQueue[(Long, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (h, id) => bb.putLong(h); bb.putLong(id) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Long, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { offer(buf, (bb.getLong, bb.getLong)); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("h", LongType, nullable = false),
    StructField("id", LongType, nullable = false))))
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(sortKey, payload)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(sortKey = c(0), payload = c(1))
  override def withNewMutableAggBufferOffset(offset: Int): BottomK =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BottomK =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "bottom_k"
}

object BottomK {
  /** The k smallest (sortKey, payload) pairs per group, as a sorted
    * array<struct<h,id>> aggregate Column. */
  def bottomK(sortKey: Column, payload: Column, k: Int): Column =
    ColumnBridge.column(
      BottomK(ColumnBridge.expression(sortKey.cast("long")),
        ColumnBridge.expression(payload.cast("long")), k)
        .toAggregateExpression())
}
