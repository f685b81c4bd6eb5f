package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.nio.charset.StandardCharsets.UTF_8
import scala.collection.mutable

/** SpaceSaving heavy-hitters sketch (Metwally et al.) as a
  * `TypedImperativeAggregate`: at most `capacity` counters per buffer,
  * every estimate an UPPER bound on the true count (`est − err ≤ true ≤
  * est`), and any item with true count > n/capacity guaranteed present.
  *
  * This is the 100 TB path for "top tokens": the exact form (ns10)
  * shuffles one row per distinct token; this sketch keeps fixed memory
  * per partition and ships `capacity` counters into the final merge, so
  * the shuffle is O(partitions × capacity) regardless of vocabulary
  * size. Merge adds estimates (absent items take the other summary's
  * minimum as their bound — the mergeable-summaries construction), then
  * re-truncates to `capacity` by discarding the lowest-estimate counters
  * outright: survivors' est/err are unchanged, and an item that re-enters
  * a later merge inherits that summary's minimum estimate as its share.
  * When `capacity` exceeds the number of distinct items nothing is ever
  * evicted, every `err` is 0, and the sketch is EXACT — which is what
  * lets ns19 sit under the DuckDB oracle while the spec pins the
  * approximate regime's guarantees separately.
  *
  * Determinism caveat: once eviction or truncation fires, the per-item
  * est/err values depend on the ORDER Spark happens to merge partial
  * buffers in (each side's minimum-estimate share `mA`/`mB` varies with
  * grouping). The bounds `est − err ≤ true ≤ est` and the
  * heavy-hitter-presence guarantee hold for every merge order, but the
  * numbers are only bitwise-reproducible in the exact (no-eviction)
  * regime — which is the regime the ns19 oracle runs in.
  */
case class SpaceSavingTopK(
    child: Expression,
    capacity: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, (Long, Long)]] {

  require(capacity > 0 && k > 0 && k <= capacity,
    s"need 0 < k <= capacity, got k=$k capacity=$capacity")

  type Buf = mutable.HashMap[String, (Long, Long)] // item -> (est, err)

  override def createAggregationBuffer(): Buf = mutable.HashMap.empty

  private def minEst(buf: Buf): Long =
    if (buf.isEmpty) 0L else buf.valuesIterator.map(_._1).min

  /** Evict the minimum-estimate counter (deterministic tie-break on the
    * item so partial aggregation is reproducible) and return its est.
    * O(capacity) scan per eviction — the textbook Stream-Summary bucket
    * list would make this O(1); at the capacities this engine uses
    * (≤ ~10^4) and with evictions only firing once a buffer is full,
    * the scan is not the bottleneck (the row decode is). */
  private def evictMin(buf: Buf): Long = {
    val (item, (est, _)) = buf.minBy { case (i, (e, _)) => (e, i) }
    buf.remove(item)
    est
  }

  private def offer(buf: Buf, item: String, add: Long, addErr: Long): Unit =
    buf.get(item) match {
      case Some((e, r)) => buf.update(item, (e + add, r + addErr))
      case None if buf.size < capacity => buf.update(item, (add, addErr))
      case None =>
        val m = evictMin(buf)
        buf.update(item, (m + add, m + addErr))
    }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[UTF8String].toString, 1L, 0L)
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    // mergeable-summaries construction: an item absent from one summary
    // takes that summary's minimum estimate as its upper-bound share
    val mA = if (buf.size < capacity) 0L else minEst(buf)
    val mB = if (other.size < capacity) 0L else minEst(other)
    val items = buf.keySet ++ other.keySet
    val merged: Seq[(String, (Long, Long))] = items.toSeq.map { i =>
      val (eA, rA) = buf.getOrElse(i, (mA, mA))
      val (eB, rB) = other.getOrElse(i, (mB, mB))
      i -> (eA + eB, rA + rB)
    }
    // re-truncate to capacity: survivors are the largest estimates
    // (item-name tie-break keeps the result deterministic)
    val kept = merged.sortBy { case (i, (e, _)) => (-e, i) }.take(capacity)
    buf.clear()
    kept.foreach { case (i, c) => buf.update(i, c) }
    buf
  }

  override def eval(buf: Buf): Any = {
    val top = buf.toSeq.sortBy { case (i, (e, _)) => (-e, i) }.take(k)
    new GenericArrayData(top.map { case (i, (e, r)) =>
      InternalRow(UTF8String.fromString(i), e, r)
    })
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (i, (e, r)) =>
      val b = i.getBytes(UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(e); out.writeLong(r)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val b = new Array[Byte](in.readInt()); in.readFully(b)
      buf.update(new String(b, UTF_8), (in.readLong(), in.readLong()))
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("err", LongType, nullable = false))))
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
  override def withNewMutableAggBufferOffset(offset: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "heavy_hitters"
}

object SpaceSavingTopK {
  /** Top-k heavy hitters of a string column as a sorted
    * array<struct<item, est, err>> aggregate Column. */
  def heavyHitters(c: Column, capacity: Int, k: Int): Column =
    ColumnBridge.column(
      SpaceSavingTopK(ColumnBridge.expression(c), capacity, k)
        .toAggregateExpression())
}
