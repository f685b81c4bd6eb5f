package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Count-Min frequency sketch (Cormode & Muthukrishnan) as a
  * `TypedImperativeAggregate`, reporting the estimated count of a fixed
  * probe set: `depth × width` counters per buffer regardless of stream
  * or vocabulary size, every estimate an UPPER bound on the true count
  * (`true ≤ est`, and `est ≤ true + εN` with probability 1−δ for
  * ε = e/width, δ = e^−depth).
  *
  * This completes the sketch tier's frequency axis (HLL = cardinality
  * q22, GK = quantiles q48, SpaceSaving = heavy hitters ns19, Bloom =
  * membership q47): where SpaceSaving answers "which items are
  * frequent", Count-Min answers "how frequent is THIS item" for items
  * chosen up front — the shuffle carries a fixed-size counter grid, so
  * at 100 TB the cost is O(partitions × depth × width) independent of
  * the token stream. The sketch hashes with a FIXED seed, so partial
  * buffers merge cell-wise (`mergeInPlace` — counters add exactly) and
  * the result is bitwise deterministic under any merge order, unlike
  * SpaceSaving's eviction regime. When no probe's cells collide with
  * another token in at least one of the `depth` rows — guaranteed in
  * practice by width ≫ vocabulary — estimates are EXACT, which is what
  * lets ns26 sit under the DuckDB exact-count oracle while the spec
  * pins the over-count bound separately.
  */
case class CountMinFreq(
    child: Expression,
    probes: Seq[String],
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMinSketch] {

  require(depth > 0 && width > 0, s"need depth/width > 0, got $depth/$width")
  require(probes.nonEmpty, "need at least one probe item")

  // Reject non-string input at ANALYSIS time: update() casts to
  // UTF8String, and without this guard a LongType child would pass
  // analysis and then throw ClassCastException executor-side.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"countmin_freq requires STRING input, got ${child.dataType.sql}")

  private val Seed = 0x5eed

  override def createAggregationBuffer(): CountMinSketch =
    CountMinSketch.create(depth, width, Seed)

  override def update(buf: CountMinSketch, input: InternalRow): CountMinSketch = {
    val v = child.eval(input)
    if (v != null) buf.addString(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: CountMinSketch, other: CountMinSketch): CountMinSketch = {
    buf.mergeInPlace(other)
    buf
  }

  /** One struct per probe, in the declared probe order. */
  override def eval(buf: CountMinSketch): Any =
    new GenericArrayData(probes.map { p =>
      InternalRow(UTF8String.fromString(p), buf.estimateCount(p))
    })

  override def serialize(buf: CountMinSketch): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    buf.writeTo(bos)
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false))))
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
  override def withNewMutableAggBufferOffset(offset: Int): CountMinFreq =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CountMinFreq =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "countmin_freq"
}

object CountMinFreq {
  /** Estimated counts of `probes` within a string column, as a
    * probe-ordered array<struct<item, est>> aggregate Column. */
  def freq(c: Column, probes: Seq[String], depth: Int, width: Int): Column =
    ColumnBridge.column(
      CountMinFreq(ColumnBridge.expression(c), probes, depth, width)
        .toAggregateExpression())
}
