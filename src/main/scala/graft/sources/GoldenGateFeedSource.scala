package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import java.util
import java.util.concurrent.ConcurrentHashMap
import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

/** Kafka-shaped micro-batch source for the GoldenGate byte feed — the
  * transport tier of SRC2 (reference source/oracle/GoldenGateKafka.java):
  * a single-partition, offset-addressed message log read as a DSv2
  * stream.
  *
  * The reference's transport semantics, re-expressed:
  *   - **−1/−2 initial-offset sentinels**: the configured default initial
  *     offset may be −1 (latest) or −2 (earliest), which Kafka's direct
  *     stream cannot take literally, so the reference resolves them
  *     against the broker before starting (GoldenGateKafka.java:142-169).
  *     Here that resolution happens in `initialOffset()` — the exact
  *     DSv2 hook Structured Streaming calls once, on first start; on
  *     restart the checkpoint supersedes it, which fixes the reference's
  *     re-resolve-on-restart data loss (a −1 restart would skip whatever
  *     arrived while down).
  *   - **single-partition enforcement**: the reference demands exactly
  *     one partition on the topic (GoldenGateKafka.java:188-203); the
  *     scan builder enforces the same invariant up front.
  *   - **admission control**: `maxBatchSize` caps each micro-batch
  *     (`latestOffset(start, limit)`), where the reference drained
  *     whatever the DStream fetched.
  *
  * The transport behind the source is [[MessageLog]] — an in-memory
  * fixture standing in for a broker partition (no Kafka in this
  * environment); a real deployment swaps `readStream.format(...)` for
  * Spark's kafka source and keeps everything downstream of the bytes
  * identical ([[GoldenGateDml.classify]] onward).
  */
object GoldenGateFeed {

  val EarliestSentinel: Long = -2L // kafka.api.OffsetRequest.EarliestTime
  val LatestSentinel: Long = -1L // kafka.api.OffsetRequest.LatestTime

  /** `offset` + raw message `value` — the shape the Kafka source emits
    * (keys are unused by the reference path). */
  val schema: StructType = StructType(Seq(
    StructField("offset", LongType, nullable = false),
    StructField("value", BinaryType, nullable = false)))

  /** Resolve a configured initial offset against the log — the
    * reference's loadOffsets (GoldenGateKafka.java:142-169): −2 →
    * earliest retained, −1 → log-end, anything else passes through
    * (clamped into the retained range so an offset expired by retention
    * fails loudly rather than silently skipping). */
  def resolveInitialOffset(initial: Long, log: MessageLog): Long = initial match {
    case EarliestSentinel => log.earliest
    case LatestSentinel => log.latest
    case o =>
      require(o >= log.earliest && o <= log.latest,
        s"initial offset $o is outside the retained range " +
          s"[${log.earliest}, ${log.latest}]")
      o
  }
}

/** One broker partition in memory: append-only offset-addressed log with
  * a retention floor (`expireThrough` models segment deletion, which is
  * what makes −2/earliest ≠ 0 observable). Registry-named so DSv2 reader
  * factories can find it from executor code in local mode. */
final class MessageLog {
  private val buf = ArrayBuffer.empty[Array[Byte]]
  private var firstRetained = 0L

  def append(bytes: Array[Byte]): Long = synchronized {
    buf += bytes
    buf.size - 1L
  }
  /** Earliest retained offset (Kafka's smallest offset). */
  def earliest: Long = synchronized(firstRetained)
  /** Log-end offset: the offset the NEXT message will get (Kafka's
    * latest-time answer — one past the last record). */
  def latest: Long = synchronized(buf.size.toLong)
  /** Drop retention: offsets below `offset` become unreadable. */
  def expireThrough(offset: Long): Unit = synchronized {
    firstRetained = math.max(firstRetained, math.min(offset, latest))
  }
  /** Messages with offsets in [from, untilExcl). */
  def fetch(from: Long, untilExcl: Long): Seq[(Long, Array[Byte])] = synchronized {
    require(from >= firstRetained, s"offset $from expired (earliest $firstRetained)")
    (math.max(from, firstRetained) until math.min(untilExcl, latest))
      .map(o => o -> buf(o.toInt))
  }
  def partitions: Set[Int] = Set(0)
}

object MessageLog {
  private val logs = new ConcurrentHashMap[String, MessageLog]()
  def get(name: String): MessageLog = logs.computeIfAbsent(name, _ => new MessageLog)
  def drop(name: String): Unit = logs.remove(name)
}

class GoldenGateFeedProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GoldenGateFeed.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new GoldenGateFeedTable(properties.asScala.toMap)
}

private[sources] class GoldenGateFeedTable(props: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = s"goldengate_feed(${props.getOrElse("log", "?")})"
  override def schema(): StructType = GoldenGateFeed.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val logName = options.get("log")
    require(logName != null && logName.nonEmpty, "option 'log' is required")
    val initialOffset =
      Option(options.get("initialOffset")).map(_.toLong)
        .getOrElse(GoldenGateFeed.LatestSentinel)
    val maxBatchSize =
      Option(options.get("maxBatchSize")).map(_.toLong).getOrElse(1000L)
    require(maxBatchSize > 0, s"option 'maxBatchSize' must be > 0, got $maxBatchSize")
    // single-partition enforcement (GoldenGateKafka.java:188-203)
    val parts = MessageLog.get(logName).partitions
    require(parts.size == 1,
      s"Topic '$logName' should only have one partition. Found '${parts.size}' partitions.")
    () => new GoldenGateFeedScan(logName, initialOffset, maxBatchSize)
  }
}

private[sources] class GoldenGateFeedScan(log: String, initialOffset: Long,
                                          maxBatchSize: Long) extends Scan {
  override def readSchema(): StructType = GoldenGateFeed.schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GoldenGateFeedMicroBatchStream(log, initialOffset, maxBatchSize)
}

private[sources] class GoldenGateFeedMicroBatchStream(
    log: String, initial: Long, maxBatchSize: Long)
  extends MicroBatchStream with SupportsAdmissionControl {

  /** Sentinel resolution happens HERE, once, at first start; restarts
    * deserialize the checkpointed offset instead. */
  override def initialOffset(): Offset = VersionOffset(
    GoldenGateFeed.resolveInitialOffset(initial, MessageLog.get(log)))
  override def deserializeOffset(json: String): Offset =
    VersionOffset(json.toLong)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(maxBatchSize)

  override def reportLatestOffset(): Offset =
    VersionOffset(MessageLog.get(log).latest)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val prev = start.asInstanceOf[VersionOffset].version
    val cap = limit match {
      case m: ReadMaxRows => m.maxRows()
      case _ => maxBatchSize
    }
    VersionOffset(math.min(MessageLog.get(log).latest, prev + cap))
  }
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    Array(GoldenGateFeedPartition(log,
      start.asInstanceOf[VersionOffset].version,
      end.asInstanceOf[VersionOffset].version))

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) =>
      new GoldenGateFeedPartitionReader(partition.asInstanceOf[GoldenGateFeedPartition])

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] case class GoldenGateFeedPartition(
    log: String, from: Long, untilExcl: Long) extends InputPartition

private[sources] class GoldenGateFeedPartitionReader(p: GoldenGateFeedPartition)
    extends PartitionReader[InternalRow] {
  private val it = MessageLog.get(p.log).fetch(p.from, p.untilExcl).iterator
  private var cur: (Long, Array[Byte]) = _
  override def next(): Boolean = { val has = it.hasNext; if (has) cur = it.next(); has }
  override def get(): InternalRow = InternalRow(cur._1, cur._2)
  override def close(): Unit = ()
}
