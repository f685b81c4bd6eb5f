package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.util
import scala.jdk.CollectionConverters._

/** DSv2 micro-batch source for a change-tracking feed — the Spark-native
  * re-design of the reference's CTInputDStream
  * (reference: source/sqlserver/CTInputDStream.java:100-179).
  *
  * What the DStream did imperatively, the DSv2 contract does declaratively:
  *  - offset/admission control: `cur = min(currentVersion, prev + maxBatchSize)`
  *    (CTInputDStream.java:113-122) becomes `SupportsAdmissionControl
  *    .latestOffset(start, ReadLimit)` — and offsets are CHECKPOINTED by
  *    Structured Streaming, fixing the reference's restart-loses-offset
  *    bug (volatile `trackingOffset`, CTInputDStream.java:58).
  *  - parallelism: the reference reads one JDBC partition (admitted TODO,
  *    CTInputDStream.java:166-167); here `planInputPartitions` splits the
  *    key space into `numPartitions` hash ranges read concurrently.
  *  - DDL snapshot per batch (SRC1a/SRC1e): with `emitDdl=true`, each
  *    batch plans one extra partition carrying the current schema of
  *    every tracked table (snapshotted driver-side at plan time, exactly
  *    where the reference does its metadata I/O), tagged with the
  *    batch's start version so DDL sorts before DML (the E1 ordering
  *    contract).
  *  - the CHANGETABLE range predicate stays pushed down into the store
  *    scan (the simulator's `changes(prev, cur, part, n)`; a JDBC-backed
  *    store composes the same SQL the reference builds,
  *    CTInputDStream.java:149-158).
  *  - retry window (SRC1d): on source failure the stream emits empty
  *    batches until `maxRetrySeconds` elapse, then rethrows
  *    (CTInputDStream.java:73-98).
  *
  * Usage:
  * {{{
  *   spark.readStream.format(classOf[ChangeFeedProvider].getName)
  *     .option("store", "my-feed").option("maxBatchSize", "100")
  *     .option("numPartitions", "4").option("emitDdl", "true").load()
  * }}}
  */
class ChangeFeedProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ChangeFeedSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ChangeFeedTable(properties.asScala.toMap)
}

object ChangeFeedSource {
  /** kind = 'ddl' (schema snapshot row; op/key/payload null) or
    * 'dml' (change row; schemaJson null). */
  val schema: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("table", StringType, nullable = false),
    StructField("version", LongType, nullable = false),
    StructField("op", StringType, nullable = true),
    StructField("key", LongType, nullable = true),
    StructField("payload", StringType, nullable = true),
    StructField("schemaJson", StringType, nullable = true)))
}

private[sources] class ChangeFeedTable(props: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = s"change_feed(${props.getOrElse("store", "?")})"
  override def schema(): StructType = ChangeFeedSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava

  /** Per-field option validation (the V1 config-validation surface;
    * reference CTSQLServerConfig.java:173-197 style: name the offending
    * property). Defaults mirror the reference: maxBatchSize 100000
    * (CTSQLServerConfig.java:116). */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val store = options.get("store")
    require(store != null && store.nonEmpty, "option 'store' is required")
    val maxBatchSize =
      Option(options.get("maxBatchSize")).map(_.toLong).getOrElse(100000L)
    require(maxBatchSize > 0, s"option 'maxBatchSize' must be > 0, got $maxBatchSize")
    val numPartitions =
      Option(options.get("numPartitions")).map(_.toInt).getOrElse(4)
    require(numPartitions > 0, s"option 'numPartitions' must be > 0, got $numPartitions")
    val maxRetrySeconds =
      Option(options.get("maxRetrySeconds")).map(_.toLong).getOrElse(60L)
    require(maxRetrySeconds >= 0, s"option 'maxRetrySeconds' must be >= 0, got $maxRetrySeconds")
    val emitDdl =
      Option(options.get("emitDdl")).map(_.toBoolean).getOrElse(false)
    // SRC1a through the connection seam: when a registered
    // ConnectionFactory is named, run table discovery + the typed
    // schema snapshot over a real java.sql.Connection at plan time —
    // driver-side, once per stream start, exactly where the reference
    // does its metadata I/O (CTInputDStream.java:222-241) — and seed
    // the store's schema registry so the per-batch DDL snapshots
    // (SRC1e) carry the discovered schemas. A live deployment
    // registers a driver-backed factory; specs register
    // JdbcFixture.connection. The optional 'tableWhitelist' option
    // (comma-separated) mirrors the reference's whitelist semantics.
    Option(options.get("connectionFactory")).foreach { name =>
      val factory = ConnectionFactory.lookup(name)
      val whitelist = Option(options.get("tableWhitelist"))
        .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
        .getOrElse(Set.empty[String])
      val tables = JdbcDiscovery.discoverVia(factory, whitelist)
      val snapshot = JdbcDiscovery.schemaSnapshotVia(factory, tables)
      val st = ChangeTrackingStore.get(store)
      snapshot.foreach { case (t, json) => st.setSchema(t, json) }
    }
    () => new ChangeFeedScan(store, maxBatchSize, numPartitions, maxRetrySeconds, emitDdl)
  }
}

private[sources] class ChangeFeedScan(store: String, maxBatchSize: Long,
                                      numPartitions: Int,
                                      maxRetrySeconds: Long = 60L,
                                      emitDdl: Boolean = false) extends Scan {
  override def readSchema(): StructType = ChangeFeedSource.schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new ChangeFeedMicroBatchStream(store, maxBatchSize, numPartitions,
      maxRetrySeconds, emitDdl)
}

/** Offset = the change-tracking version high-water mark. */
private[sources] case class VersionOffset(version: Long) extends Offset {
  override def json(): String = version.toString
}

private[sources] class ChangeFeedMicroBatchStream(
    store: String, maxBatchSize: Long, numPartitions: Int,
    maxRetrySeconds: Long = 60L, emitDdl: Boolean = false)
  extends MicroBatchStream with SupportsAdmissionControl
  with SupportsTriggerAvailableNow {

  // Trigger.AvailableNow target: pinned at query start so the drain has a
  // stable end even while writers keep appending.
  @volatile private var availableNowTarget: Option[Long] = None

  override def initialOffset(): Offset = VersionOffset(0L)
  override def deserializeOffset(json: String): Offset =
    VersionOffset(json.toLong)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(maxBatchSize)

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(ChangeTrackingStore.get(store).currentVersion)

  // Last successfully observed live version — lets the (metrics-only)
  // reportLatestOffset stay quiet through a source outage instead of
  // killing the query.
  @volatile private var lastKnownLive: Long = 0L

  override def reportLatestOffset(): Offset = VersionOffset(
    try {
      lastKnownLive = ChangeTrackingStore.get(store).currentVersion
      lastKnownLive
    } catch { case _: Exception => lastKnownLive })

  // SRC1d retry window: on source failure, emit an empty batch (offset
  // unchanged) and keep retrying until maxRetrySeconds have elapsed,
  // then rethrow (reference CTInputDStream.java:73-98).
  @volatile private var firstFailureAtMs: Long = -1L

  /** cur = min(currentVersion, prev + maxBatchSize) — SRC1c. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val prev = start.asInstanceOf[VersionOffset].version
    val live =
      try {
        val v = availableNowTarget
          .getOrElse(ChangeTrackingStore.get(store).currentVersion)
        firstFailureAtMs = -1L
        v
      } catch {
        case e: Exception =>
          val now = System.currentTimeMillis()
          if (firstFailureAtMs < 0) firstFailureAtMs = now
          if (now - firstFailureAtMs > maxRetrySeconds * 1000L) throw e
          prev // empty batch; retry on the next trigger
      }
    val cap = limit match {
      case m: ReadMaxRows => m.maxRows()
      case _ => maxBatchSize
    }
    VersionOffset(math.min(live, prev + cap))
  }
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (lo, hi) = (start.asInstanceOf[VersionOffset].version,
      end.asInstanceOf[VersionOffset].version)
    val data = Array.tabulate[InputPartition](numPartitions)(p =>
      ChangeFeedPartition(store, lo, hi, p, numPartitions))
    if (!emitDdl) data
    else {
      // Driver-side schema snapshot — one DDL row per tracked table,
      // stamped with the batch's start version so DDL sorts first.
      val snapshot = ChangeTrackingStore.get(store).schemas.toSeq.sorted
      DdlSnapshotPartition(snapshot, lo) +: data
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => partition match {
      case p: ChangeFeedPartition => new ChangeFeedPartitionReader(p)
      case d: DdlSnapshotPartition => new DdlSnapshotReader(d)
    }

  override def commit(end: Offset): Unit = () // source-side state is the log itself
  override def stop(): Unit = ()
}

private[sources] case class ChangeFeedPartition(
    store: String, prev: Long, cur: Long, part: Int, nParts: Int)
  extends InputPartition

private[sources] case class DdlSnapshotPartition(
    schemas: Seq[(String, String)], startVersion: Long) extends InputPartition

private[sources] class ChangeFeedPartitionReader(p: ChangeFeedPartition)
    extends PartitionReader[InternalRow] {
  // Pushed-down range + key-hash scan (one store call per partition).
  private val it = ChangeTrackingStore.get(p.store)
    .changes(p.prev, p.cur, p.part, p.nParts).iterator
  private var cur: ChangeTrackingStore.Change = _

  override def next(): Boolean = { val has = it.hasNext; if (has) cur = it.next(); has }
  override def get(): InternalRow = InternalRow(
    UTF8String.fromString("dml"),
    UTF8String.fromString(cur.table),
    cur.version,
    UTF8String.fromString(cur.op),
    cur.key,
    if (cur.payload == null) null else UTF8String.fromString(cur.payload),
    null)
  override def close(): Unit = ()
}

private[sources] class DdlSnapshotReader(p: DdlSnapshotPartition)
    extends PartitionReader[InternalRow] {
  private val it = p.schemas.iterator
  private var cur: (String, String) = _
  override def next(): Boolean = { val has = it.hasNext; if (has) cur = it.next(); has }
  override def get(): InternalRow = InternalRow(
    UTF8String.fromString("ddl"),
    UTF8String.fromString(cur._1),
    p.startVersion,
    null, null, null,
    UTF8String.fromString(cur._2))
  override def close(): Unit = ()
}
