package graft.sinks

import graft.operators.CdcApply
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{DataType, StructField, StructType}

import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** Schema-evolution diff: symmetric difference between the live table
  * schema and an incoming DDL schema (reference CDCKudu.java:78-137). */
object SchemaEvolution {
  final case class Diff(added: Seq[StructField], dropped: Seq[String]) {
    def isEmpty: Boolean = added.isEmpty && dropped.isEmpty
  }
  // Name comparison matches the envelope-validation posture (and Spark's
  // default resolution): case-insensitive, so a DDL record that merely
  // re-cases a column — the same column to the analyzer — is not a diff.
  def diff(current: StructType, target: StructType): Diff = {
    def has(names: Array[String], n: String) = names.exists(_.equalsIgnoreCase(n))
    Diff(
      added = target.fields.toSeq.filterNot(f => has(current.fieldNames, f.name)),
      dropped = current.fieldNames.toSeq.filterNot(has(target.fieldNames, _)))
  }
}

/** A PK-addressed mutable target — the surface Kudu/HBase/Bigtable all
  * reduce to in the reference (create / alter / put-all-columns /
  * delete-row, reference CDCTableUtil.java:57-96). Implementations must
  * be idempotent per (key, version): replays are safe, which is what
  * makes at-least-once delivery correct end-to-end (SURVEY.md §2.2). */
trait CdcWriter {
  def createTableIfAbsent(table: String, schema: StructType, pks: Seq[String]): Unit
  def alterTable(table: String, add: Seq[StructField], drop: Seq[String]): Unit
  def upsert(table: String, key: String, values: Map[String, String]): Unit
  def delete(table: String, key: String): Unit
  def schemaOf(table: String): Option[StructType]

  /** DML-path forms carrying the record's primary-key names — the
    * reference's DML record shape (every change carries
    * `primary_keys`, CDCKudu.java:141-145), which PK-column-addressed
    * sinks (Kudu) need: their client sets each key column individually
    * instead of addressing a joined row-key string. Row-key-addressed
    * sinks ignore the extra arguments via these defaults. */
  def upsert(table: String, pks: Seq[String], key: String,
             values: Map[String, String]): Unit = upsert(table, key, values)
  def delete(table: String, pks: Seq[String], key: String,
             values: Map[String, String]): Unit = delete(table, key)
}

/** In-process writer target: the test/spec stand-in for the external
  * stores (works in local mode because executors share the JVM; a real
  * deployment plugs a Kudu/HBase/JDBC-backed CdcWriter in here). */
class InMemoryStore extends CdcWriter {
  private val schemas = new ConcurrentHashMap[String, StructType]()
  private val pks = new ConcurrentHashMap[String, Seq[String]]()
  private val tables = new ConcurrentHashMap[String, ConcurrentHashMap[String, Map[String, String]]]()

  override def createTableIfAbsent(table: String, schema: StructType, keys: Seq[String]): Unit = {
    schemas.putIfAbsent(table, schema)
    pks.putIfAbsent(table, keys)
    tables.putIfAbsent(table, new ConcurrentHashMap())
  }
  override def alterTable(table: String, add: Seq[StructField], drop: Seq[String]): Unit =
    schemas.computeIfPresent(table, (_, cur) => StructType(
      cur.fields.filterNot(f => drop.contains(f.name)) ++ add))
  // DML auto-creates the table on first touch — create-if-absent is the
  // reference sink behavior (CDCTableUtil.java:57-64); a DDL record later
  // fills in the schema.
  override def upsert(table: String, key: String, values: Map[String, String]): Unit =
    tables.computeIfAbsent(table, _ => new ConcurrentHashMap()).put(key, values)
  override def delete(table: String, key: String): Unit =
    tables.computeIfAbsent(table, _ => new ConcurrentHashMap()).remove(key)
  override def schemaOf(table: String): Option[StructType] = Option(schemas.get(table))

  def rows(table: String): Map[String, Map[String, String]] =
    Option(tables.get(table)).map(_.asScala.toMap).getOrElse(Map.empty)
}

/** Named registry for ANY [[CdcWriter]] implementation, so foreachBatch
  * closures (which serialize) can locate the writer by name inside
  * executors in local mode; a cluster deployment constructs the client
  * adapter per executor instead. Unregistered names default to a fresh
  * [[InMemoryStore]]. */
object CdcWriters {
  private val writers = new ConcurrentHashMap[String, CdcWriter]()
  def register(name: String, w: CdcWriter): Unit = writers.put(name, w)
  def getOrCreate(name: String): CdcWriter =
    writers.computeIfAbsent(name, _ => new InMemoryStore)
  def drop(name: String): Unit = writers.remove(name)
}

/** InMemoryStore's view of the shared registry (the test/spec default). */
object InMemoryStore {
  def get(name: String): InMemoryStore =
    CdcWriters.getOrCreate(name).asInstanceOf[InMemoryStore]
  def drop(name: String): Unit = CdcWriters.drop(name)
}

/** The sink: applies envelope micro-batches to a [[CdcWriter]].
  *
  * Per batch — mirroring the reference's contract but order-safe
  * (SURVEY.md §7.3 hard part 2): the (tiny) DDL phase runs first on the
  * driver (create / schema-diff alter, reference flushes-before-alter
  * CDCKudu.java:361-364); then DML is compacted to the latest change per
  * (table, row-key) with one window shuffle — making replay order
  * irrelevant — and applied partition-parallel. */
object UpsertSink {

  /** Envelope DML records → `(table, op, row_key, values, version)`.
    *
    * Row key per reference getRowKey (CDCTableUtil.java:98-105): sort the
    * PK NAMES, then join the corresponding values in name order — never
    * sort the values themselves. Null-strict per segment
    * (CdcApply.strictKeySegment): a missing/NULL PK value raises a named
    * error instead of collapsing keys. `try_element_at` keeps the lookup
    * NULL-on-missing under ANSI mode, so the named error is preserved. */
  private[sinks] def dmlProjection(batch: DataFrame): DataFrame =
    batch.filter(col("dml").isNotNull).select(
      col("dml.table").as("table"),
      col("dml.opType").as("op"),
      concat_ws(":", transform(array_sort(col("dml.primaryKeys")),
        k => CdcApply.strictKeySegment(k, try_element_at(col("dml.rowsValues"), k))))
        .as("row_key"),
      col("dml.rowsValues").as("values"),
      col("dml.changeTrackingVersion").cast("long").as("version"))

  /** [[dmlProjection]] plus the record's primary-key NAMES — the writer
    * registry path needs them (PK-column-addressed sinks); the parquet
    * store's row-key-addressed projection stays 5-column. */
  private[sinks] def dmlProjectionWithPks(batch: DataFrame): DataFrame =
    batch.filter(col("dml").isNotNull).select(
      col("dml.table").as("table"),
      col("dml.opType").as("op"),
      concat_ws(":", transform(array_sort(col("dml.primaryKeys")),
        k => CdcApply.strictKeySegment(k, try_element_at(col("dml.rowsValues"), k))))
        .as("row_key"),
      col("dml.rowsValues").as("values"),
      col("dml.changeTrackingVersion").cast("long").as("version"),
      col("dml.primaryKeys").as("pks"))

  def applyBatch(batch: DataFrame, writerName: String): Unit = {
    val writer = CdcWriters.getOrCreate(writerName)
    // --- DDL phase (few rows: one per table per batch at most) ---
    val ddl = batch.filter(col("ddl").isNotNull)
      .select(col("ddl.table"), col("ddl.schemaJson"))
      .collect()
    ddl.foreach { r =>
      val table = r.getString(0)
      val target = DataType.fromJson(r.getString(1)).asInstanceOf[StructType]
      writer.schemaOf(table) match {
        case None => writer.createTableIfAbsent(table, target, Seq.empty)
        case Some(cur) =>
          val d = SchemaEvolution.diff(cur, target)
          if (!d.isEmpty) writer.alterTable(table, d.added, d.dropped)
      }
    }
    // --- DML phase: compact per (table, rowKey), then apply ---
    val compacted = CdcApply.latestByKey(dmlProjectionWithPks(batch),
      Seq("table", "row_key"), col("version"))
    compacted.foreachPartition { rows: Iterator[Row] =>
      val w = CdcWriters.getOrCreate(writerName)
      rows.foreach { r =>
        val (table, op, key) = (r.getString(0), r.getString(1), r.getString(2))
        val values = r.getMap[String, String](3).toMap
        val pks = r.getSeq[String](5)
        if (op == graft.model.OpType.Delete) w.delete(table, pks, key, values)
        else w.upsert(table, pks, key, values)
      }
    }
  }

  /** Pipeline-build-time envelope validation (reference CDCKudu.java:71-76,
    * CDCHBase.java:58-64: the sink refuses a stream whose schema is not the
    * changeRecord envelope, before anything starts). Containment, not
    * equality: extra columns are tolerated, missing/mistyped ones are not. */
  def validateEnvelopeSchema(schema: StructType): Unit = {
    // Name matching follows the session's resolution posture: under the
    // default spark.sql.caseSensitive=false a stream whose analyzer would
    // resolve 'DML' must not be rejected here as missing — but when
    // case-sensitive analysis is on, accepting 'DML' would defeat
    // fail-before-start (the analyzer would fail mid-stream instead).
    val nameMatches: (String, String) => Boolean =
      if (org.apache.spark.sql.internal.SQLConf.get.caseSensitiveAnalysis)
        (a, b) => a == b
      else (a, b) => a.equalsIgnoreCase(b)
    def contains(actual: StructType, required: StructType, path: String): Unit =
      required.fields.foreach { f =>
        val a = actual.fields.find(a => nameMatches(a.name, f.name)).getOrElse(
          throw new IllegalArgumentException(
            s"envelope schema is missing required field '$path${f.name}'"))
        (a.dataType, f.dataType) match {
          case (as: StructType, fs: StructType) => contains(as, fs, s"$path${f.name}.")
          case (at, ft) => require(
            DataType.equalsStructurally(at, ft, ignoreNullability = true),
            s"envelope field '$path${f.name}' has type ${at.sql}, expected ${ft.sql}")
        }
      }
    contains(schema, graft.model.Schemas.changeRecordType, "")
  }

  /** Streaming entry: envelope stream → foreachBatch(applyBatch). */
  def stream(envelope: DataFrame, writerName: String, checkpoint: String): StreamingQuery = {
    validateEnvelopeSchema(envelope.schema)
    envelope.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: DataFrame, _: Long) => applyBatch(b, writerName))
      .start()
  }

  /** Streaming entry against the durable, cluster-valid target: envelope
    * stream → foreachBatch([[ParquetUpsertStore.applyBatch]]). The batch id
    * flows through to the store's manifest commit, so a replayed batch
    * (at-least-once foreachBatch) rewrites the same snapshot and re-commits
    * the same manifest — idempotent end-to-end. */
  def stream(envelope: DataFrame, store: ParquetUpsertStore,
             checkpoint: String): StreamingQuery = {
    validateEnvelopeSchema(envelope.schema)
    envelope.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: DataFrame, id: Long) => store.applyBatch(b, id))
      .start()
  }
}
