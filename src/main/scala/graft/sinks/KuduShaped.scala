package graft.sinks

import graft.sinks.KuduCells.{KuduCell, KuduType}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import java.util.concurrent.ConcurrentHashMap

/** SNK1's client call surface (reference CDCKudu.java:349-376 walks
  * each partition holding a `KuduClient` + `KuduSession`
  * (`AUTO_FLUSH_BACKGROUND`, buffer 100); :139-180 per-record
  * `tableExists`/create-on-first-DML, `openTable` →
  * `newInsert`/`newUpdate`/`newDelete` → typed `PartialRow.add<Type>`
  * setters → `session.apply`; :103-137 DDL → `alterTable` with
  * `addNullableColumn`/drop + a `session.flush()` when the schema
  * changed; :229-257 create with PK-FIRST column order (KUDU-1271) and
  * hash partitions on the keys) — declared here as a minimal SPI
  * because no Kudu client jar is reachable in this zero-egress sandbox
  * and `build.sbt` may not grow dependencies.
  *
  * Names and arities mirror `org.apache.kudu.client` so the live
  * binding is a mechanical 1:1 delegation: `ColumnSpec` →
  * `ColumnSchema.ColumnSchemaBuilder(name, type).key(k).nullable(n)`,
  * `createTable` → `client.createTable(name, new Schema(cols),
  * new CreateTableOptions().addHashPartitions(pks, buckets))`,
  * `alterTable` → `AlterTableOptions.addNullableColumn`/`dropColumn`,
  * `Upsert`/`Delete` → `table.newUpsert()`/`newDelete()` with the same
  * `getRow.add<Type>`/`setNull` calls, `Session` →
  * `client.newSession()`.
  */
object KuduShaped {

  /** Mirror of `ColumnSchema`: name, type, key flag, nullability. */
  final case class ColumnSpec(name: String, ktype: KuduType,
                              key: Boolean, nullable: Boolean)

  /** Mirror of `PartialRow`: typed per-column setters accumulating the
    * operation's cells. A [[KuduCell]]'s carried value is already the
    * matching JVM type, so the writer dispatches on `ktype` exactly as
    * the reference's `addColumnDataBasedOnType` (CDCKudu.java:186-226). */
  final class PartialRow {
    private val buf = scala.collection.mutable.LinkedHashMap.empty[String, Option[Any]]
    def addString(c: String, v: String): Unit = buf(c) = Some(v)
    def addInt(c: String, v: Int): Unit = buf(c) = Some(v)
    def addLong(c: String, v: Long): Unit = buf(c) = Some(v)
    def addBinary(c: String, v: Array[Byte]): Unit = buf(c) = Some(v)
    def addDouble(c: String, v: Double): Unit = buf(c) = Some(v)
    def addFloat(c: String, v: Float): Unit = buf(c) = Some(v)
    def addBoolean(c: String, v: Boolean): Unit = buf(c) = Some(v)
    def setNull(c: String): Unit = buf(c) = None
    def cells: Seq[(String, Option[Any])] = buf.toSeq
  }

  /** Mirror of `Operation` (Upsert/Delete carry their table + row). */
  sealed abstract class Operation(val table: String) {
    val getRow: PartialRow = new PartialRow
  }
  final class Upsert(table: String) extends Operation(table)
  final class Delete(table: String) extends Operation(table)

  /** Mirror of `KuduTable`: the operation factory. */
  trait KTable {
    def name: String
    def newUpsert(): Upsert = new Upsert(name)
    def newDelete(): Delete = new Delete(name)
  }

  /** Mirror of `KuduSession`. */
  trait Session {
    def apply(op: Operation): Unit
    def flush(): Unit
    def close(): Unit
  }

  /** Mirror of `KuduClient`. `createTable` takes PK-FIRST ordered
    * columns (the caller enforces KUDU-1271 ordering, as the reference
    * does in getOrderedSchemaColumns) plus the hash-partition bucket
    * count for the key columns. */
  trait Client extends AutoCloseable {
    def tableExists(name: String): Boolean
    def createTable(name: String, columns: Seq[ColumnSpec], hashBuckets: Int): Unit
    def alterTable(name: String, addNullable: Seq[(String, KuduType)],
                   drop: Seq[String]): Unit
    def openTable(name: String): KTable
    def newSession(): Session
    def close(): Unit
  }
}

/** SNK1 through the client-shaped SPI: a [[CdcWriter]] whose mutations
  * flow through `Client`/`Session`/`Operation`/`PartialRow` calls,
  * typed through [[KuduCells]] (the DBUtils type map incl. the
  * bool/float/double PK→STRING coercion). Reference fidelity points:
  *
  *   - create on FIRST DML, not on DDL (CDCKudu.java:146-149 — the DML
  *     record carries `primary_keys`; the DDL record does not), with
  *     PK-first column order and hash partitions on the keys;
  *   - DDL alters add columns NULLABLE and flush the session when the
  *     schema changed (CDCKudu.java:103-137);
  *   - deletes set only the key columns on the delete row
  *     (CDCKudu.java:169-180);
  *   - one deliberate divergence: `newUpsert` for both INSERT and
  *     UPDATE where the reference issues `newInsert`/`newUpdate` —
  *     upsert is the replay-safe form (at-least-once delivery replays
  *     batches; a replayed INSERT through `newInsert` faults, through
  *     upsert it converges — SURVEY.md §2.2's idempotency posture).
  */
class KuduShapedWriter(client: KuduShaped.Client, hashBuckets: Int = 8)
  extends CdcWriter {
  import KuduCells._
  import KuduShaped._

  private val schemas = new ConcurrentHashMap[String, StructType]()
  private lazy val session: Session = client.newSession()

  override def createTableIfAbsent(table: String, schema: StructType,
                                   pks: Seq[String]): Unit = {
    // record the schema; physical creation waits for the first DML,
    // which carries the primary keys a Kudu table cannot exist without
    schemas.putIfAbsent(table, schema)
    if (pks.nonEmpty) ensureTable(table, schema, pks)
  }

  override def alterTable(table: String, add: Seq[StructField],
                          drop: Seq[String]): Unit = {
    schemas.computeIfPresent(table, (_, cur) => StructType(
      cur.fields.filterNot(f => drop.exists(_.equalsIgnoreCase(f.name))) ++ add))
    if (client.tableExists(table) && (add.nonEmpty || drop.nonEmpty)) {
      client.alterTable(table,
        add.map(f => f.name -> kuduType(f.name, f.dataType, Set.empty)),
        drop)
      session.flush() // the reference flushes on a schema change
    }
  }

  private def schemaFor(table: String, values: Map[String, String]): StructType =
    Option(schemas.get(table)).getOrElse {
      // DML before any DDL: envelope-canonical string typing (same
      // posture as EncodedCellStore; a later DDL record refines it)
      StructType(values.keys.toSeq.sorted.map(StructField(_, StringType)))
    }

  private def ensureTable(table: String, schema: StructType,
                          pks: Seq[String]): Unit =
    if (!client.tableExists(table)) {
      val pkSet = pks.toSet
      val specs = schema.fields.toSeq.map { f =>
        ColumnSpec(f.name, kuduType(f.name, f.dataType, pkSet),
          key = pkSet.contains(f.name), nullable = !pkSet.contains(f.name))
      }
      // PK-first ordering (KUDU-1271), keys in the record's PK order
      val (keys, rest) = specs.partition(_.key)
      val ordered = pks.flatMap(k => keys.find(_.name == k)) ++ rest
      client.createTable(table, ordered, hashBuckets)
    }

  private def setCells(row: PartialRow, cells: Seq[KuduCell]): Unit =
    cells.foreach { c =>
      c.value match {
        case None => row.setNull(c.column)
        case Some(v) => c.ktype match {
          case KString => row.addString(c.column, v.asInstanceOf[String])
          case KInt32 => row.addInt(c.column, v.asInstanceOf[Int])
          case KInt64 => row.addLong(c.column, v.asInstanceOf[Long])
          case KBinary => row.addBinary(c.column, v.asInstanceOf[Array[Byte]])
          case KDouble => row.addDouble(c.column, v.asInstanceOf[Double])
          case KFloat => row.addFloat(c.column, v.asInstanceOf[Float])
          case KBool => row.addBoolean(c.column, v.asInstanceOf[Boolean])
        }
      }
    }

  override def upsert(table: String, pks: Seq[String], key: String,
                      values: Map[String, String]): Unit = {
    val schema = schemaFor(table, values)
    ensureTable(table, schema, pks)
    val op = client.openTable(table).newUpsert()
    setCells(op.getRow, upsertCells(schema, pks.toSet, values))
    session.apply(op)
  }

  override def delete(table: String, pks: Seq[String], key: String,
                      values: Map[String, String]): Unit = {
    val schema = schemaFor(table, values)
    ensureTable(table, schema, pks)
    val op = client.openTable(table).newDelete()
    setCells(op.getRow, deleteCells(schema, pks.toSet, values))
    session.apply(op)
  }

  // Row-key-only forms cannot address Kudu PK columns — the envelope
  // path always calls the PK-carrying forms (UpsertSink.applyBatch).
  override def upsert(table: String, key: String,
                      values: Map[String, String]): Unit =
    throw new UnsupportedOperationException(
      "KuduShapedWriter needs the primary-key-carrying upsert form")
  override def delete(table: String, key: String): Unit =
    throw new UnsupportedOperationException(
      "KuduShapedWriter needs the primary-key-carrying delete form")

  override def schemaOf(table: String): Option[StructType] =
    Option(schemas.get(table))

  def close(): Unit = { session.close(); client.close() }
}

/** In-memory fake Kudu cluster over the client-shaped SPI — the
  * offline stand-in a live `new KuduClient.KuduClientBuilder(master)
  * .build()` replaces. Rows are addressed by their typed key-column
  * values (stringified in key order), mirroring Kudu's PK addressing. */
class InMemoryKuduCluster extends KuduShaped.Client {
  import KuduShaped._
  import scala.jdk.CollectionConverters._

  final case class TableState(columns: Seq[ColumnSpec], hashBuckets: Int,
                              rows: ConcurrentHashMap[String, Map[String, Option[Any]]])
  private val tables = new ConcurrentHashMap[String, TableState]()
  @volatile var closed = false
  @volatile var flushes = 0

  override def tableExists(name: String): Boolean = tables.containsKey(name)

  override def createTable(name: String, columns: Seq[ColumnSpec],
                           hashBuckets: Int): Unit = {
    require(columns.nonEmpty && columns.head.key,
      s"kudu table $name must lead with its primary key columns (KUDU-1271)")
    require(columns.takeWhile(_.key).nonEmpty, s"kudu table $name needs a key")
    tables.putIfAbsent(name,
      TableState(columns, hashBuckets, new ConcurrentHashMap()))
  }

  override def alterTable(name: String, addNullable: Seq[(String, KuduType)],
                          drop: Seq[String]): Unit =
    tables.computeIfPresent(name, (_, st) => st.copy(columns =
      st.columns.filterNot(c => drop.exists(_.equalsIgnoreCase(c.name))) ++
        addNullable.map { case (n, t) => ColumnSpec(n, t, key = false, nullable = true) }))

  override def openTable(name: String): KTable = {
    require(tableExists(name), s"table $name does not exist")
    val n = name
    new KTable { override def name: String = n }
  }

  private def keyOf(table: String, cells: Map[String, Option[Any]]): String = {
    val keyCols = tables.get(table).columns.filter(_.key).map(_.name)
    keyCols.map(k => cells.get(k).flatten match {
      case Some(b: Array[Byte]) => java.util.Base64.getEncoder.encodeToString(b)
      case Some(v) => v.toString
      case None => throw new IllegalStateException(
        s"operation on $table is missing key column $k")
    }).mkString("\u0000")
  }

  override def newSession(): Session = new Session {
    // AUTO_FLUSH_BACKGROUND semantics: apply lands without an explicit
    // flush; flush() is the visibility barrier the reference invokes
    // after a schema change
    override def apply(op: Operation): Unit = {
      val st = tables.get(op.table)
      require(st != null, s"apply on unknown table ${op.table}")
      val cells = op.getRow.cells.toMap
      op match {
        case _: Upsert => st.rows.put(keyOf(op.table, cells), cells)
        case _: Delete => st.rows.remove(keyOf(op.table, cells))
      }
    }
    override def flush(): Unit = flushes += 1
    override def close(): Unit = ()
  }

  override def close(): Unit = closed = true

  def columns(table: String): Seq[ColumnSpec] =
    Option(tables.get(table)).map(_.columns).getOrElse(Seq.empty)
  def buckets(table: String): Int =
    Option(tables.get(table)).map(_.hashBuckets).getOrElse(0)
  def rows(table: String): Map[String, Map[String, Option[Any]]] =
    Option(tables.get(table)).map(_.rows.asScala.toMap).getOrElse(Map.empty)
}
