package graft.sinks

import org.apache.spark.sql.types.{StringType, StructField, StructType}

import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentHashMap

/** The exact call surface the reference's HBase sink drives
  * (CDCHBase.java:67-89 walks each partition holding a `Connection` +
  * `Admin`; CDCTableUtil.java:57-64 `Admin.tableExists`/`createTable`
  * with the one `cdc` column family; :72-96 `Table.put(Put)` /
  * `Table.delete(Delete)`; :121-161 `Put.addColumn(family, qualifier,
  * value)` per column with `Bytes.toBytes` encodings) — declared here
  * as a minimal SPI because no HBase client jar is reachable in this
  * zero-egress sandbox and `build.sbt` may not grow dependencies.
  *
  * Method names and arities mirror `org.apache.hadoop.hbase.client` so
  * the live binding is a mechanical 1:1 delegation:
  * {{{
  *   class LiveHBase(conn: org.apache.hadoop.hbase.client.Connection)
  *       extends HBaseShaped.Connection {
  *     def getAdmin = new HBaseShaped.Admin {
  *       def tableExists(n: String) = conn.getAdmin.tableExists(TableName.valueOf(n))
  *       def createTable(n: String, fam: Array[Byte]) = ... // HTableDescriptor + addFamily
  *     }
  *     def getTable(n: String) = new HBaseShaped.HTable {
  *       def put(p: HBaseShaped.Put) = {
  *         val hp = new client.Put(p.row)
  *         p.cells.foreach(c => hp.addColumn(c.family, c.qualifier, c.value))
  *         conn.getTable(TableName.valueOf(n)).put(hp)
  *       }
  *       def delete(d: HBaseShaped.Delete) =
  *         conn.getTable(TableName.valueOf(n)).delete(new client.Delete(d.row))
  *     }
  *     def close() = conn.close()
  *   }
  * }}}
  */
object HBaseShaped {

  /** One accumulated mutation cell; `value` may be null — the
    * reference puts an explicit null cell for a null column value
    * (CDCTableUtil.java:122-125). */
  final case class MutCell(family: Array[Byte], qualifier: Array[Byte],
                           value: Array[Byte])

  /** Mirror of `client.Put`: a row key plus accumulated `addColumn`
    * cells, applied atomically per row by `HTable.put`. */
  final class Put(val row: Array[Byte]) {
    private val buf = Seq.newBuilder[MutCell]
    def addColumn(family: Array[Byte], qualifier: Array[Byte],
                  value: Array[Byte]): Put = {
      buf += MutCell(family, qualifier, value)
      this
    }
    def cells: Seq[MutCell] = buf.result()
  }

  /** Mirror of `client.Delete`: whole-row removal. */
  final class Delete(val row: Array[Byte])

  trait HTable {
    def put(p: Put): Unit
    def delete(d: Delete): Unit
  }

  trait Admin {
    def tableExists(name: String): Boolean
    def createTable(name: String, family: Array[Byte]): Unit
  }

  trait Connection extends AutoCloseable {
    def getAdmin: Admin
    def getTable(name: String): HTable
    def close(): Unit
  }
}

/** SNK3 through the client-shaped SPI: a [[CdcWriter]] whose every
  * mutation flows through `Admin`/`HTable`/`Put`/`Delete` calls —
  * create with the reference's one `cdc` family, sorted-PK row-key
  * bytes, cells typed through the recorded schema via [[CellCodec]]
  * (byte-for-byte the reference's `Bytes.toBytes` encodings,
  * CellCodecSpec). HBase itself is schemaless beyond the family, so the
  * schema registry lives client-side (the reference re-parses it from
  * every DML record; recording it at DDL time is the same information
  * one hop earlier). */
class HBaseShapedWriter(conn: HBaseShaped.Connection) extends CdcWriter {
  import HBaseShaped._

  private val family = CellCodec.ColumnFamily
  private val schemas = new ConcurrentHashMap[String, StructType]()

  override def createTableIfAbsent(table: String, schema: StructType,
                                   pks: Seq[String]): Unit = {
    val admin = conn.getAdmin
    if (!admin.tableExists(table)) admin.createTable(table, family)
    schemas.putIfAbsent(table, schema)
  }

  override def alterTable(table: String, add: Seq[StructField],
                          drop: Seq[String]): Unit =
    schemas.computeIfPresent(table, (_, cur) => StructType(
      cur.fields.filterNot(f => drop.exists(_.equalsIgnoreCase(f.name))) ++ add))

  private def ensureTable(table: String): HTable = {
    // DML before any DDL auto-creates, the reference sink posture
    // (CDCTableUtil.java:57-64 runs per DDL record; our writer contract
    // lets DML lead — InMemoryStore documents the same)
    val admin = conn.getAdmin
    if (!admin.tableExists(table)) admin.createTable(table, family)
    conn.getTable(table)
  }

  override def upsert(table: String, key: String,
                      values: Map[String, String]): Unit = {
    val cells = Option(schemas.get(table)) match {
      case Some(schema) => CellCodec.putCells(schema, values)
      case None => values.toSeq.sortBy(_._1).map { case (c, v) =>
        CellCodec.Cell(c, CellCodec.encodeCell(StringType, v))
      }
    }
    val put = new Put(CellCodec.rowKeyBytes(key))
    cells.foreach(c =>
      put.addColumn(family, CellCodec.encodeString(c.column), c.value))
    ensureTable(table).put(put)
  }

  override def delete(table: String, key: String): Unit =
    ensureTable(table).delete(new Delete(CellCodec.rowKeyBytes(key)))

  override def schemaOf(table: String): Option[StructType] =
    Option(schemas.get(table))
}

/** In-memory fake cluster over the client-shaped SPI — the offline
  * stand-in a live `ConnectionFactory.createConnection(conf)` replaces.
  * Stores raw bytes exactly as handed through `put`: rows keyed by
  * row-key bytes (stringified), cells keyed `family:qualifier`. */
class InMemoryHBaseCluster extends HBaseShaped.Connection {
  import scala.jdk.CollectionConverters._

  private val created = ConcurrentHashMap.newKeySet[String]()
  private val familyOf = new ConcurrentHashMap[String, String]()
  private val data = new ConcurrentHashMap[
    String, ConcurrentHashMap[String, Map[String, Array[Byte]]]]()
  @volatile var closed = false

  override val getAdmin: HBaseShaped.Admin = new HBaseShaped.Admin {
    override def tableExists(name: String): Boolean = created.contains(name)
    override def createTable(name: String, family: Array[Byte]): Unit = {
      created.add(name)
      familyOf.put(name, new String(family, UTF_8))
      data.putIfAbsent(name, new ConcurrentHashMap())
    }
  }

  override def getTable(name: String): HBaseShaped.HTable =
    new HBaseShaped.HTable {
      private def rows = data.computeIfAbsent(name, _ => new ConcurrentHashMap())
      override def put(p: HBaseShaped.Put): Unit = {
        val key = new String(p.row, UTF_8)
        val cells = p.cells.map(c =>
          s"${new String(c.family, UTF_8)}:${new String(c.qualifier, UTF_8)}"
            -> c.value).toMap
        // per-row atomic merge: a Put replaces the cells it names,
        // leaves others (HBase cell-level versioning semantics)
        rows.merge(key, cells, (old, nw) => old ++ nw)
      }
      override def delete(d: HBaseShaped.Delete): Unit =
        rows.remove(new String(d.row, UTF_8))
    }

  override def close(): Unit = closed = true

  def family(table: String): Option[String] = Option(familyOf.get(table))
  def rows(table: String): Map[String, Map[String, Array[Byte]]] =
    Option(data.get(table)).map(_.asScala.toMap).getOrElse(Map.empty)
}
