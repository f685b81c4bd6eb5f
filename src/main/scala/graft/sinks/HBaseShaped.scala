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

  /** Mirror of `client.Mutation`, the common parent `BufferedMutator
    * .mutate` accepts — both row-addressed write kinds below extend it. */
  sealed trait Mutation { def row: Array[Byte] }

  /** Mirror of `client.Put`: a row key plus accumulated `addColumn`
    * cells, applied atomically per row by `HTable.put`. */
  final class Put(val row: Array[Byte]) extends Mutation {
    private val buf = Seq.newBuilder[MutCell]
    def addColumn(family: Array[Byte], qualifier: Array[Byte],
                  value: Array[Byte]): Put = {
      buf += MutCell(family, qualifier, value)
      this
    }
    def cells: Seq[MutCell] = buf.result()
  }

  /** Mirror of `client.Delete`: whole-row removal. */
  final class Delete(val row: Array[Byte]) extends Mutation

  /** Approximate wire weight of a mutation — what the live client
    * tracks against `writeBufferSize` to decide an auto-flush. */
  def mutationBytes(m: Mutation): Long = m match {
    case p: Put => p.row.length.toLong + p.cells.iterator.map(c =>
      c.family.length.toLong + c.qualifier.length +
        Option(c.value).map(_.length).getOrElse(0)).sum
    case d: Delete => d.row.length.toLong
  }

  /** Mirror of `client.BufferedMutator` — HBase's PUBLIC batching
    * surface (`Connection.getBufferedMutator(BufferedMutatorParams)`):
    * mutations accumulate client-side and ship as batched RPCs when the
    * buffered weight crosses `writeBufferSize`, on `flush()`, and on
    * `close()`. This is the posture a 100 TB CDC apply needs — the
    * reference's per-record `Table.put` loop (CDCHBase.java:83-86) costs
    * one RPC per row. */
  trait BufferedMutator extends AutoCloseable {
    def mutate(m: Mutation): Unit
    def mutate(ms: Seq[Mutation]): Unit = ms.foreach(mutate)
    def flush(): Unit
    def close(): Unit
  }

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

    /** Mirror of `client.Connection.getBufferedMutator`. The default is
      * a client-side buffer draining through [[getTable]] in arrival
      * order on flush — semantically what the live mutator guarantees
      * per-mutator (ordered application, batched transport), so an
      * in-memory binding inherits correct behavior and a live binding
      * overrides with the real `conn.getBufferedMutator(params)`.
      * NOT thread-safe per instance, matching the live client's
      * "one mutator per worker thread" contract. */
    def getBufferedMutator(name: String,
                           writeBufferSize: Long = 2L * 1024 * 1024): BufferedMutator =
      new BufferedMutator {
        private val buf = scala.collection.mutable.ArrayBuffer.empty[Mutation]
        private var weight = 0L
        override def mutate(m: Mutation): Unit = {
          buf += m
          weight += mutationBytes(m)
          if (weight >= writeBufferSize) flush()
        }
        override def flush(): Unit = if (buf.nonEmpty) {
          val t = getTable(name)
          buf.foreach {
            case p: Put    => t.put(p)
            case d: Delete => t.delete(d)
          }
          buf.clear()
          weight = 0L
        }
        override def close(): Unit = flush()
      }
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
class HBaseShapedWriter(protected val conn: HBaseShaped.Connection)
    extends CdcWriter {
  import HBaseShaped._

  protected val family: Array[Byte] = CellCodec.ColumnFamily
  private val schemas = new ConcurrentHashMap[String, StructType]()

  override def createTableIfAbsent(table: String, schema: StructType,
                                   pks: Seq[String]): Unit = {
    ensureCreated(table)
    schemas.putIfAbsent(table, schema)
    ()
  }

  override def alterTable(table: String, add: Seq[StructField],
                          drop: Seq[String]): Unit =
    schemas.computeIfPresent(table, (_, cur) => StructType(
      cur.fields.filterNot(f => drop.exists(_.equalsIgnoreCase(f.name))) ++ add))

  protected def ensureCreated(table: String): Unit = {
    // DML before any DDL auto-creates, the reference sink posture
    // (CDCTableUtil.java:57-64 runs per DDL record; our writer contract
    // lets DML lead — InMemoryStore documents the same)
    val admin = conn.getAdmin
    if (!admin.tableExists(table)) admin.createTable(table, family)
  }

  /** Transport seam: every mutation funnels through here, so a subclass
    * can swap row-at-a-time `HTable` calls for a batching transport
    * without touching the cell/row-key/schema logic above it. */
  protected def submit(table: String, m: Mutation): Unit = {
    ensureCreated(table)
    val t = conn.getTable(table)
    m match {
      case p: Put    => t.put(p)
      case d: Delete => t.delete(d)
    }
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
    submit(table, put)
  }

  override def delete(table: String, key: String): Unit =
    submit(table, new Delete(CellCodec.rowKeyBytes(key)))

  override def schemaOf(table: String): Option[StructType] =
    Option(schemas.get(table))
}

/** SNK3 at scale: the same cell/row-key/schema logic as
  * [[HBaseShapedWriter]], but every mutation rides a per-table
  * [[HBaseShaped.BufferedMutator]] — HBase's public batching client —
  * instead of a per-row `HTable` RPC. A 100 TB CDC apply writes
  * millions of rows per partition; the reference's row-at-a-time
  * `Table.put` loop (CDCHBase.java:83-86) makes every one a network
  * round-trip, which is THE throughput ceiling of that sink. One
  * mutator per (writer, table), arrival-ordered, auto-flushing past
  * `writeBufferSize`, drained on [[flush]]/[[close]] — call [[close]]
  * at partition end (foreachPartition / ForeachWriter.close), exactly
  * where the live client's try-with-resources sits. */
class BufferedHBaseWriter(c: HBaseShaped.Connection,
                          writeBufferSize: Long = 2L * 1024 * 1024)
    extends HBaseShapedWriter(c) with AutoCloseable {
  import HBaseShaped._

  // Single-threaded per writer (the per-partition contract), so a plain
  // map: a ConcurrentHashMap.computeIfAbsent would imply cross-thread
  // sharing the mutator itself does not support.
  private val mutators = scala.collection.mutable.Map.empty[String, BufferedMutator]

  override protected def submit(table: String, m: Mutation): Unit =
    mutators.getOrElseUpdate(table, {
      ensureCreated(table)
      conn.getBufferedMutator(table, writeBufferSize)
    }).mutate(m)

  /** Drain every table's buffer; mutations become visible to readers. */
  def flush(): Unit = mutators.values.foreach(_.flush())

  /** Flush + release; the writer stays usable (a new mutator is opened
    * lazily on the next write), mirroring live-client reconnect. */
  override def close(): Unit = {
    mutators.values.foreach(_.close())
    mutators.clear()
  }
}

/** SNK2 (Bigtable) over the SAME client SPI: the reference's Bigtable
  * sink drives the HBase client API end to end — its connection is
  * `BigtableConfiguration.connect(...)`'s HBase-compatible `Connection`
  * and every subsequent call is `Admin`/`Table`/`Put`/`Delete`
  * (CDCBigTable.java:19-20 imports, :73-95 run loop — byte-identical to
  * CDCHBase's), so the live Bigtable binding is the same 1:1 delegation
  * documented on [[HBaseShaped]], handed a Bigtable-backed connection.
  * What Bigtable adds is a NAMING constraint: ids must match
  * `[_a-zA-Z0-9][-_.a-zA-Z0-9]*` — dots fine, colons rejected by the
  * service with INVALID_ARGUMENT (CDCBigTable.java:78-83 documents the
  * grpc failure). Validating client-side turns a mid-stream grpc error
  * into an immediate, nameable one. */
class BigtableShapedWriter(c: HBaseShaped.Connection,
                           writeBufferSize: Long = 2L * 1024 * 1024)
    extends BufferedHBaseWriter(c, writeBufferSize) {
  private val ValidId = "[_a-zA-Z0-9][-_.a-zA-Z0-9]*".r

  // The validation seam is table CREATION, which both entry points funnel
  // through — the DDL path (createTableIfAbsent) and the DML-leading
  // auto-create inside submit — so a colon-named table can neither be
  // created nor written through this tier.
  override protected def ensureCreated(table: String): Unit = {
    require(ValidId.matches(table),
      s"Bigtable table id '$table' must match [_a-zA-Z0-9][-_.a-zA-Z0-9]* " +
        "(colons are rejected by the service; strip the namespace first)")
    super.ensureCreated(table)
  }
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
