package graft.sinks

import org.apache.spark.sql.types._

import java.nio.charset.StandardCharsets.UTF_8

/** Per-type cell byte encodings for the external row stores — the exact
  * `Bytes.toBytes` semantics the reference sinks write with (reference
  * sink/CDCTableUtil.java:120-161; `io.cdap.cdap.api.common.Bytes` carries
  * HBase's encoding):
  *
  *   - boolean → one byte, `0xFF` for true / `0x00` for false
  *   - int/long → 4/8-byte big-endian two's complement
  *   - float/double → big-endian IEEE-754 bit pattern (4/8 bytes)
  *   - string → UTF-8 bytes
  *   - bytes → passed through (the envelope carries them base64)
  *   - null → a null-valued cell (the reference puts an explicit null
  *     column, CDCTableUtil.java:124-127)
  *
  * The engine's envelope carries row values as `map<string,string>`
  * (typing is the manifest schema's job, [[graft.operators.DmlFlattener
  * .typedColumns]]), so this tier is the bridge from that canonical string
  * form to each store's wire bytes: given the recorded column type, it
  * parses the string and emits the same bytes the reference would for the
  * typed value. With it in place, a live HBase/Bigtable adapter is
  * mechanical — `table.put(rowKeyBytes, family, cell.column, cell.bytes)`
  * per cell — which is precisely the seam [[CdcWriter]] leaves open.
  */
object CellCodec {

  /** The reference's single column family (CDCTableUtil.java:49). */
  val ColumnFamily: Array[Byte] = encodeString("cdc")

  def encodeBoolean(b: Boolean): Array[Byte] =
    Array(if (b) (-1).toByte else 0.toByte)

  def encodeInt(i: Int): Array[Byte] =
    Array((i >>> 24).toByte, (i >>> 16).toByte, (i >>> 8).toByte, i.toByte)

  def encodeLong(l: Long): Array[Byte] =
    Array.tabulate(8)(k => (l >>> (56 - 8 * k)).toByte)

  def encodeFloat(f: Float): Array[Byte] =
    encodeInt(java.lang.Float.floatToRawIntBits(f))

  def encodeDouble(d: Double): Array[Byte] =
    encodeLong(java.lang.Double.doubleToRawLongBits(d))

  def encodeString(s: String): Array[Byte] = s.getBytes(UTF_8)

  /** Row-key bytes: UTF-8 of the engine's row key, which is already the
    * reference's form — PK NAMES sorted, values joined with ':'
    * (CDCTableUtil.java:98-105 = [[UpsertSink.dmlProjection]]). */
  def rowKeyBytes(rowKey: String): Array[Byte] = encodeString(rowKey)

  /** Envelope string value → store bytes for a column of type `dt`.
    * `null` maps to `null` (an explicit null cell, not an absent one).
    * Only the reference's simple types are encodable — anything else is
    * the same hard error the reference raises
    * (CDCTableUtil.java:106-118,158-160). */
  def encodeCell(dt: DataType, value: String): Array[Byte] =
    if (value == null) null
    else dt match {
      case BooleanType => encodeBoolean(value.toBoolean)
      case ByteType | ShortType | IntegerType => encodeInt(value.trim.toInt)
      case LongType => encodeLong(value.trim.toLong)
      case FloatType => encodeFloat(value.trim.toFloat)
      case DoubleType => encodeDouble(value.trim.toDouble)
      case StringType => encodeString(value)
      case BinaryType => java.util.Base64.getDecoder.decode(value)
      case other => throw new IllegalArgumentException(
        s"unsupported cell type ${other.sql}: only simple types are " +
          "supported (boolean, int, long, float, double, bytes, string)")
    }

  /** One encoded cell: `value == null` is an explicit null cell. */
  final case class Cell(column: String, value: Array[Byte])

  /** The cells of an HBase/Bigtable put for one upserted row: one cell per
    * schema field, valued from the envelope map (absent key → null cell) —
    * the reference's put-all-columns shape (CDCTableUtil.java:78-86).
    * A delete carries no cells: the whole row is removed by key
    * (CDCTableUtil.java:88-92). */
  def putCells(schema: StructType, values: Map[String, String]): Seq[Cell] =
    schema.fields.toSeq.map { f =>
      Cell(f.name, encodeCell(f.dataType, values.getOrElse(f.name, null)))
    }
}

/** [[CdcWriter]] adapter through the byte tier — the in-memory stand-in
  * that proves a live HBase/Bigtable client adapter is purely mechanical:
  * replace the `rows` map mutation with `Table.put(new Put(rowKey)...)` /
  * `Table.delete(new Delete(rowKey))` and nothing else changes (reference
  * sink/CDCBigTable.java:68-95 is exactly this loop around a Connection).
  *
  * Cells are typed through the schema the DDL phase recorded
  * (create/alter); columns of a table no DDL has described yet encode as
  * strings — the envelope's canonical form, same metadata-only typing
  * posture as the durable store. */
class EncodedCellStore extends CdcWriter {
  import scala.jdk.CollectionConverters._
  private val schemas = new java.util.concurrent.ConcurrentHashMap[String, StructType]()
  private val tables = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.ConcurrentHashMap[String, Seq[CellCodec.Cell]]]()

  override def createTableIfAbsent(table: String, schema: StructType,
                                   pks: Seq[String]): Unit = {
    schemas.putIfAbsent(table, schema)
    tables.putIfAbsent(table, new java.util.concurrent.ConcurrentHashMap())
  }
  override def alterTable(table: String, add: Seq[StructField],
                          drop: Seq[String]): Unit =
    schemas.computeIfPresent(table, (_, cur) => StructType(
      cur.fields.filterNot(f => drop.exists(_.equalsIgnoreCase(f.name))) ++ add))
  override def upsert(table: String, key: String,
                      values: Map[String, String]): Unit = {
    val cells = Option(schemas.get(table)) match {
      case Some(schema) => CellCodec.putCells(schema, values)
      case None => values.toSeq.sortBy(_._1).map { case (c, v) =>
        CellCodec.Cell(c, CellCodec.encodeCell(StringType, v))
      }
    }
    tables.computeIfAbsent(table, _ => new java.util.concurrent.ConcurrentHashMap())
      .put(new String(CellCodec.rowKeyBytes(key), UTF_8), cells)
  }
  override def delete(table: String, key: String): Unit =
    tables.computeIfAbsent(table, _ => new java.util.concurrent.ConcurrentHashMap())
      .remove(new String(CellCodec.rowKeyBytes(key), UTF_8))
  override def schemaOf(table: String): Option[StructType] =
    Option(schemas.get(table))

  /** Encoded rows of `table`: rowKey → cells, for spec assertions. */
  def encodedRows(table: String): Map[String, Seq[CellCodec.Cell]] =
    Option(tables.get(table)).map(_.asScala.toMap).getOrElse(Map.empty)
}

/** The Kudu face of the same seam: Kudu writes typed values through a
  * typed client row, not raw bytes, so this tier maps the recorded Spark
  * type to the Kudu column type and parses the envelope string to the
  * matching JVM value (reference sink/CDCKudu.java:186-226,306-346).
  *
  * The one Kudu-specific rule: a PRIMARY-KEY column of type bool, float,
  * or double is not a legal Kudu key — the reference declares the column
  * STRING and writes `String.valueOf(value)` instead
  * (CDCKudu.java:315-321); the envelope's canonical string is exactly
  * that form, so the coerced value is the string as-carried. */
object KuduCells {

  sealed abstract class KuduType(val name: String)
  case object KString extends KuduType("STRING")
  case object KInt32 extends KuduType("INT32")
  case object KInt64 extends KuduType("INT64")
  case object KBinary extends KuduType("BINARY")
  case object KDouble extends KuduType("DOUBLE")
  case object KFloat extends KuduType("FLOAT")
  case object KBool extends KuduType("BOOL")

  /** Column type mapping incl. the PK coercion (CDCKudu.java:311-345). */
  def kuduType(name: String, dt: DataType, primaryKeys: Set[String]): KuduType = {
    val base = dt match {
      case StringType => KString
      case ByteType | ShortType | IntegerType => KInt32
      case LongType => KInt64
      case BinaryType => KBinary
      case DoubleType => KDouble
      case FloatType => KFloat
      case BooleanType => KBool
      case other => throw new IllegalArgumentException(
        s"type ${other.sql} is not supported by Kudu")
    }
    base match {
      case KBool | KFloat | KDouble if primaryKeys.contains(name) => KString
      case t => t
    }
  }

  /** One typed Kudu cell: `value == None` sets the column to null
    * (CDCKudu.java:189-192). The carried value's runtime type matches
    * `ktype` (String/Int/Long/Array[Byte]/Double/Float/Boolean), ready
    * for the client's `row.add<Type>` call. */
  final case class KuduCell(column: String, ktype: KuduType, value: Option[Any])

  private def parse(ktype: KuduType, s: String): Any = ktype match {
    case KString => s
    case KInt32 => s.trim.toInt
    case KInt64 => s.trim.toLong
    case KBinary => java.util.Base64.getDecoder.decode(s)
    case KDouble => s.trim.toDouble
    case KFloat => s.trim.toFloat
    case KBool => s.toBoolean
  }

  /** Cells of an INSERT/UPDATE: every schema field, typed
    * (CDCKudu.java:155-168,186-226). */
  def upsertCells(schema: StructType, primaryKeys: Set[String],
                  values: Map[String, String]): Seq[KuduCell] =
    schema.fields.toSeq.map { f =>
      val kt = kuduType(f.name, f.dataType, primaryKeys)
      KuduCell(f.name, kt, values.get(f.name).filter(_ != null).map(parse(kt, _)))
    }

  /** Cells of a DELETE: only the key columns are set on the delete row
    * (CDCKudu.java:169-180). */
  def deleteCells(schema: StructType, primaryKeys: Set[String],
                  values: Map[String, String]): Seq[KuduCell] =
    upsertCells(schema, primaryKeys, values)
      .filter(c => primaryKeys.contains(c.column))
}
