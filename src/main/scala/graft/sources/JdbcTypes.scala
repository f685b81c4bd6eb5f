package graft.sources

import graft.model.{ChangeRecord, Dml, OpType}
import org.apache.spark.sql.types._

import java.sql.{Blob, Clob, ResultSet, ResultSetMetaData, Types}
import java.util.concurrent.TimeUnit

/** The JDBC type-mapping tier: `ResultSetMetaData` → Spark schema and
  * `ResultSet` value coercion, replicating the reference's DBUtils
  * semantics quirk-for-quirk (reference common/DBUtils.java:97-169 for the
  * schema mapping, :172-209 for value transforms, and
  * source/sqlserver/ResultSetToDMLRecord.java:96-113 for the temporal
  * portable encodings):
  *
  *   - NUMERIC/DECIMAL are LOSSY by design: scale ≠ 0 → double,
  *     precision > 9 → long, else int (DBUtils.java:131-137) — never a
  *     DecimalType.
  *   - MySQL's "int unsigned" INTEGER maps to long (DBUtils.java:119,
  *     CDAP-12211); every other INTEGER stays int.
  *   - DATE/TIME/TIMESTAMP map to logical date / time-micros /
  *     timestamp-micros (DBUtils.java:143-148). Spark's DateType and
  *     TimestampType carry days/micros natively; TIME becomes a long of
  *     microseconds since midnight (no TimeType in the envelope regime).
  *   - TINYINT/SMALLINT widen to int; REAL/FLOAT narrow to float;
  *     BINARY/VARBINARY/LONGVARBINARY/BLOB → bytes; ROWID reads as
  *     string; CLOB materializes via getSubString; the VARCHAR family
  *     falls through to string (DBUtils.java:98-99).
  *   - ARRAY/DATALINK/DISTINCT/JAVA_OBJECT/OTHER/REF/SQLXML/STRUCT are
  *     rejected up front (DBUtils.java:160-168).
  *
  * Everything here is plain driver/executor JVM code with no connection
  * management — the scan side hands it a ResultSet (live JDBC or the
  * offline [[JdbcFixture]]) and gets envelope records back.
  */
object JdbcTypes {

  /** Spark column type for one JDBC column (reference DBUtils.java:97-169). */
  def sparkType(typeName: String, sqlType: Int, precision: Int, scale: Int): DataType =
    sqlType match {
      case Types.NULL => NullType
      case Types.ROWID => StringType
      case Types.BOOLEAN | Types.BIT => BooleanType
      case Types.TINYINT | Types.SMALLINT => IntegerType
      case Types.INTEGER =>
        // CDAP-12211 quirk: unsigned 32-bit overflows int — widen to long.
        if ("int unsigned".equalsIgnoreCase(typeName)) LongType else IntegerType
      case Types.BIGINT => LongType
      case Types.REAL | Types.FLOAT => FloatType
      case Types.NUMERIC | Types.DECIMAL =>
        // Lossy on purpose: digits after the point → double; otherwise int
        // unless 10+ digits are needed to hold 2^32 → long.
        if (scale != 0) DoubleType else if (precision > 9) LongType else IntegerType
      case Types.DOUBLE => DoubleType
      case Types.DATE => DateType
      case Types.TIME => LongType // time-micros since midnight
      case Types.TIMESTAMP => TimestampType
      case Types.BINARY | Types.VARBINARY | Types.LONGVARBINARY | Types.BLOB =>
        BinaryType
      case Types.ARRAY | Types.DATALINK | Types.DISTINCT | Types.JAVA_OBJECT |
           Types.OTHER | Types.REF | Types.SQLXML | Types.STRUCT =>
        throw new java.sql.SQLException(s"Unsupported SQL Type: $sqlType")
      case _ => StringType // VARCHAR/CHAR/CLOB/N*/LONG* families
    }

  /** Full result-set schema with JDBC nullability
    * (reference DBUtils.java:76-95). */
  def schemaFor(md: ResultSetMetaData): StructType = StructType(
    (1 to md.getColumnCount).map { i =>
      StructField(
        md.getColumnName(i),
        sparkType(md.getColumnTypeName(i), md.getColumnType(i),
          md.getPrecision(i), md.getScale(i)),
        nullable = md.isNullable(i) == ResultSetMetaData.columnNullable)
    })

  /** Value coercion per column type (reference DBUtils.java:172-209):
    * the object JDBC hands back is re-read through the accessor the
    * target type requires. */
  def transformValue(sqlType: Int, precision: Int, scale: Int,
                     rs: ResultSet, field: String): Any = {
    val original = rs.getObject(field)
    if (original == null) null
    else sqlType match {
      case Types.SMALLINT | Types.TINYINT =>
        original.asInstanceOf[Number].intValue()
      case Types.NUMERIC | Types.DECIMAL =>
        val d = original.asInstanceOf[java.math.BigDecimal]
        if (scale != 0) d.doubleValue()
        else if (precision > 9) d.longValue()
        else d.intValue()
      case Types.DATE => rs.getDate(field)
      case Types.TIME => rs.getTime(field)
      case Types.TIMESTAMP => rs.getTimestamp(field)
      case Types.ROWID => rs.getString(field)
      case Types.BLOB =>
        val b = original.asInstanceOf[Blob]
        b.getBytes(1, b.length().toInt)
      case Types.CLOB =>
        val c = original.asInstanceOf[Clob]
        c.getSubString(1, c.length().toInt)
      case _ => original
    }
  }

  /** SQL temporal → portable record value (reference
    * ResultSetToDMLRecord.java:96-113): dates are days since the epoch,
    * times are microseconds since midnight, timestamps are epoch
    * microseconds. */
  def toPortable(v: Any): Any = v match {
    case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
    case t: java.sql.Time =>
      TimeUnit.NANOSECONDS.toMicros(t.toLocalTime.toNanoOfDay)
    case ts: java.sql.Timestamp =>
      val i = ts.toInstant
      TimeUnit.SECONDS.toMicros(i.getEpochSecond) +
        TimeUnit.NANOSECONDS.toMicros(i.getNano)
    case other => other
  }

  /** Coerced value → the envelope's stringly transport form. DATE and
    * TIMESTAMP travel as their SQL literal strings (the
    * map<string,string> regime re-types by cast, and a cast understands
    * the literal, not the portable integer); TIME travels as its
    * portable micros-since-midnight (its declared column type IS long);
    * bytes go base64. */
  def stringify(v: Any): String = v match {
    case null => null
    case b: Array[Byte] => java.util.Base64.getEncoder.encodeToString(b)
    case d: java.sql.Date => d.toString
    case t: java.sql.Time => toPortable(t).toString
    case ts: java.sql.Timestamp => ts.toString
    case other => other.toString
  }

  /** Number of leading change-tracking columns in a change-scan result set
    * (CHANGE_TRACKING_VERSION, SYS_CHANGE_CREATION_VERSION,
    * SYS_CHANGE_OPERATION, CDC_CURRENT_TIMESTAMP — reference
    * CTInputDStream.java:149-153, ResultSetToDMLRecord.java:48). */
  val ChangeTableColumns = 4

  /** The data-row schema of a change scan: everything after the
    * change-tracking prefix (reference ResultSetToDMLRecord.java:89-94). */
  def changeSchema(md: ResultSetMetaData): StructType =
    StructType(schemaFor(md).fields.drop(ChangeTableColumns))

  /** Drain a change-scan ResultSet into envelope records — the row-decode
    * tier of SRC1f with real JDBC typing (reference
    * ResultSetToDMLRecord.java:56-94: op from SYS_CHANGE_OPERATION's
    * short name, version from CHANGE_TRACKING_VERSION, timestamp from
    * CDC_CURRENT_TIMESTAMP at millisecond precision ×1000, values
    * coerced per column). */
  def changeRecords(rs: ResultSet, schemaName: String, tableName: String,
                    primaryKeys: Seq[String]): Seq[ChangeRecord] = {
    val md = rs.getMetaData
    val rowSchema = changeSchema(md)
    val cols = (1 to md.getColumnCount).drop(ChangeTableColumns).map { i =>
      (md.getColumnName(i), md.getColumnType(i), md.getPrecision(i), md.getScale(i))
    }
    val out = Seq.newBuilder[ChangeRecord]
    while (rs.next()) {
      val values = cols.map { case (name, sqlType, p, s) =>
        name -> stringify(transformValue(sqlType, p, s, rs, name))
      }.toMap
      out += ChangeRecord.ofDml(Dml(
        opType = OpType.parse(rs.getString("SYS_CHANGE_OPERATION")),
        table = s"$schemaName.$tableName",
        primaryKeys = primaryKeys,
        rowsSchemaJson = rowSchema.json,
        rowsValues = values,
        changeTrackingVersion = rs.getString("CHANGE_TRACKING_VERSION"),
        cdcCurrentTimestampMicros =
          rs.getTimestamp("CDC_CURRENT_TIMESTAMP").getTime * 1000))
    }
    out.result()
  }
}
