package graft

import graft.sources.{JdbcFixture, JdbcTypes}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.{Date, SQLException, Time, Timestamp, Types}
import java.time.Instant
import javax.sql.rowset.serial.{SerialBlob, SerialClob}

/** Branch-by-branch matrix for the JDBC type tier — each quirk of the
  * reference's DBUtils mapping (DBUtils.java:97-169 schema, :172-209
  * values, ResultSetToDMLRecord.java:96-113 portable temporals) asserted
  * one branch at a time, through the real java.sql interfaces via the
  * offline fixture. */
class JdbcTypesSpec extends AnyFunSuite {
  import JdbcTypes._

  private def t(sqlType: Int, typeName: String = "x", p: Int = 0, s: Int = 0) =
    sparkType(typeName, sqlType, p, s)

  test("schema mapping: numeric family") {
    assert(t(Types.TINYINT) == IntegerType && t(Types.SMALLINT) == IntegerType)
    assert(t(Types.INTEGER, "int") == IntegerType)
    assert(t(Types.INTEGER, "int unsigned") == LongType) // CDAP-12211
    assert(t(Types.INTEGER, "INT UNSIGNED") == LongType) // case-insensitive
    assert(t(Types.BIGINT) == LongType)
    assert(t(Types.REAL) == FloatType && t(Types.FLOAT) == FloatType)
    assert(t(Types.DOUBLE) == DoubleType)
  }

  test("schema mapping: DECIMAL/NUMERIC are lossy by design") {
    // digits after the point → double
    assert(t(Types.DECIMAL, p = 12, s = 2) == DoubleType)
    assert(t(Types.NUMERIC, p = 3, s = 1) == DoubleType)
    // scale 0: int unless 10+ digits are needed for 2^32
    assert(t(Types.DECIMAL, p = 9) == IntegerType)
    assert(t(Types.DECIMAL, p = 10) == LongType)
    assert(t(Types.NUMERIC, p = 38) == LongType)
  }

  test("schema mapping: temporal, boolean, binary, string, null, rowid") {
    assert(t(Types.DATE) == DateType)
    assert(t(Types.TIME) == LongType) // time-micros since midnight
    assert(t(Types.TIMESTAMP) == TimestampType)
    assert(t(Types.BOOLEAN) == BooleanType && t(Types.BIT) == BooleanType)
    Seq(Types.BINARY, Types.VARBINARY, Types.LONGVARBINARY, Types.BLOB)
      .foreach(b => assert(t(b) == BinaryType))
    // the VARCHAR family falls through to string
    Seq(Types.VARCHAR, Types.CHAR, Types.CLOB, Types.LONGVARCHAR,
      Types.NVARCHAR, Types.NCHAR, Types.NCLOB, Types.LONGNVARCHAR)
      .foreach(v => assert(t(v) == StringType))
    assert(t(Types.NULL) == NullType)
    assert(t(Types.ROWID) == StringType)
  }

  test("schema mapping: structured SQL types are rejected up front") {
    Seq(Types.ARRAY, Types.DATALINK, Types.DISTINCT, Types.JAVA_OBJECT,
      Types.OTHER, Types.REF, Types.SQLXML, Types.STRUCT).foreach { s =>
      intercept[SQLException](t(s))
    }
  }

  test("schemaFor carries JDBC nullability") {
    val md = JdbcFixture.metaData(Seq(
      JdbcFixture.Col("a", "int", Types.INTEGER, nullable = false),
      JdbcFixture.Col("b", "varchar", Types.VARCHAR, nullable = true)))
    val st = schemaFor(md)
    assert(st == StructType(Seq(
      StructField("a", IntegerType, nullable = false),
      StructField("b", StringType, nullable = true))))
  }

  private def oneRow(col: JdbcFixture.Col, v: Any) =
    JdbcFixture.resultSet(Seq(col), Seq(Seq(v)))

  private def readOne(col: JdbcFixture.Col, v: Any): Any = {
    val rs = oneRow(col, v)
    assert(rs.next())
    transformValue(col.sqlType, col.precision, col.scale, rs, col.name)
  }

  test("value transform: integral widening reads through Number") {
    assert(readOne(JdbcFixture.Col("c", "tinyint", Types.TINYINT), 5.toByte) == 5)
    assert(readOne(JdbcFixture.Col("c", "smallint", Types.SMALLINT), 300.toShort) == 300)
  }

  test("value transform: DECIMAL branches mirror the schema's lossy mapping") {
    def dec(s: String) = new java.math.BigDecimal(s)
    val d = readOne(JdbcFixture.Col("c", "decimal", Types.DECIMAL, 12, 2), dec("123.45"))
    assert(d == 123.45d && d.isInstanceOf[Double])
    val l = readOne(JdbcFixture.Col("c", "decimal", Types.DECIMAL, 12, 0), dec("99999999999"))
    assert(l == 99999999999L && l.isInstanceOf[Long])
    val i = readOne(JdbcFixture.Col("c", "decimal", Types.DECIMAL, 5, 0), dec("123"))
    assert(i == 123 && i.isInstanceOf[Int])
  }

  test("value transform: LOB and ROWID materialization") {
    val bytes = readOne(JdbcFixture.Col("c", "blob", Types.BLOB),
      new SerialBlob(Array[Byte](1, 2, 3)))
    assert(bytes.asInstanceOf[Array[Byte]].toSeq == Seq[Byte](1, 2, 3))
    val str = readOne(JdbcFixture.Col("c", "clob", Types.CLOB),
      new SerialClob("hello".toCharArray))
    assert(str == "hello")
    assert(readOne(JdbcFixture.Col("c", "rowid", Types.ROWID), "AAAX") == "AAAX")
    assert(readOne(JdbcFixture.Col("c", "int", Types.INTEGER), null) == null)
  }

  test("portable temporals: days / micros-of-day / epoch-micros") {
    assert(toPortable(Date.valueOf("1970-01-02")) == 1)
    assert(toPortable(Date.valueOf("1969-12-31")) == -1)
    assert(toPortable(Time.valueOf("01:02:03")) == 3723000000L)
    val ts = Timestamp.from(Instant.ofEpochSecond(1234567, 123456789))
    assert(toPortable(ts) == 1234567L * 1000000L + 123456L)
    assert(toPortable("passthrough") == "passthrough")
  }

  test("stringly transport: base64 bytes, SQL-literal temporals, null") {
    assert(stringify(null) == null)
    assert(stringify(Array[Byte](1, 2, 3)) == "AQID")
    assert(stringify(Date.valueOf("2024-03-01")) == "2024-03-01")
    assert(stringify(Time.valueOf("01:02:03")) == "3723000000")
    assert(stringify(Timestamp.valueOf("2024-03-01 10:30:00.5")) ==
      "2024-03-01 10:30:00.5")
  }

  test("discovery walks the catalog: CT tables, key columns, whitelist, value columns") {
    import graft.sources.JdbcDiscovery
    import JdbcFixture.Col
    val ctCols = Seq(Col("schema_name", "varchar", Types.VARCHAR),
      Col("table_name", "varchar", Types.VARCHAR))
    def ct() = JdbcFixture.resultSet(ctCols,
      Seq(Seq("dbo", "orders"), Seq("dbo", "items")))
    val tableCols = Map(
      ("dbo", "orders") -> Seq(Col("id", "int", Types.INTEGER, 10),
        Col("amt", "decimal", Types.DECIMAL, 12, 2)),
      ("dbo", "items") -> Seq(Col("sku", "varchar", Types.VARCHAR),
        Col("qty", "int", Types.INTEGER, 10)))
    def colsOf(s: String, t: String) =
      JdbcFixture.resultSet(tableCols((s, t)), Seq.empty)
    val pks = Map(("dbo", "orders") -> Seq("id"), ("dbo", "items") -> Seq("sku"))
    def keysOf(s: String, t: String) = JdbcFixture.resultSet(
      Seq(Col("COLUMN_NAME", "varchar", Types.VARCHAR)), pks((s, t)).map(Seq(_: Any)))

    val all = JdbcDiscovery.discoverTables(ct(), colsOf, keysOf)
    assert(all.map(_.qualifiedName) == Seq("dbo.orders", "dbo.items"))
    assert(all.head.primaryKeys == Seq("id"))
    assert(all.head.valueColumnNames == Seq("amt")) // columns − pks

    // whitelist semantics: empty = all (asserted above); named = filtered
    val wl = JdbcDiscovery.discoverTables(ct(), colsOf, keysOf, Set("items"))
    assert(wl.map(_.name) == Seq("items"))

    // snapshot types flow through the DBUtils tier (DECIMAL(12,2)→double)
    val snap = JdbcDiscovery.schemaSnapshot(all, colsOf)
    assert(DataType.fromJson(snap("dbo.orders")) == StructType(Seq(
      StructField("id", IntegerType), StructField("amt", DoubleType))))
  }

  test("portable temporals round-trip for arbitrary instants (fixed-seed sweep)") {
    // property-style sweep with a fixed-seed generator (no scalatestplus
    // bridge in the offline cache)
    val rnd = new scala.util.Random(20260812L)
    (1 to 200).foreach { _ =>
      val day = rnd.between(-30000L, 30000L)
      val d = java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(day))
      assert(toPortable(d) == day.toInt, s"date epoch-day $day")
      val nanoOfDay = rnd.between(0L, 86400L * 1000000000L)
      val tm = java.sql.Time.valueOf(java.time.LocalTime.ofNanoOfDay(nanoOfDay))
      // java.sql.Time has second precision; compare at the value it holds
      assert(toPortable(tm) ==
        tm.toLocalTime.toNanoOfDay / 1000L, "time micros-of-day")
      val sec = rnd.between(-2000000000L, 4000000000L)
      val nanos = rnd.between(0L, 1000000000L)
      val ts = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec, nanos))
      assert(toPortable(ts) == sec * 1000000L + nanos / 1000L,
        s"timestamp micros for $sec.$nanos")
    }
  }

  test("changeRecords decodes a change scan into envelope DML records") {
    val cols = Seq(
      JdbcFixture.Col("CHANGE_TRACKING_VERSION", "bigint", Types.BIGINT),
      JdbcFixture.Col("SYS_CHANGE_CREATION_VERSION", "bigint", Types.BIGINT),
      JdbcFixture.Col("SYS_CHANGE_OPERATION", "varchar", Types.VARCHAR),
      JdbcFixture.Col("CDC_CURRENT_TIMESTAMP", "timestamp", Types.TIMESTAMP),
      JdbcFixture.Col("id", "int", Types.INTEGER, precision = 10, nullable = false),
      JdbcFixture.Col("v", "decimal", Types.DECIMAL, precision = 10, scale = 3))
    val ct = Timestamp.from(Instant.ofEpochSecond(1700000000L, 123000000))
    val recs = JdbcTypes.changeRecords(
      JdbcFixture.resultSet(cols, Seq(
        Seq[Any](7L, 7L, "I", ct, 1, new java.math.BigDecimal("9.125")),
        Seq[Any](8L, 7L, "D", ct, 2, null))),
      "dbo", "orders", Seq("id"))
    assert(recs.size == 2)
    val d1 = recs.head.dml.get
    assert(d1.table == "dbo.orders" && d1.primaryKeys == Seq("id"))
    assert(d1.opType == "INSERT" && d1.changeTrackingVersion == "7")
    // timestamp rides at millisecond precision ×1000
    assert(d1.cdcCurrentTimestampMicros == ct.getTime * 1000)
    assert(d1.rowsValues == Map("id" -> "1", "v" -> "9.125"))
    // the in-band schema is the change schema (prefix columns dropped)
    val st = DataType.fromJson(d1.rowsSchemaJson).asInstanceOf[StructType]
    assert(st == StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("v", DoubleType))))
    val d2 = recs(1).dml.get
    assert(d2.opType == "DELETE" && d2.rowsValues == Map("id" -> "2", "v" -> null))
  }
}
