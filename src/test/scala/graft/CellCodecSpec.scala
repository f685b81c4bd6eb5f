package graft

import graft.sinks.{CellCodec, KuduCells}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Byte-for-byte pins of the sink cell encodings against the reference's
  * `Bytes.toBytes` semantics (reference sink/CDCTableUtil.java:120-161 —
  * HBase's encoding: big-endian primitives, {-1|0} booleans, UTF-8
  * strings) and the Kudu type tier incl. its PK coercion
  * (CDCKudu.java:186-226,306-346). No SparkSession needed — the tier is
  * pure, which is what keeps a live client adapter mechanical. */
class CellCodecSpec extends AnyFunSuite {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  test("primitive encodings match HBase Bytes.toBytes byte-for-byte") {
    assert(CellCodec.encodeBoolean(true).sameElements(bytes(0xFF)))
    assert(CellCodec.encodeBoolean(false).sameElements(bytes(0x00)))
    assert(CellCodec.encodeInt(1).sameElements(bytes(0, 0, 0, 1)))
    assert(CellCodec.encodeInt(-1).sameElements(bytes(0xFF, 0xFF, 0xFF, 0xFF)))
    assert(CellCodec.encodeInt(0x12345678).sameElements(bytes(0x12, 0x34, 0x56, 0x78)))
    assert(CellCodec.encodeLong(256L).sameElements(bytes(0, 0, 0, 0, 0, 0, 1, 0)))
    assert(CellCodec.encodeLong(-2L)
      .sameElements(bytes(0xFF, 0xFF, 0xFF, 0xFF, 0xFF, 0xFF, 0xFF, 0xFE)))
    // IEEE-754 bit patterns, big-endian: 1.5f = 0x3FC00000, 1.5d = 0x3FF8...
    assert(CellCodec.encodeFloat(1.5f).sameElements(bytes(0x3F, 0xC0, 0, 0)))
    assert(CellCodec.encodeDouble(1.5).sameElements(bytes(0x3F, 0xF8, 0, 0, 0, 0, 0, 0)))
    assert(CellCodec.encodeDouble(-0.0)
      .sameElements(bytes(0x80, 0, 0, 0, 0, 0, 0, 0))) // sign bit survives raw bits
    assert(CellCodec.encodeString("cdc").sameElements(bytes(0x63, 0x64, 0x63)))
    assert(CellCodec.ColumnFamily.sameElements(CellCodec.encodeString("cdc")))
  }

  test("encodeCell parses the envelope's string form per recorded type") {
    assert(CellCodec.encodeCell(IntegerType, "42").sameElements(bytes(0, 0, 0, 42)))
    assert(CellCodec.encodeCell(LongType, "42").sameElements(CellCodec.encodeLong(42L)))
    assert(CellCodec.encodeCell(BooleanType, "true").sameElements(bytes(0xFF)))
    assert(CellCodec.encodeCell(DoubleType, "1.5").sameElements(CellCodec.encodeDouble(1.5)))
    assert(CellCodec.encodeCell(FloatType, "1.5").sameElements(CellCodec.encodeFloat(1.5f)))
    assert(CellCodec.encodeCell(StringType, "héllo")
      .sameElements("héllo".getBytes("UTF-8")))
    // envelope binaries travel base64 (GoldenGateAvro.scala:78-100)
    assert(CellCodec.encodeCell(BinaryType,
      java.util.Base64.getEncoder.encodeToString(bytes(1, 2, 3))).sameElements(bytes(1, 2, 3)))
    assert(CellCodec.encodeCell(StringType, null) == null)
    intercept[IllegalArgumentException] {
      CellCodec.encodeCell(ArrayType(IntegerType), "[1]")
    }
  }

  test("putCells emits one cell per schema field; absent key is a null cell") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("extra", IntegerType)))
    val cells = CellCodec.putCells(schema, Map("id" -> "7", "name" -> "a"))
    assert(cells.map(_.column) == Seq("id", "name", "extra"))
    assert(cells(0).value.sameElements(CellCodec.encodeLong(7L)))
    assert(cells(1).value.sameElements("a".getBytes("UTF-8")))
    assert(cells(2).value == null) // put-all-columns incl. explicit nulls
  }

  test("row key bytes are UTF-8 of the sorted-PK ':' join") {
    assert(CellCodec.rowKeyBytes("7:a").sameElements("7:a".getBytes("UTF-8")))
  }

  test("kudu type mapping with bool/float/double PK coerced to STRING") {
    import KuduCells._
    val pks = Set("okid", "badid")
    assert(kuduType("v", StringType, pks) == KString)
    assert(kuduType("v", IntegerType, pks) == KInt32)
    assert(kuduType("v", LongType, pks) == KInt64)
    assert(kuduType("v", BinaryType, pks) == KBinary)
    assert(kuduType("v", DoubleType, pks) == KDouble)
    assert(kuduType("v", FloatType, pks) == KFloat)
    assert(kuduType("v", BooleanType, pks) == KBool)
    // the coercion applies only to key columns (CDCKudu.java:315-321)
    assert(kuduType("okid", LongType, pks) == KInt64)
    assert(kuduType("badid", DoubleType, pks) == KString)
    assert(kuduType("badid", FloatType, pks) == KString)
    assert(kuduType("badid", BooleanType, pks) == KString)
    intercept[IllegalArgumentException] { kuduType("v", ArrayType(LongType), pks) }
  }

  test("EncodedCellStore drives the byte tier through the CdcWriter seam") {
    val store = new graft.sinks.EncodedCellStore
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    // DML before any DDL: create-if-absent posture, string-encoded cells
    store.upsert("dbo.t", "1", Map("id" -> "1", "v" -> "a"))
    assert(store.encodedRows("dbo.t")("1").map(_.column) == Seq("id", "v"))
    assert(store.encodedRows("dbo.t")("1")(0).value.sameElements("1".getBytes("UTF-8")))
    // after the DDL phase records the schema, cells encode typed
    store.createTableIfAbsent("dbo.t", schema, Seq("id"))
    store.upsert("dbo.t", "2", Map("id" -> "2", "v" -> "b"))
    val r2 = store.encodedRows("dbo.t")("2")
    assert(r2(0).value.sameElements(CellCodec.encodeLong(2L)))
    assert(r2(1).value.sameElements("b".getBytes("UTF-8")))
    // alter adds a column; subsequent puts carry its (null) cell
    store.alterTable("dbo.t", Seq(StructField("extra", IntegerType)), Nil)
    store.upsert("dbo.t", "3", Map("id" -> "3", "v" -> "c"))
    assert(store.encodedRows("dbo.t")("3").map(_.column) == Seq("id", "v", "extra"))
    assert(store.encodedRows("dbo.t")("3")(2).value == null)
    store.delete("dbo.t", "2")
    assert(store.encodedRows("dbo.t").keySet == Set("1", "3"))
  }

  test("kudu upsert cells carry typed values; delete cells keep only the keys") {
    import KuduCells._
    val schema = StructType(Seq(
      StructField("score", DoubleType), StructField("id", LongType),
      StructField("flag", BooleanType), StructField("note", StringType)))
    val values = Map("score" -> "2.5", "id" -> "9", "flag" -> "false")
    val up = upsertCells(schema, Set("score", "id"), values)
    assert(up.map(c => (c.column, c.ktype)) ==
      Seq(("score", KString), ("id", KInt64), ("flag", KBool), ("note", KString)))
    // the coerced PK value is the envelope's canonical string (String.valueOf form)
    assert(up(0).value.contains("2.5"))
    assert(up(1).value.contains(9L))
    assert(up(2).value.contains(false))
    assert(up(3).value.isEmpty) // absent column → setNull
    val del = deleteCells(schema, Set("score", "id"), values)
    assert(del.map(_.column) == Seq("score", "id"))
  }
}
