package graft

import graft.model._
import graft.sinks._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.types._

/** SNK3 through the client-shaped SPI: the same envelope stream drives
  * [[HBaseShapedWriter]] (cells flowing through Admin/HTable/Put/Delete
  * calls into a fake in-memory cluster) and [[EncodedCellStore]] (the
  * byte-tier reference), and every stored byte must match — proving the
  * client adapter seam carries the exact reference encodings
  * (CDCTableUtil.java:121-161) and the live binding is only the 1:1
  * delegation documented on [[HBaseShaped]]. */
class HBaseShapedWriterSpec extends SparkSuite {
  import spark.implicits._

  private val s1 = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))
  private val s2 = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType),
    StructField("n", IntegerType)))

  private def ddl(schema: StructType) =
    ChangeRecord.ofDdl(Ddl("dbo.h", schema.json))
  private def dml(op: String, version: Long, id: Long, values: (String, String)*) =
    ChangeRecord.ofDml(Dml(op, "dbo.h", Seq("id"),
      s1.json, Map("id" -> id.toString) ++ values.toMap, version.toString, 0L))

  test("client-shaped mutations land byte-identical to the encoded cell tier") {
    val cluster = new InMemoryHBaseCluster
    val enc = new EncodedCellStore
    CdcWriters.register("hshape", new HBaseShapedWriter(cluster))
    CdcWriters.register("hshape-enc", enc)

    implicit val ctx = spark.sqlContext
    val in = MemoryStream[ChangeRecord]
    val q1 = UpsertSink.stream(in.toDF(), "hshape", checkpointDir("hshape"))
    val batch1 = Seq(ddl(s1),
      dml(OpType.Insert, 1, 1L, "v" -> "a"),
      dml(OpType.Insert, 2, 2L, "v" -> "b"),
      dml(OpType.Update, 3, 1L, "v" -> "a2"),
      dml(OpType.Delete, 4, 2L, "v" -> "b"))
    val batch2 = Seq(ddl(s2), // evolve: add int column
      dml(OpType.Insert, 5, 3L, "v" -> "c", "n" -> "7"))
    in.addData(batch1: _*)
    q1.processAllAvailable()
    in.addData(batch2: _*)
    q1.processAllAvailable()
    q1.stop()

    // same records through the byte-tier reference writer
    val in2 = MemoryStream[ChangeRecord]
    val q2 = UpsertSink.stream(in2.toDF(), "hshape-enc", checkpointDir("hshape-enc"))
    in2.addData(batch1: _*)
    q2.processAllAvailable()
    in2.addData(batch2: _*)
    q2.processAllAvailable()
    q2.stop()
    CdcWriters.drop("hshape"); CdcWriters.drop("hshape-enc")

    // created through Admin with the reference's one family
    assert(cluster.family("dbo.h").contains("cdc"))

    val got = cluster.rows("dbo.h")
    val want = enc.encodedRows("dbo.h")
    assert(got.keySet == want.keySet && got.keySet == Set("1", "3"),
      s"rows diverge: ${got.keySet} vs ${want.keySet}")
    for ((key, cells) <- want; c <- cells) {
      val cell = got(key).get(s"cdc:${c.column}")
      assert(cell.isDefined, s"row $key missing cell cdc:${c.column}")
      assert(cell.get.sameElements(c.value),
        s"row $key cell ${c.column}: bytes diverge from the encoded tier")
    }
    // typed spot checks: long id per Bytes.toBytes(long), int column
    // per Bytes.toBytes(int) — 8 and 4 big-endian bytes
    assert(got("3")("cdc:id").sameElements(CellCodec.encodeLong(3L)))
    assert(got("3")("cdc:n").sameElements(CellCodec.encodeInt(7)))

    // replay idempotency: re-applying the same batch converges to the
    // same bytes (at-least-once delivery is safe through the SPI)
    CdcWriters.register("hshape", new HBaseShapedWriter(cluster))
    val in3 = MemoryStream[ChangeRecord]
    val q3 = UpsertSink.stream(in3.toDF(), "hshape", checkpointDir("hshape-replay"))
    in3.addData(batch2: _*)
    q3.processAllAvailable()
    q3.stop()
    CdcWriters.drop("hshape")
    val replayed = cluster.rows("dbo.h")
    assert(replayed.keySet == Set("1", "3"))
    assert(replayed("3")("cdc:n").sameElements(CellCodec.encodeInt(7)))
  }

  test("DML before any DDL auto-creates the table with string-typed cells") {
    val cluster = new InMemoryHBaseCluster
    val w = new HBaseShapedWriter(cluster)
    w.upsert("dbo.lead", "k1", Map("id" -> "9", "v" -> "x"))
    assert(cluster.family("dbo.lead").contains("cdc"))
    // no recorded schema → envelope-canonical string encoding
    val cells = cluster.rows("dbo.lead")("k1")
    assert(cells("cdc:id").sameElements(CellCodec.encodeString("9")))
    assert(cells("cdc:v").sameElements(CellCodec.encodeString("x")))
    w.delete("dbo.lead", "k1")
    assert(cluster.rows("dbo.lead").isEmpty)
    cluster.close()
    assert(cluster.closed)
  }
}
