package graft

import graft.sinks._
import org.apache.spark.sql.types._

/** SNK3's batching transport: [[BufferedHBaseWriter]] rides
  * [[HBaseShaped.BufferedMutator]] — HBase's public batching client
  * surface — instead of one `HTable` RPC per row (the reference's
  * CDCHBase.java:83-86 loop). The spec pins the contract that makes the
  * live binding mechanical: buffering is real (nothing visible before a
  * flush boundary), auto-flush fires past `writeBufferSize`, arrival
  * order survives batching (put/delete/put on one row), close() drains,
  * and the final bytes are identical to the unbuffered writer's. */
class BufferedHBaseWriterSpec extends SparkSuite {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  test("mutations buffer until flush; flush makes them visible") {
    val cluster = new InMemoryHBaseCluster
    val w = new BufferedHBaseWriter(cluster, writeBufferSize = 1L << 20)
    w.createTableIfAbsent("dbo.buf", schema, Seq("id"))
    w.upsert("dbo.buf", "1", Map("id" -> "1", "v" -> "a"))
    w.upsert("dbo.buf", "2", Map("id" -> "2", "v" -> "b"))
    // under the buffer limit: nothing has reached the cluster yet —
    // this is what distinguishes the batching transport from HTable
    assert(cluster.rows("dbo.buf").isEmpty, "writes must buffer, not ship per-row")
    w.flush()
    assert(cluster.rows("dbo.buf").keySet === Set("1", "2"))
  }

  test("auto-flush fires once the buffered weight passes writeBufferSize") {
    val cluster = new InMemoryHBaseCluster
    // each put weighs ~ tens of bytes; 64 bytes forces a flush every row or two
    val w = new BufferedHBaseWriter(cluster, writeBufferSize = 64L)
    w.createTableIfAbsent("dbo.auto", schema, Seq("id"))
    (1 to 10).foreach(i =>
      w.upsert("dbo.auto", i.toString, Map("id" -> i.toString, "v" -> ("x" * 16))))
    assert(cluster.rows("dbo.auto").nonEmpty,
      "crossing writeBufferSize must flush without an explicit call")
    w.close()
    assert(cluster.rows("dbo.auto").keySet === (1 to 10).map(_.toString).toSet)
  }

  test("arrival order survives batching: put, delete, put on one row") {
    val cluster = new InMemoryHBaseCluster
    val w = new BufferedHBaseWriter(cluster)
    w.createTableIfAbsent("dbo.ord", schema, Seq("id"))
    w.upsert("dbo.ord", "1", Map("id" -> "1", "v" -> "first"))
    w.delete("dbo.ord", "1")
    w.upsert("dbo.ord", "1", Map("id" -> "1", "v" -> "second"))
    w.upsert("dbo.ord", "2", Map("id" -> "2", "v" -> "gone"))
    w.delete("dbo.ord", "2")
    w.close()
    val rows = cluster.rows("dbo.ord")
    assert(rows.keySet === Set("1"), "delete-last must win for row 2")
    assert(rows("1")("cdc:v").sameElements(CellCodec.encodeString("second")),
      "last put must win for row 1")
  }

  test("close() drains and the writer reopens lazily afterwards") {
    val cluster = new InMemoryHBaseCluster
    val w = new BufferedHBaseWriter(cluster)
    w.createTableIfAbsent("dbo.cl", schema, Seq("id"))
    w.upsert("dbo.cl", "1", Map("id" -> "1", "v" -> "a"))
    w.close()
    assert(cluster.rows("dbo.cl").keySet === Set("1"), "close must flush")
    // next partition reuses the writer: a fresh mutator opens lazily
    w.upsert("dbo.cl", "2", Map("id" -> "2", "v" -> "b"))
    w.close()
    assert(cluster.rows("dbo.cl").keySet === Set("1", "2"))
  }

  test("Bigtable tier accepts dotted ids and rejects colons up front") {
    val cluster = new InMemoryHBaseCluster
    val w = new BigtableShapedWriter(cluster)
    // dots are legal Bigtable ids (CDCBigTable.java:78-80)
    w.upsert("dbo.bt", "1", Map("id" -> "1", "v" -> "a"))
    w.close()
    assert(cluster.rows("dbo.bt").keySet === Set("1"))
    // colons fail client-side, not as a mid-stream grpc INVALID_ARGUMENT
    val e = intercept[IllegalArgumentException](
      w.upsert("ns:bad", "1", Map("id" -> "1")))
    assert(e.getMessage.contains("ns:bad"))
    // ...on the DDL-leading path too (UpsertSink drives
    // createTableIfAbsent directly): nothing may be created either
    val e2 = intercept[IllegalArgumentException](
      w.createTableIfAbsent("ns:bad", schema, Seq("id")))
    assert(e2.getMessage.contains("ns:bad"))
    assert(cluster.rows("ns:bad").isEmpty && cluster.family("ns:bad").isEmpty)
  }

  test("buffered and unbuffered writers land byte-identical state") {
    def drive(w: HBaseShapedWriter): Unit = {
      w.createTableIfAbsent("dbo.eq", schema, Seq("id"))
      w.upsert("dbo.eq", "1", Map("id" -> "1", "v" -> "a"))
      w.upsert("dbo.eq", "2", Map("id" -> "2", "v" -> "b"))
      w.upsert("dbo.eq", "1", Map("id" -> "1", "v" -> "a2"))
      w.delete("dbo.eq", "2")
      w.upsert("dbo.eq", "3", Map("id" -> "3", "v" -> "c"))
    }
    val plain = new InMemoryHBaseCluster
    drive(new HBaseShapedWriter(plain))
    val buffered = new InMemoryHBaseCluster
    val bw = new BufferedHBaseWriter(buffered, writeBufferSize = 1L << 20)
    drive(bw)
    bw.close()
    val a = plain.rows("dbo.eq")
    val b = buffered.rows("dbo.eq")
    assert(a.keySet === b.keySet)
    for ((row, cells) <- a; (cq, bytes) <- cells)
      assert(b(row)(cq).sameElements(bytes), s"row $row cell $cq diverges")
  }
}
