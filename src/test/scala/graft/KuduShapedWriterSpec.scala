package graft

import graft.model._
import graft.sinks._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.types._

/** SNK1 through the client-shaped SPI: envelope stream →
  * [[KuduShapedWriter]] → fake in-memory cluster, asserting the
  * reference's client behaviors end to end (create on first DML with
  * PK-first order + hash partitions, typed PartialRow setters through
  * the DBUtils map incl. the double-PK→STRING coercion, nullable adds +
  * session flush on DDL, key-column-addressed deletes —
  * CDCKudu.java:103-180,229-257,300-345). */
class KuduShapedWriterSpec extends SparkSuite {
  import spark.implicits._

  private val s1 = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType),
    StructField("d", DoubleType)))
  private val s2 = StructType(s1.fields :+ StructField("n", IntegerType))

  private def ddl(schema: StructType) =
    ChangeRecord.ofDdl(Ddl("dbo.k", schema.json))
  private def dml(op: String, version: Long, id: Long, values: (String, String)*) =
    ChangeRecord.ofDml(Dml(op, "dbo.k", Seq("id"),
      s1.json, Map("id" -> id.toString) ++ values.toMap, version.toString, 0L))

  test("envelope stream drives typed client calls into the fake cluster") {
    val cluster = new InMemoryKuduCluster
    CdcWriters.register("kshape", new KuduShapedWriter(cluster, hashBuckets = 4))
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[ChangeRecord]
    val q = UpsertSink.stream(in.toDF(), "kshape", checkpointDir("kshape"))

    // batch 1: DDL only — the reference creates Kudu tables on the
    // first DML (which carries the keys), never on DDL
    in.addData(ddl(s1))
    q.processAllAvailable()
    assert(!cluster.tableExists("dbo.k"),
      "DDL alone must not create the table (keys unknown)")

    // batch 2: inserts + same-batch update (compaction) + delete
    in.addData(
      dml(OpType.Insert, 1, 1L, "v" -> "a", "d" -> "1.5"),
      dml(OpType.Insert, 2, 2L, "v" -> "b", "d" -> "2.5"),
      dml(OpType.Update, 3, 1L, "v" -> "a2", "d" -> "1.75"),
      dml(OpType.Delete, 4, 2L, "v" -> "b", "d" -> "2.5"))
    q.processAllAvailable()

    // created on first DML: PK first (KUDU-1271), 4 hash buckets, PK
    // non-nullable, value columns nullable, types through the DBUtils map
    val cols = cluster.columns("dbo.k")
    assert(cols.map(_.name) == Seq("id", "v", "d"))
    assert(cols.head.key && !cols.head.nullable &&
      cols.head.ktype == KuduCells.KInt64)
    assert(!cols(1).key && cols(1).nullable && cols(1).ktype == KuduCells.KString)
    assert(cols(2).ktype == KuduCells.KDouble)
    assert(cluster.buckets("dbo.k") == 4)

    // typed cells: the surviving row carries JVM-typed values
    val rows = cluster.rows("dbo.k")
    assert(rows.keySet == Set("1"), "delete must remove key 2")
    assert(rows("1")("id").contains(1L))
    assert(rows("1")("v").contains("a2"))
    assert(rows("1")("d").contains(1.75))

    // batch 3: DDL evolution adds a nullable column + flushes; new row
    // lands with the int column typed
    val before = cluster.flushes
    in.addData(ddl(s2), dml(OpType.Insert, 5, 3L, "v" -> "c", "d" -> "0.5", "n" -> "7"))
    q.processAllAvailable()
    q.stop()
    assert(cluster.flushes > before, "schema change must flush the session")
    assert(cluster.columns("dbo.k").exists(c =>
      c.name == "n" && c.nullable && !c.key && c.ktype == KuduCells.KInt32))
    assert(cluster.rows("dbo.k")("3")("n").contains(7))
    CdcWriters.drop("kshape")
  }

  test("bool/float/double primary keys coerce to STRING (reference quirk)") {
    val cluster = new InMemoryKuduCluster
    val w = new KuduShapedWriter(cluster)
    val schema = StructType(Seq(
      StructField("score", DoubleType), StructField("v", StringType)))
    w.createTableIfAbsent("dbo.dpk", schema, Seq.empty)
    w.upsert("dbo.dpk", Seq("score"), "2.5", Map("score" -> "2.5", "v" -> "x"))
    val cols = cluster.columns("dbo.dpk")
    assert(cols.head.name == "score" && cols.head.key &&
      cols.head.ktype == KuduCells.KString,
      s"double PK must coerce to STRING, got ${cols.head}")
    // the coerced key stores the envelope's canonical string
    assert(cluster.rows("dbo.dpk")("2.5")("score").contains("2.5"))
  }

  test("DML before any DDL creates an all-string table from the envelope") {
    val cluster = new InMemoryKuduCluster
    val w = new KuduShapedWriter(cluster)
    w.upsert("dbo.lead", Seq("id"), "9", Map("id" -> "9", "v" -> "x"))
    val cols = cluster.columns("dbo.lead")
    assert(cols.map(_.name) == Seq("id", "v"))
    assert(cols.forall(_.ktype == KuduCells.KString))
    w.delete("dbo.lead", Seq("id"), "9", Map("id" -> "9", "v" -> "x"))
    assert(cluster.rows("dbo.lead").isEmpty)
    w.close()
    assert(cluster.closed)
  }

  test("the row-key-only writer forms fail loudly (PK columns required)") {
    val w = new KuduShapedWriter(new InMemoryKuduCluster)
    intercept[UnsupportedOperationException] { w.upsert("t", "k", Map.empty) }
    intercept[UnsupportedOperationException] { w.delete("t", "k") }
  }
}
