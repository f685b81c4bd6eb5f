package graft

import graft.model._
import graft.sinks.{InMemoryStore, SchemaEvolution, UpsertSink}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.types._

/** Streaming upsert sink: DDL-create, I/U/D application with per-batch
  * compaction, schema evolution mid-stream (the reference sink suite's
  * scenarios: create table / insert / update overwrites / delete removes,
  * CDCBigTablePluginIntegrationTest.java:119-316). */
class UpsertSinkSpec extends SparkSuite {
  import spark.implicits._

  private val s1 = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))
  private val s2 = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType),
    StructField("extra", StringType)))

  private def ddl(schema: StructType) =
    ChangeRecord.ofDdl(Ddl("dbo.t", schema.json))
  private def dml(op: String, version: Long, id: Long, values: (String, String)*) =
    ChangeRecord.ofDml(Dml(op, "dbo.t", Seq("id"),
      s1.json, Map("id" -> id.toString) ++ values.toMap, version.toString, 0L))

  test("streaming I/U/D with mid-stream schema evolution converges to expected store state") {
    val store = "upsert-spec"
    InMemoryStore.drop(store)
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[ChangeRecord]
    val q = UpsertSink.stream(in.toDF(), store, checkpointDir("upsert"))

    // batch 1: create + 2 inserts + same-batch update of row 1 (compaction
    // must keep only the latest change per key)
    in.addData(ddl(s1),
      dml(OpType.Insert, 1, 1L, "v" -> "a"),
      dml(OpType.Insert, 2, 2L, "v" -> "b"),
      dml(OpType.Update, 3, 1L, "v" -> "a2"))
    q.processAllAvailable()

    val st = InMemoryStore.get(store)
    assert(st.rows("dbo.t")("1")("v") == "a2")
    assert(st.rows("dbo.t")("2")("v") == "b")

    // batch 2: schema evolves (adds column), delete row 2, insert row 3
    in.addData(ddl(s2),
      dml(OpType.Delete, 4, 2L, "v" -> "b"),
      dml(OpType.Insert, 5, 3L, "v" -> "c", "extra" -> "x"))
    q.processAllAvailable()
    q.stop()

    assert(st.schemaOf("dbo.t").get.fieldNames.contains("extra"))
    assert(st.rows("dbo.t").keySet == Set("1", "3"))
    assert(st.rows("dbo.t")("3")("extra") == "x")
  }

  test("a registered EncodedCellStore receives the stream through the byte tier") {
    import graft.sinks.{CdcWriters, CellCodec, EncodedCellStore}
    val name = "encoded-sink-spec"
    val enc = new EncodedCellStore
    CdcWriters.register(name, enc)
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[ChangeRecord]
    val q = UpsertSink.stream(in.toDF(), name, checkpointDir("enc-sink"))
    in.addData(ddl(s1),
      dml(OpType.Insert, 1, 1L, "v" -> "a"),
      dml(OpType.Insert, 2, 2L, "v" -> "b"),
      dml(OpType.Delete, 3, 2L, "v" -> "b"))
    q.processAllAvailable()
    q.stop()
    CdcWriters.drop(name)

    // the DDL phase recorded the schema, so the surviving row's cells
    // are TYPED bytes: id encoded per the reference's Bytes.toBytes(long)
    val rows = enc.encodedRows("dbo.t")
    assert(rows.keySet == Set("1"), "delete must remove row 2")
    val cells = rows("1")
    assert(cells.map(_.column) == Seq("id", "v"))
    assert(cells(0).value.sameElements(CellCodec.encodeLong(1L)))
    assert(cells(1).value.sameElements("a".getBytes("UTF-8")))
  }

  test("stream refuses a non-envelope schema with a named-property error") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val e = intercept[IllegalArgumentException] {
      UpsertSink.stream(in.toDF(), "refuse-spec", checkpointDir("refuse"))
    }
    assert(e.getMessage.contains("ddl"))
    // present ddl/dml but a mistyped nested field is named in the error
    val bad = in.toDF().selectExpr(
      "named_struct('table', _1, 'schemaJson', _2) AS ddl",
      "named_struct('opType', _2, 'table', _2, 'primaryKeys', array(_2), " +
        "'rowsSchemaJson', _2, 'rowsValues', map(_2, _2), " +
        "'changeTrackingVersion', _1, 'cdcCurrentTimestampMicros', _1) AS dml")
    val e2 = intercept[IllegalArgumentException] {
      UpsertSink.stream(bad, "refuse-spec", checkpointDir("refuse2"))
    }
    assert(e2.getMessage.contains("dml.table") ||
      e2.getMessage.contains("ddl.table") ||
      e2.getMessage.contains("changeTrackingVersion"))
  }

  private def messages(t: Throwable): Seq[String] =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).toSeq

  test("a DML record with a missing primary-key value fails fast instead of collapsing keys") {
    val store = "nullkey-spec"
    InMemoryStore.drop(store)
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[ChangeRecord]
    val q = UpsertSink.stream(in.toDF(), store, checkpointDir("nullkey"))
    // rowsValues lacks the 'id' key entirely — concat_ws would silently
    // produce the same key as a row with only the other segments.
    in.addData(ddl(s1),
      ChangeRecord.ofDml(Dml(OpType.Insert, "dbo.t", Seq("id"),
        s1.json, Map("v" -> "a"), "1", 0L)))
    val e = intercept[Exception] { q.processAllAvailable() }
    assert(messages(e).exists(_.contains("primary-key value for 'id'")),
      s"expected a named-key failure, got: ${messages(e).mkString(" | ")}")
    q.stop()
  }

  test("batch rowKey raises on a NULL key component, naming the key") {
    import graft.operators.CdcApply
    import org.apache.spark.sql.functions.col
    val df = Seq((1L, Option("x")), (2L, Option.empty[String])).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(CdcApply.rowKey(Seq("a" -> col("a"), "b" -> col("b"))))
        .collect()
    }
    assert(messages(e).exists(_.contains("primary-key value for 'b'")))
  }

  test("envelope validation is case-insensitive, matching Spark resolution") {
    val env = spark.createDataset(Seq(ddl(s1)))
    // Rename the top-level columns to a different case: Spark's analyzer
    // (caseSensitive=false) would still resolve them, so validation must too.
    UpsertSink.validateEnvelopeSchema(env.toDF("DDL", "Dml").schema)
  }

  test("envelope validation goes exact-match under spark.sql.caseSensitive=true") {
    val env = spark.createDataset(Seq(ddl(s1)))
    spark.conf.set("spark.sql.caseSensitive", "true")
    try {
      // exact-cased names still validate...
      UpsertSink.validateEnvelopeSchema(env.toDF().schema)
      // ...but re-cased ones are rejected up front: the case-sensitive
      // analyzer could not resolve them later, so accepting them here
      // would defeat fail-before-start.
      val e = intercept[IllegalArgumentException] {
        UpsertSink.validateEnvelopeSchema(env.toDF("DDL", "Dml").schema)
      }
      assert(e.getMessage.contains("ddl"))
    } finally spark.conf.unset("spark.sql.caseSensitive")
  }

  test("schema diff is the symmetric difference") {
    val d = SchemaEvolution.diff(s1, s2)
    assert(d.added.map(_.name) == Seq("extra") && d.dropped.isEmpty)
    val d2 = SchemaEvolution.diff(s2, s1)
    assert(d2.dropped == Seq("extra") && d2.added.isEmpty)
    assert(SchemaEvolution.diff(s1, s1).isEmpty)
  }
}
