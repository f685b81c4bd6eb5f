package graft

import graft.sinks.{ParquetUpsertStore, UpsertSink}
import graft.sources.{GoldenGateAvro, GoldenGateDml, GoldenGateFeed, MessageLog}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, element_at}

/** One record of the EXACT standard Spark kafka source schema — all
  * seven fields `(key, value, topic, partition, offset, timestamp,
  * timestampType)` a real `format("kafka")` load() carries — so the
  * adapter is proven against the full shape, not a trimmed stand-in.
  * Top-level so the product encoder has no outer pointer. */
case class KafkaShapedRow(key: Array[Byte], value: Array[Byte], topic: String,
                          partition: Int, offset: Long,
                          timestamp: java.sql.Timestamp, timestampType: Int)

/** [[GoldenGateDml.fromKafkaShaped]]: the adapter that makes a real
  * `format("kafka")` topic a one-line swap for the offline feed. The
  * same byte trail is driven through BOTH transports and must land the
  * same durable store state (reference GoldenGateKafka.java:116-169 —
  * value bytes + offset-as-version over exactly one partition). */
class GoldenGateKafkaShapedSpec extends SparkSuite {
  import spark.implicits._

  private val schemaJson =
    """{"type":"record","name":"T","namespace":"ORCL","fields":[
      | {"name":"table","type":"string"},
      | {"name":"op_type","type":"string"},
      | {"name":"primary_keys","type":{"type":"array","items":"string"}},
      | {"name":"before","type":["null",{"type":"record","name":"columns","fields":[
      |   {"name":"id","type":"long"},{"name":"id_isMissing","type":"boolean"},
      |   {"name":"v","type":["null","string"]},{"name":"v_isMissing","type":"boolean"}]}]},
      | {"name":"after","type":["null","columns"]}]}""".stripMargin
  private val fp = org.apache.avro.SchemaNormalization.parsingFingerprint64(
    new org.apache.avro.Schema.Parser().parse(schemaJson))

  private def img(id: Long, v: String) = Map[String, Any](
    "id" -> id, "id_isMissing" -> false, "v" -> v, "v_isMissing" -> false)

  private def dmlMsg(op: String, before: Any, after: Any): Array[Byte] =
    GoldenGateAvro.encodeWrapper("ORCL.T", fp, GoldenGateAvro.encodeRecord(
      schemaJson, Map[String, Any]("table" -> "ORCL.T", "op_type" -> op,
        "primary_keys" -> Seq("id"), "before" -> before, "after" -> after)))

  /** The trail: schema announcement, inserts 1..5, update on 2,
    * pk-moving update 3→30, delete 4. Final state: 1, 2', 5, 30. */
  private def trail: Seq[Array[Byte]] =
    schemaJson.getBytes("UTF-8") +:
      (1L to 5L).map(k => dmlMsg("I", null, img(k, s"v$k"))) :+
      dmlMsg("U", img(2L, "v2"), img(2L, "v2u")) :+
      dmlMsg("U", img(3L, "v3"), img(30L, "v30")) :+
      dmlMsg("D", img(4L, "v4"), null)

  private def stateOf(store: ParquetUpsertStore): Seq[(Long, String)] =
    store.snapshot(spark, "ORCL.T")
      .select(element_at(col("values"), "id").cast("long"),
        element_at(col("values"), "v"))
      .as[(Long, String)].collect().sortBy(_._1).toSeq

  test("kafka-shaped stream lands the same store state as the feed transport") {
    // transport A: the offline message log (cdc24's path)
    val feed = "kshape-feed"
    MessageLog.drop(feed)
    val log = MessageLog.get(feed)
    trail.foreach(log.append)
    val storeA = new ParquetUpsertStore(checkpointDir("kshape-a"), numBuckets = 4)
    val qA = UpsertSink.stream(
      GoldenGateDml.fromFeed(spark, feed,
        initialOffset = GoldenGateFeed.EarliestSentinel),
      storeA, checkpointDir("kshape-a-ckpt"))
    qA.processAllAvailable()
    qA.stop()

    // transport B: the same bytes as a kafka-shaped streaming DataFrame,
    // offsets matching the log's (message index), delivered in two
    // batches so the fingerprint registry crosses a batch boundary
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[KafkaShapedRow]
    val storeB = new ParquetUpsertStore(checkpointDir("kshape-b"), numBuckets = 4)
    val qB = UpsertSink.stream(
      GoldenGateDml.fromKafkaShaped(in.toDF()),
      storeB, checkpointDir("kshape-b-ckpt"))
    val rows = trail.zipWithIndex.map { case (bytes, i) =>
      KafkaShapedRow(null, bytes, "gg.trail", 0, i.toLong,
        new java.sql.Timestamp(1720000000000L + i), 0)
    }
    val (head, tail) = rows.splitAt(4)
    in.addData(head: _*)
    qB.processAllAvailable()
    in.addData(tail: _*)
    qB.processAllAvailable()
    qB.stop()

    val expected = Seq(1L -> "v1", 2L -> "v2u", 5L -> "v5", 30L -> "v30")
    assert(stateOf(storeA) == expected)
    assert(stateOf(storeB) == expected)
  }

  test("batch kafka-shaped frame runs the same pipeline") {
    val df = trail.zipWithIndex
      .map { case (b, i) => KafkaShapedRow(null, b, "gg.trail", 0, i.toLong,
        new java.sql.Timestamp(1720000000000L + i), 0) }
      .toDF()
    val env = GoldenGateDml.fromKafkaShaped(df)
    // 1 DDL + 5 I + 1 U + (1 pk-move → D+I) + 1 D = 10 envelope records
    assert(env.count() == 10)
    assert(env.filter(col("ddl").isNotNull).count() == 1)
  }

  test("a second partition fails loudly — offsets only order within one") {
    val df = Seq(
      KafkaShapedRow(null, schemaJson.getBytes("UTF-8"), "gg.trail", 0, 0L,
        new java.sql.Timestamp(1720000000000L), 0),
      KafkaShapedRow(null, dmlMsg("I", null, img(9L, "x")), "gg.trail", 1, 0L,
        new java.sql.Timestamp(1720000000001L), 0))
      .toDF()
    val e = intercept[Exception] {
      GoldenGateDml.fromKafkaShaped(df).count()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      Option(c.getMessage).exists(_.contains("single Kafka partition"))))
  }

  test("missing value/offset columns are rejected up front") {
    val e = intercept[IllegalArgumentException] {
      GoldenGateDml.fromKafkaShaped(Seq((1L, "x")).toDF("offset", "other"))
    }
    assert(e.getMessage.contains("value"))
  }
}
