package graft

import graft.sources.{GoldenGateAvro, GoldenGateDml, GoldenGateFeed, MessageLog}

/** The Kafka-shaped transport tier: −1/−2 initial-offset resolution,
  * retention-aware validation, and the composed readStream assembly
  * (feed → classify → registry → decode → merge/split → envelope). */
class GoldenGateFeedSpec extends SparkSuite {
  import spark.implicits._

  private val ggSchemaJson =
    """{"type":"record","name":"T","namespace":"ORCL","fields":[
      | {"name":"table","type":"string"},
      | {"name":"op_type","type":"string"},
      | {"name":"primary_keys","type":{"type":"array","items":"string"}},
      | {"name":"before","type":["null",{"type":"record","name":"columns","fields":[
      |   {"name":"id","type":"long"},{"name":"id_isMissing","type":"boolean"},
      |   {"name":"v","type":["null","string"]},{"name":"v_isMissing","type":"boolean"}]}]},
      | {"name":"after","type":["null","columns"]}]}""".stripMargin
  private val fp = org.apache.avro.SchemaNormalization.parsingFingerprint64(
    new org.apache.avro.Schema.Parser().parse(ggSchemaJson))

  private def row(id: Long, v: String) =
    Map[String, Any]("id" -> id, "id_isMissing" -> false,
      "v" -> v, "v_isMissing" -> false)

  private def dmlMsg(op: String, before: Any, after: Any): Array[Byte] =
    GoldenGateAvro.encodeWrapper("ORCL.T", fp,
      GoldenGateAvro.encodeRecord(ggSchemaJson, Map[String, Any](
        "table" -> "ORCL.T", "op_type" -> op, "primary_keys" -> Seq("id"),
        "before" -> before, "after" -> after)))

  test("initial-offset sentinels resolve against the log like the reference's loadOffsets") {
    val log = new MessageLog
    (1 to 5).foreach(i => log.append(Array[Byte](i.toByte)))
    log.expireThrough(2) // retention: offsets 0,1 are gone
    assert(GoldenGateFeed.resolveInitialOffset(GoldenGateFeed.EarliestSentinel, log) == 2L)
    assert(GoldenGateFeed.resolveInitialOffset(GoldenGateFeed.LatestSentinel, log) == 5L)
    assert(GoldenGateFeed.resolveInitialOffset(3L, log) == 3L)
    // an offset already expired by retention fails loudly
    intercept[IllegalArgumentException] {
      GoldenGateFeed.resolveInitialOffset(1L, log)
    }
  }

  test("earliest start replays the retained log through the composed pipeline") {
    val name = "gg-feed-earliest"
    MessageLog.drop(name)
    val log = MessageLog.get(name)
    log.append(ggSchemaJson.getBytes("UTF-8"))
    log.append(dmlMsg("I", null, row(1, "a")))

    val q = GoldenGateDml.fromFeed(spark, name,
        initialOffset = GoldenGateFeed.EarliestSentinel)
      .writeStream.format("memory").queryName("gg_feed_e")
      .option("checkpointLocation", checkpointDir("ggfeed-e"))
      .outputMode("append").start()
    q.processAllAvailable()
    // live appends keep flowing, offset-versioned
    log.append(dmlMsg("U", row(1, "a"), row(1, "a2")))
    q.processAllAvailable()
    q.stop()

    val env = spark.table("gg_feed_e")
    assert(env.filter("ddl IS NOT NULL").count() == 1)
    val dml = env.filter("dml IS NOT NULL")
      .selectExpr("dml.opType", "dml.rowsValues['v']",
        "CAST(dml.changeTrackingVersion AS LONG)")
      .as[(String, String, Long)].collect().sortBy(_._3)
    assert(dml.toSeq == Seq(("INSERT", "a", 1L), ("UPDATE", "a2", 2L)))
  }

  test("latest start skips the backlog and sees only post-start messages") {
    val name = "gg-feed-latest"
    MessageLog.drop(name)
    val log = MessageLog.get(name)
    // backlog that must NOT be read
    log.append(ggSchemaJson.getBytes("UTF-8"))
    log.append(dmlMsg("I", null, row(1, "old")))

    val q = GoldenGateDml.fromFeed(spark, name,
        initialOffset = GoldenGateFeed.LatestSentinel)
      .writeStream.format("memory").queryName("gg_feed_l")
      .option("checkpointLocation", checkpointDir("ggfeed-l"))
      .outputMode("append").start()
    q.processAllAvailable()
    assert(spark.table("gg_feed_l").count() == 0)

    // post-start messages (schema must re-arrive: the registry state is
    // per-query, exactly like the reference's mapWithState)
    log.append(ggSchemaJson.getBytes("UTF-8"))
    log.append(dmlMsg("I", null, row(2, "new")))
    q.processAllAvailable()
    q.stop()

    val env = spark.table("gg_feed_l")
    assert(env.filter("ddl IS NOT NULL").count() == 1)
    val dml = env.filter("dml IS NOT NULL")
      .selectExpr("dml.opType", "dml.rowsValues['id']", "dml.rowsValues['v']")
      .as[(String, String, String)].collect()
    assert(dml.toSeq == Seq(("INSERT", "2", "new")))
  }

  test("full integration: feed bytes → registry → envelope → durable parquet snapshot") {
    import graft.sinks.{ParquetUpsertStore, UpsertSink}
    val name = "gg-feed-store"
    MessageLog.drop(name)
    val log = MessageLog.get(name)
    log.append(ggSchemaJson.getBytes("UTF-8"))
    log.append(dmlMsg("I", null, row(1, "a")))
    log.append(dmlMsg("I", null, row(2, "b")))

    val store = new ParquetUpsertStore(checkpointDir("gg-store"), numBuckets = 4)
    val env = GoldenGateDml.fromFeed(spark, name,
      initialOffset = GoldenGateFeed.EarliestSentinel)
    val q = UpsertSink.stream(env, store, checkpointDir("gg-store-ckpt"))
    q.processAllAvailable()
    // batch 2: update key 1, delete key 2 — must merge against batch 1's
    // committed buckets, with message offsets as versions
    log.append(dmlMsg("U", row(1, "a"), row(1, "a2")))
    log.append(dmlMsg("D", row(2, "b"), null))
    q.processAllAvailable()
    q.stop()

    // the DDL message became the table's recorded schema (flags stripped)
    assert(store.schemaOf(spark, "ORCL.T").get.fieldNames.toSeq == Seq("id", "v"))
    val st = store.snapshot(spark, "ORCL.T")
      .collect().map(r => r.getString(0) -> r.getMap[String, String](2).toMap)
      .toMap
    assert(st.keySet == Set("1"), s"live keys: ${st.keySet}")
    assert(st("1")("v") == "a2")
  }

  test("mid-stream DDL evolution flows from a new payload schema into the store's recorded schema") {
    import graft.sinks.{ParquetUpsertStore, UpsertSink}
    // v2 payload schema: same table, extra column w (a GoldenGate trail
    // regenerated after ALTER TABLE — new fingerprint, same table name)
    val ggSchemaV2 =
      """{"type":"record","name":"T","namespace":"ORCL","fields":[
        | {"name":"table","type":"string"},
        | {"name":"op_type","type":"string"},
        | {"name":"primary_keys","type":{"type":"array","items":"string"}},
        | {"name":"before","type":["null",{"type":"record","name":"columns","fields":[
        |   {"name":"id","type":"long"},{"name":"id_isMissing","type":"boolean"},
        |   {"name":"v","type":["null","string"]},{"name":"v_isMissing","type":"boolean"},
        |   {"name":"w","type":["null","string"]},{"name":"w_isMissing","type":"boolean"}]}]},
        | {"name":"after","type":["null","columns"]}]}""".stripMargin
    val fp2 = org.apache.avro.SchemaNormalization.parsingFingerprint64(
      new org.apache.avro.Schema.Parser().parse(ggSchemaV2))

    val name = "gg-feed-evolve"
    MessageLog.drop(name)
    val log = MessageLog.get(name)
    log.append(ggSchemaJson.getBytes("UTF-8"))
    log.append(dmlMsg("I", null, row(1, "a")))

    val store = new ParquetUpsertStore(checkpointDir("gg-evolve"), numBuckets = 4)
    val env = GoldenGateDml.fromFeed(spark, name,
      initialOffset = GoldenGateFeed.EarliestSentinel)
    val q = UpsertSink.stream(env, store, checkpointDir("gg-evolve-ckpt"))
    q.processAllAvailable()
    assert(store.schemaOf(spark, "ORCL.T").get.fieldNames.toSeq == Seq("id", "v"))

    // batch 2: the regenerated schema + a row written with it
    log.append(ggSchemaV2.getBytes("UTF-8"))
    log.append(GoldenGateAvro.encodeWrapper("ORCL.T", fp2,
      GoldenGateAvro.encodeRecord(ggSchemaV2, Map[String, Any](
        "table" -> "ORCL.T", "op_type" -> "I", "primary_keys" -> Seq("id"),
        "before" -> null,
        "after" -> Map[String, Any]("id" -> 2L, "id_isMissing" -> false,
          "v" -> "b", "v_isMissing" -> false,
          "w" -> "extra", "w_isMissing" -> false)))))
    q.processAllAvailable()
    q.stop()

    // recorded schema evolved (add-only diff), and the new column's value
    // landed in the stored row
    assert(store.schemaOf(spark, "ORCL.T").get.fieldNames.toSeq == Seq("id", "v", "w"))
    val st = store.snapshot(spark, "ORCL.T")
      .collect().map(r => r.getString(0) -> r.getMap[String, String](2).toMap)
      .toMap
    assert(st.keySet == Set("1", "2"))
    assert(st("2")("w") == "extra" && !st("1").contains("w"))
  }
}
