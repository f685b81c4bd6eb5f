package graft

import graft.sources.{GoldenGateAvro, GoldenGateDml}
import graft.streaming.StatefulOps
import graft.streaming.StatefulOps.GgMessage
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** SRC2 → SRC2a → SRC3 end-to-end: Avro wrapper decode, fingerprint
  * schema-registry resolution across batches, payload decode into the
  * envelope's column map. */
class GoldenGateFlowSpec extends SparkSuite {
  import spark.implicits._

  private val rowSchemaJson =
    """{"type":"record","name":"row","fields":[
      | {"name":"id","type":"long"},
      | {"name":"name","type":"string"},
      | {"name":"qty","type":"double"}]}""".stripMargin

  test("avro wrapper roundtrip and payload decode") {
    val payload = GoldenGateAvro.encodeRecord(rowSchemaJson,
      Map("id" -> 42L, "name" -> "zed", "qty" -> 2.5))
    val wrapped = GoldenGateAvro.encodeWrapper("ORCL.PEOPLE", 99L, payload)

    val ws = GoldenGateAvro.decodeWrappers(Seq(wrapped).toDS()).collect()
    assert(ws.length == 1)
    assert(ws.head.tableName == "ORCL.PEOPLE" && ws.head.fingerprint == 99L)

    val cols = GoldenGateAvro.decodeRecord(ws.head.payload, rowSchemaJson)
    assert(cols == Map("id" -> "42", "name" -> "zed", "qty" -> "2.5"))
  }

  private val complexSchemaJson =
    """{"type":"record","name":"cx","fields":[
      | {"name":"id","type":"long"},
      | {"name":"tags","type":{"type":"array","items":"long"}},
      | {"name":"attrs","type":{"type":"map","values":"double"}},
      | {"name":"addr","type":{"type":"record","name":"addr","fields":[
      |   {"name":"city","type":"string"},
      |   {"name":"zips","type":{"type":"array","items":"string"}}]}},
      | {"name":"color","type":{"type":"enum","name":"color","symbols":["RED","BLUE"]}},
      | {"name":"blob","type":"bytes"},
      | {"name":"fx","type":{"type":"fixed","name":"fx","size":2}},
      | {"name":"maybe","type":["null","string"]}]}""".stripMargin

  test("complex avro types round-trip losslessly (not toString garbage)") {
    val payload = GoldenGateAvro.encodeRecord(complexSchemaJson, Map(
      "id" -> 7L,
      "tags" -> Seq(3L, 1L),
      "attrs" -> Map("b" -> 2.5, "a" -> 1.5),
      "addr" -> Map[String, Any]("city" -> "oslo", "zips" -> Seq("01", "02")),
      "color" -> "BLUE",
      "blob" -> Array[Byte](1, 2, 3),
      "fx" -> Array[Byte](9, 8),
      "maybe" -> null))
    val cols = GoldenGateAvro.decodeRecord(payload, complexSchemaJson)
    assert(cols("id") == "7")
    assert(cols("tags") == "[3,1]")
    // map keys sort for determinism
    assert(cols("attrs") == """{"a":1.5,"b":2.5}""")
    // nested record → lossless JSON, includes the nested array
    assert(cols("addr") == """{"city":"oslo","zips":["01","02"]}""")
    assert(cols("color") == "BLUE")
    assert(cols("blob") == "AQID" && cols("fx") == "CQg=") // base64
    assert(cols("maybe") == null)
    // and the JSON parses back to the same structure via Spark
    import org.apache.spark.sql.functions.{col, from_json}
    import org.apache.spark.sql.types._
    val parsed = Seq(cols("addr")).toDF("j")
      .select(from_json(col("j"), StructType(Seq(
        StructField("city", StringType),
        StructField("zips", ArrayType(StringType))))).as("a"))
      .select("a.city", "a.zips").as[(String, Seq[String])].head()
    assert(parsed == ("oslo", Seq("01", "02")))
  }

  test("transport JSON escapes quotes, backslashes and control characters losslessly") {
    val sch =
      """{"type":"record","name":"esc","fields":[
        | {"name":"r","type":{"type":"record","name":"inner","fields":[
        |   {"name":"s","type":"string"}]}}]}""".stripMargin
    val nasty = "a\"b\\c\nd\te\rf\u0001g"
    val cols = GoldenGateAvro.decodeRecord(
      GoldenGateAvro.encodeRecord(sch, Map(
        "r" -> Map[String, Any]("s" -> nasty))), sch)
    // parse the JSON back with Spark and recover the exact original
    import org.apache.spark.sql.functions.{col, from_json}
    import org.apache.spark.sql.types._
    val back = Seq(cols("r")).toDF("j")
      .select(from_json(col("j"),
        StructType(Seq(StructField("s", StringType)))).getField("s"))
      .as[String].head()
    assert(back == nasty, s"escaping dropped bytes: ${back.toList} vs ${nasty.toList}")
  }

  test("union branches resolve by runtime value") {
    val uSchema =
      """{"type":"record","name":"u","fields":[
        | {"name":"v","type":["null","long","string",
        |   {"type":"record","name":"pt","fields":[{"name":"x","type":"int"}]}]}]}""".stripMargin
    def roundtrip(v: Any): String = GoldenGateAvro.decodeRecord(
      GoldenGateAvro.encodeRecord(uSchema, Map("v" -> v)), uSchema)("v")
    // multi-branch unions need runtime selection on the encode side too:
    // build records through the avro API directly for non-first branches
    val s = new org.apache.avro.Schema.Parser().parse(uSchema)
    def enc(v: AnyRef): Array[Byte] = {
      val rec = new org.apache.avro.generic.GenericData.Record(s)
      rec.put("v", v)
      val out = new java.io.ByteArrayOutputStream()
      val e = org.apache.avro.io.EncoderFactory.get().binaryEncoder(out, null)
      new org.apache.avro.generic.GenericDatumWriter[org.apache.avro.generic.GenericRecord](s).write(rec, e)
      e.flush(); out.toByteArray
    }
    assert(GoldenGateAvro.decodeRecord(enc(java.lang.Long.valueOf(42L)), uSchema)("v") == "42")
    assert(GoldenGateAvro.decodeRecord(enc(new org.apache.avro.util.Utf8("hi")), uSchema)("v") == "hi")
    val ptSchema = s.getField("v").schema().getTypes.get(3)
    val pt = new org.apache.avro.generic.GenericData.Record(ptSchema)
    pt.put("x", Int.box(5))
    assert(GoldenGateAvro.decodeRecord(enc(pt), uSchema)("v") == """{"x":5}""")
    assert(roundtrip(null) == null)
  }

  test("wrapper stream through the fingerprint registry resolves payload schemas") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[GgMessage]
    val q = StatefulOps.resolveSchemas(in.toDS())
      .writeStream.format("memory").queryName("gg_out")
      .option("checkpointLocation", checkpointDir("ggflow"))
      .outputMode("append").start()

    val p1 = GoldenGateAvro.encodeRecord(rowSchemaJson,
      Map("id" -> 1L, "name" -> "a", "qty" -> 1.0))
    val p1b64 = java.util.Base64.getEncoder.encodeToString(p1)

    // schema definition then data, then data-only in a later batch
    in.addData(GgMessage("schema", 7L, rowSchemaJson, 1),
      GgMessage("data", 7L, p1b64, 2))
    q.processAllAvailable()
    in.addData(GgMessage("data", 7L, p1b64, 3))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("gg_out").as[StatefulOps.ResolvedData].collect()
    assert(rows.length == 2 && rows.forall(_.schemaJson.contains(rowSchemaJson)))
    // resolved payloads decode with the registry-provided schema
    val decoded = rows.map(r => GoldenGateAvro.decodeRecord(
      java.util.Base64.getDecoder.decode(r.payload), r.schemaJson.get))
    assert(decoded.forall(_ == Map("id" -> "1", "name" -> "a", "qty" -> "1.0")))
  }

  // ---- real before/after payloads through decode → merge/split ----

  private val ggSchemaJson =
    """{"type":"record","name":"T","namespace":"ORCL","fields":[
      | {"name":"table","type":"string"},
      | {"name":"op_type","type":"string"},
      | {"name":"primary_keys","type":{"type":"array","items":"string"}},
      | {"name":"before","type":["null",{"type":"record","name":"columns","fields":[
      |   {"name":"id","type":"long"},{"name":"id_isMissing","type":"boolean"},
      |   {"name":"v","type":["null","string"]},{"name":"v_isMissing","type":"boolean"}]}]},
      | {"name":"after","type":["null","columns"]}]}""".stripMargin

  private def ggRow(id: Long, v: String, missV: Boolean = false) =
    Map[String, Any]("id" -> id, "id_isMissing" -> false,
      "v" -> v, "v_isMissing" -> missV)

  private def ggPayload(op: String, before: Any, after: Any): Array[Byte] =
    GoldenGateAvro.encodeRecord(ggSchemaJson, Map[String, Any](
      "table" -> "ORCL.T", "op_type" -> op, "primary_keys" -> Seq("id"),
      "before" -> before, "after" -> after))

  test("before/after decode: update merges flagged-missing columns from the before image") {
    val d = GoldenGateDml.decodeDml(
      ggPayload("U", ggRow(1, "old"), ggRow(1, "JUNK", missV = true)), ggSchemaJson)
    assert(d.table == "ORCL.T" && d.opType == "UPDATE" && d.primaryKeys == Seq("id"))
    assert(d.after.get.missing == Set("v"))
    val out = GoldenGateDml.normalize(d, rowSchema(), version = 9)
    assert(out.map(_.opType) == Seq("UPDATE"))
    assert(out.head.rowsValues == Map("id" -> "1", "v" -> "old"))
    assert(out.head.changeTrackingVersion == "9")
  }

  test("before/after decode: a primary-key-moving update splits into DELETE + INSERT") {
    val d = GoldenGateDml.decodeDml(
      ggPayload("U", ggRow(2, "b"), ggRow(20, "b2")), ggSchemaJson)
    val out = GoldenGateDml.normalize(d, rowSchema(), version = 3)
    assert(out.map(_.opType) == Seq("DELETE", "INSERT"))
    assert(out.head.rowsValues == Map("id" -> "2", "v" -> "b"))
    assert(out(1).rowsValues == Map("id" -> "20", "v" -> "b2"))
  }

  test("before/after decode: insert takes the after image, delete the before image") {
    val ins = GoldenGateDml.normalize(GoldenGateDml.decodeDml(
      ggPayload("I", null, ggRow(5, "x")), ggSchemaJson), rowSchema(), 1)
    assert(ins.map(_.opType) == Seq("INSERT") &&
      ins.head.rowsValues == Map("id" -> "5", "v" -> "x"))
    val del = GoldenGateDml.normalize(GoldenGateDml.decodeDml(
      ggPayload("D", ggRow(5, "x"), null), ggSchemaJson), rowSchema(), 2)
    assert(del.map(_.opType) == Seq("DELETE") &&
      del.head.rowsValues == Map("id" -> "5", "v" -> "x"))
  }

  private def rowSchema(): String = GoldenGateDml.rowStructType(ggSchemaJson).json

  test("classify routes announcement/schema/data messages like the reference state fn") {
    val fp = org.apache.avro.SchemaNormalization.parsingFingerprint64(
      new org.apache.avro.Schema.Parser().parse(ggSchemaJson))
    val ann = GoldenGateDml.classify(
      GoldenGateAvro.WrapperSchemaJson.getBytes("UTF-8"), 0)
    assert(ann.kind == "ignore")
    val sch = GoldenGateDml.classify(ggSchemaJson.getBytes("UTF-8"), 1)
    assert(sch.kind == "schema" && sch.fingerprint == fp && sch.payload == ggSchemaJson)
    val data = GoldenGateDml.classify(
      GoldenGateAvro.encodeWrapper("ORCL.T", fp, ggPayload("I", null, ggRow(1, "a"))), 2)
    assert(data.kind == "data" && data.fingerprint == fp && data.version == 2)
  }

  test("classifySafe quarantines malformed bytes; the pipeline survives and stays complete") {
    val fp = org.apache.avro.SchemaNormalization.parsingFingerprint64(
      new org.apache.avro.Schema.Parser().parse(ggSchemaJson))
    val garbage = Array[Byte](0x13, 0x37, -1, -2, -3)
    val raw: Seq[Array[Byte]] = Seq(
      ggSchemaJson.getBytes("UTF-8"),
      garbage, // corrupt record mid-stream
      GoldenGateAvro.encodeWrapper("ORCL.T", fp, ggPayload("I", null, ggRow(1, "a"))))
    // strict classify (the reference posture) dies on the corrupt record
    intercept[Exception] { GoldenGateDml.classify(garbage, 1) }
    val msgs = raw.zipWithIndex.map { case (b, i) =>
      GoldenGateDml.classifySafe(b, i.toLong)
    }
    val ds = spark.createDataset(msgs)(
      org.apache.spark.sql.Encoders.product[graft.streaming.StatefulOps.GgMessage])
    // the good records still flow end-to-end
    val out = GoldenGateDml.pipeline(ds)
      .filter(org.apache.spark.sql.functions.col("dml").isNotNull).collect()
    assert(out.length == 1)
    // the quarantined original is byte-recoverable with its offset
    val dead = GoldenGateDml.deadLetters(ds).collect()
    assert(dead.length == 1 && dead.head.version == 1L)
    assert(java.util.Base64.getDecoder.decode(dead.head.payload).toSeq == garbage.toSeq)
  }

  test("a data message whose fingerprint never resolved fails with a named error") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[GgMessage]
    val q = GoldenGateDml.pipeline(in.toDS())
      .writeStream.format("memory").queryName("gg_unresolved")
      .option("checkpointLocation", checkpointDir("gg-unres"))
      .outputMode("append").start()
    // no schema message ever arrives for fingerprint 424242
    in.addData(GoldenGateDml.classify(
      GoldenGateAvro.encodeWrapper("ORCL.T", 424242L,
        ggPayload("I", null, ggRow(1, "a"))), 1))
    val e = intercept[Exception] { q.processAllAvailable() }
    def messages(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(messages(e).exists(_.contains("no schema registered for fingerprint 424242")),
      s"got: ${messages(e).mkString(" | ")}")
    q.stop()
  }

  test("streaming pipeline: bytes → registry → decode → merge/split → envelope, across batches") {
    implicit val ctx = spark.sqlContext
    val fp = org.apache.avro.SchemaNormalization.parsingFingerprint64(
      new org.apache.avro.Schema.Parser().parse(ggSchemaJson))
    val in = MemoryStream[GgMessage]
    val q = GoldenGateDml.pipeline(in.toDS())
      .writeStream.format("memory").queryName("gg_pipe")
      .option("checkpointLocation", checkpointDir("ggpipe"))
      .outputMode("append").start()

    // batch 1: schema only — registers the fingerprint
    in.addData(GoldenGateDml.classify(ggSchemaJson.getBytes("UTF-8"), 1))
    q.processAllAvailable()
    // batch 2: a later batch resolves against batch-1 state, and a
    // PK-moving update fans out 1→2
    in.addData(
      GoldenGateDml.classify(GoldenGateAvro.encodeWrapper("ORCL.T", fp,
        ggPayload("I", null, ggRow(1, "a"))), 2),
      GoldenGateDml.classify(GoldenGateAvro.encodeWrapper("ORCL.T", fp,
        ggPayload("U", ggRow(1, "a"), ggRow(10, "a2"))), 3))
    q.processAllAvailable()
    q.stop()

    val env = spark.table("gg_pipe")
    val ddl = env.filter("ddl IS NOT NULL").selectExpr("ddl.table").as[String].collect()
    assert(ddl.toSeq == Seq("ORCL.T"))
    val dml = env.filter("dml IS NOT NULL")
      .selectExpr("dml.opType", "dml.rowsValues['id']", "dml.rowsValues['v']",
        "CAST(dml.changeTrackingVersion AS LONG)")
      .as[(String, String, String, Long)].collect().sortBy(r => (r._4, r._1))
    assert(dml.toSeq == Seq(
      ("INSERT", "1", "a", 2L),
      ("DELETE", "1", "a", 3L),
      ("INSERT", "10", "a2", 3L)))
  }
}
