package graft

import graft.sources.GoldenGateAvro
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
}
