package graft

import graft.sinks.{InMemoryStore, UpsertSink}
import graft.sources.{ChangeFeedProvider, ChangeTrackingStore}
import graft.streaming.CtPipeline
import org.apache.spark.sql.types._

/** The complete reference pipeline shape on graft components: CT source
  * with per-batch DDL snapshots (multi-table) → envelope assembly →
  * upsert sink with schema evolution — SRC1a/SRC1e + E1 + SNK in one
  * streaming flow. */
class CtPipelineSpec extends SparkSuite {

  private val s1 = StructType(Seq(
    StructField("key", LongType), StructField("payload", StringType)))
  private val s2 = StructType(s1.fields :+ StructField("extra", StringType))

  test("multi-table CT feed with DDL snapshots drives create/alter/upsert") {
    val feed = "ctp-feed"; val sinkName = "ctp-sink"
    ChangeTrackingStore.drop(feed); InMemoryStore.drop(sinkName)
    val ct = ChangeTrackingStore.get(feed)
    ct.setSchema("dbo.a", s1.json)
    ct.setSchema("dbo.b", s1.json)
    ct.append("dbo.a", "INSERT", 1L, "a")
    ct.append("dbo.a", "INSERT", 2L, "b")
    ct.append("dbo.b", "INSERT", 9L, "z")

    val stream = spark.readStream
      .format(classOf[ChangeFeedProvider].getName)
      .option("store", feed).option("numPartitions", "2")
      .option("emitDdl", "true").load()
    val q = UpsertSink.stream(CtPipeline.toEnvelope(stream), sinkName,
      checkpointDir("ctp"))
    q.processAllAvailable()

    val st = InMemoryStore.get(sinkName)
    assert(st.schemaOf("dbo.a").contains(s1))
    assert(st.schemaOf("dbo.b").contains(s1))
    assert(st.rows("dbo.a").keySet == Set("1", "2"))
    assert(st.rows("dbo.b")("9")("payload") == "z")

    // schema evolves on dbo.a; subsequent batch alters and applies I/U/D
    ct.setSchema("dbo.a", s2.json)
    ct.append("dbo.a", "UPDATE", 1L, "a2")
    ct.append("dbo.a", "DELETE", 2L, "b")
    q.processAllAvailable()
    q.stop()

    assert(st.schemaOf("dbo.a").get.fieldNames.contains("extra"))
    assert(st.schemaOf("dbo.b").contains(s1), "untouched table keeps its schema")
    assert(st.rows("dbo.a").keySet == Set("1"))
    assert(st.rows("dbo.a")("1")("payload") == "a2")
  }

  test("the same CT feed drives the durable parquet store (cluster-valid sink)") {
    import graft.sinks.ParquetUpsertStore
    val feed = "ctp-feed-durable"
    ChangeTrackingStore.drop(feed)
    val ct = ChangeTrackingStore.get(feed)
    ct.setSchema("dbo.a", s1.json)
    ct.append("dbo.a", "INSERT", 1L, "a")
    ct.append("dbo.a", "INSERT", 2L, "b")

    val store = new ParquetUpsertStore(checkpointDir("ctp-durable"), numBuckets = 4)
    val stream = spark.readStream
      .format(classOf[ChangeFeedProvider].getName)
      .option("store", feed).option("numPartitions", "2")
      .option("emitDdl", "true").load()
    val q = UpsertSink.stream(CtPipeline.toEnvelope(stream), store,
      checkpointDir("ctp-durable-ckpt"))
    q.processAllAvailable()

    // mid-stream: evolve schema + mutate — the next batch must merge
    // against the committed snapshot
    ct.setSchema("dbo.a", s2.json)
    ct.append("dbo.a", "UPDATE", 1L, "a2")
    ct.append("dbo.a", "DELETE", 2L, "b")
    q.processAllAvailable()
    q.stop()

    assert(store.schemaOf(spark, "dbo.a").get.fieldNames.contains("extra"))
    val rows = store.snapshot(spark, "dbo.a")
      .collect().map(r => r.getString(0) -> r.getMap[String, String](2).toMap)
      .toMap
    assert(rows.keySet == Set("1"))
    assert(rows("1")("payload") == "a2")
  }
}
