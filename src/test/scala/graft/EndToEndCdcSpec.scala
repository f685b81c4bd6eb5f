package graft

import graft.operators.ChangeFeed
import graft.sinks.{InMemoryStore, UpsertSink}
import graft.sources.{ChangeFeedProvider, ChangeTrackingStore}
import org.apache.spark.sql.functions._

/** Full pipeline: DSv2 change-feed source → envelope wrap → upsert sink —
  * the reference's source→sink integration scenario on graft's own
  * components end to end. */
class EndToEndCdcSpec extends SparkSuite {

  test("change feed applies through envelope to final store state") {
    val feed = "e2e-feed"; val sinkName = "e2e-sink"
    ChangeTrackingStore.drop(feed); InMemoryStore.drop(sinkName)
    val ct = ChangeTrackingStore.get(feed)
    ct.append("INSERT", 1L, "a")
    ct.append("INSERT", 2L, "b")
    ct.append("UPDATE", 1L, "a2")
    ct.append("DELETE", 2L, "b")

    val stream = spark.readStream
      .format(classOf[ChangeFeedProvider].getName)
      .option("store", feed).option("maxBatchSize", "2")
      .option("numPartitions", "2").load()

    val envelope = ChangeFeed.wrapDml(stream, "dbo.t", Seq("key"),
      opType = col("op"), version = col("version"),
      tsMicros = col("version") * 1000L)

    val q = UpsertSink.stream(envelope, sinkName, checkpointDir("e2e"))
    q.processAllAvailable()
    q.stop()

    val rows = InMemoryStore.get(sinkName).rows("dbo.t")
    assert(rows.keySet == Set("1"))
    assert(rows("1")("payload") == "a2")
    assert(rows("1")("op") == "UPDATE")
  }
}
