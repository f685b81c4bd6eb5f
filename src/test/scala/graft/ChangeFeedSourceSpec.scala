package graft

import graft.sources.{ChangeFeedProvider, ChangeTrackingStore}
import org.apache.spark.sql.streaming.Trigger

/** The custom DSv2 micro-batch source against the CT simulator:
  * admission control caps batch size, all changes are delivered, new
  * changes appended after a cycle are picked up, and key-hash
  * partitioning spreads the read. */
class ChangeFeedSourceSpec extends SparkSuite {
  import spark.implicits._

  test("micro-batch source delivers all changes under admission control") {
    val name = "ct-spec"
    ChangeTrackingStore.drop(name)
    val store = ChangeTrackingStore.get(name)
    (1 to 250).foreach(i => store.append(
      if (i % 10 == 0) "UPDATE" else "INSERT", i % 17, s"p$i"))

    val stream = spark.readStream
      .format(classOf[ChangeFeedProvider].getName)
      .option("store", name)
      .option("maxBatchSize", "100")
      .option("numPartitions", "4")
      .load()

    val q = stream.writeStream.format("memory").queryName("ct_out")
      .option("checkpointLocation", checkpointDir("ctsrc"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val got = spark.table("ct_out")
    assert(got.count() == 250)
    assert(got.select($"version").as[Long].collect().toSet == (1L to 250L).toSet)
    // admission control: no micro-batch exceeded maxBatchSize
    val batchSizes = q.recentProgress.map(_.numInputRows).filter(_ > 0)
    assert(batchSizes.nonEmpty && batchSizes.forall(_ <= 100),
      s"batch sizes: ${batchSizes.mkString(",")}")
    assert(batchSizes.length >= 3, "250 rows at cap 100 needs >= 3 batches")

    // new changes after the first drain are picked up from the
    // checkpointed offset (durable offsets — the reference loses these)
    (251 to 260).foreach(i => store.append("INSERT", i % 17, s"p$i"))
    val q2 = stream.writeStream.format("memory").queryName("ct_out2")
      .option("checkpointLocation", checkpointDir("ctsrc2"))
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    assert(spark.table("ct_out2").count() == 260)
  }

  test("transient source outage yields empty batches, then recovery delivers everything") {
    val name = "ct-retry"
    ChangeTrackingStore.drop(name)
    val store = ChangeTrackingStore.get(name)
    (1 to 20).foreach(i => store.append("INSERT", i, s"p$i"))

    val stream = spark.readStream
      .format(classOf[ChangeFeedProvider].getName)
      .option("store", name).option("maxBatchSize", "5")
      .option("numPartitions", "2").option("maxRetrySeconds", "30")
      .load()
    val q = stream.writeStream.format("memory").queryName("ct_retry_out")
      .option("checkpointLocation", checkpointDir("ctretry"))
      .trigger(Trigger.ProcessingTime("50 milliseconds")).start()

    // let a couple of batches through, then inject an outage
    Thread.sleep(500)
    store.failReads(3) // next 3 polls throw -> empty batches, no crash
    (21 to 30).foreach(i => store.append("INSERT", i, s"p$i"))
    // wait until fully caught up after recovery
    val deadline = System.currentTimeMillis() + 30000
    def delivered = spark.table("ct_retry_out").count()
    while (delivered < 30 && System.currentTimeMillis() < deadline) Thread.sleep(200)
    q.stop()
    assert(delivered == 30, s"only $delivered/30 delivered after recovery")
    assert(q.exception.isEmpty, s"query should survive the outage: ${q.exception}")
  }
}
