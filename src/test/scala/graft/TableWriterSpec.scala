package graft

import graft.sinks.TableWriter
import graft.sources.{ChangeFeedProvider, ChangeTrackingStore}
import org.apache.spark.sql.functions._

/** Partitioned-layout writer: partition pruning must reach the plan, and
  * the DSv2 source must validate its options per field. */
class TableWriterSpec extends SparkSuite {
  import spark.implicits._

  test("partitionBy layout prunes partitions at read time") {
    val path = checkpointDir("tw") + "/lineitem_by_flag"
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    TableWriter.writePartitioned(li, path,
      partitionCols = Seq("l_returnflag"), sortCols = Seq("l_shipdate"), files = 4)

    // directory layout: one dir per flag value
    val dirs = new java.io.File(path).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("l_returnflag=")).sorted
    assert(dirs.length == 3)

    val read = spark.read.parquet(path).filter($"l_returnflag" === "R")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("l_returnflag"), plan.take(800))
    val expected = li.filter($"l_returnflag" === "R").count()
    assert(read.count() == expected)
  }

  test("change feed source validates options per field") {
    def load(opts: (String, String)*) = {
      val r = spark.readStream.format(classOf[ChangeFeedProvider].getName)
      opts.foreach { case (k, v) => r.option(k, v) }
      // schema resolution triggers newScanBuilder validation lazily at
      // stream start; force it via a dry streaming plan
      val df = r.load()
      val q = df.writeStream.format("memory")
        .queryName("opt_check_" + System.nanoTime())
        .option("checkpointLocation", checkpointDir("optv"))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
    }
    ChangeTrackingStore.get("opt-ok").append("INSERT", 1L, "x")
    load("store" -> "opt-ok") // valid: defaults apply

    val e1 = intercept[Exception](load("store" -> "opt-bad", "maxBatchSize" -> "0"))
    assert(e1.getMessage != null)
    val e2 = intercept[Exception](load("store" -> "opt-bad2", "numPartitions" -> "-1"))
    assert(e2.getMessage != null)
  }
}
