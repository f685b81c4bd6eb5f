package graft

/** The tuned session factory boots with AQE + RocksDB state store and
  * runs a stateful streaming query end to end under that config. */
class GraftSessionSpec extends SparkSuite {

  test("tuned session runs a windowed agg under RocksDB state store") {
    val s = GraftSession.builder(master = "local[2]", shufflePartitions = 2)
      .getOrCreate()
    try {
      assert(s.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
      assert(s.conf.get("spark.sql.streaming.stateStore.providerClass")
        .contains("RocksDB"))
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import org.apache.spark.sql.functions._
      import s.implicits._
      implicit val ctx = s.sqlContext
      val in = MemoryStream[(java.sql.Timestamp, Long)]
      val q = in.toDF().toDF("ts", "v")
        .withWatermark("ts", "1 minute")
        .groupBy(window($"ts", "1 minute")).agg(count(lit(1)).as("n"))
        .writeStream.format("memory").queryName("rocks_out")
        .option("checkpointLocation", checkpointDir("rocks"))
        .outputMode("append").start()
      in.addData((java.sql.Timestamp.valueOf("2024-01-01 00:00:10"), 1L))
      in.addData((java.sql.Timestamp.valueOf("2024-01-01 00:05:00"), 2L))
      q.processAllAvailable()
      q.stop()
      assert(s.table("rocks_out").count() >= 1)
    } finally { /* shared-JVM session: leave running for other suites */ }
  }
}
