package graft

import graft.operators.ChangeFeed
import graft.sinks.{KeyBloom, ParquetUpsertStore, SecondaryIndex}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** One keyed change event for the sink stream. */
case class SinkEv(user_id: String, val0: String, op0: String, ver: Long)

/** Two-valued change event for the composite-index sink stream. */
case class SinkEv2(user_id: String, a: String, b: String, op0: String,
                   ver: Long)

/** `writeStream.format("graft-upsert")` — the whole durable apply
  * stack behind one line: per micro-batch the sink appends the
  * secondary indexes and the key bloom FIRST (the crash-ordering
  * contract), applies the batch, and runs the auto-maintenance fold
  * when the sidecars outgrow the policy bound. Pinned here: lookups
  * equal snapshot filters at every cadence, artifact file counts stay
  * bounded with zero maintenance calls in the pipeline code, and a
  * checkpoint restart resumes cleanly (replayed ids are absorbed). */
class UpsertStreamSinkSpec extends SparkSuite {
  import spark.implicits._

  test("the streaming sink maintains index, blooms, and folds — one writeStream line") {
    val root = checkpointDir("sink-stream")
    val ckpt = checkpointDir("sink-stream-ckpt")
    val store = new ParquetUpsertStore(root, numBuckets = 4)
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[SinkEv]

    def start() = ChangeFeed.wrapDml(in.toDF(), "t", Seq("user_id"),
        col("op0"), col("ver"), lit(0L))
      .writeStream.format("graft-upsert")
      .option("checkpointLocation", ckpt)
      .option("path", root).option("table", "t")
      .option("indexColumns", "val0").option("blooms", "true")
      .option("autoMaintain", "3").option("vacuumRetainBatches", "8")
      .start()

    def rows(df: DataFrame) =
      df.select(col("row_key"), col("version")).as[(String, Long)]
        .collect().toSet
    def checkAll(tag: String): Unit = {
      Seq("x", "y", "z").foreach { v =>
        assert(rows(SecondaryIndex.lookupByValue(
            spark, store, root, "t", "val0", v)) ==
          rows(store.snapshot(spark, "t")
            .filter(try_element_at(col("values"), lit("val0")) === v)),
          s"[$tag] indexed lookup diverges for '$v'")
      }
      val probes = (1 to 12).map(i => s"k$i") ++ Seq("ghost-1", "ghost-2")
      assert(rows(KeyBloom.lookup(spark, store, root, "t", probes)) ==
        rows(store.lookup(spark, "t", probes)),
        s"[$tag] bloom-fronted lookup diverges")
    }

    val q1 = start()
    val rnd = new scala.util.Random(11)
    (0 until 10).foreach { i =>
      in.addData((0 until 3).map { j =>
        SinkEv(s"k${rnd.nextInt(12) + 1}", Seq("x", "y", "z")(rnd.nextInt(3)),
          if (rnd.nextInt(8) == 0) "DELETE"
          else if (i == 0) "INSERT" else "UPDATE", i.toLong * 10 + j)
      }: _*)
      q1.processAllAvailable()
    }
    checkAll("after 10 micro-batches")
    q1.stop()

    // the auto policy actually folded: sidecar file counts are bounded
    // by the policy constant, not the batch count
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def count(dir: String, p: String): Int =
      try fs.listStatus(new org.apache.hadoop.fs.Path(dir))
        .count(_.getPath.getName.matches(p))
      catch { case _: java.io.FileNotFoundException => 0 }
    assert(count(KeyBloom.bloomDir(root, "t"), ".*\\.bloom") <= 5,
      "bloom log must have folded under the auto policy")
    assert(count(SecondaryIndex.indexDir(root, "t", "val0"),
      "_cover-\\d+") <= 4, "cover markers must have folded")

    // checkpoint restart: the resumed stream keeps maintaining, and a
    // fresh update is visible through every read path
    in.addData(SinkEv("k1", "z", "UPDATE", 500L),
      SinkEv("k99", "z", "INSERT", 501L))
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    checkAll("after restart")
    assert(rows(SecondaryIndex.lookupByValue(
      spark, store, root, "t", "val0", "z")).map(_._1)
      .intersect(Set("k1", "k99")) == Set("k1", "k99"))
  }

  test("indexColumns 'a+b' maintains a composite pair index from the stream") {
    val root = checkpointDir("sink-pair")
    val store = new ParquetUpsertStore(root, numBuckets = 4)
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[SinkEv2]
    val q = ChangeFeed.wrapDml(in.toDF(), "t", Seq("user_id"),
        col("op0"), col("ver"), lit(0L))
      .writeStream.format("graft-upsert")
      .option("checkpointLocation", checkpointDir("sink-pair-ckpt"))
      .option("path", root).option("table", "t")
      .option("indexColumns", "a+b").option("blooms", "true")
      .option("autoMaintain", "2")
      .start()
    val rnd = new scala.util.Random(7)
    try (0 until 8).foreach { i =>
      in.addData((0 until 4).map(j => SinkEv2(s"k${rnd.nextInt(16) + 1}",
        Seq("p", "q")(rnd.nextInt(2)), Seq("u", "v")(rnd.nextInt(2)),
        if (i == 0) "INSERT" else "UPDATE", i.toLong * 10 + j)): _*)
      q.processAllAvailable()
    } finally q.stop()
    def rows(df: DataFrame) =
      df.select(col("row_key"), col("version")).as[(String, Long)]
        .collect().toSet
    // pair-only lookup equals the conjunctive snapshot filter for every
    // value combination
    for (a <- Seq("p", "q"); b <- Seq("u", "v")) {
      assert(rows(SecondaryIndex.lookupByAll(spark, store, root, "t",
          equalTo = Map("a" -> a, "b" -> b))) ==
        rows(store.snapshot(spark, "t")
          .filter(try_element_at(col("values"), lit("a")) === a &&
            try_element_at(col("values"), lit("b")) === b)),
        s"pair lookup diverges for ($a, $b)")
    }
    // the auto policy folded the PAIR index's cover markers too
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val pairDir = SecondaryIndex.indexDir(root, "t",
      SecondaryIndex.compositeName(Seq("a", "b")))
    val covers =
      try fs.listStatus(new org.apache.hadoop.fs.Path(pairDir))
        .count(_.getPath.getName.matches("_cover-\\d+"))
      catch { case _: java.io.FileNotFoundException => -1 }
    assert(covers >= 0 && covers <= 3,
      s"pair-index cover markers must fold under the auto policy: $covers")
  }
}
