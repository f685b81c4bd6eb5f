package graft

import graft.operators.ChangeFeed
import graft.sinks.{KeyBloom, ParquetUpsertStore, SecondaryIndex}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** One keyed change event for the maintenance stream. */
case class MaintEv(user_id: String, val0: String, op0: String, ver: Long)

/** The artifacts maintained INSIDE the real streaming apply loop: one
  * foreachBatch does index → bloom → store apply per micro-batch (the
  * crash-safe ordering), across several micro-batches including
  * updates and deletes; index-first and bloom-fronted lookups must
  * equal snapshot filters at the end, and a REDELIVERED final batch
  * (at-least-once) must change no answer — the store skips the
  * replayed id, the artifacts absorb their duplicates by
  * construction. */
class IndexMaintenanceStreamSpec extends SparkSuite {
  import spark.implicits._

  test("foreachBatch-maintained index and blooms answer like snapshot filters, through replay") {
    val root = checkpointDir("idx-maint")
    val store = new ParquetUpsertStore(root, numBuckets = 4)

    def applyAll(b: DataFrame, id: Long): Unit = {
      val env = ChangeFeed.wrapDml(b, "t", Seq("user_id"),
        col("op0"), col("ver"), lit(0L))
      SecondaryIndex.indexBatch(root, "t", "val0", env, id)
      KeyBloom.addBatch(spark, root, "t", env, id, expectedItems = 1000L)
      store.applyBatch(env, id)
    }

    implicit val ctx = spark.sqlContext
    val in = MemoryStream[MaintEv]
    val q = in.toDF().writeStream
      .option("checkpointLocation", checkpointDir("idx-maint-ckpt"))
      .foreachBatch(applyAll _)
      .start()
    var lastBatch: Seq[MaintEv] = Nil
    Seq(
      (1 to 30).map(i => MaintEv(s"k$i", if (i % 3 == 0) "x" else "y",
        "INSERT", i.toLong)),
      Seq(MaintEv("k3", "y", "UPDATE", 100L), MaintEv("k6", "x", "DELETE", 101L),
        MaintEv("k40", "x", "INSERT", 102L)),
      Seq(MaintEv("k9", "z", "UPDATE", 200L), MaintEv("k41", "z", "INSERT", 201L))
    ).foreach { batch =>
      in.addData(batch: _*)
      q.processAllAvailable()
      lastBatch = batch
    }
    q.stop()

    def checkAll(tag: String): Unit = {
      def rows(df: DataFrame) =
        df.select(col("row_key"), col("version")).as[(String, Long)]
          .collect().toSet
      Seq("x", "y", "z").foreach { v =>
        assert(rows(SecondaryIndex.lookupByValue(
            spark, store, root, "t", "val0", v)) ==
          rows(store.snapshot(spark, "t")
            .filter(try_element_at(col("values"), lit("val0")) === v)),
          s"[$tag] indexed lookup diverges for '$v'")
      }
      val probes = Seq("k3", "k6", "k40", "k41", "ghost-1", "ghost-2")
      assert(rows(KeyBloom.lookup(spark, store, root, "t", probes)) ==
        rows(store.lookup(spark, "t", probes)),
        s"[$tag] bloom-fronted lookup diverges")
      // the update/delete really happened
      assert(rows(SecondaryIndex.lookupByValue(
        spark, store, root, "t", "val0", "z")).map(_._1) == Set("k9", "k41"))
      assert(rows(store.lookup(spark, "t", Seq("k6"))).isEmpty)
    }
    checkAll("after stream")

    // At-least-once redelivery of the final micro-batch: the store
    // shadows the replayed id, the artifacts append duplicates the
    // lookups collapse — no answer moves.
    applyAll(lastBatch.toDF(), 2L)
    checkAll("after redelivery")
  }

  test("compaction at micro-batch boundaries of a live stream, through checkpoint restart") {
    // THE CONTRACT: artifact compaction runs BETWEEN foreachBatch
    // invocations (a micro-batch boundary — foreachBatch is serial, so
    // the boundary is a quiesce point for the index→bloom→apply
    // sequence), never between a batch's index write and its store
    // apply. SecondaryIndex.compact additionally carries postings of
    // batches above the compaction point, so an indexed-but-unapplied
    // in-flight batch survives even a boundary race
    // (SecondaryIndexSpec pins that face); this pins the streaming
    // composition: compact while the query is LIVE, keep streaming,
    // restart from the checkpoint, and every lookup stays equal to the
    // snapshot filter across both boundaries.
    val root = checkpointDir("idx-compact-stream")
    val store = new ParquetUpsertStore(root, numBuckets = 4)
    val applied = new java.util.concurrent.atomic.AtomicLong(-1L)

    def applyAll(b: DataFrame, id: Long): Unit = {
      val env = ChangeFeed.wrapDml(b, "t", Seq("user_id"),
        col("op0"), col("ver"), lit(0L))
      SecondaryIndex.indexBatch(root, "t", "val0", env, id)
      KeyBloom.addBatch(spark, root, "t", env, id)
      store.applyBatch(env, id)
      applied.set(math.max(applied.get, id))
    }

    def checkAll(tag: String): Unit = {
      def rows(df: DataFrame) =
        df.select(col("row_key"), col("version")).as[(String, Long)]
          .collect().toSet
      Seq("x", "y", "z").foreach { v =>
        assert(rows(SecondaryIndex.lookupByValue(
            spark, store, root, "t", "val0", v)) ==
          rows(store.snapshot(spark, "t")
            .filter(try_element_at(col("values"), lit("val0")) === v)),
          s"[$tag] indexed lookup diverges for '$v'")
      }
      val probes = (1 to 30).map(i => s"k$i") ++
        Seq("k60", "k61", "ghost-1", "ghost-2", "ghost-3")
      assert(rows(KeyBloom.lookup(spark, store, root, "t", probes)) ==
        rows(store.lookup(spark, "t", probes)),
        s"[$tag] bloom-fronted lookup diverges")
    }

    implicit val ctx = spark.sqlContext
    val in = MemoryStream[MaintEv]
    val ckpt = checkpointDir("idx-compact-stream-ckpt")
    def start() = in.toDF().writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch(applyAll _)
      .start()

    val q1 = start()
    in.addData((1 to 30).map(i =>
      MaintEv(s"k$i", if (i % 3 == 0) "x" else "y", "INSERT", i.toLong)): _*)
    q1.processAllAvailable()
    in.addData(MaintEv("k3", "z", "UPDATE", 100L),
      MaintEv("k6", "x", "DELETE", 101L))
    q1.processAllAvailable()
    checkAll("pre-compaction")

    // Micro-batch boundary, query still LIVE: fold store + artifacts at
    // the last applied id through the composite lifecycle op (store
    // compaction, index rebuild from its snapshot, bloom snapshot from
    // its keys — StoreMaintenance fixes the crash-safe order).
    graft.sinks.StoreMaintenance.run(spark, store, root, "t",
      indexColumns = Seq("val0"), asBatch = applied.get)
    checkAll("post-compaction, live query")

    // The live stream keeps applying across the compaction boundary.
    in.addData(MaintEv("k9", "z", "UPDATE", 200L),
      MaintEv("k60", "x", "INSERT", 201L))
    q1.processAllAvailable()
    checkAll("post-compaction, next micro-batch")
    q1.stop()

    // Checkpoint restart over the compacted layout: the resumed stream's
    // batches keep maintaining the folded artifacts.
    in.addData(MaintEv("k61", "y", "INSERT", 300L),
      MaintEv("k60", "y", "UPDATE", 301L))
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    checkAll("after restart")
    assert(store.lookup(spark, "t", Seq("k6")).isEmpty, "delete survived")
    def keysFor(v: String) = SecondaryIndex.lookupByValue(
        spark, store, root, "t", "val0", v)
      .select(col("row_key")).as[String].collect().toSet
    assert(keysFor("z") == Set("k3", "k9"))
    assert(keysFor("y").contains("k60"), "post-restart update missing")
  }

  test("auto-maintenance keeps sidecar and store file counts bounded over a long stream") {
    // The artifact-GROWTH pin: ~32 micro-batches with the auto policy in
    // the apply loop and ZERO explicit maintenance calls. Without the
    // policy, blooms/postings/manifests grow one file per batch and a
    // lookup's opened-file count grows with stream age; with it, every
    // count — and therefore the files any point lookup touches — must
    // stay bounded by the policy constant, not by batch count. Bounds
    // are asserted on FILE COUNTS, not wall time (wall time flakes).
    val root = checkpointDir("idx-auto")
    val store = new ParquetUpsertStore(root, numBuckets = 4)
    val maxAppends = 5
    def applyAll(b: DataFrame, id: Long): Unit = {
      val env = ChangeFeed.wrapDml(b, "t", Seq("user_id"),
        col("op0"), col("ver"), lit(0L))
      SecondaryIndex.indexBatch(root, "t", "val0", env, id)
      KeyBloom.addBatch(spark, root, "t", env, id)
      store.applyBatch(env, id)
      // the policy IS the maintenance — nothing else folds anything
      graft.sinks.StoreMaintenance.auto(spark, store, root, "t",
        Seq("val0"), id, maxSidecarAppends = maxAppends,
        vacuumRetainBatches = 8L)
    }
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def count(dir: String, p: String): Int =
      try fs.listStatus(new org.apache.hadoop.fs.Path(dir))
        .count(_.getPath.getName.matches(p))
      catch { case _: java.io.FileNotFoundException => 0 }
    val idxDir = SecondaryIndex.indexDir(root, "t", "val0")
    var maxBloom, maxMarkers, maxGens, maxManifests, maxPostFiles = 0

    implicit val ctx = spark.sqlContext
    val in = MemoryStream[MaintEv]
    val q = in.toDF().writeStream
      .option("checkpointLocation", checkpointDir("idx-auto-ckpt"))
      .foreachBatch(applyAll _)
      .start()
    val rnd = new scala.util.Random(7)
    (0 until 32).foreach { i =>
      val evs = (0 until 3).map { j =>
        val k = s"k${rnd.nextInt(12) + 1}"
        val v = Seq("x", "y", "z")(rnd.nextInt(3))
        val op = if (rnd.nextInt(10) == 0) "DELETE"
          else if (i == 0) "INSERT" else "UPDATE"
        MaintEv(k, v, op, i.toLong * 10 + j)
      }
      in.addData(evs: _*)
      q.processAllAvailable()
      maxBloom = math.max(maxBloom,
        count(KeyBloom.bloomDir(root, "t"), ".*\\.bloom"))
      maxMarkers = math.max(maxMarkers, count(idxDir, "_cover-\\d+"))
      maxGens = math.max(maxGens, count(idxDir, "gen-\\d+"))
      maxManifests = math.max(maxManifests, count(s"$root/t", "manifest-\\d+"))
      // files a point lookup can touch: current generation's data files
      val pd = SecondaryIndex.postingsDir(spark, root, "t", "val0")
      val postFiles =
        try {
          val it = fs.listFiles(new org.apache.hadoop.fs.Path(pd), true)
          var n = 0
          while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
          n
        } catch { case _: java.io.FileNotFoundException => 0 }
      maxPostFiles = math.max(maxPostFiles, postFiles)
    }
    q.stop()

    // answers stayed exact with zero explicit maintenance
    def rows(df: DataFrame) =
      df.select(col("row_key"), col("version")).as[(String, Long)]
        .collect().toSet
    Seq("x", "y", "z").foreach { v =>
      assert(rows(SecondaryIndex.lookupByValue(
          spark, store, root, "t", "val0", v)) ==
        rows(store.snapshot(spark, "t")
          .filter(try_element_at(col("values"), lit("val0")) === v)),
        s"auto-maintained lookup diverges for '$v'")
    }
    assert(rows(KeyBloom.lookup(spark, store, root, "t",
        (1 to 12).map(i => s"k$i") ++ Seq("ghost-1", "ghost-2"))) ==
      rows(store.lookup(spark, "t",
        (1 to 12).map(i => s"k$i") ++ Seq("ghost-1", "ghost-2"))),
      "auto-maintained bloom lookup diverges")

    // growth bounds: O(policy constant), NOT O(batch count = 32)
    assert(maxBloom <= maxAppends + 2, s"bloom files grew to $maxBloom")
    assert(maxMarkers <= maxAppends + 1, s"cover markers grew to $maxMarkers")
    assert(maxGens <= 2, s"index generations grew to $maxGens")
    assert(maxManifests <= 8 + maxAppends + 2,
      s"manifests grew to $maxManifests")
    // postings files: <= one folded file per vb bucket (3 distinct
    // values -> <=3 non-empty buckets) + one per un-folded append
    assert(maxPostFiles <= 3 + (maxAppends + 1) * 3,
      s"postings files grew to $maxPostFiles")
  }
}
