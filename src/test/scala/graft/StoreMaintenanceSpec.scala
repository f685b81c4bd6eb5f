package graft

import graft.operators.ChangeFeed
import graft.sinks.{KeyBloom, ParquetUpsertStore, SecondaryIndex, StoreMaintenance}
import org.apache.spark.sql.functions._

/** The composite maintenance op: one call folds store + indexes +
  * blooms (+ vacuum) in the crash-safe order, answers are unchanged,
  * artifact file counts actually fold, and the NEXT batch appends into
  * the folded layout seamlessly. */
class StoreMaintenanceSpec extends SparkSuite {
  import spark.implicits._

  private def env(rows: Seq[(String, String, String, Long)]) =
    ChangeFeed.wrapDml(
      rows.toDF("user_id", "val", "op0", "ver"),
      "t", Seq("user_id"), col("op0"), col("ver"), lit(0L))

  private def fs(root: String) = new org.apache.hadoop.fs.Path(root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("one maintenance call folds store, index, and blooms; answers unchanged") {
    val root = checkpointDir("maint")
    val store = new ParquetUpsertStore(root, numBuckets = 4)
    def applyAll(b: org.apache.spark.sql.DataFrame, id: Long): Unit = {
      SecondaryIndex.indexBatch(root, "t", "val", b, id)
      KeyBloom.addBatch(spark, root, "t", b, id)
      store.applyBatch(b, id)
    }
    applyAll(env((1 to 20).map(i =>
      (s"k$i", if (i % 2 == 0) "a" else "b", "INSERT", i.toLong))), 0L)
    applyAll(env(Seq(("k2", "b", "UPDATE", 100L), ("k4", "a", "DELETE", 101L),
      ("k30", "a", "INSERT", 102L))), 1L)
    applyAll(env(Seq(("k31", "b", "INSERT", 200L))), 2L)

    def liveSet(df: org.apache.spark.sql.DataFrame) =
      df.select(col("row_key"), col("version")).as[(String, Long)]
        .collect().toSet
    def checkAll(tag: String): Unit = {
      Seq("a", "b").foreach { v =>
        assert(liveSet(SecondaryIndex.lookupByValue(
            spark, store, root, "t", "val", v)) ==
          liveSet(store.snapshot(spark, "t")
            .filter(try_element_at(col("values"), lit("val")) === v)),
          s"[$tag] indexed lookup diverges for '$v'")
      }
      val probes = Seq("k1", "k2", "k4", "k30", "k31", "ghost-1", "ghost-2")
      assert(liveSet(KeyBloom.lookup(spark, store, root, "t", probes)) ==
        liveSet(store.lookup(spark, "t", probes)),
        s"[$tag] bloom-fronted lookup diverges")
    }
    checkAll("pre-maintenance")

    StoreMaintenance.run(spark, store, root, "t", Seq("val"), asBatch = 2L,
      vacuumRetainBatches = 0L)
    checkAll("post-maintenance")

    // Folds actually happened: one bloom file, one snapshot dir, one
    // manifest, exactly one posting per live indexed row.
    val f = fs(root)
    val blooms = f.listStatus(new org.apache.hadoop.fs.Path(
        KeyBloom.bloomDir(root, "t")))
      .map(_.getPath.getName).filter(_.endsWith(".bloom"))
    assert(blooms.toSeq == Seq("snapshot-2.bloom"), s"blooms: ${blooms.toSeq}")
    val tdir = f.listStatus(new org.apache.hadoop.fs.Path(s"$root/t"))
      .map(_.getPath.getName)
    assert(tdir.count(_.matches("manifest-\\d+")) == 1,
      s"vacuum left extra manifests: ${tdir.toSeq}")
    assert(tdir.count(_.startsWith("snap-")) == 1,
      s"vacuum left extra snapshots: ${tdir.toSeq}")
    val live = store.snapshot(spark, "t").count()
    val postings = spark.read
      .parquet(SecondaryIndex.postingsDir(spark, root, "t", "val")).count()
    assert(postings == live,
      s"compacted postings ($postings) != live rows ($live)")

    // The next batch appends into the folded layout and every read path
    // picks it up.
    applyAll(env(Seq(("k40", "a", "INSERT", 300L),
      ("k2", "a", "UPDATE", 301L))), 3L)
    checkAll("post-maintenance append")
    assert(liveSet(SecondaryIndex.lookupByValue(
        spark, store, root, "t", "val", "a")).map(_._1).contains("k40"))
    assert(liveSet(KeyBloom.lookup(spark, store, root, "t", Seq("k40")))
      .map(_._1) == Set("k40"))

    // Re-running the same maintenance is idempotent in effect (the
    // crash-recovery posture: a crashed run is completed by a re-run).
    StoreMaintenance.run(spark, store, root, "t", Seq("val"), asBatch = 3L)
    checkAll("re-run")
  }

  test("a crash between maintenance steps leaves sound reads at every boundary") {
    // Every step of the composite fold is individually crash-safe; the
    // cross-step property pinned here is that STOPPING after any prefix
    // of the steps leaves index-first and bloom-fronted lookups equal
    // to snapshot filters — stale sidecar artifacts over a compacted
    // store are supersets the read paths prune, never lies — and a full
    // re-run then completes the fold.
    val root = checkpointDir("maint-crash")
    val store = new ParquetUpsertStore(root, numBuckets = 4)
    def applyAll(b: org.apache.spark.sql.DataFrame, id: Long): Unit = {
      SecondaryIndex.indexBatch(root, "t", "val", b, id)
      KeyBloom.addBatch(spark, root, "t", b, id)
      store.applyBatch(b, id)
    }
    applyAll(env((1 to 15).map(i =>
      (s"k$i", if (i % 3 == 0) "a" else "b", "INSERT", i.toLong))), 0L)
    applyAll(env(Seq(("k3", "b", "UPDATE", 50L), ("k6", "a", "DELETE", 51L))), 1L)

    def liveSet(df: org.apache.spark.sql.DataFrame) =
      df.select(col("row_key"), col("version")).as[(String, Long)]
        .collect().toSet
    def checkAll(tag: String): Unit = {
      Seq("a", "b").foreach { v =>
        assert(liveSet(SecondaryIndex.lookupByValue(
            spark, store, root, "t", "val", v)) ==
          liveSet(store.snapshot(spark, "t")
            .filter(try_element_at(col("values"), lit("val")) === v)),
          s"[$tag] indexed lookup diverges for '$v'")
      }
      assert(liveSet(KeyBloom.lookup(spark, store, root, "t",
          Seq("k3", "k6", "k9", "ghost"))) ==
        liveSet(store.lookup(spark, "t", Seq("k3", "k6", "k9", "ghost"))),
        s"[$tag] bloom-fronted lookup diverges")
    }
    checkAll("baseline")
    // crash after step 1 (store compacted, artifacts stale)
    store.compact(spark, "t", 1L)
    checkAll("after store compact only")
    // crash after step 2 (index folded, blooms stale)
    SecondaryIndex.compact(spark, store, root, "t", "val", 1L)
    checkAll("after store+index")
    // the re-run completes the fold
    StoreMaintenance.run(spark, store, root, "t", Seq("val"), asBatch = 1L)
    checkAll("after full re-run")
  }
}
