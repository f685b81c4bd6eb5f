package graft

import graft.operators.ChangeFeed
import graft.sinks.{KeyBloom, ParquetUpsertStore}
import org.apache.spark.sql.functions._

/** Key-bloom contract: present keys (including deleted ones) always
  * pass (no false negatives), never-written keys overwhelmingly drop
  * before any bucket read, and the bloom-fronted lookup equals the
  * plain lookup on every probe mix. */
class KeyBloomSpec extends SparkSuite {
  import spark.implicits._

  private def env(rows: Seq[(String, String, Long)]) =
    ChangeFeed.wrapDml(rows.toDF("user_id", "op0", "ver"),
      "t", Seq("user_id"), col("op0"), col("ver"), lit(0L))

  test("blooms drop never-written keys and never drop written ones") {
    val root = checkpointDir("keybloom")
    val store = new ParquetUpsertStore(root, numBuckets = 4)
    val b0 = env((1 to 50).map(i => (s"k$i", "INSERT", 1L)))
    val b1 = env(Seq(("k3", "DELETE", 2L), ("k60", "INSERT", 2L)))
    Seq((b0, 0L), (b1, 1L)).foreach { case (b, id) =>
      KeyBloom.addBatch(spark, root, "t", b, id, expectedItems = 1000L)
      store.applyBatch(b, id)
    }

    val written = (1 to 50).map(i => s"k$i") :+ "k60"
    assert(KeyBloom.filterPresent(spark, root, "t", written) == written,
      "a written key must never be bloom-dropped")

    // Never-written probes: with fpp 1% over 200 keys, expect ~2 false
    // positives per bloom; ≥90% must drop before any bucket read.
    val absent = (1000 to 1199).map(i => s"zz$i")
    val passed = KeyBloom.filterPresent(spark, root, "t", absent)
    assert(passed.length <= 20,
      s"bloom fast path stopped pruning: ${passed.length}/200 absent keys passed")

    // The fronted lookup is answer-identical on a present/absent/deleted mix.
    val probes = Seq("k1", "k3", "k60", "zz1", "zz2")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("row_key"), col("version")).as[(String, Long)].collect().toSet
    assert(rows(KeyBloom.lookup(spark, store, root, "t", probes)) ==
      rows(store.lookup(spark, "t", probes)))
    // Deleted key: passes the bloom (it was written), lookup returns nothing.
    assert(rows(KeyBloom.lookup(spark, store, root, "t", Seq("k3"))).isEmpty)

    // No blooms built (fresh table): pruning disabled, not wrong.
    assert(KeyBloom.filterPresent(spark, root, "nosuch", Seq("a", "b"))
      == Seq("a", "b"))

    // Replay idempotence: rewriting a batch's bloom changes nothing.
    KeyBloom.addBatch(spark, root, "t", b1, 1L, expectedItems = 1000L)
    assert(KeyBloom.filterPresent(spark, root, "t", written) == written)
  }

  private def bloomFiles(root: String): Seq[String] = {
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(
        graft.sinks.KeyBloom.bloomDir(root, "t")))
      .map(_.getPath.getName).filter(_.endsWith(".bloom")).toSeq.sorted
  }

  test("compaction folds the bloom log into one snapshot bloom, answers unchanged") {
    val root = checkpointDir("keybloom-compact")
    val store = new ParquetUpsertStore(root, numBuckets = 4)
    val batches = Seq(
      env((1 to 30).map(i => (s"k$i", "INSERT", 1L))),
      env(Seq(("k3", "DELETE", 2L), ("k40", "INSERT", 2L))),
      env(Seq(("k41", "INSERT", 3L))))
    batches.zipWithIndex.foreach { case (b, id) =>
      KeyBloom.addBatch(spark, root, "t", b, id.toLong)
      store.applyBatch(b, id.toLong)
    }
    assert(bloomFiles(root).length == 3)
    KeyBloom.compact(spark, store, root, "t", asBatch = 2L)
    assert(bloomFiles(root) == Seq("snapshot-2.bloom"),
      s"compaction must leave exactly one bloom, got ${bloomFiles(root)}")

    val live = ((1 to 30).map(i => s"k$i").toSet - "k3") ++ Set("k40", "k41")
    val ghosts = (1 to 100).map(i => s"ghost-$i")
    assert(KeyBloom.filterPresent(spark, root, "t", live.toSeq.sorted)
      == live.toSeq.sorted, "a live key must never be bloom-dropped")
    assert(KeyBloom.filterPresent(spark, root, "t", ghosts).length <= 10,
      "the miss fast path must survive compaction")
    // a deleted key may now drop at the bloom — the answer (no rows) is
    // identical either way; the fronted lookup proves it
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("row_key"), col("version")).as[(String, Long)].collect().toSet
    Seq(Seq("k1", "k3", "k40", "ghost-1"), Seq("k3"), Seq("k41")).foreach { p =>
      assert(rows(KeyBloom.lookup(spark, store, root, "t", p)) ==
        rows(store.lookup(spark, "t", p)), s"fronted lookup diverged on $p")
    }

    // post-compaction batches append per-batch blooms beside the snapshot
    val b3 = env(Seq(("k50", "INSERT", 4L)))
    KeyBloom.addBatch(spark, root, "t", b3, 3L)
    store.applyBatch(b3, 3L)
    assert(bloomFiles(root) == Seq("batch-3.bloom", "snapshot-2.bloom"))
    assert(KeyBloom.filterPresent(spark, root, "t", Seq("k50")) == Seq("k50"))

    // crash leftovers are harmless: an undeleted superseded batch bloom
    // (crash between snapshot rename and the deletes) and an orphaned
    // tmp (crash before rename) change no answer
    KeyBloom.addBatch(spark, root, "t", batches(0), 0L)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(new org.apache.hadoop.fs.Path(
      graft.sinks.KeyBloom.bloomDir(root, "t"), ".snapshot-9.bloom.tmp"), true)
      .close()
    assert(KeyBloom.filterPresent(spark, root, "t",
      (live + "k50").toSeq.sorted) == (live + "k50").toSeq.sorted)
    assert(KeyBloom.filterPresent(spark, root, "t", ghosts).length <= 10)

    // a second compaction supersedes the first snapshot bloom
    KeyBloom.compact(spark, store, root, "t", asBatch = 3L)
    assert(bloomFiles(root) == Seq("snapshot-3.bloom"))
    assert(KeyBloom.filterPresent(spark, root, "t", Seq("k50", "ghost-1"))
      == Seq("k50"))

    // time travel below the compaction point: pruning soundly disables
    assert(KeyBloom.filterPresent(spark, root, "t", Seq("ghost-1"),
      atOrBefore = Some(1L)) == Seq("ghost-1"))
  }

  test("manifest cross-check: an applied batch with no bloom disables pruning") {
    val root = checkpointDir("keybloom-gap")
    val store = new ParquetUpsertStore(root, numBuckets = 4)
    val b0 = env((1 to 20).map(i => (s"k$i", "INSERT", 1L)))
    val b1 = env(Seq(("k30", "INSERT", 2L)))
    KeyBloom.addBatch(spark, root, "t", b0, 0L)
    store.applyBatch(b0, 0L)
    store.applyBatch(b1, 1L) // bloom forgotten (partial adoption)
    // k30 is live but in no bloom — pruning would be a silent false
    // negative, so it must disable itself entirely
    assert(KeyBloom.filterPresent(spark, root, "t", Seq("k30", "ghost-1"))
      == Seq("k30", "ghost-1"),
      "an uncovered committed batch must disable pruning")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("row_key")).as[String].collect().toSet
    assert(rows(KeyBloom.lookup(spark, store, root, "t", Seq("k30"))) ==
      Set("k30"))
    // compaction restores coverage (the snapshot bloom covers all ≤ id)
    KeyBloom.compact(spark, store, root, "t", asBatch = 1L)
    assert(KeyBloom.filterPresent(spark, root, "t", Seq("k30")) == Seq("k30"))
    assert(KeyBloom.filterPresent(spark, root, "t",
      (1 to 100).map(i => s"ghost-$i")).length <= 10,
      "pruning must be back after compaction")
  }
}
