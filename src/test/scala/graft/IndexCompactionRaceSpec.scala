package graft

import graft.operators.ChangeFeed
import graft.sinks.{ParquetUpsertStore, SecondaryIndex}
import org.apache.spark.sql.functions._

/** Reader-atomicity of index compaction, pinned by an ACTUAL race: a
  * lookup loop runs concurrently with repeated compactions. r15's
  * rename-aside swap had a window where a reader found no postings
  * directory at all; the generation-pointer layout commits each
  * compaction by an atomic pointer-file create and retains the
  * previous generation as a grace copy, so every concurrent lookup
  * must succeed and answer exactly the snapshot filter — no errors, no
  * empty answers, no quiesce contract needed for readers. */
class IndexCompactionRaceSpec extends SparkSuite {
  import spark.implicits._

  test("lookups racing repeated compactions never error and always answer exactly") {
    val root = checkpointDir("secidx-race")
    val store = new ParquetUpsertStore(root, numBuckets = 4)
    def env(rows: Seq[(String, String, String, Long)]) =
      ChangeFeed.wrapDml(rows.toDF("user_id", "val", "op0", "ver"),
        "t", Seq("user_id"), col("op0"), col("ver"), lit(0L))
    val b0 = env((1 to 60).map(i =>
      (s"k$i", if (i % 3 == 0) "a" else "b", "INSERT", i.toLong)))
    val b1 = env(Seq(("k3", "b", "UPDATE", 100L), ("k6", "a", "DELETE", 101L),
      ("k99", "a", "INSERT", 102L)))
    Seq((b0, 0L), (b1, 1L)).foreach { case (b, id) =>
      SecondaryIndex.indexBatch(root, "t", "val", b, id)
      store.applyBatch(b, id)
    }
    def liveSet(df: org.apache.spark.sql.DataFrame) =
      df.select(col("row_key"), col("version")).as[(String, Long)]
        .collect().toSet
    // the store is static during the race, so the truth is fixed
    val expected = liveSet(store.snapshot(spark, "t")
      .filter(try_element_at(col("values"), lit("val")) === "a"))
    assert(expected.nonEmpty)

    val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]
    val compactions = 6
    val compactor = new Thread(() => {
      try (1 to compactions).foreach { _ =>
        SecondaryIndex.compact(spark, store, root, "t", "val", asBatch = 1L)
      } catch { case t: Throwable => failure.compareAndSet(null, t) }
    }, "race-compactor")
    compactor.start()
    var lookups = 0
    try {
      while (compactor.isAlive && lookups < 500) {
        val got = liveSet(SecondaryIndex.lookupByValue(
          spark, store, root, "t", "val", "a"))
        assert(got == expected,
          s"racing lookup #$lookups diverged: $got vs $expected")
        lookups += 1
      }
    } finally compactor.join()
    assert(failure.get == null, s"compactor failed: ${failure.get}")
    assert(lookups >= 3, s"race never overlapped (only $lookups lookups)")
    // steady state: exactly current + grace generation on disk
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val gens = fs.listStatus(new org.apache.hadoop.fs.Path(
        SecondaryIndex.indexDir(root, "t", "val")))
      .map(_.getPath.getName).filter(_.startsWith("gen-"))
    assert(gens.length <= 2, s"generation cleanup fell behind: ${gens.toSeq}")
    // and the world after the dust settles is still exact
    assert(liveSet(SecondaryIndex.lookupByValue(
      spark, store, root, "t", "val", "a")) == expected)
  }
}
