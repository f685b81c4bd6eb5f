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
}
