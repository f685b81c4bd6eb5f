package graft

import graft.streaming.DriftMonitor
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** One open-schema document for the drift stream. */
case class DriftDoc(epoch: Int, js: String)

/** The drift monitor driven by a REAL stream: foreachBatch profiles
  * each micro-batch and folds it into the artifact; at every cadence
  * the monitor must equal the hand-computed truth — new keys alert
  * new_key, type drifts alert new_type, everything else is steady, and
  * the statuses are FROZEN history (a later epoch never rewrites an
  * earlier verdict). st22 pins the same composition against the DuckDB
  * window oracle on the fixture; this drives the operator through
  * MemoryStream with documents whose drift is chosen, not sampled. */
class DriftMonitorStreamSpec extends SparkSuite {
  import spark.implicits._

  test("foreachBatch drift monitor alerts new keys and type drift at every cadence") {
    val dir = checkpointDir("drift-art")
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[DriftDoc]
    val q = in.toDF().writeStream
      .option("checkpointLocation", checkpointDir("drift-ckpt"))
      .foreachBatch { (b: DataFrame, id: Long) =>
        DriftMonitor.ingest(spark, dir, DriftMonitor.profileBatch(
          b.select(col("epoch"), parse_json(col("js")).as("v"))), id)
      }.start()

    def state(): Set[(Int, String, String, Long, String)] =
      DriftMonitor.monitor(spark, dir)
        .as[(Int, String, String, Long, String)].collect().toSet

    val e0 = Set(
      (0, "a", "integer", 2L, "new_key"),
      (0, "b", "string", 1L, "new_key"))
    val e1 = Set(
      (1, "a", "number", 1L, "new_type"), // int -> decimal: the DDL alert
      (1, "b", "string", 1L, "steady"),
      (1, "c", "boolean", 1L, "new_key"))
    val e2 = Set(
      (2, "a", "integer", 1L, "steady"),  // back to a tier seen at epoch 0
      (2, "c", "array", 1L, "new_type"),
      (2, "d", "null", 1L, "new_key"))
    try {
      in.addData(DriftDoc(0, """{"a": 1, "b": "x"}"""),
        DriftDoc(0, """{"a": 2}"""))
      q.processAllAvailable()
      assert(state() == e0)

      in.addData(DriftDoc(1, """{"a": 1.5, "b": "y", "c": true}"""))
      q.processAllAvailable()
      assert(state() == e0 ++ e1)

      in.addData(DriftDoc(2, """{"a": 3, "c": [1, 2], "d": null}"""))
      q.processAllAvailable()
      assert(state() == e0 ++ e1 ++ e2)
    } finally q.stop()

    // at-least-once replay of the LAST batch: same id, same rows,
    // overwritten in place - statuses and counts unchanged
    DriftMonitor.ingest(spark, dir, DriftMonitor.profileBatch(
      Seq((2, """{"a": 3, "c": [1, 2], "d": null}""")).toDF("epoch", "js")
        .select(col("epoch"), parse_json(col("js")).as("v"))), 2L)
    assert(state() == e0 ++ e1 ++ e2, "replayed batch must be idempotent")

    // the alert face: non-steady rows of the latest epoch only
    val alerts = DriftMonitor.monitor(spark, dir)
      .filter(col("epoch") === 2 && col("status") =!= "steady")
      .select(col("key"), col("status")).as[(String, String)].collect().toSet
    assert(alerts == Set("c" -> "new_type", "d" -> "new_key"))
  }

  /** Expected full history for a feed where batch b contributes one doc
    * whose keys are k0..k(b mod 5) — key "k<i>" first appears at batch
    * i, always tier integer, so statuses are mechanical. */
  private def syntheticDoc(b: Int): String =
    (0 to (b % 5)).map(i => s""""k$i": ${b + i}""").mkString("{", ", ", "}")

  test("artifact lifecycle stays bounded: O(foldEvery) directories at any stream age") {
    // The unbounded-sidecar shape the other artifacts already solved
    // (blooms r15, postings r16): ingest must NOT re-read every prior
    // batch-<id> directory. 32 batches at foldEvery=4 → the unfolded
    // tail and the fold generations both stay O(policy constant), and
    // the monitor stays EXACT across every fold boundary.
    val dir = checkpointDir("drift-fold")
    val foldEvery = 4
    def dirNames: Seq[String] = {
      val f = new java.io.File(dir)
      Option(f.list()).getOrElse(Array.empty).toSeq
    }
    val expect = scala.collection.mutable.Set[(Int, String, String, Long, String)]()
    val seenKeys = scala.collection.mutable.Set[String]()
    (0 until 32).foreach { b =>
      DriftMonitor.ingest(spark, dir, DriftMonitor.profileBatch(
        Seq((b, syntheticDoc(b))).toDF("epoch", "js")
          .select(col("epoch"), parse_json(col("js")).as("v"))), b,
        foldEvery = foldEvery)
      (0 to (b % 5)).foreach { i =>
        val status = if (seenKeys.add(s"k$i")) "new_key" else "steady"
        expect += ((b, s"k$i", "integer", 1L, status))
      }
      val batchDirs = dirNames.count(_.startsWith("batch-"))
      val foldDirs = dirNames.count(n => n.startsWith("fold-") && !n.startsWith("_"))
      // tail bound = unfolded dirs + the just-folded tail retained one
      // cycle as the concurrent reader's grace copy — still O(policy)
      assert(batchDirs <= 2 * foldEvery + 1,
        s"unfolded tail grew past the policy at batch $b: $batchDirs dirs")
      assert(foldDirs <= 2,
        s"fold generations grew past current+grace at batch $b: $foldDirs")
    }
    assert(DriftMonitor.monitor(spark, dir)
      .as[(Int, String, String, Long, String)].collect().toSet == expect,
      "history must stay exact across fold boundaries")
    // replay of an already-FOLDED batch id is a no-op, not a double count
    DriftMonitor.ingest(spark, dir, DriftMonitor.profileBatch(
      Seq((0, syntheticDoc(0))).toDF("epoch", "js")
        .select(col("epoch"), parse_json(col("js")).as("v"))), 0L,
      foldEvery = foldEvery)
    assert(DriftMonitor.monitor(spark, dir)
      .as[(Int, String, String, Long, String)].collect().toSet == expect,
      "a replayed folded batch must be a no-op")
  }

  test("seen-set cardinality guard: past maxSeenPairs stamping degrades to joins, stays exact") {
    val dir = checkpointDir("drift-guard")
    // batch 0 mints 40 distinct keys — far past the tiny guard below
    val manyKeys = (0 until 40).map(i => s""""w$i": $i""").mkString("{", ", ", "}")
    DriftMonitor.ingest(spark, dir, DriftMonitor.profileBatch(
      Seq((0, manyKeys)).toDF("epoch", "js")
        .select(col("epoch"), parse_json(col("js")).as("v"))), 0L,
      maxSeenPairs = 5)
    // batch 1: one known key (steady), one known key drifting tier
    // (new_type), one new key — stamped through the JOIN path
    DriftMonitor.ingest(spark, dir, DriftMonitor.profileBatch(
      Seq((1, """{"w0": 7, "w1": "now-a-string", "fresh": 1}"""))
        .toDF("epoch", "js")
        .select(col("epoch"), parse_json(col("js")).as("v"))), 1L,
      maxSeenPairs = 5)
    val got = DriftMonitor.monitor(spark, dir)
      .filter(col("epoch") === 1)
      .select(col("key"), col("status")).as[(String, String)].collect().toSet
    assert(got == Set("w0" -> "steady", "w1" -> "new_type",
      "fresh" -> "new_key"))
  }
}
