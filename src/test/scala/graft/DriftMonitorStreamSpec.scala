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
}
