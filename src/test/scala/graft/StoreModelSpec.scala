package graft

import graft.model._
import graft.sinks.ParquetUpsertStore
import org.apache.spark.sql.types._

/** Model-based randomized testing of the durable store: a seeded random
  * interleaving of batches, replays, compactions, rebuckets and vacuums
  * is checked after EVERY operation against a trivial in-memory
  * reference model (latest-version-wins map with tombstone filtering).
  * The single-phase specs each pin one operation; this catches
  * interactions between them — a compaction breaking a later rebucket,
  * a vacuum disturbing the next batch's merge base, a replay after any
  * of the above — across orderings nobody thought to write down. */
class StoreModelSpec extends SparkSuite {
  import spark.implicits._

  private val s1 = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  private def dml(op: String, version: Long, id: Long, v: String) =
    ChangeRecord.ofDml(Dml(op, "dbo.t", Seq("id"),
      s1.json, Map("id" -> id.toString, "v" -> v), version.toString, 0L))

  private def visible(store: ParquetUpsertStore): Map[String, (String, Long)] =
    store.snapshot(spark, "dbo.t").collect()
      .map(r => r.getString(0) -> (r.getMap[String, String](2)("v"), r.getLong(3)))
      .toMap

  test("random op interleavings converge to the reference model after every step") {
    for (seed <- Seq(11, 97)) {
      val rnd = new scala.util.Random(seed)
      val store = new ParquetUpsertStore(checkpointDir(s"model-$seed"),
        numBuckets = 4)
      // reference: key -> (latest op, value, version); visible = op != D
      var model = Map.empty[Long, (String, String, Long)]
      var version = 0L
      var batchId = -1L
      var lastBatch: Option[(Seq[ChangeRecord], Long)] = None
      val ops = Array(OpType.Insert, OpType.Update, OpType.Delete)

      def applyRandomBatch(): Unit = {
        batchId += 1
        val recs = (1 to (1 + rnd.nextInt(6))).map { _ =>
          version += 1
          val id = rnd.nextInt(12).toLong
          val op = ops(rnd.nextInt(3))
          val v = s"s$seed-v$version"
          model += id -> (op, v, version)
          dml(op, version, id, v)
        }
        store.applyBatch(spark.createDataset(recs).toDF(), batchId)
        lastBatch = Some((recs, batchId))
      }

      applyRandomBatch() // seed the table before the mixed phase
      for (step <- 1 to 14) {
        rnd.nextInt(6) match {
          case 0 | 1 | 2 => applyRandomBatch()
          case 3 => // at-least-once replay of the newest batch
            lastBatch.foreach { case (recs, id) =>
              store.applyBatch(spark.createDataset(recs).toDF(), id)
            }
          case 4 =>
            if (rnd.nextBoolean()) store.compact(spark, "dbo.t", batchId)
            else store.rebucket(spark, "dbo.t",
              newNumBuckets = 2 + rnd.nextInt(6), asBatchId = batchId)
          case 5 =>
            store.vacuum(spark, "dbo.t", keepFromBatchId = batchId - 1)
        }
        val expected = model.collect {
          case (id, (op, v, ver)) if op != OpType.Delete =>
            id.toString -> (v, ver)
        }
        assert(visible(store) == expected,
          s"seed $seed diverged from the model after step $step")
      }
    }
  }
}
