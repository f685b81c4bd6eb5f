package graft

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** One incoming crawl document. Top-level so the product encoder has no
  * outer pointer. */
case class StreamDoc(doc_id: Long, text: String)

/** ns49's continuous-ingest shape actually run CONTINUOUSLY: the history
  * LSH index is built once and persisted to parquet (the banded form the
  * operator's doc calls "the persistable index"), then the increment
  * arrives as a MemoryStream in several micro-batches, each probing the
  * RELOADED index via the same asymmetric band join through foreachBatch.
  * The union of per-micro-batch flags must equal the one-shot batch
  * operator's on the same increment — per-new-doc flags depend only on
  * (doc, history), so micro-batch boundaries must be invisible. ns49
  * itself is unchanged; this pins the streaming twin. */
class IncrementalDedupStreamSpec extends SparkSuite {
  import spark.implicits._

  test("micro-batched increments against the persisted index equal the batch flags") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val hist = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
    val batch = docs.filter(pmod(col("doc_id"), lit(10)) === 0)

    // build once, persist, reload — the index artifact lifecycle
    val dir = checkpointDir("inc-dedup-index")
    val (hHashed, hBanded) = Dedup.buildLshIndex(hist, "doc_id", "text")
    hHashed.write.mode("overwrite").parquet(s"$dir/hashed")
    hBanded.write.mode("overwrite").parquet(s"$dir/banded")
    val lh = spark.read.parquet(s"$dir/hashed")
    val lb = spark.read.parquet(s"$dir/banded")

    def pairSet(df: DataFrame): Set[(Long, Long, Double)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = pairSet(
      Dedup.incrementalNearDups(hist, batch, "doc_id", "text"))

    implicit val ctx = spark.sqlContext
    val in = MemoryStream[StreamDoc]
    val outDir = checkpointDir("inc-dedup-out")
    val q = in.toDF().writeStream
      .option("checkpointLocation", checkpointDir("inc-dedup-ckpt"))
      .foreachBatch { (b: DataFrame, _: Long) =>
        Dedup.incrementalNearDupsIndexed(lh, lb, b, "doc_id", "text")
          .write.mode("append").parquet(outDir)
      }.start()
    val rows = batch.select("doc_id", "text").as[StreamDoc]
      .collect().sortBy(_.doc_id)
    rows.grouped(math.max(1, rows.length / 3 + 1)).foreach { g =>
      in.addData(g.toSeq: _*)
      q.processAllAvailable()
    }
    q.stop()

    val got = pairSet(spark.read.parquet(outDir))
    assert(got.nonEmpty, "fixture must flag at least one cross duplicate")
    assert(got == want,
      s"stream flags diverge from batch: extra=${got -- want} missing=${want -- got}")
  }
}
