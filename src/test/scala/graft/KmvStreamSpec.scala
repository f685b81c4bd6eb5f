package graft

import graft.functions.KmvSketchAgg
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** One change-feed key observation. Top-level so the product encoder
  * has no outer pointer. */
case class StreamKey(user_id: Long)

/** cdc32's artifact lifecycle actually run CONTINUOUSLY: the change
  * feed arrives as a MemoryStream in several micro-batches, each
  * reduced to ONE persisted KMV sketch row by foreachBatch (the
  * k-bounded per-batch agg — no history is read while writing), and
  * the merged artifact must equal the monolithic sketch of every key
  * ever seen, exactly — the KMV merge keeps any value some input kept
  * among its k minima, so micro-batch boundaries are invisible. The
  * estimate a monitor reads off the merged row is therefore identical
  * to what a from-scratch scan would produce, at any batch cadence. */
class KmvStreamSpec extends SparkSuite {
  import spark.implicits._

  private val k = 8 // sf0.001 events carry 15 distinct user_ids — k below that

  private def sketchOf(df: DataFrame): Seq[Long] = {
    val h = graft.functions.TextFunctions.portableHash(
      col("user_id").cast("string"))
    df.select(h.as("h"))
      .agg(KmvSketchAgg.kMinValues(col("h"), k).as("sk"))
      .head().getSeq[Long](0)
  }

  test("per-micro-batch sketch rows merge to the monolithic sketch exactly") {
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
      .select(col("user_id")).na.drop()
    val want = sketchOf(ev)
    assert(want.length == k, "fixture must have more distinct keys than k")

    implicit val ctx = spark.sqlContext
    val in = MemoryStream[StreamKey]
    val artDir = checkpointDir("kmv-artifact")
    val q = in.toDF().writeStream
      .option("checkpointLocation", checkpointDir("kmv-ckpt"))
      .foreachBatch { (b: DataFrame, id: Long) =>
        val h = graft.functions.TextFunctions.portableHash(
          col("user_id").cast("string"))
        b.select(h.as("h"))
          .agg(KmvSketchAgg.kMinValues(col("h"), k).as("sk"))
          .select(lit(id).as("batch"), col("sk"))
          .write.mode("append").parquet(artDir)
      }.start()
    val rows = ev.as[StreamKey].collect().sortBy(_.user_id)
    rows.grouped(math.max(1, rows.length / 4 + 1)).foreach { g =>
      in.addData(g.toSeq: _*)
      q.processAllAvailable()
    }
    q.stop()

    val art = spark.read.parquet(artDir)
    assert(art.count() >= 4, "one artifact row per non-empty micro-batch")
    val merged = art.select(explode(col("sk")).as("h"))
      .agg(KmvSketchAgg.kMinValues(col("h"), k).as("sk"))
      .head().getSeq[Long](0)
    assert(merged == want,
      s"merged artifact diverges from monolithic: $merged vs $want")
    // Each per-batch row is itself k-bounded — the artifact grows with
    // the number of batches, never with the data.
    art.select(size(col("sk")).as("n")).collect()
      .foreach(r => assert(r.getInt(0) <= k))

    // At-least-once tolerance: a replayed foreachBatch append leaves
    // DUPLICATE sketch rows in the artifact, and the merge must not
    // care — re-sketching a multiset of kept minima deduplicates by
    // construction (k smallest DISTINCT values), so redelivery can
    // never corrupt the estimate.
    val withDupes = art.unionByName(art)
      .select(explode(col("sk")).as("h"))
      .agg(KmvSketchAgg.kMinValues(col("h"), k).as("sk"))
      .head().getSeq[Long](0)
    assert(withDupes == want,
      "duplicate artifact rows (redelivery) perturbed the merged sketch")
  }
}
