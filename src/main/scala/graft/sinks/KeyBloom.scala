package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Per-batch KEY BLOOM FILTERS over a [[ParquetUpsertStore]] table —
  * the miss fast path every LSM-shaped store ships (HBase/Kudu bloom
  * blocks, which is where the reference's sinks get theirs): a point
  * lookup for a key that was NEVER written can be answered from a few
  * kilobytes of bloom bytes without opening a single bucket directory.
  *
  * One bloom per applied batch over that batch's `row_key`s (DELETEs
  * included — a deleted key EXISTS in the log, so it must pass to the
  * real lookup, which then correctly returns nothing). A key absent
  * from EVERY batch bloom was never written at all — a definite miss
  * by the bloom's no-false-negative guarantee; false positives just
  * take the normal lookup path. The artifact is one small file per
  * batch under `<root>/__bloom/<table>/` — invisible to the store's
  * manifest readers and vacuum, the [[SecondaryIndex]] layout
  * discipline, and the same ORDERING CONTRACT: write the bloom BEFORE
  * applying the batch, so a crash between the steps leaves an extra
  * bloom (false positives only), never a missing one (permanent false
  * negatives).
  */
object KeyBloom {

  private def safe(s: String): String = s.replaceAll("[^A-Za-z0-9._-]", "_")

  private[graft] def bloomDir(root: String, table: String): String =
    s"$root/__bloom/${safe(table)}"

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Build and persist the bloom for the batch applied (or about to be
    * applied) as `batchId`: one pass over the batch's DML rows of
    * `table`. Sizing is per batch (`expectedItems`, `fpp`) — blooms of
    * different batches never merge, so each file carries its own
    * parameters. Rewrites the same batch id idempotently (replay-safe:
    * same rows → same bloom). */
  def addBatch(spark: SparkSession, root: String, table: String,
               batch: DataFrame, batchId: Long,
               expectedItems: Long = 1000000L, fpp: Double = 0.01): Unit = {
    val bf = UpsertSink.dmlProjection(batch)
      .filter(col("table") === table)
      .stat.bloomFilter("row_key", expectedItems, fpp)
    val f = fs(spark, root)
    val dir = new Path(bloomDir(root, table))
    f.mkdirs(dir)
    val out = f.create(new Path(dir, s"batch-$batchId.bloom"), true)
    try bf.writeTo(out) finally out.close()
  }

  /** The subset of `keys` that MIGHT exist in the table — keys absent
    * from every batch bloom are definite misses and are dropped here,
    * before any bucket directory is opened. No blooms at all (never
    * built) means no pruning: every key passes through. The bloom
    * files are metadata-sized driver reads (the centroid-collect
    * posture), never a scan. */
  def filterPresent(spark: SparkSession, root: String, table: String,
                    keys: Seq[String]): Seq[String] = {
    val f = fs(spark, root)
    val dir = new Path(bloomDir(root, table))
    val blooms =
      try f.listStatus(dir).toSeq.filter(_.getPath.getName.endsWith(".bloom"))
        .map { st =>
          val in = f.open(st.getPath)
          try BloomFilter.readFrom(in) finally in.close()
        }
      catch { case _: java.io.FileNotFoundException => return keys }
    if (blooms.isEmpty) keys
    else keys.filter(k => blooms.exists(_.mightContainString(k)))
  }

  /** [[ParquetUpsertStore.lookup]] behind the miss fast path. */
  def lookup(spark: SparkSession, store: ParquetUpsertStore, root: String,
             table: String, keys: Seq[String],
             atOrBefore: Option[Long] = None): DataFrame =
    store.lookup(spark, table, filterPresent(spark, root, table, keys),
      atOrBefore)
}
