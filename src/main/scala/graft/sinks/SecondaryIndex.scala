package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Append-only SECONDARY INDEX over a [[ParquetUpsertStore]] table: a
  * value-partitioned postings table `value → row_key` for one envelope
  * values column, maintained per applied batch, so a selective
  * predicate on a NON-key column answers by point lookups instead of a
  * table scan (the store's own pruning only understands `row_key`).
  *
  * Soundness model — postings are a SUPERSET of the truth, verified at
  * read time:
  *   - no false negatives: a live row whose column currently equals v
  *     was upserted WITH v by some batch at or before the read horizon,
  *     and that batch indexed it;
  *   - false positives (keys that later changed value, died, or were
  *     superseded inside their own batch) survive in the postings but
  *     are pruned by re-verifying the predicate against the store's
  *     LIVE values after the point lookup — never a wrong answer.
  * DELETEs therefore need no index maintenance at all, and a
  * redelivered batch (at-least-once streams) merely appends duplicate
  * postings that the lookup's DISTINCT collapses — the same replay
  * posture as the store itself.
  *
  * Layout: `<root>/__index/<table>/<column>/v=<value>/...` — a sibling
  * of the table directories, invisible to the store's manifest readers
  * and to [[ParquetUpsertStore.vacuum]] (which touches only
  * `manifest-*`/`snap-*` entries). Value-partitioning turns the lookup
  * into one pruned directory read at any table size.
  */
object SecondaryIndex {

  private def safe(s: String): String = s.replaceAll("[^A-Za-z0-9._-]", "_")

  private[graft] def indexDir(root: String, table: String,
                              column: String): String =
    s"$root/__index/${safe(table)}/${safe(column)}"

  /** Index the envelope batch applied (or about to be applied) as
    * `batchId`: one posting `(row_key, batch, v)` per non-DELETE DML
    * row of `table` whose values carry a non-null `column`. Rows
    * missing the column contribute nothing — a null value is not an
    * indexable predicate target. One pass over the batch, partitioned
    * write, no read of existing postings or store state.
    *
    * ORDERING CONTRACT: index BEFORE applying the batch to the store.
    * A crash between the two steps then leaves postings for rows the
    * store never got — harmless false positives the lookup's live
    * re-verification prunes (the keys simply aren't live with that
    * value). The reverse order turns the same crash into MISSING
    * postings: permanent false negatives no read-time check can see.
    * SecondaryIndexSpec pins the index-ahead-of-store case. */
  def indexBatch(root: String, table: String, column: String,
                 batch: DataFrame, batchId: Long): Unit =
    UpsertSink.dmlProjection(batch)
      .filter(col("table") === table)
      .filter(col("op") =!= graft.model.OpType.Delete)
      .select(col("row_key"), lit(batchId).as("batch"),
        try_element_at(col("values"), lit(column)).as("v"))
      .filter(col("v").isNotNull)
      .write.mode("append").partitionBy("v")
      .parquet(indexDir(root, table, column))

  /** Live rows whose CURRENT `column` value equals `v`, index-first:
    * read the one postings partition for `v` (directory-pruned, and
    * batch-bounded under time travel), collect the DISTINCT candidate
    * keys, point-look the store (min(keys, buckets) bucket reads, the
    * pushed `row_key IN` filter), and re-verify the predicate against
    * the live values. The candidate collect is the index's contract:
    * secondary lookups are for SELECTIVE values — `maxKeys` fails
    * loudly past the bound rather than silently shipping a data-sized
    * driver collect (a value matching half the table wants the
    * snapshot-filter plan instead, stated in the error). */
  def lookupByValue(spark: SparkSession, store: ParquetUpsertStore,
                    root: String, table: String, column: String, v: String,
                    atOrBefore: Option[Long] = None,
                    maxKeys: Int = 100000): DataFrame = {
    val posts = spark.read.parquet(indexDir(root, table, column))
      .filter(col("v") === v)
    val horizon = atOrBefore.fold(posts)(h => posts.filter(col("batch") <= h))
    val keys = horizon.select(col("row_key")).distinct()
      .limit(maxKeys + 1).collect().map(_.getString(0)).toSeq.sorted
    require(keys.length <= maxKeys,
      s"SecondaryIndex: value '$v' of '$table.$column' matches more than " +
        s"$maxKeys candidate keys — too popular for an index-first point " +
        "lookup; filter the snapshot instead")
    store.lookup(spark, table, keys, atOrBefore)
      .filter(try_element_at(col("values"), lit(column)) === v)
  }

  /** Compact the postings log: rebuild it from the LIVE snapshot as of
    * `asBatch` — one linear store scan replacing the whole append
    * history, after which every posting is current (zero false
    * positives until the next append) and the log stops growing with
    * batch count. The vs27 tombstone-compaction posture: amortized
    * maintenance, identical answers before and after (the lookup's
    * re-verification makes compaction invisible to correctness —
    * SecondaryIndexSpec pins it). Like [[ParquetUpsertStore.compact]],
    * this collapses HISTORY: every rebuilt posting carries `asBatch`,
    * so `lookupByValue(atOrBefore = t)` for t < asBatch finds no
    * postings afterwards — time travel below the compaction point is
    * unsupported, the store's own documented compaction contract.
    * Swap is write-new/delete-old/rename:
    * a crash between steps leaves either the old intact log or a
    * complete new one (plus, at worst, an orphaned tmp dir the next
    * compaction overwrites), never a half-truncated index. */
  def compact(spark: SparkSession, store: ParquetUpsertStore,
              root: String, table: String, column: String,
              asBatch: Long): Unit = {
    val dir = indexDir(root, table, column)
    val tmp = dir + ".compact-tmp"
    store.snapshotAt(spark, table, asBatch)
      .select(col("row_key"), lit(asBatch).as("batch"),
        try_element_at(col("values"), lit(column)).as("v"))
      .filter(col("v").isNotNull)
      .write.mode("overwrite").partitionBy("v").parquet(tmp)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp),
      new org.apache.hadoop.fs.Path(dir))
  }
}
