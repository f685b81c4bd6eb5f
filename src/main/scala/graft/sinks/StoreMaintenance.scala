package graft.sinks

import org.apache.spark.sql.SparkSession

/** One-call maintenance for a store table AND its sidecar artifacts —
  * the lifecycle operation a long-running apply loop schedules at
  * micro-batch boundaries (the quiesce contract
  * IndexMaintenanceStreamSpec pins). Running the pieces by hand invites
  * exactly the ordering bugs the individual scaladocs warn about; this
  * fixes the order once:
  *
  *   1. [[ParquetUpsertStore.compact]] — fold buckets and tombstones;
  *      the snapshot at `asBatch` is now the folded truth every
  *      artifact rebuild below reads.
  *   2. [[SecondaryIndex.compact]] per indexed column — postings
  *      rebuilt from that snapshot (zero false positives until the
  *      next append); postings of batches above `asBatch` are carried,
  *      so an indexed-but-unapplied in-flight batch survives.
  *   3. [[KeyBloom.compact]] — one snapshot bloom sized to the live
  *      count replaces the per-batch bloom log at or below `asBatch`.
  *   4. [[ParquetUpsertStore.vacuum]] (opt-in) — history drops LAST,
  *      after nothing above still references it.
  *
  * Shared contract inherited from the pieces: run past the streaming
  * checkpoint's replay horizon (tombstone folding) and only between
  * foreachBatch invocations; time travel below `asBatch` is collapsed
  * afterwards (the artifacts' read paths detect that and degrade to
  * unpruned reads rather than lie). Each step is individually
  * crash-safe — a crash mid-run leaves a working table and working
  * artifacts, and re-running the same maintenance completes it.
  */
object StoreMaintenance {

  /** @param indexColumns the values columns with [[SecondaryIndex]]
    *   postings to rebuild (empty = none)
    * @param asBatch the LAST COMMITTED batch id (a replace-commit,
    *   [[ParquetUpsertStore.compact]]'s convention)
    * @param vacuumRetainBatches when ≥ 0, vacuum to
    *   `asBatch - retain` after the folds — bounds manifest count and
    *   storage at the cost of time travel older than `retain` batches */
  def run(spark: SparkSession, store: ParquetUpsertStore, root: String,
          table: String, indexColumns: Seq[String], asBatch: Long,
          vacuumRetainBatches: Long = -1L): Unit = {
    store.compact(spark, table, asBatch)
    indexColumns.foreach(c =>
      SecondaryIndex.compact(spark, store, root, table, c, asBatch))
    KeyBloom.compact(spark, store, root, table, asBatch)
    if (vacuumRetainBatches >= 0L)
      store.vacuum(spark, table, keepFromBatchId = asBatch - vacuumRetainBatches)
  }
}
