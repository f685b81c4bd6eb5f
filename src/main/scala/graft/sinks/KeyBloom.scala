package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
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
  *
  * The per-batch log does not grow forever: [[compact]] folds every
  * bloom at or below a chosen batch id into ONE bloom built from the
  * live snapshot's keys (sized to the live count) — the HFile posture,
  * where bloom blocks compact with their store files. After it the
  * read side opens 1 + batches-since-compaction files, not O(batches).
  *
  * Pruning soundness does not rest on callers never forgetting a
  * bloom: [[filterPresent]] cross-checks the bloom set against the
  * table's committed manifests and disables itself (returns all keys)
  * whenever ANY committed batch lacks coverage — partial adoption or a
  * swallowed [[addBatch]] failure degrades to no pruning, never to a
  * silent false negative. The next [[compact]] restores coverage, since
  * the snapshot bloom covers every batch at or below its id.
  */
object KeyBloom {

  private def safe(s: String): String = s.replaceAll("[^A-Za-z0-9._-]", "_")

  private[graft] def bloomDir(root: String, table: String): String =
    s"$root/__bloom/${safe(table)}"

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val BatchName = "batch-(\\d+)\\.bloom".r
  private val SnapName = "snapshot-(\\d+)\\.bloom".r

  private def writeBloom(f: FileSystem, dir: Path, name: String,
                         bf: BloomFilter): Unit = {
    f.mkdirs(dir)
    // tmp + rename: a reader never sees a torn bloom file, and a crash
    // mid-write leaves only a `.tmp` the listers below ignore.
    val tmp = new Path(dir, s".$name.tmp")
    val out = f.create(tmp, true)
    try bf.writeTo(out) finally out.close()
    val target = new Path(dir, name)
    f.delete(target, false) // idempotent rewrite of the same id
    if (!f.rename(tmp, target))
      throw new java.io.IOException(s"KeyBloom: rename $tmp -> $target failed")
  }

  private def readBloom(f: FileSystem, p: Path): BloomFilter = {
    val in = f.open(p)
    try BloomFilter.readFrom(in) finally in.close()
  }

  /** Build and persist the bloom for the batch applied (or about to be
    * applied) as `batchId`: one pass over the batch's DML rows of
    * `table`. Sized to the batch's ACTUAL key count by default (one
    * cheap count on the pruned projection) — a fixed sizing would
    * allocate the same ~MB file for a 10-row micro-batch as for a
    * 1M-row backfill; pass `expectedItems` to override. Blooms of
    * different batches never merge, so each file carries its own
    * parameters. Rewrites the same batch id idempotently (replay-safe:
    * same rows → same count → same bloom). */
  def addBatch(spark: SparkSession, root: String, table: String,
               batch: DataFrame, batchId: Long,
               expectedItems: Long = -1L, fpp: Double = 0.01): Unit = {
    val proj = UpsertSink.dmlProjection(batch)
      .filter(col("table") === table)
      .select(col("row_key"))
    val n = if (expectedItems > 0) expectedItems
      else math.max(graft.Label.job(spark, s"bloom.size $table b=$batchId")(
        proj.count()), 1L)
    val bf = graft.Label.job(spark, s"bloom.build $table b=$batchId")(
      proj.stat.bloomFilter("row_key", n, fpp))
    writeBloom(fs(spark, root), new Path(bloomDir(root, table)),
      s"batch-$batchId.bloom", bf)
  }

  /** Fold the bloom log: build ONE bloom from the LIVE snapshot's keys
    * as of `asBatch` (sized to the live count), then drop every file it
    * supersedes — batch blooms with id ≤ `asBatch` and older snapshot
    * blooms. Crash-safe in the artifact direction that matters: the
    * snapshot bloom commits first (tmp + rename), the deletes run
    * after, so any crash leaves EXTRA blooms (false positives only),
    * never a coverage hole. Like [[ParquetUpsertStore.compact]] this
    * collapses history — keys whose every row was tombstoned by
    * `asBatch` leave the bloom, so time-travel lookups below the
    * snapshot bloom's id can no longer be pruned; [[filterPresent]]
    * detects that case and passes keys through unpruned. Run it
    * aligned with the store's own compaction cadence. */
  def compact(spark: SparkSession, store: ParquetUpsertStore, root: String,
              table: String, asBatch: Long, fpp: Double = 0.01): Unit = {
    // persist: two consumers (sizing count + bloom build) of one key
    // projection — without it the snapshot's bucket merge runs twice
    val live = store.snapshotAt(spark, table, asBatch).select(col("row_key"))
      .persist()
    val bf =
      try {
        val n = math.max(live.count(), 1L)
        live.stat.bloomFilter("row_key", n, fpp)
      } finally live.unpersist()
    val f = fs(spark, root)
    val dir = new Path(bloomDir(root, table))
    writeBloom(f, dir, s"snapshot-$asBatch.bloom", bf)
    f.listStatus(dir).map(_.getPath).foreach { p =>
      p.getName match {
        case BatchName(id) if id.toLong <= asBatch => f.delete(p, false)
        case SnapName(id) if id.toLong < asBatch => f.delete(p, false)
        case _ => ()
      }
    }
  }

  /** The subset of `keys` that MIGHT exist in the table — keys absent
    * from the newest snapshot bloom and every later batch bloom are
    * definite misses and are dropped here, before any bucket directory
    * is opened. Pruning disables itself (all keys pass) whenever it
    * cannot be sound: no blooms built at all, a committed batch with no
    * covering bloom (the manifest cross-check), or a time-travel read
    * below the snapshot bloom's id (whose folded-out tombstoned keys
    * may have been live then). The bloom files are metadata-sized
    * driver reads (the centroid-collect posture), never a scan. */
  def filterPresent(spark: SparkSession, root: String, table: String,
                    keys: Seq[String],
                    atOrBefore: Option[Long] = None): Seq[String] = {
    val f = fs(spark, root)
    val dir = new Path(bloomDir(root, table))
    val names =
      try f.listStatus(dir).toSeq.map(_.getPath.getName)
      catch { case _: java.io.FileNotFoundException => return keys }
    val batchIds = names.collect { case BatchName(id) => id.toLong }.toSet
    val snapId = names.collect { case SnapName(id) => id.toLong }
      .foldLeft(Option.empty[Long])((a, v) => Some(a.fold(v)(math.max(_, v))))
    if (batchIds.isEmpty && snapId.isEmpty) return keys
    // history collapsed past the read horizon → pruning can't be sound
    if (atOrBefore.exists(h => snapId.exists(h < _))) return keys
    // manifest cross-check: every committed batch must be covered by the
    // snapshot bloom or its own batch bloom, else pruning is OFF.
    val tdir = ParquetUpsertStore.tableDir(root, table)
    val committed = ParquetUpsertStore.committedManifestIds(f, tdir)
    val covered = (id: Long) =>
      snapId.exists(id <= _) || batchIds.contains(id)
    if (committed.exists(!covered(_))) return keys
    // The cross-check only sees SURVIVING manifests: once vacuum has run
    // (floor armed), batches below the floor are unlistable, so their
    // coverage can only be vouched for by a snapshot bloom at or above
    // the floor — without one, a key live from a vacuumed-away batch
    // could be in no bloom at all (the permanent false negative the
    // cross-check exists to prevent). StoreMaintenance.run's ordering
    // (bloom compact before vacuum) always satisfies this; a direct
    // vacuum call degrades to no pruning until the next compact.
    val floor = ParquetUpsertStore.readFloor(f, tdir)
    if (floor != Long.MinValue && !snapId.exists(_ >= floor)) return keys
    val useful = names.filter {
      case BatchName(id) => snapId.forall(id.toLong > _)
      case n => snapId.exists(s => n == s"snapshot-$s.bloom")
    }
    // A file listed a moment ago may be gone by the read (a concurrent
    // compaction's superseding deletes). Losing ANY bloom loses
    // coverage, so the only sound degradation is no pruning at all —
    // the next lookup sees the post-compaction set and prunes again.
    val blooms =
      try useful.map(n => readBloom(f, new Path(dir, n)))
      catch { case _: java.io.IOException => return keys }
    keys.filter(k => blooms.exists(_.mightContainString(k)))
  }

  /** [[ParquetUpsertStore.lookup]] behind the miss fast path. */
  def lookup(spark: SparkSession, store: ParquetUpsertStore, root: String,
             table: String, keys: Seq[String],
             atOrBefore: Option[Long] = None): DataFrame =
    store.lookup(spark, table,
      filterPresent(spark, root, table, keys, atOrBefore), atOrBefore)
}
