package graft.sinks

import graft.operators.CdcApply
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets.UTF_8

/** Durable, cluster-valid CDC target: one bucket-partitioned,
  * copy-on-write parquet table per CDC table, committed through a
  * manifest log.
  *
  * This is the missing concrete sink behind [[CdcWriter]]'s semantics
  * (reference sink/CDCKudu.java:139-184, sink/CDCTableUtil.java:57-96:
  * create-if-absent, alter on DDL, put-all-columns on I/U, delete on D) —
  * but expressed for Spark's execution model instead of a row-at-a-time
  * client:
  *
  *   - Rows live as `(row_key, op, values map<string,string>, version)`
  *     parquet partitioned by `bucket = pmod(hash(row_key), numBuckets)`.
  *   - Each micro-batch is compacted to the latest change per key
  *     ([[CdcApply.latestByKey]] — one hash shuffle), merged against ONLY
  *     the buckets it touches (partition-pruned read), and written as a
  *     new snapshot directory `snap-<batchId>` holding just those buckets.
  *   - A `manifest-<batchId>` file maps every bucket to the snapshot
  *     directory holding its current data. Readers take the highest
  *     manifest id; writers commit with an atomic rename — the same
  *     log-then-pointer protocol Delta/Iceberg use, at bucket granularity.
  *
  * 100 TB story: per-batch work is proportional to the buckets touched by
  * the batch, not to table size — a 1k-row batch against a 100 TB table
  * rewrites at most `min(rows, numBuckets)` buckets (`numBuckets` sized so
  * a bucket is a few GB). DELETEs are retained as tombstones so replayed
  * or out-of-order batches can never resurrect a deleted row (max-version
  * wins); [[compact]] folds tombstones out once they are past the
  * checkpoint replay horizon. Replaying a batch id is idempotent: it
  * rewrites the same snapshot directory and re-commits the same manifest.
  *
  * Schema evolution (reference CDCKudu.java:78-137) is metadata-only here:
  * the live values travel as the envelope's map<string,string>, so a DDL
  * add/drop updates the schema recorded in the manifest without touching
  * data files — strictly cheaper than the reference's alter-and-flush.
  *
  * Concurrency contract: ONE writer per table — the streaming sink's
  * micro-batch sequence (this matches the reference, whose sinks are fed
  * by a single streaming query). Replays of the same batch id from any
  * number of restarts are safe (idempotent commit, failed rename = noop),
  * but two LIVE writers interleaving different batch ids could each merge
  * against a base missing the other's commit — the store has no
  * optimistic-conflict retry. Readers need no coordination at any
  * parallelism: they see the highest committed manifest atomically.
  */
/** @param autoCompactManifests when > 0, a batch whose commit leaves more
  *   than this many manifests triggers a compaction at the just-committed
  *   batch id (folds the data working set; history manifests remain).
  * @param autoVacuumRetainBatches when ≥ 0 (and auto-compact fired),
  *   vacuum to `batchId - retain` right after the compaction — bounds
  *   manifest count AND storage at the cost of time travel older than
  *   `retain` batches. Keep it comfortably past the streaming
  *   checkpoint's replay horizon (any committed-batch replay is already
  *   shadowed by max-id reads; vacuum only deletes what no retained
  *   manifest references). */
class ParquetUpsertStore(root: String, numBuckets: Int = 16,
                         autoCompactManifests: Int = 0,
                         autoVacuumRetainBatches: Int = -1) extends Serializable {
  import ParquetUpsertStore._

  private def tableDir(table: String): String =
    ParquetUpsertStore.tableDir(root, table)

  /** Fault-injection seam (crash-consistency testing): applied to the
    * merged batch just before its parquet write. A test subclass can
    * make a task throw after N rows — the on-disk state is then exactly
    * what a mid-write executor crash leaves (uncommitted `_temporary`
    * junk, no manifest). Production no-op. */
  protected def instrumentMerged(table: String, batchId: Long,
                                 df: DataFrame): DataFrame = df

  /** Fault-injection seam: invoked after the batch's snapshot directory
    * is fully written but BEFORE the manifest commit — the other
    * crash window (data durable, commit missing). Production no-op. */
  protected def beforeCommit(table: String, batchId: Long): Unit = ()

  /** Apply one envelope micro-batch (DDL first, then compacted DML). */
  def applyBatch(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    batch.persist()
    try {
      // --- DDL phase (driver-side; at most one row per table per batch)
      // and table discovery, as ONE job: the former separate
      // ddl-collect + dml-distinct-collect cost two full passes over the
      // persisted batch per apply (a streaming sink pays them per
      // micro-batch). collect_list/collect_set skip the nulls the
      // `when` guards produce, so one aggregation yields both. ---
      val head = graft.Label.job(spark, s"store.head-agg b=$batchId")(
        batch.agg(
          collect_list(when(col("ddl").isNotNull,
            struct(col("ddl.table"), col("ddl.schemaJson")))).as("ddls"),
          collect_set(when(col("dml").isNotNull, col("dml.table"))).as("tables"))
          .collect()(0))
      val ddlSchemas: Map[String, StructType] =
        head.getSeq[org.apache.spark.sql.Row](0).map { r =>
          r.getString(0) -> DataType.fromJson(r.getString(1)).asInstanceOf[StructType]
        }.toMap

      // --- DML phase: one latest-per-key merge per table ---
      val dml = UpsertSink.dmlProjection(batch)
      val tables = (head.getSeq[String](1) ++ ddlSchemas.keys).distinct

      // Tables are independent (own manifest, own snapshot dirs, own
      // slice of the persisted batch), so their merge jobs run
      // CONCURRENTLY: a multi-table batch's latency is the slowest
      // table's, not the sum — the reference's sequential per-table loop
      // (CTInputDStream.java:124-133) made batch time grow linearly with
      // table count. Bounded pool; Spark's scheduler interleaves jobs.
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.max(1, math.min(tables.length, 8)))
      try {
        import scala.concurrent.{Await, ExecutionContext, Future}
        import scala.concurrent.duration.Duration
        implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
        Await.result(
          Future.sequence(tables.toSeq.map(t => Future(applyTable(
            spark, dml, ddlSchemas, t, batchId)))),
          Duration.Inf)
      } finally pool.shutdown()
    } finally batch.unpersist()
  }

  /** Apply rows ALREADY in the store's projected change shape
    * (`row_key, op, values, version` — exactly what a snapshot read
    * returns) as one change batch of `table`: the SQL INSERT face
    * ([[graft.sources.UpsertRelation.insert]]), and the programmatic
    * shortcut for callers that don't speak the DDL/DML envelope. Same
    * within-batch compaction, merge, and manifest commit as
    * [[applyBatch]] (single table, no DDL phase). */
  def applyProjected(rows: DataFrame, table: String, batchId: Long): Unit = {
    // persist-the-batch: applyTable executes its input in two separate
    // jobs (touched-bucket collect, then the merged write) — a
    // non-deterministic source (INSERT INTO ... SELECT ... LIMIT) must
    // not produce different rows per job, or rows land in buckets the
    // manifest never references (applyBatch guards the same way)
    val dml = rows.select(lit(table).as("table"), col("op"),
      col("row_key"), col("values"), col("version").cast("long"))
      .persist()
    try applyTable(rows.sparkSession, dml, Map.empty, table, batchId)
    finally dml.unpersist()
  }

  /** The batch id a NEW apply should commit at: one past the newest
    * committed manifest (0 for a fresh table) — the auto-increment the
    * SQL INSERT face uses, where no streaming checkpoint hands out ids. */
  def nextBatchId(spark: SparkSession, table: String): Long =
    maxManifestId(fileSystem(spark, root), tableDir(table)).fold(0L)(_ + 1L)

  private def applyTable(spark: SparkSession, dml: DataFrame,
                     ddlSchemas: Map[String, StructType],
                     t: String, batchId: Long): Unit = {
    val fs = fileSystem(spark, root)
    val tdir = tableDir(t)
    // Refuse to re-apply a batch below the newest commit: a replay of a
    // committed id is already shadowed by max-id readers, and if vacuum
    // dropped its manifest, re-creating one on top of the CURRENT mapping
    // would make time travel at that id return anachronistic data. The
    // streaming checkpoint only ever replays the newest uncommitted-or-
    // equal id, so this guard costs nothing on the normal path.
    if (maxManifestId(fs, tdir).exists(batchId < _)) {
      // Observable for a direct programmatic caller committing out of
      // order — for them this drop is data loss, not a harmless replay.
      System.err.println(s"ParquetUpsertStore: skipping batch $batchId for " +
        s"table '$t' — a newer batch is already committed (replay shadowed); " +
        "direct callers must commit monotonically increasing batch ids")
      return
    }
    val cur = readManifest(fs, tdir)
    val nb = cur.map(_.numBuckets).getOrElse(numBuckets)

    // evolve the recorded schema on DDL (metadata-only alter)
    val schemaJson: Option[String] = ddlSchemas.get(t) match {
      case Some(target) =>
        val evolved = cur.flatMap(_.schemaJson)
          .map(j => DataType.fromJson(j).asInstanceOf[StructType]) match {
          case None => target
          case Some(live) =>
            val d = SchemaEvolution.diff(live, target)
            if (d.isEmpty) live
            else StructType(live.fields.filterNot(f =>
              d.dropped.exists(_.equalsIgnoreCase(f.name))) ++ d.added)
        }
        Some(evolved.json)
      case None => cur.flatMap(_.schemaJson)
    }

    // Bucket with the MANIFEST's bucket count, not the constructor's:
    // a store handle opened with a different `numBuckets` must keep
    // writing buckets consistent with the table's recorded mapping,
    // or reads would prune to buckets that don't hold the rows.
    val changes = dml.filter(col("table") === t).drop("table")
      .withColumn("bucket", pmod(hash(col("row_key")), lit(nb)))
    // Touched buckets from the RAW batch: latest-per-key compaction
    // cannot change a batch's key set, so the former pre-compacted form
    // ran a full window shuffle+sort just to learn the buckets — this is
    // one map-side-partial distinct over the persisted batch instead.
    val touched = graft.Label.job(spark, s"store.touched $t b=$batchId")(
      changes.select(col("bucket")).distinct()
        .collect().map(_.getInt(0)).toSet)

    val mapping = cur.map(_.buckets).getOrElse(Map.empty[Int, String])
    if (touched.nonEmpty) {
      val existing = readBuckets(spark, tdir, mapping, touched, nb)
      // ONE latest-per-key window over existing ∪ batch. The former
      // two-phase form (compact the batch per key, then merge the result
      // with the existing buckets) ran two full window shuffles per
      // apply; latest-of-union ≡ latest-of(existing ∪ latest-of(batch))
      // — same winner by version, and version ties within a batch were
      // arbitrary in both forms. Map-side WindowGroupLimit still prunes
      // per-key multiplicity before the single exchange.
      val merged = CdcApply.latestByKey(
        existing.unionByName(changes), Seq("row_key"), col("version"))
      // One file per bucket: without the repartition every shuffle
      // partition writes into every bucket directory it has rows
      // for — O(shufflePartitions × buckets) small files per batch,
      // which murders the file listing at scale. Buckets are sized
      // to a few GB, so one writer per bucket is the right shape.
      graft.Label.job(spark, s"store.merge-write $t b=$batchId")(
        instrumentMerged(t, batchId,
            merged.select(col("row_key"), col("op"), col("values"),
              col("version"), col("bucket")))
          .repartition(math.max(touched.size, 1), col("bucket"))
          .write.mode(SaveMode.Overwrite)
          .partitionBy("bucket")
          .parquet(s"$tdir/snap-$batchId"))
    }
    val newMapping = mapping ++ touched.map(_ -> s"snap-$batchId")
    beforeCommit(t, batchId)
    commitManifest(fs, tdir, batchId, Manifest(nb, schemaJson, newMapping))

    // Auto-compact policy: once the manifest count exceeds the configured
    // bound, fold this table's buckets into one compaction snapshot AT THE
    // JUST-COMMITTED batch id (replace-commit). Safe under at-least-once
    // foreachBatch: a replay of THIS batch merges against the compacted
    // state and its manifest re-commit is dropped (id exists), and any
    // older batch's replay commits a lower id that max-id readers never
    // see — so a folded-out tombstone can never resurface. Time travel to
    // ids below the compaction point is untouched (older manifests and
    // their directories stay until vacuum).
    if (autoCompactManifests > 0 &&
        manifestCount(fs, tdir) > autoCompactManifests) {
      compact(spark, t, batchId)
      if (autoVacuumRetainBatches >= 0)
        vacuum(spark, t, keepFromBatchId = batchId - autoVacuumRetainBatches)
    }
  }

  private def manifestCount(fs: FileSystem, tdir: String): Int =
    try fs.listStatus(new Path(tdir))
      .count(_.getPath.getName.matches("manifest-\\d+"))
    catch { case _: java.io.FileNotFoundException => 0 }

  private def maxManifestId(fs: FileSystem, tdir: String): Option[Long] =
    try fs.listStatus(new Path(tdir)).iterator
      .map(_.getPath.getName)
      .filter(_.matches("manifest-\\d+"))
      .map(_.stripPrefix("manifest-").toLong)
      .foldLeft(Option.empty[Long])((acc, v) => Some(acc.fold(v)(math.max(_, v))))
    catch { case _: java.io.FileNotFoundException => None }

  /** Live rows of `table` at the latest committed snapshot
    * (tombstones filtered): `row_key, op, values, version`. */
  def snapshot(spark: SparkSession, table: String): DataFrame =
    snapshotImpl(spark, table, atOrBefore = None)

  /** Time travel: live rows as of committed batch `batchId` — the state
    * the table converged to after the largest committed batch ≤ that id.
    * Free by construction: every `manifest-<id>` is retained and each
    * maps the full bucket set to the snapshot directories holding its
    * data at that commit (the same manifest-log trick Delta/Iceberg
    * time travel uses). [[compact]] collapses history — after it, only
    * ids ≥ the compaction id resolve to pre-compaction-free state. */
  def snapshotAt(spark: SparkSession, table: String, batchId: Long): DataFrame =
    snapshotImpl(spark, table, atOrBefore = Some(batchId))

  private def snapshotImpl(spark: SparkSession, table: String,
                           atOrBefore: Option[Long]): DataFrame = {
    val fs = fileSystem(spark, root)
    val tdir = tableDir(table)
    val m = readManifest(fs, tdir, atOrBefore)
      .getOrElse(Manifest(numBuckets, None, Map.empty))
    readBuckets(spark, tdir, m.buckets, m.buckets.keySet, m.numBuckets)
      .filter(col("op") =!= graft.model.OpType.Delete)
      .drop("bucket")
  }

  /** Typed snapshot: live rows re-typed through the manifest's RECORDED
    * schema (the last applied DDL, as evolved by [[SchemaEvolution]]) via
    * the flattener's single re-typing rule — consumers get plain typed
    * columns instead of the envelope's `map<string,string>`. Rows written
    * before a DDL added a column read NULL for it; rows whose map still
    * carries a dropped column lose it by projection — both metadata-only,
    * no data files rewritten. */
  def snapshotTyped(spark: SparkSession, table: String,
                    atOrBefore: Option[Long] = None): DataFrame = {
    val schema = schemaOf(spark, table, atOrBefore).getOrElse(
      throw new IllegalStateException(
        s"table '$table' has no recorded schema — no DDL record has been applied"))
    snapshotImpl(spark, table, atOrBefore)
      .select(graft.operators.DmlFlattener.typedColumns(col("values"), schema): _*)
  }

  /** Point lookup: live rows for exactly `keys`, reading ONLY the
    * buckets those keys hash to — the store's bucket layout turned into
    * read pruning. A lookup of k keys on a 100 TB table opens at most
    * `min(k, numBuckets)` bucket directories instead of scanning the
    * table; the in-bucket `row_key IN (...)` filter is pushed to the
    * parquet scan. The bucket ids are computed driver-side with the SAME
    * hash the write path uses (Spark's Murmur3 with the `hash()` default
    * seed), evaluated on literals — no job, no scan. */
  def lookup(spark: SparkSession, table: String, keys: Seq[String],
             atOrBefore: Option[Long] = None): DataFrame = {
    val fs = fileSystem(spark, root)
    val tdir = tableDir(table)
    val m = readManifest(fs, tdir, atOrBefore)
      .getOrElse(Manifest(numBuckets, None, Map.empty))
    val buckets = keys.map(k => bucketOf(k, m.numBuckets)).toSet
    readBuckets(spark, tdir, m.buckets, buckets, m.numBuckets)
      .filter(col("row_key").isin(keys: _*))
      .filter(col("op") =!= graft.model.OpType.Delete)
      .drop("bucket")
  }

  /** Change feed between two committed snapshots: the I/U/D records that
    * transform the live state at `fromBatchId` into the live state at
    * `toBatchId` — CDC of the store itself (Delta's CHANGE DATA FEED
    * shape, computed from the manifest log instead of stored change
    * files). Manifest-pruned: a bucket whose directory mapping is
    * IDENTICAL in both manifests cannot have changed, so only buckets
    * remapped between the two commits are read — a diff across one batch
    * on a 100 TB table reads that batch's touched buckets twice, not the
    * table. Value-level semantics: a row re-written with byte-identical
    * values is not a change. */
  def diff(spark: SparkSession, table: String,
           fromBatchId: Long, toBatchId: Long): DataFrame = {
    val fs = fileSystem(spark, root)
    val tdir = tableDir(table)
    // An endpoint below the vacuum floor would resolve to an empty
    // manifest and mis-report every live row (as INSERT for a vacuumed
    // `from`, as DELETE for a vacuumed `to`) — refuse instead. The
    // floor is the smallest manifest id that survived the last vacuum.
    val floor = readFloor(fs, tdir)
    Seq("fromBatchId" -> fromBatchId, "toBatchId" -> toBatchId).foreach {
      case (what, id) => require(id >= floor,
        s"diff $what=$id is below table '$table' retention floor $floor — " +
          "that history was vacuumed; re-seed from a full snapshot")
    }
    def manifest(id: Long) = readManifest(fs, tdir, Some(id))
      .getOrElse(Manifest(numBuckets, None, Map.empty))
    val mFrom = manifest(fromBatchId)
    val mTo = manifest(toBatchId)
    val changed = (mFrom.buckets.keySet ++ mTo.buckets.keySet)
      .filter(b => mFrom.buckets.get(b) != mTo.buckets.get(b))
    def live(m: Manifest, tag: String) =
      readBuckets(spark, tdir, m.buckets, changed, m.numBuckets)
        .filter(col("op") =!= graft.model.OpType.Delete)
        .select(col("row_key"), col("values").as(s"values_$tag"),
          col("version").as(s"version_$tag"))
    // MapType is not directly comparable; sorted entry arrays are.
    val sameValues = array_sort(map_entries(col("values_from"))) ===
      array_sort(map_entries(col("values_to")))
    live(mFrom, "from").join(live(mTo, "to"), Seq("row_key"), "full_outer")
      .withColumn("diff_op",
        when(col("values_from").isNull, graft.model.OpType.Insert)
          .when(col("values_to").isNull, graft.model.OpType.Delete)
          .when(sameValues, lit(null))
          .otherwise(graft.model.OpType.Update))
      .filter(col("diff_op").isNotNull)
      .select(col("row_key"), col("diff_op"),
        coalesce(col("values_to"), col("values_from")).as("values"),
        col("values_from").as("values_prev"),
        col("version_from"), col("version_to"))
  }

  /** On-disk bytes of the snapshot directories the current (or as-of)
    * manifest references — the optimizer statistic for this table.
    * Driver-side metadata listing (one `getContentSummary` per distinct
    * referenced directory, dozens at most); an over-estimate of live
    * data (tombstones and superseded buckets in shared directories
    * count), which is the SAFE direction for a broadcast decision. */
  def dataSizeInBytes(spark: SparkSession, table: String,
                      atOrBefore: Option[Long] = None): Long = {
    val fs = fileSystem(spark, root)
    val tdir = tableDir(table)
    readManifest(fs, tdir, atOrBefore).fold(0L) { m =>
      m.buckets.values.toSet.iterator.map { (d: String) =>
        try fs.getContentSummary(new Path(s"$tdir/$d")).getLength
        catch { case _: java.io.IOException => 0L }
      }.sum
    }
  }

  /** Recorded live schema of `table` (from the last applied DDL at or
    * before `atOrBefore`, latest when unbounded). */
  def schemaOf(spark: SparkSession, table: String,
               atOrBefore: Option[Long] = None): Option[StructType] =
    readManifest(fileSystem(spark, root), tableDir(table), atOrBefore)
      .flatMap(_.schemaJson)
      .map(j => DataType.fromJson(j).asInstanceOf[StructType])

  /** Materialize the typed snapshot as a Z-order-clustered parquet
    * directory — the serving/export layout (Delta's OPTIMIZE ZORDER BY,
    * as a one-shot write): rows are range-partitioned and sorted on the
    * interleaved key of two typed columns, so every file and row group
    * covers a small rectangle in (x, y) and parquet min/max stats prune
    * scans filtered on EITHER dimension. The store's own bucket layout
    * is untouched (it is keyed for point lookups, not range scans); this
    * is the path a downstream analytical consumer reads. Content is
    * exactly [[snapshotTyped]] — layout is the only difference. */
  def exportZOrdered(spark: SparkSession, table: String, outDir: String,
                     xCol: String, yCol: String, bits: Int = 20,
                     numFiles: Int = 8): Unit = {
    val zk = graft.functions.ZOrder.zorderKey(
      coalesce(col(xCol).cast("long"), lit(0L)),
      coalesce(col(yCol).cast("long"), lit(0L)), bits)
    snapshotTyped(spark, table)
      .withColumn("__zk", zk)
      .repartitionByRange(numFiles, col("__zk"))
      .sortWithinPartitions(col("__zk"))
      .drop("__zk")
      .write.mode(SaveMode.Overwrite).parquet(outDir)
  }

  /** Delta-style MERGE INTO, expressed as one change batch: every
    * `source` row upserts into `table` by `keys` (put-all-columns, the
    * store's I/U law) except rows matching `deleteWhen`, which become
    * tombstones — insert-or-update-or-delete in applyBatch's single
    * shuffle + touched-bucket rewrite, no separate matched/not-matched
    * passes. `version` orders rows sharing a key within the batch
    * (latest wins). Follow the batch-id contract: monotonically above
    * the last commit. */
  def merge(table: String, source: DataFrame, keys: Seq[String],
            version: Column, batchId: Long,
            deleteWhen: Column = lit(false)): Unit = {
    val op = when(deleteWhen, graft.model.OpType.Delete)
      .otherwise(graft.model.OpType.Update)
    applyBatch(graft.operators.ChangeFeed.wrapDml(
      source, table, keys, op, version, lit(0L)), batchId)
  }

  /** Re-bucket the table to `newNumBuckets` — the lifecycle operation
    * for a table that outgrew (or over-provisioned) its bucket sizing:
    * buckets should stay at a few GB, and a table that grew 100× since
    * creation needs proportionally more of them. One full rewrite into
    * `snap-<asBatchId>-r` under the NEW hash, committed at `asBatchId`;
    * every later batch and read picks the new count up from the
    * manifest (the write path always buckets with the manifest's count,
    * never the constructor's). Pass the LAST COMMITTED batch id (this
    * is a replace-commit, [[compact]]'s convention) — a fresh id would
    * collide with a resumed stream's next micro-batch id, whose commit
    * would then be dropped as a replay. Unlike [[compact]], tombstones are
    * preserved, so replay safety is unchanged and no checkpoint-horizon
    * caveat applies. History manifests keep their own bucket counts —
    * time travel and diff across the boundary stay correct (a diff
    * spanning it reads everything: every bucket was remapped). */
  def rebucket(spark: SparkSession, table: String, newNumBuckets: Int,
               asBatchId: Long): Unit = {
    require(newNumBuckets > 0, s"newNumBuckets must be positive, got $newNumBuckets")
    val fs = fileSystem(spark, root)
    val tdir = tableDir(table)
    readManifest(fs, tdir)
      .filterNot(_.numBuckets == newNumBuckets) // no-op if already sized
      .foreach { m =>
        // the target count is part of the directory name: two rebuckets
        // replace-committed at the SAME id (the documented convention)
        // must never lazily read the directory they are overwriting
        val rdir = s"snap-$asBatchId-r$newNumBuckets"
        readBuckets(spark, tdir, m.buckets, m.buckets.keySet, m.numBuckets)
          .drop("bucket")
          .withColumn("bucket", pmod(hash(col("row_key")), lit(newNumBuckets)))
          .repartition(newNumBuckets, col("bucket"))
          .write.mode(SaveMode.Overwrite).partitionBy("bucket")
          .parquet(s"$tdir/$rdir")
        // empty table → no bucket dirs were written; see compact
        val mapping =
          if (hasBucketDirs(fs, s"$tdir/$rdir"))
            (0 until newNumBuckets).map(_ -> rdir).toMap
          else Map.empty[Int, String]
        commitManifest(fs, tdir, asBatchId,
          Manifest(newNumBuckets, m.schemaJson, mapping), replace = true)
      }
  }

  /** Fold all buckets into one snapshot directory and drop tombstones.
    * Run only past the streaming checkpoint's replay horizon: once a
    * tombstone is gone, a replay of the batch that deleted it must never
    * happen (the checkpoint guarantees exactly that for committed batches). */
  def compact(spark: SparkSession, table: String, asBatchId: Long): Unit = {
    val fs = fileSystem(spark, root)
    val tdir = tableDir(table)
    // Compaction output lives in its own `-c` directory so it can never
    // collide with the batch snapshot `snap-<id>` a batch of the same id
    // wrote (auto-compact runs at the just-committed batch id).
    val cdir = s"snap-$asBatchId-c"
    // Re-compacting an already-compacted id would read and overwrite the
    // same directory (data loss under lazy evaluation) — no-op instead.
    readManifest(fs, tdir)
      .filterNot(m => m.buckets.nonEmpty && m.buckets.values.forall(_ == cdir))
      .foreach { m =>
      val live = readBuckets(spark, tdir, m.buckets, m.buckets.keySet,
          m.numBuckets)
        .filter(col("op") =!= graft.model.OpType.Delete)
      graft.Label.job(spark, s"store.compact $table b=$asBatchId")(
        live.repartition(math.max(m.buckets.size, 1), col("bucket"))
          .write.mode(SaveMode.Overwrite).partitionBy("bucket")
          .parquet(s"$tdir/$cdir"))
      // A fully-tombstoned table folds to ZERO rows: the write then
      // leaves no bucket directories and a later schema-less parquet
      // read of the dir would fail — commit an empty mapping instead
      // (readBuckets resolves that to the empty snapshot schema).
      val mapping =
        if (hasBucketDirs(fs, s"$tdir/$cdir"))
          m.buckets.keySet.map(_ -> cdir).toMap
        else Map.empty[Int, String]
      commitManifest(fs, tdir, asBatchId,
        Manifest(m.numBuckets, m.schemaJson, mapping), replace = true)
    }
  }

  /** True iff `dir` holds at least one `bucket=` partition directory —
    * i.e. the preceding write actually materialized rows. */
  private def hasBucketDirs(fs: FileSystem, dir: String): Boolean =
    try fs.listStatus(new Path(dir)).exists(_.getPath.getName.startsWith("bucket="))
    catch { case _: java.io.FileNotFoundException => false }

  /** Drop history: delete manifests with id < `keepFromBatchId` and every
    * snapshot directory no longer referenced by a retained manifest.
    * Storage is bounded to the retained commits' working set; time
    * travel below the floor is gone afterwards (snapshotAt resolves to
    * an empty table). Run after [[compact]] at the same id to shrink to
    * a single snapshot directory. Safe ordering: data directories are
    * deleted only after the manifests referencing them — a concurrent
    * reader either sees a retained manifest (whose directories survive)
    * or none. */
  def vacuum(spark: SparkSession, table: String, keepFromBatchId: Long): Unit = {
    val fs = fileSystem(spark, root)
    val tdir = new Path(tableDir(table))
    val entries =
      try fs.listStatus(tdir).toSeq
      catch { case _: java.io.FileNotFoundException => return }
    val manifestIds = entries.map(_.getPath.getName)
      .filter(_.matches("manifest-\\d+"))
      .map(_.stripPrefix("manifest-").toLong)
    if (manifestIds.isEmpty) return
    // never drop the newest commit, whatever the floor says
    val floor = math.min(keepFromBatchId, manifestIds.max)
    val referenced = manifestIds.filter(_ >= floor).flatMap { id =>
      readManifest(fs, tableDir(table), Some(id)).toSeq.flatMap(_.buckets.values)
    }.toSet
    // Record the retention floor BEFORE deleting anything, so history
    // readers (diff) refuse vacuumed ids instead of silently resolving
    // them to an empty table. The floor is the SMALLEST manifest id
    // that will survive — an id below it may have existed and been
    // deleted, so resolving it is unsafe even when it sits above the
    // requested keepFromBatchId (vacuum(2) over manifests {0,1,3}
    // retains only {3}: id 2 resolves to nothing). Monotone: never
    // lowered by a later vacuum. Crash ordering: a crash after this
    // write refuses a little too much (floor recorded, deletions
    // incomplete) — never too little; readFloor also falls back to the
    // tmp file if the crash lands between the delete and rename here.
    // A vacuum that deletes nothing creates no new unsafety — leave the
    // floor alone (raising it would wrongly refuse bootstrap diffs on a
    // table whose history is fully intact).
    val toDelete = manifestIds.filter(_ < floor)
    if (toDelete.nonEmpty) {
      val minRetained = manifestIds.filter(_ >= floor).min
      val newFloor = math.max(minRetained, readFloor(fs, tableDir(table)))
      val tmp = new Path(tdir, ".vacuum-floor.tmp")
      val out = fs.create(tmp, true)
      try out.write(newFloor.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      fs.delete(new Path(tdir, "vacuum-floor"), false)
      fs.rename(tmp, new Path(tdir, "vacuum-floor"))
    }
    toDelete.foreach { id =>
      fs.delete(new Path(tdir, s"manifest-$id"), false)
    }
    // Orphaned replace-swap sidecars below the floor are history too —
    // readManifest would otherwise resurrect them as manifests on the
    // next open (they don't match the manifest-\d+ filters above).
    entries.map(_.getPath.getName)
      .filter(_.matches("manifest-\\d+\\.old"))
      .filter(_.stripPrefix("manifest-").stripSuffix(".old").toLong < floor)
      .foreach(n => fs.delete(new Path(tdir, n), false))
    entries.map(_.getPath.getName)
      .filter(n => n.startsWith("snap-") && !referenced.contains(n))
      .foreach(n => fs.delete(new Path(tdir, n), true))
  }

  /** One multi-path scan over exactly the `bucket=` leaf directories the
    * manifest maps for `buckets` — instead of the former union of one
    * whole-directory read per snapshot dir (each paying its own driver
    * listing, parquet footer schema inference, and a per-relation plan
    * subtree; guide §5 driver round-trips, §6 listing). The schema is
    * explicit (no footer reads at plan time), leaf-dir paths make the
    * bucket pruning exact at the listing level (no `isin` filter), and
    * `bucket` is recomputed from `row_key` — by construction every row a
    * manifest references satisfies `bucket = pmod(hash(row_key),
    * manifest.numBuckets)` (applyTable writes with the manifest's count,
    * compact preserves it, rebucket recomputes and commits the new
    * count), so the recomputation is the stored value, codegen'd.
    * Existence filtering handles mappings that reference buckets a
    * compaction/rebucket never materialized (zero live rows) — but a
    * referenced snapshot DIRECTORY that is gone is data loss and stays
    * a loud error, exactly as the former whole-directory read made it. */
  private def readBuckets(spark: SparkSession, tdir: String,
                          mapping: Map[Int, String],
                          buckets: Set[Int], nb: Int): DataFrame = {
    val fs = new Path(tdir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val byDir = mapping.filter { case (b, _) => buckets.contains(b) }
      .groupBy(_._2).view.mapValues(_.keySet).toMap
    val paths = byDir.toSeq.sortBy(_._1).flatMap { case (dir, bs) =>
      val present = fs.listStatus(new Path(s"$tdir/$dir")).iterator
        .map(_.getPath.getName).filter(_.startsWith("bucket=")).toSet
      bs.toSeq.sorted.map(b => s"bucket=$b").filter(present)
        .map(n => s"$tdir/$dir/$n")
    }
    if (paths.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        snapshotSchema)
    else
      spark.read.schema(bucketFileSchema).parquet(paths: _*)
        .withColumn("bucket", pmod(hash(col("row_key")), lit(nb)))
  }
}

object ParquetUpsertStore {

  val snapshotSchema: StructType = StructType(Seq(
    StructField("row_key", StringType),
    StructField("op", StringType),
    StructField("values", MapType(StringType, StringType)),
    StructField("version", LongType),
    StructField("bucket", IntegerType)))

  /** What a bucket data FILE holds — [[snapshotSchema]] minus `bucket`
    * (the write's partition column). Explicit on every bucket read, so
    * no scan pays parquet footer schema inference at plan time. */
  private val bucketFileSchema: StructType =
    StructType(snapshotSchema.fields.filterNot(_.name == "bucket"))

  private[sinks] final case class Manifest(
      numBuckets: Int, schemaJson: Option[String], buckets: Map[Int, String])

  private def fileSystem(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private[sinks] def tableDir(root: String, table: String): String =
    root + "/" + table.replaceAll("[^A-Za-z0-9._-]", "_")

  /** Ids of every committed manifest of the table at `tdir` (empty for a
    * table that doesn't exist) — the sidecar artifacts' coverage oracle:
    * [[KeyBloom.filterPresent]] refuses to prune when any committed
    * batch lacks a bloom. Includes orphaned `.old` replace-swap sidecars
    * (their ids are committed history a crashed swap merely hid). */
  private[sinks] def committedManifestIds(fs: FileSystem, tdir: String): Seq[Long] =
    try fs.listStatus(new Path(tdir)).toSeq
      .map(_.getPath.getName)
      .collect {
        case n if n.matches("manifest-\\d+") =>
          n.stripPrefix("manifest-").toLong
        case n if n.matches("manifest-\\d+\\.old") =>
          n.stripPrefix("manifest-").stripSuffix(".old").toLong
      }.distinct
    catch { case _: java.io.FileNotFoundException => Seq.empty }

  /** The table's vacuum retention floor: the smallest manifest id that
    * survived the last vacuum — ids below it may have been deleted.
    * Long.MinValue when never vacuumed (or no table). Falls back to the
    * writer's tmp file so a crash between vacuum's delete and rename
    * cannot silently disarm the floor. */
  private[sinks] def readFloor(fs: FileSystem, tdir: String): Long = {
    def read(name: String): Option[Long] =
      try {
        val in = new BufferedReader(new InputStreamReader(
          fs.open(new Path(tdir, name)), UTF_8))
        try Some(in.readLine().trim.toLong) finally in.close()
      } catch { case _: java.io.IOException => None }
    read("vacuum-floor").orElse(read(".vacuum-floor.tmp"))
      .getOrElse(Long.MinValue)
  }

  /** Driver-side twin of the write path's `pmod(hash(row_key), nb)`:
    * Spark's `hash()` is Murmur3 with seed 42, so evaluating the same
    * expression on a literal yields the bucket without running a job. */
  private[graft] def bucketOf(key: String, nb: Int): Int = {
    val h = org.apache.spark.sql.catalyst.expressions.Murmur3Hash(
      Seq(org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(key),
        StringType)), 42).eval(null).asInstanceOf[Int]
    ((h % nb) + nb) % nb
  }

  /** Parsed-manifest cache keyed on (path, mtime, length) — committed
    * manifests are immutable EXCEPT replace-commits (compact/rebucket
    * re-commit the same id via tmp+rename, which always changes the
    * file's mtime and, in practice, its length), so the key goes stale
    * exactly when the content does. The win is per-phase: every store
    * lifecycle step (apply, snapshot, lookup, diff, coverage checks)
    * re-resolves the live manifest, and on an object store each re-read
    * is a metadata round-trip (guide §5); in-process replace-commits
    * additionally invalidate by path. Bounded: cleared wholesale past a
    * size no realistic table count reaches (entries are tiny). */
  private val manifestCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Long), Manifest]()

  /** Highest-id committed manifest (optionally capped at `atOrBefore` for
    * time travel), or None for a table that doesn't exist. */
  private[sinks] def readManifest(fs: FileSystem, tdir: String,
                                  atOrBefore: Option[Long] = None): Option[Manifest] = {
    val dir = new Path(tdir)
    val names =
      try fs.listStatus(dir).map(_.getPath.getName).toSeq
      catch { case _: java.io.FileNotFoundException => Seq.empty }
    // Crash recovery for a replace-commit that died between its two
    // renames: a `manifest-<id>.old` sidecar whose target manifest is
    // missing IS the manifest for that id — restore it before picking
    // the latest. Concurrent readers may race on the rename; the loser's
    // rename fails and the id is visible either way.
    val restored = names
      .filter(_.matches("manifest-\\d+\\.old"))
      .map(_.stripSuffix(".old"))
      .filter(t => !names.contains(t) &&
        fs.rename(new Path(dir, t + ".old"), new Path(dir, t)))
    val latest = (names ++ restored).iterator
      .filter(_.matches("manifest-\\d+"))
      .map(n => n.stripPrefix("manifest-").toLong)
      .filter(id => atOrBefore.forall(id <= _))
      .foldLeft(Option.empty[Long])((acc, v) => Some(acc.fold(v)(math.max(_, v))))
    latest.map { id =>
      val p = new Path(dir, s"manifest-$id")
      val st = fs.getFileStatus(p)
      val key = (p.toString, st.getModificationTime, st.getLen)
      val cached = manifestCache.get(key)
      if (cached != null) cached
      else {
        val in = new BufferedReader(new InputStreamReader(fs.open(p), UTF_8))
        val m = try {
          val header = in.readLine().split(" ")
          require(header(0) == "graft-upsert-manifest", s"bad manifest header in $tdir")
          val nb = header(1).toInt
          val schemaJson = Option(in.readLine()).filter(_ != "-")
          val buckets = Iterator.continually(in.readLine()).takeWhile(_ != null)
            .filter(_.nonEmpty)
            .map { line =>
              val Array(b, d) = line.split("\t", 2)
              b.toInt -> d
            }.toMap
          Manifest(nb, schemaJson, buckets)
        } finally in.close()
        if (manifestCache.size > 8192) manifestCache.clear()
        manifestCache.put(key, m)
        m
      }
    }
  }

  /** Write manifest-<id> via tmp-file + atomic rename (the commit point).
    * A failed rename means the id is already committed (a replay) — the
    * content is identical by construction, so it is dropped. `replace`
    * (compaction's re-commit of an existing id) first moves the live
    * manifest aside to a `manifest-<id>.old` sidecar (not matching the
    * committed-manifest name pattern, so normal reads ignore it) and
    * removes the sidecar only after the new manifest's rename succeeds.
    * A crash between the two renames leaves only the sidecar on disk;
    * [[readManifest]] restores such an orphaned sidecar to its manifest
    * name on the next open, so the id's content survives the crash (it
    * is merely invisible until then), and [[vacuum]] deletes sidecars
    * below its retention floor. */
  private[sinks] def commitManifest(fs: FileSystem, tdir: String, id: Long,
                                    m: Manifest, replace: Boolean = false): Unit = {
    val text = new StringBuilder()
      .append("graft-upsert-manifest ").append(m.numBuckets).append('\n')
      .append(m.schemaJson.getOrElse("-")).append('\n')
    m.buckets.toSeq.sortBy(_._1).foreach { case (b, d) =>
      text.append(b).append('\t').append(d).append('\n')
    }
    val tmp = new Path(tdir, s".manifest-$id.tmp")
    val out = fs.create(tmp, true)
    try out.write(text.toString.getBytes(UTF_8)) finally out.close()
    val target = new Path(tdir, s"manifest-$id")
    // in-process invalidation for replace-commits (cross-process
    // staleness is covered by the cache key's mtime+length)
    manifestCache.keySet.removeIf(_._1 == target.toString)
    if (replace) {
      val sidecar = new Path(tdir, s"manifest-$id.old")
      fs.delete(sidecar, false) // stale sidecar from an earlier crashed swap
      if (fs.exists(target)) fs.rename(target, sidecar)
      if (fs.rename(tmp, target)) fs.delete(sidecar, false)
      else { fs.delete(tmp, false); fs.rename(sidecar, target) }
    } else if (!fs.rename(tmp, target)) fs.delete(tmp, false)
  }
}
