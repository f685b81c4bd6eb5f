package graft.sources

import graft.sinks.{KeyBloom, ParquetUpsertStore, SecondaryIndex}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SaveMode}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** `spark.read.format("graft-upsert")` — the durable upsert store
  * ([[graft.sinks.ParquetUpsertStore]]) surfaced as a first-class Spark
  * data source, so consumers address a CDC-maintained table by path +
  * name instead of programming against the store's API (the reference
  * has no analogue: its sinks are write-only, reference
  * sink/CDCKudu.java:139-184 — reading what was applied means going to
  * Kudu/Bigtable with that system's own client).
  *
  * Read options: `path` (store root), `table`, optional `asOf` (time
  * travel to a committed batch id), optional `typed=true` (project the
  * envelope's `map<string,string>` through the manifest's recorded
  * schema). Write (`SaveMode.Append` only): applies the incoming
  * envelope DataFrame as one store batch at `batchId` (default 0).
  *
  * Deliberately a V1 relation, not a DSv2 `Table`: `buildScan` delegates
  * straight to the store's manifest-pruned DataFrame reads, so the scan
  * underneath is Spark's own vectorized parquet source — partition
  * pruning, predicate pushdown and whole-stage codegen included. A DSv2
  * `PartitionReader` would have to re-implement that parquet path row by
  * row and lose the vectorized reader. V1's `PrunedFilteredScan` is all
  * the contract needed: column pruning via `requiredColumns`, and pushed
  * `row_key` equality/IN filters turned into the store's driver-side
  * bucket pruning ([[ParquetUpsertStore.lookup]]) — a point lookup on a
  * 100 TB table opens `min(keys, buckets)` bucket directories, never the
  * table. All filters are left in `unhandledFilters` (the default), so
  * Spark re-applies them above the scan: pruning here is purely an
  * optimization and can never change results.
  */
final class UpsertDataSource extends RelationProvider
    with CreatableRelationProvider with StreamSinkProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-upsert"

  /** `envelope.writeStream.format("graft-upsert")` — the whole durable
    * apply stack behind one line: per micro-batch, secondary-index
    * appends for `indexColumns` and a key bloom (when `blooms=true`)
    * write FIRST (the artifacts' crash-ordering contract), then the
    * store apply, then (when `autoMaintain=K` > 0) the composite
    * maintenance fold if the sidecar append counts exceed K — so a
    * stream of any age keeps every lookup's opened-file count bounded
    * without the pipeline author calling a single maintenance API.
    * Batch ids come from the streaming checkpoint: replays re-append
    * postings the lookups collapse, rewrite the same bloom, and are
    * dropped by the store's idempotent commit.
    *
    * `indexColumns` syntax: ',' separates entries, and '+' INSIDE an
    * entry ("a+b") requests a composite pair index on (a, b) — both
    * characters are therefore reserved and cannot name a literal map
    * key containing them (a malformed entry like "a+" fails loudly at
    * stream construction, never silently as a single-column index). */
  override def createSink(sqlContext: SQLContext,
                          parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    require(outputMode != org.apache.spark.sql.streaming.OutputMode.Complete(),
      "graft-upsert: Complete output mode is not supported — the store " +
        "applies change batches, not full result rewrites")
    val root = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-upsert: 'path' option (store root directory) is required"))
    new UpsertStreamSink(storeFor(parameters), root, tableFor(parameters),
      // an entry "a+b" maintains a COMPOSITE pair index on (a, b) —
      // resolved to the index's canonical synthetic name here, after
      // which every maintenance path treats it exactly like a column
      indexColumns = parameters.get("indexColumns")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq
          .map { c =>
            if (c.contains("+"))
              SecondaryIndex.compositeName(
                c.split("\\+").map(_.trim).filter(_.nonEmpty).toSeq)
            else c
          })
        .getOrElse(Seq.empty),
      blooms = parameters.get("blooms").exists(_.toBoolean),
      autoMaintain = parameters.get("autoMaintain").map(_.toInt).getOrElse(0),
      vacuumRetain = parameters.get("vacuumRetainBatches").map(_.toLong)
        .getOrElse(-1L))
  }

  private def storeFor(parameters: Map[String, String]) = {
    val root = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-upsert: 'path' option (store root directory) is required"))
    new ParquetUpsertStore(root)
  }

  private def tableFor(parameters: Map[String, String]): String =
    parameters.getOrElse("table", throw new IllegalArgumentException(
      "graft-upsert: 'table' option is required"))

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation =
    UpsertRelation(sqlContext, storeFor(parameters),
      root = parameters("path"), table = tableFor(parameters),
      asOf = parameters.get("asOf").map(_.toLong),
      typed = parameters.get("typed").exists(_.toBoolean),
      indexMaxKeys = parameters.get("indexMaxKeys").map(_.toInt)
        .getOrElse(100000))

  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
                              parameters: Map[String, String],
                              data: DataFrame): BaseRelation = {
    require(mode == SaveMode.Append, s"graft-upsert: only SaveMode.Append is " +
      s"supported (the store is an upsert log, not a file dump); got $mode")
    storeFor(parameters).applyBatch(data,
      parameters.get("batchId").map(_.toLong).getOrElse(0L))
    createRelation(sqlContext, parameters)
  }
}

/** The streaming sink face of the store: one [[Sink.addBatch]] per
  * micro-batch in the artifact crash-ordering (index → bloom → apply →
  * auto-maintenance). The incoming DataFrame is re-wrapped off the
  * streaming incremental execution and persisted once — index appends,
  * the bloom build, and the apply are three consumers of the same
  * batch (the persist-the-batch rule). */
private[sources] final class UpsertStreamSink(
    store: ParquetUpsertStore, root: String, table: String,
    indexColumns: Seq[String], blooms: Boolean, autoMaintain: Int,
    vacuumRetain: Long)
    extends org.apache.spark.sql.execution.streaming.Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val spark = data.sparkSession
    val batch = org.apache.spark.sql.graftbridge.DatasetBridge
      .asBatch(data).persist()
    try {
      indexColumns.foreach(c =>
        graft.sinks.SecondaryIndex.indexBatch(root, table, c, batch, batchId))
      if (blooms) KeyBloom.addBatch(spark, root, table, batch, batchId)
      store.applyBatch(batch, batchId)
      if (autoMaintain > 0)
        graft.sinks.StoreMaintenance.auto(spark, store, root, table,
          indexColumns, batchId, maxSidecarAppends = autoMaintain,
          vacuumRetainBatches = vacuumRetain)
    } finally batch.unpersist()
  }
}

/** One CDC-maintained table at one (optional) point in time. Live rows
  * only — tombstoned keys are already folded out by the store's read
  * path, matching [[ParquetUpsertStore.snapshot]]/`lookup` semantics.
  *
  * A `typed=true` relation additionally routes pushed predicates on
  * NON-key columns through any [[graft.sinks.SecondaryIndex]] postings
  * that exist for them (equality, IN, numeric ranges): the index
  * enumerates a bounded candidate-key superset, the scan becomes the
  * store's point lookup on those keys, and Spark re-applies every
  * filter above the scan — so a plain `.filter` on an indexed column
  * answers index-first from SQL, and the index degrades to the full
  * snapshot scan (never a wrong answer) when no index exists, coverage
  * is unsound, or the predicate is too popular (`indexMaxKeys`). */
final case class UpsertRelation(sqlContext: SQLContext,
                                store: ParquetUpsertStore, root: String,
                                table: String, asOf: Option[Long],
                                typed: Boolean, indexMaxKeys: Int = 100000)
    extends BaseRelation with PrunedFilteredScan with InsertableRelation {

  /** `INSERT INTO` a `CREATE TABLE ... USING graft-upsert` table: the
    * inserted rows are a CHANGE BATCH in the relation's own read shape
    * (`row_key, op, values, version`), applied at the next committed
    * batch id — so a pure-SQL pipeline can both query the store and
    * apply changes to it (the reference hands its analytics story
    * entirely to SQL; a read-only SQL face would strand the write
    * half). Batches applied this way bypass the sidecar artifacts
    * (indexes, blooms) by construction; their coverage cross-checks
    * notice the uncovered manifest and degrade loudly to unpruned
    * scans until the next compaction — correct, never silently stale. */
  override def insert(data: DataFrame, overwrite: Boolean): Unit = {
    require(!overwrite,
      "graft-upsert: INSERT OVERWRITE is not supported — the store is an " +
        "upsert log, not a rewritable file dump; INSERT INTO appends a " +
        "change batch")
    require(!typed,
      "graft-upsert: INSERT INTO requires the envelope-shaped relation " +
        "(typed=false) — insert (row_key, op, values, version) change " +
        "rows; a typed relation cannot derive row keys from typed columns")
    require(asOf.isEmpty,
      "graft-upsert: cannot INSERT INTO a time-travel (asOf) relation — " +
        "history is immutable; insert through the current-state table")
    store.applyProjected(data, table, store.nextBatchId(spark, table))
  }

  private def spark = sqlContext.sparkSession

  /** Manifest-referenced data size, so Catalyst can AUTO-BROADCAST a
    * small CDC table in enrichment joins — without it a BaseRelation
    * reports `defaultSizeInBytes` (effectively infinite) and every
    * join against the store sort-merges, however small the table. The
    * estimate over-counts (tombstones, superseded buckets in shared
    * directories), which errs away from broadcasting — the safe side. */
  override lazy val sizeInBytes: Long = {
    val n = store.dataSizeInBytes(spark, table, asOf)
    if (n > 0L) n else super.sizeInBytes
  }

  override val schema: StructType =
    if (typed) store.schemaOf(spark, table, asOf).getOrElse(
      throw new IllegalStateException(s"graft-upsert: table '$table' has no " +
        "recorded schema — typed=true needs an applied DDL record"))
    else StructType(ParquetUpsertStore.snapshotSchema.filterNot(_.name == "bucket"))

  /** The key set a single pushed filter provably bounds matching rows
    * to, or None when it cannot bound them. Soundness rules, each one
    * a place an over-eager pushdown would silently drop rows:
    *   - `row_key =` / `row_key IN` pin the set directly;
    *   - OR bounds keys only when BOTH branches do (union) — a
    *     `row_key = a OR version > 5` match can live in any bucket, so
    *     it must yield None, never `{a}`;
    *   - AND bounds keys when EITHER branch does (intersection when
    *     both) — the other conjunct only shrinks the match set further,
    *     and Spark re-applies it above the scan;
    *   - anything else (Not, non-key columns, non-string values) is
    *     unbounded. */
  private def keyBound(f: Filter): Option[Set[String]] = f match {
    case EqualTo("row_key", v: String) => Some(Set(v))
    case In("row_key", vs) if vs.forall(_.isInstanceOf[String]) =>
      Some(vs.iterator.map(_.asInstanceOf[String]).toSet)
    case Or(l, r) =>
      for { a <- keyBound(l); b <- keyBound(r) } yield a union b
    case And(l, r) => (keyBound(l), keyBound(r)) match {
      case (Some(a), Some(b)) => Some(a intersect b)
      case (a, b) => a.orElse(b)
    }
    case _ => None
  }

  /** Top-level pushed filters are conjunctive, so any filter whose
    * [[keyBound]] is defined bounds the live key set — intersect them
    * all and prune to those keys' buckets. Unbounded predicates leave
    * the scan un-pruned (still manifest-bounded). A contradictory
    * conjunction (two different pinned keys) legitimately prunes to the
    * empty set: the scan opens nothing and returns no rows. */
  private def pinnedKeys(filters: Array[Filter]): Option[Seq[String]] = {
    val sets = filters.flatMap(keyBound)
    sets.reduceOption(_ intersect _).map(_.toSeq.sorted)
  }

  /** Pushed filters re-expressed as index predicates, where expressible.
    * String equality/IN use the postings' raw-value column (exact);
    * numeric comparisons use the `v_num` double cast — inclusive bounds
    * and nearest-rounding monotonicity make the candidate set a sound
    * SUPERSET of the exact-typed matches Spark re-checks above the
    * scan. Anything else (null tests, OR, non-string/numeric types) is
    * simply not index-answerable and contributes nothing. */
  private def indexPreds(f: Filter): Seq[SecondaryIndex.Pred] = f match {
    case EqualTo(c, v: String) => Seq(SecondaryIndex.EqPred(c, v))
    case EqualTo(c, v: java.lang.Number) =>
      Seq(SecondaryIndex.RangePred(c, v.doubleValue, v.doubleValue))
    // one-sided comparisons stay OPEN on the unbounded side: Spark
    // orders NaN above everything and ±Infinity beyond ±MaxValue, so a
    // closed ±Double.MaxValue clamp would silently exclude indexed
    // values casting to NaN/±Inf that the re-applied exact filter
    // matches — candidates must stay a superset
    case GreaterThan(c, v: java.lang.Number) =>
      Seq(SecondaryIndex.GtPred(c, v.doubleValue, strict = true))
    case GreaterThanOrEqual(c, v: java.lang.Number) =>
      Seq(SecondaryIndex.GtPred(c, v.doubleValue, strict = false))
    case LessThan(c, v: java.lang.Number) =>
      Seq(SecondaryIndex.LtPred(c, v.doubleValue, strict = true))
    case LessThanOrEqual(c, v: java.lang.Number) =>
      Seq(SecondaryIndex.LtPred(c, v.doubleValue, strict = false))
    case In(c, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[String]) =>
      Seq(SecondaryIndex.InPred(c,
        vs.iterator.map(_.asInstanceOf[String]).toSeq))
    case In(c, vs)
        if vs.nonEmpty && vs.forall(_.isInstanceOf[java.lang.Number]) =>
      Seq(SecondaryIndex.NumInPred(c, vs.iterator
        .map(_.asInstanceOf[java.lang.Number].doubleValue).toSeq))
    case EqualNullSafe(c, v: String) => Seq(SecondaryIndex.EqPred(c, v))
    case EqualNullSafe(c, v: java.lang.Number) =>
      Seq(SecondaryIndex.RangePred(c, v.doubleValue, v.doubleValue))
    case StringStartsWith(c, p) => Seq(SecondaryIndex.PrefixPred(c, p))
    case And(l, r) => indexPreds(l) ++ indexPreds(r)
    case _ => Seq.empty
  }

  override def buildScan(requiredColumns: Array[String],
                         filters: Array[Filter]): RDD[Row] = {
    val base =
      if (typed) {
        val preds = filters.toSeq.flatMap(indexPreds)
        val keys =
          if (preds.isEmpty) None
          else SecondaryIndex.candidatesForScan(spark, root, table, preds,
            asOf, indexMaxKeys)
        keys match {
          case Some(ks) => store.lookup(spark, table, ks, asOf)
            .select(graft.operators.DmlFlattener.typedColumns(
              col("values"), schema): _*)
          case None => store.snapshotTyped(spark, table, asOf)
        }
      } else pinnedKeys(filters) match {
        // bloom-fronted: keys absent from every key bloom are definite
        // misses dropped BEFORE any bucket directory opens (KeyBloom
        // disables itself soundly when blooms are absent/uncovered)
        case Some(keys) => KeyBloom.lookup(spark, store, root, table,
          keys, asOf)
        case None => asOf.fold(store.snapshot(spark, table))(
          store.snapshotAt(spark, table, _))
      }
    base.select(requiredColumns.toSeq.map(col): _*).rdd
  }
}
