package graft.sources

import graft.sinks.ParquetUpsertStore
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
    with CreatableRelationProvider with DataSourceRegister {

  override def shortName(): String = "graft-upsert"

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
    UpsertRelation(sqlContext, storeFor(parameters), tableFor(parameters),
      asOf = parameters.get("asOf").map(_.toLong),
      typed = parameters.get("typed").exists(_.toBoolean))

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

/** One CDC-maintained table at one (optional) point in time. Live rows
  * only — tombstoned keys are already folded out by the store's read
  * path, matching [[ParquetUpsertStore.snapshot]]/`lookup` semantics. */
final case class UpsertRelation(sqlContext: SQLContext,
                                store: ParquetUpsertStore, table: String,
                                asOf: Option[Long], typed: Boolean)
    extends BaseRelation with PrunedFilteredScan {

  private def spark = sqlContext.sparkSession

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

  override def buildScan(requiredColumns: Array[String],
                         filters: Array[Filter]): RDD[Row] = {
    val base =
      if (typed) store.snapshotTyped(spark, table, asOf)
      else pinnedKeys(filters) match {
        case Some(keys) => store.lookup(spark, table, keys, asOf)
        case None => asOf.fold(store.snapshot(spark, table))(
          store.snapshotAt(spark, table, _))
      }
    base.select(requiredColumns.toSeq.map(col): _*).rdd
  }
}
