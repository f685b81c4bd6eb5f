package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets.UTF_8

/** Append-only SECONDARY INDEX over a [[ParquetUpsertStore]] table: a
  * postings table `value → row_key` for one envelope values column,
  * maintained per applied batch, so a selective predicate on a NON-key
  * column answers by point lookups instead of a table scan (the store's
  * own pruning only understands `row_key`).
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
  * Layout: `<root>/__index/<table>/<column>/vb=<bucket>/...` — a
  * sibling of the table directories, invisible to the store's manifest
  * readers and to [[ParquetUpsertStore.vacuum]]. Postings are
  * partitioned by `vb = pmod(hash(v), valueBuckets)`, a HASH of the
  * value, never the raw value itself:
  *   - a raw-value partition column would ship the value through Hive
  *     directory naming, where an empty string becomes
  *     `__HIVE_DEFAULT_PARTITION__` (read back as NULL — a silent
  *     permanent false negative) and numeric-looking strings re-enter
  *     through partition-type inference with changed equality;
  *   - a high-cardinality column (timestamps, free text) would explode
  *     into one directory per distinct value per append.
  * The raw value `v` rides as an ordinary string DATA column (exact
  * equality, no inference), plus `v_num = cast(v as double)` for range
  * predicates; directory count is bounded by `valueBuckets` at any
  * cardinality, and an equality lookup still reads exactly one pruned
  * partition (bucket re-filtered on `v`). The bucket count is recorded
  * once in a `_layout` file (underscore-prefixed: invisible to parquet
  * readers) — writers and readers must agree on it or pruning would
  * look in the wrong directory, so the recorded value wins over any
  * later parameter.
  */
object SecondaryIndex {

  /** Default number of hash-bucketed value partitions: enough that a
    * selective lookup reads ~1/64 of the postings, few enough that a
    * per-batch append writes a bounded directory count at ANY value
    * cardinality. */
  val DefaultValueBuckets = 64

  private def safe(s: String): String = s.replaceAll("[^A-Za-z0-9._-]", "_")

  private[graft] def indexDir(root: String, table: String,
                              column: String): String =
    s"$root/__index/${safe(table)}/${safe(column)}"

  private def fsOf(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Named error instead of Spark's path-not-found when a lookup hits a
    * column that was never indexed (the V1 config-validation posture). */
  private def requireIndexed(fs: FileSystem, dir: String, table: String,
                             column: String): Unit =
    require(fs.exists(new Path(dir)),
      s"SecondaryIndex: no index exists for '$table.$column' — run " +
        "indexBatch per applied batch (or compact once) before looking up")

  /** Restore a postings directory from a [[compact]] swap that crashed
    * between its two renames: the old log is intact under `<dir>.old`
    * and nothing is at `<dir>` — rename it back (the manifest `.old`
    * sidecar posture). Every read and maintenance entry point runs this
    * first, so the crash window costs a re-run of the compaction, never
    * a missing index. */
  private def recoverSwap(fs: FileSystem, dir: String): Unit = {
    val d = new Path(dir)
    val aside = new Path(dir + ".old")
    if (!fs.exists(d) && fs.exists(aside)) fs.rename(aside, d)
  }

  /** Record (first writer) or read back the layout's bucket count. */
  private def ensureLayout(fs: FileSystem, dir: String,
                           valueBuckets: Int): Int = {
    require(valueBuckets > 0,
      s"valueBuckets must be positive, got $valueBuckets")
    readLayout(fs, dir).getOrElse {
      val tmp = new Path(dir, "._layout.tmp")
      val out = fs.create(tmp, true)
      try out.write(s"graft-secondary-index 1\nvalue_buckets $valueBuckets\n"
        .getBytes(UTF_8))
      finally out.close()
      // first-writer-wins: a losing rename means a concurrent writer
      // committed the layout — read theirs.
      if (!fs.rename(tmp, new Path(dir, "_layout"))) fs.delete(tmp, false)
      readLayout(fs, dir).getOrElse(valueBuckets)
    }
  }

  private def readLayout(fs: FileSystem, dir: String): Option[Int] =
    try {
      val in = new BufferedReader(new InputStreamReader(
        fs.open(new Path(dir, "_layout")), UTF_8))
      try {
        val header = in.readLine()
        require(header != null && header.startsWith("graft-secondary-index"),
          s"bad secondary-index layout header in $dir")
        Iterator.continually(in.readLine()).takeWhile(_ != null)
          .collectFirst { case l if l.startsWith("value_buckets ") =>
            l.stripPrefix("value_buckets ").trim.toInt }
      } finally in.close()
    } catch { case _: java.io.IOException => None }

  /** The postings columns derived from an envelope projection: raw
    * string value, numeric cast for range predicates, hash bucket.
    * Repartitioned BY the bucket before the partitioned write — without
    * it every task writes into every vb directory it has rows for,
    * O(tasks × valueBuckets) small files per append (the same
    * file-explosion the store's bucket write guards against) — and
    * sorted within partitions by (vb, v_num, v) so each written file's
    * row groups carry tight min/max stats: the pushed range/equality
    * filters then prune at the parquet footer. The shuffle is one pass
    * over the micro-batch's postings — rows the write was about to
    * move anyway. */
  private def shapePostings(rows: DataFrame, nb: Int): DataFrame =
    rows
      .withColumn("v_num", col("v").try_cast("double")) // non-numeric → NULL
      .withColumn("vb", pmod(hash(col("v")), lit(nb)))
      .repartition(col("vb"))
      .sortWithinPartitions(col("vb"), col("v_num"), col("v"))

  /** Index the envelope batch applied (or about to be applied) as
    * `batchId`: one posting `(row_key, batch, v, v_num)` per non-DELETE
    * DML row of `table` whose values carry a non-null `column`. Rows
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
    * SecondaryIndexSpec pins the index-ahead-of-store case.
    *
    * Concurrency: ONE maintainer per index — the store's own
    * one-writer-per-table contract extended to its sidecar (the
    * streaming apply loop is serial, so this costs nothing); replays
    * from restarts are safe at any count. */
  def indexBatch(root: String, table: String, column: String,
                 batch: DataFrame, batchId: Long,
                 valueBuckets: Int = DefaultValueBuckets): Unit = {
    val dir = indexDir(root, table, column)
    val fs = fsOf(batch.sparkSession, root)
    recoverSwap(fs, dir)
    fs.mkdirs(new Path(dir))
    val nb = ensureLayout(fs, dir, valueBuckets)
    shapePostings(
      UpsertSink.dmlProjection(batch)
        .filter(col("table") === table)
        .filter(col("op") =!= graft.model.OpType.Delete)
        .select(col("row_key"), lit(batchId).as("batch"),
          try_element_at(col("values"), lit(column)).as("v"))
        .filter(col("v").isNotNull), nb)
      .write.mode("append").partitionBy("vb")
      .parquet(dir)
  }

  /** The postings table, or None when the index directory exists but
    * holds no data files yet (every append so far matched zero rows —
    * [[indexBatch]] creates the directory and `_layout` up front). No
    * postings means nothing was ever indexed, so "no candidates" is
    * the CORRECT answer, not an error. */
  private def readPostings(spark: SparkSession, dir: String): Option[DataFrame] =
    try Some(spark.read.parquet(dir))
    catch { case _: org.apache.spark.sql.AnalysisException => None }

  /** Candidate keys from the postings for a predicate, bounded by
    * `maxKeys` — the index's contract: secondary lookups are for
    * SELECTIVE predicates, and the guard fails loudly rather than
    * silently shipping a data-sized driver collect. */
  private def candidateKeys(posts: Option[DataFrame],
                            filter: DataFrame => DataFrame, what: String,
                            atOrBefore: Option[Long],
                            maxKeys: Int): Seq[String] = posts match {
    case None => Seq.empty
    case Some(p) =>
      val horizon = atOrBefore.fold(filter(p))(h =>
        filter(p).filter(col("batch") <= h))
      val keys = horizon.select(col("row_key")).distinct()
        .limit(maxKeys + 1).collect().map(_.getString(0)).toSeq.sorted
      require(keys.length <= maxKeys,
        s"SecondaryIndex: $what matches more than $maxKeys candidate keys — " +
          "too popular for an index-first point lookup; filter the snapshot " +
          "instead")
      keys
  }

  /** Live rows whose CURRENT `column` value equals `v`, index-first:
    * read the one postings partition `v` hashes to (directory-pruned,
    * re-filtered on the raw value column, batch-bounded under time
    * travel), collect the DISTINCT candidate keys, point-look the store
    * (min(keys, buckets) bucket reads, the pushed `row_key IN` filter),
    * and re-verify the predicate against the live values. */
  def lookupByValue(spark: SparkSession, store: ParquetUpsertStore,
                    root: String, table: String, column: String, v: String,
                    atOrBefore: Option[Long] = None,
                    maxKeys: Int = 100000): DataFrame = {
    val dir = indexDir(root, table, column)
    val fs = fsOf(spark, root)
    recoverSwap(fs, dir)
    requireIndexed(fs, dir, table, column)
    val nb = readLayout(fs, dir).getOrElse(DefaultValueBuckets)
    val keys = candidateKeys(readPostings(spark, dir),
      _.filter(col("vb") === ParquetUpsertStore.bucketOf(v, nb))
        .filter(col("v") === v),
      s"value '$v' of '$table.$column'", atOrBefore, maxKeys)
    store.lookup(spark, table, keys, atOrBefore)
      .filter(try_element_at(col("values"), lit(column)) === v)
  }

  /** Live rows whose CURRENT `column` value, read as a number, lies in
    * `[lo, hi]` — the range twin of [[lookupByValue]]. Hash buckets
    * can't prune a range, so the postings read spans partitions, but
    * the `v_num` predicate is PUSHED to the parquet scan and the
    * sorted-write layout gives each row group tight min/max stats — the
    * scan touches postings files overlapping the range, never the
    * table, and the candidates it yields take the same bounded
    * point-lookup + live re-verification path. Values that don't parse
    * as numbers have NULL `v_num` and never match (a non-numeric value
    * is not in any numeric range). */
  def lookupByRange(spark: SparkSession, store: ParquetUpsertStore,
                    root: String, table: String, column: String,
                    lo: Double, hi: Double,
                    atOrBefore: Option[Long] = None,
                    maxKeys: Int = 100000): DataFrame = {
    val dir = indexDir(root, table, column)
    val fs = fsOf(spark, root)
    recoverSwap(fs, dir)
    requireIndexed(fs, dir, table, column)
    val keys = candidateKeys(readPostings(spark, dir),
      _.filter(col("v_num") >= lo && col("v_num") <= hi),
      s"range [$lo, $hi] of '$table.$column'", atOrBefore, maxKeys)
    store.lookup(spark, table, keys, atOrBefore)
      .filter(try_element_at(col("values"), lit(column)).try_cast("double")
        .between(lo, hi))
  }

  /** Live rows satisfying EVERY given predicate, by INDEX INTERSECTION
    * (the bitmap-AND face every RDBMS ships): each predicate enumerates
    * its own candidate keys from its own column's postings — equality
    * predicates through the hash-bucket-pruned path, numeric ranges
    * through the pushed `v_num` path — the driver intersects the
    * (maxKeys-bounded) sets, and ONE store point lookup re-verifies all
    * predicates against live values. The intersection can only shrink
    * the candidate set, so the point-lookup cost is bounded by the most
    * selective predicate; the guard is per predicate (each index must
    * be selective enough to enumerate — an unselective conjunct belongs
    * on the snapshot-filter plan, and the error says so). Soundness is
    * per-index: every conjunct's live matches are in its own candidate
    * superset, so their intersection contains every live row matching
    * ALL conjuncts — stale entries prune at re-verification. */
  def lookupByAll(spark: SparkSession, store: ParquetUpsertStore,
                  root: String, table: String,
                  equalTo: Map[String, String],
                  inRange: Map[String, (Double, Double)] = Map.empty,
                  atOrBefore: Option[Long] = None,
                  maxKeys: Int = 100000): DataFrame = {
    require(equalTo.nonEmpty || inRange.nonEmpty,
      "SecondaryIndex.lookupByAll: at least one predicate is required")
    val fs = fsOf(spark, root)
    def posts(column: String): (Option[DataFrame], Int) = {
      val dir = indexDir(root, table, column)
      recoverSwap(fs, dir)
      requireIndexed(fs, dir, table, column)
      (readPostings(spark, dir),
        readLayout(fs, dir).getOrElse(DefaultValueBuckets))
    }
    val perPredicate: Seq[Seq[String]] =
      equalTo.toSeq.map { case (c, v) =>
        val (p, nb) = posts(c)
        candidateKeys(p,
          _.filter(col("vb") === ParquetUpsertStore.bucketOf(v, nb))
            .filter(col("v") === v),
          s"value '$v' of '$table.$c'", atOrBefore, maxKeys)
      } ++ inRange.toSeq.map { case (c, (lo, hi)) =>
        candidateKeys(posts(c)._1,
          _.filter(col("v_num") >= lo && col("v_num") <= hi),
          s"range [$lo, $hi] of '$table.$c'", atOrBefore, maxKeys)
      }
    val keys = perPredicate.map(_.toSet).reduce(_ intersect _).toSeq.sorted
    val verified = equalTo.foldLeft(
        store.lookup(spark, table, keys, atOrBefore)) { case (df, (c, v)) =>
      df.filter(try_element_at(col("values"), lit(c)) === v)
    }
    inRange.foldLeft(verified) { case (df, (c, (lo, hi))) =>
      df.filter(try_element_at(col("values"), lit(c)).try_cast("double")
        .between(lo, hi))
    }
  }

  /** Compact the postings log: rebuild everything at or below `asBatch`
    * from the LIVE snapshot as of that id — one linear store scan
    * replacing the folded history, after which every folded posting is
    * current (zero false positives until the next append) and the log
    * stops growing with batch count. Postings from batches ABOVE
    * `asBatch` are carried over verbatim: an in-flight batch that was
    * indexed but not yet applied (the index-first ordering) keeps its
    * postings, so a compaction racing the apply loop at a micro-batch
    * boundary folds away nothing it shouldn't. The remaining unsafe
    * window is a compaction LAUNCHED between a batch's index write and
    * the moment its files are visible to the listing — run compaction
    * at micro-batch boundaries (between foreachBatch invocations), the
    * contract IndexMaintenanceStreamSpec pins.
    *
    * Like [[ParquetUpsertStore.compact]], this collapses history: every
    * rebuilt posting carries `asBatch`, so `lookupByValue(atOrBefore=t)`
    * for t < asBatch finds no postings afterwards — time travel below
    * the compaction point is unsupported, the store's own documented
    * compaction contract. Swap is write-new / rename-aside / rename-in /
    * delete-aside: every rename checks its result, and a crash at any
    * point leaves either the old intact log (possibly renamed aside,
    * restored by [[recoverSwap]] on the next touch) or the complete new
    * one — never a missing or half-truncated index. */
  def compact(spark: SparkSession, store: ParquetUpsertStore,
              root: String, table: String, column: String,
              asBatch: Long): Unit = {
    val dir = indexDir(root, table, column)
    val fs = fsOf(spark, root)
    recoverSwap(fs, dir)
    val nb = readLayout(fs, dir).getOrElse(DefaultValueBuckets)
    val tmp = dir + ".compact-tmp"
    val later =
      try spark.read.parquet(dir).filter(col("batch") > asBatch)
        .select(col("row_key"), col("batch"), col("v"))
      catch { // no postings yet (or only empty appends): nothing to carry
        case _: org.apache.spark.sql.AnalysisException => null
      }
    val rebuilt = store.snapshotAt(spark, table, asBatch)
      .select(col("row_key"), lit(asBatch).as("batch"),
        try_element_at(col("values"), lit(column)).as("v"))
      .filter(col("v").isNotNull)
    shapePostings(Option(later).fold(rebuilt)(rebuilt.unionByName(_)), nb)
      .write.mode("overwrite").partitionBy("vb").parquet(tmp)
    // the new log must carry the layout before it becomes visible
    val out = fs.create(new Path(tmp, "_layout"), true)
    try out.write(s"graft-secondary-index 1\nvalue_buckets $nb\n"
      .getBytes(UTF_8))
    finally out.close()
    val d = new Path(dir)
    val aside = new Path(dir + ".old")
    fs.delete(aside, true) // stale aside from an earlier completed swap
    if (fs.exists(d) && !fs.rename(d, aside))
      throw new java.io.IOException(
        s"SecondaryIndex.compact: rename $d -> $aside failed")
    if (!fs.rename(new Path(tmp), d)) {
      fs.rename(aside, d) // best-effort restore; recoverSwap backstops
      throw new java.io.IOException(
        s"SecondaryIndex.compact: rename $tmp -> $d failed")
    }
    if (fs.exists(aside) && !fs.delete(aside, true))
      throw new java.io.IOException(
        s"SecondaryIndex.compact: delete $aside failed")
  }
}
