package graft

import graft.operators.ChangeFeed
import graft.sinks.{ParquetUpsertStore, SecondaryIndex}
import org.apache.spark.sql.functions._

/** Secondary-index contract: index-first lookups equal snapshot filters
  * exactly — stale postings (value changes, deletes, within-batch
  * supersessions) are false positives the live re-verification prunes,
  * never false negatives; time travel bounds the postings by batch and
  * verifies against the historical snapshot; the over-popular guard and
  * the partition-pruned postings read are both pinned. */
class SecondaryIndexSpec extends SparkSuite {
  import spark.implicits._

  private def env(rows: Seq[(String, String, String, Long)]) =
    ChangeFeed.wrapDml(
      rows.toDF("user_id", "val", "op0", "ver"),
      "t", Seq("user_id"), col("op0"), col("ver"), lit(0L))

  private def liveSet(df: org.apache.spark.sql.DataFrame): Set[(String, Long)] =
    df.select(col("row_key"), col("version"))
      .as[(String, Long)].collect().toSet

  test("index-first lookups equal snapshot filters through change, delete, and time travel") {
    val root = checkpointDir("secidx")
    val store = new ParquetUpsertStore(root, numBuckets = 4)

    val b0 = env(Seq(
      ("k1", "a", "INSERT", 1L), ("k2", "a", "INSERT", 1L),
      ("k3", "a", "INSERT", 1L), ("k4", "b", "INSERT", 1L)))
    val b1 = env(Seq(
      ("k1", "b", "UPDATE", 2L), ("k2", "a", "DELETE", 2L),
      ("k5", "a", "INSERT", 2L)))
    Seq((b0, 0L), (b1, 1L)).foreach { case (b, id) =>
      SecondaryIndex.indexBatch(root, "t", "val", b, id) // index-first contract
      store.applyBatch(b, id)
    }

    def byIndex(v: String, at: Option[Long] = None) = liveSet(
      SecondaryIndex.lookupByValue(spark, store, root, "t", "val", v, at))
    def byScan(v: String, at: Option[Long] = None) = liveSet(
      at.fold(store.snapshot(spark, "t"))(store.snapshotAt(spark, "t", _))
        .filter(try_element_at(col("values"), lit("val")) === v))

    Seq("a", "b", "nope").foreach { v =>
      assert(byIndex(v) == byScan(v), s"live lookup diverges for '$v'")
    }
    // The pruning actually had work to do: k1 changed value, k2 died.
    assert(byIndex("a").map(_._1) == Set("k3", "k5"))
    assert(byIndex("b").map(_._1) == Set("k1", "k4"))

    // Time travel: postings batch-bounded, verified at the old snapshot.
    Seq("a", "b").foreach { v =>
      assert(byIndex(v, Some(0L)) == byScan(v, Some(0L)),
        s"as-of lookup diverges for '$v'")
    }
    assert(byIndex("a", Some(0L)).map(_._1) ==
      Set("k1", "k2", "k3"))

    // Redelivery: re-indexing an applied batch duplicates postings and
    // changes nothing (the lookup's DISTINCT + live verification).
    SecondaryIndex.indexBatch(root, "t", "val", b1, 1L)
    assert(byIndex("a") == byScan("a"), "duplicate postings leaked through")

    // Over-popular value fails loudly instead of a data-sized collect.
    val e = intercept[IllegalArgumentException](
      SecondaryIndex.lookupByValue(spark, store, root, "t", "val", "a",
        maxKeys = 1))
    assert(e.getMessage.contains("too popular"))

    // Compaction: rebuilt from the live snapshot, answers unchanged,
    // stale postings gone (exactly one row per live indexed value), and
    // a post-compaction append still lands.
    SecondaryIndex.compact(spark, store, root, "t", "val", asBatch = 1L)
    Seq("a", "b", "nope").foreach { v =>
      assert(byIndex(v) == byScan(v), s"post-compaction lookup diverges for '$v'")
    }
    val postRows = spark.read
      .parquet(SecondaryIndex.postingsDir(spark, root, "t", "val")).count()
    assert(postRows == 4L, s"compacted postings must equal live rows, got $postRows")
    // Index-before-apply ordering (the crash-safety contract): with
    // the postings written but the store batch NOT yet applied, the
    // new key is a harmless false positive — lookups stay equal to
    // the snapshot. After the apply lands, it surfaces.
    val b2 = env(Seq(("k6", "a", "INSERT", 3L)))
    SecondaryIndex.indexBatch(root, "t", "val", b2, 2L)
    assert(byIndex("a").map(_._1) == Set("k3", "k5"),
      "postings ahead of the store must prune, not surface")
    assert(byIndex("a") == byScan("a"))
    store.applyBatch(b2, 2L)
    assert(byIndex("a").map(_._1) == Set("k3", "k5", "k6"))
    assert(byIndex("a") == byScan("a"))

    // The postings read is bucket-partition-pruned at the source: the
    // value hashes to one vb partition, the raw value re-filters as an
    // ordinary pushed data predicate.
    val posts = spark.read
      .parquet(SecondaryIndex.postingsDir(spark, root, "t", "val"))
      .filter(col("vb") === 7).filter(col("v") === "a")
    posts.collect()
    val plan = posts.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("vb#"),
      s"postings scan lost its partition pruning:\n$plan")
  }

  test("empty-string and numeric-looking values round-trip exactly") {
    // A raw-value partition column would Hive-encode "" as
    // __HIVE_DEFAULT_PARTITION__ (read back NULL — a permanent false
    // negative) and type-infer "123"/"1.5" into int/double equality;
    // the hash-bucketed layout keeps the value as a string data column.
    val root = checkpointDir("secidx-oddvals")
    val store = new ParquetUpsertStore(root, numBuckets = 4)
    val b0 = env(Seq(
      ("k1", "", "INSERT", 1L), ("k2", "123", "INSERT", 1L),
      ("k3", "1.50", "INSERT", 1L), ("k4", "01", "INSERT", 1L),
      ("k5", "1", "INSERT", 1L), ("k6", "", "INSERT", 1L)))
    SecondaryIndex.indexBatch(root, "t", "val", b0, 0L)
    store.applyBatch(b0, 0L)
    def byIndex(v: String) = liveSet(
      SecondaryIndex.lookupByValue(spark, store, root, "t", "val", v))
    def byScan(v: String) = liveSet(store.snapshot(spark, "t")
      .filter(try_element_at(col("values"), lit("val")) === v))
    Seq("", "123", "1.50", "01", "1", "1.5").foreach { v =>
      assert(byIndex(v) == byScan(v), s"lookup diverges for '$v'")
    }
    assert(byIndex("").map(_._1) == Set("k1", "k6"),
      "empty-string values must survive the postings round-trip")
    // string semantics preserved: "01" and "1" are DIFFERENT values
    assert(byIndex("01").map(_._1) == Set("k4"))
    assert(byIndex("1").map(_._1) == Set("k5"))
    // compaction preserves them too
    SecondaryIndex.compact(spark, store, root, "t", "val", asBatch = 0L)
    Seq("", "123", "01", "1").foreach { v =>
      assert(byIndex(v) == byScan(v), s"post-compaction diverges for '$v'")
    }
  }

  test("high-cardinality column: bounded directory count, lookups still pruned") {
    val root = checkpointDir("secidx-hicard")
    val store = new ParquetUpsertStore(root, numBuckets = 4)
    // ~unique values: one per key — the raw-value layout would write
    // one directory per row per append.
    val rows = (1 to 200).map(i => (s"k$i", s"u-$i", "INSERT", 1L))
    val b0 = env(rows)
    SecondaryIndex.indexBatch(root, "t", "val", b0, 0L, valueBuckets = 8)
    store.applyBatch(b0, 0L)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(
        SecondaryIndex.postingsDir(spark, root, "t", "val")))
      .map(_.getPath.getName).filter(_.startsWith("vb="))
    assert(dirs.length <= 8,
      s"directory count must be bounded by valueBuckets, got ${dirs.length}")
    // a later writer with a DIFFERENT (default) bucket parameter must
    // follow the recorded layout, not fork it
    val b1 = env(Seq(("k201", "u-201", "INSERT", 2L)))
    SecondaryIndex.indexBatch(root, "t", "val", b1, 1L)
    store.applyBatch(b1, 1L)
    Seq("u-1", "u-137", "u-201", "nope").foreach { v =>
      assert(liveSet(SecondaryIndex.lookupByValue(
          spark, store, root, "t", "val", v)) ==
        liveSet(store.snapshot(spark, "t")
          .filter(try_element_at(col("values"), lit("val")) === v)),
        s"lookup diverges for '$v'")
    }
  }

  test("range lookup equals the snapshot filter, through change and compaction") {
    val root = checkpointDir("secidx-range")
    val store = new ParquetUpsertStore(root, numBuckets = 4)
    val b0 = env(Seq(
      ("k1", "10", "INSERT", 1L), ("k2", "25", "INSERT", 1L),
      ("k3", "30.5", "INSERT", 1L), ("k4", "99", "INSERT", 1L),
      ("k5", "not-a-number", "INSERT", 1L)))
    val b1 = env(Seq(
      ("k1", "50", "UPDATE", 2L), // leaves [0,30] — stale posting prunes
      ("k4", "99", "DELETE", 2L),
      ("k6", "12", "INSERT", 2L)))
    Seq((b0, 0L), (b1, 1L)).foreach { case (b, id) =>
      SecondaryIndex.indexBatch(root, "t", "val", b, id)
      store.applyBatch(b, id)
    }
    def byIndex(lo: Double, hi: Double) = liveSet(
      SecondaryIndex.lookupByRange(spark, store, root, "t", "val", lo, hi))
    def byScan(lo: Double, hi: Double) = liveSet(store.snapshot(spark, "t")
      .filter(try_element_at(col("values"), lit("val")).try_cast("double")
        .between(lo, hi)))
    Seq((0.0, 30.0), (12.0, 60.0), (1000.0, 2000.0)).foreach { case (lo, hi) =>
      assert(byIndex(lo, hi) == byScan(lo, hi),
        s"range lookup diverges for [$lo, $hi]")
    }
    assert(byIndex(0.0, 30.0).map(_._1) == Set(// k1 changed, k4 died
      "k2", "k6"), "stale range postings must prune")
    assert(byIndex(12.0, 60.0).map(_._1) == Set("k1", "k2", "k3", "k6"))
    // the range predicate is PUSHED to the postings scan (pre-compact:
    // the postings live in the `_appends/` flush log, where v_num rides
    // as a sorted data column — the pushdown must reach that scan too)
    val posts = SecondaryIndex.readPostings(spark, root, "t", "val")
      .filter(col("v_num") >= 0.0 && col("v_num") <= 30.0)
    val plan = posts.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(v_num"),
      s"range predicate not pushed to the postings scan:\n$plan")
    // over-popular range fails loudly
    val e = intercept[IllegalArgumentException](
      SecondaryIndex.lookupByRange(spark, store, root, "t", "val",
        0.0, 1000.0, maxKeys = 1))
    assert(e.getMessage.contains("too popular"))
    SecondaryIndex.compact(spark, store, root, "t", "val", asBatch = 1L)
    Seq((0.0, 30.0), (12.0, 60.0)).foreach { case (lo, hi) =>
      assert(byIndex(lo, hi) == byScan(lo, hi),
        s"post-compaction range diverges for [$lo, $hi]")
    }
  }

  test("prefix lookup equals the snapshot LIKE filter, through change and delete") {
    val root = checkpointDir("secidx-prefix")
    val store = new ParquetUpsertStore(root, numBuckets = 4)
    val b0 = env(Seq(
      ("k1", "web/home", "INSERT", 1L), ("k2", "web/cart", "INSERT", 1L),
      ("k3", "api/v1", "INSERT", 1L), ("k4", "web", "INSERT", 1L)))
    val b1 = env(Seq(
      ("k1", "api/v2", "UPDATE", 2L),  // leaves the web/ prefix
      ("k2", "web/cart", "DELETE", 2L),
      ("k5", "web/search", "INSERT", 2L)))
    Seq((b0, 0L), (b1, 1L)).foreach { case (b, id) =>
      SecondaryIndex.indexBatch(root, "t", "val", b, id)
      store.applyBatch(b, id)
    }
    def byIndex(p: String) = liveSet(
      SecondaryIndex.lookupByPrefix(spark, store, root, "t", "val", p))
    def byScan(p: String) = liveSet(store.snapshot(spark, "t")
      .filter(try_element_at(col("values"), lit("val")).startsWith(p)))
    Seq("web/", "web", "api", "nope").foreach { p =>
      assert(byIndex(p) == byScan(p), s"prefix lookup diverges for '$p'")
    }
    // stale postings pruned: k1 left the prefix, k2 died, k5 entered
    assert(byIndex("web/").map(_._1) == Set("k5"))
    assert(byIndex("web").map(_._1) == Set("k4", "k5"))
    // compaction preserves prefix answers
    SecondaryIndex.compact(spark, store, root, "t", "val", asBatch = 1L)
    Seq("web/", "api").foreach { p =>
      assert(byIndex(p) == byScan(p), s"post-compaction prefix diverges '$p'")
    }
  }

  test("an index whose appends all matched zero rows answers empty, not an error") {
    // indexBatch creates the directory and _layout up front; if every
    // append so far carried no rows with the column, there are no data
    // files — "no candidates" is the correct answer (nothing was ever
    // indexed, so nothing live carries the column).
    val root = checkpointDir("secidx-empty")
    val store = new ParquetUpsertStore(root, numBuckets = 4)
    val b0 = ChangeFeed.wrapDml(
      Seq(("k1", "INSERT", 1L)).toDF("user_id", "op0", "ver"),
      "t", Seq("user_id"), col("op0"), col("ver"), lit(0L))
    SecondaryIndex.indexBatch(root, "t", "nocol", b0, 0L) // column absent
    store.applyBatch(b0, 0L)
    assert(liveSet(SecondaryIndex.lookupByValue(
      spark, store, root, "t", "nocol", "x")).isEmpty)
    assert(liveSet(SecondaryIndex.lookupByRange(
      spark, store, root, "t", "nocol", 0.0, 9.0)).isEmpty)
    assert(liveSet(SecondaryIndex.lookupByAll(spark, store, root, "t",
      equalTo = Map("nocol" -> "x"))).isEmpty)
  }

  test("index intersection equals the conjunctive snapshot filter") {
    // Two indexed columns; rows move in and out of each predicate
    // across batches so both candidate sets carry stale entries the
    // live re-verification must prune, and the intersection must
    // contain every row matching BOTH conjuncts.
    val root = checkpointDir("secidx-and")
    val store = new ParquetUpsertStore(root, numBuckets = 4)
    def env2(rows: Seq[(String, String, String, String, Long)]) =
      ChangeFeed.wrapDml(
        rows.toDF("user_id", "cat", "score", "op0", "ver"),
        "t", Seq("user_id"), col("op0"), col("ver"), lit(0L))
    val b0 = env2(Seq(
      ("k1", "a", "10", "INSERT", 1L), ("k2", "a", "99", "INSERT", 1L),
      ("k3", "b", "15", "INSERT", 1L), ("k4", "a", "20", "INSERT", 1L)))
    val b1 = env2(Seq(
      ("k1", "b", "10", "UPDATE", 2L),  // leaves cat=a
      ("k2", "a", "12", "UPDATE", 2L),  // enters the range
      ("k4", "a", "20", "DELETE", 2L),
      ("k5", "a", "18", "INSERT", 2L)))
    Seq((b0, 0L), (b1, 1L)).foreach { case (b, id) =>
      SecondaryIndex.indexBatch(root, "t", "cat", b, id)
      SecondaryIndex.indexBatch(root, "t", "score", b, id)
      store.applyBatch(b, id)
    }
    def byIndex(cat: String, lo: Double, hi: Double) = liveSet(
      SecondaryIndex.lookupByAll(spark, store, root, "t",
        equalTo = Map("cat" -> cat), inRange = Map("score" -> (lo, hi))))
    def byScan(cat: String, lo: Double, hi: Double) = liveSet(
      store.snapshot(spark, "t")
        .filter(try_element_at(col("values"), lit("cat")) === cat)
        .filter(try_element_at(col("values"), lit("score"))
          .try_cast("double").between(lo, hi)))
    Seq(("a", 5.0, 19.0), ("b", 5.0, 19.0), ("a", 50.0, 60.0))
      .foreach { case (c, lo, hi) =>
        assert(byIndex(c, lo, hi) == byScan(c, lo, hi),
          s"intersection diverges for cat=$c score in [$lo,$hi]")
      }
    // k1 left cat=a (stale in cat postings), k2 entered the range, k4
    // died, k5 inserted matching both — the pruning had work on BOTH
    // sides.
    assert(byIndex("a", 5.0, 19.0).map(_._1) == Set("k2", "k5"))
    assert(byIndex("b", 5.0, 19.0).map(_._1) == Set("k1", "k3"))
    // equality-only and range-only degenerate cases match their
    // single-index twins
    assert(liveSet(SecondaryIndex.lookupByAll(spark, store, root, "t",
        equalTo = Map("cat" -> "a"))) ==
      liveSet(SecondaryIndex.lookupByValue(spark, store, root, "t",
        "cat", "a")))
    // at least one predicate is required
    val e = intercept[IllegalArgumentException](
      SecondaryIndex.lookupByAll(spark, store, root, "t", Map.empty))
    assert(e.getMessage.contains("at least one predicate"))
    // the per-index guard still fires through the composite path
    val e2 = intercept[IllegalArgumentException](
      SecondaryIndex.lookupByAll(spark, store, root, "t",
        equalTo = Map("cat" -> "a"), maxKeys = 1))
    assert(e2.getMessage.contains("too popular"))
    // a predicate on a never-indexed column is a NAMED error, not a
    // Spark path-not-found
    val e3 = intercept[IllegalArgumentException](
      SecondaryIndex.lookupByAll(spark, store, root, "t",
        equalTo = Map("cat" -> "a", "nosuchcol" -> "x")))
    assert(e3.getMessage.contains("no index exists"))
  }

  test("compaction is reader-atomic and crash-safe, and retains in-flight postings") {
    val root = checkpointDir("secidx-crash")
    val store = new ParquetUpsertStore(root, numBuckets = 4)
    val b0 = env(Seq(("k1", "a", "INSERT", 1L), ("k2", "b", "INSERT", 1L)))
    SecondaryIndex.indexBatch(root, "t", "val", b0, 0L)
    store.applyBatch(b0, 0L)
    val dir = SecondaryIndex.indexDir(root, "t", "val")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def byIndex(v: String) = liveSet(
      SecondaryIndex.lookupByValue(spark, store, root, "t", "val", v))
    def byScan(v: String) = liveSet(store.snapshot(spark, "t")
      .filter(try_element_at(col("values"), lit("val")) === v))
    def names() = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName).toSet

    // Simulate a compact that crashed AFTER writing its new generation
    // but BEFORE the pointer commit: an orphan gen dir with garbage
    // content. Visibility is unchanged (the pointer still names the old
    // generation), so reads answer from the intact old log.
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/gen-99"))
    assert(byIndex("a") == byScan("a"), "orphan generation must be invisible")
    assert(byIndex("a").map(_._1) == Set("k1"))
    // The next compaction numbers PAST the orphan (never reuses a
    // possibly-garbage directory), commits, and cleans it up.
    SecondaryIndex.compact(spark, store, root, "t", "val", asBatch = 0L)
    assert(byIndex("a") == byScan("a"))
    assert(!names().contains("gen-99"), "orphan generation must be cleaned")
    assert(names().exists(_.matches("_gen-\\d+")), "pointer must exist")

    // Reader-atomicity invariant: compaction RETAINS the previous
    // generation (a reader that resolved the old pointer finishes
    // against intact files) and deletes only older ones.
    val currentBefore = new java.io.File(
      SecondaryIndex.postingsDir(spark, root, "t", "val")).getName
    SecondaryIndex.compact(spark, store, root, "t", "val", asBatch = 0L)
    val gensAfterSecond = names().filter(_.startsWith("gen-"))
    assert(gensAfterSecond.size == 2,
      s"current + previous generation must survive: $gensAfterSecond")
    assert(gensAfterSecond.contains(currentBefore),
      s"previous generation $currentBefore must be retained as the grace " +
        s"copy: $gensAfterSecond")

    // In-flight retention: a batch indexed but NOT yet applied (the
    // index-first ordering) survives a compaction at an older id —
    // folding it away would be a permanent false negative once the
    // apply lands.
    val b1 = env(Seq(("k3", "a", "INSERT", 2L)))
    SecondaryIndex.indexBatch(root, "t", "val", b1, 1L)
    SecondaryIndex.compact(spark, store, root, "t", "val", asBatch = 0L)
    assert(byIndex("a") == byScan("a"), "pre-apply: in-flight postings prune")
    store.applyBatch(b1, 1L)
    assert(byIndex("a").map(_._1) == Set("k1", "k3"),
      "compaction must not fold away in-flight postings")
    assert(byIndex("a") == byScan("a"))
  }

  test("partial adoption degrades to a correct unpruned answer, and compaction restores pruning") {
    // The index's no-false-negative premise is "every applied batch was
    // indexed". When a batch is applied WITHOUT indexBatch (partial
    // adoption, a swallowed failure), the coverage cross-check must
    // catch it and answer from the snapshot — a pruned answer here
    // would silently drop k9.
    val root = checkpointDir("secidx-cover")
    val store = new ParquetUpsertStore(root, numBuckets = 4)
    val b0 = env(Seq(("k1", "a", "INSERT", 1L), ("k2", "b", "INSERT", 1L)))
    SecondaryIndex.indexBatch(root, "t", "val", b0, 0L)
    store.applyBatch(b0, 0L)
    val b1 = env(Seq(("k9", "a", "INSERT", 2L)))
    store.applyBatch(b1, 1L) // NOT indexed — the adoption gap
    def byIndex(v: String) = liveSet(
      SecondaryIndex.lookupByValue(spark, store, root, "t", "val", v))
    def byScan(v: String) = liveSet(store.snapshot(spark, "t")
      .filter(try_element_at(col("values"), lit("val")) === v))
    assert(byIndex("a") == byScan("a"),
      "coverage gap must degrade to the snapshot filter, not drop rows")
    assert(byIndex("a").map(_._1) == Set("k1", "k9"))
    // same through the composite path
    assert(liveSet(SecondaryIndex.lookupByAll(spark, store, root, "t",
      equalTo = Map("val" -> "a"))).map(_._1) == Set("k1", "k9"))
    // compaction rebuilds from the live snapshot → coverage restored,
    // k9 now in the postings, answers unchanged
    SecondaryIndex.compact(spark, store, root, "t", "val", asBatch = 1L)
    assert(byIndex("a") == byScan("a"))
    assert(spark.read
      .parquet(SecondaryIndex.postingsDir(spark, root, "t", "val"))
      .filter(col("row_key") === "k9").count() == 1L,
      "compaction must restore coverage for the unindexed batch")

    // Vacuum-floor face of the same hole: apply + index another batch,
    // then vacuum history away. Vacuumed manifests are unlistable, so
    // the marker cross-check alone would pass VACUOUSLY — the floor
    // guard must force the fallback until a compaction at or above the
    // floor vouches for everything below it.
    val b2 = env(Seq(("k10", "a", "INSERT", 3L)))
    SecondaryIndex.indexBatch(root, "t", "val", b2, 2L)
    store.applyBatch(b2, 2L)
    store.vacuum(spark, "t", keepFromBatchId = 2L)
    // covered_through=1 < floor=2 → unsound → unpruned fallback, correct
    assert(byIndex("a") == byScan("a"), "post-vacuum lookup diverges")
    assert(byIndex("a").map(_._1) == Set("k1", "k9", "k10"))
    // a compaction at the floor restores provable coverage
    SecondaryIndex.compact(spark, store, root, "t", "val", asBatch = 2L)
    assert(byIndex("a") == byScan("a"))
    assert(byIndex("a").map(_._1) == Set("k1", "k9", "k10"))
  }

  test("compaction cannot vouch for the future: covered_through clamps to committed history") {
    // compact(asBatch) with an id above the last committed manifest must
    // NOT claim coverage of batch ids that haven't committed yet — a
    // later batch applied without indexBatch would then prune silently
    // wrong forever. The clamp also protects index-ahead-of-apply
    // postings: a compact racing the apply loop (postings written,
    // manifest not yet committed) must carry them, not fold them away.
    val root = checkpointDir("secidx-clamp")
    val store = new ParquetUpsertStore(root, numBuckets = 4)
    val b0 = env(Seq(("k1", "a", "INSERT", 1L), ("k2", "b", "INSERT", 1L)))
    SecondaryIndex.indexBatch(root, "t", "val", b0, 0L)
    store.applyBatch(b0, 0L)
    // API misuse: compact claiming a far-future horizon
    SecondaryIndex.compact(spark, store, root, "t", "val", asBatch = 999L)
    // batch 1 commits WITHOUT indexBatch — coverage must be unsound
    val b1 = env(Seq(("k9", "a", "INSERT", 2L)))
    store.applyBatch(b1, 1L)
    def byIndex(v: String) = liveSet(
      SecondaryIndex.lookupByValue(spark, store, root, "t", "val", v))
    def byScan(v: String) = liveSet(store.snapshot(spark, "t")
      .filter(try_element_at(col("values"), lit("val")) === v))
    assert(byIndex("a") == byScan("a"),
      "future-claiming compact must not vouch for an unindexed later batch")
    assert(byIndex("a").map(_._1) == Set("k1", "k9"))

    // in-flight postings survive an empty-store compact: index first
    // (the ordering contract), compact BEFORE the apply commits, then
    // apply — the lookup must still see the batch's rows index-first
    val root2 = checkpointDir("secidx-clamp2")
    val store2 = new ParquetUpsertStore(root2, numBuckets = 4)
    val c0 = env(Seq(("k1", "a", "INSERT", 1L)))
    SecondaryIndex.indexBatch(root2, "t", "val", c0, 0L)
    SecondaryIndex.compact(spark, store2, root2, "t", "val", asBatch = 0L)
    store2.applyBatch(c0, 0L)
    assert(liveSet(SecondaryIndex.lookupByValue(spark, store2, root2, "t",
      "val", "a")).map(_._1) == Set("k1"),
      "an empty-store compact must carry in-flight postings verbatim")
  }

  test("cheapest-first planning: a popular conjunct no longer fails a selective query") {
    val root = checkpointDir("secidx-cheapest")
    val store = new ParquetUpsertStore(root, numBuckets = 4)
    def env2(rows: Seq[(String, String, String, String, Long)]) =
      ChangeFeed.wrapDml(
        rows.toDF("user_id", "cat", "score", "op0", "ver"),
        "t", Seq("user_id"), col("op0"), col("ver"), lit(0L))
    // cat is POPULAR (every row 'hot'), score is selective
    val b0 = env2((1 to 40).map(i =>
      (s"k$i", "hot", (i * 10).toString, "INSERT", i.toLong)))
    SecondaryIndex.indexBatch(root, "t", "cat", b0, 0L)
    SecondaryIndex.indexBatch(root, "t", "score", b0, 0L)
    store.applyBatch(b0, 0L)
    // maxKeys=5: the cat index alone matches 40 keys (over budget); the
    // score range matches 2. r15 enumerated EVERY conjunct and threw on
    // cat; cheapest-first answers from score and verifies cat live.
    val got = liveSet(SecondaryIndex.lookupByAll(spark, store, root, "t",
      equalTo = Map("cat" -> "hot"), inRange = Map("score" -> (100.0, 110.0)),
      maxKeys = 5))
    assert(got.map(_._1) == Set("k10", "k11"), s"got $got")
    // and when EVERY conjunct is over budget, the guard still fires
    val e = intercept[IllegalArgumentException](
      SecondaryIndex.lookupByAll(spark, store, root, "t",
        equalTo = Map("cat" -> "hot"), inRange = Map("score" -> (0.0, 1e6)),
        maxKeys = 5))
    assert(e.getMessage.contains("too popular"))
  }

  test("post-compaction conjunct ordering is a metadata read (zero probe jobs)") {
    val root = checkpointDir("secidx-stats")
    val store = new ParquetUpsertStore(root, numBuckets = 4)
    def env2(rs: Seq[(String, String, String, String, Long)]) =
      ChangeFeed.wrapDml(rs.toDF("user_id", "val", "num", "op0", "ver"),
        "t", Seq("user_id"), col("op0"), col("ver"), lit(0L))
    val b0 = env2((1L to 40L).map(i =>
      (s"k$i", if (i <= 4) "rare" else "common", i.toString, "INSERT", i)))
    SecondaryIndex.indexBatch(root, "t", "val", b0, 0L)
    SecondaryIndex.indexBatch(root, "t", "num", b0, 0L)
    store.applyBatch(b0, 0L)
    def conj = SecondaryIndex.lookupByAll(spark, store, root, "t",
      equalTo = Map("val" -> "rare"), inRange = Map("num" -> (0.0, 100.0)))
    val expect = (1L to 4L).map(i => s"k$i").toSet
    // un-compacted indexes: ordering must PROBE each conjunct (a job)
    SecondaryIndex.probeJobs.set(0L)
    assert(liveSet(conj).map(_._1) == expect)
    assert(SecondaryIndex.probeJobs.get() == 2,
      "pre-compaction ordering probes each conjunct's postings")
    // compaction records total + per-bucket posting counts in the
    // pointer — ordering becomes a metadata read, answers unchanged
    SecondaryIndex.compact(spark, store, root, "t", "val", asBatch = 0L)
    SecondaryIndex.compact(spark, store, root, "t", "num", asBatch = 0L)
    SecondaryIndex.probeJobs.set(0L)
    assert(liveSet(conj).map(_._1) == expect)
    assert(SecondaryIndex.probeJobs.get() == 0,
      "post-compaction ordering must not run probe jobs")
  }

  test("composite pair index answers a popular-AND-popular conjunction both singles overflow") {
    // 64 rows: 'city' has 2 values (32 keys each), 'kind' has 2 values
    // (32 keys each), but the PAIR (city=e, kind=x) holds only 2 keys
    // (k31, k32) — the at-scale shape where each single enumeration
    // overflows maxKeys and only the composite postings bound the
    // lookup.
    val root = checkpointDir("secidx-pair")
    val store = new ParquetUpsertStore(root, numBuckets = 4)
    def rows(b: Long) = (1L to 64L).filter(_ % 2 == b).map { i =>
      val city = if (i <= 32) "e" else "w"
      val kind = if (i >= 31 && i <= 62) "x" else "y"
      (s"k$i", city, kind, "INSERT", i)
    }
    def env2(rs: Seq[(String, String, String, String, Long)]) =
      ChangeFeed.wrapDml(rs.toDF("user_id", "city", "kind", "op0", "ver"),
        "t", Seq("user_id"), col("op0"), col("ver"), lit(0L))
    Seq(0L, 1L).foreach { b =>
      val part = env2(rows(b))
      SecondaryIndex.indexBatch(root, "t", "city", part, b)
      SecondaryIndex.indexBatch(root, "t", "kind", part, b)
      store.applyBatch(part, b)
    }
    def conj = SecondaryIndex.lookupByAll(spark, store, root, "t",
      equalTo = Map("city" -> "e", "kind" -> "x"), maxKeys = 8)
    // without a pair index: every single conjunct overflows maxKeys=8
    val e = intercept[IllegalArgumentException] { conj.collect() }
    assert(e.getMessage.contains("more than 8"))
    // the pair index bounds it — backfill coverage for both batches,
    // in either column order (canonicalized)
    Seq(0L, 1L).foreach { b =>
      SecondaryIndex.indexBatchComposite(root, "t", Seq("kind", "city"),
        env2(rows(b)), b)
    }
    assert(liveSet(conj).map(_._1) == Set("k31", "k32"),
      "pair index must answer the conjunction both singles cannot bound")
    // stale pair postings prune: k31 leaves the pair, k2 enters it
    val b2 = env2(Seq(("k31", "e", "y", "UPDATE", 100L),
      ("k2", "e", "x", "UPDATE", 101L)))
    SecondaryIndex.indexBatch(root, "t", "city", b2, 2L)
    SecondaryIndex.indexBatch(root, "t", "kind", b2, 2L)
    SecondaryIndex.indexBatchComposite(root, "t", Seq("city", "kind"), b2, 2L)
    store.applyBatch(b2, 2L)
    assert(liveSet(conj).map(_._1) == Set("k2", "k32"))
    // composite compaction folds the pair postings and keeps answers
    SecondaryIndex.compactComposite(spark, store, root, "t",
      Seq("city", "kind"), asBatch = 2L)
    assert(liveSet(conj).map(_._1) == Set("k2", "k32"))
    // a pair-coverage gap only demotes the pair from candidate duty —
    // the lookup falls back to the singles (here: overflow error again,
    // loudly) rather than pruning from a stale pair
    val b3 = env2(Seq(("k3", "e", "x", "UPDATE", 200L)))
    SecondaryIndex.indexBatch(root, "t", "city", b3, 3L)
    SecondaryIndex.indexBatch(root, "t", "kind", b3, 3L)
    store.applyBatch(b3, 3L) // pair NOT indexed for batch 3
    val e2 = intercept[IllegalArgumentException] { conj.collect() }
    assert(e2.getMessage.contains("more than 8"),
      "an uncovered pair index must lose candidate duty, not answer stale")

    // pair-ONLY deployment: no single index at all — the pair covers
    // both columns for candidate duty, re-verification does the rest;
    // a column covered by NEITHER still raises the named error
    val root2 = checkpointDir("secidx-pair-only")
    val store2 = new ParquetUpsertStore(root2, numBuckets = 4)
    val p0 = env2(rows(0L) ++ rows(1L))
    SecondaryIndex.indexBatchComposite(root2, "t", Seq("city", "kind"), p0, 0L)
    store2.applyBatch(p0, 0L)
    assert(liveSet(SecondaryIndex.lookupByAll(spark, store2, root2, "t",
      equalTo = Map("city" -> "e", "kind" -> "x"), maxKeys = 8))
      .map(_._1) == Set("k31", "k32"))
    val e3 = intercept[IllegalArgumentException] {
      SecondaryIndex.lookupByAll(spark, store2, root2, "t",
        equalTo = Map("city" -> "e", "other" -> "z"))
    }
    assert(e3.getMessage.contains("no index exists"))
  }

  test("index and bloom artifacts survive store layout evolution (rebucket, compact, vacuum)") {
    import graft.sinks.KeyBloom
    val root = checkpointDir("secidx-layout")
    val store = new ParquetUpsertStore(root, numBuckets = 2)
    val b0 = env(Seq(("k1", "a", "INSERT", 1L), ("k2", "b", "INSERT", 1L),
      ("k3", "a", "INSERT", 1L)))
    val b1 = env(Seq(("k2", "a", "UPDATE", 2L), ("k4", "b", "INSERT", 2L)))
    Seq((b0, 0L), (b1, 1L)).foreach { case (b, id) =>
      SecondaryIndex.indexBatch(root, "t", "val", b, id)
      KeyBloom.addBatch(spark, root, "t", b, id, expectedItems = 100L)
      store.applyBatch(b, id)
    }
    def check(tag: String): Unit = {
      Seq("a", "b").foreach { v =>
        val byIdx = liveSet(SecondaryIndex.lookupByValue(
          spark, store, root, "t", "val", v))
        val byScan = liveSet(store.snapshot(spark, "t")
          .filter(try_element_at(col("values"), lit("val")) === v))
        assert(byIdx == byScan, s"[$tag] value '$v': $byIdx vs $byScan")
      }
      assert(liveSet(KeyBloom.lookup(spark, store, root, "t",
        Seq("k1", "k4", "ghost"))) ==
        liveSet(store.lookup(spark, "t", Seq("k1", "k4", "ghost"))),
        s"[$tag] bloom-fronted lookup diverged")
    }
    check("baseline")
    // The store's physical layout evolves under the artifacts' feet:
    // rebucket changes the key→bucket map, compact rewrites snapshots,
    // vacuum deletes history — the index/bloom layouts are siblings the
    // store never touches, and the lookups recompute buckets from the
    // CURRENT manifest.
    store.rebucket(spark, "t", newNumBuckets = 5, asBatchId = 2L)
    check("after rebucket")
    store.compact(spark, "t", asBatchId = 3L)
    check("after compact")
    store.vacuum(spark, "t", keepFromBatchId = 3L)
    check("after vacuum")
    // artifacts still physically present
    assert(SecondaryIndex.readPostings(spark, root, "t", "val")
      .count() > 0, "vacuum deleted the index postings")
  }

  test("model fuzz: random op sequences keep index-first equal to snapshot filters") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[T](g: Gen[T], seed: Long): T =
      g.apply(Gen.Parameters.default, Seed(seed)).get
    val opsGen = Gen.listOfN(60, for {
      k <- Gen.choose(1, 8).map(i => s"k$i")
      v <- Gen.oneOf("x", "y", "z")
      op <- Gen.frequency(5 -> "INSERT", 3 -> "UPDATE", 2 -> "DELETE")
    } yield (k, v, op))

    (1L to 4L).foreach { seed =>
      val root = checkpointDir(s"secidx-fuzz-$seed")
      val store = new ParquetUpsertStore(root, numBuckets = 4)
      val ops = sample(opsGen, seed).zipWithIndex
        .map { case ((k, v, op), i) => (k, v, op, (i + 1).toLong) }
      // Three batches in version order — the store's normal cadence.
      ops.grouped(20).zipWithIndex.foreach { case (g, id) =>
        val b = env(g)
        SecondaryIndex.indexBatch(root, "t", "val", b, id.toLong)
        store.applyBatch(b, id.toLong)
      }
      Seq("x", "y", "z", "absent").foreach { v =>
        val byIdx = liveSet(SecondaryIndex.lookupByValue(
          spark, store, root, "t", "val", v))
        val byScan = liveSet(store.snapshot(spark, "t")
          .filter(try_element_at(col("values"), lit("val")) === v))
        assert(byIdx == byScan, s"seed=$seed value='$v': $byIdx vs $byScan")
      }
    }
  }
}
