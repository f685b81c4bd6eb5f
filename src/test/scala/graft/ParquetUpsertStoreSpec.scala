package graft

import graft.model._
import graft.sinks.{ParquetUpsertStore, UpsertSink}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** The durable, cluster-valid CDC target: streaming I/U/D application with
  * mid-stream schema evolution, replay idempotence, manifest-consistent
  * bucketing across store handles, and tombstone compaction (the reference
  * sink suite's scenarios, CDCBigTablePluginIntegrationTest.java:119-316,
  * re-expressed against the parquet/manifest store — no InMemoryStore
  * involvement anywhere in this suite). */
class ParquetUpsertStoreSpec extends SparkSuite {
  import spark.implicits._

  private val s1 = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))
  private val s2 = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType),
    StructField("extra", StringType)))

  private def ddl(schema: StructType) =
    ChangeRecord.ofDdl(Ddl("dbo.t", schema.json))
  private def dml(op: String, version: Long, id: Long, values: (String, String)*) =
    ChangeRecord.ofDml(Dml(op, "dbo.t", Seq("id"),
      s1.json, Map("id" -> id.toString) ++ values.toMap, version.toString, 0L))

  private def storeDir(tag: String): String = checkpointDir(s"store-$tag")

  /** snapshot rows keyed by row_key → (values map, version). */
  private def state(store: ParquetUpsertStore): Map[String, (Map[String, String], Long)] =
    store.snapshot(spark, "dbo.t")
      .collect()
      .map(r => r.getString(0) ->
        (r.getMap[String, String](2).toMap, r.getLong(3)))
      .toMap

  test("streaming I/U/D with mid-stream schema evolution converges to the expected snapshot") {
    val store = new ParquetUpsertStore(storeDir("stream"), numBuckets = 4)
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[ChangeRecord]
    val q = UpsertSink.stream(in.toDF(), store, checkpointDir("pus-stream"))

    // batch 0: create + 2 inserts + same-batch update of row 1 (compaction
    // must keep only the latest change per key)
    in.addData(ddl(s1),
      dml(OpType.Insert, 1, 1L, "v" -> "a"),
      dml(OpType.Insert, 2, 2L, "v" -> "b"),
      dml(OpType.Update, 3, 1L, "v" -> "a2"))
    q.processAllAvailable()

    val st1 = state(store)
    assert(st1("1")._1("v") == "a2")
    assert(st1("2")._1("v") == "b")

    // batch 1: schema evolves (adds column), delete row 2, insert row 3 —
    // the merge must read batch 0's committed buckets.
    in.addData(ddl(s2),
      dml(OpType.Delete, 4, 2L, "v" -> "b"),
      dml(OpType.Insert, 5, 3L, "v" -> "c", "extra" -> "x"))
    q.processAllAvailable()
    q.stop()

    assert(store.schemaOf(spark, "dbo.t").get.fieldNames.contains("extra"))
    val st2 = state(store)
    assert(st2.keySet == Set("1", "3"))
    assert(st2("3")._1("extra") == "x")
  }

  test("a multi-table batch merges every table concurrently and correctly") {
    val store = new ParquetUpsertStore(storeDir("multi"), numBuckets = 4)
    def rec(table: String, op: String, version: Long, id: Long, v: String) =
      ChangeRecord.ofDml(Dml(op, table, Seq("id"),
        s1.json, Map("id" -> id.toString, "v" -> v), version.toString, 0L))
    val tables = (1 to 6).map(i => s"dbo.t$i")
    store.applyBatch(spark.createDataset(
      tables.flatMap(t => Seq(
        rec(t, OpType.Insert, 1, 1L, s"$t-a"),
        rec(t, OpType.Insert, 2, 2L, s"$t-b")))).toDF(), 0L)
    store.applyBatch(spark.createDataset(
      tables.map(t => rec(t, OpType.Delete, 3, 2L, "-"))).toDF(), 1L)
    tables.foreach { t =>
      val st = store.snapshot(spark, t)
        .collect().map(r => r.getString(0) -> r.getMap[String, String](2)("v")).toMap
      assert(st == Map("1" -> s"$t-a"), s"table $t: $st")
    }
  }

  test("replaying a batch id is idempotent") {
    val store = new ParquetUpsertStore(storeDir("replay"), numBuckets = 4)
    val batch = spark.createDataset(Seq(
      ddl(s1),
      dml(OpType.Insert, 1, 1L, "v" -> "a"),
      dml(OpType.Delete, 2, 2L, "v" -> "-"))).toDF()
    store.applyBatch(batch, 0L)
    val once = state(store)
    store.applyBatch(batch, 0L) // at-least-once foreachBatch replay
    assert(state(store) == once)
    // the tombstone is retained (not visible) so the replay cannot
    // resurrect key 2
    assert(once.keySet == Set("1"))
  }

  test("a handle opened with a different numBuckets honors the manifest's bucket count") {
    val dir = storeDir("nb")
    val w1 = new ParquetUpsertStore(dir, numBuckets = 4)
    w1.applyBatch(spark.createDataset(
      (1L to 20L).map(i => dml(OpType.Insert, i, i, "v" -> s"v$i"))).toDF(), 0L)
    // Re-open the same table with a different constructor bucket count —
    // writes must keep following the manifest's recorded nb=4 or reads
    // would prune to buckets that don't hold the rows.
    val w2 = new ParquetUpsertStore(dir, numBuckets = 16)
    w2.applyBatch(spark.createDataset(
      (21L to 40L).map(i => dml(OpType.Insert, i, i, "v" -> s"v$i"))).toDF(), 1L)
    val st = state(w2)
    assert(st.keySet == (1L to 40L).map(_.toString).toSet)
    assert(st("40")._1("v") == "v40")
  }

  test("snapshotAt time-travels to the state as of an earlier committed batch") {
    val store = new ParquetUpsertStore(storeDir("travel"), numBuckets = 4)
    store.applyBatch(spark.createDataset(Seq(
      dml(OpType.Insert, 1, 1L, "v" -> "a"),
      dml(OpType.Insert, 2, 2L, "v" -> "b"))).toDF(), 0L)
    store.applyBatch(spark.createDataset(Seq(
      dml(OpType.Update, 3, 1L, "v" -> "a2"),
      dml(OpType.Delete, 4, 2L, "v" -> "-"))).toDF(), 1L)
    // latest: key 2 deleted, key 1 updated
    assert(state(store).view.mapValues(_._1("v")).toMap == Map("1" -> "a2"))
    // as of batch 0: both keys live with their original values
    val at0 = store.snapshotAt(spark, "dbo.t", 0L)
      .collect().map(r => r.getString(0) -> r.getMap[String, String](2)("v")).toMap
    assert(at0 == Map("1" -> "a", "2" -> "b"))
    // an id between commits resolves to the floor commit
    val at0b = store.snapshotAt(spark, "dbo.t", 0L)
    assert(store.snapshotAt(spark, "dbo.t", 1L).count() == 1)
    assert(at0b.count() == 2)
  }

  test("vacuum bounds storage to retained commits without changing the snapshot") {
    val dir = storeDir("vacuum")
    val store = new ParquetUpsertStore(dir, numBuckets = 4)
    store.applyBatch(spark.createDataset(Seq(
      dml(OpType.Insert, 1, 1L, "v" -> "a"),
      dml(OpType.Insert, 2, 2L, "v" -> "b"))).toDF(), 0L)
    store.applyBatch(spark.createDataset(Seq(
      dml(OpType.Update, 3, 1L, "v" -> "a2"),
      dml(OpType.Delete, 4, 2L, "v" -> "-"))).toDF(), 1L)
    store.compact(spark, "dbo.t", asBatchId = 2L)
    val before = state(store)

    store.vacuum(spark, "dbo.t", keepFromBatchId = 2L)
    assert(state(store) == before)
    // exactly one manifest and one snapshot directory survive
    val names = new java.io.File(dir, "dbo.t").list().toSet
    assert(names.filter(_.startsWith("manifest-")) == Set("manifest-2"), names)
    assert(names.filter(_.startsWith("snap-")) == Set("snap-2-c"), names)
    // time travel below the retention floor now resolves to an empty table
    assert(store.snapshotAt(spark, "dbo.t", 0L).count() == 0)
    // diff REFUSES a vacuumed fromBatchId instead of mis-reporting every
    // live row as INSERT against a silently-empty base
    val e = intercept[IllegalArgumentException] {
      store.diff(spark, "dbo.t", fromBatchId = 0L, toBatchId = 2L)
    }
    assert(e.getMessage.contains("retention floor"))
    // at/above the floor the diff still answers (self-diff: empty)
    assert(store.diff(spark, "dbo.t", 2L, 2L).isEmpty)
    // vacuuming past the newest commit keeps it (floor clamps)
    store.vacuum(spark, "dbo.t", keepFromBatchId = 99L)
    assert(state(store) == before)
  }

  test("the retention floor is the smallest surviving id, not the requested one") {
    // manifests {0, 1, 3}: vacuum(2) deletes 0 and 1; id 2 sits between
    // the deletions and the first survivor, so resolving it would skip
    // history — the floor must land on 3, refusing 2 as well
    val store = new ParquetUpsertStore(storeDir("floorgap"), numBuckets = 2)
    store.applyBatch(spark.createDataset(Seq(
      dml(OpType.Insert, 1, 1L, "v" -> "a"))).toDF(), 0L)
    store.applyBatch(spark.createDataset(Seq(
      dml(OpType.Insert, 2, 2L, "v" -> "b"))).toDF(), 1L)
    store.applyBatch(spark.createDataset(Seq(
      dml(OpType.Insert, 3, 3L, "v" -> "c"))).toDF(), 3L)
    store.vacuum(spark, "dbo.t", keepFromBatchId = 2L)
    val e = intercept[IllegalArgumentException] {
      store.diff(spark, "dbo.t", fromBatchId = 2L, toBatchId = 3L)
    }
    assert(e.getMessage.contains("retention floor 3"))
    // a vacuumed TO endpoint is refused too (it would read as all-DELETE)
    intercept[IllegalArgumentException] {
      store.diff(spark, "dbo.t", fromBatchId = 3L, toBatchId = 1L)
    }
    assert(store.diff(spark, "dbo.t", 3L, 3L).isEmpty)
    // a no-op vacuum on an intact table never raises the floor
    val fresh = new ParquetUpsertStore(storeDir("floornoop"), numBuckets = 2)
    fresh.applyBatch(spark.createDataset(Seq(
      dml(OpType.Insert, 1, 1L, "v" -> "a"))).toDF(), 0L)
    fresh.vacuum(spark, "dbo.t", keepFromBatchId = 0L)
    // bootstrap diff (from = -1, nothing ever vacuumed) still answers
    assert(fresh.diff(spark, "dbo.t", -1L, 0L).count() == 1L)
  }

  test("point lookup reads only the buckets its keys hash to") {
    val store = new ParquetUpsertStore(storeDir("lookup"), numBuckets = 8)
    store.applyBatch(spark.createDataset(
      (1L to 64L).map(i => dml(OpType.Insert, i, i, "v" -> s"val$i"))).toDF(), 0L)
    store.applyBatch(spark.createDataset(Seq(
      dml(OpType.Delete, 100, 7L, "v" -> "-"))).toDF(), 1L)

    val keys = Seq("3", "7", "12")
    val got = store.lookup(spark, "dbo.t", keys)
    // values match the full snapshot filtered to the same keys
    // (including the tombstoned key 7 being absent)
    val expect = store.snapshot(spark, "dbo.t")
      .filter(org.apache.spark.sql.functions.col("row_key").isin(keys: _*))
    assert(got.collect().map(_.getString(0)).sorted.toSeq == Seq("12", "3"))
    assert(got.collect().map(r => (r.getString(0), r.getMap[String, String](2)("v"))).toSet
      == expect.collect().map(r => (r.getString(0), r.getMap[String, String](2)("v"))).toSet)
    // snapshot-directory pruning: a lookup whose keys' buckets all live
    // in snap-0 must not even LIST snap-1 (inputFiles reflects the
    // pre-partition-pruning file listing, so a skipped directory is
    // visible here)
    val wantBuckets = keys.map(k => ParquetUpsertStore.bucketOf(k, 8)).toSet
    val b7 = ParquetUpsertStore.bucketOf("7", 8)
    val snap0Keys = Seq("3", "12").filter(k =>
      ParquetUpsertStore.bucketOf(k, 8) != b7)
    val pruned = store.lookup(spark, "dbo.t", snap0Keys)
    assert(pruned.inputFiles.forall(!_.contains("snap-1")),
      "lookup listed a snapshot directory none of its buckets live in")
    // bucket-level pruning: the scan's file listing is built from
    // explicit `bucket=` leaf paths, so ONLY the hashed buckets'
    // directories appear in the input files at all — stronger than the
    // former partition filter, which listed the directory first
    val files = got.inputFiles
    assert(files.nonEmpty &&
      files.forall(f => wantBuckets.exists(b => f.contains(s"bucket=$b/"))),
      s"lookup read a bucket none of its keys hash to:\n${files.mkString("\n")}")
    assert(wantBuckets.size <= keys.size)
  }

  test("diff between two commits emits I/U/D and reads only remapped buckets") {
    val store = new ParquetUpsertStore(storeDir("diff"), numBuckets = 4)
    store.applyBatch(spark.createDataset(
      (1L to 16L).map(i => dml(OpType.Insert, i, i, "v" -> s"a$i"))).toDF(), 0L)
    // batch 1 touches exactly one bucket: update + delete two co-bucketed
    // keys, insert a new key hashing to the same bucket
    val byBucket = (1L to 16L).groupBy(i => ParquetUpsertStore.bucketOf(i.toString, 4))
    val (b, keys) = byBucket.maxBy(_._2.size)
    val (k1, k2) = (keys.head, keys(1))
    val kNew = (100L to 200L)
      .find(i => ParquetUpsertStore.bucketOf(i.toString, 4) == b).get
    store.applyBatch(spark.createDataset(Seq(
      dml(OpType.Update, 100, k1, "v" -> "upd"),
      dml(OpType.Delete, 101, k2, "v" -> "-"),
      dml(OpType.Insert, 102, kNew, "v" -> "new"))).toDF(), 1L)

    val d = store.diff(spark, "dbo.t", fromBatchId = 0L, toBatchId = 1L)
    val got = d.collect()
      .map(r => (r.getString(0), r.getString(1), r.getMap[String, String](2)("v")))
      .toSet
    // unchanged keys sharing bucket b are read but filtered by value
    // equality; the deleted key reports its before-image values
    assert(got == Set(
      (k1.toString, OpType.Update, "upd"),
      (k2.toString, OpType.Delete, s"a$k2"),
      (kNew.toString, OpType.Insert, "new")))

    // retraction support: UPDATE/DELETE carry the before-image in
    // values_prev (for downstream incremental view maintenance);
    // INSERT has none
    val prev = d.collect()
      .map(r => r.getString(1) -> Option(r.getMap[String, String](3)).map(_("v")))
      .toMap
    assert(prev(OpType.Update).contains(s"a$k1"))
    assert(prev(OpType.Delete).contains(s"a$k2"))
    assert(prev(OpType.Insert).isEmpty)

    // pruning: both sides' file listings are built from explicit
    // `bucket=` leaf paths, so exactly the one remapped bucket's
    // directories are read — no other bucket appears in the input files
    val diffFiles = d.inputFiles
    assert(diffFiles.nonEmpty &&
      diffFiles.forall(_.contains(s"bucket=$b/")),
      s"diff read a bucket that was not remapped (expected only $b):\n" +
        diffFiles.mkString("\n"))

    // self-diff and adjacent-identical diff are empty
    assert(store.diff(spark, "dbo.t", 1L, 1L).isEmpty)
  }

  test("compacting or rebucketing a fully-tombstoned table stays readable") {
    val store = new ParquetUpsertStore(storeDir("empty-fold"), numBuckets = 4)
    store.applyBatch(spark.createDataset(Seq(
      dml(OpType.Insert, 1, 1L, "v" -> "a"),
      dml(OpType.Insert, 2, 2L, "v" -> "b"))).toDF(), 0L)
    store.applyBatch(spark.createDataset(Seq(
      dml(OpType.Delete, 3, 1L, "v" -> "-"),
      dml(OpType.Delete, 4, 2L, "v" -> "-"))).toDF(), 1L)
    // compaction folds every row away — the snapshot must read as empty,
    // not die on a schema-less parquet directory
    store.compact(spark, "dbo.t", asBatchId = 2L)
    assert(store.snapshot(spark, "dbo.t").isEmpty)
    store.rebucket(spark, "dbo.t", newNumBuckets = 8, asBatchId = 2L)
    assert(store.snapshot(spark, "dbo.t").isEmpty)
    // and the table comes back to life on the next batch
    store.applyBatch(spark.createDataset(Seq(
      dml(OpType.Insert, 5, 9L, "v" -> "back"))).toDF(), 3L)
    assert(state(store).keySet == Set("9"))
  }

  test("rebucket re-hashes the table; later batches and lookups honor the new count") {
    val dir = storeDir("rebucket")
    val store = new ParquetUpsertStore(dir, numBuckets = 2)
    store.applyBatch(spark.createDataset(
      (1L to 32L).map(i => dml(OpType.Insert, i, i, "v" -> s"a$i"))).toDF(), 0L)
    store.applyBatch(spark.createDataset(Seq(
      dml(OpType.Delete, 100, 5L, "v" -> "-"))).toDF(), 1L)
    val before = state(store)

    store.rebucket(spark, "dbo.t", newNumBuckets = 8, asBatchId = 1L)
    assert(state(store) == before, "rebucket changed the visible snapshot")
    // tombstones survive (unlike compact): a replay of the delete batch
    // id is shadowed, and the tombstone still wins over stale data
    assert(!state(store).contains("5"))

    // a later batch buckets with the NEW count from the manifest
    store.applyBatch(spark.createDataset(Seq(
      dml(OpType.Insert, 200, 99L, "v" -> "new"))).toDF(), 2L)
    assert(state(store)("99")._1("v") == "new")

    // point lookup prunes with the new count and still finds the rows
    val got = store.lookup(spark, "dbo.t", Seq("7", "99"))
    assert(got.collect().map(_.getString(0)).sorted.toSeq == Seq("7", "99"))
    assert(got.inputFiles.forall(f => f.contains("snap-1-r8") || f.contains("snap-2")),
      "lookup read a pre-rebucket snapshot directory")

    // diff across the rebucket boundary is still value-correct
    val d = store.diff(spark, "dbo.t", 1L, 2L).collect()
    assert(d.map(r => (r.getString(0), r.getString(1))).toSeq == Seq("99" -> OpType.Insert))

    // a SECOND rebucket replace-committed at the same id (the documented
    // convention) writes a distinct directory — it must never lazily
    // read the directory it is overwriting
    store.rebucket(spark, "dbo.t", newNumBuckets = 4, asBatchId = 2L)
    assert(state(store).keySet == before.keySet + "99")
  }

  test("rebucket between streaming restarts: the resumed stream honors the new layout") {
    val sdir = storeDir("rebucket-stream")
    val store = new ParquetUpsertStore(sdir, numBuckets = 2)
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[ChangeRecord]
    val ckpt = checkpointDir("pus-rebucket")
    val q1 = UpsertSink.stream(in.toDF(), store, ckpt)
    in.addData((1L to 16L).map(i => dml(OpType.Insert, i, i, "v" -> s"a$i")): _*)
    q1.processAllAvailable(); q1.stop()

    // operational resize while the stream is down — at the LAST
    // COMMITTED id (a replace-commit, compact's convention): a fresh id
    // would collide with the resumed stream's next batch id and its
    // commit would be dropped as a replay
    store.rebucket(spark, "dbo.t", newNumBuckets = 8, asBatchId = 0L)

    // resume the SAME source from the SAME checkpoint: later batches
    // must bucket with the manifest's new count, reads stay consistent
    val q2 = UpsertSink.stream(in.toDF(), store, ckpt)
    in.addData(dml(OpType.Update, 100, 3L, "v" -> "u3"),
      dml(OpType.Delete, 101, 5L, "v" -> "-"))
    q2.processAllAvailable(); q2.stop()

    val st = state(store)
    assert(st.keySet == ((1L to 16L).toSet - 5L).map(_.toString))
    assert(st("3")._1("v") == "u3")
    val got = store.lookup(spark, "dbo.t", Seq("3", "7"))
      .collect().map(_.getString(0)).sorted.toSeq
    assert(got == Seq("3", "7"))
  }

  test("diff is exactly the delta: state0 + diff == state1 on randomized change logs") {
    for (seed <- Seq(7, 42, 1789)) {
      val rnd = new scala.util.Random(seed)
      val ops = Array(OpType.Insert, OpType.Update, OpType.Delete)
      val log = (1L to 60L).map { version =>
        dml(ops(rnd.nextInt(3)), version, rnd.nextInt(20).toLong,
          "v" -> s"s$seed-v$version")
      }
      val store = new ParquetUpsertStore(storeDir(s"diffprop-$seed"), numBuckets = 4)
      val (b0, b1) = log.partition(_.dml.get.changeTrackingVersion.toLong <= 30L)
      store.applyBatch(spark.createDataset(b0).toDF(), 0L)
      store.applyBatch(spark.createDataset(b1).toDF(), 1L)

      val state0 = store.snapshotAt(spark, "dbo.t", 0L).collect()
        .map(r => r.getString(0) -> r.getMap[String, String](2)("v")).toMap
      val state1 = store.snapshot(spark, "dbo.t").collect()
        .map(r => r.getString(0) -> r.getMap[String, String](2)("v")).toMap

      var applied = state0
      store.diff(spark, "dbo.t", 0L, 1L).collect().foreach { r =>
        val key = r.getString(0)
        r.getString(1) match {
          case OpType.Delete => applied -= key
          case _ => applied += key -> r.getMap[String, String](2)("v")
        }
      }
      assert(applied == state1, s"seed $seed: diff did not transform state0 into state1")
    }
  }

  test("a diff-maintained aggregate equals full recompute after every streamed batch") {
    val sdir = storeDir("ivm")
    val store = new ParquetUpsertStore(sdir, numBuckets = 4)
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[ChangeRecord]
    val q = UpsertSink.stream(in.toDF(), store, checkpointDir("pus-ivm"))

    // maintained state: group (id % 3) → (count, sum of id), advanced
    // ONLY from diff records — never recomputed from the table
    var maintained = Map.empty[String, (Long, Long)].withDefaultValue((0L, 0L))
    var lastId = -1L
    def advance(): Unit = {
      val maxId = new java.io.File(sdir, "dbo.t").list()
        .filter(_.matches("manifest-\\d+"))
        .map(_.stripPrefix("manifest-").toLong).max
      store.diff(spark, "dbo.t", lastId, maxId).collect().foreach { r =>
        val now = Option(r.getMap[String, String](2)).map(_.toMap)
        val prev = Option(r.getMap[String, String](3)).map(_.toMap)
        def apply(m: Map[String, String], sign: Long): Unit = {
          val g = (m("id").toLong % 3).toString
          val (c, s) = maintained(g)
          maintained += g -> (c + sign, s + sign * m("id").toLong)
        }
        r.getString(1) match {
          case OpType.Insert => apply(now.get, 1L)
          case OpType.Delete => apply(prev.get, -1L)
          case OpType.Update => apply(prev.get, -1L); apply(now.get, 1L)
        }
      }
      lastId = maxId
      val expect = state(store).keys
        .map(_.toLong).groupBy(id => (id % 3).toString)
        .map { case (g, ids) => g -> (ids.size.toLong, ids.sum) }
      assert(maintained.filter(_._2._1 > 0) == expect,
        s"maintained aggregate diverged at batch $maxId")
    }

    in.addData((1L to 30L).map(i => dml(OpType.Insert, i, i, "v" -> s"a$i")): _*)
    q.processAllAvailable(); advance()
    // churn: update a third, delete a few, insert new keys
    in.addData((1L to 30L by 3).map(i => dml(OpType.Update, 100 + i, i, "v" -> "u"))
      ++ Seq(2L, 5L, 8L).map(i => dml(OpType.Delete, 200 + i, i, "v" -> "-"))
      ++ (31L to 36L).map(i => dml(OpType.Insert, 300 + i, i, "v" -> s"n$i")): _*)
    q.processAllAvailable(); advance()
    // a batch that only deletes (groups can drain to zero)
    in.addData((31L to 36L).map(i => dml(OpType.Delete, 400 + i, i, "v" -> "-")): _*)
    q.processAllAvailable(); advance()
    q.stop()
  }

  test("a replace-commit crash between renames is recovered from the sidecar") {
    val dir = storeDir("crash")
    val store = new ParquetUpsertStore(dir, numBuckets = 4)
    store.applyBatch(spark.createDataset(Seq(
      dml(OpType.Insert, 1, 1L, "v" -> "a"),
      dml(OpType.Insert, 2, 2L, "v" -> "b"))).toDF(), 0L)
    store.applyBatch(spark.createDataset(Seq(
      dml(OpType.Delete, 3, 2L, "v" -> "-"))).toDF(), 1L)
    store.compact(spark, "dbo.t", asBatchId = 1L)
    val settled = state(store)
    assert(settled.keySet == Set("1"))

    // Simulate the crash window: the live manifest was moved aside to the
    // sidecar but the new manifest's rename never happened — the id's only
    // content on disk is manifest-1.old.
    val tdir = new java.io.File(dir, "dbo.t")
    assert(new java.io.File(tdir, "manifest-1")
      .renameTo(new java.io.File(tdir, "manifest-1.old")))
    // next open restores the sidecar; the id and its state are back
    assert(state(store) == settled)
    assert(new java.io.File(tdir, "manifest-1").exists())
    assert(!new java.io.File(tdir, "manifest-1.old").exists())

    // a stale sidecar BELOW vacuum's floor is history, not a manifest to
    // resurrect: vacuum must delete it
    val fos = new java.io.FileOutputStream(new java.io.File(tdir, "manifest-0.old"))
    try fos.write("graft-upsert-manifest 4\n-\n".getBytes("UTF-8")) finally fos.close()
    store.vacuum(spark, "dbo.t", keepFromBatchId = 1L)
    assert(!new java.io.File(tdir, "manifest-0.old").exists())
    assert(state(store) == settled)
  }

  test("replaying pre-compaction batches after compact+vacuum resurrects nothing") {
    val store = new ParquetUpsertStore(storeDir("lifecycle"), numBuckets = 4)
    val b0 = spark.createDataset(Seq(
      ddl(s1),
      dml(OpType.Insert, 1, 1L, "v" -> "a"),
      dml(OpType.Insert, 2, 2L, "v" -> "b"))).toDF()
    val b1 = spark.createDataset(Seq(
      dml(OpType.Delete, 3, 1L, "v" -> "-"))).toDF()
    store.applyBatch(b0, 0L)
    store.applyBatch(b1, 1L)
    store.compact(spark, "dbo.t", asBatchId = 2L) // tombstone for key 1 folded out
    store.vacuum(spark, "dbo.t", keepFromBatchId = 2L)
    val settled = state(store)
    assert(settled.keySet == Set("2"))

    // Replay of the batch that INSERTED the now-deleted key (at-least-once
    // delivery): its manifest commits at a lower id than the compaction
    // point, so max-id readers never see it — key 1 must not come back.
    store.applyBatch(b0, 0L)
    assert(state(store) == settled)
    // replay of the deleting batch is equally invisible
    store.applyBatch(b1, 1L)
    assert(state(store) == settled)
    // and re-compacting the same id is a no-op, not a self-overwrite
    store.compact(spark, "dbo.t", asBatchId = 2L)
    assert(state(store) == settled)
    // time travel at/after the compaction point still resolves
    assert(store.snapshotAt(spark, "dbo.t", 2L).count() == 1)
  }

  test("streaming into an auto-compacting store folds state end-to-end") {
    val dir = storeDir("stream-ac")
    val store = new ParquetUpsertStore(dir, numBuckets = 4, autoCompactManifests = 2)
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[ChangeRecord]
    val q = UpsertSink.stream(in.toDF(), store, checkpointDir("pus-ac"))
    in.addData(ddl(s1), dml(OpType.Insert, 1, 1L, "v" -> "a"))
    q.processAllAvailable()
    in.addData(dml(OpType.Delete, 2, 1L, "v" -> "-"),
      dml(OpType.Insert, 3, 2L, "v" -> "b"))
    q.processAllAvailable()
    in.addData(dml(OpType.Insert, 4, 3L, "v" -> "c"))
    q.processAllAvailable()
    q.stop()
    assert(state(store).keySet == Set("2", "3"))
    // batch 2 tripped the policy (3 manifests > 2): its commit was
    // replaced by a compacted one and the live working set folded
    val names = new java.io.File(dir, "dbo.t").list().toSet
    assert(names.contains("snap-2-c"), names)
    assert(store.snapshotAt(spark, "dbo.t", 2L).count() == 2) // no tombstone rows
  }

  test("auto-compact with auto-vacuum bounds manifests and storage") {
    val dir = storeDir("autovac")
    val store = new ParquetUpsertStore(dir, numBuckets = 4,
      autoCompactManifests = 2, autoVacuumRetainBatches = 0)
    def one(op: String, v: Long, id: Long) =
      spark.createDataset(Seq(dml(op, v, id, "v" -> s"v$v"))).toDF()
    store.applyBatch(spark.createDataset(Seq(ddl(s1),
      dml(OpType.Insert, 1, 1L, "v" -> "a"))).toDF(), 0L)
    store.applyBatch(one(OpType.Delete, 2, 1L), 1L)
    store.applyBatch(one(OpType.Insert, 3, 2L), 2L) // trips compact+vacuum@2
    store.applyBatch(one(OpType.Insert, 4, 3L), 3L)
    store.applyBatch(one(OpType.Insert, 5, 4L), 4L) // trips compact+vacuum@4
    assert(state(store).keySet == Set("2", "3", "4"))
    val names = new java.io.File(dir, "dbo.t").list().toSet
    // only the latest compaction's manifest + working set survive
    assert(names.filter(_.matches("manifest-\\d+")) == Set("manifest-4"), names)
    assert(names.filter(_.startsWith("snap-")) == Set("snap-4-c"), names)
    // the folded-out tombstone for key 1 stays gone
    assert(store.snapshot(spark, "dbo.t").count() == 3)
  }

  test("auto-compact triggers past the manifest bound and folds tombstones") {
    val dir = storeDir("autocompact")
    val store = new ParquetUpsertStore(dir, numBuckets = 4, autoCompactManifests = 3)
    store.applyBatch(spark.createDataset(Seq(ddl(s1),
      dml(OpType.Insert, 1, 1L, "v" -> "a"),
      dml(OpType.Insert, 2, 2L, "v" -> "b"))).toDF(), 0L)
    store.applyBatch(spark.createDataset(Seq(
      dml(OpType.Delete, 10, 2L, "v" -> "-"))).toDF(), 1L)
    store.applyBatch(spark.createDataset(Seq(
      dml(OpType.Update, 20, 1L, "v" -> "a2"))).toDF(), 2L)
    store.applyBatch(spark.createDataset(Seq(
      dml(OpType.Insert, 30, 3L, "v" -> "c"))).toDF(), 3L)

    val st = state(store)
    assert(st.keySet == Set("1", "3"))
    assert(st("1")._1("v") == "a2")
    // batch 3 tripped the policy: its commit replaced by a compacted
    // manifest at the same id, and the folded state hides the tombstone
    val names = new java.io.File(dir, "dbo.t").list().toSet
    assert(names.contains("snap-3-c"), names)
    // the visible physical rows carry no tombstones after the fold
    assert(store.snapshotAt(spark, "dbo.t", 3L).count() == 2)
    // schema recorded by batch 0's DDL survives the replace-commit
    assert(store.schemaOf(spark, "dbo.t").get.fieldNames.sameElements(Array("id", "v")))
  }

  test("compact folds tombstones out without changing the visible snapshot") {
    val store = new ParquetUpsertStore(storeDir("compact"), numBuckets = 4)
    store.applyBatch(spark.createDataset(Seq(
      dml(OpType.Insert, 1, 1L, "v" -> "a"),
      dml(OpType.Insert, 2, 2L, "v" -> "b"))).toDF(), 0L)
    store.applyBatch(spark.createDataset(Seq(
      dml(OpType.Delete, 3, 1L, "v" -> "-"))).toDF(), 1L)
    val before = state(store)
    assert(before.keySet == Set("2"))
    store.compact(spark, "dbo.t", asBatchId = 2L)
    assert(state(store) == before)
    // post-compaction the physical files hold no DELETE rows at all
    val raw = store.snapshot(spark, "dbo.t") // already filters, so check dirs
    assert(raw.count() == 1)
  }

  test("exportZOrdered clusters the typed snapshot on both dimensions") {
    val s3 = StructType(Seq(
      StructField("id", LongType), StructField("x", LongType),
      StructField("y", LongType)))
    def dml3(i: Long) = ChangeRecord.ofDml(Dml(OpType.Insert, "dbo.t",
      Seq("id"), s3.json, Map("id" -> i.toString,
        "x" -> (i % 16).toString, "y" -> (i / 16).toString), i.toString, 0L))
    val store = new ParquetUpsertStore(storeDir("zorder"), numBuckets = 4)
    store.applyBatch(spark.createDataset(
      ChangeRecord.ofDdl(Ddl("dbo.t", s3.json)) +: (0L until 256L).map(dml3)
    ).toDF(), 0L)

    val out = checkpointDir("zorder-out")
    store.exportZOrdered(spark, "dbo.t", out, "x", "y", bits = 8, numFiles = 8)

    // content is exactly the typed snapshot — layout is the only change
    val got = spark.read.parquet(out).orderBy("id").collect().toSeq
    val want = store.snapshotTyped(spark, "dbo.t").orderBy("id").collect().toSeq
    assert(got == want)

    // clustering: every file's (x, y) bounding rectangle is a small
    // patch of the 16×16 grid, never a full-width stripe — that bounded
    // min/max footprint is precisely what lets parquet row-group stats
    // prune scans filtered on either dimension. A contiguous z-range of
    // ≤ half the grid is confined to at most two adjacent quadrants
    // (area ≤ 128); an unclustered write would put near-global spans
    // (area → 256) in every file.
    val files = new java.io.File(out).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && f.length() > 0)
    assert(files.length > 1, "expected a multi-file clustered layout")
    files.foreach { f =>
      val r = spark.read.parquet(f.getPath)
        .agg(org.apache.spark.sql.functions.min("x"),
          org.apache.spark.sql.functions.max("x"),
          org.apache.spark.sql.functions.min("y"),
          org.apache.spark.sql.functions.max("y")).head()
      val area = (r.getLong(1) - r.getLong(0) + 1) * (r.getLong(3) - r.getLong(2) + 1)
      assert(area <= 128,
        s"file ${f.getName} covers area $area of the 256-cell grid — not clustered")
    }
  }
}
