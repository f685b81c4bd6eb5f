package graft

import graft.model._
import graft.sinks.{ParquetUpsertStore, UpsertSink}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException
import org.apache.spark.sql.types._

import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

/** Shared fault switches — static so executor tasks (same JVM in local
  * mode) and the driver-side hooks see one arming state. */
object StoreFaults {
  /** Kill one write task after this many rows, once, then disarm. */
  val midWriteArmed = new AtomicBoolean(false)
  val rowsBeforeCrash = 3
  val rowsSeen = new AtomicInteger(0)
  /** Throw once between the snapshot write and the manifest commit. */
  val preCommitArmed = new AtomicBoolean(false)
  /** When non-null, the pre-commit bomb fires only for this table —
    * the partial-multi-table-batch fault. */
  @volatile var preCommitOnlyTable: String = null
  /** Per-apply attempt counter for the non-idempotent control. */
  val applyAttempts = new AtomicInteger(0)

  def reset(): Unit = {
    midWriteArmed.set(false); preCommitArmed.set(false)
    preCommitOnlyTable = null
    rowsSeen.set(0); applyAttempts.set(0)
  }
}

/** The store's merged-row shape, typed for the in-task crash bomb. */
final case class StoredRow(row_key: String, op: String,
    values: Map[String, String], version: Long, bucket: Int)

/** [[ParquetUpsertStore]] with the two crash windows armed through the
  * production seams: a task-level bomb inside the snapshot write (the
  * executor dies after N rows — on disk: uncommitted `_temporary` junk,
  * no manifest) and a driver-level bomb between the completed write and
  * the manifest commit (data durable, commit missing). `markAttempts`
  * turns the store into the DELIBERATELY NON-IDEMPOTENT control: every
  * apply attempt stamps its rows with a distinct `__attempt` value, so
  * a replayed batch writes different bytes than the first attempt —
  * exactly the mutation the at-least-once contract forbids. */
class FaultyStore(root: String, nb: Int, markAttempts: Boolean = false)
    extends ParquetUpsertStore(root, nb) {

  override protected def instrumentMerged(table: String, batchId: Long,
                                          df: DataFrame): DataFrame = {
    val marked =
      if (markAttempts)
        // rows merged back from an earlier snapshot already carry the
        // stamp — replace it, don't duplicate the key
        df.withColumn("values", map_concat(
          map_filter(col("values"), (k, _) => k =!= "__attempt"),
          map(lit("__attempt"),
            lit(StoreFaults.applyAttempts.incrementAndGet().toString))))
      else df
    val sp = df.sparkSession
    import sp.implicits._
    marked.as[StoredRow].mapPartitions { it =>
      it.map { r =>
        if (StoreFaults.midWriteArmed.get &&
            StoreFaults.rowsSeen.incrementAndGet() > StoreFaults.rowsBeforeCrash &&
            StoreFaults.midWriteArmed.compareAndSet(true, false))
          throw new RuntimeException(
            s"injected mid-write crash (batch $batchId, after " +
              s"${StoreFaults.rowsBeforeCrash} rows)")
        r
      }
    }.toDF()
  }

  override protected def beforeCommit(table: String, batchId: Long): Unit =
    if ((StoreFaults.preCommitOnlyTable == null ||
          StoreFaults.preCommitOnlyTable == table) &&
        StoreFaults.preCommitArmed.compareAndSet(true, false))
      throw new RuntimeException(
        s"injected pre-commit crash (table $table, batch $batchId: " +
          "snapshot written, manifest not committed)")
}

/** At-least-once delivery under mid-batch writer crashes (SURVEY.md §2.2,
  * reference CDCKudu.java:139-184's implicit contract): kill the
  * foreachBatch writer MID-batch — once inside the parquet write (partial
  * write on disk) and once between write and manifest commit — restart
  * the stream from its checkpoint, and assert the store converges to the
  * exact snapshot of an unfaulted twin run. The harness is validated by a
  * deliberately non-idempotent mutation, which it must flag as divergent. */
class StoreFaultInjectionSpec extends SparkSuite {
  import spark.implicits._

  private val s1 = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  private def dml(op: String, version: Long, id: Long, v: String) =
    ChangeRecord.ofDml(Dml(op, "dbo.t", Seq("id"),
      s1.json, Map("id" -> id.toString, "v" -> v), version.toString, 0L))

  private val batch0: Seq[ChangeRecord] =
    (1L to 8L).map(i => dml(OpType.Insert, i, i, s"a$i"))
  private val batch1: Seq[ChangeRecord] = Seq(
    dml(OpType.Update, 9, 1L, "u1"),
    dml(OpType.Update, 10, 3L, "u3"),
    dml(OpType.Delete, 11, 2L, "-")) ++
    (9L to 12L).map(i => dml(OpType.Insert, i + 4, i, s"a$i"))

  /** Full live state: row_key → (values, version). */
  private def state(store: ParquetUpsertStore): Map[String, (Map[String, String], Long)] =
    store.snapshot(spark, "dbo.t").collect()
      .map(r => r.getString(0) -> (r.getMap[String, String](2).toMap, r.getLong(3)))
      .toMap

  /** The unfaulted twin: same records, same batch boundaries, no faults. */
  private def twinState(tag: String): Map[String, (Map[String, String], Long)] = {
    val twin = new ParquetUpsertStore(checkpointDir(s"fault-twin-$tag"), numBuckets = 4)
    twin.applyBatch(spark.createDataset(batch0).toDF(), 0L)
    twin.applyBatch(spark.createDataset(batch1).toDF(), 1L)
    state(twin)
  }

  /** Drive batch 0 clean, arm `fault`, expect batch 1's delivery to kill
    * the query, assert torn-write invisibility, restart from the SAME
    * checkpoint, and return the converged faulted-store state. */
  private def crashAndRecover(store: ParquetUpsertStore, tag: String)
                             (arm: () => Unit): Map[String, (Map[String, String], Long)] = {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[ChangeRecord]
    val ckpt = checkpointDir(s"fault-ckpt-$tag")
    val q1 = UpsertSink.stream(in.toDF(), store, ckpt)
    in.addData(batch0: _*)
    q1.processAllAvailable()
    val afterB0 = state(store)
    assert(afterB0.keySet == (1L to 8L).map(_.toString).toSet)

    arm()
    in.addData(batch1: _*)
    intercept[StreamingQueryException] { q1.processAllAvailable() }
    try q1.stop() catch { case _: Throwable => () }

    // Reader isolation: the torn batch-1 attempt (whatever it left on
    // disk) is invisible — the manifest commit is the only visibility
    // point, so readers still see exactly the batch-0 state.
    assert(state(store) == afterB0,
      "a crashed batch attempt leaked into the readable snapshot")

    // Restart from the same checkpoint: foreachBatch redelivers batch 1
    // (at-least-once); the replay must converge.
    val q2 = UpsertSink.stream(in.toDF(), store, ckpt)
    q2.processAllAvailable(); q2.stop()
    state(store)
  }

  test("executor crash mid-snapshot-write: restart from checkpoint converges to the unfaulted snapshot") {
    StoreFaults.reset()
    val store = new FaultyStore(checkpointDir("fault-midwrite"), nb = 4)
    val got = crashAndRecover(store, "midwrite") { () =>
      StoreFaults.rowsSeen.set(0); StoreFaults.midWriteArmed.set(true)
    }
    assert(!StoreFaults.midWriteArmed.get, "the mid-write bomb never fired")
    assert(got == twinState("midwrite"))
  }

  test("driver crash between snapshot write and manifest commit: replay converges") {
    StoreFaults.reset()
    val store = new FaultyStore(checkpointDir("fault-precommit"), nb = 4)
    val got = crashAndRecover(store, "precommit") { () =>
      StoreFaults.preCommitArmed.set(true)
    }
    assert(!StoreFaults.preCommitArmed.get, "the pre-commit bomb never fired")
    // This window leaves snap-1 fully written but uncommitted; the replay
    // overwrites it and commits — converged all the same.
    assert(got == twinState("precommit"))
  }

  test("crash in one table of a concurrent multi-table batch: replay converges both") {
    // applyBatch merges tables CONCURRENTLY; a crash in table B's
    // commit while table A already committed leaves the batch HALF
    // APPLIED across tables. On replay, A's re-commit of the same id is
    // dropped (idempotent rename) and B commits — both tables must
    // converge to the unfaulted state, and A must not double-apply.
    StoreFaults.reset()
    def rec(table: String, op: String, version: Long, id: Long, v: String) =
      ChangeRecord.ofDml(Dml(op, table, Seq("id"),
        s1.json, Map("id" -> id.toString, "v" -> v), version.toString, 0L))
    def both(tag: String): Seq[Seq[ChangeRecord]] = Seq(
      Seq(rec("dbo.a", OpType.Insert, 1, 1L, s"$tag-a1"),
        rec("dbo.b", OpType.Insert, 2, 1L, s"$tag-b1")),
      Seq(rec("dbo.a", OpType.Update, 3, 1L, s"$tag-a1u"),
        rec("dbo.a", OpType.Insert, 4, 2L, s"$tag-a2"),
        rec("dbo.b", OpType.Delete, 5, 1L, "-"),
        rec("dbo.b", OpType.Insert, 6, 2L, s"$tag-b2")))
    def stateOf(store: ParquetUpsertStore, table: String) =
      store.snapshot(spark, table).collect()
        .map(r => r.getString(0) -> (r.getMap[String, String](2)("v"), r.getLong(3)))
        .toMap

    val store = new FaultyStore(checkpointDir("fault-multitable"), nb = 4)
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[ChangeRecord]
    val ckpt = checkpointDir("fault-multitable-ckpt")
    val q1 = UpsertSink.stream(in.toDF(), store, ckpt)
    in.addData(both("x").head: _*)
    q1.processAllAvailable()

    // arm: only dbo.b's commit dies; dbo.a's half of batch 1 may land
    StoreFaults.preCommitOnlyTable = "dbo.b"
    StoreFaults.preCommitArmed.set(true)
    in.addData(both("x")(1): _*)
    intercept[StreamingQueryException] { q1.processAllAvailable() }
    try q1.stop() catch { case _: Throwable => () }
    // b never committed batch 1 — still at its batch-0 state
    assert(stateOf(store, "dbo.b") == Map("1" -> ("x-b1", 2L)),
      "table b's torn commit became visible")

    val q2 = UpsertSink.stream(in.toDF(), store, ckpt)
    q2.processAllAvailable(); q2.stop()

    val twin = new ParquetUpsertStore(checkpointDir("fault-multitable-twin"),
      numBuckets = 4)
    both("x").zipWithIndex.foreach { case (b, i) =>
      twin.applyBatch(spark.createDataset(b).toDF(), i.toLong) }
    assert(stateOf(store, "dbo.a") == stateOf(twin, "dbo.a"))
    assert(stateOf(store, "dbo.b") == stateOf(twin, "dbo.b"))
  }

  test("replace-commit crash between its two renames: the sidecar restores the manifest") {
    // commitManifest(replace=true) moves the live manifest to a `.old`
    // sidecar, renames the new one in, then deletes the sidecar. A
    // crash between the two renames leaves ONLY the sidecar on disk —
    // this test recreates exactly that state and asserts readers
    // restore it (the id's content survives; it was merely invisible).
    import org.apache.hadoop.fs.Path
    val root = checkpointDir("fault-sidecar")
    val store = new ParquetUpsertStore(root, numBuckets = 4)
    store.applyBatch(spark.createDataset(batch0).toDF(), 0L)
    store.applyBatch(spark.createDataset(batch1).toDF(), 1L)
    val before = state(store)

    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tdir = new Path(s"$root/dbo.t")
    // the crash state: manifest-1 swapped aside, replacement never landed
    assert(fs.rename(new Path(tdir, "manifest-1"), new Path(tdir, "manifest-1.old")))
    assert(!fs.exists(new Path(tdir, "manifest-1")))

    // a fresh reader restores the orphaned sidecar and sees batch 1
    assert(state(store) == before,
      "orphaned replace-commit sidecar was not restored")
    assert(fs.exists(new Path(tdir, "manifest-1")), "restore did not persist")
    assert(!fs.exists(new Path(tdir, "manifest-1.old")),
      "restored sidecar should have been renamed away")

    // and the store keeps working: the next batch commits on top
    store.applyBatch(spark.createDataset(
      Seq(dml(OpType.Update, 20, 3L, "after-crash"))).toDF(), 2L)
    assert(state(store)("3")._1("v") == "after-crash")
  }

  test("vacuum crash between floor delete and rename: the tmp floor still arms refusal") {
    // vacuum records its retention floor via tmp-write → delete → rename.
    // A crash between the delete and the rename leaves only the tmp file;
    // readFloor must fall back to it so history readers refuse vacuumed
    // ids instead of silently resolving them to an empty table.
    import org.apache.hadoop.fs.Path
    val root = checkpointDir("fault-floor")
    val store = new ParquetUpsertStore(root, numBuckets = 4)
    store.applyBatch(spark.createDataset(batch0).toDF(), 0L)
    store.applyBatch(spark.createDataset(batch1).toDF(), 1L)

    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tdir = new Path(s"$root/dbo.t")
    // the crash state: floor recorded only in the tmp file
    val tmp = new Path(tdir, ".vacuum-floor.tmp")
    val out = fs.create(tmp, true)
    try out.write("1".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    assert(!fs.exists(new Path(tdir, "vacuum-floor")))

    val e = intercept[IllegalArgumentException] {
      store.diff(spark, "dbo.t", 0L, 1L)
    }
    assert(e.getMessage.contains("retention floor"),
      s"diff below the tmp-recorded floor must refuse, got: ${e.getMessage}")
    // at-or-above the floor still works
    assert(store.diff(spark, "dbo.t", 1L, 1L).count() == 0)
  }

  test("the harness detects a deliberately non-idempotent mutation") {
    // Control: a store that stamps each apply ATTEMPT into the rows. Its
    // replay after the same mid-write crash writes different bytes than
    // attempt one, so the faulted run must NOT match the unfaulted run —
    // if this assert ever flips, the harness above has lost its teeth.
    StoreFaults.reset()
    val faulted = new FaultyStore(checkpointDir("fault-nonidem"), nb = 4,
      markAttempts = true)
    val got = crashAndRecover(faulted, "nonidem") { () =>
      StoreFaults.rowsSeen.set(0); StoreFaults.midWriteArmed.set(true)
    }

    StoreFaults.reset() // fresh attempt counter for the unfaulted twin
    val clean = new FaultyStore(checkpointDir("fault-nonidem-clean"), nb = 4,
      markAttempts = true)
    clean.applyBatch(spark.createDataset(batch0).toDF(), 0L)
    clean.applyBatch(spark.createDataset(batch1).toDF(), 1L)

    assert(got != state(clean),
      "non-idempotent mutation went undetected — the convergence harness is vacuous")
    // and the divergence is exactly the attempt stamp, nowhere else:
    def strip(m: Map[String, (Map[String, String], Long)]) =
      m.view.mapValues { case (v, ver) => (v - "__attempt", ver) }.toMap
    assert(strip(got) == strip(state(clean)))
  }
}
