package graft

import graft.sinks.{ParquetUpsertStore, UpsertSink}
import graft.sources.{ChangeFeedProvider, ChangeTrackingStore}
import graft.streaming.CtPipeline
import org.apache.spark.sql.types._

/** The full reference pipeline as ONE streaming flow at moderate volume:
  * a 3-table CT simulator feed (the reference integration suite's I/U/D
  * sequence, CTSQLServerPluginIntegrationTest.java:322-390, run per
  * table) → per-batch DDL snapshots → envelope assembly → the durable
  * store with auto-compact + auto-vacuum on — then per-table TYPED
  * snapshots through each table's recorded (and mid-stream evolved)
  * schema. */
class EndToEndCdcSpec extends SparkSuite {

  private val s1 = StructType(Seq(
    StructField("key", LongType), StructField("payload", StringType)))
  private val s2 = StructType(s1.fields :+ StructField("extra", StringType))
  private val tables = Seq("dbo.orders", "dbo.items", "dbo.users")

  test("3-table feed with mid-stream DDL through the auto-compacting store") {
    val feed = "e2e-feed"
    ChangeTrackingStore.drop(feed)
    val ct = ChangeTrackingStore.get(feed)
    tables.foreach(t => ct.setSchema(t, s1.json))
    // batch 1: the INSERT leg, 50 keys per table
    for (t <- tables; k <- 1L to 50L) ct.append(t, "INSERT", k, s"$t-v$k")

    val storeDir = checkpointDir("e2e-store")
    val store = new ParquetUpsertStore(storeDir,
      numBuckets = 4, autoCompactManifests = 2, autoVacuumRetainBatches = 2)
    val stream = spark.readStream
      .format(classOf[ChangeFeedProvider].getName)
      .option("store", feed).option("numPartitions", "4")
      .option("emitDdl", "true").load()
    val q = UpsertSink.stream(CtPipeline.toEnvelope(stream), store,
      checkpointDir("e2e-ckpt"))
    q.processAllAvailable()

    // batch 2: the UPDATE leg on every other key, all three tables
    for (t <- tables; k <- 1L to 50L by 2) ct.append(t, "UPDATE", k, s"$t-v$k-u")
    q.processAllAvailable()

    // batch 3: mid-stream DDL evolution on ONE table + the DELETE leg
    ct.setSchema("dbo.orders", s2.json)
    for (t <- tables; k <- 41L to 50L) ct.append(t, "DELETE", k, "-")
    q.processAllAvailable()

    // batch 4: post-DDL inserts land on the evolved table
    ct.append("dbo.orders", "INSERT", 100L, "late")
    q.processAllAvailable()
    q.stop()

    // per-table typed snapshots through each table's RECORDED schema
    for (t <- tables) {
      val typed = store.snapshotTyped(spark, t)
      val rows = typed.collect().map(r => r.getLong(0) -> r).toMap
      assert(rows.keySet == ((1L to 40L).toSet
        ++ (if (t == "dbo.orders") Set(100L) else Set.empty[Long])),
        s"$t live keys")
      // updates won over inserts (version order), deletes are gone
      assert(rows(1L).getString(1) == s"$t-v1-u")
      assert(rows(2L).getString(1) == s"$t-v2")
      if (t == "dbo.orders") {
        // the evolved column exists, typed; pre-DDL rows read NULL for it
        assert(typed.schema.fieldNames.toSeq == Seq("key", "payload", "extra"))
        assert(rows(1L).isNullAt(2))
        assert(store.schemaOf(spark, t).get.fieldNames.contains("extra"))
      } else {
        assert(typed.schema.fieldNames.toSeq == Seq("key", "payload"),
          s"untouched table $t keeps its schema")
      }
    }

    // the policy actually fired: manifests are bounded for every table and
    // at least one table's working set was folded into a compaction snapshot
    val root = new java.io.File(storeDir)
    val perTable = tables.map { t =>
      val names = new java.io.File(root, t).list().toSet
      assert(names.count(_.matches("manifest-\\d+")) <= 3,
        s"$t manifests unbounded: $names")
      names
    }
    assert(perTable.exists(_.exists(_.endsWith("-c"))),
      "auto-compact never produced a compacted snapshot")

    // replaying the whole feed from scratch against the SAME store
    // directory (a new checkpoint = at-least-once redelivery of every
    // batch) must not change any converged snapshot
    val settled = tables.map(t => t -> store.snapshotTyped(spark, t)
      .collect().map(_.toSeq).toSet).toMap
    val stream2 = spark.readStream
      .format(classOf[ChangeFeedProvider].getName)
      .option("store", feed).option("numPartitions", "4")
      .option("emitDdl", "true").load()
    val q2 = UpsertSink.stream(CtPipeline.toEnvelope(stream2), store,
      checkpointDir("e2e-ckpt-replay"))
    q2.processAllAvailable()
    q2.stop()
    for (t <- tables)
      assert(store.snapshotTyped(spark, t).collect().map(_.toSeq).toSet
        == settled(t), s"replay changed $t")
  }
}
