package graft

import graft.model.Ddl
import graft.streaming.StatefulOps
import graft.streaming.StatefulOps.{GgMessage, VersionedDdl}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

/** Cross-batch state semantics on MemoryStream: the ST1 schema dedup and
  * the SRC2a fingerprint registry (reference mapWithState behaviors). */
class StatefulOpsSpec extends SparkSuite {
  import spark.implicits._

  private def runBatches[T](q: StreamingQuery): Unit = {
    q.processAllAvailable()
  }

  test("schemaDedup suppresses unchanged schemas across batches") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[VersionedDdl]
    val out = StatefulOps.schemaDedup(in.toDS())
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .option("checkpointLocation", checkpointDir("dedup"))
      .outputMode("append").start()

    // batch 1: A@s1, dup A@s1 in-batch, B@s1
    in.addData(VersionedDdl("A", "s1", 1), VersionedDdl("A", "s1", 2),
      VersionedDdl("B", "s1", 3))
    q.processAllAvailable()
    // batch 2: A@s1 again (dup across batches), then A@s2 (real change)
    in.addData(VersionedDdl("A", "s1", 4), VersionedDdl("A", "s2", 5))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("dedup_out").as[Ddl].collect().toSet
    assert(got == Set(Ddl("A", "s1"), Ddl("B", "s1"), Ddl("A", "s2")))
  }

  test("resolveSchemas joins data messages with registry state, in and across batches") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[GgMessage]
    val out = StatefulOps.resolveSchemas(in.toDS())
    val q = out.writeStream.format("memory").queryName("registry_out")
      .option("checkpointLocation", checkpointDir("registry"))
      .outputMode("append").start()

    // batch 1: schema for fp=7 arrives with its data in the same batch
    in.addData(GgMessage("schema", 7L, "sch7", 1),
      GgMessage("data", 7L, "row-a", 2))
    q.processAllAvailable()
    // batch 2: more fp=7 data (state carried over) + unknown fp=9 data
    in.addData(GgMessage("data", 7L, "row-b", 3),
      GgMessage("data", 9L, "row-c", 4))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("registry_out")
      .as[StatefulOps.ResolvedData].collect()
      .map(r => (r.payload, r.schemaJson)).toSet
    assert(got == Set(
      ("row-a", Some("sch7")),
      ("row-b", Some("sch7")),
      ("row-c", None)))
  }

  test("resolveSchemasV2 (transformWithState) matches the flatMapGroupsWithState form") {
    // state v2 requires the RocksDB state store provider
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val ctx = spark.sqlContext
      val in = MemoryStream[GgMessage]
      val q = StatefulOps.resolveSchemasV2(in.toDS())
        .writeStream.format("memory").queryName("registry_v2_out")
        .option("checkpointLocation", checkpointDir("registry-v2"))
        .outputMode("append").start()

      in.addData(GgMessage("schema", 7L, "sch7", 1),
        GgMessage("data", 7L, "row-a", 2))
      q.processAllAvailable()
      in.addData(GgMessage("data", 7L, "row-b", 3),
        GgMessage("data", 9L, "row-c", 4))
      q.processAllAvailable()
      q.stop()

      val got = spark.table("registry_v2_out")
        .as[StatefulOps.ResolvedData].collect()
        .map(r => (r.payload, r.schemaJson, r.version)).toSet
      assert(got == Set(
        ("row-a", Some("sch7"), 2L),
        ("row-b", Some("sch7"), 3L),
        ("row-c", None, 4L)))
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("sessionizeWithTimers closes idle sessions via event-time timers") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val ctx = spark.sqlContext
      import StatefulOps.{ClosedSession, SessEv}
      val in = MemoryStream[SessEv]
      val q = StatefulOps.sessionizeWithTimers(in.toDS(), gapMillis = 5000L)
        .writeStream.format("memory").queryName("sess_timer_out")
        .option("checkpointLocation", checkpointDir("sess-timer"))
        .outputMode("append").start()

      def got(): Set[(Long, Long, Long, Long)] =
        spark.table("sess_timer_out").as[ClosedSession].collect()
          .map(c => (c.user, c.startMillis, c.endMillis, c.nEvents)).toSet

      // user 1: two in-gap events merge; user 3's in-batch gap closes
      // its first session with no watermark involved. Then the post-
      // batch no-data cycle sees watermark=60000 and fires user 1's
      // timer (7000) — the IDLE-session close only timers can do —
      // while user 3's open session (timer 65000) correctly survives.
      in.addData(SessEv(1, 1000), SessEv(1, 2000),
        SessEv(3, 1000), SessEv(3, 60000))
      q.processAllAvailable()
      assert(got() == Set((3L, 1000L, 1000L, 1L), (1L, 1000L, 2000L, 2L)),
        s"unexpected after batch 1: ${got()}")

      // user 1's state was CLEARED by the timer close: its next event
      // starts a fresh session. Watermark jumps to 200000, closing
      // user 3's second session (timer 65000) and user 1's new one
      // (timer 105000); user 9 (timer 205000) stays open.
      in.addData(SessEv(1, 100000), SessEv(9, 200000))
      q.processAllAvailable()
      assert(got() == Set(
        (3L, 1000L, 1000L, 1L), (1L, 1000L, 2000L, 2L),
        (3L, 60000L, 60000L, 1L), (1L, 100000L, 100000L, 1L)),
        s"unexpected after batch 2: ${got()}")
      assert(!got().exists(_._1 == 9L), "open session must not emit")
      q.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("sessionize late-data contract: sub-watermark events drop, admitted out-of-order events merge backward") {
    // The documented choice, pinned positively (SURVEY §2.2's delivery
    // contract): an out-of-order event that is ≥ the watermark when its
    // batch runs MERGES into the open session (extending start via the
    // math.min path — across a batch boundary, not just in-batch), and
    // an event BELOW the watermark is DROPPED by the engine's late-row
    // filter before the processor sees it — it can neither extend nor
    // reopen anything. The closed session therefore equals the batch
    // gap-island oracle over exactly the ADMITTED events.
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val ctx = spark.sqlContext
      import StatefulOps.{ClosedSession, SessEv}
      val in = MemoryStream[SessEv]
      val q = StatefulOps.sessionizeWithTimers(in.toDS(), gapMillis = 5000L,
          delay = "2 seconds")
        .writeStream.format("memory").queryName("sess_late_out")
        .option("checkpointLocation", checkpointDir("sess-late"))
        .outputMode("append").start()

      // batch 1: user 7 opens at 10000; user 5's event sets the global
      // watermark to max(11000) − 2000 = 9000 after the batch
      in.addData(SessEv(7, 10000), SessEv(5, 11000))
      q.processAllAvailable()

      // batch 2, out of order: 9500 ≥ watermark 9000 → admitted, earlier
      // than the open session's start → merges BACKWARD to (9500, 10000);
      // 8500 < 9000 → late, dropped before the processor
      in.addData(SessEv(7, 9500), SessEv(7, 8500))
      q.processAllAvailable()

      // batch 3: advance the watermark past every armed timer
      in.addData(SessEv(9, 30000))
      q.processAllAvailable()
      q.stop()

      val got = spark.table("sess_late_out").as[ClosedSession].collect()
        .map(c => (c.user, c.startMillis, c.endMillis, c.nEvents)).toSet
      // batch gap-island oracle over the admitted events {10000, 9500}:
      // one island (9500, 10000) of 2 — NOT (8500, 10000) of 3, which is
      // what a leaked late event would produce
      assert(got.contains((7L, 9500L, 10000L, 2L)),
        s"late-data contract violated: $got")
      assert(got.contains((5L, 11000L, 11000L, 1L)), s"user 5 session lost: $got")
      assert(!got.exists(t => t._1 == 7L && t._2 == 8500L),
        s"sub-watermark event leaked into a session: $got")
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("funnelStages matches the batch window funnel on ordered delivery") {
    import graft.streaming.StatefulOps.FunnelEv
    implicit val ctx = spark.sqlContext
    val evs = Seq(
      FunnelEv(1, "view", 0), FunnelEv(1, "click", 5), FunnelEv(1, "purchase", 9),
      FunnelEv(2, "click", 1), FunnelEv(2, "view", 3), FunnelEv(2, "click", 7),
      FunnelEv(3, "view", 2), FunnelEv(3, "purchase", 4), // no click → stays 1
      FunnelEv(4, "view", 6), FunnelEv(4, "click", 6),    // same instant → not after
      FunnelEv(5, "error", 1))                            // never enters → no rows

    val in = MemoryStream[FunnelEv]
    val q = StatefulOps.funnelStages(in.toDS())
      .writeStream.format("memory").queryName("funnel_out")
      .option("checkpointLocation", checkpointDir("funnel"))
      .outputMode("append").start()
    // event-time-ordered delivery split across two batches
    val ordered = evs.sortBy(_.tsMillis)
    val (b1, b2) = ordered.splitAt(ordered.length / 2)
    in.addData(b1: _*); q.processAllAvailable()
    in.addData(b2: _*); q.processAllAvailable()
    q.stop()

    val streamed = spark.table("funnel_out")
      .groupBy($"user").agg(org.apache.spark.sql.functions.max($"stage").as("stage"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap

    // batch twin: st14's stacked conditional window mins
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy($"user")
    val batch = evs.toDF("user", "kind", "ts")
      .withColumn("v1", min(when($"kind" === "view", $"ts")).over(w))
      .withColumn("c1", min(when($"kind" === "click" && $"ts" > $"v1", $"ts")).over(w))
      .withColumn("p1", min(when($"kind" === "purchase" && $"ts" > $"c1", $"ts")).over(w))
      .groupBy($"user")
      .agg(max($"v1").as("v1"), max($"c1").as("c1"), max($"p1").as("p1"))
      .withColumn("stage", when($"p1".isNotNull, 3).when($"c1".isNotNull, 2)
        .when($"v1".isNotNull, 1).otherwise(0))
      .collect().map(r => (r.getLong(0), r.getInt(r.fieldIndex("stage")))).toMap

    // streamed emits only users whose stage ADVANCED past 0
    assert(streamed == batch.filter(_._2 > 0),
      s"stream $streamed != batch ${batch.filter(_._2 > 0)}")
    assert(streamed == Map(1L -> 3, 2L -> 2, 3L -> 1, 4L -> 1))
  }

  test("suppressRepeats: state TTL swallows repeats, then readmits the key") {
    import graft.streaming.StatefulOps.KeyedEv
    // ProcessingTime time-mode queries schedule batches CONTINUOUSLY —
    // the TTL clock has to advance — so drain-style waits
    // (processAllAvailable / AvailableNow) never settle. Drive the
    // query free-running instead and assert on what it emitted, using
    // the progress stream to prove the suppressed rows were actually
    // PROCESSED (an unprocessed row would vacuously "not leak").
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val ctx = spark.sqlContext
      val in = MemoryStream[KeyedEv]
      val q = StatefulOps.suppressRepeats(in.toDS(),
          java.time.Duration.ofSeconds(8))
        .writeStream.format("memory").queryName("ttl_out")
        .option("checkpointLocation", checkpointDir("ttl"))
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(200L))
        .start()
      def emitted() = spark.table("ttl_out").as[KeyedEv].collect().toSeq
      def processed(): Long =
        q.recentProgress.map(_.numInputRows).sum
      def waitFor(what: String)(cond: => Boolean): Unit = {
        val deadline = System.currentTimeMillis() + 60000
        while (!cond) {
          assert(System.currentTimeMillis() < deadline, s"timed out: $what")
          Thread.sleep(200)
        }
      }

      // phase 1: first a emits, in-batch repeat swallowed, b emits
      in.addData(KeyedEv("a", "a1"), KeyedEv("a", "a2"), KeyedEv("b", "b1"))
      waitFor("phase-1 rows processed")(processed() >= 3)
      // phase 2 (well inside the TTL): repeats swallowed
      in.addData(KeyedEv("a", "a3"), KeyedEv("b", "b2"))
      waitFor("phase-2 rows processed")(processed() >= 5)
      assert(emitted().map(_.payload).sorted == Seq("a1", "b1"),
        s"suppression window leaked: ${emitted()}")

      // let the TTL lapse — the STORE evicts the suppression state
      Thread.sleep(10000)
      in.addData(KeyedEv("a", "a4"))
      waitFor("readmission after TTL")(
        emitted().map(_.payload).sorted == Seq("a1", "a4", "b1"))
      q.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
