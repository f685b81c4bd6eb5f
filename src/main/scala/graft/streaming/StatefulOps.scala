package graft.streaming

import graft.model.Ddl
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions.{col, timestamp_millis}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Cross-batch stateful operators — the streaming forms of the
  * reference's two `mapWithState` uses (SURVEY.md §2.2).
  *
  * Both are keyed `flatMapGroupsWithState` with NoTimeout (state is
  * small and unbounded by design: one schema string per table /
  * fingerprint). Unlike the reference — which funnels everything through
  * a single constant key, a 1-task barrier (CTSQLServer.java:142-147,
  * GoldenGateKafka.java:196-237) — these key by table / fingerprint, so
  * state work parallelizes across executors and scales with the number
  * of tables, not the stream volume. At scale, back with the RocksDB
  * state store (config `spark.sql.streaming.stateStore.providerClass`).
  */
object StatefulOps {

  /** A DDL event with an explicit ordering version (micro-batch records
    * carry no intrinsic order inside a group). */
  case class VersionedDdl(table: String, schemaJson: String, version: Long)

  /** GoldenGate-style wrapper message: either a schema definition
    * (kind="schema", payload=schema JSON) or a data message
    * (kind="data", payload=Avro-wrapped row) carrying the fingerprint of
    * the schema it was written with. */
  case class GgMessage(kind: String, fingerprint: Long, payload: String, version: Long)

  /** A data message with its schema resolved from registry state
    * (schemaJson is None if the schema was never seen — the reference
    * throws here; we surface it as None for the caller to route to a
    * dead-letter sink). `version` carries the message's source order
    * through (the offset-derived version of the [[GgMessage]]). */
  case class ResolvedData(fingerprint: Long, payload: String,
                          schemaJson: Option[String], version: Long = 0L)

  /** ST1 — DDL dedup: a table's schema passes through only when it
    * differs from the last schema seen for that table, across batches
    * (reference CTSQLServer.java:170-201). */
  def schemaDedup(ddl: Dataset[VersionedDdl]): Dataset[Ddl] = {
    import ddl.sparkSession.implicits._
    ddl.groupByKey(_.table)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (table: String, recs: Iterator[VersionedDdl], state: GroupState[String]) => {
          val out = Seq.newBuilder[Ddl]
          var last = state.getOption.orNull
          recs.toSeq.sortBy(_.version).foreach { r =>
            if (last == null || last != r.schemaJson) {
              out += Ddl(table, r.schemaJson)
              last = r.schemaJson
            }
          }
          if (last != null) state.update(last)
          out.result().iterator
        })
  }

  /** SRC2a — fingerprint→schema registry: schema messages install state;
    * data messages resolve against it (reference
    * GoldenGateKafka.java:196-237). Keyed by fingerprint (not the
    * reference's single constant key), so distinct schemas resolve in
    * parallel; schema messages in the same batch as their data sort
    * first ("data" > "schema" on version tie). */
  def resolveSchemas(msgs: Dataset[GgMessage]): Dataset[ResolvedData] = {
    import msgs.sparkSession.implicits._
    msgs.groupByKey(_.fingerprint)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (fp: Long, recs: Iterator[GgMessage], state: GroupState[String]) => {
          val out = Seq.newBuilder[ResolvedData]
          var schema = state.getOption
          recs.toSeq.sortBy(r => (r.version, if (r.kind == "schema") 0 else 1))
            .foreach { r =>
            if (r.kind == "schema") schema = Some(r.payload)
            else out += ResolvedData(fp, r.payload, schema, r.version)
          }
          schema.foreach(state.update)
          out.result().iterator
        })
  }

  /** SRC2a on the state-v2 API: the same registry semantics as
    * [[resolveSchemas]], expressed as a `StatefulProcessor` for
    * `transformWithState` — the forward-looking operator whose named
    * state handles live in the RocksDB state store (required provider),
    * giving changelog checkpointing and state rebalancing at scale.
    * Semantics are identical by construction; the spec asserts both
    * forms produce the same output on the same stream. */
  class SchemaRegistryProcessor
      extends StatefulProcessor[Long, GgMessage, ResolvedData] {
    @transient private var schema: ValueState[String] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      schema = getHandle.getValueState("schema", Encoders.STRING, TTLConfig.NONE)
    override def handleInputRows(fp: Long, recs: Iterator[GgMessage],
                                 tv: TimerValues): Iterator[ResolvedData] = {
      val out = Seq.newBuilder[ResolvedData]
      var cur = if (schema.exists()) Some(schema.get()) else None
      recs.toSeq.sortBy(r => (r.version, if (r.kind == "schema") 0 else 1))
        .foreach { r =>
          if (r.kind == "schema") cur = Some(r.payload)
          else out += ResolvedData(fp, r.payload, cur, r.version)
        }
      cur.foreach(schema.update)
      out.result().iterator
    }
  }

  def resolveSchemasV2(msgs: Dataset[GgMessage]): Dataset[ResolvedData] = {
    import msgs.sparkSession.implicits._
    msgs.groupByKey(_.fingerprint)
      .transformWithState(new SchemaRegistryProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  /** A session event (millis event time). */
  case class SessEv(user: Long, tsMillis: Long)

  /** A closed session: inclusive [start, end] millis + event count. */
  case class ClosedSession(user: Long, startMillis: Long, endMillis: Long,
                           nEvents: Long)

  /** Per-key open-session state: fixed size (three longs), never an
    * event buffer. */
  case class SessAgg(start: Long, end: Long, n: Long)

  /** st03/st10's gap sessionization with WATERMARK-DRIVEN closure — the
    * event-time-timer form only the state-v2 API can express: each key
    * holds one open-session aggregate and ONE armed timer at
    * lastEvent + gap; when the watermark passes it, `handleExpiredTimer`
    * emits the closed session and clears the state, so an idle user's
    * session closes without another of their events ever arriving (the
    * case `flatMapGroupsWithState` can only approximate with
    * processing-time timeouts, and the in-batch window form cannot see
    * at all). A new in-gap event re-arms the timer (delete + register —
    * at most one live timer per key).
    *
    * Scale posture: state is three longs + one timer per ACTIVE key —
    * bounded by concurrently-open sessions, not stream volume; timers
    * and state live in the RocksDB store (changelog-checkpointed); the
    * per-batch sort is over one key's rows within one micro-batch,
    * bounded by admission control, never a global sort. */
  class SessionTimerProcessor(gapMillis: Long)
      extends StatefulProcessor[Long, SessEv, ClosedSession] {
    @transient private var sess: ValueState[SessAgg] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sess = getHandle.getValueState("sess", Encoders.product[SessAgg],
        TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[SessEv],
                                 tv: TimerValues): Iterator[ClosedSession] = {
      val out = Seq.newBuilder[ClosedSession]
      var cur = if (sess.exists()) Option(sess.get()) else None
      val armed = cur.map(_.end + gapMillis)
      rows.toSeq.sortBy(_.tsMillis).foreach { e =>
        cur match {
          case Some(a) if e.tsMillis - a.end <= gapMillis =>
            // min on start: a late-but-admitted event that precedes the
            // open session's first event must EXTEND the island backward
            // (batch gap-island semantics), not silently attach at the
            // old start.
            cur = Some(SessAgg(math.min(a.start, e.tsMillis),
              math.max(a.end, e.tsMillis), a.n + 1))
          case Some(a) => // in-batch gap: close immediately, start fresh
            out += ClosedSession(user, a.start, a.end, a.n)
            cur = Some(SessAgg(e.tsMillis, e.tsMillis, 1))
          case None =>
            cur = Some(SessAgg(e.tsMillis, e.tsMillis, 1))
        }
      }
      cur.foreach { a =>
        sess.update(a)
        val want = a.end + gapMillis
        if (!armed.contains(want)) {
          armed.foreach(getHandle.deleteTimer)
          getHandle.registerTimer(want)
        }
      }
      out.result().iterator
    }

    override def handleExpiredTimer(user: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[ClosedSession] = {
      // A stale timer (re-armed later by an in-gap event) can only be
      // EARLIER than end+gap; firing it must not close the live session.
      if (sess.exists()) {
        val a = sess.get()
        if (info.getExpiryTimeInMs >= a.end + gapMillis) {
          sess.clear()
          return Iterator.single(ClosedSession(user, a.start, a.end, a.n))
        }
      }
      Iterator.empty
    }
  }

  /** Watermarked entry point for [[SessionTimerProcessor]]: 0s default
    * delay — callers widen it for out-of-order feeds (st20's lateness
    * histogram is the sizing measurement). Late-data contract, pinned
    * by spec: an event BELOW the watermark when its batch runs is
    * dropped by the engine's late-row filter before the processor sees
    * it (it can neither extend nor reopen a session); an out-of-order
    * event AT/ABOVE the watermark is admitted and island-merges, and
    * the closed session equals the batch gap-island oracle over exactly
    * the admitted events. Out-of-order caveats, precisely:
    * an admitted late event lands island-correctly when it falls within
    * `gapMillis` of the OPEN session (merge extends start via min / end
    * via max), but (a) an event more than a gap EARLIER than the open
    * session's start still merges rather than forming its own earlier
    * island, and (b) an event for an already-CLOSED session cannot
    * reopen it (Append mode emits each closed session once). Exact
    * equality with the batch gap-island oracle therefore requires
    * per-user event-time-ordered delivery across batches — which the
    * 0s-delay watermark enforces; widened delays trade that equality
    * for admission. */
  def sessionizeWithTimers(evs: Dataset[SessEv], gapMillis: Long,
                           delay: String = "0 seconds"): Dataset[ClosedSession] = {
    import evs.sparkSession.implicits._
    evs.withColumn("eventTime", timestamp_millis(col("tsMillis")))
      .withWatermark("eventTime", delay)
      .as[SessEv]
      .groupByKey(_.user)
      .transformWithState(new SessionTimerProcessor(gapMillis),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** A funnel event (millis event time; minute-level fixtures lose
    * nothing). */
  case class FunnelEv(user: Long, kind: String, tsMillis: Long)

  /** A user's funnel progress emitted each time the reached stage
    * advances (Append): stage 1 = first "view", 2 = first "click"
    * strictly after it, 3 = first "purchase" strictly after that. */
  case class FunnelRow(user: Long, stage: Int, v1: Option[Long],
                       c1: Option[Long], p1: Option[Long])

  /** Per-user funnel state: the three optional first-hit timestamps. */
  case class FunnelState(v1: Option[Long], c1: Option[Long], p1: Option[Long])

  /** st14's ordered funnel as cross-batch keyed state — the streaming
    * twin of the batch window form (spec-asserted equal). State per user
    * is three optional first-hit timestamps (fixed size — no event
    * buffer). Within a batch events are processed in event-time order;
    * across batches the equality with the batch form holds for per-user
    * event-time-ordered delivery (the watermarked-source contract — a
    * late view arriving after a click was consumed can't retroactively
    * lower v1, exactly like any first-match streaming semantics). */
  def funnelStages(evs: Dataset[FunnelEv]): Dataset[FunnelRow] = {
    import evs.sparkSession.implicits._
    evs.groupByKey(_.user)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, recs: Iterator[FunnelEv], state: GroupState[FunnelState]) => {
          val s0 = state.getOption.getOrElse(FunnelState(None, None, None))
          var v1 = s0.v1; var c1 = s0.c1; var p1 = s0.p1
          def stage = if (p1.isDefined) 3 else if (c1.isDefined) 2
            else if (v1.isDefined) 1 else 0
          val out = Seq.newBuilder[FunnelRow]
          var last = stage
          recs.toSeq.sortBy(_.tsMillis).foreach { e =>
            e.kind match {
              case "view" if v1.isEmpty => v1 = Some(e.tsMillis)
              case "click" if c1.isEmpty && v1.exists(e.tsMillis > _) =>
                c1 = Some(e.tsMillis)
              case "purchase" if p1.isEmpty && c1.exists(e.tsMillis > _) =>
                p1 = Some(e.tsMillis)
              case _ =>
            }
            if (stage != last) { out += FunnelRow(user, stage, v1, c1, p1); last = stage }
          }
          state.update(FunnelState(v1, c1, p1))
          out.result().iterator
        })
  }

  case class KeyedEv(key: String, payload: String)

  /** TTL-suppressed emission — the alerting-dedup contract: the FIRST
    * arrival of a key emits and arms a per-key suppression state;
    * repeats are swallowed while the state lives; once the TTL lapses
    * (no re-arm — suppression measures from the first emission, not
    * the last attempt), the key emits again. This is the face of
    * Spark 4's STATE TTL (`TTLConfig` on a `transformWithState` value
    * state): eviction the STORE performs by wall-clock, with no timer
    * bookkeeping in the processor — the right tool when state must
    * die by age rather than by event-time logic (contrast
    * [[SessionTimerProcessor]], whose lifecycle IS event-time).
    * Processing-time TTL means replays can differ across runs — use
    * the timer form when exactly-once emission matters more than
    * state-size bounds. */
  class TtlSuppressProcessor(ttl: java.time.Duration)
      extends StatefulProcessor[String, KeyedEv, KeyedEv] {
    @transient private var seen: ValueState[Boolean] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState("seen", Encoders.scalaBoolean,
        new TTLConfig(ttl))
    override def handleInputRows(key: String, rows: Iterator[KeyedEv],
                                 tv: TimerValues): Iterator[KeyedEv] = {
      val out = Seq.newBuilder[KeyedEv]
      rows.foreach { r =>
        // get() returns nothing once the TTL has lapsed — the store
        // evicted it; no processor-side clock reads.
        if (!seen.exists()) { out += r; seen.update(true) }
      }
      out.result().iterator
    }
  }

  /** [[TtlSuppressProcessor]] wired over a keyed stream. */
  def suppressRepeats(evs: Dataset[KeyedEv],
                      ttl: java.time.Duration): Dataset[KeyedEv] = {
    import evs.sparkSession.implicits._
    evs.groupByKey(_.key)
      .transformWithState(new TtlSuppressProcessor(ttl),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }
}
