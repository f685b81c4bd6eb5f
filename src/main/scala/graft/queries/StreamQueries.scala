package graft.queries

import graft.Tables
import graft.operators.{CdcApply, EventOps}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time operators over the `events` stream table — the streaming
  * analytics surface (SURVEY.md §2.2: the reference has *no* watermarks/
  * windows; these are the ⊕ additions), exercised in batch form so the
  * DuckDB oracle can verify them. The same expressions run under
  * `readStream` with a watermark — spec-tested in graft.streaming.
  */
object StreamQueries {
  import Q._

  val queries: Map[String, QueryFn] = Map(
    // Gap sessionization closed by EVENT-TIME TIMERS — a real
    // `transformWithState` stream end-to-end (state v2, RocksDB store),
    // not a batch twin: each key holds one fixed-size open-session
    // aggregate and one armed timer at lastEvent+gap; the watermark
    // passing it emits the closed session and clears the state
    // (StatefulOps.SessionTimerProcessor). Ingest is the cdc24-style
    // test double (driver-fed MemoryStream — the ingest is the test
    // harness, not the operator); a far-future sentinel advances the
    // watermark so every real session closes, exactly the oracle's
    // batch gap-island semantics. 24h gap over users < 50.
    "st21_timer_sessions" -> ((s, d) => {
      import graft.streaming.StatefulOps
      import s.implicits._
      val gap = 86400000L
      val evs = Tables.events(s, d).filter(col("user_id") < 50)
        .select(col("user_id").cast("long"), unix_millis(col("ts")))
        .collect().map(r => StatefulOps.SessEv(r.getLong(0), r.getLong(1)))
      // A fixture whose user_id range drifts away from [0, 50) must
      // yield an empty result, not an opaque empty.max crash.
      val maxT = evs.iterator.map(_.tsMillis).foldLeft(0L)(math.max)
      val key = "spark.sql.streaming.stateStore.providerClass"
      val ckey = "spark.sql.shuffle.partitions"
      val prev = s.conf.getOption(key)
      val prevC = s.conf.getOption(ckey)
      s.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      // State-partition sizing is a KEYSPACE decision, not a core-count
      // one: this stream's declared ingest is bounded to 50 session keys
      // (user_id < 50), so 32 state partitions hold <2 keys each while
      // every micro-batch pays one RocksDB instance open + version
      // commit PER PARTITION — measured 32×4 commits ≈ 70 task-seconds
      // of wait for ~0.1 s of state work. Eight partitions is the same
      // declared-keyspace sizing at any cluster size (the count is
      // checkpoint-sticky, set once at stream creation). RocksDB
      // changelog checkpointing was A/B'd here too and measured FLAT
      // (3.8 s vs 3.9/3.7 s) — the per-batch cost is instance
      // open/commit, not snapshot upload — so it is session posture
      // (GraftSession), not query configuration.
      s.conf.set(ckey, "8")
      try {
        implicit val ctx = s.sqlContext
        val in = org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[StatefulOps.SessEv]
        val qname = "st21_timer_sessions_out"
        s.catalog.dropTempView(qname) // bench reps reuse the JVM
        val q = StatefulOps.sessionizeWithTimers(in.toDS(), gap)
          .writeStream.format("memory").queryName(qname)
          .option("checkpointLocation", freshDir("st21-ckpt"))
          .outputMode("append").start()
        // stop() in finally: a transient failure mid-stream must not
        // leak an active query holding the sink name — that would fail
        // every later rep/retry at start() for the rest of the JVM.
        try {
          in.addData(evs.toSeq)
          q.processAllAvailable()
          in.addData(StatefulOps.SessEv(-1L, maxT + 2 * gap + 1))
          q.processAllAvailable()
        } finally q.stop()
        s.table(qname).filter(col("user") >= 0)
          .select(col("user").as("user_id"),
            col("startMillis").as("start_millis"),
            col("endMillis").as("end_millis"),
            col("nEvents").as("n_events"))
          .orderBy(col("user_id"), col("start_millis"))
      } finally {
        prev match {
          case Some(p) => s.conf.set(key, p)
          case None => s.conf.unset(key)
        }
        prevC match {
          case Some(p) => s.conf.set(ckey, p)
          case None => s.conf.unset(ckey)
        }
      }
    }),

    // STREAMING schema-drift monitor — q64's key×type-tier profile run
    // the way an ingest pipeline actually runs it: per MICRO-BATCH
    // (epochs arrive in order), each batch profiled in one scan
    // (variant_explode + tier-collapsed schema_of_variant) and folded
    // into a keyed parquet artifact with a drift status stamped
    // against everything the monitor saw before — first-seen keys
    // (new_key) and type-drifted keys (new_type) are the live alerts,
    // the in-band DDL monitor of the reference's dynamic-schema stance
    // (common/Schemas.java:50-54) as a stream. The payload derivation
    // is q64's exactly (epoch-gated fragments drifting over epochs);
    // the oracle rebuilds the same JSON in DuckDB and computes the
    // status as a window over the batch profile — first epoch of the
    // key = new_key, first epoch of the (key, tier) pair = new_type.
    // DriftMonitorStreamSpec drives the same operator through a real
    // MemoryStream foreachBatch at every cadence; this entry pins the
    // artifact composition end-to-end. The returned plan reads ONLY
    // the artifact (PlanAuditSpec pins epochs-not-corpus).
    "st22_drift_monitor" -> ((s, d) => {
      import graft.streaming.DriftMonitor
      val ev = Tables.events(s, d).filter(col("props").isNotNull)
      val epoch = pmod(col("event_id"), lit(3)).cast("int")
      val kF = concat(lit("\"k\": "),
        variant_get(parse_json(col("props")), "$.k", "int").cast("string"))
      val amtF = when(epoch >= 1,
        concat(lit("\"amt\": "), (floor(col("value")) + 0.5).cast("string")))
      val tagsF = when(epoch === 2 && col("event_type") === "click",
        concat(lit("\"tags\": [\""), col("event_type"), lit("\", 7]")))
      val metaF = when(epoch === 2 && pmod(col("user_id"), lit(5)) === 0,
        lit("\"meta\": {\"src\": \"web\"}"))
      val noteF = when(pmod(col("user_id"), lit(11)) === 0,
        lit("\"note\": null"))
      // persist: one corpus materialization feeds the three epoch
      // micro-batches (the persist-the-batch rule); the JSON rides as
      // STRING in the cache, parsed per batch
      val docs = ev.select(epoch.as("epoch"),
        concat(lit("{"), concat_ws(", ", kF, amtF, tagsF, metaF, noteF),
          lit("}")).as("js")).persist()
      val dir = freshDir("st22")
      try Seq(0, 1, 2).foreach { e =>
        DriftMonitor.ingest(s, dir, DriftMonitor.profileBatch(
          docs.filter(col("epoch") === e)
            .select(col("epoch"), parse_json(col("js")).as("v"))),
          batchId = e.toLong)
      } finally docs.unpersist()
      DriftMonitor.monitor(s, dir)
        .select(col("epoch"), col("key"), col("vtype"), col("n"),
          col("status"))
        .orderBy(col("epoch"), col("key"), col("vtype"))
    }),

    // Tumbling 1-hour event-time window: Spark's streaming `window()`
    // operator (struct start/end), counts + exact sums per window×type.
    "st01_tumbling_window" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))
        .select(col("w.start").as("win_start"), col("event_type"),
          col("n"), col("total"))
        .orderBy(col("win_start"), col("event_type"))
    }),

    // Windowed approximate-distinct — the streaming cardinality shape
    // (distinct users per window at stream scale is a sketch, never an
    // exact set): per tumbling hour, the exact count stands next to the
    // HLL estimate with a ≤5% (≈3σ at p=12) gate. The sketch is a
    // fixed-size mergeable partial (splitmix64-hashed, deterministic ⇒
    // oracle-gateable exactly like q22); under `readStream` the same
    // aggregate runs per watermarked window with sketch-sized state.
    // The gate carries an absolute ±3 floor beside the 5% band: at tiny
    // per-window cardinalities linear counting loses ~1 per register
    // collision (10 users over 4096 registers collide in ~1% of
    // windows), which is correct sketch behavior, not drift.
    "st18_windowed_distinct" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"))
        .agg(countDistinct(col("user_id")).as("exact_users"),
          graft.functions.HllSketchAgg.approxDistinct(col("user_id"))
            .as("hll_users"),
          count(lit(1)).as("n"))
        .select(col("w.start").as("win_start"), col("exact_users"), col("n"),
          (abs(col("hll_users") - col("exact_users"))
            <= greatest(col("exact_users") * 0.05, lit(3.0)))
            .as("hll_within_5pct"))
        .orderBy(col("win_start"))
    }),

    // EWMA smoothing of hourly event volume per type — the
    // anomaly-baseline analytic a monitoring pipeline keeps per key
    // (s₁=x₁, sᵢ=α·xᵢ+(1−α)·sᵢ₋₁ over observed hours, α=0.5 so every
    // multiply is exact halving — bit-stable on any engine). EWMA is
    // inherently sequential, so the fold runs per key over the
    // hour-ordered aggregate list: one windowed partial agg collapses
    // the stream to (type, hour) counts first, so the per-key array is
    // hours-long, never events-long — bounded state, the same shape
    // mapGroupsWithState keeps incrementally under readStream.
    "st19_ewma_hourly" -> ((s, d) => {
      val hourly = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("n"))
      hourly.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_hours"),
          sum(col("n")).as("total"),
          aggregate(
            array_sort(collect_list(struct(col("h"), col("n")))),
            lit(Double.NaN),
            (acc, x) => when(isnan(acc), x.getField("n").cast("double"))
              .otherwise(lit(0.5) * x.getField("n").cast("double")
                + lit(0.5) * acc))
            .as("ewma"))
        .orderBy(col("event_type"))
    }),

    // Watermark-sizing profile — the measurement a streaming deploy runs
    // BEFORE picking `withWatermark`'s delay: out-of-orderness = running
    // max event time minus this event's time, in arrival order. The
    // fixture is perfectly time-ordered, so arrival is modeled as
    // multi-partition consumption: a deterministic multiplicative
    // scramble of event_id (Knuth 2654435761 mod 1000003 — exact 64-bit
    // integer arithmetic on both engines) stands in for the unordered
    // merge of source partitions. Bucketed into a lateness histogram
    // (in-order / ≤1m / ≤5m / ≤30m / beyond) with each bucket's share of
    // events — read the row where the cumulative share crosses your loss
    // budget. Scale shape: one user-hash shuffle for the running-max
    // window, then a 5-row global agg; the percentage divides two exact
    // longs.
    "st20_watermark_profile" -> ((s, d) => {
      val arrival = (col("event_id") * lit(2654435761L)) % lit(1000003L)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(arrival.asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val late = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"))
        .withColumn("late_us",
          unix_micros(max(col("ts")).over(w)) - unix_micros(col("ts")))
      val bucket = when(col("late_us") === 0L, "0_in_order")
        .when(col("late_us") <= 60000000L, "1_le_1m")
        .when(col("late_us") <= 300000000L, "2_le_5m")
        .when(col("late_us") <= 1800000000L, "3_le_30m")
        .otherwise("4_gt_30m")
      late.groupBy(bucket.as("bucket"))
        .agg(count(lit(1)).as("n_events"),
          max(col("late_us")).as("max_late_us"))
        .withColumn("pct", col("n_events") * lit(100.0)
          / sum(col("n_events")).over(Window.partitionBy()).cast("double"))
        .orderBy(col("bucket"))
    }),

    // Sliding window (1 hour, 30-minute slide): each event lands in two
    // epoch-aligned windows.
    "st02_sliding_window" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("win_start"), col("n"))
        .orderBy(col("win_start"))
    }),

    // Spark's NATIVE session_window operator (st03 is the hand-rolled
    // island form; this is the built-in): gap-merged per-user sessions,
    // window end = last event + gap. An event exactly at the previous
    // window's end starts a NEW session (merge requires strict overlap)
    // — the oracle's break condition is >= to match.
    "st10_session_window" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("win_start"), col("w.end").as("win_end"),
          col("user_id"), col("n"))
        .orderBy(col("user_id"), col("win_start"))
    }),

    // Stream-static join — the CDC-enrichment shape SURVEY §2.3
    // declares: the change stream joins a BROADCAST static dimension
    // (no stream state, no shuffle of the stream beyond the windowed
    // agg), then aggregates per window × dimension attribute. Unmatched
    // stream rows survive with a NULL dimension (left outer). The
    // streaming twin (MemoryStream + watermark + the same join) runs in
    // StreamingWindowSpec.
    "st11_stream_static_join" -> ((s, d) => {
      val dim = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"))
      Tables.events(s, d)
        .join(broadcast(dim), col("user_id") === col("c_custkey"), "left_outer")
        .groupBy(window(col("ts"), "1 hour").as("w"),
          col("c_nationkey").as("nationkey"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("win_start"), col("nationkey"), col("n"))
        .orderBy(col("win_start"), col("nationkey").asc_nulls_first)
    }),

    // Streaming dedup — the batch statement of
    // `dropDuplicatesWithinWatermark` semantics: within each event-time
    // window, only the distinct (user, event_type) keys survive. The
    // batch form is an exact DISTINCT; the streaming twin (MemoryStream
    // + watermark + dropDuplicatesWithinWatermark, same key set) is
    // asserted equal in StreamingWindowSpec. One distinct shuffle keyed
    // by (key, window) + one windowed count at any scale; state stores
    // hold only in-watermark keys.
    "st12_stream_dedup" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          window(col("ts"), "1 hour").as("w"))
        .distinct()
        .groupBy(col("w.start").as("win_start"))
        .agg(count(lit(1)).as("n_distinct_keys"))
        .orderBy(col("win_start"))
    }),

    // Gap sessionization (30-minute inactivity gap): per-session rollup.
    "st03_sessionize" -> ((s, d) => {
      EventOps.sessionize(Tables.events(s, d), col("user_id"), col("ts"),
        col("event_id"), gapSeconds = 1800L)
        .groupBy(col("user_id"), col("session_seq"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("sess_start"), max(col("ts")).as("sess_end"))
        .orderBy(col("user_id"), col("session_seq"))
    }),

    // As-of join: for each purchase, the latest signup at-or-before it
    // for the same user — via running window max, not a range join.
    "st04_asof_join" -> ((s, d) => {
      EventOps.asofLatestTs(Tables.events(s, d), col("user_id"), col("ts"),
        col("event_id"), col("event_type") === "signup", "last_signup_ts")
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("last_signup_ts"))
        .orderBy(col("event_id"))
    }),

    // Semi-structured extraction: JSON props → typed column + agg.
    "st05_json_extract" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          max(col("k")).as("max_k"))
        .orderBy(col("event_type"))
    }),

    // Streaming-dedup semantics (dropDuplicates on a business key,
    // keeping the earliest arrival) in its batch-verifiable form.
    "st06_stream_dedup" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts").asc, col("event_id").asc)
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"), col("event_id"), col("ts"))
        .orderBy(col("user_id"), col("event_type"))
    }),

    // Range join, bucketized: clicks within the hour before each
    // purchase, per user — an equi-join on (user, time-bucket) with
    // exact range filtering, never a nested-loop range join. Inner
    // semantics: purchases with zero preceding clicks don't appear.
    "st08_range_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("c_id"), col("ts").as("c_ts"))
      graft.operators.EventOps.rangeJoin(purchases, clicks, "user_id",
        "p_ts", "c_ts", windowMicros = 3600000000L)
        .groupBy(col("p_id"))
        .agg(count(lit(1)).as("n_clicks"), max(col("c_id")).as("last_click_id"))
        .orderBy(col("p_id"))
    }),

    // Stream-stream join in its batch-verifiable form: the ad-attribution
    // shape of StreamingWindowSpec's watermarked join (each purchase
    // joined to the clicks in the 10 minutes before it, per user),
    // emitting the attributed PAIRS. The streaming twin runs the same
    // condition with watermarks on both sides so join state expires; the
    // batch plan is the same bucketized equi-join as st08 — never a
    // nested-loop range join.
    "st09_stream_stream_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("c_id"), col("ts").as("c_ts"))
      graft.operators.EventOps.rangeJoin(purchases, clicks, "user_id",
        "p_ts", "c_ts", windowMicros = 600000000L)
        .select(col("user_id"), col("p_id"), col("c_id"), col("p_ts"), col("c_ts"))
        .orderBy(col("p_id"), col("c_id"))
    }),

    // Left-outer stream-stream join in its batch-verifiable form: st09's
    // ad-attribution pairs, but purchases with zero clicks in the 10
    // minutes before them survive null-padded — the rows a watermarked
    // left-outer streaming join null-emits when the purchase's join
    // state expires (StreamingWindowSpec runs that twin on MemoryStream).
    // Plan: the st08/st09 bucketized equi-join plus one left-anti join
    // on the matched purchase ids — no nested loop anywhere.
    "st13_outer_stream_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("c_id"), col("ts").as("c_ts"))
      graft.operators.EventOps.rangeJoinLeftOuter(purchases, clicks, "user_id",
        "p_id", "p_ts", "c_ts", windowMicros = 600000000L)
        .select(col("user_id"), col("p_id"), col("c_id"), col("p_ts"), col("c_ts"))
        .orderBy(col("p_id"), col("c_id").asc_nulls_first)
    }),

    // Ordered funnel conversion: per user, the first view, the first
    // click strictly AFTER that view, and the first purchase strictly
    // after that click — the stage-reached report behind conversion
    // dashboards. No self-joins: one shuffle on user_id, then three
    // stacked per-user window mins (each conditioned on the previous
    // stage's timestamp; same partitioning → Spark reuses the sort, so
    // the funnel depth adds projections, not exchanges).
    "st14_funnel" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
      Tables.events(s, d)
        .withColumn("v1",
          min(when(col("event_type") === "view", col("ts"))).over(w))
        .withColumn("c1",
          min(when(col("event_type") === "click" && col("ts") > col("v1"),
            col("ts"))).over(w))
        .withColumn("p1",
          min(when(col("event_type") === "purchase" && col("ts") > col("c1"),
            col("ts"))).over(w))
        .groupBy(col("user_id"))
        .agg(max(col("v1")).as("v1"), max(col("c1")).as("c1"),
          max(col("p1")).as("p1"))
        .withColumn("stage",
          when(col("p1").isNotNull, lit(3))
            .when(col("c1").isNotNull, lit(2))
            .when(col("v1").isNotNull, lit(1))
            .otherwise(lit(0)))
        .select(col("user_id"), col("v1"), col("c1"), col("p1"), col("stage"))
        .orderBy(col("user_id"))
    }),

    // Temporal (versioned-dimension) join: each purchase enriched with
    // the user's latest non-purchase event value at-or-before it — the
    // "dimension version valid at event time" enrichment over SCD2-style
    // validity windows, realized as one windowed running `last` over the
    // unioned stream (no range join, no per-row probe; same-instant
    // dimension rows apply to same-instant facts).
    "st16_temporal_join" -> ((s, d) => {
      EventOps.asofLatestValue(Tables.events(s, d), col("user_id"), col("ts"),
        col("event_id"), col("event_type") =!= "purchase", col("value"),
        "asof_value")
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("asof_value"))
        .orderBy(col("event_id"))
    }),

    // Cohort retention: users bucketed by signup week (cohort), counted
    // once per later week they were active in — the week-k retention
    // matrix behind growth dashboards. One user shuffle (window min for
    // the signup time), then a distinct on (cohort, week, user) and the
    // final count agg; week arithmetic is Monday-truncated day diffs
    // (exact multiples of 7, so the int cast is engine-agnostic).
    "st15_cohort_retention" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
      Tables.events(s, d)
        .withColumn("signup_ts",
          min(when(col("event_type") === "signup", col("ts"))).over(w))
        .filter(col("signup_ts").isNotNull && col("ts") >= col("signup_ts"))
        .select(col("user_id"),
          date_trunc("week", col("signup_ts")).cast("date").as("cohort_week"),
          (datediff(date_trunc("week", col("ts")).cast("date"),
            date_trunc("week", col("signup_ts")).cast("date")) / 7)
            .cast("int").as("week_k"))
        .distinct()
        .groupBy(col("cohort_week"), col("week_k"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("cohort_week"), col("week_k"))
    }),

    // Trending items per time window: top-3 event types by count in
    // each 1-hour tumbling window (the "what's hot right now" streaming
    // analytics staple). Scale shape: ONE windowed partial+final count
    // agg over the corpus; the rank window then partitions by the time
    // window over the (windows × types)-sized AGGREGATE, never the raw
    // events — the same aggregate-then-rank shape as ns24's argmax.
    "st17_windowed_topk" -> ((s, d) => {
      val agg = Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("w"))
        .orderBy(col("n").desc, col("event_type").asc)
      agg.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("w.start").as("win_start"), col("rank"),
          col("event_type"), col("n"))
        .orderBy(col("win_start"), col("rank"))
    }),

    // Top-N per group over event time: last 3 events per user.
    "st07_latest_n_per_key" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("user_id"), col("rn"), col("event_id"), col("event_type"))
        .orderBy(col("user_id"), col("rn"))
    }),
  )

  private val tsSql = "CAST(ts AS TIMESTAMP)"

  val oracle: Map[String, String] = Map(
    "st21_timer_sessions" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS tms
        |  FROM events WHERE user_id < 50),
        |s AS (
        |  SELECT user_id, tms,
        |    CASE WHEN LAG(tms) OVER (PARTITION BY user_id ORDER BY tms) IS NULL
        |      OR tms - LAG(tms) OVER (PARTITION BY user_id ORDER BY tms)
        |         > 86400000 THEN 1 ELSE 0 END AS brk
        |  FROM e),
        |g AS (
        |  SELECT user_id, tms, SUM(brk) OVER (PARTITION BY user_id
        |    ORDER BY tms ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM s)
        |SELECT user_id, MIN(tms) AS start_millis, MAX(tms) AS end_millis,
        |  COUNT(*) AS n_events
        |FROM g GROUP BY user_id, sid
        |ORDER BY user_id, start_millis""".stripMargin,
    "st22_drift_monitor" ->
      """WITH base AS (
        |  SELECT CAST(event_id % 3 AS INT) AS epoch,
        |    ('{' || concat_ws(', ',
        |      '"k": ' || CAST(CAST(json_extract_string(props, '$.k')
        |        AS BIGINT) AS VARCHAR),
        |      CASE WHEN event_id % 3 >= 1 THEN
        |        '"amt": ' || CAST(FLOOR(value) + 0.5 AS VARCHAR) END,
        |      CASE WHEN event_id % 3 = 2 AND event_type = 'click' THEN
        |        '"tags": ["' || event_type || '", 7]' END,
        |      CASE WHEN event_id % 3 = 2 AND user_id % 5 = 0 THEN
        |        '"meta": {"src": "web"}' END,
        |      CASE WHEN user_id % 11 = 0 THEN '"note": null' END
        |    ) || '}')::JSON AS js
        |  FROM events WHERE props IS NOT NULL),
        |profile AS (
        |  SELECT epoch, u.k AS key,
        |    CASE COALESCE(json_type(base.js, '$.' || u.k), 'NULL')
        |      WHEN 'UBIGINT' THEN 'integer'
        |      WHEN 'BIGINT' THEN 'integer'
        |      WHEN 'VARCHAR' THEN 'string'
        |      WHEN 'BOOLEAN' THEN 'boolean'
        |      WHEN 'NULL' THEN 'null'
        |      WHEN 'ARRAY' THEN 'array'
        |      WHEN 'OBJECT' THEN 'object'
        |      ELSE 'number'
        |    END AS vtype,
        |    COUNT(*) AS n
        |  FROM base, UNNEST(json_keys(base.js)) AS u(k)
        |  GROUP BY 1, 2, 3)
        |SELECT epoch, key, vtype, n,
        |  CASE WHEN epoch = MIN(epoch) OVER (PARTITION BY key)
        |         THEN 'new_key'
        |       WHEN epoch = MIN(epoch) OVER (PARTITION BY key, vtype)
        |         THEN 'new_type'
        |       ELSE 'steady' END AS status
        |FROM profile
        |ORDER BY epoch, key, vtype""".stripMargin,
    "st01_tumbling_window" ->
      s"""SELECT date_trunc('hour', $tsSql) AS win_start, event_type,
         | COUNT(*) AS n,
         | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
         |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin,
    "st19_ewma_hourly" ->
      s"""WITH hourly AS (
         |  SELECT event_type, date_trunc('hour', $tsSql) AS h,
         |    CAST(COUNT(*) AS BIGINT) AS n
         |  FROM events GROUP BY 1, 2)
         |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_hours,
         |  CAST(SUM(n) AS BIGINT) AS total,
         |  list_reduce(list_prepend(CAST('NaN' AS DOUBLE),
         |      list_transform(list(n ORDER BY h), v -> CAST(v AS DOUBLE))),
         |    (acc, x) -> CASE WHEN isnan(acc) THEN x
         |                     ELSE 0.5 * x + 0.5 * acc END) AS ewma
         |FROM hourly GROUP BY event_type ORDER BY event_type""".stripMargin,
    "st18_windowed_distinct" ->
      s"""SELECT date_trunc('hour', $tsSql) AS win_start,
         | COUNT(DISTINCT user_id) AS exact_users,
         | COUNT(*) AS n,
         | TRUE AS hll_within_5pct
         |FROM events GROUP BY 1 ORDER BY win_start""".stripMargin,
    "st17_windowed_topk" ->
      s"""WITH agg AS (
         |  SELECT date_trunc('hour', $tsSql) AS win_start, event_type,
         |    COUNT(*) AS n
         |  FROM events GROUP BY 1, 2)
         |SELECT win_start, CAST(rank AS INT) AS rank, event_type, n FROM (
         |  SELECT win_start, event_type, n, ROW_NUMBER() OVER (
         |    PARTITION BY win_start ORDER BY n DESC, event_type ASC) AS rank
         |  FROM agg) r
         |WHERE rank <= 3 ORDER BY win_start, rank""".stripMargin,
    "st11_stream_static_join" ->
      s"""SELECT date_trunc('hour', $tsSql) AS win_start,
         | c_nationkey AS nationkey, COUNT(*) AS n
         |FROM events LEFT JOIN customer ON user_id = c_custkey
         |GROUP BY 1, 2 ORDER BY win_start, nationkey NULLS FIRST""".stripMargin,
    "st12_stream_dedup" ->
      s"""SELECT win_start, COUNT(*) AS n_distinct_keys
         |FROM (SELECT DISTINCT user_id, event_type,
         |        date_trunc('hour', $tsSql) AS win_start
         |      FROM events) k
         |GROUP BY win_start ORDER BY win_start""".stripMargin,
    "st10_session_window" ->
      s"""WITH e AS (SELECT user_id, $tsSql AS ts FROM events),
         |m AS (
         |  SELECT user_id, ts,
         |    CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
         |           OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
         |              >= INTERVAL 30 MINUTE
         |         THEN 1 ELSE 0 END AS brk
         |  FROM e),
         |s AS (
         |  SELECT user_id, ts, SUM(brk) OVER (
         |    PARTITION BY user_id ORDER BY ts
         |    ROWS UNBOUNDED PRECEDING) AS sess
         |  FROM m)
         |SELECT MIN(ts) AS win_start,
         |  MAX(ts) + INTERVAL 30 MINUTE AS win_end,
         |  user_id, CAST(COUNT(*) AS BIGINT) AS n
         |FROM s GROUP BY user_id, sess
         |ORDER BY user_id, win_start""".stripMargin,
    "st02_sliding_window" ->
      s"""WITH b AS (
         |  SELECT TIMESTAMP '1970-01-01 00:00:00'
         |    + to_seconds(epoch_us($tsSql) // 1800000000 * 1800) AS win_start
         |  FROM events
         |  UNION ALL
         |  SELECT TIMESTAMP '1970-01-01 00:00:00'
         |    + to_seconds(epoch_us($tsSql) // 1800000000 * 1800 - 1800)
         |  FROM events)
         |SELECT win_start, COUNT(*) AS n FROM b
         |GROUP BY win_start ORDER BY win_start""".stripMargin,
    "st03_sessionize" ->
      s"""WITH tagged AS (
         |  SELECT user_id, $tsSql AS t, event_id,
         |    CASE WHEN LAG($tsSql) OVER w IS NULL
         |           OR epoch_us($tsSql) - epoch_us(LAG($tsSql) OVER w) > 1800000000
         |         THEN 1 ELSE 0 END AS is_new
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY $tsSql, event_id)),
         |sess AS (
         |  SELECT user_id, t, CAST(SUM(is_new) OVER (PARTITION BY user_id
         |    ORDER BY t, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |    AS BIGINT) AS session_seq
         |  FROM tagged)
         |SELECT user_id, session_seq, COUNT(*) AS n_events,
         |  MIN(t) AS sess_start, MAX(t) AS sess_end
         |FROM sess GROUP BY user_id, session_seq
         |ORDER BY user_id, session_seq""".stripMargin,
    "st04_asof_join" ->
      s"""SELECT event_id, user_id, ts, last_signup_ts FROM (
         |  SELECT event_id, user_id, $tsSql AS ts, event_type,
         |    MAX(CASE WHEN event_type = 'signup' THEN $tsSql END) OVER (
         |      PARTITION BY user_id ORDER BY $tsSql, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_signup_ts
         |  FROM events) t
         |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,
    "st05_json_extract" ->
      """SELECT event_type, COUNT(*) AS n,
        | CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
        | MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "st06_stream_dedup" ->
      s"""SELECT user_id, event_type, event_id, $tsSql AS ts FROM (
         |  SELECT user_id, event_type, event_id, ts, ROW_NUMBER() OVER (
         |    PARTITION BY user_id, event_type
         |    ORDER BY $tsSql ASC, event_id ASC) AS rn
         |  FROM events) t
         |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,
    "st08_range_join" ->
      s"""SELECT p.event_id AS p_id, COUNT(*) AS n_clicks,
         | MAX(c.event_id) AS last_click_id
         |FROM events p JOIN events c
         |  ON c.user_id = p.user_id
         | AND c.event_type = 'click'
         | AND epoch_us(CAST(c.ts AS TIMESTAMP)) >= epoch_us(CAST(p.ts AS TIMESTAMP)) - 3600000000
         | AND epoch_us(CAST(c.ts AS TIMESTAMP)) < epoch_us(CAST(p.ts AS TIMESTAMP))
         |WHERE p.event_type = 'purchase'
         |GROUP BY p.event_id ORDER BY p_id""".stripMargin,
    "st09_stream_stream_join" ->
      s"""SELECT p.user_id AS user_id, p.event_id AS p_id, c.event_id AS c_id,
         | CAST(p.ts AS TIMESTAMP) AS p_ts, CAST(c.ts AS TIMESTAMP) AS c_ts
         |FROM events p JOIN events c
         |  ON c.user_id = p.user_id
         | AND c.event_type = 'click'
         | AND epoch_us(CAST(c.ts AS TIMESTAMP)) >= epoch_us(CAST(p.ts AS TIMESTAMP)) - 600000000
         | AND epoch_us(CAST(c.ts AS TIMESTAMP)) < epoch_us(CAST(p.ts AS TIMESTAMP))
         |WHERE p.event_type = 'purchase'
         |ORDER BY p_id, c_id""".stripMargin,
    "st13_outer_stream_join" ->
      s"""SELECT p.user_id AS user_id, p.event_id AS p_id, c.event_id AS c_id,
         | CAST(p.ts AS TIMESTAMP) AS p_ts, c.c_ts
         |FROM events p LEFT JOIN (
         |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS c_ts
         |  FROM events WHERE event_type = 'click') c
         |  ON c.user_id = p.user_id
         | AND epoch_us(c.c_ts) >= epoch_us(CAST(p.ts AS TIMESTAMP)) - 600000000
         | AND epoch_us(c.c_ts) < epoch_us(CAST(p.ts AS TIMESTAMP))
         |WHERE p.event_type = 'purchase'
         |ORDER BY p_id, c_id NULLS FIRST""".stripMargin,
    "st16_temporal_join" ->
      s"""SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS ts,
         |  (SELECT d.value FROM events d
         |   WHERE d.user_id = p.user_id AND d.event_type <> 'purchase'
         |     AND CAST(d.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
         |   ORDER BY CAST(d.ts AS TIMESTAMP) DESC, d.event_id DESC
         |   LIMIT 1) AS asof_value
         |FROM events p WHERE p.event_type = 'purchase'
         |ORDER BY p.event_id""".stripMargin,
    "st15_cohort_retention" ->
      s"""WITH e AS (
         |  SELECT user_id, event_type, $tsSql AS ts FROM events),
         |su AS (
         |  SELECT user_id,
         |    MIN(CASE WHEN event_type = 'signup' THEN ts END) AS signup_ts
         |  FROM e GROUP BY user_id),
         |k AS (
         |  SELECT DISTINCT e.user_id,
         |    date_trunc('week', su.signup_ts) AS cohort_week,
         |    CAST(date_diff('day',
         |      CAST(date_trunc('week', su.signup_ts) AS DATE),
         |      CAST(date_trunc('week', e.ts) AS DATE)) / 7 AS INT) AS week_k
         |  FROM e JOIN su USING (user_id)
         |  WHERE su.signup_ts IS NOT NULL AND e.ts >= su.signup_ts)
         |SELECT cohort_week, week_k, COUNT(*) AS n_users
         |FROM k GROUP BY cohort_week, week_k
         |ORDER BY cohort_week, week_k""".stripMargin,
    "st14_funnel" ->
      s"""WITH e AS (
         |  SELECT user_id, event_type, $tsSql AS ts FROM events),
         |u AS (
         |  SELECT user_id,
         |    MIN(CASE WHEN event_type = 'view' THEN ts END) AS v1
         |  FROM e GROUP BY user_id),
         |c AS (
         |  SELECT e.user_id, MIN(e.ts) AS c1
         |  FROM e JOIN u USING (user_id)
         |  WHERE e.event_type = 'click' AND e.ts > u.v1
         |  GROUP BY e.user_id),
         |p AS (
         |  SELECT e.user_id, MIN(e.ts) AS p1
         |  FROM e JOIN c USING (user_id)
         |  WHERE e.event_type = 'purchase' AND e.ts > c.c1
         |  GROUP BY e.user_id)
         |SELECT u.user_id AS user_id, u.v1, c.c1, p.p1,
         |  CASE WHEN p.p1 IS NOT NULL THEN 3
         |       WHEN c.c1 IS NOT NULL THEN 2
         |       WHEN u.v1 IS NOT NULL THEN 1 ELSE 0 END AS stage
         |FROM u LEFT JOIN c ON u.user_id = c.user_id
         |       LEFT JOIN p ON u.user_id = p.user_id
         |ORDER BY u.user_id""".stripMargin,
    "st07_latest_n_per_key" ->
      s"""SELECT user_id, rn, event_id, event_type FROM (
         |  SELECT user_id, event_id, event_type, ROW_NUMBER() OVER (
         |    PARTITION BY user_id ORDER BY $tsSql DESC, event_id DESC) AS rn
         |  FROM events) t
         |WHERE rn <= 3 ORDER BY user_id, rn""".stripMargin,
    "st20_watermark_profile" ->
      s"""WITH l AS (
         |  SELECT epoch_us(MAX($tsSql) OVER (PARTITION BY user_id
         |      ORDER BY (event_id * 2654435761) % 1000003, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         |    - epoch_us($tsSql) AS late_us
         |  FROM events),
         |b AS (
         |  SELECT CASE WHEN late_us = 0 THEN '0_in_order'
         |              WHEN late_us <= 60000000 THEN '1_le_1m'
         |              WHEN late_us <= 300000000 THEN '2_le_5m'
         |              WHEN late_us <= 1800000000 THEN '3_le_30m'
         |              ELSE '4_gt_30m' END AS bucket, late_us
         |  FROM l)
         |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_events,
         |  CAST(MAX(late_us) AS BIGINT) AS max_late_us,
         |  CAST(COUNT(*) AS DOUBLE) * 100.0
         |    / CAST(SUM(COUNT(*)) OVER () AS DOUBLE) AS pct
         |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,
  )
}
