package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class Keyed(id: Long, ts: java.sql.Timestamp, v: String)

/** Watermarked event-time windowed aggregation (SURVEY.md §2.2: the
  * reference has no watermarks/windows — this is the ⊕ streaming
  * surface): append-mode emission only after the watermark passes a
  * window, and late data beyond the watermark is dropped. */
class StreamingWindowSpec extends SparkSuite {
  import spark.implicits._

  case class Ev(ts: java.sql.Timestamp, user: Long, v: Double)
  private def ev(minute: Int, user: Long, v: Double) =
    Ev(java.sql.Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00"), user, v)

  test("watermarked tumbling window emits closed windows and drops late data") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val agg = in.toDF()
      .withWatermark("ts", "5 minutes")
      .groupBy(window($"ts", "10 minutes").as("w"))
      .agg(count(lit(1)).as("n"), sum($"v".cast("decimal(18,2)")).cast("double").as("total"))
      .select($"w.start".as("start"), $"n", $"total")
    val q = agg.writeStream.format("memory").queryName("win_out")
      .option("checkpointLocation", checkpointDir("wm"))
      .outputMode("append").start()

    // window [10:00,10:10): two events; then advance event time past
    // 10:10 + 5min watermark so the first window closes
    in.addData(ev(1, 1, 1.0), ev(9, 2, 2.0))
    q.processAllAvailable()
    in.addData(ev(16, 1, 4.0)) // watermark -> 10:11, closes [10:00,10:10)
    q.processAllAvailable()
    val afterClose = spark.table("win_out").collect()
    assert(afterClose.length == 1)
    assert(afterClose.head.getLong(1) == 2 && afterClose.head.getDouble(2) == 3.0)

    // a late event for the closed window (event time 10:05 < watermark)
    // must be dropped, not re-open the window
    in.addData(ev(5, 3, 100.0))
    q.processAllAvailable()
    // advance far enough to close [10:10,10:20) as well
    in.addData(ev(40, 1, 8.0))
    q.processAllAvailable()
    q.stop()

    val all = spark.table("win_out").collect().map(r =>
      (r.getTimestamp(0).toString, r.getLong(1), r.getDouble(2))).toSet
    assert(all == Set(
      ("2024-01-01 10:00:00.0", 2L, 3.0),   // late 100.0 NOT included
      ("2024-01-01 10:10:00.0", 1L, 4.0)))
  }

  test("watermarked session_window merges within the gap and closes on watermark") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val agg = in.toDF()
      .withWatermark("ts", "5 minutes")
      .groupBy(session_window($"ts", "10 minutes").as("w"), $"user")
      .agg(count(lit(1)).as("n"))
      .select($"w.start".as("start"), $"w.end".as("end"), $"user", $"n")
    val q = agg.writeStream.format("memory").queryName("sess_out")
      .option("checkpointLocation", checkpointDir("sess-wm"))
      .outputMode("append").start()

    // user 1: events at 10:01 and 10:08 (gap 7 < 10 min → one session
    // spanning [10:01, 10:18)); user 2: a singleton at 10:02
    in.addData(ev(1, 1, 1.0), ev(8, 1, 1.0), ev(2, 2, 1.0))
    q.processAllAvailable()
    // advance the watermark past every session end so both close:
    // sessions end at 10:18/10:12; watermark must exceed them
    in.addData(Ev(java.sql.Timestamp.valueOf("2024-01-01 10:30:00"), 9L, 0.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("sess_out").collect().map(r =>
      (r.getTimestamp(0).toString, r.getTimestamp(1).toString,
        r.getLong(2), r.getLong(3))).toSet
    assert(rows == Set(
      ("2024-01-01 10:01:00.0", "2024-01-01 10:18:00.0", 1L, 2L),
      ("2024-01-01 10:02:00.0", "2024-01-01 10:12:00.0", 2L, 1L)),
      s"got $rows")
  }

  test("stream-static join enriches the stream against a broadcast dimension") {
    implicit val ctx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("cust", "tier")
    val in = MemoryStream[Ev]
    val agg = in.toDF()
      .withWatermark("ts", "5 minutes")
      .join(broadcast(dim), $"user" === $"cust", "left_outer")
      .groupBy(window($"ts", "10 minutes").as("w"), $"tier")
      .agg(count(lit(1)).as("n"))
      .select($"w.start".as("start"), $"tier", $"n")
    val q = agg.writeStream.format("memory").queryName("ss_out")
      .option("checkpointLocation", checkpointDir("ss-join"))
      .outputMode("append").start()

    in.addData(ev(1, 1, 0), ev(2, 1, 0), ev(3, 2, 0), ev(4, 9, 0)) // 9 unmatched
    in.addData(ev(21, 1, 0)) // watermark closes the first window
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("ss_out").collect()
      .map(r => (if (r.isNullAt(1)) "-" else r.getString(1)) -> r.getLong(2)).toMap
    assert(rows == Map("gold" -> 2L, "silver" -> 1L, "-" -> 1L),
      s"stream-static enrichment wrong: $rows")
  }

  test("the custom bottom_k aggregate runs inside a watermarked streaming window") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    // k smallest user ids per closed 10-minute window, via the bounded
    // heap aggregate — custom TypedImperativeAggregates must survive the
    // streaming partial/merge/state round-trip, not just batch
    val agg = in.toDF()
      .withWatermark("ts", "5 minutes")
      .groupBy(window($"ts", "10 minutes").as("w"))
      .agg(graft.functions.BottomK.bottomK($"user", $"user", 3).as("picks"))
      .select($"w.start".as("start"), transform($"picks", p => p("id")).as("ids"))
    val q = agg.writeStream.format("memory").queryName("bk_out")
      .option("checkpointLocation", checkpointDir("bk-stream"))
      .outputMode("append").start()

    in.addData(ev(1, 9, 0), ev(2, 4, 0), ev(3, 7, 0), ev(4, 2, 0), ev(5, 11, 0))
    in.addData(ev(6, 5, 0)) // same window, later batch: state must merge
    in.addData(ev(21, 1, 0)) // watermark past 10:10 → first window closes
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("bk_out").collect()
      .map(r => r.getTimestamp(0).toString -> r.getSeq[Long](1).toSeq).toMap
    assert(rows("2024-01-01 10:00:00.0") == Seq(2L, 4L, 5L),
      s"bottom_k state did not merge across micro-batches: $rows")
  }

  test("the CountMin sketch aggregate runs inside a watermarked streaming window") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Keyed]
    // per-window token frequencies via the fixed-memory sketch — the
    // sketch buffer must survive the streaming partial/merge/state
    // round-trip with cell-wise merges staying exact
    val agg = in.toDS()
      .withWatermark("ts", "5 minutes")
      .groupBy(window($"ts", "10 minutes").as("w"))
      .agg(graft.functions.CountMinFreq
        .freq($"v", Seq("x", "y"), depth = 5, width = 1024).as("f"))
      .select($"w.start".as("start"), transform($"f", p => p("est")).as("ests"))
    val q = agg.writeStream.format("memory").queryName("cms_out")
      .option("checkpointLocation", checkpointDir("cms-stream"))
      .outputMode("append").start()

    def k(minute: Int, v: String) =
      Keyed(minute.toLong, java.sql.Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00"), v)
    in.addData(k(1, "x"), k(2, "x"), k(3, "y"))
    in.addData(k(4, "x")) // same window, later batch: sketches must merge
    in.addData(k(21, "x")) // watermark past 10:10 → first window closes
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("cms_out").collect()
      .map(r => r.getTimestamp(0).toString -> r.getSeq[Long](1).toSeq).toMap
    assert(rows("2024-01-01 10:00:00.0") == Seq(3L, 1L),
      s"CountMin state did not merge across micro-batches: $rows")
  }

  test("streaming exact dedup drops at-least-once replays within the watermark") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Keyed]
    val q = in.toDS()
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("id")
      .writeStream.format("memory").queryName("dedup_stream_out")
      .option("checkpointLocation", checkpointDir("sdedup"))
      .outputMode("append").start()

    def k(id: Long, minute: Int, v: String) =
      Keyed(id, java.sql.Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00"), v)
    in.addData(k(1, 0, "first"), k(1, 1, "replay-same-batch"), k(2, 1, "b"))
    q.processAllAvailable()
    in.addData(k(1, 2, "replay-next-batch"), k(3, 3, "c"))
    q.processAllAvailable()
    q.stop()

    val ids = spark.table("dedup_stream_out").select("id", "v")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(ids == Set((1L, "first"), (2L, "b"), (3L, "c")))
  }

  test("st12 twin: watermarked window-key dedup equals the batch DISTINCT") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = in.toDF()
      .withWatermark("ts", "5 minutes")
      .select($"user", window($"ts", "10 minutes").as("w"))
      .dropDuplicatesWithinWatermark("user", "w")
      .writeStream.format("memory").queryName("st12_out")
      .option("checkpointLocation", checkpointDir("st12"))
      .outputMode("append").start()

    // duplicates inside a window collapse; same user in a new window is
    // a fresh key
    val evs = Seq(ev(1, 1, 1.0), ev(2, 1, 2.0), ev(9, 2, 3.0),
      ev(11, 1, 4.0), ev(12, 1, 5.0), ev(13, 2, 6.0))
    in.addData(evs: _*)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("st12_out")
      .select($"user", $"w.start".cast("string").as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val batch = evs.map(e => (e.user, e.ts)).toDF("user", "ts")
      .select($"user", window($"ts", "10 minutes").getField("start")
        .cast("string").as("s"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(streamed == batch && batch.size == 4)
  }

  test("stream-stream inner join with watermarks and a time-range condition") {
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val imps = MemoryStream[Ev]
    // click joins the impression for the same user at most 10 minutes
    // BEFORE the click — the canonical ad-attribution join; both sides
    // watermarked so join state expires
    val j = clicks.toDF()
      .select($"ts".as("click_ts"), $"user".as("cu"), $"v".as("click_v"))
      .withWatermark("click_ts", "20 minutes")
      .join(
        imps.toDF()
          .select($"ts".as("imp_ts"), $"user".as("iu"), $"v".as("imp_v"))
          .withWatermark("imp_ts", "20 minutes"),
        expr("cu = iu AND click_ts >= imp_ts AND " +
          "click_ts <= imp_ts + INTERVAL 10 MINUTES"))
    val q = j.select($"cu", $"imp_v", $"click_v")
      .writeStream.format("memory").queryName("ssjoin_out")
      .option("checkpointLocation", checkpointDir("ssjoin"))
      .outputMode("append").start()

    imps.addData(ev(0, 1, 1.0), ev(30, 2, 2.0))
    clicks.addData(ev(5, 1, 10.0)) // within 10 min of user 1's impression
    q.processAllAvailable()
    clicks.addData(ev(45, 2, 20.0)) // 15 min after user 2's impression → no match
    clicks.addData(ev(31, 2, 30.0)) // 1 min after → match
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("ssjoin_out")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(rows == Set((1L, 1.0, 10.0), (2L, 2.0, 30.0)))
  }

  test("stream-stream LEFT OUTER join null-emits unmatched rows on watermark expiry") {
    implicit val ctx = spark.sqlContext
    val imps = MemoryStream[Ev]
    val clicks = MemoryStream[Ev]
    // impressions left-joined to the clicks within 10 minutes AFTER them;
    // an impression that never attracts a click must still come out —
    // null-padded — once the watermark passes its join window (st13's
    // streaming twin)
    val j = imps.toDF()
      .select($"ts".as("imp_ts"), $"user".as("iu"), $"v".as("imp_v"))
      .withWatermark("imp_ts", "20 minutes")
      .join(
        clicks.toDF()
          .select($"ts".as("click_ts"), $"user".as("cu"), $"v".as("click_v"))
          .withWatermark("click_ts", "20 minutes"),
        expr("iu = cu AND click_ts >= imp_ts AND " +
          "click_ts <= imp_ts + INTERVAL 10 MINUTES"),
        "leftOuter")
    val q = j.select($"iu", $"imp_v", $"click_v")
      .writeStream.format("memory").queryName("ssjoin_outer_out")
      .option("checkpointLocation", checkpointDir("ssjoin-outer"))
      .outputMode("append").start()

    imps.addData(ev(0, 1, 1.0), ev(0, 2, 2.0))
    clicks.addData(ev(5, 1, 10.0)) // user 1 matches; user 2 never clicks
    q.processAllAvailable()
    // advance BOTH watermarks (the join watermark is the min) far past
    // user 2's window, then run further batches so the expired state
    // null-emits
    imps.addData(ev(120, 8, 8.0))
    clicks.addData(ev(120, 9, 9.0))
    q.processAllAvailable()
    imps.addData(ev(240, 8, 8.5))
    clicks.addData(ev(240, 9, 9.5))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("ssjoin_outer_out")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(rows.contains((1L, 1.0, Some(10.0))), s"matched pair missing: $rows")
    assert(rows.contains((2L, 2.0, None)), s"null-padded expiry row missing: $rows")
  }
}
