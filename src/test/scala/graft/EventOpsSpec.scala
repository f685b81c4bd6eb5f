package graft

import graft.operators.EventOps
import org.apache.spark.sql.functions._

/** Edge-case coverage for the event-time operators the oracle gate
  * exercises only on well-behaved data: outer-join null padding (exactly
  * once, even when the left window spans two buckets) and as-of tie
  * semantics at equal timestamps.
  */
class EventOpsSpec extends SparkSuite {
  import spark.implicits._

  private def ts(minute: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("rangeJoinLeftOuter pads unmatched left rows exactly once") {
    val purchases = Seq(
      (1L, 100L, ts(30)), // two clicks in window
      (1L, 101L, ts(50)), // no click in its 10-minute window
      (2L, 102L, ts(10))  // user with no clicks at all
    ).toDF("user_id", "p_id", "p_ts")
    val clicks = Seq(
      (1L, 200L, ts(21)), // in [20:00, 30:00) of p 100
      (1L, 201L, ts(29)),
      (1L, 202L, ts(30)), // == p_ts → excluded (right-open)
      (1L, 203L, ts(39))  // < 50-10 → excluded from p 101
    ).toDF("user_id", "c_id", "c_ts")

    val out = EventOps.rangeJoinLeftOuter(purchases, clicks, "user_id",
      "p_id", "p_ts", "c_ts", windowMicros = 600000000L)
      .select($"p_id", $"c_id")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toList.sorted

    // naive left-join twin (nested loop is fine at fixture size)
    val naive = purchases.as("p").join(clicks.as("c"),
      $"p.user_id" === $"c.user_id" &&
        $"c.c_ts" >= $"p.p_ts" - expr("INTERVAL 10 MINUTES") &&
        $"c.c_ts" < $"p.p_ts",
      "left_outer")
      .select($"p_id", $"c_id")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toList.sorted

    assert(out == naive, s"bucketized outer != naive left join: $out vs $naive")
    assert(out.count(_._1 == 101L) == 1 && out.count(_._1 == 102L) == 1,
      s"unmatched purchases must appear exactly once: $out")
    assert(out == List((100L, 200L), (100L, 201L), (101L, -1L), (102L, -1L)))
  }

  test("asofLatestValue: same-instant dimension applies; highest tieBreak wins") {
    val ev = Seq(
      // (user, event_id, ts, type, value)
      (1L, 1L, ts(0), "dim", 10.0),
      (1L, 2L, ts(5), "fact", 0.0),  // sees dim@0 → 10.0
      (1L, 3L, ts(7), "dim", 20.0),
      (1L, 4L, ts(7), "dim", 30.0),  // same instant, higher id wins
      (1L, 5L, ts(7), "fact", 0.0),  // same-instant dims apply → 30.0
      (2L, 6L, ts(1), "fact", 0.0)   // no dim for user 2 → null
    ).toDF("user_id", "event_id", "ts", "event_type", "value")

    val out = EventOps.asofLatestValue(ev, $"user_id", $"ts", $"event_id",
      $"event_type" === "dim", $"value", "asof_value")
      .filter($"event_type" === "fact")
      .select($"event_id", $"asof_value")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap

    assert(out == Map(2L -> Some(10.0), 5L -> Some(30.0), 6L -> None), s"$out")
  }
}
