package graft

import graft.functions.HllSketchAgg
import org.apache.spark.sql.functions._

/** The dense HLL sketch: accuracy bounds, partition-independence of the
  * register-max merge, multiset insensitivity, and the small-range linear
  * counting regime. */
class HllSketchSpec extends SparkSuite {
  import spark.implicits._

  private def estimate(xs: Seq[Long], parts: Int): Long =
    xs.toDF("x").repartition(parts)
      .agg(HllSketchAgg.approxDistinct(col("x")).as("e"))
      .head().getLong(0)

  test("estimate lands within 3 sigma across cardinalities") {
    val sigma = 1.04 / math.sqrt(1 << 12)
    for (n <- Seq(100, 5000, 100000)) {
      val est = estimate((1L to n.toLong), 8)
      assert(math.abs(est - n) <= math.max(3 * sigma * n, 2.0),
        s"n=$n est=$est (tolerance ${3 * sigma * n})")
    }
  }

  test("small sets are near-exact via linear counting") {
    assert(estimate(Seq(1L, 2L, 3L, 4L, 5L), 2) == 5L)
    assert(estimate(Seq.empty[Long], 1) == 0L)
  }

  test("estimate is independent of partitioning (register-max merge)") {
    val xs = (1L to 20000L)
    assert(estimate(xs, 1) == estimate(xs, 16))
  }

  test("duplicates never move the estimate (it is a function of the SET)") {
    val xs = (1L to 3000L)
    assert(estimate(xs, 4) == estimate(xs ++ xs ++ xs.take(100), 4))
  }

  test("grouped aggregation sketches per group") {
    val df = (1 to 10000).map(i => (i % 2, i.toLong)).toDF("g", "x")
    val rows = df.groupBy("g")
      .agg(HllSketchAgg.approxDistinct(col("x")).as("e"))
      .orderBy("g").as[(Int, Long)].collect()
    assert(rows.length == 2)
    rows.foreach { case (_, e) => assert(math.abs(e - 5000) <= 250) }
  }
}
