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

  private def kmv(xs: Seq[Long], k: Int, parts: Int): Seq[Long] =
    xs.toDF("x").repartition(parts)
      .agg(graft.functions.KmvSketchAgg.kMinValues(col("x"), k).as("s"))
      .head().getSeq[Long](0)

  test("KMV keeps exactly the k smallest distinct values, any partitioning") {
    val xs = Seq(9L, 3L, 7L, 3L, 1L, 8L, 1L, 5L, 2L, 9L)
    val want = Seq(1L, 2L, 3L, 5L)
    assert(kmv(xs, 4, 1) == want)
    assert(kmv(xs, 4, 7) == want) // union-then-trim merge is associative
    assert(kmv(Seq(4L, 4L, 6L), 4, 2) == Seq(4L, 6L)) // under-full stays exact
    assert(kmv(Seq.empty[Long], 4, 1) == Seq.empty)
  }

  test("KMV distinct estimate (k-1)*M/h_k lands within 3 sigma") {
    // uniform hashes stand in for the portable hash's output range
    val M = 2147483647L
    val k = 256
    val rnd = new scala.util.Random(42)
    val n = 50000
    val hs = Seq.fill(n)(math.abs(rnd.nextLong()) % M)
    val mins = kmv(hs, k, 8)
    val est = (k - 1).toDouble * M / mins.last.toDouble
    val sigma = n / math.sqrt(k - 2) // Beyer et al. 2007, Thm 1
    assert(math.abs(est - n) <= 3 * sigma, s"est=$est n=$n sigma=$sigma")
  }
}
