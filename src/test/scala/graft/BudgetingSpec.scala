package graft

import graft.operators.Budgeting
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the UniMax waterfill: the per-row monotone-flag
  * formulation must equal a SEQUENTIAL greedy reference on every input,
  * and the allocation invariants must hold. Raw ScalaCheck generators
  * under fixed seeds (the scalatest bridge isn't in the offline cache).
  */
class BudgetingSpec extends SparkSuite {
  import spark.implicits._

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  /** The obviously-correct form: walk caps ascending; fund while the
    * cap fits under the fair share of what remains; once one does not,
    * everyone left shares the remainder at one integer level. */
  private def greedy(caps: Seq[(String, Long)], budget: Long)
      : Map[String, (Boolean, Long)] = {
    val sorted = caps.sortBy { case (k, c) => (c, k) }
    val n = sorted.length
    var remaining = budget
    var cut = -1
    val out = scala.collection.mutable.Map.empty[String, (Boolean, Long)]
    sorted.zipWithIndex.foreach { case ((k, c), i) =>
      if (cut < 0 && c <= remaining / (n - i)) {
        out(k) = (true, c); remaining -= c
      } else if (cut < 0) cut = i
    }
    if (cut >= 0) {
      val level = remaining / (n - cut)
      sorted.drop(cut).foreach { case (k, c) => out(k) = (false, level) }
    }
    out.toMap
  }

  private val capsGen = for {
    n <- Gen.choose(1, 30)
    caps <- Gen.listOfN(n, Gen.choose(1L, 1000L))
    frac <- Gen.choose(0, 250)
  } yield (caps.zipWithIndex.map { case (c, i) => (s"g$i", c) },
    caps.sum * frac / 100)

  test("distributed waterfill equals the sequential greedy reference") {
    (1L to 12L).foreach { seed =>
      val (caps, budget) = sample(capsGen, seed)
      val want = greedy(caps, budget)
      val got = Budgeting.waterfill(caps.toDF("k", "cap"), "k", "cap", budget)
        .select(col("k"), col("funded"), col("quota"))
        .as[(String, Boolean, Long)].collect()
        .map { case (k, f, q) => k -> ((f, q)) }.toMap
      assert(got == want, s"seed=$seed budget=$budget caps=$caps")

      // Invariants: never over budget; funded get exactly their cap;
      // unfunded share one level strictly below each of their caps.
      val capOf = caps.toMap
      assert(got.values.map(_._2).sum <= budget || got.values.forall(_._1),
        s"seed=$seed allocated past the budget")
      got.foreach { case (k, (funded, q)) =>
        if (funded) assert(q == capOf(k))
        else assert(q < capOf(k), s"seed=$seed level must undercut unfunded caps")
      }
      val levels = got.collect { case (_, (false, q)) => q }.toSet
      assert(levels.size <= 1, s"seed=$seed unfunded levels must be uniform")
    }
  }

  test("degenerate budgets: zero funds nobody at level zero; a huge budget funds all") {
    val caps = Seq(("a", 5L), ("b", 7L), ("c", 11L))
    val zero = Budgeting.waterfill(caps.toDF("k", "cap"), "k", "cap", 0L)
      .select(col("funded"), col("quota")).as[(Boolean, Long)].collect()
    assert(zero.forall { case (f, q) => !f && q == 0L })
    val all = Budgeting.waterfill(caps.toDF("k", "cap"), "k", "cap", 1000L)
      .select(col("funded"), col("quota")).as[(Boolean, Long)].collect()
    assert(all.forall(_._1) && all.map(_._2).sorted.toSeq == Seq(5L, 7L, 11L))
  }

  test("non-positive caps raise the named error") {
    val bad = Seq(("a", 5L), ("b", 0L)).toDF("k", "cap")
    val e = intercept[Exception](
      Budgeting.waterfill(bad, "k", "cap", 10L).collect())
    assert(e.getMessage.contains("must be positive"))
    val neg = intercept[IllegalArgumentException](
      Budgeting.waterfill(Seq(("a", 1L)).toDF("k", "cap"), "k", "cap", -1L))
    assert(neg.getMessage.contains("budget must be >= 0"))
  }
}
