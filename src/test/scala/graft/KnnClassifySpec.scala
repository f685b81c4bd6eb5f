package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Pins [[Similarity.knnClassify]]'s vote semantics — the cross-engine
  * bit-parity of the cosine ranking is gated by vs37's oracle; this
  * spec guards the decision rule itself: self-exclusion, the modal
  * label, and BOTH deterministic tie-breaks (rank ties → lower
  * neighbor_id, vote ties → smaller label).
  */
class KnnClassifySpec extends SparkSuite {
  import spark.implicits._

  // 2-d corpus around the query (1, 0): cosine to (1, 0.1·i) strictly
  // decreases in i, so the neighbor order is n1, n2, n3, n4, n5.
  private def corpus() = Seq(
    (0L, 9, Seq(1f, 0f)),    // the query itself — must be excluded
    (1L, 2, Seq(1f, 0.1f)),
    (2L, 1, Seq(1f, 0.2f)),
    (3L, 1, Seq(1f, 0.3f)),
    (4L, 2, Seq(1f, 0.4f)),
    (5L, 0, Seq(1f, 5f))     // far: outside every k used here
  ).toDF("vec_id", "label", "embedding")

  test("majority vote over the k nearest, self excluded") {
    val c = corpus()
    // k=3 → neighbors n1..n3 with labels 2,1,1 → majority 1.
    val got = Similarity.knnClassify(c.filter(col("vec_id") === 0), c, k = 3)
      .collect()
    assert(got.length == 1)
    assert(got.head.getAs[Int]("true_label") == 9)
    assert(got.head.getAs[Int]("pred_label") == 1)
    assert(got.head.getAs[Long]("votes") == 2L)
  }

  test("vote ties break to the smaller label") {
    val c = corpus()
    // k=4 → labels 2,1,1,2 → 2-2 tie → pred must be the SMALLER label.
    val got = Similarity.knnClassify(c.filter(col("vec_id") === 0), c, k = 4)
      .collect()
    assert(got.length == 1)
    assert(got.head.getAs[Int]("pred_label") == 1)
    assert(got.head.getAs[Long]("votes") == 2L)
  }

  test("rank ties break to the lower neighbor id") {
    import spark.implicits._
    // Two neighbors with IDENTICAL embeddings (equal cosine) but
    // different labels; k=1 must pick the lower vec_id's label.
    val c = Seq(
      (0L, 0, Seq(1f, 0f)),
      (7L, 3, Seq(2f, 2f)),
      (8L, 1, Seq(2f, 2f))
    ).toDF("vec_id", "label", "embedding")
    val got = Similarity.knnClassify(c.filter(col("vec_id") === 0), c, k = 1)
      .collect()
    assert(got.length == 1)
    assert(got.head.getAs[Int]("pred_label") == 3)
  }
}
