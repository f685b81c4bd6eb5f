package graft

import graft.operators.Packing
import org.apache.spark.sql.functions._

/** Pins [[Packing.packSequences]]'s semantics: the exclusive prefix
  * sum in id order, bin assignment, and — the property the two-phase
  * decomposition must preserve — INVARIANCE of the result under the
  * bucket count (buckets is a plan knob, never semantics).
  */
class PackingSpec extends SparkSuite {
  import spark.implicits._

  test("start offsets are the exclusive prefix sum in id order") {
    val df = Seq((0L, 10), (1L, 300), (2L, 5), (3L, 200), (4L, 1))
      .toDF("doc_id", "n_tok")
    val got = Packing.packSequences(df, "doc_id", "n_tok", budget = 256)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (0L, 10L, 0L, 0L),     // [0, 10)    → bin 0
      (1L, 300L, 10L, 0L),   // [10, 310)  → starts in bin 0, spans into 1
      (2L, 5L, 310L, 1L),    // [310, 315) → bin 1
      (3L, 200L, 315L, 1L),  // [315, 515) → starts in bin 1
      (4L, 1L, 515L, 2L)))   // [515, 516) → bin 2
  }

  test("result is invariant under the bucket count, including sparse ids") {
    // Sparse ids skew range sizes — the offsets must not care.
    val df = Seq((3L, 7), (10L, 50), (11L, 260), (40L, 9), (900L, 100))
      .toDF("doc_id", "n_tok")
    val expected = Packing.packSequences(df, "doc_id", "n_tok",
      budget = 64, buckets = 1).orderBy("doc_id").collect().map(_.toSeq).toSeq
    Seq(2, 3, 256).foreach { b =>
      val got = Packing.packSequences(df, "doc_id", "n_tok",
        budget = 64, buckets = b).orderBy("doc_id").collect().map(_.toSeq).toSeq
      assert(got == expected, s"buckets=$b diverged: $got vs $expected")
    }
  }

  test("named errors on non-positive budget or buckets") {
    val df = Seq((0L, 1)).toDF("doc_id", "n_tok")
    val e1 = intercept[IllegalArgumentException](
      Packing.packSequences(df, "doc_id", "n_tok", budget = 0))
    assert(e1.getMessage.contains("budget"))
    val e2 = intercept[IllegalArgumentException](
      Packing.packSequences(df, "doc_id", "n_tok", budget = 1, buckets = 0))
    assert(e2.getMessage.contains("buckets"))
  }
}
