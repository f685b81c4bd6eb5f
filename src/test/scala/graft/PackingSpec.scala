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

  test("chunks tile every document exactly and fill every bin but the last") {
    val df = Seq((0L, 10), (1L, 300), (2L, 5), (3L, 200), (4L, 1))
      .toDF("doc_id", "n_tok")
    val budget = 256L
    val rows = Packing.packChunks(df, "doc_id", "n_tok", budget)
      .orderBy("doc_id", "bin").collect()
      .map(r => (r.getLong(1), r.getLong(0), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // Per doc: segments start at 0, end at the doc's weight, contiguous.
    val weights = Map(0L -> 10L, 1L -> 300L, 2L -> 5L, 3L -> 200L, 4L -> 1L)
    rows.groupBy(_._1).foreach { case (id, segs) =>
      val s = segs.sortBy(_._2)
      assert(s.head._3 == 0L, s"doc $id first chunk starts at ${s.head._3}")
      assert(s.last._4 == weights(id), s"doc $id last chunk ends early")
      s.sliding(2).foreach {
        case Array(a, b) => assert(a._4 == b._3, s"doc $id chunks not contiguous")
        case _ =>
      }
      assert(s.map(_._5).sum == weights(id), s"doc $id chunk sizes don't tile")
    }
    // Per bin: exactly `budget` tokens except the final bin.
    val perBin = rows.groupBy(_._2).view.mapValues(_.map(_._5).sum).toMap
    val lastBin = perBin.keys.max
    perBin.foreach { case (bin, tot) =>
      if (bin < lastBin) assert(tot == budget, s"bin $bin holds $tot tokens")
      else assert(tot == weights.values.sum - lastBin * budget)
    }
  }

  test("packing by trained-tokenizer costs fills bins at budget BPE tokens") {
    // The ns66 composition: per-doc costs come from a token→segments
    // lookup table (the trained tokenizer's apply side), NOT whitespace
    // counts — offsets must be prefix sums of the BPE costs, and every
    // bin except the last must hold exactly `budget` BPE tokens.
    val costs = Map("aa" -> 1L, "bbb" -> 2L, "cccc" -> 3L)
    val docTokens = Seq(
      0L -> Seq("aa", "bbb", "cccc"),        // 6 BPE (3 whitespace)
      1L -> Seq("cccc", "cccc", "cccc"),     // 9 BPE
      2L -> Seq("aa"),                       // 1 BPE
      3L -> Seq("bbb", "bbb", "aa", "aa"))   // 6 BPE
    val wt = costs.toSeq.toDF("tok", "n_seg")
    val docs = docTokens.flatMap { case (id, ts) => ts.map(id -> _) }
      .toDF("doc_id", "tok")
    val docCosts = docs.join(broadcast(wt), Seq("tok"))
      .groupBy(col("doc_id")).agg(sum(col("n_seg")).as("n_bpe"))
    val budget = 8L
    val got = Packing.packSequences(docCosts, "doc_id", "n_bpe", budget)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (0L, 6L, 0L, 0L),   // [0, 6)   → bin 0
      (1L, 9L, 6L, 0L),   // [6, 15)  → starts in bin 0
      (2L, 1L, 15L, 1L),  // [15, 16) → bin 1
      (3L, 6L, 16L, 2L)), // [16, 22) → bin 2
      s"BPE-cost offsets wrong: ${got.toSeq}")
    // Bin fullness via the chunk view: every bin but the last is FULL.
    val byBin = Packing.packChunks(docCosts, "doc_id", "n_bpe", budget)
      .groupBy(col("bin")).agg(sum(col("n_tok_chunk")).as("n"))
      .orderBy(col("bin")).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(byBin.init.forall(_._2 == budget),
      s"a non-final bin is not full at $budget: ${byBin.toSeq}")
    assert(byBin.map(_._2).sum == 22L, "chunks lost BPE tokens")
  }

  test("null and negative weights fail loudly, never poison offsets") {
    def chainMsg(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    val withNull = Seq((0L, Option(5)), (1L, Option.empty[Int]))
      .toDF("doc_id", "n_tok")
    val e1 = intercept[Throwable](
      Packing.packSequences(withNull, "doc_id", "n_tok", budget = 10).collect())
    assert(chainMsg(e1).contains("non-negative token count"), chainMsg(e1))
    val neg = Seq((0L, 5), (1L, -2)).toDF("doc_id", "n_tok")
    val e2 = intercept[Throwable](
      Packing.packSequences(neg, "doc_id", "n_tok", budget = 10).collect())
    assert(chainMsg(e2).contains("non-negative token count"), chainMsg(e2))
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
