package graft

import scala.collection.mutable

/** Pins the distributed BPE trainer (queries.TextQueries.bpeTrain,
  * ns52/ns53) against an independent single-machine reference
  * implementation of Sennrich et al. 2016 — same inputs, bit-identical
  * merges and post-merge tables. The greedy left-to-right fold and the
  * (count desc, pair asc) argmax are the subtle parts; the oracle proves
  * them against DuckDB, this proves them against plain Scala.
  */
class BpeSpec extends SparkSuite {
  import spark.implicits._

  /** Reference trainer: word-frequency rows as (symbols, freq); per
    * round count adjacent pairs weighted by freq, pick (maxCount, then
    * lexicographic pair), merge greedily left-to-right in every row. */
  private def refBpe(words: Seq[(List[String], Long)], rounds: Int)
      : (Seq[(List[String], Long)], Seq[(Int, String, String, Long)]) = {
    var tbl = words
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val counts = mutable.Map.empty[(String, String), Long]
      tbl.foreach { case (cs, f) =>
        cs.zip(cs.drop(1)).foreach(p => counts(p) = counts.getOrElse(p, 0L) + f)
      }
      if (counts.isEmpty) exhausted = true // collapsed: stop early
      else {
        val ((a, b), cnt) = counts.toSeq
          .minBy { case ((x, y), c) => (-c, x, y) }
        merges += ((r, a, b, cnt))
        tbl = tbl.map { case (cs, f) =>
          val out = mutable.ListBuffer.empty[String]
          var i = 0
          while (i < cs.length) {
            if (i + 1 < cs.length && cs(i) == a && cs(i + 1) == b) {
              out += (a + b); i += 2
            } else { out += cs(i); i += 1 }
          }
          (out.toList, f)
        }
      }
      r += 1
    }
    (tbl, merges.result())
  }

  test("distributed BPE equals the local reference on the fixture corpus") {
    val rounds = 5
    val texts = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"text").as[String].collect()
    val wordFreq = texts.iterator.flatMap(_.split(" ")).filter(_.nonEmpty)
      .foldLeft(Map.empty[String, Long])((m, w) =>
        m.updated(w, m.getOrElse(w, 0L) + 1))
    val (refWords, refMerges) = refBpe(
      wordFreq.toSeq.map { case (w, f) => (w.map(_.toString).toList, f) },
      rounds)

    val (gotWordsDf, gotMerges) =
      graft.queries.TextQueries.bpeTrain(spark, sf0001, rounds)
    assert(gotMerges.map(m => (m._1, m._2, m._3, m._5)) == refMerges,
      s"merges diverged: $gotMerges vs $refMerges")
    // The post-merge tables must agree as multisets of (symbols, freq) —
    // this is what ns53's vocabulary is computed from.
    def canon(ws: Seq[(List[String], Long)]): Seq[(String, Long)] =
      ws.map { case (cs, f) => (cs.mkString("\u0000"), f) }.sorted
    val gotWords = gotWordsDf.as[(Seq[String], Long)].collect()
      .toSeq.map { case (cs, f) => (cs.toList, f) }
    assert(canon(gotWords) == canon(refWords),
      "post-merge word tables diverged")
    // And the greedy fold really is greedy: a repeated-pair word merges
    // non-overlapping left-to-right.
    val (t, _) = refBpe(Seq((List("a", "a", "a"), 1L)), 1)
    assert(t.head._1 == List("aa", "a"))
  }

  test("rounds past the first recount only the touched word slice") {
    // The incremental pair table's point: round r's delta aggregation
    // reads only the words containing round r−1's winning pair, which
    // is a small fraction of the vocabulary — never the full word table
    // the original formulation re-aggregated every round. Merges stay
    // bit-identical (the previous test); this pins the input size.
    val stats = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    graft.queries.TextQueries.bpeTrain(spark, sf0001, rounds = 4,
      onRound = Some((r, touched, total) => stats += ((r, touched, total))))
    assert(stats.nonEmpty, "instrumentation callback never fired")
    stats.foreach { case (r, touched, total) =>
      assert(touched > 0, s"round $r merged a pair no word contains")
      assert(touched * 2 <= total,
        s"round $r recounts $touched of $total words — the delta input " +
          "is not meaningfully smaller than the word table")
    }
  }

  test("training past the corpus' collapse point stops early, no crash") {
    // Every word is a single symbol from round 1 — zero adjacent pairs.
    // The trainer must record zero merges and return the table as-is
    // (the r12 argmax read .head of an empty collect and threw).
    val dir = java.nio.file.Files.createTempDirectory("bpe-degenerate")
    try {
      Seq((1L, "a b c", "en", "src0", 5L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val (words, merges) =
        graft.queries.TextQueries.bpeTrain(spark, dir.toString, 4)
      assert(merges.isEmpty, s"no pair exists to merge, got $merges")
      assert(words.as[(Seq[String], Long)].collect().toSet ==
        Set((Seq("a"), 1L), (Seq("b"), 1L), (Seq("c"), 1L)))
      // the local reference agrees on the early stop
      val (refT, refM) = refBpe(
        Seq((List("a"), 1L), (List("b"), 1L), (List("c"), 1L)), 4)
      assert(refM.isEmpty && refT.map(_._1).toSet == Set(
        List("a"), List("b"), List("c")))
    } finally Fs.deleteRecursively(dir.toFile)
  }
}
