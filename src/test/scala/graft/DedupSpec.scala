package graft

import graft.operators.{Dedup, Multimodal, Similarity}
import org.apache.spark.sql.functions._

/** Dedup + similarity operators against the fixture data: LSH must
  * reproduce the brute-force ground truth; multimodal plumbing must be
  * deterministic end-to-end. */
class DedupSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet")
  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")

  test("minhash LSH near-dups == brute-force ground truth at threshold 0.8") {
    val brute = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashNearDups(docs, "doc_id", "text", 3, 64, 16, 0.8)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty, "fixture should contain planted near-dups")
    assert(lsh == brute)
  }

  test("simhash of near-dup pairs is close in hamming distance") {
    val fp = Dedup.simhashFingerprints(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val dists = pairs.map { case (a, b) => hamming(fp(a), fp(b)) }
    assert(dists.forall(_ <= 8),
      s"near-dup simhashes should be close, got ${dists.mkString(",")}")
  }

  test("brute-force knn is deterministic and self-consistent with bucketed ANN") {
    val brute = Similarity.bruteForceTopK(emb.filter($"vec_id" < 3), emb, 5)
    val rows = brute.collect()
    assert(rows.length == 15) // 3 queries × k=5
    val bucketed = Similarity.bucketedTopK(emb.filter($"vec_id" < 3), emb, 5, bits = 4)
    // every bucketed neighbor's cosine must be ≤ the brute-force best
    val bestByQuery = rows.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getDouble(3)).max).toMap
    bucketed.collect().foreach { r =>
      assert(r.getDouble(4) <= bestByQuery(r.getLong(0)) + 1e-12)
    }
  }

  test("trained IVF recall@3 is bounded: nprobe=2 dominates nprobe=1, mean >= 0.9") {
    // The index-quality CLAIM as a failing assertion, not just a reported
    // number (vs08 reports it; this pins it): widening the probe set can
    // only add candidates — any candidate displacing a true top-3 hit
    // would itself be in the global top-3 — so per-query recall is
    // monotone in nprobe; and on the fixture the TRAINED index must
    // actually work (the label-partitioned form can't: this fixture's
    // labels carry no geometry, recall ~0.3 there).
    val qs = emb.filter($"vec_id" < 10)
    val cent = Similarity.ivfTrain(emb, kCentroids = 8, iters = 3)
    val exact = Similarity.bruteForceTopK(qs, emb, k = 3)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def recall(nprobe: Int): Map[Long, Double] =
      Similarity.ivfSearch(qs, emb, cent, k = 3, nprobe = nprobe)
        .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).view
        .mapValues(ns => ns.count(n => exact(n._1).contains(n._2)) / 3.0)
        .toMap
    val r1 = recall(1); val r2 = recall(2)
    exact.keys.foreach { q =>
      assert(r2.getOrElse(q, 0.0) >= r1.getOrElse(q, 0.0) - 1e-12,
        s"query $q: nprobe=2 recall ${r2.get(q)} < nprobe=1 ${r1.get(q)}")
    }
    val mean2 = exact.keys.iterator.map(q => r2.getOrElse(q, 0.0)).sum / exact.size
    assert(mean2 >= 0.9 - 1e-12, s"mean recall@3 at nprobe=2 degraded to $mean2")
  }

  test("componentLabels propagates the min id transitively across chains") {
    import spark.implicits._
    // chain 1-2, 2-3 (one component via transitivity), island 5-6,
    // singleton 9
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val ids = Seq(1L, 2L, 3L, 5L, 6L, 9L).toDF("doc_id")
    val labels = Dedup.componentLabels(pairs, ids, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L, 9L -> 9L))
  }

  test("componentLabels handles a long path graph: log-round convergence, bounded plans") {
    import spark.implicits._
    // A 200-hop path is the adversarial shape: plain min-label
    // propagation needs 200 rounds, and without in-loop checkpointing
    // the analyzed plan tree grows exponentially with rounds (this
    // exact shape OOM'd the driver before pointer doubling + periodic
    // reliable checkpoints landed). ~8 doubling rounds must finish
    // quickly and label every node with the path minimum.
    val n = 200L
    val pairs = (0L until n - 1).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val ids = (0L until n).toDF("doc_id")
    val labels = Dedup.componentLabels(pairs, ids, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == n && labels.values.forall(_ == 0L),
      "every path node must adopt the chain minimum")
    // in-loop iteration checkpoints must not outlive the call: only the
    // managed graft-cc-labels generations may remain under the root
    val root = new java.io.File(
      new java.net.URI(spark.sparkContext.getCheckpointDir.get).getPath)
    val iterLeft = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("graft-cc-iter-"))
    assert(iterLeft.isEmpty,
      s"stranded iteration checkpoints: ${iterLeft.map(_.getName).toSeq}")
  }

  test("componentLabels leaves no persisted RDDs behind and returns a usable plan") {
    val base = spark.sparkContext.getPersistentRDDs.keySet
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text", 3, 64, 16, 0.8)
    // Materialize the INPUT first: lshIndex's lazy localCheckpoint
    // barriers cache on first use and legitimately stay cached while
    // this `pairs` handle is live (they ARE its data; the ContextCleaner
    // reclaims them when the handle is dropped and GC'd). The pin below
    // is about componentLabels' OWN loop state — persisted labels/edges
    // per round — which must all be unpersisted by return.
    pairs.count()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    // Pre-capture delta guard (the `before` capture would otherwise
    // exempt ANY persist minhashNearDups makes): the pipeline is allowed
    // exactly lshIndex's two intended lazy-localCheckpoint barriers
    // (hashed table + banded index) — an unexpected extra persist inside
    // the operators must fail here, not hide behind the capture.
    assert((before -- base).size == 2,
      s"minhashNearDups must persist exactly its two checkpoint " +
        s"barriers, got ${(before -- base).size}: ${before -- base}")
    val labels = Dedup.componentLabels(pairs, docs, "doc_id")
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"componentLabels stranded cached RDDs: $leaked")
    // the returned plan must be consumable (twice) without recomputing the
    // fixpoint from a now-unpersisted lineage blowing up
    val n1 = labels.count()
    val n2 = labels.filter(col("id") === col("component")).count()
    assert(n1 == docs.count() && n2 <= n1 && n2 > 0)
  }

  test("componentLabels keeps two checkpoint generations; previous handle stays live") {
    import spark.implicits._
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val ids = Seq(1L, 2L, 3L).toDF("doc_id")
    // the handle from call N-1 must remain consumable AFTER call N has
    // written (lazy plans resolve parquet files at action time) — only
    // the dir two calls back is deleted
    var previous: org.apache.spark.sql.DataFrame = null
    (1 to 4).foreach { _ =>
      val cur = Dedup.componentLabels(pairs, ids, "doc_id")
      if (previous != null) assert(previous.count() == 3,
        "previous call's labels handle was invalidated by the next call")
      previous = cur
    }
    val ckpt = new java.io.File(
      new java.net.URI(spark.sparkContext.getCheckpointDir.get).getPath)
    val labelDirs = Option(ckpt.listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(_.startsWith("graft-cc-labels-"))
    assert(labelDirs.length <= 2,
      s"stale labels checkpoints not cleaned: ${labelDirs.mkString(",")}")
  }

  test("SQ8 quantized search recall@3 vs brute force >= 0.9") {
    // 8-bit quantization error is far below typical neighbor gaps, and
    // pass 2 rescores the overfetched shortlist at full precision — on
    // the fixture recall is 1.0; the bound catches a quantizer
    // regression (wrong scale, wrong clamp, reordered fold).
    val qs = emb.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(qs, emb, k = 3)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val sq8 = Similarity.sq8TopK(qs, emb, k = 3)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
    val hits = sq8.count { case (q, n) => exact(q).contains(n) }
    assert(hits >= (0.9 * sq8.length).toInt,
      s"SQ8 recall degraded: $hits/${sq8.length}")
  }

  test("rangeSearch equals brute-force scores filtered at the threshold") {
    // the threshold filter must keep EXACTLY the pairs whose brute-force
    // cosine clears it — same fold order, bit-identical scores, so set
    // equality is exact (no tolerance)
    val qs = emb.filter($"vec_id" < 10)
    val n = emb.count().toInt
    val all = Similarity.bruteForceTopK(qs, emb, k = n)
      .select($"query_id", $"neighbor_id", $"cos")
      .as[(Long, Long, Double)].collect()
    val tau = 0.2
    val expected = all.filter(_._3 >= tau).map(t => (t._1, t._2, t._3)).toSet
    val got = Similarity.rangeSearch(qs, emb, tau)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == expected,
      s"range search diverged: ${got.size} vs ${expected.size} pairs")
    assert(got.nonEmpty, "fixture threshold should keep some pairs")
  }

  test("truncated-rescore search: exact scores, monotone recall, exact at full window") {
    // The scheme's actual guarantees, each pinned: (1) every emitted
    // score is BIT-IDENTICAL to the brute-force cosine for that pair —
    // the rescore is the same in-order fold over the same full vectors;
    // (2) recall is monotone in overfetch — widening the candidate
    // window can only add candidates, and a candidate that displaces a
    // true top-3 hit after exact rescoring would itself be a true top-3
    // hit; (3) when the window covers the whole corpus the result
    // EQUALS brute force exactly. What is deliberately NOT claimed: a
    // recall floor at small overfetch — this fixture's embeddings are
    // spectrum-flat (near-random), the adversarial case for prefix
    // ranking; MRL-trained embeddings front-load variance precisely so
    // the small-prefix pass ranks well. The measured fixture curve
    // (prefix=16: 0.3@4× → 0.53@16×; prefix=48: 1.0@8×) is the
    // documentation of that dependence, not a regression.
    val qs = emb.filter($"vec_id" < 10)
    val n = emb.count().toInt
    val exactRows = Similarity.bruteForceTopK(qs, emb, k = n)
      .select($"query_id", $"neighbor_id", $"cos")
      .as[(Long, Long, Double)].collect()
    val exactCos = exactRows.map(t => (t._1, t._2) -> t._3).toMap
    val exactTop3 = exactRows.groupBy(_._1).view
      .mapValues(_.sortBy(t => (-t._3, t._2)).take(3).map(_._2).toSet).toMap
    def run(overfetch: Int): Array[(Long, Long, Double)] =
      Similarity.truncatedRescoreTopK(qs, emb, k = 3,
        prefixDim = 16, overfetch = overfetch)
        .select($"query_id", $"neighbor_id", $"cos")
        .as[(Long, Long, Double)].collect()
    def recall(rows: Array[(Long, Long, Double)]): Double =
      rows.count { case (q, nb, _) => exactTop3(q).contains(nb) }.toDouble / rows.length
    val r4 = run(4)
    assert(r4.length == 30, "3 neighbors per query expected")
    r4.foreach { case (q, nb, c) =>
      assert(exactCos((q, nb)) == c, s"rescored cosine drifted for ($q,$nb)")
    }
    val r16 = run(16)
    assert(recall(r16) >= recall(r4) - 1e-12,
      s"recall must be monotone in overfetch: ${recall(r16)} < ${recall(r4)}")
    // full window: candidates = whole corpus → exactly brute force
    val full = run((n + 2) / 3 + 1)
    val exactSet = exactTop3.toSeq.flatMap { case (q, s) => s.map(q -> _) }.toSet
    assert(full.map(t => (t._1, t._2)).toSet == exactSet,
      "full-window truncated-rescore must equal brute force")
  }

  test("incremental near-dups == brute cross pairs; history never self-pairs") {
    val hist = docs.filter(pmod($"doc_id", lit(10)) =!= 0)
    val batch = docs.filter(pmod($"doc_id", lit(10)) === 0)
    val inc = Dedup.incrementalNearDups(hist, batch, "doc_id", "text",
      shingleN = 3, k = 64, bands = 16, threshold = 0.8)
      .select($"id_new", $"id_hist").as[(Long, Long)].collect().toSet
    val brute = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
      .flatMap { case (a, b) =>
        (a % 10, b % 10) match {
          case (0, h) if h != 0 => Some((a, b))
          case (h, 0) if h != 0 => Some((b, a))
          case _ => None
        }
      }.toSet
    assert(brute.nonEmpty, "fixture should contain cross-split near-dups")
    assert(inc == brute)
    assert(inc.forall { case (n, h) => n % 10 == 0 && h % 10 != 0 })
  }

  test("k-means|| init == exact batched farthest-point traversal") {
    // replicate the engine's fold order exactly (in-index-order dot,
    // sqrt norms) so the selection comparison is bit-exact, no tolerance
    val vecs: Map[Long, Array[Double]] = emb.select($"vec_id", $"embedding")
      .as[(Long, Seq[Float])].collect()
      .map { case (id, v) => id -> v.map(_.toDouble).toArray }.toMap
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }; acc
    }
    def cos(a: Array[Double], b: Array[Double]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val perRound = 4; val rounds = 2
    var centers = List(vecs.keys.min)
    var expect = Map(0 -> List(vecs.keys.min))
    for (r <- 1 to rounds) {
      val picks = vecs.toSeq
        .map { case (id, v) => (id, centers.map(c => cos(v, vecs(c))).max) }
        .sortBy { case (id, nc) => (nc, id) }
        .take(perRound).map(_._1).toList
      expect += r -> picks
      centers = centers ++ picks
    }
    val got = Similarity.kmeansParallelInit(emb, perRound, rounds)
      .select($"round", $"vec_id").as[(Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    (0 to rounds).foreach { r =>
      assert(got(r) == expect(r).toSet, s"round $r picks diverged")
    }
    val all = got.values.flatten.toSeq
    assert(all.size == 1 + rounds * perRound && all.distinct.size == all.size,
      "centers must be distinct and complete")
  }

  test("PQ product-quantized search recall@3 vs brute force is bounded") {
    // a 16-codeword × 8-subspace codebook is a coarse reconstruction, so
    // unlike SQ8 the pass-1 shortlist CAN miss true neighbors — the
    // bound catches an encoder regression (wrong slice arithmetic, wrong
    // argmin tiebreak, reordered fold), not a recall promise
    val qs = emb.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(qs, emb, k = 3)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val pq = Similarity.pqTopK(qs, emb, numSub = 8, kCodes = 16, k = 3)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
    assert(pq.length == 30, "3 neighbors per query expected")
    val hits = pq.count { case (q, n) => exact(q).contains(n) }
    assert(hits >= (0.6 * pq.length).toInt,
      s"PQ recall degraded: $hits/${pq.length}")
  }

  test("contaminationFlags pins n-gram-collision semantics on planted data") {
    import spark.implicits._
    val bench = Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val train = Seq(
      // shares exactly the 5-gram "beta_gamma_delta_epsilon_zeta"
      (20L, "x beta gamma delta epsilon zeta y"),
      // shares tokens but never 5 consecutive ones
      (21L, "alpha beta gamma x delta epsilon zeta"),
      // too short to form any 5-gram
      (22L, "alpha beta"),
      (23L, "completely different text with nothing shared here")
    ).toDF("doc_id", "text")
    val flags = Dedup.contaminationFlags(train, bench, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(flags(20L) == ((1L, true)),
      s"doc 20 shares exactly one benchmark 5-gram: ${flags(20L)}")
    assert(flags(21L) == ((0L, false)), "token overlap without a 5-gram run is clean")
    assert(flags(22L) == ((0L, false)), "sub-n documents cannot collide")
    assert(flags(23L) == ((0L, false)))
  }

  // Local twin of TextFunctions.portableHash / shingles — the spec-side
  // ground truth for the span/winnowing operators below.
  private def localHash(s: String): Long =
    s.codePoints().toArray.foldLeft(0L)((h, c) => (h * 31 + c) % 2147483647L)
  private def localShingleHashes(text: String, n: Int): Seq[Long] = {
    val t = text.split(" ", -1)
    if (t.length < n) Seq.empty
    else t.sliding(n).map(g => localHash(g.mkString("_"))).toSeq
  }
  private def localWinnow(text: String, k: Int, w: Int): Set[Long] = {
    val hs = localShingleHashes(text, k)
    if (hs.isEmpty) Set.empty
    else (1 to math.max(hs.length - (w - 1), 1))
      .map(i => hs.slice(i - 1, i - 1 + w).min).toSet
  }

  test("dupSpanStats matches a local brute-force doc-frequency count") {
    val texts = docs.select($"doc_id", $"text").as[(Long, String)].collect()
    val perDoc = texts.map { case (id, t) =>
      id -> localShingleHashes(t, 3).distinct
    }.filter(_._2.nonEmpty)
    val dfreq = perDoc.flatMap(_._2).groupBy(identity).map { case (h, o) => h -> o.length }
    val expected = perDoc.map { case (id, hs) =>
      val dup = hs.count(h => dfreq(h) >= 2)
      (id, hs.length.toLong, dup.toLong, dup.toDouble / hs.length)
    }.toSet
    val got = Dedup.dupSpanStats(docs, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == expected)
    assert(expected.exists(_._3 > 0), "fixture should contain shared shingles")
  }

  test("removeDupSpans survives empty and sub-shingle documents") {
    val d = Seq(
      (1L, ""),                        // zero tokens — the sequence(1,0) trap
      (2L, "just two"),                // < shingleN tokens: passes through
      (3L, "dup span here and dup span here and more"), // within-doc repeat
      (4L, "dup span here")            // cross-doc repeat, fully covered
    ).toDF("doc_id", "text")
    val got = Dedup.removeDupSpans(d, "doc_id", "text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(got(0)._1 == 1L && got(0)._3 == 0L)
    assert(got(1) == ((2L, 2L, 0L, "just two")))
    assert(got(2)._3 > 0L, "within-doc repeated shingle must be removed")
    // doc 4 is one shingle repeated in doc 3 → every token covered →
    // empty (not null) rewrite.
    assert(got(3) == ((4L, 3L, 3L, "")))
  }

  test("winnowedFingerprints == local reference on every fixture doc") {
    import graft.functions.TextFunctions
    val got = docs.select($"doc_id",
        TextFunctions.winnowedFingerprints($"text", 3, 4).as("fps"))
      .as[(Long, Seq[Long])].collect().toMap
    docs.select($"doc_id", $"text").as[(Long, String)].collect().foreach {
      case (id, t) =>
        assert(got(id).toSet == localWinnow(t, 3, 4), s"doc $id")
        assert(got(id).distinct == got(id), s"doc $id: fingerprints not distinct")
    }
  }

  test("winnowing guarantee: a shared passage of >= w+k-1 tokens yields a shared print") {
    // k=3, w=4: any common substring of >= 6 tokens must share a fingerprint.
    val passage = "one two three four five six"
    val d = Seq(
      (1L, s"aa bb cc $passage dd ee"),
      (2L, s"zz yy $passage xx ww vv uu"),
      (3L, "totally unrelated words without any overlap at all")
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowedPairs(d, "doc_id", "text",
      shingleN = 3, window = 4, minShared = 1, maxDf = 10)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)),
      "documents sharing a 6-token passage must be candidates")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      "the unrelated document must not pair with anything")
  }

  test("prefixContainmentPairs == quadratic brute force (lossless prefix filter)") {
    val texts = docs.select($"doc_id", $"text").as[(Long, String)].collect()
    val sets = texts.map { case (id, t) =>
      id -> localShingleHashes(t, 3).distinct.toSet
    }.filter(_._2.nonEmpty)
    val brute = (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      c = (sa & sb).size.toDouble / math.min(sa.size, sb.size)
      if c >= 0.8
    } yield (ia, ib, c)).toSet
    val got = Dedup.prefixContainmentPairs(docs, "doc_id", "text",
      shingleN = 3, threshold = 0.8)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == brute)
    assert(brute.nonEmpty, "fixture should contain containment pairs")
  }

  test("prefixJaccardPairs == minhash brute-force ground truth (recall exactly 1)") {
    val brute = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .select($"id_a", $"id_b", $"jaccard").as[(Long, Long, Double)]
      .collect().toSet
    val pf = Dedup.prefixJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .as[(Long, Long, Double)].collect().toSet
    assert(pf == brute)
    assert(brute.nonEmpty)
  }

  test("clusterStats: exhaustive membership, mean bounded, partition-invariant") {
    val cent = Similarity.ivfTrain(emb, 8, 2)
    val stats = Similarity.clusterStats(emb, cent).collect()
    assert(stats.map(_.getLong(1)).sum == emb.count(),
      "every vector must be assigned to exactly one cluster")
    stats.foreach { r =>
      val (mn, mx, mean) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(mn <= mx)
      // quantized mean floors each score by at most 2^-20
      assert(mean >= mn - 1.0 / (1 << 20) && mean <= mx)
    }
    val re = Similarity.clusterStats(emb.repartition(7), cent).collect()
    assert(re.map(r => (r.getInt(0), r.getLong(1), r.getDouble(4))).toSet ==
      stats.map(r => (r.getInt(0), r.getLong(1), r.getDouble(4))).toSet,
      "quantized mean must not depend on partitioning")
  }

  test("multimodal payload plumbing: stable schema, deterministic stub features") {
    val media = Multimodal.attachPayload(docs, "doc_id", "text", "text/plain")
    assert(media.schema == Multimodal.mediaType)
    val f1 = Multimodal.extractFeatures(media, dim = 8)
      .collect().map(m => m.media_id -> m.features.toSeq).toMap
    val f2 = Multimodal.extractFeatures(media.repartition(7), dim = 8)
      .collect().map(m => m.media_id -> m.features.toSeq).toMap
    assert(f1 == f2, "features must not depend on partitioning")
    assert(f1.values.forall(v => v.length == 8 && v.forall(x => x >= 0f && x < 1f)))
  }

  test("tombstone-masked search never surfaces a deleted vector, even a top-1") {
    // vs26's invariant: masking happens on the POSTINGS, before ranking —
    // so deleting a query's exact nearest neighbor both removes it from
    // the results and backfills the next-best candidate (k is still met
    // from the live set, not truncated).
    val qs = emb.filter($"vec_id" < 5)
    val cent = Similarity.ivfTrain(emb, kCentroids = 8, iters = 3)
    val full = Similarity.ivfSearchIndexed(qs,
      Similarity.ivfIndex(emb, cent), cent, k = 3, nprobe = 2)
    // tombstone every query's current #1 neighbor
    val top1 = full.filter($"rank" === 1)
      .select($"neighbor_id").distinct()
    val dead = top1.as[Long].collect().toSet
    val live = Similarity.ivfIndex(emb, cent)
      .join(top1.withColumnRenamed("neighbor_id", "vec_id"),
        Seq("vec_id"), "left_anti")
    val masked = Similarity.ivfSearchIndexed(qs, live, cent, k = 3, nprobe = 2)
      .select($"query_id", $"neighbor_id", $"rank")
      .as[(Long, Long, Int)].collect()
    assert(masked.forall { case (_, n, _) => !dead.contains(n) },
      "a tombstoned id surfaced in masked results")
    val perQuery = masked.groupBy(_._1).view.mapValues(_.length).toMap
    qs.select($"vec_id").as[Long].collect().foreach { q =>
      assert(perQuery.getOrElse(q, 0) == 3, s"query $q not backfilled to k")
    }
  }
}
