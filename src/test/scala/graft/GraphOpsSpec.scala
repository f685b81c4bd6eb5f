package graft

import graft.operators.GraphOps

/** Degree-oriented triangle counting vs local brute force on seeded
  * random graphs — including regimes rich in ties (equal degrees),
  * where a sloppy orientation would double- or zero-count. */
class GraphOpsSpec extends SparkSuite {
  import spark.implicits._

  private def bruteForce(edges: Set[(Long, Long)]): Map[Long, Int] = {
    val adj = edges.foldLeft(Map.empty[Long, Set[Long]]) { case (m, (a, b)) =>
      m.updated(a, m.getOrElse(a, Set.empty) + b)
        .updated(b, m.getOrElse(b, Set.empty) + a)
    }
    val nodes = adj.keys.toSeq.sorted
    val counts = scala.collection.mutable.Map.empty[Long, Int]
    for {
      a <- nodes; b <- adj(a) if b > a; c <- adj(a) if c > b
      if adj(b).contains(c)
    } Seq(a, b, c).foreach(v => counts(v) = counts.getOrElse(v, 0) + 1)
    counts.toMap
  }

  private def check(edges: Set[(Long, Long)], clue: String): Unit = {
    val expected = bruteForce(edges)
    val df = edges.toSeq.sorted.toDF("id_a", "id_b").repartition(7)
    val got = GraphOps.triangleCounts(df, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got.keySet == expected.keySet,
      s"$clue: triangle-bearing nodes ${got.keySet} != ${expected.keySet}")
    expected.foreach { case (v, n) =>
      val (deg, tri, lcc) = got(v)
      assert(tri == n, s"$clue node $v: $tri triangles, brute force says $n")
      assert(math.abs(lcc - 2.0 * n / (deg * (deg - 1.0))) == 0.0,
        s"$clue node $v: lcc mismatch")
    }
  }

  test("random graphs match brute force (fixed-seed sweep)") {
    val rnd = new scala.util.Random(20260813L)
    for (trial <- 1 to 5) {
      val n = 30 + trial * 10
      val p = 0.05 + 0.03 * trial
      val edges = (for {
        a <- 0L until n; b <- (a + 1) until n if rnd.nextDouble() < p
      } yield (a, b)).toSet
      check(edges, s"G($n, $p)")
    }
  }

  test("clique unions (all-equal degrees force the id tie-break everywhere)") {
    // three disjoint 5-cliques: every node has degree 4, so orientation
    // falls back to the id tie on every edge; each node closes C(4,2)=6
    // triangles
    val edges = (for {
      base <- Seq(0L, 100L, 200L)
      a <- 0L until 5L; b <- (a + 1) until 5L
    } yield (base + a, base + b)).toSet
    check(edges, "5-cliques")
    val got = GraphOps.triangleCounts(
      edges.toSeq.toDF("id_a", "id_b"), "id_a", "id_b")
      .select($"triangles", $"lcc").as[(Long, Double)].collect()
    assert(got.forall(_ == ((6L, 1.0))), s"clique nodes must be fully clustered: ${got.toSeq}")
  }

  test("triangle-free graphs return no rows") {
    // a path and a star: wedges everywhere, triangles nowhere
    val path = (0L until 10L).sliding(2).map(s => (s(0), s(1))).toSet
    val star = (1L to 8L).map(i => (0L, i)).toSet
    assert(GraphOps.triangleCounts(path.toSeq.toDF("id_a", "id_b"),
      "id_a", "id_b").count() == 0)
    assert(GraphOps.triangleCounts(star.toSeq.toDF("id_a", "id_b"),
      "id_a", "id_b").count() == 0)
  }
}
