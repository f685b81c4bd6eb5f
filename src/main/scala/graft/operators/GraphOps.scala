package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph analytics over an undirected edge list — the
  * graph-shaped members of the dedup/quality toolbox
  * ([[Dedup.componentLabels]] is the iterative one; these are the
  * bounded-depth ones).
  */
object GraphOps {

  /** Per-node triangle counts + local clustering coefficients over an
    * undirected simple edge list `(srcCol, dstCol)` (each edge once,
    * src < dst or any consistent orientation; no self-loops).
    *
    * The classic degree-oriented distributed count: every edge is
    * re-pointed from its lower-(degree, id) endpoint to the higher, so
    * wedge enumeration fans out only from LOW-degree endpoints — the
    * oriented out-degree is O(√m) on ANY graph (a node of oriented
    * out-degree d has d neighbors of degree ≥ its own, so d² ≤ 2m) —
    * and each triangle is materialized exactly once, never 3×. The
    * wedge join (node key) and closure join (edge-pair key) are plain
    * shuffled equi-joins; per-node counts are one partial agg over the
    * exploded corners. Counts are exact integers; `lcc` =
    * 2·tri/(deg·(deg−1)) is a single IEEE division — deterministic on
    * any engine.
    *
    * @return `(v, deg, triangles, lcc)` — one row per node appearing
    *         in at least one triangle
    */
  def triangleCounts(pairs: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    // The edge list feeds the degree agg AND the orientation join, and
    // the oriented set feeds BOTH wedge sides plus the closure join —
    // lazy plans would re-run the (often expensive) pair computation
    // once per consumer. Materialize each tier once, durably
    // (Checkpoints.reliable: cluster-visible, recomputable on executor
    // loss — the ns32/componentLabels posture for corpus-scale reuse).
    val p = Checkpoints.reliable(
      pairs.select(col(srcCol).as("id_a"), col(dstCol).as("id_b")),
      "graphops-edges")
    val deg = p.select(col("id_a").as("v"))
      .unionByName(p.select(col("id_b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    val e = p
      .join(deg.select(col("v").as("id_a"), col("deg").as("da")), Seq("id_a"))
      .join(deg.select(col("v").as("id_b"), col("deg").as("db")), Seq("id_b"))
    val lowFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("id_a") < col("id_b"))
    val oriented = Checkpoints.reliable(e.select(
      when(lowFirst, col("id_a")).otherwise(col("id_b")).as("u"),
      when(lowFirst, col("id_b")).otherwise(col("id_a")).as("w"),
      when(lowFirst, col("db")).otherwise(col("da")).as("dw")),
      "graphops-oriented")
    // ordered out-neighbor pairs in the SAME (degree, id) total order,
    // so the closing edge is oriented w1 → w2
    val x = oriented.select(col("u"), col("w").as("w1"), col("dw").as("d1"))
    val y = oriented.select(col("u"), col("w").as("w2"), col("dw").as("d2"))
    val wedges = x.join(y, Seq("u")).filter(col("d1") < col("d2") ||
      (col("d1") === col("d2") && col("w1") < col("w2")))
    val tri = wedges
      .join(oriented.select(col("u").as("w1"), col("w").as("w2")), Seq("w1", "w2"))
      .select(col("u").as("c1"), col("w1").as("c2"), col("w2").as("c3"))
    tri.select(explode(array(col("c1"), col("c2"), col("c3"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("triangles"))
      .join(deg, Seq("v"))
      .select(col("v"), col("deg"), col("triangles"),
        ((col("triangles") * 2).cast("double") /
          (col("deg") * (col("deg") - lit(1))).cast("double")).as("lcc"))
  }
}
