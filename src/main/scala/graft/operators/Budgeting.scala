package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Budget allocation over grouped corpora — the sampling-quota tier of
  * a multilingual / multi-source training-data pipeline (SURVEY.md
  * §2.3 ⊕). Currently one member: the UniMax integer waterfill
  * (Chung et al. 2023), exposed for ns64 and property-pinned by
  * BudgetingSpec against a sequential greedy reference.
  */
object Budgeting {

  /** UniMax waterfill: every group holds a positive integer `cap` (its
    * maximum permissible allocation — E epochs of its own tokens);
    * groups whose cap fits under their fair share of what remains get
    * the full cap ("funded"), the rest share the leftover at one
    * common integer level.
    *
    * All arithmetic is exact int64 `div` — no floating point, so any
    * engine replays it bit-for-bit. The greedy funded flag is
    * computable independently per row along the (cap, key)-ascending
    * order because it is MONOTONE: if row r is unfunded then
    * cap_r·(n−r+1) > remaining, so remaining − cap_r < cap_r·(n−r),
    * and every later cap is ≥ cap_r — once false, always false. The
    * common level is therefore (budget − Σ funded caps) div
    * n_unfunded, provably ≥ 0 and strictly below every unfunded cap.
    *
    * Scale shape: metadata-only. The input is a per-group table
    * (languages, sources — tens of rows); the rank/prefix windows run
    * over that table, never over data. Corpus-sized work (producing
    * the caps) happens before this call.
    *
    * @param groups  per-group table (one row per group)
    * @param keyCol  group identity (ties in cap break on it)
    * @param capCol  positive int64 cap; a non-positive cap raises a
    *                named error rather than risking the one case where
    *                Spark's truncating `div` and floor division could
    *                disagree (negative quotient vs a cap of 0)
    * @param budget  non-negative total to allocate
    * @return input columns + `funded` boolean + `quota` int64
    */
  def waterfill(groups: DataFrame, keyCol: String, capCol: String,
                budget: Long): DataFrame = {
    require(budget >= 0L, s"Budgeting.waterfill: budget must be >= 0, got $budget")
    val cap = col(capCol)
    val guarded = when(cap.isNull || cap <= 0, raise_error(lit(
      s"Budgeting.waterfill: '$capCol' must be positive"))).otherwise(cap)
    val w = Window.orderBy(col(capCol), col(keyCol))
    val flagged = groups
      .withColumn(capCol, guarded)
      .crossJoin(broadcast(groups.agg(count(lit(1)).as("wf_n"))))
      .withColumn("wf_rnk", row_number().over(w))
      .withColumn("wf_pfx", sum(cap).over(w))
      .withColumn("funded", cap <=
        expr(s"($budget - (wf_pfx - $capCol)) div (wf_n - wf_rnk + 1)"))
    val lvl = flagged.agg(
      expr(s"($budget - sum(case when funded then $capCol else 0 end))" +
        " div greatest(sum(case when funded then 0 else 1 end), 1)")
        .as("wf_level"))
    flagged.crossJoin(broadcast(lvl))
      .withColumn("quota", when(col("funded"), cap).otherwise(col("wf_level")))
      .drop("wf_n", "wf_rnk", "wf_pfx", "wf_level")
  }
}
