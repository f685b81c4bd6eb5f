package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the training-data loader's shard-preparation
  * step: lay documents end to end in a canonical order and cut the
  * stream into fixed token-budget training sequences (GPT-style
  * "concat-and-chunk"). Each document gets its global token START
  * offset and the sequence (bin) index its first token lands in; a
  * document whose span crosses a bin boundary continues into the next
  * bin, exactly like the real loaders.
  *
  * The core primitive is a DISTRIBUTED PREFIX SUM in the two-phase
  * scan shape (the classic carry-propagation decomposition):
  *
  *   1. slice the canonical id order into `buckets` contiguous ranges
  *      (width ⌈n/buckets⌉ from one driver count — the ns24 scalar
  *      pattern) and aggregate one weight sum per range;
  *   2. cumulate the per-range sums with ONE window over ≤ `buckets`
  *      rows — metadata-sized by construction, never corpus-sized
  *      (`buckets` is a config knob: 256 here, a few thousand on a
  *      1000-executor cluster — the window input stays tiny while each
  *      range holds corpus/buckets rows);
  *   3. broadcast-join the range offsets back and window WITHIN each
  *      range (partitionBy bucket, orderBy id) for the local exclusive
  *      cumsum — partitions are corpus/buckets sized, the same bound
  *      as any shuffle partition.
  *
  * No corpus-sized window partition anywhere (the ns45 discipline);
  * PlanAuditSpec pins both window shapes. All arithmetic is int64, so
  * the result is exact and order-free; the id column must be numeric
  * and is assumed roughly dense (sparse ids skew range sizes but never
  * correctness).
  */
object Packing {

  /** Pack rows of `df` in ascending-`idCol` order against a token
    * `budget` per sequence. Returns (idCol, weight, start, bin):
    * `weight` = the row's `weightCol` as long, `start` = exclusive
    * prefix sum of weights in id order, `bin` = start DIV budget.
    */
  def packSequences(df: DataFrame, idCol: String, weightCol: String,
                    budget: Long, buckets: Int = 256): DataFrame = {
    require(budget > 0, s"packSequences: budget must be positive, got $budget")
    require(buckets > 0, s"packSequences: buckets must be positive, got $buckets")
    val n = df.count() // driver scalar: one count scan (the ns24 pattern)
    val width = math.max(1L, (n + buckets - 1) / buckets)
    // A null or negative weight would silently poison every offset
    // after it — fail loudly at the row (the q60 guard pattern).
    val w = when(col(weightCol).isNull || col(weightCol) < 0,
      raise_error(concat(
        lit(s"packSequences: $weightCol must be a non-null, non-negative " +
          "token count; got "),
        coalesce(col(weightCol).cast("string"), lit("NULL")))))
      .otherwise(col(weightCol).cast("long"))
    val base = df.select(col(idCol), w.as("weight"),
      expr(s"CAST($idCol AS BIGINT) DIV $width").as("bucket"))
    val rangeSums = base.groupBy(col("bucket"))
      .agg(sum(col("weight")).as("bw"))
    // Carry propagation: ONE window over ≤ buckets rows (metadata-
    // sized), exclusive so bucket 0's offset is 0.
    val carry = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = rangeSums.select(col("bucket"),
      coalesce(sum(col("bw")).over(carry), lit(0L)).as("off"))
    // Local exclusive cumsum within each range, then add the carry.
    val local = Window.partitionBy(col("bucket")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    base.join(broadcast(offsets), Seq("bucket"))
      .select(col(idCol), col("weight"),
        (col("off") + coalesce(sum(col("weight")).over(local), lit(0L)))
          .as("start"))
      .select(col(idCol), col("weight"), col("start"),
        expr(s"start DIV $budget").as("bin"))
  }

  /** The chunk table [[packSequences]] implies — the loader's actual
    * read plan: one row per (bin, document) segment, with the
    * document-local token half-open range [tok_from, tok_to) that bin
    * consumes. A document spanning a bin boundary contributes one row
    * per bin it crosses; by construction every bin except the last
    * holds exactly `budget` tokens.
    *
    * Scale shape: [[packSequences]]'s plan plus one generator whose
    * per-row fan-out is ⌈weight/budget⌉+1 — bounded by the row's own
    * length, the ns56 cap discipline, never corpus-sized. All
    * arithmetic stays int64.
    */
  def packChunks(df: DataFrame, idCol: String, weightCol: String,
                 budget: Long, buckets: Int = 256): DataFrame = {
    val packed = packSequences(df, idCol, weightCol, budget, buckets)
      .filter(col("weight") > 0)
      .withColumn("fin", col("start") + col("weight"))
    packed
      .select(col(idCol), col("start"), col("fin"),
        explode(sequence(expr(s"start DIV $budget"),
          expr(s"(fin - 1) DIV $budget"))).as("bin"))
      .select(col("bin"), col(idCol),
        (greatest(col("start"), col("bin") * budget) - col("start"))
          .as("tok_from"),
        (least(col("fin"), (col("bin") + 1) * budget) - col("start"))
          .as("tok_to"),
        (least(col("fin"), (col("bin") + 1) * budget)
          - greatest(col("start"), col("bin") * budget)).as("n_tok_chunk"))
  }
}
