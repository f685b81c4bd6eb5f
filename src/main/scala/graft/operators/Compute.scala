package graft.operators

import org.apache.spark.sql.DataFrame

/** Scale-adaptive parallelism floor for compute-dense stages (guide
  * §2.2/§2.5/§2.6): a stage whose cost is CPU-per-row — shingle hashing,
  * minhash permutations, set-overlap scoring — must be partitioned by
  * CLUSTER capacity, not by its (often tiny) byte size. Two byte-based
  * mechanisms otherwise serialize such stages onto a handful of cores:
  * a small single-split file scans as ONE task (parquet splits at
  * row-group granularity), and AQE's coalescing targets bytes per
  * partition, so a kilobytes-sized exchange feeding a quadratic scoring
  * join coalesces to one task. `max(defaultParallelism,
  * spark.sql.shuffle.partitions)` tracks the local core count AND any
  * production shuffle-partition sizing, so the same expression is right
  * at local[4] and on a 4 000-slot cluster. */
private[graft] object Compute {
  def parallelism(df: DataFrame): Int = {
    val s = df.sparkSession
    val shuffle = scala.util.Try(
      s.conf.get("spark.sql.shuffle.partitions", "200").trim.toInt).getOrElse(0)
    math.max(1, math.max(s.sparkContext.defaultParallelism, shuffle))
  }
}
