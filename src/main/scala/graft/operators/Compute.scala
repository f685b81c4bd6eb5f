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

  /** Materialization barrier for a compute-once table feeding multiple
    * downstream consumers (the dedup/LSH hashed-table shape).
    *
    * LOCAL MODE: a lazy `localCheckpoint` — every block is in the one
    * process anyway, so durability adds nothing and the first consumer
    * pays the single materialization.
    *
    * CLUSTER: a durable parquet checkpoint ([[Checkpoints.reliable]]).
    * `localCheckpoint` truncates lineage into NON-REPLICATED
    * executor-local blocks: on a preemptible/dynamic-allocation cluster
    * one lost executor mid-query fails every downstream job
    * unrecoverably (there is nothing left to recompute from), and the
    * blocks pin executor storage until the caller's handle is GC'd.
    * Writing the barrier to shared storage costs one extra parquet
    * write per operator call and removes both failure modes — the
    * 100 TB posture. Requires the session checkpoint dir on shared
    * storage (Checkpoints.checkpointRoot enforces exactly that). */
  def barrier(df: DataFrame, tag: String): DataFrame =
    if (df.sparkSession.sparkContext.isLocal) df.localCheckpoint(false)
    else Checkpoints.reliable(df, tag)
}
