package graft

import org.apache.spark.sql.SparkSession

/** Opinionated session factory: the configuration stance this engine is
  * designed to run under, at local[32] and on a real cluster alike.
  * Everything here is config, not code — call sites can override any of
  * it via the returned builder.
  */
object GraftSession {

  def builder(master: String = "local[32]", shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.session.timeZone", "UTC")
      // Shuffle sizing: match parallelism locally; on a cluster AQE
      // coalesces from this initial number.
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      // AQE: runtime re-planning — partition coalescing, skew-join
      // splitting, and broadcast-join demotion at 100 TB input skew.
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // Streaming state at scale: RocksDB state store keeps per-key
      // state off-heap and incrementally checkpointed (SURVEY.md §2.2 —
      // unbounded schema state, 100 TB dedup state).
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      // Changelog checkpointing: per-batch commits upload the write-ahead
      // changelog instead of a full RocksDB snapshot zip per partition
      // per batch; snapshots move to the background maintenance interval.
      .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
      // Scan efficiency: vectorized parquet + pushdown everywhere.
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      .config("spark.sql.parquet.enableVectorizedReader", "true")
      .config("spark.ui.enabled", "false")
}
