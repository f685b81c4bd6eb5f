package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's verified operator inventory: one entry per
  * operator from SURVEY.md §2 (+ the training-data-pipeline additions),
  * each paired with an equivalent DuckDB oracle in `oracleSql`. Packs
  * live under [[graft.queries]].
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.CdcQueries.queries ++
      graft.queries.TextQueries.queries ++
      graft.queries.VectorQueries.queries ++
      graft.queries.StreamQueries.queries ++
      graft.queries.ApiQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracle ++
      graft.queries.CdcQueries.oracle ++
      graft.queries.TextQueries.oracle ++
      graft.queries.VectorQueries.oracle ++
      graft.queries.StreamQueries.oracle ++
      graft.queries.ApiQueries.oracle
}
