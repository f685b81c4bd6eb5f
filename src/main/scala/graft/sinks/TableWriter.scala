package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Batch table writer for the flattened/analytic side: partitioned,
  * optionally sorted parquet layout.
  *
  * Layout choices are the 100 TB levers: `partitionBy` low-cardinality
  * filter columns so reads prune whole directories (partition pruning);
  * sort within files by the dominant range-filter column so parquet
  * row-group min/max statistics prune pages; size output files via
  * `repartition(n)` before writing to avoid the small-files problem.
  */
object TableWriter {

  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String],
                       sortCols: Seq[String] = Nil,
                       files: Int = 0): Unit = {
    val sized = if (files > 0) df.repartition(files) else df
    val sorted =
      if (sortCols.nonEmpty)
        sized.sortWithinPartitions(sortCols.map(org.apache.spark.sql.functions.col): _*)
      else sized
    sorted.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }
}
