package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame

/** Bridge into Spark's `private[sql]` Dataset internals for V1
  * streaming sinks: the DataFrame handed to `Sink.addBatch` carries
  * the micro-batch's IncrementalExecution, and any TRANSFORMATION on
  * it re-analyzes the logical plan — which still contains the
  * streaming source relation and trips the "streaming sources must be
  * executed with writeStream.start()" check. `ForeachBatchSink` solves
  * this by re-wrapping the executed rows as a plain batch Dataset;
  * this bridge does the same for graft's sink. */
object DatasetBridge {

  /** The sink batch re-wrapped as an ordinary batch DataFrame over the
    * micro-batch's physical rows: safe for any further transformation,
    * executed (once) when an action runs — persist it when several
    * consumers read it. */
  def asBatch(df: DataFrame): DataFrame = {
    val classic = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
    classic.sparkSession.internalCreateDataFrame(
      classic.queryExecution.toRdd, classic.schema, isStreaming = false)
  }
}
