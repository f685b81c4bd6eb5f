package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Emit-on-change dedup — the reference's ST1 stateful operator
  * (reference: src/main/java/io/cdap/plugin/cdc/source/sqlserver/
  * CTSQLServer.java:170-201): a DDL record passes through only when its
  * schema differs from the last one seen for that table.
  *
  * Batch form here (lag-window over an explicit order); the streaming
  * form with true cross-batch state lives in
  * [[graft.streaming.StatefulOps.schemaDedup]].
  */
object SchemaDedup {

  /** Keep rows whose `value` differs from the previous row's value within
    * `key`, ordered by `ord` (first row per key always passes). One
    * shuffle on `key`; no state beyond the window sort. */
  def emitOnChange(df: DataFrame, key: Column, ord: Column, value: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ord)
    df.withColumn("__prev", lag(value, 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= value)
      .drop("__prev")
  }
}
