package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Unwraps the change-record envelope into a plain, typed DataFrame.
  *
  * Spark-first re-expression of the reference's DMLFlattener transform
  * (reference: src/main/java/io/cdap/plugin/cdc/DMLFlattener.java:79-125):
  * drop DDL records, project `dml.rowsValues[col]` for every column of the
  * declared output schema with a cast to its type, and optionally append
  * the CDC bookkeeping columns. Where the reference walks each record with
  * a per-worker schema cache, this emits one declarative `select` so the
  * whole flatten stays inside WholeStageCodegen and Catalyst can prune the
  * map accesses that downstream operators don't use.
  */
object DmlFlattener {

  val OpTypeCol = "CDC_OP_TYPE"
  val VersionCol = "CHANGE_TRACKING_VERSION"
  val TimestampCol = "CDC_CURRENT_TIMESTAMP"

  /** Flatten `envelope` (schema = Schemas.changeRecordType) to the columns
    * of `rowSchema`. `includeCdcColumns` mirrors the reference's
    * appendColumns config (DMLFlattener.java:130-136).
    */
  def flatten(envelope: DataFrame, rowSchema: StructType,
              includeCdcColumns: Boolean = false): DataFrame = {
    val valueCols: Seq[Column] = rowSchema.fields.toSeq.map { f =>
      col("dml.rowsValues").getItem(f.name).cast(f.dataType).as(f.name)
    }
    val cdcCols: Seq[Column] =
      if (!includeCdcColumns) Nil
      else Seq(
        col("dml.opType").as(OpTypeCol),
        col("dml.changeTrackingVersion").as(VersionCol),
        col("dml.cdcCurrentTimestampMicros").as(TimestampCol))
    envelope
      .filter(col("dml").isNotNull) // DDL records are dropped (DMLFlattener.java:81-83)
      .select(valueCols ++ cdcCols: _*)
  }
}
