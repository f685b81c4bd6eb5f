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

  /** One typed column per field of `rowSchema`, re-typed out of a
    * `map<string,string>` column by cast — the single re-typing rule of
    * the engine, shared by the envelope flatten and the durable store's
    * typed snapshot ([[graft.sinks.ParquetUpsertStore.snapshotTyped]]).
    * A key absent from the map (a row written before a DDL added the
    * column) reads as NULL, exactly like the reference's
    * schema-evolution posture (CDCKudu.java:78-137). */
  def typedColumns(values: Column, rowSchema: StructType): Seq[Column] =
    rowSchema.fields.toSeq.map { f =>
      values.getItem(f.name).cast(f.dataType).as(f.name)
    }

  /** Flatten `envelope` (schema = Schemas.changeRecordType) to the columns
    * of `rowSchema`. `includeCdcColumns` mirrors the reference's
    * appendColumns config (DMLFlattener.java:130-136).
    */
  def flatten(envelope: DataFrame, rowSchema: StructType,
              includeCdcColumns: Boolean = false): DataFrame = {
    val valueCols: Seq[Column] = typedColumns(col("dml.rowsValues"), rowSchema)
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

  /** Flatten with the row schema taken from the stream itself — the
    * reference's mode of operation, where the output schema is parsed
    * from the in-band `rows_schema` JSON (DMLFlattener.java:85,108-125).
    * One driver-side peek at the first DML record resolves the schema;
    * batch-only (a streaming plan can't peek — pass the schema
    * explicitly there, or ship it through [[graft.streaming.StatefulOps
    * .schemaDedup]] state). */
  def flattenInferred(envelope: org.apache.spark.sql.DataFrame,
                      includeCdcColumns: Boolean = false): org.apache.spark.sql.DataFrame = {
    require(!envelope.isStreaming,
      "flattenInferred is batch-only (schema inference peeks at the data); " +
        "pass the schema explicitly to flatten() for streaming plans")
    val json = envelope.filter(col("dml").isNotNull)
      .select(col("dml.rowsSchemaJson")).take(1).headOption
      .getOrElse(throw new IllegalArgumentException(
        "envelope contains no DML records; pass the schema explicitly"))
      .getString(0)
    val schema = org.apache.spark.sql.types.DataType.fromJson(json)
      .asInstanceOf[StructType]
    flatten(envelope, schema, includeCdcColumns)
  }
}
