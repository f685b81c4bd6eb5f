package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Wraps plain rows into the change-record envelope — the Spark-native
  * equivalent of the reference's record construction path
  * (reference: src/main/java/io/cdap/plugin/cdc/source/sqlserver/
  * ResultSetToDMLRecord.java:56-94 and common/Schemas.java:73-85).
  *
  * Values travel as `map<string,string>` plus the row-schema JSON, exactly
  * the dynamic in-band-schema regime of the reference (SURVEY.md §1.1);
  * [[DmlFlattener]] re-types them on the way out. Everything here is
  * `functions._` composition — no UDFs — so envelope wrap/unwrap stays in
  * codegen and survives column pruning.
  */
object ChangeFeed {

  /** Build an envelope DataFrame from `rows`.
    *
    * @param table       namespaced table name carried in the envelope
    * @param primaryKeys PK column names (metadata in each DML record)
    * @param opType      column producing INSERT/UPDATE/DELETE per row
    * @param version     column producing the monotonically increasing
    *                    change-tracking version (stringified, as in the
    *                    reference's SYS_CHANGE_VERSION handling)
    * @param tsMicros    column producing epoch-micros for
    *                    cdc_current_timestamp
    */
  def wrapDml(rows: DataFrame, table: String, primaryKeys: Seq[String],
              opType: Column, version: Column, tsMicros: Column): DataFrame = {
    val schema: StructType = rows.schema
    val names = schema.fieldNames.toSeq
    val valuesMap = map_from_arrays(
      array(names.map(lit): _*),
      array(names.map(n => col(n).cast("string")): _*))
    rows.select(
      lit(null).cast(graft.model.Schemas.ddlType).as("ddl"),
      struct(
        opType.cast("string").as("opType"),
        lit(table).as("table"),
        array(primaryKeys.map(lit): _*).as("primaryKeys"),
        lit(schema.json).as("rowsSchemaJson"),
        valuesMap.as("rowsValues"),
        version.cast("string").as("changeTrackingVersion"),
        tsMicros.cast("long").as("cdcCurrentTimestampMicros")
      ).as("dml"))
  }

  /** One DDL record for `table` with the given schema — the per-batch
    * schema snapshot the CT source emits ahead of DML
    * (reference ResultSetToDDLRecord.java:44-50). */
  def wrapDdl(spark: org.apache.spark.sql.SparkSession, table: String,
              schema: StructType): DataFrame = {
    import spark.implicits._
    Seq((table, schema.json)).toDF("table", "schemaJson").select(
      struct(col("table"), col("schemaJson")).as("ddl"),
      lit(null).cast(graft.model.Schemas.dmlType).as("dml"))
  }

  /** Union DDL records ahead of DML records — the reference's
    * DDL-before-DML batch ordering contract (CTInputDStream.java:124-133),
    * made explicit with an `order` tag instead of relying on union
    * partition order (SURVEY.md §7.3 hard part 2).
    *
    * Streaming plans forbid Sort, so there the tag is dropped and the
    * union is left unordered — safe because every sink in this engine
    * phase-splits each micro-batch itself (DDL first, then DML:
    * [[graft.sinks.UpsertSink.applyBatch]]), rather than relying on row
    * iteration order the way the reference's row-at-a-time sinks do. */
  def unionDdlFirst(ddl: DataFrame, dml: DataFrame): DataFrame = {
    val tagged = ddl.withColumn("__order", lit(0))
      .unionByName(dml.withColumn("__order", lit(1)))
    (if (tagged.isStreaming) tagged else tagged.sortWithinPartitions("__order"))
      .drop("__order")
  }
}
