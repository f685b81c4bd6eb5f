package graft.streaming

import graft.model.Schemas
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Assembles the change-feed source's raw rows into the universal
  * changeRecord envelope — the glue between [[graft.sources
  * .ChangeFeedSource]] (kind/table/version/op/key/payload/schemaJson
  * rows) and everything downstream (flattener, schema dedup, upsert
  * sink). Pure column expressions; runs identically in batch and
  * streaming plans.
  */
object CtPipeline {

  def toEnvelope(feed: DataFrame, primaryKeys: Seq[String] = Seq("key")): DataFrame =
    feed.select(
      when(col("kind") === "ddl",
        struct(col("table").as("table"), col("schemaJson").as("schemaJson")))
        .otherwise(lit(null).cast(Schemas.ddlType)).as("ddl"),
      when(col("kind") === "dml",
        struct(
          col("op").as("opType"),
          col("table").as("table"),
          array(primaryKeys.map(lit): _*).as("primaryKeys"),
          coalesce(col("schemaJson"), lit("")).as("rowsSchemaJson"),
          map_from_arrays(
            array(lit("key"), lit("payload"), lit("version")),
            array(col("key").cast("string"), col("payload"),
              col("version").cast("string"))).as("rowsValues"),
          col("version").cast("string").as("changeTrackingVersion"),
          (col("version") * 1000L).as("cdcCurrentTimestampMicros")))
        .otherwise(lit(null).cast(Schemas.dmlType)).as("dml"))
}
