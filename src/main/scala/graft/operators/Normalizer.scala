package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Op-semantics normalization — Spark-first re-expression of the
  * reference's GoldenGate normalizer (reference:
  * src/main/java/io/cdap/plugin/cdc/source/oracle/Normalizer.java:59-221).
  *
  * The reference walks each record imperatively; here every rule is a
  * column expression or an `explode` over a conditionally-built array, so
  * the whole normalization stays inside whole-stage codegen and is a 1→0..2
  * row flatMap in Catalyst's terms — no UDFs, no driver involvement.
  */
object Normalizer {

  /** Before/after image merge for one column: take the after-image value
    * unless its `isMissing` flag is set, else fall back to the before
    * image (reference Normalizer.java:163-191). */
  def mergeImage(before: Column, after: Column, isMissing: Column): Column =
    when(isMissing, before).otherwise(after)

  /** PK-change split: an UPDATE whose primary key changed becomes
    * DELETE(before-image) + INSERT(after-image); all other changes pass
    * through unchanged (reference Normalizer.java:166-221). Implemented as
    * explode of a conditionally-sized array — Spark's native 1→N shape.
    *
    * @param df       input rows
    * @param pkChanged predicate marking rows whose PK changed
    * @param asDelete row image to emit as the DELETE (before image),
    *                 a struct column including an op field
    * @param asInsert row image to emit as the INSERT (after image)
    * @param asIs     row image for the unchanged-PK case
    */
  def pkChangeSplit(df: DataFrame, pkChanged: Column,
                    asDelete: Column, asInsert: Column,
                    asIs: Column): DataFrame =
    df.select(explode(
        when(pkChanged, array(asDelete, asInsert)).otherwise(array(asIs))
      ).as("r"))
      .select(col("r.*"))

  /** DDL normalization: strip `*_isMissing` bookkeeping fields from a
    * schema (reference Normalizer.java:106-121). */
  def stripMissingFlags(schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(
      schema.fields.filterNot(_.name.endsWith("_isMissing")))
}
