package graft.model

import org.apache.spark.sql.types._

/** The universal change-record envelope, re-expressed as Spark types.
  *
  * Mirrors the reference's envelope semantics (reference:
  * src/main/java/io/cdap/plugin/cdc/common/Schemas.java:50-71): every
  * record flowing through a CDC pipeline is either a DDL event (a table's
  * new schema, serialized as JSON *data*) or a DML event (one row change).
  * Exactly one of `ddl`/`dml` is non-null — enforced by the smart
  * constructors in [[ChangeRecord]] (reference Schemas.java:73-85).
  *
  * Design choice (SURVEY.md §7.3): `rowsValues` is a `Map[String, String]`
  * plus the row schema JSON, matching how the reference transports values
  * through a union-of-simple-types map and re-types them at flatten/sink
  * time. Typed extraction happens in [[graft.operators.DmlFlattener]].
  */
final case class Ddl(table: String, schemaJson: String)

final case class Dml(
    opType: String, // INSERT | UPDATE | DELETE (reference OperationType.java:22-36)
    table: String,
    primaryKeys: Seq[String],
    rowsSchemaJson: String,
    rowsValues: Map[String, String],
    changeTrackingVersion: String,
    cdcCurrentTimestampMicros: Long)

final case class ChangeRecord(ddl: Option[Ddl], dml: Option[Dml]) {
  require(ddl.isDefined ^ dml.isDefined,
    "exactly one of ddl/dml must be set (envelope invariant)")
}

object ChangeRecord {
  def ofDdl(d: Ddl): ChangeRecord = ChangeRecord(Some(d), None)
  def ofDml(d: Dml): ChangeRecord = ChangeRecord(None, Some(d))
}

object OpType {
  val Insert = "INSERT"
  val Update = "UPDATE"
  val Delete = "DELETE"
  val all: Set[String] = Set(Insert, Update, Delete)

  /** Parse long or short (I/U/D) op names, case-insensitively
    * (reference OperationType.java:25-36). */
  def parse(s: String): String = s.trim.toUpperCase match {
    case "I" | "INSERT" => Insert
    case "U" | "UPDATE" => Update
    case "D" | "DELETE" => Delete
    case other => throw new IllegalArgumentException(s"unknown op type: $other")
  }
}

/** StructType forms of the envelope, for DataFrame-level (untyped)
  * pipelines and for DSv2 sources that must declare a schema up front. */
object Schemas {
  val ddlType: StructType = StructType(Seq(
    StructField("table", StringType, nullable = false),
    StructField("schemaJson", StringType, nullable = false)))

  val dmlType: StructType = StructType(Seq(
    StructField("opType", StringType, nullable = false),
    StructField("table", StringType, nullable = false),
    StructField("primaryKeys", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("rowsSchemaJson", StringType, nullable = false),
    StructField("rowsValues", MapType(StringType, StringType, valueContainsNull = true), nullable = false),
    StructField("changeTrackingVersion", StringType, nullable = false),
    StructField("cdcCurrentTimestampMicros", LongType, nullable = false)))

  /** changeRecord { ddl, dml } — both nullable, exactly one set. */
  val changeRecordType: StructType = StructType(Seq(
    StructField("ddl", ddlType, nullable = true),
    StructField("dml", dmlType, nullable = true)))

  /** Split a namespaced "ns.table" name (reference Schemas.java:87-89). */
  def splitTableName(namespaced: String): (String, String) =
    namespaced.split("\\.", 2) match {
      case Array(ns, t) => (ns, t)
      case Array(t)     => ("default", t)
    }
}
