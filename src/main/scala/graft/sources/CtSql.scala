package graft.sources

import graft.sources.JdbcDiscovery.TableInformation

/** The change-tracking SQL composition tier: every statement the
  * reference sends to SQL Server, composed to the same shape
  * (source/sqlserver/CTInputDStream.java). A live-JDBC deployment pushes
  * these strings down; offline, the fixture-driven specs assert the
  * composed text and decode a change-scan ResultSet of this exact column
  * layout through [[JdbcTypes]] — so the only untested piece is the
  * network.
  *
  * Identifiers are bracket-quoted with `]]` escaping (SQL Server quoting
  * rule) — the reference interpolates raw catalog names
  * (CTInputDStream.java:148-169); quoting is the one deliberate
  * hardening, and it leaves ordinary names byte-identical.
  */
object CtSql {

  /** `[name]` with SQL Server's `]` → `]]` identifier escaping. */
  def bracket(ident: String): String = "[" + ident.replace("]", "]]") + "]"

  /** `[alias].[c1], [alias].[c2], …` (reference
    * CTInputDStream.java:252-256 getSelectColumns). */
  def selectColumns(alias: String, cols: Seq[String]): String =
    cols.map(c => s"${bracket(alias)}.${bracket(c)}").mkString(", ")

  /** `[CT].[k1] = [CI].[k1] AND …` (reference CTInputDStream.java:246-250
    * getJoinCondition). */
  def joinCondition(primaryKeys: Seq[String]): String =
    primaryKeys.map(k => s"[CT].${bracket(k)} = [CI].${bracket(k)}").mkString(" AND ")

  /** The change scan (reference CTInputDStream.java:148-163): CT
    * bookkeeping columns, PKs from the change table, value columns from
    * the base table via RIGHT OUTER JOIN (so deletes — which have no base
    * row — still surface), `CHANGETABLE(CHANGES [t], prev)` anchored at
    * the last-committed version, a `(?, ?]` version window for the
    * prepared statement's bounds, ordered by SYS_CHANGE_VERSION. The
    * reference leaves the scan unqualified by schema (it resolves against
    * the connection's default schema) — replicated as-is for fidelity. */
  def changesSql(table: TableInformation, prev: Long): String =
    s"SELECT [CT].[SYS_CHANGE_VERSION] as CHANGE_TRACKING_VERSION, " +
      s"[CT].[SYS_CHANGE_CREATION_VERSION], " +
      s"[CT].[SYS_CHANGE_OPERATION], " +
      s"CURRENT_TIMESTAMP as CDC_CURRENT_TIMESTAMP, " +
      s"${selectColumns("CT", table.primaryKeys)}, " +
      s"${selectColumns("CI", table.valueColumnNames)} " +
      s"FROM ${bracket(table.name)} (nolock) as [CI] " +
      s"RIGHT OUTER JOIN CHANGETABLE (CHANGES ${bracket(table.name)}, $prev) as [CT] " +
      s"on ${joinCondition(table.primaryKeys)} " +
      s"where [CT].[SYS_CHANGE_VERSION] > ? and [CT].[SYS_CHANGE_VERSION] <= ? " +
      s"ORDER BY [CT].[SYS_CHANGE_VERSION]"

  /** Database-global version probe (reference CTInputDStream.java:171-179). */
  val currentVersionSql: String = "SELECT CHANGE_TRACKING_CURRENT_VERSION()"

  /** Column probe for the per-batch DDL record — `?=?` makes it a
    * zero-row metadata-only statement for JdbcRDD's bound parameters
    * (reference CTInputDStream.java:182-188). */
  def ddlProbeSql(schemaName: String, tableName: String): String =
    s"SELECT TOP 1 * FROM ${bracket(schemaName)}.${bracket(tableName)}(nolock) where ?=?"

  /** Column probe for discovery metadata (reference
    * CTInputDStream.java:195-207, statement.setMaxRows(1)). */
  def columnProbeSql(schemaName: String, tableName: String): String =
    s"SELECT TOP 1 * from ${bracket(schemaName)}.${bracket(tableName)}(nolock)"

  /** PK discovery over INFORMATION_SCHEMA with the IsPrimaryKey
    * constraint filter; schema and table ride as bind parameters
    * (reference CTInputDStream.java:209-224). */
  val keyColumnsSql: String =
    "SELECT COLUMN_NAME FROM INFORMATION_SCHEMA.KEY_COLUMN_USAGE WHERE " +
      "OBJECTPROPERTY(OBJECT_ID(CONSTRAINT_SCHEMA+'.'+CONSTRAINT_NAME), 'IsPrimaryKey') = 1 AND " +
      "TABLE_SCHEMA = ? AND TABLE_NAME = ?"

  /** CT-enabled table discovery (reference CTInputDStream.java:226-243). */
  val ctEnabledTablesSql: String =
    "SELECT s.name as schema_name, t.name AS table_name, ctt.* FROM sys.change_tracking_tables ctt " +
      "INNER JOIN sys.tables t on t.object_id = ctt.object_id INNER JOIN sys.schemas s on s.schema_id = t.schema_id"
}
