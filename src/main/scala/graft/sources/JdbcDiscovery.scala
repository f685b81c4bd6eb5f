package graft.sources

import java.sql.ResultSet

/** SRC1a — change-tracking table discovery over the JDBC catalog views,
  * replicating the reference's queries against a SQL Server
  * (CTInputDStream.java:222-241 `sys.change_tracking_tables ⋈ sys.tables
  * ⋈ sys.schemas`, :206-220 `INFORMATION_SCHEMA.KEY_COLUMN_USAGE` with
  * the IsPrimaryKey constraint filter, :184-203 `SELECT TOP 1 *` column
  * probe).
  *
  * Connection management is the caller's: discovery consumes the three
  * catalog ResultSets (live JDBC or [[JdbcFixture]] — same interfaces),
  * so the tier is testable offline and driver-agnostic. Runs driver-side
  * once per stream start, like the reference — the catalog is a handful
  * of rows, never data-scaled. */
object JdbcDiscovery {

  /** One CT-enabled table (reference TableInformation.java:29-41:
    * valueColumns = columns − primaryKeys, set-subtracted in column
    * order). */
  final case class TableInformation(schemaName: String, name: String,
                                    columns: Seq[String], primaryKeys: Seq[String]) {
    val valueColumnNames: Seq[String] = columns.filterNot(primaryKeys.contains)
    def qualifiedName: String = s"$schemaName.$name"
  }

  /** Whitelist semantics of the reference (CTInputDStream.java:226-230):
    * empty = every CT-enabled table. */
  def discoverTables(
      ctEnabledTables: ResultSet, // rows: (schema_name, table_name)
      columnsOf: (String, String) => ResultSet, // column probe (metadata used)
      keyColumnsOf: (String, String) => ResultSet, // rows: (COLUMN_NAME)
      tableWhitelist: Set[String] = Set.empty): Seq[TableInformation] = {
    val out = Seq.newBuilder[TableInformation]
    while (ctEnabledTables.next()) {
      val schemaName = ctEnabledTables.getString("schema_name")
      val tableName = ctEnabledTables.getString("table_name")
      if (tableWhitelist.isEmpty || tableWhitelist.contains(tableName)) {
        val md = columnsOf(schemaName, tableName).getMetaData
        val columns = (1 to md.getColumnCount).map(md.getColumnName)
        val keys = Seq.newBuilder[String]
        val krs = keyColumnsOf(schemaName, tableName)
        while (krs.next()) keys += krs.getString(1)
        out += TableInformation(schemaName, tableName, columns, keys.result())
      }
    }
    out.result()
  }

  /** Discovery driven by the [[CtSql]] composition tier: composes the
    * reference's exact catalog statements and runs them through the
    * caller's statement executors — a live deployment passes
    * `conn.createStatement().executeQuery` (and a PreparedStatement
    * binder for the key query's two parameters); offline specs pass a
    * fixture dispatcher keyed on the SQL text, which pins the composed
    * strings end-to-end (reference CTInputDStream.java:226-243 discovery,
    * :195-207 column probe, :209-224 PK probe).
    *
    * @param run      executes a parameterless statement
    * @param runBound executes a statement with positional string binds
    */
  def discoverVia(run: String => ResultSet,
                  runBound: (String, Seq[String]) => ResultSet,
                  tableWhitelist: Set[String] = Set.empty): Seq[TableInformation] =
    discoverTables(
      ctEnabledTables = run(CtSql.ctEnabledTablesSql),
      columnsOf = (s, t) => run(CtSql.columnProbeSql(s, t)),
      keyColumnsOf = (s, t) => runBound(CtSql.keyColumnsSql, Seq(s, t)),
      tableWhitelist = tableWhitelist)

  /** Discovery → the per-batch DDL snapshot a [[ChangeTrackingStore]]
    * carries (SRC1a feeding SRC1e): table name → row StructType JSON,
    * typed through the [[JdbcTypes]] tier. */
  def schemaSnapshot(
      tables: Seq[TableInformation],
      columnsOf: (String, String) => ResultSet): Map[String, String] =
    tables.map { t =>
      t.qualifiedName ->
        JdbcTypes.schemaFor(columnsOf(t.schemaName, t.name).getMetaData).json
    }.toMap

  private def statementRunners(conn: java.sql.Connection)
      : (String => ResultSet, (String, Seq[String]) => ResultSet) = (
    sql => conn.createStatement().executeQuery(sql),
    (sql, binds) => {
      val ps = conn.prepareStatement(sql)
      binds.zipWithIndex.foreach { case (v, i) => ps.setString(i + 1, v) }
      ps.executeQuery()
    })

  /** [[discoverVia]] through the [[ConnectionFactory]] seam: opens one
    * connection, runs the three catalog probes through real
    * `createStatement`/`prepareStatement` calls, closes it (reference
    * PluginConnectionFactory.java:43-66 supplies the connection,
    * CTInputDStream.java:184-241 consumes it exactly this way). A live
    * deployment registers a driver-backed factory; specs register
    * [[JdbcFixture.connection]]. */
  def discoverVia(factory: ConnectionFactory): Seq[TableInformation] =
    discoverVia(factory, Set.empty[String])

  def discoverVia(factory: ConnectionFactory,
                  tableWhitelist: Set[String]): Seq[TableInformation] =
    ConnectionFactory.withConnection(factory) { conn =>
      val (run, runBound) = statementRunners(conn)
      discoverVia(run, runBound, tableWhitelist)
    }

  /** [[schemaSnapshot]] through the factory seam (column probes are
    * plain statements — CtSql.columnProbeSql). */
  def schemaSnapshotVia(factory: ConnectionFactory,
                        tables: Seq[TableInformation]): Map[String, String] =
    ConnectionFactory.withConnection(factory) { conn =>
      val (run, _) = statementRunners(conn)
      schemaSnapshot(tables, (s, t) => run(CtSql.columnProbeSql(s, t)))
    }
}
