package graft

import graft.model.OpType
import graft.sources.JdbcDiscovery.TableInformation
import graft.sources.{CtSql, JdbcFixture, JdbcTypes}
import org.scalatest.funsuite.AnyFunSuite

import java.sql.{Timestamp, Types}

/** The change-tracking SQL composition tier asserted against the
  * reference's exact statement shapes (CTInputDStream.java:148-169 change
  * scan, :171-243 probes/discovery), then driven end-to-end: a fixture
  * ResultSet laid out exactly as the composed scan returns decodes
  * through [[JdbcTypes.changeRecords]] into envelope records. */
class CtSqlSpec extends AnyFunSuite {

  private val orders = TableInformation("dbo", "orders",
    columns = Seq("id", "name", "ts"), primaryKeys = Seq("id"))

  test("changesSql composes the reference's exact scan statement") {
    val expected =
      "SELECT [CT].[SYS_CHANGE_VERSION] as CHANGE_TRACKING_VERSION, " +
        "[CT].[SYS_CHANGE_CREATION_VERSION], " +
        "[CT].[SYS_CHANGE_OPERATION], " +
        "CURRENT_TIMESTAMP as CDC_CURRENT_TIMESTAMP, " +
        "[CT].[id], [CI].[name], [CI].[ts] " +
        "FROM [orders] (nolock) as [CI] " +
        "RIGHT OUTER JOIN CHANGETABLE (CHANGES [orders], 41) as [CT] " +
        "on [CT].[id] = [CI].[id] " +
        "where [CT].[SYS_CHANGE_VERSION] > ? and [CT].[SYS_CHANGE_VERSION] <= ? " +
        "ORDER BY [CT].[SYS_CHANGE_VERSION]"
    assert(CtSql.changesSql(orders, prev = 41L) == expected)
  }

  test("composite PKs expand in both the projection and the join condition") {
    val t = TableInformation("dbo", "li",
      columns = Seq("ok", "ln", "qty"), primaryKeys = Seq("ok", "ln"))
    val sql = CtSql.changesSql(t, prev = 0L)
    assert(sql.contains("[CT].[ok], [CT].[ln], [CI].[qty]"))
    assert(sql.contains("on [CT].[ok] = [CI].[ok] AND [CT].[ln] = [CI].[ln]"))
  }

  test("identifier bracket-escaping survives a hostile catalog name") {
    assert(CtSql.bracket("we]ird") == "[we]]ird]")
    val t = TableInformation("dbo", "t]x", Seq("id", "v"), Seq("id"))
    assert(CtSql.changesSql(t, 0L).contains("FROM [t]]x] (nolock)"))
  }

  test("probe and discovery statements match the reference shapes") {
    assert(CtSql.currentVersionSql == "SELECT CHANGE_TRACKING_CURRENT_VERSION()")
    assert(CtSql.ddlProbeSql("dbo", "orders") ==
      "SELECT TOP 1 * FROM [dbo].[orders](nolock) where ?=?")
    assert(CtSql.columnProbeSql("dbo", "orders") ==
      "SELECT TOP 1 * from [dbo].[orders](nolock)")
    assert(CtSql.keyColumnsSql.contains("INFORMATION_SCHEMA.KEY_COLUMN_USAGE"))
    assert(CtSql.keyColumnsSql.contains("'IsPrimaryKey') = 1"))
    assert(CtSql.ctEnabledTablesSql.startsWith(
      "SELECT s.name as schema_name, t.name AS table_name, ctt.* FROM sys.change_tracking_tables ctt"))
  }

  test("discoverVia drives discovery through the composed catalog statements") {
    import graft.sources.JdbcDiscovery
    val seen = scala.collection.mutable.ListBuffer.empty[String]
    val catalogCols = Seq(
      JdbcFixture.Col("schema_name", "varchar", Types.VARCHAR),
      JdbcFixture.Col("table_name", "varchar", Types.VARCHAR))
    val run: String => java.sql.ResultSet = { sql =>
      seen += sql
      if (sql == CtSql.ctEnabledTablesSql)
        JdbcFixture.resultSet(catalogCols, Seq(Seq("dbo", "orders")))
      else if (sql == CtSql.columnProbeSql("dbo", "orders"))
        JdbcFixture.resultSet(Seq(
          JdbcFixture.Col("id", "int", Types.INTEGER),
          JdbcFixture.Col("name", "varchar", Types.VARCHAR)), Nil)
      else fail(s"unexpected statement: $sql")
    }
    val runBound: (String, Seq[String]) => java.sql.ResultSet = { (sql, binds) =>
      seen += sql
      assert(sql == CtSql.keyColumnsSql && binds == Seq("dbo", "orders"))
      JdbcFixture.resultSet(
        Seq(JdbcFixture.Col("COLUMN_NAME", "varchar", Types.VARCHAR)),
        Seq(Seq("id")))
    }
    val tables = JdbcDiscovery.discoverVia(run, runBound)
    assert(tables == Seq(TableInformation("dbo", "orders", Seq("id", "name"), Seq("id"))))
    assert(tables.head.valueColumnNames == Seq("name"))
    assert(seen.toList == List(CtSql.ctEnabledTablesSql,
      CtSql.columnProbeSql("dbo", "orders"), CtSql.keyColumnsSql))
  }

  test("a result set with the composed scan's layout decodes to envelope records") {
    // Column layout is exactly what changesSql SELECTs: the 4 CT
    // bookkeeping columns, then PKs, then value columns.
    val cols = Seq(
      JdbcFixture.Col("CHANGE_TRACKING_VERSION", "bigint", Types.BIGINT),
      JdbcFixture.Col("SYS_CHANGE_CREATION_VERSION", "bigint", Types.BIGINT),
      JdbcFixture.Col("SYS_CHANGE_OPERATION", "char", Types.CHAR),
      JdbcFixture.Col("CDC_CURRENT_TIMESTAMP", "datetime", Types.TIMESTAMP),
      JdbcFixture.Col("id", "int", Types.INTEGER),
      JdbcFixture.Col("name", "varchar", Types.VARCHAR),
      JdbcFixture.Col("ts", "datetime", Types.TIMESTAMP))
    val t0 = Timestamp.valueOf("2024-01-02 03:04:05")
    val rs = JdbcFixture.resultSet(cols, Seq(
      Seq(Long.box(42L), Long.box(42L), "I", t0, Int.box(7), "alpha", t0),
      Seq(Long.box(43L), Long.box(43L), "U", t0, Int.box(7), "beta", t0),
      Seq(Long.box(44L), Long.box(44L), "D", t0, Int.box(7), null, null)))
    val recs = JdbcTypes.changeRecords(rs, "dbo", "orders", Seq("id"))
    assert(recs.map(_.dml.get.opType) == Seq(OpType.Insert, OpType.Update, OpType.Delete))
    assert(recs.map(_.dml.get.changeTrackingVersion) == Seq("42", "43", "44"))
    assert(recs.head.dml.get.rowsValues == Map(
      "id" -> "7", "name" -> "alpha", "ts" -> t0.toString))
    assert(recs.last.dml.get.rowsValues("name") == null)
    assert(recs.forall(_.dml.get.table == "dbo.orders"))
    assert(recs.forall(_.dml.get.cdcCurrentTimestampMicros == t0.getTime * 1000))
  }
}
