package graft.sources

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{ResultSet, ResultSetMetaData}

/** Offline stand-in for a live JDBC connection: builds real
  * `java.sql.ResultSet` / `ResultSetMetaData` instances over in-memory
  * rows, so the [[JdbcTypes]] tier is exercised through the exact
  * interfaces a driver would hand it (the environment has no database or
  * driver jar — same role as the CT simulator in
  * [[ChangeTrackingStore]]). Only the accessors the decode path uses are
  * implemented; anything else throws, which is a feature: it fails loudly
  * if the tier grows a dependency the fixture doesn't model. */
object JdbcFixture {

  /** One column's JDBC-visible metadata. */
  final case class Col(name: String, typeName: String, sqlType: Int,
                       precision: Int = 0, scale: Int = 0,
                       nullable: Boolean = true)

  def metaData(cols: Seq[Col]): ResultSetMetaData =
    proxy[ResultSetMetaData] { (m, args) =>
      def col = cols(args(0).asInstanceOf[Int] - 1)
      m match {
        case "getColumnCount" => Int.box(cols.size)
        case "getColumnName" | "getColumnLabel" => col.name
        case "getColumnType" => Int.box(col.sqlType)
        case "getColumnTypeName" => col.typeName
        case "getPrecision" => Int.box(col.precision)
        case "getScale" => Int.box(col.scale)
        case "isNullable" => Int.box(
          if (col.nullable) ResultSetMetaData.columnNullable
          else ResultSetMetaData.columnNoNulls)
        case other => throw new UnsupportedOperationException(
          s"JdbcFixture metadata does not model $other")
      }
    }

  /** A forward-only ResultSet over `rows` (each row positional, aligned
    * with `cols`). */
  def resultSet(cols: Seq[Col], rows: Seq[Seq[Any]]): ResultSet = {
    val md = metaData(cols)
    val byName = cols.map(_.name).zipWithIndex.toMap
    var cursor = -1
    def cell(args: Array[AnyRef]): Any = args(0) match {
      case i: Integer => rows(cursor)(i - 1)
      case name: String => rows(cursor)(byName.getOrElse(name,
        throw new java.sql.SQLException(s"no such column: $name")))
      case other => throw new java.sql.SQLException(s"bad column ref: $other")
    }
    proxy[ResultSet] { (m, args) =>
      m match {
        case "next" => cursor += 1; Boolean.box(cursor < rows.size)
        case "getMetaData" => md
        case "getObject" => cell(args).asInstanceOf[AnyRef]
        case "getString" => Option(cell(args)).map(_.toString).orNull
        case "getDate" => cell(args).asInstanceOf[java.sql.Date]
        case "getTime" => cell(args).asInstanceOf[java.sql.Time]
        case "getTimestamp" => cell(args).asInstanceOf[java.sql.Timestamp]
        case "close" | "clearWarnings" => null
        case "isClosed" => Boolean.box(false)
        case "toString" => s"JdbcFixture.resultSet(${cols.size} cols, ${rows.size} rows)"
        case other => throw new UnsupportedOperationException(
          s"JdbcFixture result set does not model $other")
      }
    }
  }

  /** A `java.sql.Connection` over SQL-text dispatchers — the offline
    * instance behind the [[ConnectionFactory]] seam: plain statements
    * route their SQL through `run`, prepared statements collect
    * positional string binds and route through `runBound` — exactly the
    * two shapes [[JdbcDiscovery]]'s catalog probes use, so the factory
    * path exercises the same `createStatement`/`prepareStatement` calls
    * a live driver would see. */
  def connection(run: String => ResultSet,
                 runBound: (String, Seq[String]) => ResultSet): java.sql.Connection = {
    @volatile var closed = false
    proxy[java.sql.Connection] { (m, args) =>
      m match {
        case "createStatement" =>
          proxy[java.sql.Statement] { (sm, sargs) =>
            sm match {
              case "executeQuery" => run(sargs(0).asInstanceOf[String])
              case "close" | "clearWarnings" => null
              case "isClosed" => Boolean.box(false)
              case other => throw new UnsupportedOperationException(
                s"JdbcFixture statement does not model $other")
            }
          }
        case "prepareStatement" =>
          val sql = args(0).asInstanceOf[String]
          val binds = scala.collection.mutable.Map.empty[Int, String]
          proxy[java.sql.PreparedStatement] { (pm, pargs) =>
            pm match {
              case "setString" =>
                binds(pargs(0).asInstanceOf[Integer].intValue) =
                  pargs(1).asInstanceOf[String]
                null
              case "executeQuery" =>
                val n = if (binds.isEmpty) 0 else binds.keys.max
                runBound(sql, (1 to n).map(i => binds.getOrElse(i, null)))
              case "close" | "clearWarnings" => null
              case "isClosed" => Boolean.box(false)
              case other => throw new UnsupportedOperationException(
                s"JdbcFixture prepared statement does not model $other")
            }
          }
        case "close" => closed = true; null
        case "isClosed" => Boolean.box(closed)
        case "toString" => "JdbcFixture.connection"
        case other => throw new UnsupportedOperationException(
          s"JdbcFixture connection does not model $other")
      }
    }
  }

  private def proxy[T](handler: (String, Array[AnyRef]) => AnyRef)
                      (implicit ct: scala.reflect.ClassTag[T]): T = {
    val clazz = ct.runtimeClass
    Proxy.newProxyInstance(clazz.getClassLoader, Array(clazz),
      new InvocationHandler {
        override def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef =
          handler(m.getName, if (args == null) Array.empty else args)
      }).asInstanceOf[T]
  }
}
