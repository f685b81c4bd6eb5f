package graft.sources

import java.sql.Connection

/** SRC1's connection tier — the seam a live deployment drops a real
  * driver into (reference common/PluginConnectionFactory.java:43-66
  * builds connections from driver class + url + credentials via a
  * [[java.sql.Driver]] shim, JDBCDriverShim.java:38-81; Spark already
  * owns driver classloading, so here the seam is just "give me a
  * connection").
  *
  * Instances run DRIVER-SIDE only (discovery + catalog probes happen
  * once per stream start, like the reference's metadata I/O) — they do
  * not need to be serializable.
  *
  * The DSv2 option surface is string-typed, so a factory reaches the
  * source by NAME through the registry:
  * {{{
  *   // live deployment — zero graft code changes:
  *   ConnectionFactory.register("prod", () =>
  *     DriverManager.getConnection(url, user, password))
  *   spark.readStream.format(classOf[ChangeFeedProvider].getName)
  *     .option("store", "my-feed")
  *     .option("connectionFactory", "prod").load()
  * }}}
  */
trait ConnectionFactory {
  /** A fresh (or pooled) connection; the caller closes it. */
  def connection(): Connection
}

object ConnectionFactory {
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, ConnectionFactory]()

  /** SAM-friendly registration: `register("name", () => conn)`. */
  def register(name: String, factory: ConnectionFactory): Unit =
    registry.put(name, factory)

  def lookup(name: String): ConnectionFactory = {
    val f = registry.get(name)
    require(f != null,
      s"no ConnectionFactory registered under '$name' — call " +
        "ConnectionFactory.register before starting the stream")
    f
  }

  def drop(name: String): Unit = registry.remove(name)

  /** Run `body` over a factory connection, always closing it — the
    * reference's try-with-resources posture
    * (CTInputDStream.java:184-203). */
  def withConnection[A](factory: ConnectionFactory)(body: Connection => A): A = {
    val conn = factory.connection()
    try body(conn)
    finally
      try conn.close()
      catch { case scala.util.control.NonFatal(_) => () }
  }
}
