package graft.sources

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong
import scala.jdk.CollectionConverters._

/** In-JVM simulator of a change-tracking-enabled source database — the
  * test double for SQL Server Change Tracking (FIXTURES.md / SURVEY.md §5:
  * the CT polling logic is tested against a simulator, not a live
  * server). One instance models one CT-enabled *database*: named tables,
  * each with a current schema (JSON) and an append-only log of
  * (version, table, op, key, payload) sharing one monotonically
  * increasing change-tracking version (SYS_CHANGE_VERSION).
  */
final class ChangeTrackingStore {
  import ChangeTrackingStore.Change

  private val log = new ConcurrentHashMap[Long, Change]()
  private val version = new AtomicLong(0L)
  private val tableSchemas = new ConcurrentHashMap[String, String]()
  private val failNextReads = new AtomicLong(0L)

  /** Failure injection for retry-path tests: the next `n` reads of
    * currentVersion throw (simulating a connection outage). */
  def failReads(n: Long): Unit = failNextReads.set(n)
  private def maybeFail(): Unit =
    if (failNextReads.getAndUpdate(v => math.max(0, v - 1)) > 0)
      throw new RuntimeException("simulated source outage")

  /** Declare/replace a table's current schema (JSON) — what the per-batch
    * DDL snapshot reads (SRC1a table discovery + SRC1e schema probe). */
  def setSchema(table: String, schemaJson: String): Unit =
    tableSchemas.put(table, schemaJson)

  /** CT-enabled tables and their current schemas. */
  def schemas: Map[String, String] = tableSchemas.asScala.toMap

  /** Record a change; returns its assigned version. */
  def append(table: String, op: String, key: Long, payload: String): Long = {
    val v = version.incrementAndGet()
    log.put(v, Change(v, table, op, key, payload))
    v
  }

  /** Single-table convenience (default table "t"). */
  def append(op: String, key: Long, payload: String): Long =
    append("t", op, key, payload)

  /** The current change-tracking version (CHANGE_TRACKING_CURRENT_VERSION). */
  def currentVersion: Long = { maybeFail(); version.get() }

  /** Changes with version in (prevVersion, curVersion], restricted to the
    * keys hashing to `part` of `nParts` — the per-partition scan of the
    * DSv2 reader (fixes the reference's 1-partition JDBC read,
    * CTInputDStream.java:166-167). */
  def changes(prevVersion: Long, curVersion: Long, part: Int, nParts: Int): Seq[Change] =
    log.values().asScala.iterator
      .filter(c => c.version > prevVersion && c.version <= curVersion &&
        math.floorMod(c.key, nParts.toLong) == part.toLong)
      .toSeq.sortBy(_.version)
}

object ChangeTrackingStore {
  final case class Change(version: Long, table: String, op: String,
                          key: Long, payload: String)

  private val stores = new ConcurrentHashMap[String, ChangeTrackingStore]()
  def get(name: String): ChangeTrackingStore =
    stores.computeIfAbsent(name, _ => new ChangeTrackingStore)
  def drop(name: String): Unit = stores.remove(name)
}
