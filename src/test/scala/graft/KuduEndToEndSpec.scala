package graft

import graft.sinks._
import graft.sources.{ChangeFeedProvider, ChangeTrackingStore}
import graft.streaming.CtPipeline
import org.apache.spark.sql.types._

/** EndToEndCdcSpec's 3-table scenario against the Kudu SPI: the same CT
  * simulator feed (INSERT → UPDATE → mid-stream DDL + DELETE → post-DDL
  * INSERT legs) drives a [[KuduShapedWriter]] registered in
  * [[CdcWriters]], exactly how HBaseShapedWriterSpec streams into its
  * cluster — so the one remaining Kudu unknown is the live client jar,
  * not the streaming-registry plumbing. Asserted behaviors are the
  * reference sink's (CDCKudu.java:78-137,354-376): create on first DML
  * with PK-first order + hash partitions, nullable adds + session flush
  * on mid-stream DDL, key-only deletes, and — the byte tier — every
  * surviving row's typed cells recomputed independently through
  * [[KuduCells]] must equal what the client SPI received. */
class KuduEndToEndSpec extends SparkSuite {

  private val s1 = StructType(Seq(
    StructField("key", LongType), StructField("payload", StringType)))
  private val s2 = StructType(s1.fields :+ StructField("extra", StringType))
  private val tables = Seq("dbo.orders", "dbo.items", "dbo.users")

  test("3-table CT feed with mid-stream DDL drives the Kudu SPI end to end") {
    val feed = "kudu-e2e-feed"
    ChangeTrackingStore.drop(feed)
    val ct = ChangeTrackingStore.get(feed)
    tables.foreach(t => ct.setSchema(t, s1.json))
    for (t <- tables; k <- 1L to 50L) ct.append(t, "INSERT", k, s"$t-v$k")

    val cluster = new InMemoryKuduCluster
    CdcWriters.register("kudu-e2e",
      new KuduShapedWriter(cluster, hashBuckets = 4))
    val stream = spark.readStream
      .format(classOf[ChangeFeedProvider].getName)
      .option("store", feed).option("numPartitions", "4")
      .option("emitDdl", "true").load()
    val q = UpsertSink.stream(CtPipeline.toEnvelope(stream), "kudu-e2e",
      checkpointDir("kudu-e2e-ckpt"))
    q.processAllAvailable()

    // the UPDATE leg on every other key, all three tables
    for (t <- tables; k <- 1L to 50L by 2) ct.append(t, "UPDATE", k, s"$t-v$k-u")
    q.processAllAvailable()

    // mid-stream DDL evolution on ONE table + the DELETE leg
    val flushesBeforeDdl = cluster.flushes
    ct.setSchema("dbo.orders", s2.json)
    for (t <- tables; k <- 41L to 50L) ct.append(t, "DELETE", k, "-")
    q.processAllAvailable()

    // post-DDL insert lands on the evolved table
    ct.append("dbo.orders", "INSERT", 100L, "late")
    q.processAllAvailable()
    q.stop()
    CdcWriters.drop("kudu-e2e")

    // DDL evolution went through alterTable: nullable non-key add on the
    // evolved table only, and the session flushed (flush-before-alter,
    // CDCKudu.java:361-364)
    assert(cluster.flushes > flushesBeforeDdl,
      "mid-stream DDL must flush the session")
    assert(cluster.columns("dbo.orders").exists(c => c.name == "extra" &&
      c.nullable && !c.key && c.ktype == KuduCells.KString))
    assert(!cluster.columns("dbo.items").exists(_.name == "extra"),
      "untouched tables must not inherit the evolved column")

    for (t <- tables) {
      // created on first DML: PK-first order, non-nullable INT64 key,
      // the configured hash buckets
      val cols = cluster.columns(t)
      assert(cols.head.name == "key" && cols.head.key &&
        !cols.head.nullable && cols.head.ktype == KuduCells.KInt64, s"$t: $cols")
      assert(cluster.buckets(t) == 4)

      val rows = cluster.rows(t)
      val wantKeys = (1L to 40L).map(_.toString).toSet ++
        (if (t == "dbo.orders") Set("100") else Set.empty[String])
      assert(rows.keySet == wantKeys, s"$t live keys: ${rows.keySet}")

      // byte tier: recompute every surviving row's typed cells through
      // KuduCells from the values the envelope carried at write time
      // (keys 1..40 were written pre-DDL under s1; row 100 post-DDL
      // under s2 with the evolved column absent → explicit null cell)
      def check(key: Long, schema: StructType, values: Map[String, String])
          : Unit = {
        val want = KuduCells.upsertCells(schema, Set("key"), values)
        val got = rows(key.toString)
        assert(got.keySet == want.map(_.column).toSet,
          s"$t row $key columns: ${got.keySet}")
        want.foreach(c => assert(got(c.column) == c.value,
          s"$t row $key cell ${c.column}: ${got(c.column)} != ${c.value}"))
      }
      for (k <- 1L to 40L) {
        val v = if (k % 2 == 1) s"$t-v$k-u" else s"$t-v$k"
        check(k, s1, Map("key" -> k.toString, "payload" -> v))
      }
      if (t == "dbo.orders")
        check(100L, s2, Map("key" -> "100", "payload" -> "late"))
    }

    // replay the WHOLE feed against the SAME cluster under a fresh
    // checkpoint (at-least-once redelivery of every batch): the
    // upsert-based writer must converge to identical LIVE state.
    // Cell-map normalization: a pre-DDL row has NO cell for the evolved
    // column while its replayed twin (upserted under the evolved
    // schema) carries an explicit null cell — real Kudu reads BOTH as
    // NULL after ALTER ADD of a nullable column, so equality is over
    // the schema-complete view, absent cell ≡ null cell.
    def normalized(t: String): Map[String, Map[String, Option[Any]]] = {
      val cols = cluster.columns(t).map(_.name)
      cluster.rows(t).map { case (k, cells) =>
        k -> cols.map(c => c -> cells.getOrElse(c, None)).toMap
      }
    }
    val settled = tables.map(t => t -> normalized(t)).toMap
    CdcWriters.register("kudu-e2e-replay",
      new KuduShapedWriter(cluster, hashBuckets = 4))
    val stream2 = spark.readStream
      .format(classOf[ChangeFeedProvider].getName)
      .option("store", feed).option("numPartitions", "4")
      .option("emitDdl", "true").load()
    val q2 = UpsertSink.stream(CtPipeline.toEnvelope(stream2),
      "kudu-e2e-replay", checkpointDir("kudu-e2e-ckpt-replay"))
    q2.processAllAvailable()
    q2.stop()
    CdcWriters.drop("kudu-e2e-replay")
    for (t <- tables)
      assert(normalized(t) == settled(t), s"replay changed $t")
    ChangeTrackingStore.drop(feed)
  }
}
