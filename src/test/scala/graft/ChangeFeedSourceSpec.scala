package graft

import graft.sources.{ChangeFeedProvider, ChangeTrackingStore}
import org.apache.spark.sql.streaming.Trigger

/** The custom DSv2 micro-batch source against the CT simulator:
  * admission control caps batch size, all changes are delivered, new
  * changes appended after a cycle are picked up, and key-hash
  * partitioning spreads the read. */
class ChangeFeedSourceSpec extends SparkSuite {
  import spark.implicits._

  test("micro-batch source delivers all changes under admission control") {
    val name = "ct-spec"
    ChangeTrackingStore.drop(name)
    val store = ChangeTrackingStore.get(name)
    (1 to 250).foreach(i => store.append(
      if (i % 10 == 0) "UPDATE" else "INSERT", i % 17, s"p$i"))

    val stream = spark.readStream
      .format(classOf[ChangeFeedProvider].getName)
      .option("store", name)
      .option("maxBatchSize", "100")
      .option("numPartitions", "4")
      .load()

    val q = stream.writeStream.format("memory").queryName("ct_out")
      .option("checkpointLocation", checkpointDir("ctsrc"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val got = spark.table("ct_out")
    assert(got.count() == 250)
    assert(got.select($"version").as[Long].collect().toSet == (1L to 250L).toSet)
    // admission control: no micro-batch exceeded maxBatchSize
    val batchSizes = q.recentProgress.map(_.numInputRows).filter(_ > 0)
    assert(batchSizes.nonEmpty && batchSizes.forall(_ <= 100),
      s"batch sizes: ${batchSizes.mkString(",")}")
    assert(batchSizes.length >= 3, "250 rows at cap 100 needs >= 3 batches")

    // new changes after the first drain are picked up from the
    // checkpointed offset (durable offsets — the reference loses these)
    (251 to 260).foreach(i => store.append("INSERT", i % 17, s"p$i"))
    val q2 = stream.writeStream.format("memory").queryName("ct_out2")
      .option("checkpointLocation", checkpointDir("ctsrc2"))
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    assert(spark.table("ct_out2").count() == 260)
  }

  test("cold start against a 10x backlog paces through full batches with monotone offsets and no skipped versions") {
    // The second admission face (reference CTInputDStream.java:148-169's
    // maxBatchSize contract under catch-up): a fresh checkpoint (offset
    // 0) facing backlog = 10 × maxBatchSize must drain in exactly
    // ceil(backlog / cap) full batches — never one giant batch, never a
    // stall — with strictly increasing checkpointed offsets and every
    // version delivered exactly once (cdc30's gap-audit invariant).
    val name = "ct-backlog"
    val cap = 100
    val backlog = 10 * cap
    ChangeTrackingStore.drop(name)
    val store = ChangeTrackingStore.get(name)
    (1 to backlog).foreach(i => store.append(
      if (i % 7 == 0) "DELETE" else "INSERT", i % 23, s"p$i"))

    val ckpt = checkpointDir("ct-backlog")
    val q = spark.readStream
      .format(classOf[ChangeFeedProvider].getName)
      .option("store", name)
      .option("maxBatchSize", cap.toString)
      .option("numPartitions", "4")
      .load()
      .writeStream.format("memory").queryName("ct_backlog_out")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    // pacing: exactly backlog/cap batches, each a FULL cap-sized batch
    val sizes = q.recentProgress.map(_.numInputRows).filter(_ > 0).toSeq
    assert(sizes.length == backlog / cap,
      s"expected ${backlog / cap} catch-up batches, got ${sizes.length}: $sizes")
    assert(sizes.forall(_ == cap),
      s"catch-up batches must fill to the cap, got $sizes")

    // durable offsets: the checkpoint's offset log is strictly monotone
    // in steps of exactly the cap, ending at the backlog head
    val offsetsDir = new java.io.File(s"$ckpt/offsets")
    val logged = offsetsDir.listFiles().toSeq
      .filter(_.getName.matches("\\d+"))
      .sortBy(_.getName.toLong)
      .map { f =>
        val lines = java.nio.file.Files.readAllLines(f.toPath)
        lines.get(lines.size() - 1).trim.toLong // VersionOffset.json = the version
      }
    assert(logged == (1 to backlog / cap).map(_.toLong * cap),
      s"checkpointed offsets not a monotone cap-stepped ladder: $logged")

    // gap audit: every version 1..backlog delivered exactly once
    val versions = spark.table("ct_backlog_out")
      .select($"version").as[Long].collect()
    assert(versions.length == backlog, s"delivered ${versions.length}/$backlog")
    assert(versions.toSet == (1L to backlog.toLong).toSet,
      "version set has gaps or strays")
  }

  test("transient source outage yields empty batches, then recovery delivers everything") {
    val name = "ct-retry"
    ChangeTrackingStore.drop(name)
    val store = ChangeTrackingStore.get(name)
    (1 to 20).foreach(i => store.append("INSERT", i, s"p$i"))

    val stream = spark.readStream
      .format(classOf[ChangeFeedProvider].getName)
      .option("store", name).option("maxBatchSize", "5")
      .option("numPartitions", "2").option("maxRetrySeconds", "30")
      .load()
    val q = stream.writeStream.format("memory").queryName("ct_retry_out")
      .option("checkpointLocation", checkpointDir("ctretry"))
      .trigger(Trigger.ProcessingTime("50 milliseconds")).start()

    // let a couple of batches through, then inject an outage
    Thread.sleep(500)
    store.failReads(3) // next 3 polls throw -> empty batches, no crash
    (21 to 30).foreach(i => store.append("INSERT", i, s"p$i"))
    // wait until fully caught up after recovery
    val deadline = System.currentTimeMillis() + 30000
    def delivered = spark.table("ct_retry_out").count()
    while (delivered < 30 && System.currentTimeMillis() < deadline) Thread.sleep(200)
    q.stop()
    assert(delivered == 30, s"only $delivered/30 delivered after recovery")
    assert(q.exception.isEmpty, s"query should survive the outage: ${q.exception}")
  }

  test("connectionFactory option runs discovery through a real java.sql.Connection") {
    import java.sql.Types
    import graft.sources.{ConnectionFactory, CtSql, JdbcFixture}
    import JdbcFixture.Col

    // catalog fixture: two CT-enabled tables, dispatched on the EXACT
    // SQL text CtSql composes — the same strings a live SQL Server
    // would receive through this connection
    val ctCols = Seq(Col("schema_name", "varchar", Types.VARCHAR),
      Col("table_name", "varchar", Types.VARCHAR))
    val tableCols = Map(
      ("dbo", "orders") -> Seq(Col("id", "int", Types.INTEGER, 10),
        Col("amt", "decimal", Types.DECIMAL, 12, 2)),
      ("dbo", "items") -> Seq(Col("sku", "varchar", Types.VARCHAR),
        Col("qty", "int", Types.INTEGER, 10)))
    val pks = Map(("dbo", "orders") -> Seq("id"), ("dbo", "items") -> Seq("sku"))
    def run(sql: String): java.sql.ResultSet =
      if (sql == CtSql.ctEnabledTablesSql)
        JdbcFixture.resultSet(ctCols, Seq(Seq("dbo", "orders"), Seq("dbo", "items")))
      else tableCols.keys.find { case (s, t) => sql == CtSql.columnProbeSql(s, t) }
        .map(k => JdbcFixture.resultSet(tableCols(k), Seq.empty))
        .getOrElse(throw new java.sql.SQLException(s"unexpected SQL: $sql"))
    def runBound(sql: String, binds: Seq[String]): java.sql.ResultSet = {
      assert(sql == CtSql.keyColumnsSql, s"unexpected bound SQL: $sql")
      JdbcFixture.resultSet(Seq(Col("COLUMN_NAME", "varchar", Types.VARCHAR)),
        pks((binds(0), binds(1))).map(Seq(_: Any)))
    }

    var opened = 0
    val closed = scala.collection.mutable.ListBuffer.empty[java.sql.Connection]
    ConnectionFactory.register("ct-fixture", () => {
      opened += 1
      val c = JdbcFixture.connection(run, runBound)
      closed += c
      c
    })

    val name = "ct-factory"
    ChangeTrackingStore.drop(name)
    val store = ChangeTrackingStore.get(name)
    store.append("dbo.orders", "INSERT", 1L, "p1")

    val stream = spark.readStream
      .format(classOf[ChangeFeedProvider].getName)
      .option("store", name)
      .option("connectionFactory", "ct-fixture")
      .option("emitDdl", "true")
      .load()
    val q = stream.writeStream.format("memory").queryName("ct_factory_out")
      .option("checkpointLocation", checkpointDir("ctfactory"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    // the discovered schemas (typed through the DBUtils tier:
    // DECIMAL(12,2) → double) flow into the per-batch DDL snapshot
    val ddl = spark.table("ct_factory_out").filter($"kind" === "ddl")
      .select($"table", $"schemaJson").as[(String, String)].collect().toMap
    assert(ddl.keySet == Set("dbo.orders", "dbo.items"))
    import org.apache.spark.sql.types._
    assert(DataType.fromJson(ddl("dbo.orders")) == StructType(Seq(
      StructField("id", IntegerType), StructField("amt", DoubleType))))
    assert(DataType.fromJson(ddl("dbo.items")) == StructType(Seq(
      StructField("sku", StringType), StructField("qty", IntegerType))))
    // dml rows flow unchanged beside the discovered DDL
    assert(spark.table("ct_factory_out").filter($"kind" === "dml").count() == 1)
    // every opened connection was closed (the reference's
    // try-with-resources posture)
    assert(opened >= 1 && closed.forall(_.isClosed))

    // an unregistered name fails loudly at stream construction
    val err = intercept[Exception] {
      spark.readStream.format(classOf[ChangeFeedProvider].getName)
        .option("store", name).option("connectionFactory", "nope").load()
        .writeStream.format("memory").queryName("ct_factory_err")
        .option("checkpointLocation", checkpointDir("ctfactory-err"))
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(err).exists(c => Option(c.getMessage)
      .exists(_.contains("no ConnectionFactory registered"))))
    ConnectionFactory.drop("ct-fixture")
  }
}
