package graft.queries

import graft.Tables
import graft.operators.{CdcApply, ChangeFeed, DmlFlattener, Normalizer, SchemaDedup}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The CDC operator surface from SURVEY.md §2, exercised as verifiable
  * batch queries over the fixture tables.
  *
  * Each query drives a real operator from graft.operators (envelope wrap →
  * flatten roundtrip, apply/upsert compaction, emit-on-change dedup,
  * before/after merge, PK-change split, admission-control windows, the
  * changes⋈base join) with a deterministic change-log synthesized from the
  * fixture tables, so the DuckDB oracle can state the expected result in
  * plain SQL. Streaming forms of the stateful ops are spec-tested under
  * src/test (MemoryStream) — same column expressions, same semantics.
  */
object CdcQueries {
  import Q._

  private def opFromStatus = // O=open→INSERT, F=finished→UPDATE, P→DELETE
    when(col("o_orderstatus") === "O", "INSERT")
      .when(col("o_orderstatus") === "F", "UPDATE")
      .otherwise("DELETE")

  private def opFromEvent = // signup→INSERT, error→DELETE, else UPDATE
    when(col("event_type") === "signup", "INSERT")
      .when(col("event_type") === "error", "DELETE")
      .otherwise("UPDATE")

  /** Quarter-width fan for the store-lifecycle queries' per-batch
    * envelope builds (guide §2.6): the events fixture is a single-split
    * scan, so the wrapDml stringify map-build — the dominant per-batch
    * cost left after the r18 store work (~0.7 s serialized, twice per
    * query) — otherwise runs on one core. A QUARTER of the cluster
    * parallelism spreads the build while keeping the persisted batch's
    * partition count low enough that the lifecycle's ~15 downstream
    * metadata jobs don't degrade into task storms — r17 measured the
    * FULL-width fan 3-8× worse in CPU for exactly that reason and
    * reverted it; the ratio scales with the session the same way
    * Compute.parallelism does. */
  private def fanned(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.repartition(math.max(2, graft.operators.Compute.parallelism(df) / 4))

  val queries: Map[String, QueryFn] = Map(
    // E1 + T1: wrap rows into the changeRecord envelope (values as
    // map<string,string> + in-band schema JSON), then flatten back to
    // typed columns. The oracle is the identity — proving the envelope
    // is lossless for the simple-type surface the reference allows
    // (reference Schemas.java:33-36, CDCTableUtil.java:108-118).
    "cdc01_envelope_roundtrip" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val env = ChangeFeed.wrapDml(o, "public.orders", Seq("o_orderkey"),
        lit("INSERT"), col("o_orderkey"), unix_micros(col("o_orderdate").cast("timestamp")))
      DmlFlattener.flatten(env, o.schema)
        .orderBy(col("o_orderkey"))
    }),

    // T1 with appendColumns=true: flatten plus CDC bookkeeping columns
    // (reference DMLFlattener.java:108-125).
    "cdc02_flatten_extras" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val env = ChangeFeed.wrapDml(o, "public.orders", Seq("o_orderkey"),
        opFromStatus, col("o_orderkey"), unix_micros(col("o_orderdate").cast("timestamp")))
      DmlFlattener.flatten(env, o.schema, includeCdcColumns = true)
        .select(col("o_orderkey"), col("o_totalprice"),
          col(DmlFlattener.OpTypeCol).as("cdc_op_type"),
          col(DmlFlattener.VersionCol).as("change_version"),
          col(DmlFlattener.TimestampCol).as("cdc_ts_micros"))
        .orderBy(col("o_orderkey"))
    }),

    // SNK upsert semantics, compaction half: latest row per key by
    // version — replicates what a PK-addressed sink converges to
    // (reference CDCTableUtil.java:72-96) as one window over one shuffle.
    "cdc03_apply_latest" -> ((s, d) => {
      CdcApply.latestByKey(Tables.events(s, d), Seq("user_id"),
        col("ts"), col("event_id"))
        .select(col("user_id"), col("event_id"), col("ts"),
          col("event_type"), col("value"))
        .orderBy(col("user_id"))
    }),

    // SNK upsert semantics, full: final state after applying an I/U/D
    // change log — latest per key minus keys whose latest op is DELETE.
    "cdc04_apply_changes" -> ((s, d) => {
      val ev = Tables.events(s, d).withColumn("op", opFromEvent)
      CdcApply.applyChanges(ev, Seq("user_id"), col("op"),
        col("ts"), col("event_id"))
        .select(col("user_id"), col("event_id"), col("op"), col("value"))
        .orderBy(col("user_id"))
    }),

    // ST1: emit-on-change schema dedup (batch form) — documents stand in
    // for the table→schemaJson state stream: a row passes only when its
    // lang differs from the previous doc of the same source.
    "cdc05_schema_dedup" -> ((s, d) => {
      SchemaDedup.emitOnChange(Tables.documents(s, d),
        col("source"), col("doc_id"), col("lang"))
        .select(col("doc_id"), col("source"), col("lang"))
        .orderBy(col("doc_id"))
    }),

    // SRC3b: PK-change split — purchases model UPDATEs that moved the PK
    // and explode into DELETE(before) + INSERT(after); everything else
    // passes through as one UPDATE (1→0..2 flatMap, still codegen).
    "cdc06_pk_change_split" -> ((s, d) => {
      val ev = Tables.events(s, d)
      def img(id: org.apache.spark.sql.Column, op: String) = struct(
        col("event_id").as("event_id"), id.cast("long").as("user_id"),
        lit(op).as("op"), col("value").as("value"))
      Normalizer.pkChangeSplit(ev,
        pkChanged = col("event_type") === "purchase",
        asDelete = img(col("user_id"), "DELETE"),
        asInsert = img(col("user_id") + 1000000L, "INSERT"),
        asIs = img(col("user_id"), "UPDATE"))
        .orderBy(col("event_id"), col("op"))
    }),

    // SRC3a: before/after image merge — per column, take the after value
    // unless its isMissing flag is set (two columns, independent flags).
    "cdc07_image_merge" -> ((s, d) => {
      Tables.events(s, d).select(
        col("event_id"),
        Normalizer.mergeImage(
          before = -col("value"), after = col("value"),
          isMissing = col("event_type") === "view").as("merged_value"),
        Normalizer.mergeImage(
          before = lit("before-tag"), after = upper(col("event_type")),
          isMissing = col("value") < 50.0).as("merged_tag"))
        .orderBy(col("event_id"))
    }),

    // SNK-u: row-key derivation — PK NAMES sorted lexically, values
    // joined with ':' in name order (reference CDCTableUtil.java:98-105:
    // the `.sorted()` applies to the key-name stream, not the values).
    // Name order here: l_linenumber < l_orderkey.
    "cdc08_row_key" -> ((s, d) => {
      Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        CdcApply.rowKey(Seq(
          "l_orderkey" -> col("l_orderkey"),
          "l_linenumber" -> col("l_linenumber"))).as("row_key"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // SRC1c: admission control — cur = min(latest, prev + maxBatch),
    // batch = changes in (prev, cur]. The bound is a 1-row broadcast,
    // not a driver collect.
    "cdc09_ct_window" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val bound = ev.agg(
        expr("max(event_id) DIV 5").as("prev"),
        least(max(col("event_id")),
          expr("max(event_id) DIV 5 + max(event_id) DIV 4")).as("cur"))
      ev.join(broadcast(bound))
        .filter(col("event_id") > col("prev") && col("event_id") <= col("cur"))
        .agg(count(lit(1)).as("n_changes"),
          min(col("event_id")).as("lo"), max(col("event_id")).as("hi"))
    }),

    // E1: DDL-before-DML batch ordering, made explicit with a sortable
    // kind tag instead of relying on union partition order
    // (SURVEY.md §7.3 hard part 2).
    "cdc10_ddl_first_union" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val ddl = docs.select(col("source")).distinct()
        .select(lit("ddl").as("kind"), col("source"),
          lit(null).cast("long").as("doc_id"))
      val dml = docs.select(lit("dml").as("kind"), col("source"), col("doc_id"))
      ddl.unionByName(dml)
        .orderBy(col("source"), col("kind"), col("doc_id").asc_nulls_first)
    }),

    // §3.4 flatten-and-query — the architectural headline: once a change
    // stream is flattened, it is a first-class DataFrame and the full
    // Catalyst pipeline applies. Wrap lineitem into the envelope,
    // flatten through the in-band schema, then run a plain relational
    // aggregation on the result. The reference can only hand flattened
    // rows to sinks; this engine hands them to Spark SQL.
    "cdc12_flatten_then_query" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val env = ChangeFeed.wrapDml(li, "public.lineitem",
        Seq("l_orderkey", "l_linenumber"),
        lit("INSERT"), col("l_orderkey"), lit(0L))
      DmlFlattener.flatten(env, li.schema)
        .filter(col("l_shipdate") >= lit("2000-01-01").cast("timestamp"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
            .as("sum_price"))
        .orderBy(col("l_returnflag"))
    }),

    // SNK1 durable, end-to-end: the cluster-valid parquet upsert target.
    // Wrap events into the envelope as an I/U/D change log with
    // version = event_id, apply it through ParquetUpsertStore in two
    // micro-batches (DDL schema snapshot rides batch 0; DML split by
    // version parity so batch 1 must merge against batch 0's committed
    // buckets), then read the committed snapshot back and re-type it.
    // Converges to the same law as cdc04: latest change per key, minus
    // keys whose latest op is DELETE — regardless of batch boundaries
    // (reference sink/CDCTableUtil.java:57-96, CDCKudu.java:139-184).
    "cdc13_durable_upsert" -> ((s, d) => {
      import graft.sinks.ParquetUpsertStore
      val ev = Tables.events(s, d)
      val env = ChangeFeed.wrapDml(ev, "public.events", Seq("user_id"),
        opFromEvent, col("event_id"), lit(0L))
      val ver = col("dml.changeTrackingVersion").cast("long")
      val store = new ParquetUpsertStore(freshDir("cdc13"), numBuckets = 8)
      store.applyBatch(ChangeFeed.wrapDdl(s, "public.events", ev.schema)
        .unionByName(env.filter(ver % 2 === 0)), 0L)
      store.applyBatch(env.filter(ver % 2 === 1), 1L)
      store.snapshot(s, "public.events")
        .select(
          element_at(col("values"), "user_id").cast("long").as("user_id"),
          element_at(col("values"), "event_id").cast("long").as("event_id"),
          col("op"),
          element_at(col("values"), "value").cast("double").as("value"))
        .orderBy(col("user_id"))
    }),

    // Point lookup on the durable store: the bucket layout turned into
    // read pruning — the keys are hashed driver-side with the write
    // path's hash, only their bucket directories are opened, and the
    // row_key IN filter rides to the parquet scan (spec asserts the
    // directory skip + partition filter; this row gates the VALUES).
    "cdc18_point_lookup" -> ((s, d) => {
      import graft.sinks.ParquetUpsertStore
      val ev = Tables.events(s, d)
      val env = ChangeFeed.wrapDml(ev, "public.events", Seq("user_id"),
        opFromEvent, col("event_id"), lit(0L))
      val ver = col("dml.changeTrackingVersion").cast("long")
      val store = new ParquetUpsertStore(freshDir("cdc18"), numBuckets = 8)
      store.applyBatch(ChangeFeed.wrapDdl(s, "public.events", ev.schema)
        .unionByName(env.filter(ver % 2 === 0)), 0L)
      store.applyBatch(env.filter(ver % 2 === 1), 1L)
      store.lookup(s, "public.events", (3L to 9L).map(_.toString))
        .select(
          element_at(col("values"), "user_id").cast("long").as("user_id"),
          element_at(col("values"), "event_id").cast("long").as("event_id"),
          col("op"),
          element_at(col("values"), "value").cast("double").as("value"))
        .orderBy(col("user_id"))
    }),

    // The durable store surfaced as a named Spark data source: the same
    // two-batch change log, read back through
    // spark.read.format("graft-upsert") with a row_key IN predicate.
    // The filter is pushed to the relation, which turns it into the
    // store's driver-side bucket pruning (only the keys' bucket
    // directories are opened) while Spark re-applies it above the scan —
    // pruning can never change results, and this row gates the values.
    "cdc19_source_read" -> ((s, d) => {
      import graft.sinks.ParquetUpsertStore
      val ev = Tables.events(s, d)
      val env = ChangeFeed.wrapDml(ev, "public.events", Seq("user_id"),
        opFromEvent, col("event_id"), lit(0L))
      val ver = col("dml.changeTrackingVersion").cast("long")
      val dir = freshDir("cdc19")
      val store = new ParquetUpsertStore(dir, numBuckets = 8)
      store.applyBatch(ChangeFeed.wrapDdl(s, "public.events", ev.schema)
        .unionByName(env.filter(ver % 2 === 0)), 0L)
      env.filter(ver % 2 === 1)
        .write.format("graft-upsert").mode("append")
        .option("path", dir).option("table", "public.events")
        .option("batchId", "1").save()
      s.read.format("graft-upsert")
        .option("path", dir).option("table", "public.events").load()
        .filter(col("row_key").isin((3L to 9L).map(_.toString): _*))
        .select(
          element_at(col("values"), "user_id").cast("long").as("user_id"),
          element_at(col("values"), "event_id").cast("long").as("event_id"),
          col("op"),
          element_at(col("values"), "value").cast("double").as("value"))
        .orderBy(col("user_id"))
    }),

    // Time travel on the durable store: apply the same two-batch change
    // log as cdc13, then read the snapshot AS OF batch 0 — the state
    // after only the even-versioned changes. The manifest log retains
    // every committed batch's full bucket mapping, so this is a metadata
    // read, not a replay.
    "cdc16_time_travel" -> ((s, d) => {
      import graft.sinks.ParquetUpsertStore
      val ev = Tables.events(s, d)
      val env = ChangeFeed.wrapDml(ev, "public.events", Seq("user_id"),
        opFromEvent, col("event_id"), lit(0L))
      val ver = col("dml.changeTrackingVersion").cast("long")
      val store = new ParquetUpsertStore(freshDir("cdc16"), numBuckets = 8)
      store.applyBatch(ChangeFeed.wrapDdl(s, "public.events", ev.schema)
        .unionByName(env.filter(ver % 2 === 0)), 0L)
      store.applyBatch(env.filter(ver % 2 === 1), 1L)
      store.snapshotAt(s, "public.events", batchId = 0L)
        .select(
          element_at(col("values"), "user_id").cast("long").as("user_id"),
          element_at(col("values"), "event_id").cast("long").as("event_id"),
          col("op"),
          element_at(col("values"), "value").cast("double").as("value"))
        .orderBy(col("user_id"))
    }),

    // Typed snapshot through the STORED schema, across a DDL evolution:
    // batch 0 applies schema v1 + the even-versioned changes, batch 1
    // applies schema v2 (adds value_sq) + the odd-versioned changes whose
    // rows carry the new column. snapshotTyped re-types the committed
    // map<string,string> rows through the manifest's evolved schema, so
    // rows whose latest change predates the DDL read NULL for value_sq —
    // the reference's alter-then-write posture (CDCKudu.java:78-137) as a
    // metadata-only projection.
    "cdc17_typed_snapshot" -> ((s, d) => {
      import graft.sinks.ParquetUpsertStore
      import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
      val ev = Tables.events(s, d)
      val ver = col("dml.changeTrackingVersion").cast("long")
      val store = new ParquetUpsertStore(freshDir("cdc17"), numBuckets = 8)
      val env0 = ChangeFeed.wrapDml(ev, "public.events", Seq("user_id"),
        opFromEvent, col("event_id"), lit(0L))
      store.applyBatch(ChangeFeed.wrapDdl(s, "public.events", ev.schema)
        .unionByName(env0.filter(ver % 2 === 0)), 0L)
      val evolved = StructType(ev.schema.fields :+ StructField("value_sq", DoubleType))
      val env1 = ChangeFeed.wrapDml(ev.withColumn("value_sq", col("value") * 2),
        "public.events", Seq("user_id"), opFromEvent, col("event_id"), lit(0L))
      store.applyBatch(ChangeFeed.wrapDdl(s, "public.events", evolved)
        .unionByName(env1.filter(ver % 2 === 1)), 1L)
      store.snapshotTyped(s, "public.events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"), col("value_sq"))
        .orderBy(col("user_id"))
    }),

    // SRC1f with real JDBC typing: a change-scan ResultSet (offline
    // fixture over the exact java.sql interfaces) decoded through the
    // DBUtils type tier — every lossy quirk on display: DECIMAL(12,2)→
    // double, DECIMAL(5,0)→int, DECIMAL(12,0)→long, "int unsigned"
    // INTEGER→long, TINYINT→int, REAL→float, CLOB→string, DATE/TIME/
    // TIMESTAMP logical mapping — then wrapped into the envelope and
    // flattened back to typed columns (reference DBUtils.java:97-209,
    // ResultSetToDMLRecord.java:56-113). Oracle is the literal expected
    // table: the quirks are deterministic, so the values are too.
    "cdc14_jdbc_typed_decode" -> ((s, _) => {
      import graft.sources.{JdbcFixture, JdbcTypes}
      import java.sql.{Date, Time, Timestamp, Types}
      import javax.sql.rowset.serial.SerialClob
      import s.implicits._
      val cols = Seq(
        JdbcFixture.Col("CHANGE_TRACKING_VERSION", "bigint", Types.BIGINT),
        JdbcFixture.Col("SYS_CHANGE_CREATION_VERSION", "bigint", Types.BIGINT),
        JdbcFixture.Col("SYS_CHANGE_OPERATION", "varchar", Types.VARCHAR),
        JdbcFixture.Col("CDC_CURRENT_TIMESTAMP", "timestamp", Types.TIMESTAMP),
        JdbcFixture.Col("id", "int", Types.INTEGER, precision = 10),
        JdbcFixture.Col("big", "bigint", Types.BIGINT),
        JdbcFixture.Col("ucount", "int unsigned", Types.INTEGER),
        JdbcFixture.Col("price", "decimal", Types.DECIMAL, precision = 12, scale = 2),
        JdbcFixture.Col("qty", "decimal", Types.DECIMAL, precision = 5),
        JdbcFixture.Col("serial", "decimal", Types.DECIMAL, precision = 12),
        JdbcFixture.Col("tiny", "tinyint", Types.TINYINT),
        JdbcFixture.Col("ratio", "real", Types.REAL),
        JdbcFixture.Col("name", "varchar", Types.VARCHAR),
        JdbcFixture.Col("note", "clob", Types.CLOB),
        JdbcFixture.Col("d", "date", Types.DATE),
        JdbcFixture.Col("tm", "time", Types.TIME),
        JdbcFixture.Col("tstamp", "timestamp", Types.TIMESTAMP))
      def dec(v: String) = new java.math.BigDecimal(v)
      val ct = Timestamp.valueOf("2024-03-01 12:00:00")
      val rows = Seq(
        Seq[Any](101L, 100L, "I", ct, 1, 9000000000L, 3000000000L,
          dec("123.45"), dec("7"), dec("99999999999"), 5.toByte, 0.5f,
          "alpha", new SerialClob("note-a".toCharArray),
          Date.valueOf("2024-03-01"), Time.valueOf("01:02:03"),
          Timestamp.valueOf("2024-03-01 10:30:00")),
        Seq[Any](102L, 100L, "U", ct, 2, -9000000000L, 4294967295L,
          dec("0.10"), dec("0"), dec("1"), (-3).toByte, 2.25f,
          "beta", null,
          Date.valueOf("1999-12-31"), Time.valueOf("23:59:59"),
          Timestamp.valueOf("1999-12-31 23:59:59")),
        Seq[Any](103L, 103L, "D", ct, 3, 0L, 1L,
          dec("-42.50"), dec("12345"), dec("1234567890"), 0.toByte, -0.5f,
          "gamma", new SerialClob("note-c".toCharArray),
          Date.valueOf("2024-02-29"), Time.valueOf("00:00:00"),
          Timestamp.valueOf("2024-02-29 00:00:00")))
      val recs = JdbcTypes.changeRecords(
        JdbcFixture.resultSet(cols, rows), "dbo", "mixed", Seq("id"))
      val rowSchema = JdbcTypes.changeSchema(JdbcFixture.metaData(cols))
      DmlFlattener.flatten(s.createDataset(recs).toDF(), rowSchema,
          includeCdcColumns = true)
        .withColumnRenamed(DmlFlattener.OpTypeCol, "op")
        .withColumnRenamed(DmlFlattener.VersionCol, "version")
        .drop(DmlFlattener.TimestampCol)
        .orderBy(col("id"))
    }),

    // SRC2 + SRC2a + SRC3 end-to-end on REAL GoldenGate payloads: raw
    // Kafka-shaped bytes (wrapper-schema announcement, schema JSON,
    // Avro-wrapped DMLs with paired before/after images and *_isMissing
    // flags) → classify → fingerprint registry → decode → merge/split →
    // envelope → flatten. Exercises the missing-column merge (UPDATE
    // takes the before value where the after flag is set) and the
    // PK-moving UPDATE split into DELETE + INSERT (reference
    // source/oracle/Normalizer.java:59-104,146-201,
    // GoldenGateKafka.java:208-237). Deterministic fixture → literal
    // oracle.
    "cdc15_goldengate_pipeline" -> ((s, _) => {
      import graft.sources.{GoldenGateAvro => GG, GoldenGateDml}
      import s.implicits._
      val schemaJson =
        """{"type":"record","name":"CUSTOMERS","namespace":"ORCL","fields":[
          | {"name":"table","type":"string"},
          | {"name":"op_type","type":"string"},
          | {"name":"primary_keys","type":{"type":"array","items":"string"}},
          | {"name":"before","type":["null",{"type":"record","name":"columns","fields":[
          |   {"name":"id","type":"long"},{"name":"id_isMissing","type":"boolean"},
          |   {"name":"name","type":["null","string"]},{"name":"name_isMissing","type":"boolean"},
          |   {"name":"bal","type":"double"},{"name":"bal_isMissing","type":"boolean"}]}]},
          | {"name":"after","type":["null","columns"]}]}""".stripMargin
      val fp = org.apache.avro.SchemaNormalization.parsingFingerprint64(
        new org.apache.avro.Schema.Parser().parse(schemaJson))
      def row(id: Long, name: String, bal: Double, missName: Boolean = false) =
        Map[String, Any]("id" -> id, "id_isMissing" -> false,
          "name" -> name, "name_isMissing" -> missName,
          "bal" -> bal, "bal_isMissing" -> false)
      def dmlMsg(op: String, before: Any, after: Any) =
        GG.encodeWrapper("ORCL.CUSTOMERS", fp, GG.encodeRecord(schemaJson,
          Map[String, Any]("table" -> "ORCL.CUSTOMERS", "op_type" -> op,
            "primary_keys" -> Seq("id"), "before" -> before, "after" -> after)))
      val raw: Seq[Array[Byte]] = Seq(
        GG.WrapperSchemaJson.getBytes("UTF-8"), // announcement → ignored
        schemaJson.getBytes("UTF-8"),           // registers fingerprint
        dmlMsg("I", null, row(1, "ann", 10.5)),
        // unchanged name arrives flagged missing → merged from before
        dmlMsg("U", row(1, "ann", 10.5), row(1, "WRONG", 99.25, missName = true)),
        // PK moved → DELETE(before) + INSERT(after)
        dmlMsg("U", row(2, "bob", 1.0), row(20, "bob2", 2.0)),
        dmlMsg("D", row(1, "ann", 99.25), null))
      val msgs = raw.zipWithIndex.map { case (b, i) =>
        GoldenGateDml.classify(b, i.toLong)
      }
      val env = GoldenGateDml.pipeline(s.createDataset(msgs))
      DmlFlattener.flatten(env, GoldenGateDml.rowStructType(schemaJson),
          includeCdcColumns = true)
        .select(col("id"), col("name"), col("bal"),
          col(DmlFlattener.OpTypeCol).as("op"),
          col(DmlFlattener.VersionCol).cast("long").as("version"))
        .orderBy(col("version"), col("op"), col("id"))
    }),

    // CDC of the store itself: the diff between two committed snapshots
    // as an I/U/D change feed, computed from the manifest log — only
    // buckets REMAPPED between the two commits are read (spec asserts
    // the pruning; this row gates the records). Same two-batch change
    // log as cdc16: the diff from batch 0 to batch 1 is exactly what the
    // odd-versioned changes did to the live state.
    "cdc21_snapshot_diff" -> ((s, d) => {
      import graft.sinks.ParquetUpsertStore
      val ev = Tables.events(s, d)
      val env = ChangeFeed.wrapDml(ev, "public.events", Seq("user_id"),
        opFromEvent, col("event_id"), lit(0L))
      val ver = col("dml.changeTrackingVersion").cast("long")
      val store = new ParquetUpsertStore(freshDir("cdc21"), numBuckets = 8)
      store.applyBatch(ChangeFeed.wrapDdl(s, "public.events", ev.schema)
        .unionByName(env.filter(ver % 2 === 0)), 0L)
      store.applyBatch(env.filter(ver % 2 === 1), 1L)
      store.diff(s, "public.events", fromBatchId = 0L, toBatchId = 1L)
        .select(
          element_at(col("values"), "user_id").cast("long").as("user_id"),
          col("diff_op"),
          element_at(col("values"), "event_id").cast("long").as("event_id"),
          element_at(col("values"), "value").cast("double").as("value"))
        .orderBy(col("user_id"))
    }),

    // MERGE INTO as a first-class store API: seed with the
    // even-versioned changes, then one merge() call upserts the odd
    // rows and tombstones the odd DELETEs — insert-or-update-or-delete
    // in a single batch, no envelope assembly at the call site. The
    // convergence law (same as cdc13's) gates the result: merge sugar
    // must be indistinguishable from the raw change-batch path.
    "cdc25_merge_into" -> ((s, d) => {
      import graft.sinks.ParquetUpsertStore
      val ev = Tables.events(s, d)
      val env = ChangeFeed.wrapDml(ev, "public.events", Seq("user_id"),
        opFromEvent, col("event_id"), lit(0L))
      val ver = col("dml.changeTrackingVersion").cast("long")
      val store = new ParquetUpsertStore(freshDir("cdc25"), numBuckets = 8)
      store.applyBatch(ChangeFeed.wrapDdl(s, "public.events", ev.schema)
        .unionByName(env.filter(ver % 2 === 0)), 0L)
      store.merge("public.events", ev.filter(col("event_id") % 2 === 1),
        keys = Seq("user_id"), version = col("event_id"), batchId = 1L,
        deleteWhen = opFromEvent === "DELETE")
      store.snapshot(s, "public.events")
        .select(
          element_at(col("values"), "user_id").cast("long").as("user_id"),
          element_at(col("values"), "event_id").cast("long").as("event_id"),
          element_at(col("values"), "value").cast("double").as("value"))
        .orderBy(col("user_id"))
    }),

    // THE FLAGSHIP PATH IN THE GATE: the full reference pipeline —
    // CT-enabled source database (simulator; no SQL Server is reachable
    // offline) → DSv2 micro-batch source with admission control →
    // per-batch DDL snapshot → envelope assembly → streaming upsert into
    // the durable store → typed-read of the converged state. Previously
    // spec-only (CtPipelineSpec/EndToEndCdcSpec); this row puts it under
    // the DuckDB oracle. The simulator is seeded deterministically from
    // the events fixture in event_id order (the driver-side loop fills
    // the SOURCE DATABASE — it is the test double's ingest, not part of
    // the measured pipeline); maxBatchSize forces multiple micro-batches
    // so cross-batch merges are exercised, and the convergence law makes
    // batch boundaries irrelevant to the result.
    "cdc23_ct_pipeline_e2e" -> ((s, d) => {
      import graft.sinks.{ParquetUpsertStore, UpsertSink}
      import graft.sources.{ChangeFeedProvider, ChangeTrackingStore}
      import graft.streaming.CtPipeline
      import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
      val feed = "cdc23-feed"
      ChangeTrackingStore.drop(feed)
      val ct = ChangeTrackingStore.get(feed)
      ct.setSchema("public.events", StructType(Seq(
        StructField("key", LongType), StructField("payload", StringType))).json)
      val rows = Tables.events(s, d)
        .select(col("event_id").cast("long"), col("user_id").cast("long"),
          opFromEvent, col("event_type"))
        .orderBy(col("event_id")).collect()
      rows.foreach(r => ct.append("public.events", r.getString(2), r.getLong(1),
        s"${r.getLong(0)}:${r.getString(3)}"))
      val store = new ParquetUpsertStore(freshDir("cdc23"), numBuckets = 8)
      // ~3 micro-batches at ANY scale factor: cross-batch merges are
      // exercised without per-batch overhead dominating the run
      val stream = s.readStream.format(classOf[ChangeFeedProvider].getName)
        .option("store", feed).option("numPartitions", "4")
        .option("maxBatchSize", (rows.length / 3 + 1).toString)
        .option("emitDdl", "true").load()
      val q = UpsertSink.stream(CtPipeline.toEnvelope(stream), store,
        freshDir("cdc23-ckpt"))
      q.processAllAvailable()
      q.stop()
      store.snapshot(s, "public.events")
        .select(element_at(col("values"), "key").cast("long").as("key"),
          element_at(col("values"), "payload").as("payload"))
        .orderBy(col("key"))
    }),

    // The SRC2 twin of cdc23: the full GoldenGate path — Kafka-shaped
    // message log (schema announcement + Avro-wrapped before/after DMLs)
    // → classify → fingerprint registry → decode/normalize → envelope →
    // streaming upsert into the durable store — gated end to end. The
    // trail is built deterministically from the events fixture
    // (user_id < 50 bounds the driver-side Avro encoding; it seeds the
    // TRANSPORT, not the measured pipeline); message offsets are the
    // change versions, monotone in event order.
    "cdc24_gg_pipeline_e2e" -> ((s, d) => {
      import graft.sinks.{ParquetUpsertStore, UpsertSink}
      import graft.sources.{GoldenGateAvro => GG, GoldenGateDml, GoldenGateFeed, MessageLog}
      val schemaJson =
        """{"type":"record","name":"EVENTS","namespace":"ORCL","fields":[
          | {"name":"table","type":"string"},
          | {"name":"op_type","type":"string"},
          | {"name":"primary_keys","type":{"type":"array","items":"string"}},
          | {"name":"before","type":["null",{"type":"record","name":"columns","fields":[
          |   {"name":"id","type":"long"},{"name":"id_isMissing","type":"boolean"},
          |   {"name":"p","type":["null","string"]},{"name":"p_isMissing","type":"boolean"}]}]},
          | {"name":"after","type":["null","columns"]}]}""".stripMargin
      val fp = org.apache.avro.SchemaNormalization.parsingFingerprint64(
        new org.apache.avro.Schema.Parser().parse(schemaJson))
      def img(id: Long, p: String) = Map[String, Any](
        "id" -> id, "id_isMissing" -> false, "p" -> p, "p_isMissing" -> false)
      def msg(op: String, before: Any, after: Any) =
        GG.encodeWrapper("ORCL.EVENTS", fp, GG.encodeRecord(schemaJson,
          Map[String, Any]("table" -> "ORCL.EVENTS", "op_type" -> op,
            "primary_keys" -> Seq("id"), "before" -> before, "after" -> after)))
      val feed = "cdc24-feed"
      MessageLog.drop(feed)
      val log = MessageLog.get(feed)
      log.append(schemaJson.getBytes("UTF-8"))
      Tables.events(s, d).filter(col("user_id") < 50)
        .select(col("event_id").cast("long"), col("user_id").cast("long"),
          opFromEvent, col("event_type"))
        .orderBy(col("event_id")).collect()
        .foreach { r =>
          val p = s"${r.getLong(0)}:${r.getString(3)}"
          r.getString(2) match {
            case "INSERT" => log.append(msg("I", null, img(r.getLong(1), p)))
            case "UPDATE" => log.append(msg("U", img(r.getLong(1), "prev"),
              img(r.getLong(1), p)))
            case _ => log.append(msg("D", img(r.getLong(1), p), null))
          }
        }
      val store = new ParquetUpsertStore(freshDir("cdc24"), numBuckets = 8)
      val env = GoldenGateDml.fromFeed(s, feed,
        initialOffset = GoldenGateFeed.EarliestSentinel, maxBatchSize = 1500L)
      val q = UpsertSink.stream(env, store, freshDir("cdc24-ckpt"))
      q.processAllAvailable()
      q.stop()
      store.snapshot(s, "ORCL.EVENTS")
        .select(element_at(col("values"), "id").cast("long").as("key"),
          element_at(col("values"), "p").as("payload"))
        .orderBy(col("key"))
    }),

    // Incremental view maintenance from the diff feed: a per-group
    // aggregate over snapshot 0 is advanced to snapshot 1's value by
    // applying the I/U/D diff records as additions and RETRACTIONS
    // (values_prev carries the before-image for UPDATE/DELETE, so a row
    // that moved groups is subtracted from its old group and added to
    // its new one). The oracle recomputes the batch-1 aggregate from
    // scratch — proving delta maintenance ≡ full recompute. At 100 TB
    // this is the difference between rescanning the table and reading
    // one batch's touched buckets.
    "cdc22_incremental_agg" -> ((s, d) => {
      import graft.sinks.ParquetUpsertStore
      val ev = Tables.events(s, d)
      val env = ChangeFeed.wrapDml(ev, "public.events", Seq("user_id"),
        opFromEvent, col("event_id"), lit(0L))
      val ver = col("dml.changeTrackingVersion").cast("long")
      val store = new ParquetUpsertStore(freshDir("cdc22"), numBuckets = 8)
      store.applyBatch(ChangeFeed.wrapDdl(s, "public.events", ev.schema)
        .unionByName(env.filter(ver % 2 === 0)), 0L)
      store.applyBatch(env.filter(ver % 2 === 1), 1L)
      def grp(values: org.apache.spark.sql.Column) =
        element_at(values, "event_type").as("event_type")
      def v(values: org.apache.spark.sql.Column) =
        element_at(values, "value").cast("decimal(18,2)")
      val agg0 = store.snapshotAt(s, "public.events", 0L)
        .groupBy(grp(col("values")))
        .agg(count(lit(1)).as("n0"), sum(v(col("values"))).as("s0"))
      val dff = store.diff(s, "public.events", 0L, 1L)
      val delta = dff.filter(col("diff_op") =!= "DELETE")
        .select(grp(col("values")), lit(1L).as("dn"), v(col("values")).as("dv"))
        .unionByName(dff.filter(col("diff_op") =!= "INSERT")
          .select(grp(col("values_prev")), lit(-1L).as("dn"),
            (-v(col("values_prev"))).as("dv")))
        .groupBy(col("event_type"))
        .agg(sum(col("dn")).as("dn"), sum(col("dv")).as("dv"))
      agg0.join(delta, Seq("event_type"), "full_outer")
        .select(col("event_type"),
          (coalesce(col("n0"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
          (coalesce(col("s0"), lit(0).cast("decimal(18,2)")) +
            coalesce(col("dv"), lit(0).cast("decimal(18,2)")))
            .cast("double").as("sum_value"))
        .filter(col("n") > 0)
        .orderBy(col("event_type"))
    }),

    // The two halves of the engine composed: a DOCUMENT change stream
    // (insert/update/delete envelope) maintained in the durable store,
    // with the training-corpus quality gate (ns02's token band +
    // stopword presence) evaluated over the store's latest snapshot —
    // "keep the training corpus fresh via CDC". Deletes drop documents
    // from the corpus; the gate and accounting run on exactly what
    // survived. Store writes touch only hashed buckets; the gate is one
    // snapshot scan + one agg shuffle at any corpus size.
    "cdc26_corpus_refresh" -> ((s, d) => {
      import graft.sinks.ParquetUpsertStore
      val docs = Tables.documents(s, d)
      val op = when(pmod(col("doc_id"), lit(10)) === 7, "DELETE")
        .when(pmod(col("doc_id"), lit(10)) < 5, "INSERT")
        .otherwise("UPDATE")
      val env = ChangeFeed.wrapDml(docs, "public.documents", Seq("doc_id"),
        op, col("doc_id"), lit(0L))
      val ver = col("dml.changeTrackingVersion").cast("long")
      val store = new ParquetUpsertStore(freshDir("cdc26"), numBuckets = 8)
      store.applyBatch(ChangeFeed.wrapDdl(s, "public.documents", docs.schema)
        .unionByName(env.filter(ver % 2 === 0)), 0L)
      store.applyBatch(env.filter(ver % 2 === 1), 1L)
      val toks = split(element_at(col("values"), "text"), " ")
      val stops = Seq("the", "a", "of", "and", "to", "in", "is")
      store.snapshot(s, "public.documents")
        .select(element_at(col("values"), "source").as("source"),
          size(toks).as("n_tokens"),
          size(filter(toks, w => w.isin(stops: _*))).as("n_stop"))
        .filter(col("n_stop") > 0 &&
          col("n_tokens") >= 20 && col("n_tokens") <= 200)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens").cast("long")).as("n_tokens_total"))
        .orderBy(col("source"))
    }),

    // Incremental maintenance of a JOIN view from TWO CDC feeds — the
    // delta-join identity A1⋈B1 − A0⋈B0 = ΔA⋈B0 + A1⋈ΔB evaluated
    // over the store's manifest-pruned diffs: the per-nation aggregate
    // of (latest events ⋈ customers) advances from its batch-0 value
    // using only the two change feeds (additions + before-image
    // retractions), never rescanning either table. Both delta joins
    // have a diff-sized side; UPDATE rows contribute +new and −old
    // arms exactly once each. The oracle recomputes the view from
    // scratch — incremental must equal full recompute.
    "cdc27_incremental_join" -> ((s, d) => {
      import graft.sinks.ParquetUpsertStore
      val ev = Tables.events(s, d)
      val cu = Tables.customer(s, d)
      val envA = ChangeFeed.wrapDml(ev, "public.events", Seq("user_id"),
        opFromEvent, col("event_id"), lit(0L))
      val opB = when(pmod(col("c_custkey"), lit(10)) === 7, "DELETE")
        .when(pmod(col("c_custkey"), lit(10)) < 5, "INSERT")
        .otherwise("UPDATE")
      val envB = ChangeFeed.wrapDml(cu, "public.customer", Seq("c_custkey"),
        opB, col("c_custkey"), lit(0L))
      val ver = col("dml.changeTrackingVersion").cast("long")
      val store = new ParquetUpsertStore(freshDir("cdc27"), numBuckets = 8)
      store.applyBatch(
        ChangeFeed.wrapDdl(s, "public.events", ev.schema)
          .unionByName(ChangeFeed.wrapDdl(s, "public.customer", cu.schema))
          .unionByName(envA.filter(ver % 2 === 0))
          .unionByName(envB.filter(ver % 2 === 0)), 0L)
      store.applyBatch(
        envA.filter(ver % 2 === 1).unionByName(envB.filter(ver % 2 === 1)), 1L)

      def user(values: org.apache.spark.sql.Column) =
        element_at(values, "user_id").cast("long").as("user_id")
      def money(values: org.apache.spark.sql.Column) =
        element_at(values, "value").cast("decimal(18,2)")
      def custkey(values: org.apache.spark.sql.Column) =
        element_at(values, "c_custkey").cast("long").as("c_custkey")
      def nation(values: org.apache.spark.sql.Column) =
        element_at(values, "c_nationkey").cast("int").as("c_nationkey")

      // the view at batch 0, from the batch-0 snapshots
      val a0 = store.snapshotAt(s, "public.events", 0L)
        .select(user(col("values")), money(col("values")).as("v"))
      val b0 = store.snapshotAt(s, "public.customer", 0L)
        .select(custkey(col("values")), nation(col("values")))
      val agg0 = a0.join(b0, col("user_id") === col("c_custkey"))
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n0"), sum(col("v")).as("s0"))

      // ΔA ⋈ B0: signed event changes against the OLD customer state
      val dA = store.diff(s, "public.events", 0L, 1L)
      val dASigned = dA.filter(col("diff_op") =!= "DELETE")
        .select(user(col("values")), lit(1L).as("dn"),
          money(col("values")).as("dv"))
        .unionByName(dA.filter(col("diff_op") =!= "INSERT")
          .select(user(col("values_prev")), lit(-1L).as("dn"),
            (-money(col("values_prev"))).as("dv")))
      val t1 = dASigned.join(b0, col("user_id") === col("c_custkey"))
        .groupBy(col("c_nationkey"))
        .agg(sum(col("dn")).as("dn1"), sum(col("dv")).as("dv1"))

      // A1 ⋈ ΔB: the NEW event state against signed customer changes
      val a1 = store.snapshot(s, "public.events")
        .select(user(col("values")), money(col("values")).as("v"))
      val dB = store.diff(s, "public.customer", 0L, 1L)
      val dBSigned = dB.filter(col("diff_op") =!= "DELETE")
        .select(custkey(col("values")), nation(col("values")), lit(1L).as("sign"))
        .unionByName(dB.filter(col("diff_op") =!= "INSERT")
          .select(custkey(col("values_prev")), nation(col("values_prev")),
            lit(-1L).as("sign")))
      val t2 = a1.join(dBSigned, col("user_id") === col("c_custkey"))
        .groupBy(col("c_nationkey"))
        .agg(sum(col("sign")).as("dn2"),
          sum((col("v") * col("sign")).cast("decimal(18,2)")).as("dv2"))

      val zero = lit(0).cast("decimal(18,2)")
      agg0.join(t1, Seq("c_nationkey"), "full_outer")
        .join(t2, Seq("c_nationkey"), "full_outer")
        .select(col("c_nationkey").as("nationkey"),
          (coalesce(col("n0"), lit(0L)) + coalesce(col("dn1"), lit(0L)) +
            coalesce(col("dn2"), lit(0L))).as("n"),
          (coalesce(col("s0"), zero) + coalesce(col("dv1"), zero) +
            coalesce(col("dv2"), zero)).cast("double").as("sum_value"))
        .filter(col("n") > 0)
        .orderBy(col("nationkey"))
    }),

    // SCD type-2 dimension history from the change log: each I/U change
    // becomes a dimension row valid over [version, next change's version);
    // DELETEs emit nothing but close the prior row's window. One window
    // over one key shuffle — the warehouse-side complement of cdc04's
    // latest-state law (reference sinks only keep latest,
    // CDCTableUtil.java:72-96).
    "cdc20_scd2_history" -> ((s, d) => {
      val ev = Tables.events(s, d).withColumn("op", opFromEvent)
      CdcApply.scd2History(ev, Seq("user_id"), col("op"),
        col("event_id"))
        .select(col("user_id"), col("valid_from"), col("valid_to"),
          col("is_current"), col("op"), col("value"))
        .orderBy(col("user_id"), col("valid_from"))
    }),

    // SRC1b materialized Spark-side: CHANGETABLE(CHANGES) ⋈ base on PK —
    // latest change per key in a version window, outer-joined to the base
    // table for current attributes (missing base row ⇒ deleted).
    "cdc11_changes_join_base" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val bound = ev.agg(expr("max(event_id) DIV 5").as("lo"),
        expr("(max(event_id) DIV 5) * 3").as("hi"))
      val ch = ev.join(broadcast(bound))
        .filter(col("event_id") > col("lo") && col("event_id") <= col("hi"))
        .drop("lo", "hi")
      val latest = CdcApply.latestByKey(ch, Seq("user_id"), col("event_id"))
        .select(col("user_id"), col("event_id").as("version"),
          opFromEvent.as("op"))
      val base = Tables.customer(s, d).select(col("c_custkey"), col("c_name"))
      latest.join(base, col("user_id") === col("c_custkey"), "left_outer")
        .select(col("user_id"), col("version"), col("op"), col("c_name"))
        .orderBy(col("user_id"))
    }),

    // Changelog netting (compaction): collapse each key's change history
    // between two checkpoints to its minimal equivalent op — the
    // created-and-destroyed keys vanish, hot keys become one row
    // (CdcApply.netChanges). Turns O(changes) sink RPCs into O(live keys)
    // before the upsert sink ever sees the batch. One key-hash shuffle,
    // one WindowExec, no join — flat to any scale; AQE splits hot keys.
    "cdc28_changelog_net" -> ((s, d) => {
      val ev = Tables.events(s, d).withColumn("op", opFromEvent)
      CdcApply.netChanges(ev, Seq("user_id"), col("op"),
        col("ts"), col("event_id"))
        .select(col("user_id"), col("net_op"),
          when(col("net_op") =!= "DELETE", col("value")).as("value"),
          col("event_id").as("last_event_id"), col("n_ops"))
        .orderBy(col("user_id"))
    }),

    // DDL-mid-stream apply: the reference streams DDL records in-band and
    // alters the sink table before applying subsequent DML (reference
    // src/main/java/io/cdap/plugin/cdc/sink/CDCTableUtil.java:38-70 —
    // updateKuduTableSchema on a DDLRecord, then Puts carry the new
    // column). Relationally that situation is an old epoch whose rows
    // LACK the added column and a new epoch that carries it:
    // unionByName(allowMissingColumns) null-pads the old epoch exactly
    // like a freshly ALTERed nullable column, and the latest-state apply
    // then runs over the merged log unchanged. The epoch boundary (the
    // mean event_id, standing in for the DDL's change version) rides a
    // one-row broadcast with an exact integer compare
    // (event_id·n ≤ Σ event_id — no double rounding, no driver collect).
    // Scale: broadcast of one row + the same single key-hash shuffle as
    // cdc03; the union is a zero-shuffle concatenation.
    // Feed audit, loss side: CT admission control assumes the version
    // sequence inside an (lo, hi] window is CONTIGUOUS — the reference
    // drives CHANGETABLE by version range (reference
    // src/main/java/io/cdap/plugin/cdc/source/sqlserver/
    // CTInputDStream.java:148-169), so a hole means retention purged
    // versions the reader never admitted. The audit is a self anti-join
    // on version+1 (one shuffle on a computed key — no global
    // window/sort, which would serialize the whole feed through one
    // task) plus a one-row broadcast max to exclude the open end.
    // "Retention already purged v where v % 101 = 5" is synthesized so
    // the oracle pins a non-empty answer.
    "cdc30_version_gaps" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .filter(pmod(col("event_id"), lit(101)) =!= 5)
        .select(col("event_id"))
      val mx = ev.agg(max(col("event_id")).as("mx"))
      ev.join(ev.select(col("event_id").as("succ_id")),
          col("event_id") + 1 === col("succ_id"), "left_anti")
        .join(broadcast(mx))
        .filter(col("event_id") < col("mx"))
        .select(col("event_id").as("gap_after"),
          (col("event_id") + 1).as("first_missing"))
        .orderBy(col("gap_after"))
    }),

    // Feed audit, duplication side: GoldenGate trails replay on restart,
    // so delivery is at-least-once (reference
    // src/main/java/io/cdap/plugin/cdc/source/oracle/
    // GoldenGateKafka.java:116-169 resumes from the last committed
    // offset — anything after it can arrive twice). A replayed tail
    // (v % 97 = 0) is unioned in, and the audit surfaces every version
    // delivered more than once with its delivery count — the number the
    // exactly-once projection (distinct on the version key) absorbs.
    // One union (zero-shuffle concat) + one hash agg.
    "cdc31_replay_dupes" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"))
      val replay = ev.filter(pmod(col("event_id"), lit(97)) === 0)
      ev.unionAll(replay)
        .groupBy(col("event_id"), col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n_deliveries"))
        .filter(col("n_deliveries") > 1)
        .orderBy(col("event_id"))
    }),

    // Mergeable KMV distinct-keys artifact over the change stream — the
    // churn metric a snapshot cannot answer ("how many distinct keys has
    // this feed EVER touched?" counts deleted keys too), maintained the
    // vs40 way: each applied batch reduces to a k-bounded sketch row
    // (the k smallest distinct portable-hash values of its touched
    // keys), the rows persist as a parquet artifact, and any horizon's
    // estimate comes from MERGING artifact rows — re-sketching the union
    // of kept minima, which equals the sketch of the union exactly
    // (every value a merged sketch would keep is ≤ some input's k-th
    // minimum, so no input dropped it). The query emits each batch row,
    // the merged row, and a from-scratch monolithic row: merged ==
    // monolithic bit-for-bit is the artifact guarantee, visible in the
    // output itself. Scale shape: per-batch sketches are map-side
    // bounded aggs over that batch only; the merge explodes
    // n_batches × k artifact values (metadata-sized) and NEVER rescans
    // history — the monolithic pass exists here only as the equality
    // witness. Estimate arithmetic is ns51's (Beyer et al. 2007),
    // IEEE-exact on both engines.
    "cdc32_kmv_artifact" -> ((s, d) => {
      import graft.functions.KmvSketchAgg
      val k = 64
      val M = 2147483647.0
      val env = ChangeFeed.wrapDml(fanned(Tables.events(s, d)), "public.events",
        Seq("user_id"), opFromEvent, col("event_id"), lit(0L))
      val ver = col("dml.changeTrackingVersion").cast("long")
      val h = graft.functions.TextFunctions.portableHash(
        element_at(col("dml.rowsValues"), "user_id"))
      val dir = freshDir("cdc32")
      env.select((ver % 2).as("batch"), h.as("h"))
        .groupBy(col("batch"))
        .agg(KmvSketchAgg.kMinValues(col("h"), k).as("sk"))
        .write.mode("overwrite").parquet(dir)
      val art = s.read.parquet(dir)
      val merged = art.select(explode(col("sk")).as("h"))
        .agg(KmvSketchAgg.kMinValues(col("h"), k).as("sk"))
        .select(lit("merged").as("phase"), col("sk"))
      val mono = env.select(h.as("h"))
        .agg(KmvSketchAgg.kMinValues(col("h"), k).as("sk"))
        .select(lit("monolithic").as("phase"), col("sk"))
      def est(arr: org.apache.spark.sql.Column) =
        when(size(arr) < k, size(arr).cast("double"))
          .otherwise(lit((k - 1).toDouble) * M
            / element_at(arr, k).cast("double"))
      art.select(concat(lit("batch"), col("batch").cast("string")).as("phase"),
          col("sk"))
        .unionByName(merged).unionByName(mono)
        .select(col("phase"), size(col("sk")).cast("long").as("n_sketch"),
          element_at(col("sk"), size(col("sk"))).cast("long").as("h_max_kept"),
          est(col("sk")).as("est_distinct_keys"))
        .orderBy(col("phase"))
    }),

    // SECONDARY-INDEX lookup over the durable store — a selective
    // predicate on a NON-key column answered index-first: per applied
    // batch the value→row_key postings are appended (hash-bucketed
    // parquet, no read of history), then lookupByValue reads ONE pruned
    // postings partition, point-looks the store (min(keys, buckets)
    // bucket reads, pushed row_key IN), and re-verifies against live
    // values — stale postings from value changes/deletes prune here, so
    // the answer equals the snapshot filter exactly while reading
    // candidates instead of the table. SecondaryIndexSpec pins change/
    // delete/time-travel/redelivery; this pins the end-to-end result
    // against the raw-events oracle.
    "cdc33_indexed_lookup" -> ((s, d) => {
      import graft.sinks.{ParquetUpsertStore, SecondaryIndex}
      val env = ChangeFeed.wrapDml(fanned(Tables.events(s, d)), "public.events",
        Seq("user_id"), opFromEvent, col("event_id"), lit(0L))
      val ver = col("dml.changeTrackingVersion").cast("long")
      val root = freshDir("cdc33")
      val store = new ParquetUpsertStore(root, numBuckets = 8)
      Seq(0L, 1L).foreach { b =>
        // persist: the micro-batch feeds two consumers (index + apply),
        // the shape a real foreachBatch materializes once
        val part = env.filter(ver % 2 === b).persist()
        // Index FIRST (SecondaryIndex's ordering contract): a crash
        // between the steps leaves superset postings the lookup prunes,
        // never missing ones.
        try {
          SecondaryIndex.indexBatch(root, "public.events", "event_type", part, b)
          store.applyBatch(part, b)
        } finally part.unpersist()
      }
      SecondaryIndex.lookupByValue(s, store, root, "public.events",
          "event_type", "click")
        .select(col("row_key").cast("long").as("user_id"),
          col("version").as("event_id"),
          element_at(col("values"), "event_type").as("event_type"),
          element_at(col("values"), "value").cast("double").as("value"))
        .orderBy(col("user_id"))
    }),

    // PREFIX lookup over the secondary index — the `LIKE 'p%'` face:
    // hash buckets can't prune a prefix, so the candidate enumeration
    // scans the NARROW postings table with StartsWith pushed to its
    // parquet scan (bounded by postings size, never the store), and the
    // candidates take the same verified point-lookup path. Completes
    // the index's oracle-gated predicate vocabulary: equality (cdc33),
    // range (cdc35), intersection (cdc36), SQL pushdown (cdc37),
    // prefix (here).
    "cdc39_prefix_lookup" -> ((s, d) => {
      import graft.sinks.{ParquetUpsertStore, SecondaryIndex}
      val env = ChangeFeed.wrapDml(fanned(Tables.events(s, d)), "public.events",
        Seq("user_id"), opFromEvent, col("event_id"), lit(0L))
      val ver = col("dml.changeTrackingVersion").cast("long")
      val root = freshDir("cdc39")
      val store = new ParquetUpsertStore(root, numBuckets = 8)
      Seq(0L, 1L).foreach { b =>
        // persist: two consumers (index + apply) of one batch
        val part = env.filter(ver % 2 === b).persist()
        try {
          SecondaryIndex.indexBatch(root, "public.events", "event_type", part, b)
          store.applyBatch(part, b)
        } finally part.unpersist()
      }
      SecondaryIndex.lookupByPrefix(s, store, root, "public.events",
          "event_type", "p")
        .select(col("row_key").cast("long").as("user_id"),
          col("version").as("event_id"),
          element_at(col("values"), "event_type").as("event_type"),
          element_at(col("values"), "value").cast("double").as("value"))
        .orderBy(col("user_id"))
    }),

    // BLOOM-FRONTED point lookup — the miss fast path (HBase/Kudu bloom
    // blocks, where the reference's sinks get theirs): per-batch key
    // blooms are written BEFORE each apply (the index-ordering
    // contract), and a probe mixing live keys with never-written ghosts
    // answers identically to the plain lookup while the ghosts drop at
    // the bloom — no bucket directory is opened for them. KeyBloomSpec
    // pins the no-false-negative and pruning-rate properties; this pins
    // the end-to-end answer against the raw-events oracle.
    "cdc34_bloom_lookup" -> ((s, d) => {
      import graft.sinks.{KeyBloom, ParquetUpsertStore}
      val env = ChangeFeed.wrapDml(fanned(Tables.events(s, d)), "public.events",
        Seq("user_id"), opFromEvent, col("event_id"), lit(0L))
      val ver = col("dml.changeTrackingVersion").cast("long")
      val root = freshDir("cdc34")
      val store = new ParquetUpsertStore(root, numBuckets = 8)
      Seq(0L, 1L).foreach { b =>
        // persist: two consumers (bloom sizing+build, apply) of one batch
        val part = env.filter(ver % 2 === b).persist()
        try {
          KeyBloom.addBatch(s, root, "public.events", part, b)
          store.applyBatch(part, b)
        } finally part.unpersist()
      }
      val probes = (0L to 9L).map(_.toString) ++
        (1 to 40).map(i => s"ghost-$i")
      KeyBloom.lookup(s, store, root, "public.events", probes)
        .select(col("row_key").cast("long").as("user_id"),
          col("version").as("event_id"),
          element_at(col("values"), "event_type").as("event_type"))
        .orderBy(col("user_id"))
    }),

    // RANGE lookup over the secondary index — the numeric twin of
    // cdc33: postings carry v_num = try_cast(v as double), the range
    // predicate is PUSHED to the postings scan (row-group min/max from
    // the sorted write), candidates take the same bounded point-lookup
    // path, and the live re-verification makes the answer equal the
    // snapshot filter exactly. A mid-sequence compaction folds batch 0
    // into a snapshot rebuild before batch 1 appends, so the gated path
    // exercises folded + appended postings together (SecondaryIndexSpec
    // pins the swap/crash/in-flight faces).
    "cdc35_range_lookup" -> ((s, d) => {
      import graft.sinks.{ParquetUpsertStore, SecondaryIndex}
      val env = ChangeFeed.wrapDml(fanned(Tables.events(s, d)), "public.events",
        Seq("user_id"), opFromEvent, col("event_id"), lit(0L))
      val ver = col("dml.changeTrackingVersion").cast("long")
      val root = freshDir("cdc35")
      val store = new ParquetUpsertStore(root, numBuckets = 8)
      Seq(0L, 1L).foreach { b =>
        // persist: two consumers (index + apply) of one batch
        val part = env.filter(ver % 2 === b).persist()
        try {
          SecondaryIndex.indexBatch(root, "public.events", "value", part, b)
          store.applyBatch(part, b)
        } finally part.unpersist()
        if (b == 0L)
          SecondaryIndex.compact(s, store, root, "public.events", "value", 0L)
      }
      SecondaryIndex.lookupByRange(s, store, root, "public.events",
          "value", 10.0, 20.0)
        .select(col("row_key").cast("long").as("user_id"),
          col("version").as("event_id"),
          element_at(col("values"), "event_type").as("event_type"),
          element_at(col("values"), "value").cast("double").as("value"))
        .orderBy(col("user_id"))
    }),

    // INDEX INTERSECTION — a conjunction of predicates on two
    // different indexed non-key columns (equality on event_type, range
    // on value), each enumerating candidates from its own postings,
    // intersected on the driver, verified by ONE store point lookup
    // against live values: the bitmap-AND face. The point-lookup cost
    // is bounded by the most selective conjunct; the maxKeys guard is
    // per index.
    "cdc36_index_intersection" -> ((s, d) => {
      import graft.sinks.{ParquetUpsertStore, SecondaryIndex}
      val env = ChangeFeed.wrapDml(fanned(Tables.events(s, d)), "public.events",
        Seq("user_id"), opFromEvent, col("event_id"), lit(0L))
      val ver = col("dml.changeTrackingVersion").cast("long")
      val root = freshDir("cdc36")
      val store = new ParquetUpsertStore(root, numBuckets = 8)
      Seq(0L, 1L).foreach { b =>
        // persist: three consumers (two indexes + apply) of one batch
        val part = env.filter(ver % 2 === b).persist()
        try {
          SecondaryIndex.indexBatch(root, "public.events", "event_type", part, b)
          SecondaryIndex.indexBatch(root, "public.events", "value", part, b)
          store.applyBatch(part, b)
        } finally part.unpersist()
      }
      SecondaryIndex.lookupByAll(s, store, root, "public.events",
          equalTo = Map("event_type" -> "click"),
          inRange = Map("value" -> (10.0, 60.0)))
        .select(col("row_key").cast("long").as("user_id"),
          col("version").as("event_id"),
          element_at(col("values"), "event_type").as("event_type"),
          element_at(col("values"), "value").cast("double").as("value"))
        .orderBy(col("user_id"))
    }),

    // SQL-VISIBLE index: the same index-first answer as cdc36, but
    // reached through a PLAIN filtered read of the `graft-upsert` data
    // source — no API call in sight. The relation receives the pushed
    // equality + range filters, routes them through the postings
    // (cheapest conjunct enumerates a bounded candidate superset,
    // coverage cross-checked), turns the scan into the store's bucket
    // point lookup, and Spark re-applies the filters above it. This is
    // the reference's whole analytics story — "flatten, then hand rows
    // to Spark SQL" (SURVEY §3.4) — with the index working under SQL;
    // UpsertDataSourceSpec pins the pruning behaviorally (a deleted
    // unrelated bucket directory is never touched) and the fallbacks.
    "cdc37_sql_index_scan" -> ((s, d) => {
      import graft.sinks.{ParquetUpsertStore, SecondaryIndex}
      import org.apache.spark.sql.types._
      val env = ChangeFeed.wrapDml(fanned(Tables.events(s, d)), "public.events",
        Seq("user_id"), opFromEvent, col("event_id"), lit(0L))
      val ver = col("dml.changeTrackingVersion").cast("long")
      val root = freshDir("cdc37")
      val store = new ParquetUpsertStore(root, numBuckets = 8)
      // the DDL record gives typed=true its projection schema
      val ddl = ChangeFeed.wrapDdl(s, "public.events", StructType(Seq(
        StructField("user_id", LongType), StructField("event_id", LongType),
        StructField("event_type", StringType),
        StructField("value", DoubleType))))
      Seq(0L, 1L).foreach { b =>
        // persist: two consumers (index + apply) of one batch. ONE
        // index: the equality conjunct enumerates the candidates, the
        // un-indexed range conjunct is simply re-applied above the scan
        // (cdc36 already gates the two-index intersection at the API).
        val part = (if (b == 0L) ddl.unionByName(env.filter(ver % 2 === b))
          else env.filter(ver % 2 === b)).persist()
        try {
          SecondaryIndex.indexBatch(root, "public.events", "event_type", part, b)
          store.applyBatch(part, b)
        } finally part.unpersist()
      }
      s.read.format("graft-upsert").option("path", root)
        .option("table", "public.events").option("typed", "true").load()
        .filter(col("event_type") === "purchase" &&
          col("value") >= 10.0 && col("value") <= 90.0)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"))
        .orderBy(col("user_id"))
    }),

    // STREAMING-SINK e2e — the whole durable apply stack behind ONE
    // writeStream line: `format("graft-upsert")` with indexColumns +
    // blooms + autoMaintain appends the postings and the key bloom
    // FIRST (the crash-ordering contract), applies each micro-batch,
    // and runs the composite maintenance fold when the sidecars
    // outgrow the policy bound — zero maintenance calls in the
    // pipeline code. Ingest is the st21-style driver-fed MemoryStream
    // test double over a bounded user slice; the gated answer is the
    // index-first lookup against the stream-built store.
    // UpsertStreamSinkSpec pins replay through a checkpoint restart.
    "cdc38_stream_sink_e2e" -> ((s, d) => {
      import graft.sinks.{ParquetUpsertStore, SecondaryIndex}
      import s.implicits._
      val root = freshDir("cdc38")
      val rows = Tables.events(s, d).filter(col("user_id") < 50)
        .select(col("user_id").cast("string"), col("event_type"),
          col("value").cast("string"), opFromEvent, col("event_id"))
        .as[(String, String, String, String, Long)].collect()
      implicit val ctx = s.sqlContext
      val in = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(String, String, String, String, Long)]
      val q = ChangeFeed.wrapDml(
          in.toDF().toDF("user_id", "event_type", "value", "op0", "ver"),
          "public.events", Seq("user_id"), col("op0"), col("ver"), lit(0L))
        .writeStream.format("graft-upsert")
        .option("checkpointLocation", freshDir("cdc38-ckpt"))
        .option("path", root).option("table", "public.events")
        .option("indexColumns", "event_type").option("blooms", "true")
        .option("autoMaintain", "1")
        .start()
      try Seq(0L, 1L).foreach { b =>
        in.addData(rows.filter(_._5 % 2 == b).toSeq)
        q.processAllAvailable()
      } finally q.stop()
      val store = new ParquetUpsertStore(root)
      SecondaryIndex.lookupByValue(s, store, root, "public.events",
          "event_type", "click")
        .select(col("row_key").cast("long").as("user_id"),
          col("version").as("event_id"),
          element_at(col("values"), "event_type").as("event_type"),
          element_at(col("values"), "value").cast("double").as("value"))
        .orderBy(col("user_id"))
    }),

    "cdc29_schema_evolution" -> ((s, d) => {
      val ev = Tables.events(s, d).withColumn("op", opFromEvent)
      val cut = ev.agg(
        sum(col("event_id").cast("decimal(28,0)")).as("esum"),
        count(lit(1)).as("ecnt"))
      val tagged = ev.join(broadcast(cut))
      val pre = tagged
        .filter(col("event_id").cast("decimal(28,0)") * col("ecnt")
          <= col("esum"))
        .drop("props", "esum", "ecnt")
      val post = tagged
        .filter(col("event_id").cast("decimal(28,0)") * col("ecnt")
          > col("esum"))
        .drop("esum", "ecnt")
      CdcApply.applyChanges(
          pre.unionByName(post, allowMissingColumns = true),
          Seq("user_id"), col("op"), col("ts"), col("event_id"))
        .select(col("user_id"), col("event_id"), col("value"), col("props"))
        .orderBy(col("user_id"))
    }),

    // SQL-WRITABLE store: the pure-SQL pipeline closes its loop —
    // CREATE TABLE USING graft-upsert, INSERT INTO (change batches in
    // the relation's own read shape, batch ids auto-incremented from
    // the committed manifests), SELECT back. Two INSERTs commit two
    // batches; the second merges over the first, so the readback is
    // the converged state (latest per key, deletes folded) with zero
    // non-SQL calls. UpsertDataSourceSpec pins the named errors
    // (OVERWRITE, typed, asOf).
    "cdc40_sql_insert_apply" -> ((s, d) => {
      val root = freshDir("cdc40")
      Tables.events(s, d).createOrReplaceTempView("cdc40_events")
      s.sql("DROP TABLE IF EXISTS cdc40_store")
      s.sql(s"CREATE TABLE cdc40_store USING `graft-upsert` " +
        s"OPTIONS (path '$root', `table` 'public.events')")
      Seq(0, 1).foreach { b =>
        s.sql(s"""
          INSERT INTO cdc40_store
          SELECT CAST(user_id AS STRING) AS row_key,
                 $opFromEventSql AS op,
                 map('user_id', CAST(user_id AS STRING),
                     'event_type', event_type,
                     'value', CAST(value AS STRING)) AS `values`,
                 event_id AS version
          FROM cdc40_events WHERE event_id % 2 = $b""")
      }
      s.sql("""
        SELECT CAST(row_key AS BIGINT) AS user_id,
               version AS event_id,
               `values`['event_type'] AS event_type,
               CAST(`values`['value'] AS DOUBLE) AS value
        FROM cdc40_store ORDER BY user_id""")
    }),

    // COMPOSITE (two-column) secondary index: when every single
    // conjunct is popular (event_type matches ~20% of keys, the value
    // band ~10%) only the PAIR postings bound the conjunction — at the
    // bench scale both single enumerations overflow maxKeys and the
    // lookup answers from the pair index alone (cheapest-first picks
    // it at every scale: fewest postings). SecondaryIndexSpec pins the
    // overflow proof deterministically (singles over maxKeys → without
    // the pair index the guard fires, with it the answer is exact).
    "cdc41_composite_index" -> ((s, d) => {
      import graft.sinks.{ParquetUpsertStore, SecondaryIndex}
      val root = freshDir("cdc41")
      val store = new ParquetUpsertStore(root, numBuckets = 8)
      val env = ChangeFeed.wrapDml(
        fanned(Tables.events(s, d)).withColumn("vband",
          floor(col("value") / 10).cast("long").cast("string")),
        "public.events_log", Seq("event_id"), lit("INSERT"),
        col("event_id"), lit(0L))
      val ver = col("dml.changeTrackingVersion").cast("long")
      // pair-ONLY maintenance: the lookup's conjuncts are satisfied by
      // the composite index alone (it covers both columns for candidate
      // duty; live re-verification handles the rest) — the deployment
      // shape a 100 TB table with a known hot conjunction would run,
      // and a third of the per-batch index work of singles + pair
      Seq(0L, 1L).foreach { b =>
        val part = env.filter(ver % 2 === b).persist()
        try {
          SecondaryIndex.indexBatchComposite(root, "public.events_log",
            Seq("event_type", "vband"), part, b)
          store.applyBatch(part, b)
        } finally part.unpersist()
      }
      SecondaryIndex.lookupByAll(s, store, root, "public.events_log",
          equalTo = Map("event_type" -> "click", "vband" -> "3"),
          maxKeys = 3000)
        .select(col("row_key").cast("long").as("event_id"),
          element_at(col("values"), "user_id").cast("long").as("user_id"),
          element_at(col("values"), "event_type").as("event_type"),
          element_at(col("values"), "value").cast("double").as("value"))
        .orderBy(col("event_id"))
    }),

    // The reference's CANONICAL pipeline as ONE streaming expression:
    // CT source (DSv2 micro-batch, DDL-first envelope) →
    // writeStream.format("graft-upsert") — the cdc23 composition
    // re-stated with the one-line sink (reference CTSQLServer.java:
    // 122-148 feeding CDCKudu.java:347-376), sidecars included:
    // indexColumns + blooms + autoMaintain run the whole artifact
    // stack per micro-batch with zero maintenance calls. The gated
    // answer reads INDEX-FIRST through the stream-built postings.
    "cdc42_ct_source_to_sink" -> ((s, d) => {
      import graft.sinks.{ParquetUpsertStore, SecondaryIndex}
      import graft.sources.{ChangeFeedProvider, ChangeTrackingStore}
      import graft.streaming.CtPipeline
      import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
      val feed = "cdc42-feed"
      ChangeTrackingStore.drop(feed)
      val ct = ChangeTrackingStore.get(feed)
      ct.setSchema("public.events", StructType(Seq(
        StructField("key", LongType),
        StructField("payload", StringType))).json)
      val rows = Tables.events(s, d)
        .select(col("event_id").cast("long"), col("user_id").cast("long"),
          opFromEvent, col("event_type"))
        .orderBy(col("event_id")).collect()
      rows.foreach(r => ct.append("public.events", r.getString(2),
        r.getLong(1), r.getString(3)))
      val root = freshDir("cdc42")
      val q = CtPipeline.toEnvelope(
          s.readStream.format(classOf[ChangeFeedProvider].getName)
            .option("store", feed).option("numPartitions", "4")
            .option("maxBatchSize", (rows.length / 3 + 1).toString)
            .option("emitDdl", "true").load())
        .writeStream.format("graft-upsert")
        .option("checkpointLocation", freshDir("cdc42-ckpt"))
        .option("path", root).option("table", "public.events")
        .option("indexColumns", "payload").option("blooms", "true")
        .option("autoMaintain", "2")
        .start()
      try q.processAllAvailable() finally q.stop()
      SecondaryIndex.lookupByValue(s, new ParquetUpsertStore(root), root,
          "public.events", "payload", "click")
        .select(col("row_key").cast("long").as("user_id"),
          element_at(col("values"), "payload").as("event_type"))
        .orderBy(col("user_id"))
    }),
  )

  private val opFromEventSql =
    "CASE WHEN event_type = 'signup' THEN 'INSERT' WHEN event_type = 'error' THEN 'DELETE' ELSE 'UPDATE' END"

  val oracle: Map[String, String] = Map(
    // The envelope stringifies user_id, so the oracle hashes the same
    // VARCHAR rendering; version = event_id, so batch = event_id % 2.
    "cdc32_kmv_artifact" -> {
      val estOf = (sk: String) =>
        s"""CASE WHEN len($sk) < 64 THEN CAST(len($sk) AS DOUBLE)
           |  ELSE 63.0 * 2147483647 / CAST($sk[64] AS DOUBLE) END""".stripMargin
      s"""WITH keys AS (
         |  SELECT event_id % 2 AS batch,
         |    (${hashSql("CAST(user_id AS VARCHAR)")}) AS h
         |  FROM events),
         |db AS (SELECT DISTINCT batch, h FROM keys),
         |rb AS (SELECT batch, h,
         |         ROW_NUMBER() OVER (PARTITION BY batch ORDER BY h) AS rn
         |       FROM db),
         |skb AS (SELECT batch, list(h ORDER BY h) AS sk
         |        FROM rb WHERE rn <= 64 GROUP BY batch),
         |mg AS (SELECT list_sort(list_distinct(a.sk || b.sk))[1:64] AS sk
         |       FROM skb a, skb b WHERE a.batch = 0 AND b.batch = 1),
         |dm AS (SELECT DISTINCT h FROM keys),
         |rm AS (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn FROM dm),
         |skm AS (SELECT list(h ORDER BY h) AS sk FROM rm WHERE rn <= 64),
         |allp AS (
         |  SELECT 'batch' || CAST(batch AS VARCHAR) AS phase, sk FROM skb
         |  UNION ALL SELECT 'merged', sk FROM mg
         |  UNION ALL SELECT 'monolithic', sk FROM skm)
         |SELECT phase, CAST(len(sk) AS BIGINT) AS n_sketch,
         |  CAST(sk[len(sk)] AS BIGINT) AS h_max_kept,
         |  ${estOf("sk")} AS est_distinct_keys
         |FROM allp ORDER BY phase""".stripMargin
    },
    "cdc01_envelope_roundtrip" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        | o_orderdate, o_orderpriority
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "cdc02_flatten_extras" ->
      """SELECT o_orderkey, o_totalprice,
        | CASE WHEN o_orderstatus = 'O' THEN 'INSERT'
        |      WHEN o_orderstatus = 'F' THEN 'UPDATE'
        |      ELSE 'DELETE' END AS cdc_op_type,
        | CAST(o_orderkey AS VARCHAR) AS change_version,
        | epoch_us(o_orderdate) AS cdc_ts_micros
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "cdc03_apply_latest" ->
      """SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |        ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        |      FROM events) t
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "cdc04_apply_changes" ->
      s"""SELECT user_id, event_id, op, value
         |FROM (SELECT user_id, event_id, $opFromEventSql AS op, value,
         |        ROW_NUMBER() OVER (PARTITION BY user_id
         |          ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
         |      FROM events) t
         |WHERE rn = 1 AND op <> 'DELETE' ORDER BY user_id""".stripMargin,
    "cdc05_schema_dedup" ->
      """SELECT doc_id, source, lang
        |FROM (SELECT doc_id, source, lang,
        |        LAG(lang, 1) OVER (PARTITION BY source ORDER BY doc_id) AS prev
        |      FROM documents) t
        |WHERE prev IS NULL OR prev <> lang ORDER BY doc_id""".stripMargin,
    "cdc06_pk_change_split" ->
      """SELECT event_id, user_id, 'DELETE' AS op, value FROM events
        | WHERE event_type = 'purchase'
        |UNION ALL
        |SELECT event_id, user_id + 1000000, 'INSERT', value FROM events
        | WHERE event_type = 'purchase'
        |UNION ALL
        |SELECT event_id, user_id, 'UPDATE', value FROM events
        | WHERE event_type <> 'purchase'
        |ORDER BY event_id, op""".stripMargin,
    "cdc07_image_merge" ->
      """SELECT event_id,
        | CASE WHEN event_type = 'view' THEN -value ELSE value END AS merged_value,
        | CASE WHEN value < 50.0 THEN 'before-tag' ELSE UPPER(event_type) END AS merged_tag
        |FROM events ORDER BY event_id""".stripMargin,
    "cdc08_row_key" ->
      """SELECT l_orderkey, l_linenumber,
        | CAST(l_linenumber AS VARCHAR) || ':' || CAST(l_orderkey AS VARCHAR)
        |  AS row_key
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "cdc09_ct_window" ->
      """SELECT COUNT(*) AS n_changes, MIN(event_id) AS lo, MAX(event_id) AS hi
        |FROM events
        |WHERE event_id > (SELECT MAX(event_id) // 5 FROM events)
        |  AND event_id <= (SELECT LEAST(MAX(event_id),
        |        MAX(event_id) // 5 + MAX(event_id) // 4) FROM events)""".stripMargin,
    "cdc10_ddl_first_union" ->
      """SELECT 'ddl' AS kind, source, CAST(NULL AS BIGINT) AS doc_id
        | FROM (SELECT DISTINCT source FROM documents) s
        |UNION ALL
        |SELECT 'dml' AS kind, source, doc_id FROM documents
        |ORDER BY source, kind, doc_id NULLS FIRST""".stripMargin,
    "cdc12_flatten_then_query" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "cdc13_durable_upsert" ->
      s"""SELECT user_id, event_id, op, value
         |FROM (SELECT user_id, event_id, $opFromEventSql AS op, value,
         |        ROW_NUMBER() OVER (PARTITION BY user_id
         |          ORDER BY event_id DESC) AS rn
         |      FROM events) t
         |WHERE rn = 1 AND op <> 'DELETE' ORDER BY user_id""".stripMargin,
    "cdc18_point_lookup" ->
      s"""SELECT user_id, event_id, op, value
         |FROM (SELECT user_id, event_id, $opFromEventSql AS op, value,
         |        ROW_NUMBER() OVER (PARTITION BY user_id
         |          ORDER BY event_id DESC) AS rn
         |      FROM events) t
         |WHERE rn = 1 AND op <> 'DELETE' AND user_id BETWEEN 3 AND 9
         |ORDER BY user_id""".stripMargin,
    "cdc19_source_read" ->
      s"""SELECT user_id, event_id, op, value
         |FROM (SELECT user_id, event_id, $opFromEventSql AS op, value,
         |        ROW_NUMBER() OVER (PARTITION BY user_id
         |          ORDER BY event_id DESC) AS rn
         |      FROM events) t
         |WHERE rn = 1 AND op <> 'DELETE' AND user_id BETWEEN 3 AND 9
         |ORDER BY user_id""".stripMargin,
    "cdc16_time_travel" ->
      s"""SELECT user_id, event_id, op, value
         |FROM (SELECT user_id, event_id, $opFromEventSql AS op, value,
         |        ROW_NUMBER() OVER (PARTITION BY user_id
         |          ORDER BY event_id DESC) AS rn
         |      FROM events WHERE event_id % 2 = 0) t
         |WHERE rn = 1 AND op <> 'DELETE' ORDER BY user_id""".stripMargin,
    "cdc17_typed_snapshot" ->
      s"""SELECT user_id, event_id, event_type, value,
         | CASE WHEN event_id % 2 = 1 THEN value * 2 END AS value_sq
         |FROM (SELECT user_id, event_id, event_type, $opFromEventSql AS op, value,
         |        ROW_NUMBER() OVER (PARTITION BY user_id
         |          ORDER BY event_id DESC) AS rn
         |      FROM events) t
         |WHERE rn = 1 AND op <> 'DELETE' ORDER BY user_id""".stripMargin,
    "cdc14_jdbc_typed_decode" ->
      """SELECT * FROM (VALUES
        |  (1, CAST(9000000000 AS BIGINT), CAST(3000000000 AS BIGINT),
        |   CAST(123.45 AS DOUBLE), 7, CAST(99999999999 AS BIGINT), 5,
        |   CAST(0.5 AS REAL), 'alpha', 'note-a', DATE '2024-03-01',
        |   CAST(3723000000 AS BIGINT), TIMESTAMP '2024-03-01 10:30:00',
        |   'INSERT', '101'),
        |  (2, CAST(-9000000000 AS BIGINT), CAST(4294967295 AS BIGINT),
        |   CAST(0.10 AS DOUBLE), 0, CAST(1 AS BIGINT), -3,
        |   CAST(2.25 AS REAL), 'beta', CAST(NULL AS VARCHAR),
        |   DATE '1999-12-31', CAST(86399000000 AS BIGINT),
        |   TIMESTAMP '1999-12-31 23:59:59', 'UPDATE', '102'),
        |  (3, CAST(0 AS BIGINT), CAST(1 AS BIGINT),
        |   CAST(-42.50 AS DOUBLE), 12345, CAST(1234567890 AS BIGINT), 0,
        |   CAST(-0.5 AS REAL), 'gamma', 'note-c', DATE '2024-02-29',
        |   CAST(0 AS BIGINT), TIMESTAMP '2024-02-29 00:00:00',
        |   'DELETE', '103')
        |) AS v(id, big, ucount, price, qty, serial, tiny, ratio, name,
        |       note, d, tm, tstamp, op, version)
        |ORDER BY id""".stripMargin,
    "cdc15_goldengate_pipeline" ->
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), 'ann', CAST(10.5 AS DOUBLE), 'INSERT', CAST(2 AS BIGINT)),
        |  (CAST(1 AS BIGINT), 'ann', CAST(99.25 AS DOUBLE), 'UPDATE', CAST(3 AS BIGINT)),
        |  (CAST(2 AS BIGINT), 'bob', CAST(1.0 AS DOUBLE), 'DELETE', CAST(4 AS BIGINT)),
        |  (CAST(20 AS BIGINT), 'bob2', CAST(2.0 AS DOUBLE), 'INSERT', CAST(4 AS BIGINT)),
        |  (CAST(1 AS BIGINT), 'ann', CAST(99.25 AS DOUBLE), 'DELETE', CAST(5 AS BIGINT))
        |) AS v(id, name, bal, op, version)
        |ORDER BY version, op, id""".stripMargin,
    "cdc25_merge_into" ->
      s"""SELECT user_id, event_id, value
         |FROM (SELECT user_id, event_id, $opFromEventSql AS op, value,
         |        ROW_NUMBER() OVER (PARTITION BY user_id
         |          ORDER BY event_id DESC) AS rn
         |      FROM events) t
         |WHERE rn = 1 AND op <> 'DELETE' ORDER BY user_id""".stripMargin,
    "cdc24_gg_pipeline_e2e" ->
      s"""SELECT user_id AS key,
         | CAST(event_id AS VARCHAR) || ':' || event_type AS payload
         |FROM (SELECT user_id, event_id, event_type, $opFromEventSql AS op,
         |        ROW_NUMBER() OVER (PARTITION BY user_id
         |          ORDER BY event_id DESC) AS rn
         |      FROM events WHERE user_id < 50) t
         |WHERE rn = 1 AND op <> 'DELETE'
         |ORDER BY key""".stripMargin,
    "cdc23_ct_pipeline_e2e" ->
      s"""SELECT user_id AS key,
         | CAST(event_id AS VARCHAR) || ':' || event_type AS payload
         |FROM (SELECT user_id, event_id, event_type, $opFromEventSql AS op,
         |        ROW_NUMBER() OVER (PARTITION BY user_id
         |          ORDER BY event_id DESC) AS rn
         |      FROM events) t
         |WHERE rn = 1 AND op <> 'DELETE'
         |ORDER BY key""".stripMargin,
    "cdc22_incremental_agg" ->
      s"""SELECT event_type, COUNT(*) AS n,
         | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM (SELECT event_type, value,
         |        ROW_NUMBER() OVER (PARTITION BY user_id
         |          ORDER BY event_id DESC) AS rn,
         |        $opFromEventSql AS op
         |      FROM events) t
         |WHERE rn = 1 AND op <> 'DELETE'
         |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "cdc27_incremental_join" ->
      s"""WITH latest AS (
         |  SELECT user_id, value FROM (
         |    SELECT user_id, value, $opFromEventSql AS op,
         |      ROW_NUMBER() OVER (PARTITION BY user_id
         |        ORDER BY event_id DESC) AS rn
         |    FROM events) t
         |  WHERE rn = 1 AND op <> 'DELETE'),
         |cust AS (
         |  SELECT c_custkey, c_nationkey FROM customer
         |  WHERE c_custkey % 10 <> 7)
         |SELECT c_nationkey AS nationkey, COUNT(*) AS n,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM latest JOIN cust ON user_id = c_custkey
         |GROUP BY c_nationkey ORDER BY nationkey""".stripMargin,
    "cdc26_corpus_refresh" ->
      """WITH latest AS (
        |  SELECT source, text FROM documents WHERE doc_id % 10 <> 7),
        |gated AS (
        |  SELECT source,
        |    len(string_split(text, ' ')) AS n_tokens,
        |    len(list_filter(string_split(text, ' '),
        |      w -> w IN ('the','a','of','and','to','in','is'))) AS n_stop
        |  FROM latest)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens_total
        |FROM gated
        |WHERE n_stop > 0 AND n_tokens BETWEEN 20 AND 200
        |GROUP BY source ORDER BY source""".stripMargin,
    "cdc21_snapshot_diff" ->
      s"""WITH s0 AS (
         |  SELECT user_id, event_id, value
         |  FROM (SELECT user_id, event_id, $opFromEventSql AS op, value,
         |          ROW_NUMBER() OVER (PARTITION BY user_id
         |            ORDER BY event_id DESC) AS rn
         |        FROM events WHERE event_id % 2 = 0) t
         |  WHERE rn = 1 AND op <> 'DELETE'),
         |s1 AS (
         |  SELECT user_id, event_id, value
         |  FROM (SELECT user_id, event_id, $opFromEventSql AS op, value,
         |          ROW_NUMBER() OVER (PARTITION BY user_id
         |            ORDER BY event_id DESC) AS rn
         |        FROM events) t
         |  WHERE rn = 1 AND op <> 'DELETE')
         |SELECT COALESCE(s1.user_id, s0.user_id) AS user_id,
         |  CASE WHEN s0.user_id IS NULL THEN 'INSERT'
         |       WHEN s1.user_id IS NULL THEN 'DELETE'
         |       ELSE 'UPDATE' END AS diff_op,
         |  COALESCE(s1.event_id, s0.event_id) AS event_id,
         |  COALESCE(s1.value, s0.value) AS value
         |FROM s0 FULL OUTER JOIN s1 ON s0.user_id = s1.user_id
         |WHERE s0.user_id IS NULL OR s1.user_id IS NULL
         |   OR s0.event_id <> s1.event_id
         |ORDER BY user_id""".stripMargin,
    "cdc20_scd2_history" ->
      s"""SELECT user_id, valid_from, valid_to,
         | (valid_to IS NULL) AS is_current, op, value
         |FROM (SELECT user_id, event_id AS valid_from,
         |        LEAD(event_id) OVER (PARTITION BY user_id
         |          ORDER BY event_id) AS valid_to,
         |        $opFromEventSql AS op, value
         |      FROM events) t
         |WHERE op <> 'DELETE'
         |ORDER BY user_id, valid_from""".stripMargin,
    "cdc11_changes_join_base" ->
      s"""SELECT user_id, version, op, c_name
         |FROM (SELECT user_id, event_id AS version, $opFromEventSql AS op,
         |        ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
         |      FROM events
         |      WHERE event_id > (SELECT MAX(event_id) // 5 FROM events)
         |        AND event_id <= (SELECT (MAX(event_id) // 5) * 3 FROM events)) t
         |LEFT JOIN customer ON user_id = c_custkey
         |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "cdc28_changelog_net" ->
      s"""WITH c AS (
         |  SELECT user_id, event_id, value, $opFromEventSql AS op,
         |    ROW_NUMBER() OVER (PARTITION BY user_id
         |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn,
         |    COUNT(*) OVER (PARTITION BY user_id) AS n,
         |    FIRST_VALUE($opFromEventSql) OVER (PARTITION BY user_id
         |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS first_op
         |  FROM events),
         |l AS (SELECT * FROM c WHERE rn = n),
         |net AS (
         |  SELECT user_id,
         |    CASE WHEN first_op = 'INSERT' AND op <> 'DELETE' THEN 'INSERT'
         |         WHEN first_op = 'INSERT' AND op = 'DELETE' THEN NULL
         |         WHEN op = 'DELETE' THEN 'DELETE'
         |         ELSE 'UPDATE' END AS net_op,
         |    CASE WHEN op <> 'DELETE' THEN value END AS value,
         |    event_id AS last_event_id, CAST(rn AS BIGINT) AS n_ops
         |  FROM l)
         |SELECT * FROM net WHERE net_op IS NOT NULL
         |ORDER BY user_id""".stripMargin,
    "cdc30_version_gaps" ->
      """WITH v AS (SELECT event_id FROM events WHERE event_id % 101 <> 5)
        |SELECT a.event_id AS gap_after, a.event_id + 1 AS first_missing
        |FROM v a
        |WHERE NOT EXISTS (SELECT 1 FROM v b WHERE b.event_id = a.event_id + 1)
        |  AND a.event_id < (SELECT MAX(event_id) FROM v)
        |ORDER BY gap_after""".stripMargin,
    "cdc33_indexed_lookup" ->
      s"""SELECT user_id, event_id, event_type, value FROM (
         |  SELECT user_id, event_id, event_type, value,
         |    ROW_NUMBER() OVER (PARTITION BY user_id
         |      ORDER BY event_id DESC) AS rn,
         |    $opFromEventSql AS op
         |  FROM events) t
         |WHERE rn = 1 AND op <> 'DELETE' AND event_type = 'click'
         |ORDER BY user_id""".stripMargin,
    "cdc34_bloom_lookup" ->
      s"""SELECT user_id, event_id, event_type FROM (
         |  SELECT user_id, event_id, event_type,
         |    ROW_NUMBER() OVER (PARTITION BY user_id
         |      ORDER BY event_id DESC) AS rn,
         |    $opFromEventSql AS op
         |  FROM events WHERE user_id BETWEEN 0 AND 9) t
         |WHERE rn = 1 AND op <> 'DELETE' ORDER BY user_id""".stripMargin,
    "cdc35_range_lookup" ->
      s"""SELECT user_id, event_id, event_type, value FROM (
         |  SELECT user_id, event_id, event_type, value,
         |    ROW_NUMBER() OVER (PARTITION BY user_id
         |      ORDER BY event_id DESC) AS rn,
         |    $opFromEventSql AS op
         |  FROM events) t
         |WHERE rn = 1 AND op <> 'DELETE'
         |  AND CAST(value AS DOUBLE) BETWEEN 10.0 AND 20.0
         |ORDER BY user_id""".stripMargin,
    "cdc36_index_intersection" ->
      s"""SELECT user_id, event_id, event_type, value FROM (
         |  SELECT user_id, event_id, event_type, value,
         |    ROW_NUMBER() OVER (PARTITION BY user_id
         |      ORDER BY event_id DESC) AS rn,
         |    $opFromEventSql AS op
         |  FROM events) t
         |WHERE rn = 1 AND op <> 'DELETE' AND event_type = 'click'
         |  AND CAST(value AS DOUBLE) BETWEEN 10.0 AND 60.0
         |ORDER BY user_id""".stripMargin,
    "cdc37_sql_index_scan" ->
      s"""SELECT user_id, event_id, event_type, value FROM (
         |  SELECT user_id, event_id, event_type, value,
         |    ROW_NUMBER() OVER (PARTITION BY user_id
         |      ORDER BY event_id DESC) AS rn,
         |    $opFromEventSql AS op
         |  FROM events) t
         |WHERE rn = 1 AND op <> 'DELETE' AND event_type = 'purchase'
         |  AND CAST(value AS DOUBLE) BETWEEN 10.0 AND 90.0
         |ORDER BY user_id""".stripMargin,
    "cdc38_stream_sink_e2e" ->
      s"""SELECT user_id, event_id, event_type, value FROM (
         |  SELECT user_id, event_id, event_type, value,
         |    ROW_NUMBER() OVER (PARTITION BY user_id
         |      ORDER BY event_id DESC) AS rn,
         |    $opFromEventSql AS op
         |  FROM events WHERE user_id < 50) t
         |WHERE rn = 1 AND op <> 'DELETE' AND event_type = 'click'
         |ORDER BY user_id""".stripMargin,
    "cdc39_prefix_lookup" ->
      s"""SELECT user_id, event_id, event_type, value FROM (
         |  SELECT user_id, event_id, event_type, value,
         |    ROW_NUMBER() OVER (PARTITION BY user_id
         |      ORDER BY event_id DESC) AS rn,
         |    $opFromEventSql AS op
         |  FROM events) t
         |WHERE rn = 1 AND op <> 'DELETE' AND event_type LIKE 'p%'
         |ORDER BY user_id""".stripMargin,
    "cdc40_sql_insert_apply" ->
      s"""SELECT user_id, event_id, event_type, value FROM (
         |  SELECT user_id, event_id, event_type, value,
         |    ROW_NUMBER() OVER (PARTITION BY user_id
         |      ORDER BY event_id DESC) AS rn,
         |    $opFromEventSql AS op
         |  FROM events) t
         |WHERE rn = 1 AND op <> 'DELETE'
         |ORDER BY user_id""".stripMargin,
    "cdc41_composite_index" ->
      """SELECT event_id, user_id, event_type, value
        |FROM events
        |WHERE event_type = 'click' AND FLOOR(value / 10) = 3
        |ORDER BY event_id""".stripMargin,
    "cdc42_ct_source_to_sink" ->
      s"""SELECT user_id, event_type FROM (
         |  SELECT user_id, event_type,
         |    ROW_NUMBER() OVER (PARTITION BY user_id
         |      ORDER BY event_id DESC) AS rn,
         |    $opFromEventSql AS op
         |  FROM events) t
         |WHERE rn = 1 AND op <> 'DELETE' AND event_type = 'click'
         |ORDER BY user_id""".stripMargin,
    "cdc31_replay_dupes" ->
      """WITH log AS (
        |  SELECT event_id, user_id, event_type FROM events
        |  UNION ALL
        |  SELECT event_id, user_id, event_type FROM events
        |  WHERE event_id % 97 = 0)
        |SELECT event_id, user_id, event_type,
        |  COUNT(*) AS n_deliveries
        |FROM log GROUP BY event_id, user_id, event_type
        |HAVING COUNT(*) > 1 ORDER BY event_id""".stripMargin,
    "cdc29_schema_evolution" ->
      s"""WITH cut AS (
         |  SELECT SUM(CAST(event_id AS DECIMAL(28,0))) AS esum,
         |    COUNT(*) AS ecnt FROM events),
         |pre AS (
         |  SELECT user_id, event_id, ts, value, $opFromEventSql AS op,
         |    CAST(NULL AS VARCHAR) AS props
         |  FROM events, cut
         |  WHERE CAST(event_id AS DECIMAL(28,0)) * ecnt <= esum),
         |post AS (
         |  SELECT user_id, event_id, ts, value, $opFromEventSql AS op, props
         |  FROM events, cut
         |  WHERE CAST(event_id AS DECIMAL(28,0)) * ecnt > esum),
         |u AS (SELECT * FROM pre UNION ALL SELECT * FROM post),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
         |        ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
         |      FROM u)
         |SELECT user_id, event_id, value, props FROM r
         |WHERE rn = 1 AND op <> 'DELETE' ORDER BY user_id""".stripMargin,
  )
}
