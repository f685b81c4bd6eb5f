package graft

import graft.model._
import graft.sinks.{KeyBloom, ParquetUpsertStore, SecondaryIndex}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** The durable store surfaced as `spark.read.format("graft-upsert")`:
  * read/write round-trip, time travel + typed projection through options,
  * and pushed row_key filters turning into the store's snapshot-directory
  * pruning (proved behaviorally: a pruned read survives the deletion of a
  * directory it must not touch, the unpruned read does not). */
class UpsertDataSourceSpec extends SparkSuite {
  import spark.implicits._

  private val s1 = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  private def ddl(schema: StructType) =
    ChangeRecord.ofDdl(Ddl("dbo.t", schema.json))
  private def dml(op: String, version: Long, id: Long, values: (String, String)*) =
    ChangeRecord.ofDml(Dml(op, "dbo.t", Seq("id"),
      s1.json, Map("id" -> id.toString) ++ values.toMap, version.toString, 0L))

  private def read(dir: String): DataFrame =
    spark.read.format("graft-upsert")
      .option("path", dir).option("table", "dbo.t").load()

  test("format write appends a batch; format read returns the live snapshot") {
    val dir = checkpointDir("dsrc-roundtrip")
    val store = new ParquetUpsertStore(dir, numBuckets = 4)
    store.applyBatch(spark.createDataset(Seq(ddl(s1),
      dml(OpType.Insert, 1, 1L, "v" -> "a"),
      dml(OpType.Insert, 2, 2L, "v" -> "b"))).toDF(), 0L)
    // batch 1 through the writer path: update row 1, delete row 2
    spark.createDataset(Seq(
      dml(OpType.Update, 3, 1L, "v" -> "a2"),
      dml(OpType.Delete, 4, 2L, "v" -> "-"))).toDF()
      .write.format("graft-upsert").mode("append")
      .option("path", dir).option("table", "dbo.t").option("batchId", "1")
      .save()

    val got = read(dir).collect()
      .map(r => r.getString(0) -> r.getMap[String, String](2)("v")).toMap
    assert(got == Map("1" -> "a2"), s"live snapshot mismatch: $got")

    // time travel via asOf: the state after batch 0 only
    val at0 = spark.read.format("graft-upsert")
      .option("path", dir).option("table", "dbo.t").option("asOf", "0").load()
      .collect().map(_.getString(0)).sorted.toSeq
    assert(at0 == Seq("1", "2"))

    // typed=true projects through the recorded DDL schema
    val typed = spark.read.format("graft-upsert")
      .option("path", dir).option("table", "dbo.t").option("typed", "true").load()
    assert(typed.schema.fieldNames.toSeq == Seq("id", "v"))
    assert(typed.as[(Long, String)].collect().toSet == Set((1L, "a2")))
  }

  test("pushed row_key filters prune the read to the keys' snapshot directories") {
    val dir = checkpointDir("dsrc-prune")
    val store = new ParquetUpsertStore(dir, numBuckets = 8)
    // batch 0 populates every bucket (snap-0); batch 1 touches only
    // key 7's bucket (snap-1)
    store.applyBatch(spark.createDataset(
      (1L to 64L).map(i => dml(OpType.Insert, i, i, "v" -> s"val$i"))).toDF(), 0L)
    store.applyBatch(spark.createDataset(Seq(
      dml(OpType.Update, 100, 7L, "v" -> "v7b"))).toDF(), 1L)

    val b7 = ParquetUpsertStore.bucketOf("7", 8)
    val snap0Keys = Seq("3", "12").filter(k =>
      ParquetUpsertStore.bucketOf(k, 8) != b7)
    assert(snap0Keys.nonEmpty)

    // remove snap-1 from disk: a read pruned to snap-0 buckets must
    // never list it, so it keeps working; an unpruned read fails
    val snap1 = new java.io.File(new java.io.File(dir, "dbo.t"), "snap-1")
    assert(snap1.isDirectory)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete()
    }
    rm(snap1)

    val pruned = read(dir).filter(col("row_key").isin(snap0Keys: _*))
      .collect().map(r => r.getString(0) -> r.getMap[String, String](2)("v"))
    assert(pruned.toMap == snap0Keys.map(k => k -> s"val$k").toMap)
    // equality predicate prunes the same way
    val one = read(dir).filter(col("row_key") === snap0Keys.head)
      .select(col("version")).collect()
    assert(one.map(_.getLong(0)).toSeq == Seq(snap0Keys.head.toLong))
    // the unpruned scan must reference the deleted directory and fail —
    // this is what proves the filtered reads above actually pruned
    intercept[Exception] { read(dir).collect() }
  }

  test("mixed predicates prune only where sound (key∧non-key, key∨key, key∨non-key)") {
    // Same behavioral proof as above: snap-1 (key 7's bucket only) is
    // deleted from disk, so a read that touches it FAILS — which is how
    // "did it prune" and "did it refuse to prune" are both observable
    // without reaching into the relation. An unsound pushdown mutation
    // (e.g. pinning keys from one OR branch, or unioning conjuncts)
    // flips one of these asserts.
    val dir = checkpointDir("dsrc-prune-mixed")
    val store = new ParquetUpsertStore(dir, numBuckets = 8)
    store.applyBatch(spark.createDataset(
      (1L to 64L).map(i => dml(OpType.Insert, i, i, "v" -> s"val$i"))).toDF(), 0L)
    store.applyBatch(spark.createDataset(Seq(
      dml(OpType.Update, 100, 7L, "v" -> "v7b"))).toDF(), 1L)
    val b7 = ParquetUpsertStore.bucketOf("7", 8)
    val others = (1L to 64L).map(_.toString)
      .filter(k => ParquetUpsertStore.bucketOf(k, 8) != b7)
    val Seq(a, b) = others.take(2).toSeq
    val snap1 = new java.io.File(new java.io.File(dir, "dbo.t"), "snap-1")
    assert(snap1.isDirectory)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete()
    }
    rm(snap1)

    // key ∧ non-key: the key conjunct bounds the scan (prunes — works
    // with snap-1 gone), the non-key conjunct still filters ABOVE it
    val conj = read(dir)
      .filter(col("row_key") === a && col("version") > 0)
      .collect().map(_.getString(0)).toSeq
    assert(conj == Seq(a))
    assert(read(dir)
      .filter(col("row_key") === a && col("version") > 1000L)
      .collect().isEmpty, "re-applied non-key conjunct must still filter")

    // key ∨ key: both branches bound keys — union prunes to exactly
    // their buckets, so the read works and returns both rows
    val disj = read(dir)
      .filter(col("row_key") === a || col("row_key") === b)
      .collect().map(_.getString(0)).toSet
    assert(disj == Set(a, b))

    // key ∨ non-key: the non-key branch can match rows in ANY bucket —
    // pruning to a's bucket would silently drop them, so the relation
    // must scan everything, which (with snap-1 deleted) fails loudly
    intercept[Exception] {
      read(dir).filter(col("row_key") === a || col("version") > 0).collect()
    }

    // contradictory key ∧ key: provably-empty key set, empty result,
    // zero directories opened (works even with snap-1 gone)
    assert(read(dir)
      .filter(col("row_key") === a && col("row_key") === b)
      .collect().isEmpty)
  }

  test("typed reads route pushed filters through the secondary index, degrading soundly") {
    val dir = checkpointDir("dsrc-index")
    val store = new ParquetUpsertStore(dir, numBuckets = 8)
    val b0 = spark.createDataset(Seq(ddl(s1)) ++ (1L to 64L).map(i =>
      dml(OpType.Insert, i, i,
        "v" -> (if (i % 30 == 0) "rare" else "common")))).toDF()
    SecondaryIndex.indexBatch(dir, "dbo.t", "v", b0, 0L)
    SecondaryIndex.indexBatch(dir, "dbo.t", "id", b0, 0L)
    store.applyBatch(b0, 0L)
    // rows move in and out of the predicates so the index carries stale
    // postings the live re-verification (Spark's re-applied filters)
    // must prune: 30 leaves 'rare', 60 dies, 70 enters
    val b1 = spark.createDataset(Seq(
      dml(OpType.Update, 100, 30L, "v" -> "common"),
      dml(OpType.Delete, 101, 60L, "v" -> "rare"),
      dml(OpType.Insert, 102, 70L, "v" -> "rare"))).toDF()
    SecondaryIndex.indexBatch(dir, "dbo.t", "v", b1, 1L)
    SecondaryIndex.indexBatch(dir, "dbo.t", "id", b1, 1L)
    store.applyBatch(b1, 1L)
    def typed = spark.read.format("graft-upsert").option("path", dir)
      .option("table", "dbo.t").option("typed", "true").load()
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("id").as[Long].collect().toSet
    // equality on an indexed string column — index-first candidates,
    // stale postings pruned by the re-applied filter
    assert(ids(typed.filter(col("v") === "rare")) == Set(70L))
    // numeric range on an indexed column (v_num path)
    assert(ids(typed.filter(col("id") >= 62 && col("id") <= 80)) ==
      Set(62L, 63L, 64L, 70L))
    // IN over strings
    assert(ids(typed.filter(col("v").isin("rare", "nope"))) == Set(70L))
    // prefix (LIKE 'ra%') — pushed StringStartsWith through the postings
    assert(ids(typed.filter(col("v").startsWith("ra"))) == Set(70L))
    // numeric IN through the v_num cast (62 live, 70 live, 999 absent)
    assert(ids(typed.filter(col("id").isin(62L, 70L, 999L))) ==
      Set(62L, 70L))
    // a conjunction of indexed predicates stays exact (cheapest wins,
    // the other is re-verified above the scan)
    assert(typed.filter(col("v") === "rare" && col("id") < 70L)
      .collect().isEmpty)
    // coverage gap: a batch applied WITHOUT indexBatch — the relation
    // must fall back to the full scan, never silently drop row 71
    store.applyBatch(spark.createDataset(Seq(
      dml(OpType.Insert, 200, 71L, "v" -> "rare"))).toDF(), 2L)
    assert(ids(typed.filter(col("v") === "rare")) == Set(70L, 71L))
    // time travel + index: the as-of horizon bounds both the coverage
    // check (only batches <= 0 need covering, so the LATER gap doesn't
    // disable as-of pruning) and the postings read, verified against
    // the historical snapshot
    val typed0 = spark.read.format("graft-upsert").option("path", dir)
      .option("table", "dbo.t").option("typed", "true")
      .option("asOf", "0").load()
    assert(ids(typed0.filter(col("v") === "rare")) == Set(30L, 60L))
  }

  test("index-first typed reads prune to candidate buckets (behavioral proof)") {
    // The snap-deletion trick of the row_key-pruning tests, now for the
    // index path: batch 1 touches ONLY key 7's bucket (snap-1), the
    // 'rare' keys live in OTHER buckets, and snap-1 is deleted from
    // disk — an index-first read never lists it (works), a full scan
    // does (fails). This is what proves the filtered typed read
    // actually pruned instead of scanning-and-filtering.
    val dir = checkpointDir("dsrc-index-prune")
    val store = new ParquetUpsertStore(dir, numBuckets = 8)
    val b7 = ParquetUpsertStore.bucketOf("7", 8)
    val rare = (1L to 64L).filter(i =>
      ParquetUpsertStore.bucketOf(i.toString, 8) != b7).take(2)
    val b0 = spark.createDataset(Seq(ddl(s1)) ++ (1L to 64L).map(i =>
      dml(OpType.Insert, i, i,
        "v" -> (if (rare.contains(i)) "rare" else "common")))).toDF()
    SecondaryIndex.indexBatch(dir, "dbo.t", "v", b0, 0L)
    store.applyBatch(b0, 0L)
    val b1 = spark.createDataset(Seq(
      dml(OpType.Update, 100, 7L, "v" -> "common"))).toDF()
    SecondaryIndex.indexBatch(dir, "dbo.t", "v", b1, 1L)
    store.applyBatch(b1, 1L)
    val snap1 = new java.io.File(new java.io.File(dir, "dbo.t"), "snap-1")
    assert(snap1.isDirectory)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete()
    }
    rm(snap1)
    def typed = spark.read.format("graft-upsert").option("path", dir)
      .option("table", "dbo.t").option("typed", "true").load()
    assert(typed.filter(col("v") === "rare")
      .select("id").as[Long].collect().toSet == rare.toSet)
    // the unpruned paths reference the deleted directory and fail —
    // proving both that the filtered read pruned and that an
    // un-indexable predicate falls back to the full scan
    intercept[Exception] { typed.collect() }
    intercept[Exception] { typed.filter(col("v") =!= "x").collect() }
  }

  test("pushed row_key lookups are bloom-fronted: ghost keys open no bucket at all") {
    // The behavioral proof, taken to its limit: EVERY snapshot
    // directory is deleted from disk, so ANY bucket read fails — a
    // ghost-key lookup must still answer (empty) because the blooms
    // drop the key before a single directory opens, and a real-key
    // lookup must fail, proving the ghost path's success came from the
    // bloom and not from vacuous pruning.
    val dir = checkpointDir("dsrc-bloom")
    val store = new ParquetUpsertStore(dir, numBuckets = 8)
    Seq(0L, 1L).foreach { b =>
      val batch = spark.createDataset((1L to 32L)
        .filter(_ % 2 == b)
        .map(i => dml(OpType.Insert, i, i, "v" -> s"val$i"))).toDF()
      KeyBloom.addBatch(spark, dir, "dbo.t", batch, b)
      store.applyBatch(batch, b)
    }
    val tdir = new java.io.File(dir, "dbo.t")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete()
    }
    tdir.listFiles().filter(_.getName.startsWith("snap-")).foreach(rm)

    assert(read(dir).filter(col("row_key") === "ghost").collect().isEmpty,
      "a bloom-dropped ghost key must answer empty without touching data")
    assert(read(dir)
      .filter(col("row_key").isin("ghost-1", "ghost-2")).collect().isEmpty)
    intercept[Exception] {
      read(dir).filter(col("row_key") === "7").collect()
    }
  }

  test("the store is addressable from pure SQL: CREATE TABLE ... USING graft-upsert") {
    // The reference's whole analytics story is "flatten, then hand
    // rows to Spark SQL" — so the durable table must be reachable
    // without a line of Scala: SQL DDL registers it, SQL queries it,
    // and the pushed predicate still answers index-first underneath
    // (same behavioral proof: the unrelated bucket's snapshot is gone
    // from disk, so only a pruned read can succeed).
    val dir = checkpointDir("dsrc-sql")
    val store = new ParquetUpsertStore(dir, numBuckets = 8)
    val b7 = ParquetUpsertStore.bucketOf("7", 8)
    val rare = (1L to 64L).filter(i =>
      ParquetUpsertStore.bucketOf(i.toString, 8) != b7).take(2)
    val b0 = spark.createDataset(Seq(ddl(s1)) ++ (1L to 64L).map(i =>
      dml(OpType.Insert, i, i,
        "v" -> (if (rare.contains(i)) "rare" else "common")))).toDF()
    SecondaryIndex.indexBatch(dir, "dbo.t", "v", b0, 0L)
    store.applyBatch(b0, 0L)
    val b1 = spark.createDataset(Seq(
      dml(OpType.Update, 100, 7L, "v" -> "common"))).toDF()
    SecondaryIndex.indexBatch(dir, "dbo.t", "v", b1, 1L)
    store.applyBatch(b1, 1L)
    val snap1 = new java.io.File(new java.io.File(dir, "dbo.t"), "snap-1")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete()
    }
    rm(snap1)

    spark.sql(s"""CREATE TABLE upsert_sql_t USING `graft-upsert`
      OPTIONS (path '$dir', `table` 'dbo.t', typed 'true')""")
    try {
      val got = spark.sql(
          "SELECT id FROM upsert_sql_t WHERE v = 'rare' ORDER BY id")
        .as[Long].collect().toSeq
      assert(got == rare.sorted, s"SQL index-first read got $got")
      // the full scan proves the filtered one pruned
      intercept[Exception] {
        spark.sql("SELECT COUNT(*) FROM upsert_sql_t").collect()
      }
    } finally spark.sql("DROP TABLE upsert_sql_t")
  }

  test("the relation reports its data size, so small CDC tables auto-broadcast") {
    // Without sizeInBytes a BaseRelation reports defaultSizeInBytes
    // (effectively infinite) and every join against the store
    // sort-merges no matter how small the table — the dim-enrichment
    // join a CDC-maintained lookup table exists for would always
    // shuffle the fact side's join keys.
    val dir = checkpointDir("dsrc-stats")
    val store = new ParquetUpsertStore(dir, numBuckets = 4)
    store.applyBatch(spark.createDataset(
      (1L to 8L).map(i => dml(OpType.Insert, i, i, "v" -> s"val$i"))).toDF(), 0L)
    val reported = read(dir).queryExecution.optimizedPlan.stats.sizeInBytes
    assert(reported > 0 && reported < 10L * 1024 * 1024,
      s"relation must report its real on-disk footprint, got $reported")
    val facts = spark.range(0, 5000)
      .select(col("id").cast("string").as("row_key"), col("id").as("x"))
    val joined = facts.join(read(dir), Seq("row_key"))
    assert(joined.count() == 8L)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"small store side must auto-broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"dim enrichment must not shuffle the fact side:\n$plan")
  }

  test("one-sided numeric pushdown keeps NaN/±Inf candidates (open bounds)") {
    // Spark's comparison semantics order NaN above every value and
    // ±Infinity beyond ±MaxValue — an index pushdown that clamped
    // one-sided comparisons to a closed ±Double.MaxValue range would
    // silently drop indexed values casting to NaN/±Inf that the
    // re-applied exact filter matches. The candidates must stay a
    // superset: these reads answer index-first and must still see them.
    val dir = checkpointDir("dsrc-naninf")
    val store = new ParquetUpsertStore(dir, numBuckets = 4)
    val s2 = StructType(Seq(
      StructField("id", LongType), StructField("x", DoubleType)))
    def dml2(version: Long, id: Long, x: String) =
      ChangeRecord.ofDml(Dml(OpType.Insert, "dbo.t", Seq("id"), s2.json,
        Map("id" -> id.toString, "x" -> x), version.toString, 0L))
    val b0 = spark.createDataset(Seq(ChangeRecord.ofDdl(Ddl("dbo.t", s2.json)),
      dml2(1, 1L, "1.0"),
      dml2(2, 2L, "10.0"),
      dml2(3, 3L, "1e400"),  // casts to +Infinity
      dml2(4, 4L, "-1e400"), // casts to -Infinity
      dml2(5, 5L, "NaN"))).toDF()
    SecondaryIndex.indexBatch(dir, "dbo.t", "x", b0, 0L)
    store.applyBatch(b0, 0L)
    def typed = spark.read.format("graft-upsert").option("path", dir)
      .option("table", "dbo.t").option("typed", "true").load()
    def ids(df: DataFrame): Set[Long] =
      df.select("id").as[Long].collect().toSet
    assert(ids(typed.filter(col("x") > 5.0)) == Set(2L, 3L, 5L))
    assert(ids(typed.filter(col("x") >= 10.0)) == Set(2L, 3L, 5L))
    assert(ids(typed.filter(col("x") < 5.0)) == Set(1L, 4L))
    assert(ids(typed.filter(col("x") <= 1.0)) == Set(1L, 4L))
    // two-sided ranges still behave (finite values only, by semantics)
    assert(ids(typed.filter(col("x") >= 1.0 && col("x") <= 10.0)) ==
      Set(1L, 2L))
  }

  test("typed SQL conjunctions answer through a composite pair index (behavioral proof)") {
    // pair-ONLY index (no single-column indexes): two pushed string
    // equalities must route through the pair postings into the store's
    // bucket point lookup. Proof is behavioral, the snap-deletion
    // trick: batch 1 touches ONLY key 7's bucket (snap-1), the pair
    // members live in other buckets, snap-1 is deleted — the pruned
    // read never lists it, the full scan fails.
    val dir = checkpointDir("dsrc-pair-sql")
    val store = new ParquetUpsertStore(dir, numBuckets = 8)
    val s3 = StructType(Seq(StructField("id", LongType),
      StructField("city", StringType), StructField("kind", StringType)))
    def dml3(op: String, version: Long, id: Long, city: String,
             kind: String) =
      ChangeRecord.ofDml(Dml(op, "dbo.t", Seq("id"), s3.json,
        Map("id" -> id.toString, "city" -> city, "kind" -> kind),
        version.toString, 0L))
    val b7 = ParquetUpsertStore.bucketOf("7", 8)
    val members = (1L to 64L).filter(i =>
      ParquetUpsertStore.bucketOf(i.toString, 8) != b7).take(2)
    val b0 = spark.createDataset(Seq(ChangeRecord.ofDdl(Ddl("dbo.t", s3.json))) ++
      (1L to 64L).map(i => dml3(OpType.Insert, i, i,
        city = if (i <= 32) "e" else "w",
        kind = if (members.contains(i)) "x" else "y"))).toDF()
    SecondaryIndex.indexBatchComposite(dir, "dbo.t", Seq("city", "kind"), b0, 0L)
    store.applyBatch(b0, 0L)
    val b1 = spark.createDataset(Seq(
      dml3(OpType.Update, 100, 7L, "w", "y"))).toDF()
    SecondaryIndex.indexBatchComposite(dir, "dbo.t", Seq("city", "kind"), b1, 1L)
    store.applyBatch(b1, 1L)
    val snap1 = new java.io.File(new java.io.File(dir, "dbo.t"), "snap-1")
    assert(snap1.isDirectory)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete()
    }
    rm(snap1)
    def typed = spark.read.format("graft-upsert").option("path", dir)
      .option("table", "dbo.t").option("typed", "true").load()
    assert(typed.filter(col("city") === "e" && col("kind") === "x")
      .select("id").as[Long].collect().toSet ==
      members.filter(_ <= 32).toSet)
    intercept[Exception] { typed.collect() } // full scan needs snap-1
  }

  test("INSERT INTO applies a change batch through pure SQL, with named refusals") {
    val dir = checkpointDir("dsrc-insert")
    spark.sql("DROP TABLE IF EXISTS ins_t")
    spark.sql(s"CREATE TABLE ins_t USING `graft-upsert` " +
      s"OPTIONS (path '$dir', `table` 'dbo.t')")
    // batch 0: two inserts (auto-assigned batch id 0)
    spark.sql("""INSERT INTO ins_t VALUES
      ('1', 'INSERT', map('id', '1', 'v', 'a'), 1),
      ('2', 'INSERT', map('id', '2', 'v', 'b'), 2)""")
    // batch 1: update row 1, delete row 2 (auto-assigned batch id 1)
    spark.sql("""INSERT INTO ins_t VALUES
      ('1', 'UPDATE', map('id', '1', 'v', 'a2'), 3),
      ('2', 'DELETE', map('id', '2', 'v', '-'), 4)""")
    val got = spark.sql("SELECT row_key, `values`['v'] FROM ins_t")
      .as[(String, String)].collect().toMap
    assert(got == Map("1" -> "a2"), s"converged SQL state mismatch: $got")
    // the two INSERTs committed two distinct batches: time travel sees
    // the intermediate state
    val at0 = spark.read.format("graft-upsert").option("path", dir)
      .option("table", "dbo.t").option("asOf", "0").load()
      .select("row_key").as[String].collect().sorted.toSeq
    assert(at0 == Seq("1", "2"))
    // named refusals: INSERT OVERWRITE, typed relations, asOf relations
    val e1 = intercept[Exception] {
      spark.sql("INSERT OVERWRITE TABLE ins_t VALUES " +
        "('9', 'INSERT', map('id', '9'), 9)")
    }
    assert(e1.getMessage.contains("INSERT OVERWRITE") ||
      Option(e1.getCause).exists(_.getMessage.contains("INSERT OVERWRITE")))
    // a typed relation needs a recorded schema to even construct
    val store = new ParquetUpsertStore(dir)
    store.applyBatch(spark.createDataset(Seq(ddl(s1))).toDF(),
      store.nextBatchId(spark, "dbo.t"))
    val typedRel = graft.sources.UpsertRelation(spark.sqlContext,
      new ParquetUpsertStore(dir), dir, "dbo.t", asOf = None, typed = true)
    val e2 = intercept[IllegalArgumentException] {
      typedRel.insert(spark.range(1).toDF(), overwrite = false)
    }
    assert(e2.getMessage.contains("typed"))
    val asOfRel = graft.sources.UpsertRelation(spark.sqlContext,
      new ParquetUpsertStore(dir), dir, "dbo.t", asOf = Some(0L), typed = false)
    val e3 = intercept[IllegalArgumentException] {
      asOfRel.insert(spark.range(1).toDF(), overwrite = false)
    }
    assert(e3.getMessage.contains("asOf"))
  }

  test("read options are validated with named errors; write refuses non-append modes") {
    val e1 = intercept[IllegalArgumentException] {
      spark.read.format("graft-upsert").option("table", "t").load()
    }
    assert(e1.getMessage.contains("path"))
    val e2 = intercept[IllegalArgumentException] {
      spark.read.format("graft-upsert").option("path", "/tmp/x").load()
    }
    assert(e2.getMessage.contains("table"))
    val dir = checkpointDir("dsrc-mode")
    val e3 = intercept[IllegalArgumentException] {
      spark.createDataset(Seq(dml(OpType.Insert, 1, 1L, "v" -> "a"))).toDF()
        .write.format("graft-upsert")
        .option("path", dir).option("table", "dbo.t").save() // default ErrorIfExists
    }
    assert(e3.getMessage.contains("Append"))
  }
}
