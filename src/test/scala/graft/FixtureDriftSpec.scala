package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fixture-drift tripwire.
  *
  * Round 11 lost 38 correctness entries, 8 plan-audit tests and the whole
  * bench to a single silent driver-side change: /root/testdata was
  * regenerated with `events.ts` as timestamp[us] where it used to be
  * TIMESTAMP(NANOS). This suite turns the next such regeneration into a
  * NAMED failure:
  *   1. the loader-visible schema of every sf0.001 table is pinned;
  *   2. [[Tables.events]] is exercised under every `ts` encoding it
  *      claims to adapt to (long-nanos, TIMESTAMP_NTZ, TIMESTAMP).
  */
class FixtureDriftSpec extends SparkSuite {

  private def loaded(name: String): StructType =
    Tables(spark, sf0001, name).schema

  private def fields(s: StructType): Seq[(String, DataType)] =
    s.fields.toSeq.map(f => f.name -> f.dataType)

  test("fixture schemas: TPC-H-ish tables match the pinned shapes") {
    assert(fields(loaded("region")) === Seq(
      "r_regionkey" -> IntegerType, "r_name" -> StringType))
    assert(fields(loaded("nation")) === Seq(
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType))
    assert(fields(loaded("customer")) === Seq(
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType))
    assert(fields(loaded("supplier")) === Seq(
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType))
    assert(fields(loaded("part")) === Seq(
      "p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType))
    val orders = fields(loaded("orders")).toMap
    assert(orders("o_orderkey") === LongType)
    assert(orders("o_custkey") === LongType)
    assert(orders("o_totalprice") === DoubleType)
    // o_orderdate drifting from timestamp to date (or back) would shift
    // every date-predicate query; pin the family, not the exact variant.
    assert(Set[DataType](DateType, TimestampType, TimestampNTZType)
      .contains(orders("o_orderdate")), s"o_orderdate: ${orders("o_orderdate")}")
    val li = fields(loaded("lineitem")).toMap
    assert(li("l_orderkey") === LongType)
    assert(li("l_quantity") === DoubleType)
    assert(li("l_extendedprice") === DoubleType)
    assert(Set[DataType](DateType, TimestampType, TimestampNTZType)
      .contains(li("l_shipdate")), s"l_shipdate: ${li("l_shipdate")}")
  }

  test("fixture schemas: documents / embeddings match the pinned shapes") {
    assert(fields(loaded("documents")) === Seq(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType))
    val emb = fields(loaded("embeddings")).toMap
    assert(emb("vec_id") === LongType)
    assert(emb("embedding") === ArrayType(FloatType, containsNull = true) ||
      emb("embedding") === ArrayType(FloatType, containsNull = false),
      s"embedding: ${emb("embedding")}")
    assert(emb("label") === IntegerType)
  }

  test("Fixture.json fingerprints every table with rows + schema hash") {
    // The fingerprint that Bench/Verify embed in their artifacts must
    // (a) cover every fixture table, (b) agree with an independently
    // computed count + schema hash, and (c) degrade to a named err
    // entry — not an exception — on an unreadable table.
    val js = Fixture.json(spark, sf0001)
    Fixture.tables.foreach { t =>
      assert(js.contains(s""""$t":{"""), s"missing $t in $js")
    }
    // Schema hashes are serialized as JSON STRINGS: 64-bit ints past
    // 2^53 corrupt in double-based JSON parsers, which is exactly the
    // tooling the fingerprint targets.
    val docs = Tables(spark, sf0001, "documents")
    val expected =
      s""""documents":{"rows":${docs.count()},"schema":"${
        Fixture.schemaHash(docs.schema)}"}"""
    assert(js.contains(expected), s"documents fingerprint drifted: $js")
    // events goes through the adapting loader, so its schema hash is of
    // the NORMALISED shape (ts: TIMESTAMP) whatever the file encodes.
    assert(js.contains(s""""events":{"rows":${
      Tables.events(spark, sf0001).count()},"schema":"${
      Fixture.schemaHash(Tables.events(spark, sf0001).schema)}"}"""))
    val broken = Fixture.json(spark, "target/no-such-fixture-dir")
    Fixture.tables.foreach { t =>
      assert(broken.contains(s""""$t":{"err":"""), s"missing err for $t")
    }
  }

  test("Tables.events adapts to the on-disk fixture and yields TIMESTAMP") {
    val ev = Tables.events(spark, sf0001)
    assert(ev.schema("ts").dataType === TimestampType,
      s"loader must normalise ts to TIMESTAMP, got ${ev.schema("ts").dataType}")
    val row = ev.agg(count("*"), min("ts"), max("ts")).head()
    assert(row.getLong(0) > 0)
    // Sanity window: generated event times live in this decade, so a
    // unit slip (ns read as µs = year ~1970; µs read as ns = year ~56k)
    // shows up as an out-of-range min/max, not a silent 1000x shift.
    val lo = java.sql.Timestamp.valueOf("2015-01-01 00:00:00")
    val hi = java.sql.Timestamp.valueOf("2035-01-01 00:00:00")
    assert(!row.getTimestamp(1).before(lo), s"min ts ${row.getTimestamp(1)}")
    assert(!row.getTimestamp(2).after(hi), s"max ts ${row.getTimestamp(2)}")
  }

  test("Tables.events: long-nanos encoding divides to micros") {
    // Spark cannot write TIMESTAMP(NANOS) parquet; under the legacy
    // nanosAsLong conf such a file is loader-visible as a plain int64 —
    // which is exactly what this twin writes, so it exercises the same
    // LongType branch of Tables.events as the historical fixture did.
    val dir = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "evnanos-")
      .toAbsolutePath.toString
    import spark.implicits._
    val nanos = 1720000000L * 1000000000L // 2024-07-03T09:46:40Z in ns
    Seq((1L, nanos, 7L, "click", 1.0, "{}"),
        (2L, nanos + 1500L, 8L, "view", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType === TimestampType)
    val got = ev.orderBy("event_id").select(unix_micros(col("ts"))).as[Long].collect()
    // ns → µs must FLOOR-divide (DuckDB semantics): +1500 ns → +1 µs.
    assert(got === Array(1720000000L * 1000000L, 1720000000L * 1000000L + 1L))
  }

  test("Tables.events: TIMESTAMP_NTZ encoding passes through unshifted") {
    val dir = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "evntz-")
      .toAbsolutePath.toString
    import spark.implicits._
    val micros = 1720000000L * 1000000L
    Seq((1L, micros, 7L, "click", 1.0, "{}"))
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("us")).cast(TimestampNTZType))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // Confirm the twin really round-trips as NTZ before testing the loader.
    assert(spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
      === TimestampNTZType)
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType === TimestampType)
    // Session is UTC, so NTZ→LTZ must preserve the micros value exactly.
    val got = ev.select(unix_micros(col("ts"))).as[Long].head()
    assert(got === micros)
  }
}
