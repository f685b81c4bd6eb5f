package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loaders for the driver-generated test fixtures
  * (TESTDATA.md). All queries take the sf directory as a runtime
  * parameter so the same plan runs at any scale factor.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.parquet's `ts` encoding has drifted across fixture
    * generations: TIMESTAMP(NANOS) (which Spark's parquet reader rejects
    * outright — PARQUET_TYPE_ILLEGAL — so the legacy nanos-as-long conf
    * surfaces it as a raw long), then timestamp[us] (read as
    * TIMESTAMP_NTZ). Adapt on the loaded schema instead of assuming one:
    *  - LongType          → raw nanos; floor-divide to micros, exactly how
    *                        DuckDB truncates ns→µs, so oracle parity holds
    *  - TimestampNTZType  → cast to session-local TIMESTAMP; the session
    *                        runs UTC so the micros value is unchanged and
    *                        the DuckDB oracle (native read) still matches
    *  - TimestampType     → already what downstream expects
    * The legacy conf is harmless for non-nanos files, so it is set
    * unconditionally before the footer read. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = apply(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }

  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
