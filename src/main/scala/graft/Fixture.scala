package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

/** Fixture fingerprint: per-table row counts + a schema hash, embedded
  * in every Bench emission and Verify dump so a recorded round is
  * self-describing about WHAT data it ran on.
  *
  * Motivation: /root/testdata was regenerated between the r10 and r11
  * recordings, and the resulting r12-vs-r10 per-query bench deltas
  * (ns39 +23%, ns40 +29% on byte-unchanged code) were only decidable as
  * fixture drift by reading round-11 prose. With the fingerprint inside
  * the artifact, "same code, different numbers" is answerable from the
  * two JSON files alone: fingerprints equal → a real regression;
  * different → the data moved underneath.
  *
  * The schema hash is the same portable polynomial hash the query tier
  * uses ([[graft.functions.PortableHashExpr]]) over the canonical
  * `name:TYPE,name:TYPE` rendering of the loader-visible schema — NOT
  * the raw parquet footer, so an encoding the loaders adapt away (the
  * events.ts nanos↔micros drift, Tables.scala) still changes the
  * fingerprint only if the loader-visible shape changes. Row counts are
  * parquet-metadata-cheap at any scale factor.
  */
object Fixture {
  val tables: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Canonical schema rendering hashed into the fingerprint. */
  def schemaString(st: StructType): String =
    st.fields.map(f => s"${f.name}:${f.dataType.sql}").mkString(",")

  def schemaHash(st: StructType): Long =
    graft.functions.PortableHashExpr.hashUtf8(
      UTF8String.fromString(schemaString(st)))

  /** One table's fingerprint, or the named failure: a table that cannot
    * be read must show up as an err entry, never kill the enclosing
    * Bench/Verify run (the fingerprint is diagnostics, not a gate). */
  def table(spark: SparkSession, sfDir: String, name: String)
      : Either[String, (Long, Long)] =
    try {
      // Go through the adapting loaders so the fingerprint reflects what
      // queries actually see (events normalises its ts encoding).
      val df = name match {
        case "events" => Tables.events(spark, sfDir)
        case t => Tables(spark, sfDir, t)
      }
      Right((df.count(), schemaHash(df.schema)))
    } catch {
      case e: Throwable =>
        Left(s"${e.getClass.getName}: ${Option(e.getMessage).getOrElse("")}"
          .take(200))
    }

  /** `{"lineitem":{"rows":600572,"schema":1234567},...}` — one object
    * per table; unreadable tables carry an "err" member instead. */
  def json(spark: SparkSession, sfDir: String): String =
    tables.map { t =>
      val body = table(spark, sfDir, t) match {
        // Schema hash as a string: bare 64-bit ints past 2^53 are
        // corrupted by double-based JSON parsers (JS, older jq), and
        // the fingerprint exists precisely for cross-round equality
        // checks in that tooling.
        case Right((rows, h)) => s"""{"rows":$rows,"schema":"$h"}"""
        case Left(err) =>
          s"""{"err":"${err.replace("\\", "\\\\").replace("\"", "\\\"")
            .replaceAll("[\\x00-\\x1f]", " ")}"}"""
      }
      s""""$t":$body"""
    }.mkString("{", ",", "}")
}
