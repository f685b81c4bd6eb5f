package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** LIVE schema-drift monitor over in-band open-schema payloads — the
  * streaming twin of the q64 batch profile (the metadata query an
  * open-schema ingest runs continuously: "which keys and types appear,
  * and which of them are NEW?"). The reference's dynamic in-band-schema
  * stance (reference common/Schemas.java:50-54 — every record carries
  * its schema) read as a monitor: each micro-batch is profiled into
  * key × canonical-type-tier counts in ONE scan, folded into a keyed
  * parquet artifact, and every row is stamped with its drift status
  * against everything the monitor saw in EARLIER batches —
  * `new_key` (first appearance of the key), `new_type` (known key,
  * unseen type tier: the in-band DDL alert), `steady`. Alerting is
  * reading the non-steady rows of the latest batch.
  *
  * Scale shape: the per-batch profile is scan → row-local explode →
  * map-side-combined count (fan-out bounded by keys-per-doc); the
  * seen-set read is key-cardinality × 7 tiers — metadata-sized at any
  * corpus size — and the append is one small file per batch (the cdc32
  * streaming-artifact posture). The artifact itself IS the monitor's
  * history table: epoch × key × tier × count × status.
  */
object DriftMonitor {

  /** Canonical cross-engine type TIER of a `schema_of_variant`
    * spelling — engines disagree on fine-grained types (DECIMAL(3,1)
    * vs DOUBLE, BIGINT vs UBIGINT), the 7-tier vocabulary is what a
    * drift alert should compare (q64's collapse rule). */
  private val TierSql = """CASE
      WHEN sv IN ('BIGINT', 'INT', 'SMALLINT', 'TINYINT') THEN 'integer'
      WHEN sv = 'STRING' THEN 'string'
      WHEN sv = 'BOOLEAN' THEN 'boolean'
      WHEN sv IN ('VOID', 'NULL') THEN 'null'
      WHEN sv LIKE 'ARRAY%' THEN 'array'
      WHEN sv LIKE 'OBJECT%' OR sv LIKE 'STRUCT%' THEN 'object'
      ELSE 'number'
    END"""

  private val monitorSchema = StructType(Seq(
    StructField("epoch", IntegerType), StructField("key", StringType),
    StructField("vtype", StringType), StructField("n", LongType),
    StructField("status", StringType)))

  private val viewCounter = new java.util.concurrent.atomic.AtomicLong()

  /** key × type-tier × count profile of ONE micro-batch of documents
    * (`epoch` int, `v` variant): one scan, `variant_explode` over each
    * document's top level, tier-collapsed `schema_of_variant`,
    * hash-aggregated counts — exactly q64's per-epoch shape, applied
    * to a single batch. */
  def profileBatch(docs: DataFrame): DataFrame = {
    val view = s"graft_drift_docs_${viewCounter.incrementAndGet()}"
    // register AND query on the DataFrame's OWN session: under
    // foreachBatch the batch belongs to an isolated micro-batch session
    // clone, and a view registered there is invisible to the outer one
    docs.createOrReplaceTempView(view)
    docs.sparkSession.sql(s"""
      SELECT epoch, key, $TierSql AS vtype, COUNT(*) AS n
      FROM (
        SELECT epoch, p.key AS key, schema_of_variant(p.value) AS sv
        FROM $view, LATERAL variant_explode(v) AS p)
      GROUP BY epoch, key, vtype""")
  }

  private def batchDirs(spark: SparkSession, dir: String): Seq[(Long, String)] = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    try fs.listStatus(new org.apache.hadoop.fs.Path(dir)).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.matches("batch-\\d+") =>
        n.stripPrefix("batch-").toLong -> s"$dir/$n" }
      .sortBy(_._1)
    catch { case _: java.io.FileNotFoundException => Seq.empty }
  }

  private def readDirs(spark: SparkSession, paths: Seq[String]): Option[DataFrame] =
    if (paths.isEmpty) None
    else try Some(spark.read.parquet(paths: _*))
    catch { case _: org.apache.spark.sql.AnalysisException => None }

  /** Fold one micro-batch's profile into the artifact at `dir`,
    * stamping each row's drift status against the history of batches
    * with SMALLER ids. The seen set collects to the driver
    * deliberately — it is bounded by key cardinality × 7 tiers (the
    * monitor's own output domain), never by corpus size. Each batch
    * writes its OWN `batch-<id>` directory with overwrite semantics,
    * so an at-least-once replay (foreachBatch redelivery, a crash
    * mid-write) recomputes the same rows against the same
    * smaller-id history and overwrites them in place — idempotent,
    * never double-counted alerts. */
  def ingest(spark: SparkSession, dir: String, profile: DataFrame,
             batchId: Long): Unit = {
    val prior = batchDirs(spark, dir).collect {
      case (id, p) if id < batchId => p
    }
    val seen: Array[(String, String)] = readDirs(spark, prior)
      .map(_.select(col("key"), col("vtype")).distinct()
        .collect().map(r => (r.getString(0), r.getString(1))))
      .getOrElse(Array.empty)
    // NUL-joined pair encoding: unambiguous for any key content (a
    // visible-char join would alias composite keys)
    val seenKeys = seen.map(_._1).distinct.toSeq
    val seenPairs = seen.map { case (k, t) => (k + "\u0000" + t) }.toSeq
    profile
      .withColumn("status",
        when(not(col("key").isin(seenKeys: _*)), lit("new_key"))
          .when(not(concat_ws("\u0000", col("key"), col("vtype"))
            .isin(seenPairs: _*)), lit("new_type"))
          .otherwise(lit("steady")))
      .select(col("epoch").cast("int"), col("key"), col("vtype"),
        col("n").cast("long"), col("status"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/batch-$batchId")
  }

  /** The monitor's history table: every ingested batch's profile rows
    * with their stamped drift status. */
  def monitor(spark: SparkSession, dir: String): DataFrame =
    readDirs(spark, batchDirs(spark, dir).map(_._2))
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], monitorSchema))
}
