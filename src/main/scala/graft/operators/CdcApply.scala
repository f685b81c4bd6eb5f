package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch re-expression of the reference's sink upsert semantics.
  *
  * The reference applies a change stream to a PK-addressed store: INSERT/
  * UPDATE become Put-all-columns, DELETE removes the row (reference:
  * src/main/java/io/cdap/plugin/cdc/sink/CDCTableUtil.java:72-96). Because
  * the store is keyed, the *final state* after applying an ordered change
  * log is exactly "latest change per key, minus keys whose latest change is
  * a DELETE". That is a window computation — shuffle once by key, no
  * driver-side loop — and it makes replay order irrelevant (strictly
  * stronger than the reference's at-least-once idempotence argument,
  * SURVEY.md §7.3).
  *
  * At scale: one hash-partition shuffle on the PK; AQE handles skewed keys.
  * For streaming, the same expression runs per micro-batch in foreachBatch
  * against the sink (see [[graft.sinks.UpsertSink]]).
  */
object CdcApply {

  /** Latest row per key by `version` (ties broken by `tieBreak`). */
  def latestByKey(changes: DataFrame, keys: Seq[String],
                  version: Column, tieBreak: Column*): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((version.desc +: tieBreak.map(_.desc)): _*)
    changes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Final table state after applying a change log: latest change per key,
    * dropping keys whose latest op is DELETE. `opCol` holds
    * INSERT/UPDATE/DELETE. */
  def applyChanges(changes: DataFrame, keys: Seq[String], opCol: Column,
                   version: Column, tieBreak: Column*): DataFrame =
    latestByKey(changes, keys, version, tieBreak: _*)
      .filter(opCol =!= graft.model.OpType.Delete)

  /** Null-strict row-key segment: a NULL primary-key value fails the task
    * instead of being silently dropped by concat_ws (which would collapse
    * distinct composite keys like (a,NULL) and (a) onto 'a' and let one
    * malformed DML record overwrite an unrelated row). The reference has
    * the same fail-fast posture — it NPEs on `changes.get(pk).toString()`
    * (reference CDCTableUtil.java:100-104); we name the offending key. */
  def strictKeySegment(name: Column, value: Column): Column =
    when(value.isNull, raise_error(concat(
      lit("null or missing primary-key value for '"), name,
      lit("' in row-key derivation"))))
      .otherwise(value.cast("string"))

  /** Slowly-changing-dimension type-2 history from a change log: every
    * INSERT/UPDATE becomes a versioned dimension row whose validity window
    * is [its version, the next change's version) — a DELETE contributes no
    * row but still closes its predecessor's window. The reference's sinks
    * only ever converge to the latest state (CDCTableUtil.java:72-96);
    * keeping the full history is the natural warehouse-side extension once
    * the change log is a DataFrame.
    *
    * At scale this is the same single hash-shuffle as [[latestByKey]]: one
    * window over the key, `lead` for the closing version, a filter. No
    * join, no second shuffle; AQE handles skewed keys.
    */
  def scd2History(changes: DataFrame, keys: Seq[String], opCol: Column,
                  version: Column, tieBreak: Column*): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((version.asc +: tieBreak.map(_.asc)): _*)
    changes
      .withColumn("valid_from", version)
      .withColumn("valid_to", lead(version, 1).over(w))
      .withColumn("is_current", col("valid_to").isNull
        && opCol =!= graft.model.OpType.Delete)
      .filter(opCol =!= graft.model.OpType.Delete)
  }

  /** Net (compact) a change log to the minimal equivalent changelog:
    * per key, the ordered composition of all ops collapses to at most one —
    *
    *   - first=INSERT, last≠DELETE → INSERT carrying the latest image
    *   - first=INSERT, last=DELETE → nothing (key created and destroyed
    *     inside the window, invisible to a downstream checkpoint)
    *   - first≠INSERT, last=DELETE → DELETE
    *   - otherwise                 → UPDATE carrying the latest image
    *
    * This is standard changelog compaction (Kafka compacted topics, Flink
    * changelog normalization). The reference replays every change against
    * the sink one Put/Delete at a time (reference
    * src/main/java/io/cdap/plugin/cdc/sink/CDCTableUtil.java:72-96);
    * netting first turns O(changes) sink RPCs into O(live keys) per
    * checkpoint interval — the difference between feasible and not when a
    * hot key takes thousands of updates between checkpoints.
    *
    * Output = the last change row per surviving key, plus `net_op` and
    * `n_ops` (how many raw changes the row nets over). At scale: ONE hash
    * shuffle on the key; first/last/count all ride a single window
    * partition (one WindowExec, no join); AQE splits skewed keys.
    */
  def netChanges(changes: DataFrame, keys: Seq[String], opCol: Column,
                 version: Column, tieBreak: Column*): DataFrame = {
    import graft.model.OpType
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((version.asc +: tieBreak.map(_.asc)): _*)
    changes
      .withColumn("__rn", row_number().over(w))
      .withColumn("__first_op", first(opCol).over(w))
      .withColumn("__has_next", lead(lit(1), 1).over(w))
      .filter(col("__has_next").isNull) // keep only the last change per key
      .withColumn("net_op",
        when(col("__first_op") === OpType.Insert && opCol =!= OpType.Delete,
          OpType.Insert)
          .when(col("__first_op") === OpType.Insert && opCol === OpType.Delete,
            lit(null).cast("string"))
          .when(opCol === OpType.Delete, OpType.Delete)
          .otherwise(OpType.Update))
      .filter(col("net_op").isNotNull)
      .withColumn("n_ops", col("__rn").cast("long"))
      .drop("__rn", "__first_op", "__has_next")
  }

  /** The reference's row-key derivation: PK *names* sorted lexically, and
    * the corresponding values joined with ':' in that name order
    * (reference CDCTableUtil.java:98-105 — `primaryKeys.stream().sorted()`
    * sorts the key names, then maps each to its value). Values themselves
    * are never reordered, so distinct composite keys like (src=1,dst=5)
    * and (src=5,dst=1) stay distinct. */
  def rowKey(keys: Seq[(String, Column)]): Column =
    concat_ws(":", keys.sortBy(_._1).map { case (n, c) =>
      strictKeySegment(lit(n), c)
    }: _*)
}
