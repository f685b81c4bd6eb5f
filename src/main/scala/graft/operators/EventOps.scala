package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics operators: gap sessionization and as-of join.
  *
  * Both are single-shuffle window formulations — the Spark-first answer
  * to operators often implemented as custom physical joins elsewhere:
  * an as-of join via union + running "last non-null" is one sort-shuffle
  * on the key, with none of the range-join blowup, and works identically
  * in batch and (with watermarked state) streaming.
  */
object EventOps {

  /** Gap-based sessionization: a new session starts when the gap to the
    * previous event of the same key exceeds `gapSeconds`. Adds
    * `session_seq` (1-based per key). */
  def sessionize(df: DataFrame, key: Column, ts: Column, tieBreak: Column,
                 gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts, tieBreak)
    val newSession = when(
      lag(ts, 1).over(w).isNull ||
        unix_micros(ts) - unix_micros(lag(ts, 1).over(w)) > gapSeconds * 1000000L,
      1L).otherwise(0L)
    df.withColumn("session_seq",
      sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Bucketized range join: right rows of the same key with timestamp in
    * the half-open window (leftTs - windowMicros, leftTs). A naive range
    * condition plans as a broadcast-nested-loop join; bucketizing the
    * time axis turns it into a shuffled equi-join on (key, bucket) — the
    * left side explodes to the two buckets its window can span, the
    * right keeps one, so each qualifying pair matches exactly once and
    * the exact range predicate filters the bucket-adjacent false
    * positives. Inner-join semantics.
    *
    * @return left row + right row columns (right's renamed via `rPrefix`)
    */
  def rangeJoin(left: DataFrame, right: DataFrame, key: String,
                leftTsCol: String, rightTsCol: String,
                windowMicros: Long): DataFrame = {
    require(left.columns.toSet.intersect(right.columns.toSet) == Set(key),
      s"left/right columns must be disjoint apart from '$key' (alias before joining)")
    val l = left.withColumn("__lts", unix_micros(col(leftTsCol)))
      .withColumn("__b", explode(array(
        expr(s"__lts DIV $windowMicros"),
        expr(s"(__lts DIV $windowMicros) - 1"))))
    val r = right.withColumn("__rts", unix_micros(col(rightTsCol)))
      .withColumn("__b", expr(s"__rts DIV $windowMicros"))
    l.join(r, Seq(key, "__b"))
      .filter(col("__rts") >= col("__lts") - windowMicros &&
        col("__rts") < col("__lts"))
      .drop("__b", "__lts", "__rts")
  }

  /** Left-outer form of [[rangeJoin]]: left rows with no right match in
    * the window survive once, null-padded on the right columns — the
    * batch twin of Structured Streaming's watermarked left-outer
    * stream-stream join (unmatched state null-emits on expiry). The
    * bucketized inner join can't be made outer directly (each left row
    * probes two buckets, so "no match in this bucket" ≠ "no match"), so
    * the outer tier is the inner join + a left-anti join of `left`
    * against the matched `leftIdCol`s — both shuffled equi-joins, never
    * a nested loop. The inner result feeds BOTH the union branch and the
    * anti join, so it is eagerly checkpointed (the vs13/ns32 barrier
    * pattern) — without the barrier the two consumers get differently
    * pruned copies of the range-join subplan that ReuseExchange cannot
    * dedupe, and the dominant join runs twice.
    *
    * CONTRACT: `leftIdCol` must uniquely identify left rows — if two
    * left rows share an id and one matches, the anti join suppresses
    * the other's null-padded emission entirely (rows silently lost).
    * The uniqueness check is two extra jobs over `left` (a count and a
    * distinct count), too heavy to always run at corpus scale, so it is
    * opt-in: pass `verifyUniqueIds = true`, or set the session conf
    * `graft.rangeJoin.verifyUniqueIds=true` (debug runs / CI), and a
    * violated contract fails loudly instead of dropping rows. */
  def rangeJoinLeftOuter(left: DataFrame, right: DataFrame, key: String,
                         leftIdCol: String, leftTsCol: String, rightTsCol: String,
                         windowMicros: Long,
                         verifyUniqueIds: Boolean = false): DataFrame = {
    val verify = verifyUniqueIds || left.sparkSession.conf
      .getOption("graft.rangeJoin.verifyUniqueIds").exists(_.toBoolean)
    if (verify) {
      val total = left.count()
      val uniq = left.select(col(leftIdCol)).distinct().count()
      require(total == uniq,
        s"rangeJoinLeftOuter: leftIdCol '$leftIdCol' is not unique " +
          s"($uniq distinct ids over $total rows) — duplicate-id left rows " +
          "would silently lose their unmatched emission")
    }
    val inner = rangeJoin(left, right, key, leftTsCol, rightTsCol, windowMicros)
      .localCheckpoint(true)
    val matched = inner.select(col(leftIdCol)).distinct()
    val unmatched = right.columns.filterNot(_ == key)
      .foldLeft(left.join(matched, Seq(leftIdCol), "left_anti")) { (df, c) =>
        df.withColumn(c, lit(null).cast(right.schema(c).dataType))
      }
    inner.unionByName(unmatched)
  }

  /** As-of join (latest right-side value at or before each left row),
    * realized as a running windowed max over the unioned stream: for each
    * row, `asof_<valueAlias>` = the most recent `rightTs` where `rightPred`
    * held. No range join, no per-row probe — one shuffle on `key`. */
  def asofLatestTs(df: DataFrame, key: Column, ts: Column, tieBreak: Column,
                   rightPred: Column, alias: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts, tieBreak)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(alias, max(when(rightPred, ts)).over(w))
  }

  /** Value-carrying as-of join: each row gets the latest `valueCol` among
    * rows where `rightPred` held, at-or-before its `ts` — the temporal /
    * versioned-dimension enrichment ("the dimension version valid at
    * event time", Flink's temporal table join; the query-time face of
    * [[CdcApply.scd2History]]'s validity windows). Same-instant dimension
    * rows sort BEFORE facts (rightPred descending in the tie), so a
    * change applies to facts of the same timestamp; among same-instant
    * dimension rows the highest `tieBreak` wins. One shuffle on `key`,
    * no join, no per-row probe. */
  def asofLatestValue(df: DataFrame, key: Column, ts: Column, tieBreak: Column,
                      rightPred: Column, valueCol: Column, alias: String): DataFrame = {
    val w = Window.partitionBy(key)
      .orderBy(ts.asc, rightPred.cast("int").desc, tieBreak.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(alias,
      last(when(rightPred, valueCol), ignoreNulls = true).over(w))
  }
}
