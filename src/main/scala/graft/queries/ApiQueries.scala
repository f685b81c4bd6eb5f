package graft.queries

import graft.Tables
import graft.functions.{Aggregators, ZOrder}
import graft.operators.Skew
import org.apache.spark.sql.functions._

/** API-surface queries: the typed Dataset/Aggregator tier, the SQL entry
  * point, and the sketch tier (SURVEY.md §2.3 "UDF/UDAF/UDTF surface").
  */
object ApiQueries {
  import Q._

  val queries: Map[String, QueryFn] = Map(
    // Custom typed Aggregator[IN, BUF, OUT] (UDAF surface) with exact
    // integer-cent arithmetic — partial+final merge like any Catalyst
    // agg, and oracle-verifiable with zero tolerance.
    "q21_custom_aggregator" -> ((s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_totalprice")).as[(Long, Double)]
        .groupByKey(_._1).mapValues(_._2)
        .agg(Aggregators.priceStats.toColumn)
        .map { case (k, (avg, mx, n)) => (k, avg, mx, n) }
        .toDF("o_custkey", "avg_price", "max_price", "n_orders")
        .orderBy(col("o_custkey"))
    }),

    // Sketch tier: a real dense HyperLogLog behind TypedImperativeAggregate
    // (graft.functions.HllSketchAgg, p=12 → ±1.6% σ). The sketch hashes
    // with a fixed splitmix64, so its estimate is DETERMINISTIC per input
    // set — which makes it oracle-gateable: emit the exact count plus a
    // boolean asserting the estimate landed within 5% (≈3σ) of it. DuckDB
    // states the exact side and TRUE; any estimator drift or
    // non-determinism breaks the hash compare.
    "q22_approx_distinct" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(graft.functions.HllSketchAgg.approxDistinct(col("l_partkey"))
            .as("hll_parts"),
          countDistinct(col("l_partkey")).as("exact_parts"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("exact_parts"), col("n"),
          (abs(col("hll_parts") - col("exact_parts"))
            <= col("exact_parts") * 0.05).as("hll_within_5pct"))
        .orderBy(col("l_returnflag"))
    }),

    // SQL entry point: the same engine surface via spark.sql over
    // registered views (TPC-H Q4 shape: EXISTS subquery -> semi join).
    "q23_sql_api" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_v")
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem_v")
      s.sql("""
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders_v o
        WHERE EXISTS (SELECT 1 FROM lineitem_v l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")
    }),
    // Custom TypedImperativeAggregate (imperative buffer serialized
    // between partial/final stages — the sketch integration surface),
    // kept exact so the oracle is plain COUNT(DISTINCT).
    "q25_typed_imperative_agg" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(graft.functions.ExactDistinctLong.distinctCount(col("l_partkey"))
          .as("n_parts"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    }),

    // Salted skew join: result must equal the plain equi-join (the
    // oracle) while spreading each orderkey over 8 shuffle partitions.
    "q24_skew_salted_join" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_quantity"))
      val o = Tables.orders(s, d)
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      Skew.saltedJoin(li, o, "l_orderkey", salts = 8)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sumd2(col("l_quantity")).as("sum_qty"))
        .orderBy(col("o_orderpriority"))
    }),
    // Deterministic collection aggregation (collect_set sorted+joined —
    // the LISTAGG surface, made order-stable on both engines).
    "q26_collect_agg" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(array_join(array_sort(collect_set(col("o_orderstatus"))), ",")
          .as("statuses"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority"))
    }),

    // Exact lower-median per group via rank arithmetic (no engine
    // median() — interpolation rules differ; the element itself is
    // engine-independent). Histogram form, not a row window: aggregate
    // to per-(segment, value) counts first (map-side-combined), then
    // walk cumulative counts over distinct VALUES — the window input is
    // value-domain-bounded (money at cent granularity), never
    // row-count-bounded, where a row_number over the segment would
    // serialize 1/|segments| of all customers through one task. Picks
    // the value whose cumulative count first reaches rank
    // (n+1) DIV 2 — identical to the rank formulation, so the oracle
    // keeps its ROW_NUMBER form.
    "q27_exact_median" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val hist = Tables.customer(s, d)
        .groupBy(col("c_mktsegment"), col("c_acctbal"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal"))
      val wc = Window.partitionBy(col("c_mktsegment"))
      hist.withColumn("cum", sum(col("c")).over(w))
        .withColumn("n", sum(col("c")).over(wc))
        .withColumn("pos", expr("(n + 1) DIV 2"))
        .filter(col("cum") >= col("pos") && col("cum") - col("c") < col("pos"))
        .select(col("c_mktsegment"), col("c_acctbal").as("lower_median"))
        .orderBy(col("c_mktsegment"))
    }),
    // Temporal scalar family — extraction, interval arithmetic with
    // month-end clamping, last_day, day differences. Both engines clamp
    // month addition the same way, and everything is integer/date-typed,
    // so results are exact.
    "q40_date_functions" -> ((s, d) => {
      val dt = col("o_orderdate").cast("date")
      Tables.orders(s, d).select(
        col("o_orderkey"),
        dt.as("odate"),
        year(dt).as("y"),
        quarter(dt).as("q"),
        month(dt).as("m"),
        dayofmonth(dt).as("dom"),
        date_add(dt, 45).as("plus45d"),
        add_months(dt, 2).as("plus2m"),
        last_day(dt).as("month_end"),
        datediff(dt, lit("1995-01-01").cast("date")).as("days_since_95"))
        .orderBy(col("o_orderkey"))
    }),

    // Unpivot — q19's pivot run in reverse: a wide per-nation metrics
    // row melts into (nationkey, metric, n) long form. Spark's native
    // unpivot (melt) against a UNION ALL oracle; null-padded sides of
    // the full outer join are zero-filled first so both engines melt
    // identical values.
    "q39_unpivot" -> ((s, d) => {
      val c = Tables.customer(s, d).groupBy(col("c_nationkey").as("nationkey"))
        .agg(count(lit(1)).as("n_customers"))
      val su = Tables.supplier(s, d).groupBy(col("s_nationkey").as("nationkey"))
        .agg(count(lit(1)).as("n_suppliers"))
      c.join(su, Seq("nationkey"), "full_outer")
        .na.fill(0L, Seq("n_customers", "n_suppliers"))
        .unpivot(Array(col("nationkey")),
          Array(col("n_customers"), col("n_suppliers")), "metric", "n")
        .orderBy(col("nationkey"), col("metric"))
    }),

    // SQL-standard percentile family (PERCENTILE_CONT / PERCENTILE_DISC,
    // WITHIN GROUP) with engine-pinned semantics: over the integer-valued
    // l_quantity at quarter fractions, every interpolation position
    // p*(n-1) has an exactly-representable fractional part and both
    // algebraic forms ((a+(b-a)f) vs ((1-f)a+fb)) are exact on small
    // integers — so cont results are bit-identical across engines and
    // disc picks an exact element (the q27 lower-median trick,
    // generalized).
    "q38_percentile_family" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile_cont(0.25) WITHIN GROUP (ORDER BY l_quantity)").as("p25_cont"),
          expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity)").as("p50_cont"),
          expr("percentile_cont(0.75) WITHIN GROUP (ORDER BY l_quantity)").as("p75_cont"),
          expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity)").as("p25_disc"),
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity)").as("p50_disc"),
          expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY l_quantity)").as("p75_disc"))
        .orderBy(col("l_returnflag"))
    }),

    // Constraint validation (the Deequ-check shape): PK uniqueness,
    // referential containment, and range checks computed as COUNTS of
    // violations in two scans + one anti join — the report a pipeline
    // gates a publish on. Counts (not booleans alone) so a failure says
    // how bad; booleans ride along for the gate semantics.
    "q50_quality_checks" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val dupPk = ev.groupBy(col("event_id")).agg(count(lit(1)).as("c"))
        .filter(col("c") > 1).agg(count(lit(1)).as("n")).select(col("n"))
      val orphans = ev.join(Tables.customer(s, d),
          col("user_id") === col("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("n")).select(col("n"))
      val ranges = ev.agg(
        sum(when(col("value") < 0 || col("value").isNull, 1).otherwise(0)).as("n"))
      dupPk.select(lit("pk_unique_event_id").as("check_name"), col("n").as("violations"))
        .unionByName(orphans.select(lit("fk_user_in_customer").as("check_name"),
          col("n").as("violations")))
        .unionByName(ranges.select(lit("value_non_negative").as("check_name"),
          col("n").as("violations")))
        .withColumn("passed", col("violations") === 0L)
        .orderBy(col("check_name"))
    }),

    // Sketch quantiles — the 100 TB percentile path: percentile_approx
    // (Greenwald-Khanna summaries behind a partial-aggregable
    // TypedImperativeAggregate) instead of q38's exact form, which must
    // sort each group. The GK guarantee is a RANK bound (error ≤
    // n/accuracy), so the gate recomputes the approx value's rank
    // in-plan: #(x < v) ≤ (0.5+ε)·n and #(x ≤ v) ≥ (0.5−ε)·n, emitted
    // as a boolean the oracle pins TRUE — an index regression fails the
    // hash compare, not just a spec. p50_exact rides along for the
    // value-level gate.
    "q48_approx_quantiles" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_returnflag"), col("l_quantity"))
      val ap = li.groupBy(col("l_returnflag"))
        .agg(
          percentile_approx(col("l_quantity"), lit(0.5), lit(100)).as("p50_approx"),
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity)")
            .as("p50_exact"))
      li.join(broadcast(ap), Seq("l_returnflag"))
        .groupBy(col("l_returnflag"), col("p50_exact"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("l_quantity") < col("p50_approx"), 1).otherwise(0)).as("n_lt"),
          sum(when(col("l_quantity") <= col("p50_approx"), 1).otherwise(0)).as("n_le"))
        .select(col("l_returnflag"), col("p50_exact"),
          (col("n_lt") <= lit(0.515) * col("n") &&
            col("n_le") >= lit(0.485) * col("n")).as("approx_rank_ok"))
        .orderBy(col("l_returnflag"))
    }),

    // SQL-standard FILTER clause on aggregates — per-aggregate
    // predicates in one grouping pass (the idiomatic alternative to
    // sum(CASE WHEN ...)): one scan, one partial+final hash agg, no
    // self-joins. Money sums decimal-exact per Q.scala.
    "q52_filtered_agg" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem_v")
      s.sql("""
        SELECT l_returnflag,
          COUNT(*) AS n,
          COUNT(*) FILTER (WHERE l_quantity >= 25) AS n_big,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
            FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS disc_price,
          MAX(l_quantity) FILTER (WHERE l_linestatus = 'F') AS max_qty_f
        FROM lineitem_v
        GROUP BY l_returnflag
        ORDER BY l_returnflag""")
    }),

    // The TPC-H Q21 shape (adapted to this schema's columns): suppliers
    // who were the LAST to ship in multi-supplier orders — a correlated
    // EXISTS and a correlated NOT EXISTS with a non-equi condition on
    // the same table, the hardest classic subquery nesting. Catalyst
    // rewrites both into join form: the EXISTS becomes a left-semi and
    // the NOT EXISTS a left-anti, each equi-keyed on l_orderkey with the
    // inequality as a join residual — no nested loop, three shuffles of
    // lineitem at any scale.
    "q54_multi_exists" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem_v")
      Tables.supplier(s, d).createOrReplaceTempView("supplier_v")
      s.sql("""
        SELECT s_name, COUNT(*) AS numwait
        FROM supplier_v s JOIN lineitem_v l1 ON s.s_suppkey = l1.l_suppkey
        WHERE EXISTS (
            SELECT 1 FROM lineitem_v l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (
            SELECT 1 FROM lineitem_v l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_shipdate > l1.l_shipdate)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name""")
    }),

    // TPC-H Q17 shape: the correlated per-group scalar-aggregate
    // threshold ("lines with quantity below 20% of this part's average")
    // — decorrelated by hand into its efficient join form: brand-filter
    // part ONCE, broadcast it to prune BOTH lineitem passes at the scan
    // (the avg pass only aggregates parts that can survive), then
    // broadcast the per-part aggregate back. Neither lineitem scan
    // shuffles; the threshold predicate is pure int64 (5·qty·cnt < Σqty
    // ≡ qty < 0.2·avg — quantities are integral, so no division and no
    // float drift), and revenue is the exact decimal sum. At 100 TB the
    // brand slice of part stays broadcastable and lineitem is read
    // twice with partkey pushdown — the classic trade vs one shuffled
    // re-grouping, chosen because the filtered part set is tiny.
    "q55_corr_avg_threshold" -> ((s, d) => {
      val pp = Tables.part(s, d)
        .filter(col("p_brand").isin("Brand#1", "Brand#2"))
        .select(col("p_partkey"), col("p_brand"))
      val qty = col("l_quantity").cast("bigint")
      val avgq = Tables.lineitem(s, d)
        .join(broadcast(pp), col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_partkey"))
        .agg(sum(qty).as("sq"), count(lit(1)).as("cq"))
      Tables.lineitem(s, d)
        .join(broadcast(pp), col("l_partkey") === col("p_partkey"))
        .join(broadcast(avgq), Seq("l_partkey"))
        .filter(qty * lit(5) * col("cq") < col("sq"))
        .groupBy(col("p_brand"))
        .agg(sumd2(col("l_extendedprice")).as("small_lot_revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("p_brand"))
    }),

    // TPC-H Q22 shape (schema-adapted — no phone column, so the
    // market segment plays cntrycode): customers above the global
    // positive-balance average with no urgent order. Exercises the
    // remaining classic subquery combo: an UNCORRELATED scalar aggregate
    // feeding a comparison, plus NOT EXISTS → left-anti. The threshold
    // compare is cross-multiplied in exact decimal (bal·cnt > Σbal ≡
    // bal > avg) so no division and no float drift on the boundary; the
    // one-row aggregate broadcasts (BroadcastNestedLoopJoin over a
    // single row — free), and the anti join equi-keys on custkey: at
    // 100 TB that is one shuffle of customer against orders' custkey
    // projection, with AQE free to flip it to broadcast when the
    // rich-customer slice is small.
    "q56_global_avg_anti" -> ((s, d) => {
      val cust = Tables.customer(s, d)
      val thr = cust.filter(col("c_acctbal") > 0)
        .agg(sum(col("c_acctbal").cast("decimal(18,2)")).as("tsum"),
          count(lit(1)).as("tcnt"))
      cust.join(broadcast(thr))
        .filter(col("c_acctbal").cast("decimal(18,2)") * col("tcnt")
          > col("tsum"))
        .join(Tables.orders(s, d)
            .filter(col("o_orderpriority") === "1-URGENT")
            .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("numcust"),
          sumd2(col("c_acctbal")).as("totacctbal"))
        .orderBy(col("c_mktsegment"))
    }),

    // In-pass pipeline accounting via Dataset.observe: QC counters ride
    // the MAIN action as accumulator-backed aggregates instead of a
    // second scan (contrast q50, which pays one extra aggregation pass
    // per audited metric — at 100 TB each audit re-reads the corpus;
    // observe reads it zero extra times). The noop sink materializes the
    // pass with no output I/O; the observed metrics surface as a one-row
    // DataFrame. Money sums decimal-exact per Q.scala, so the metric is
    // hash-comparable, not just plausible.
    "q57_observe_metrics" -> ((s, d) => {
      import org.apache.spark.sql.Observation
      val obs = Observation("qc")
      Tables.lineitem(s, d)
        .filter(col("l_quantity") > 10)
        .observe(obs,
          count(lit(1)).as("n_rows"),
          sum(col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double").as("sum_price"),
          min(col("l_shipdate")).as("min_ship"),
          max(col("l_shipdate")).as("max_ship"))
        .write.format("noop").mode("overwrite").save()
      val m = obs.get
      import s.implicits._
      // l_shipdate is parquet timestamp[us] → TIMESTAMP_NTZ today, so
      // the observed min/max come back as LocalDateTime — but the drift
      // suite tolerates DATE and TIMESTAMP_LTZ fixture encodings too,
      // and a hard cast would turn that tolerated drift into a
      // ClassCastException here. Normalize every temporal shape
      // Observation.get can return to LocalDateTime (UTC session).
      def toNtz(v: Any): java.time.LocalDateTime = v match {
        case null => null
        case ldt: java.time.LocalDateTime => ldt
        case i: java.time.Instant =>
          java.time.LocalDateTime.ofInstant(i, java.time.ZoneOffset.UTC)
        case ts: java.sql.Timestamp => ts.toLocalDateTime
        case d: java.sql.Date => d.toLocalDate.atStartOfDay
        case ld: java.time.LocalDate => ld.atStartOfDay
        case other => throw new IllegalStateException(
          s"unexpected observed temporal ${other.getClass}: $other")
      }
      Seq((m("n_rows").asInstanceOf[Long],
        m("sum_price").asInstanceOf[Double],
        toNtz(m("min_ship")), toNtz(m("max_ship"))))
        .toDF("n_rows", "sum_price", "min_ship", "max_ship")
    }),

    // Recursive CTE (Spark 4 WITH RECURSIVE): hierarchy walk over a
    // deterministic parent edge (custkey -> custkey DIV 2, the implicit
    // binary-heap tree) for the first 64 customers — per node its depth
    // to the root and the exact sum of keys on the path. Recursion depth
    // is log2(max key): bounded by KEY WIDTH, not data size, so the
    // iteration count is scale-free; each step is one self-join the
    // optimizer plans like any other.
    "q58_recursive_cte" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer_v")
      s.sql("""
        WITH RECURSIVE walk(custkey, node, depth) AS (
          SELECT c_custkey, c_custkey, 0
          FROM customer_v WHERE c_custkey < 64
          UNION ALL
          SELECT custkey, node DIV 2, depth + 1 FROM walk WHERE node > 1
        )
        SELECT custkey, MAX(depth) AS depth,
               SUM(node) AS path_sum
        FROM walk GROUP BY custkey ORDER BY custkey""")
    }),

    // Window-partition COUNT(DISTINCT): Spark rejects COUNT(DISTINCT)
    // OVER, so the idiomatic plan is dense_rank over the value order +
    // max over the bare partition — two window passes on ONE user
    // shuffle (same partitioning → Spark reuses the sort), attaching the
    // per-customer distinct-priority count to every order row without a
    // groupBy + self-join round trip. Precondition: the counted column
    // must be non-null (dense_rank ranks NULLs too, so a nullable column
    // would count one extra "value" vs COUNT(DISTINCT) — guard with a
    // NOT NULL filter before copying this idiom elsewhere).
    "q53_window_distinct" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w1 = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderpriority"))
      val w2 = Window.partitionBy(col("o_custkey"))
      Tables.orders(s, d)
        .withColumn("dr", dense_rank().over(w1))
        .withColumn("n_priorities", max(col("dr")).over(w2))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"),
          col("n_priorities"))
        .orderBy(col("o_orderkey"))
    }),

    // Array higher-order functions as first-class surface — transform /
    // filter / aggregate / exists over a per-group array built in a
    // deterministic order (array_sort of collect_list, so the multiset
    // is canonical on both engines — collect_list alone is
    // partition-order dependent). Everything after the single grouping
    // shuffle is scan-local array code; the fold seed is BIGINT so the
    // oracle's list_reduce accumulates without overflow.
    "q51_higher_order" -> ((s, d) => {
      val qty = col("qty")
      Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(array_sort(collect_list(col("l_quantity").cast("long"))).as("qty"))
        .select(col("l_orderkey"),
          size(qty).as("n_items"),
          aggregate(qty, lit(0L), (a, x) => a + x).as("qty_sum"),
          aggregate(transform(qty, x => x * x), lit(0L), (a, x) => a + x)
            .as("qty_sq_sum"),
          size(filter(qty, x => x >= 25)).as("n_big"),
          exists(qty, x => x === 1).as("has_single"))
        .orderBy(col("l_orderkey"))
    }),

    // Correlated SCALAR subquery (the TPC-H Q17 shape): per-part average
    // gates the outer row — Catalyst rewrites the correlation into an
    // aggregate + join, which is the plan property worth pinning (q23
    // covers EXISTS; this covers the scalar-aggregate correlation).
    // Exactness: "qty < 0.2*avg" is stated as "5*qty < avg" (integer
    // multiply, no 0.2 literal-type divergence across engines), the
    // average of integer-valued quantities is exact in double under any
    // summation order, and the money sum is decimal-exact (Q.scala).
    "q41_scalar_subquery" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem_v")
      s.sql("""
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
          AS avg_yearly
        FROM lineitem_v l1
        WHERE 5 * l1.l_quantity < (
          SELECT AVG(l2.l_quantity) FROM lineitem_v l2
          WHERE l2.l_partkey = l1.l_partkey)""")
    }),

    // Calendar gap-filling — the time-series densification step (missing
    // days appear as explicit zero rows): bounds → generated date
    // sequence → left join against the daily aggregate. sequence() is
    // the generator both engines share (generate_series in DuckDB).
    "q42_gap_fill" -> ((s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("n_orders"))
      val cal = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      cal.join(daily, Seq("day"), "left_outer")
        .select(col("day"), coalesce(col("n_orders"), lit(0L)).as("n_orders"))
        .orderBy(col("day"))
    }),

    // Z-order (Morton) clustering key over two filter dimensions — the
    // layout primitive for multi-column file/row-group pruning
    // (SCALE.md): plain integer bit interleaving, oracle-exact. The
    // write-side use is repartitionByRange(zkey) + sortWithinPartitions
    // before a parquet write; this query verifies the key itself.
    "q43_zorder_key" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") < 400)
        .select(col("l_orderkey"), col("l_partkey"),
          ZOrder.zorderKey(col("l_orderkey"), col("l_partkey"), 21).as("zkey"))
        .orderBy(col("zkey"), col("l_orderkey"), col("l_partkey"))
    }),

    // Double-nested IN subqueries with HAVING (the TPC-H Q20 shape):
    // part filter nested inside a grouped supplier filter nested inside
    // the outer aggregate — two levels of Catalyst's IN-to-semi-join
    // rewrite in one plan. Quantity sums stay in double: integer-valued
    // summands are exact under any order, so no decimal cast is needed
    // for the HAVING comparison.
    "q44_nested_subqueries" -> ((s, d) => {
      Tables.supplier(s, d).createOrReplaceTempView("supplier_v")
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem_v44")
      Tables.part(s, d).createOrReplaceTempView("part_v")
      s.sql("""
        SELECT s_nationkey, COUNT(*) AS n_supp
        FROM supplier_v
        WHERE s_suppkey IN (
          SELECT l_suppkey FROM lineitem_v44 l
          WHERE l.l_partkey IN (
            SELECT p_partkey FROM part_v WHERE p_name LIKE '%widget%')
          GROUP BY l_suppkey
          HAVING SUM(l_quantity) > 2000)
        GROUP BY s_nationkey ORDER BY s_nationkey""")
    }),

    // IGNORE NULLS window carry-forward (fill-forward): the latest
    // purchase value seen so far per user rides along every event — the
    // standard last-observation-carried-forward shape, exercising the
    // ignoreNulls variant of last() over a running frame.
    // TPC-H Q20's signature decorrelation shape: a correlated scalar
    // subquery NESTED INSIDE an IN subquery (suppliers who shipped the
    // maximum-quantity line of some bolt part). Catalyst rewrites the
    // inner scalar to an aggregated left join and the IN to a semi join
    // — two decorrelations stacked. Integer equality throughout, so no
    // FP tolerance is needed anywhere.
    "q46_in_with_corr_scalar" -> ((s, d) => {
      Tables.supplier(s, d).createOrReplaceTempView("supplier_v46")
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem_v46")
      Tables.part(s, d).createOrReplaceTempView("part_v46")
      s.sql("""
        SELECT s_suppkey, s_name
        FROM supplier_v46
        WHERE s_suppkey IN (
          SELECT l1.l_suppkey FROM lineitem_v46 l1
          WHERE l1.l_partkey IN (
            SELECT p_partkey FROM part_v46 WHERE p_name LIKE '%bolt%')
          AND l1.l_quantity = (
            SELECT MAX(l2.l_quantity) FROM lineitem_v46 l2
            WHERE l2.l_partkey = l1.l_partkey))
        ORDER BY s_suppkey""")
    }),

    "q45_fill_forward" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("pv", when(col("event_type") === "purchase", col("value")))
        .select(col("event_id"), col("user_id"), col("ts"),
          last(col("pv"), ignoreNulls = true).over(w).as("last_purchase_value"))
        .orderBy(col("event_id"))
    }),

    // Bloom-pruned semi join: a bloom over the selective dim keys
    // pre-filters the fact side BEFORE the join shuffle; the real semi
    // join then discards false positives, so the result is exactly the
    // plain semi join's while the fact shuffle carries only probable
    // matches. The explicit, always-on form of Spark's runtime
    // row-level filtering — the native expression codegens straight
    // into BloomFilter.mightContainLong.
    "q47_bloom_prune_join" -> ((s, d) => {
      val urgent = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      graft.operators.BloomPrune.semiJoin(
        Tables.lineitem(s, d), col("l_orderkey"), urgent, col("o_orderkey"),
        expectedItems = 100000L)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sumd2(col("l_extendedprice")).as("sum_price"))
        .orderBy(col("l_returnflag"))
    }),

    // Full outer join (aggregated sides → 1:1 on the key, null-padded
    // where only one side has the nation).
    "q28_full_outer_join" -> ((s, d) => {
      val c = Tables.customer(s, d).groupBy(col("c_nationkey").as("nationkey"))
        .agg(count(lit(1)).as("n_customers"))
      val su = Tables.supplier(s, d).groupBy(col("s_nationkey").as("nationkey"))
        .agg(count(lit(1)).as("n_suppliers"))
      c.join(su, Seq("nationkey"), "full_outer")
        .orderBy(col("nationkey"))
    }),

    // Array-valued intermediate: sorted distinct list per group, with
    // array ops (size + element access) on the complex type in-plan. The
    // array itself is emitted joined — the driver's compare sorts rows by
    // every column and ndarray columns aren't sortable in its harness —
    // so the scalar projection carries the verification.
    "q29_array_result" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(year(col("o_orderdate")).as("yr"))
        .agg(array_sort(collect_set(col("o_orderstatus"))).as("arr"),
          count(lit(1)).as("n"))
        .select(col("yr"), array_join(col("arr"), ",").as("statuses"),
          size(col("arr")).as("n_statuses"),
          element_at(col("arr"), 1).as("first_status"), col("n"))
        .orderBy(col("yr"))
    }),
    // RANGE-frame window: 30-day trailing spend per customer, ordered by
    // day number (numeric range frame, distinct from the ROWS frames in
    // q20).
    "q30_range_frame" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val days = (unix_micros(col("o_orderdate").cast("timestamp")) / 86400000000L)
        .cast("long")
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("day"))
        .rangeBetween(-30, 0)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), days.as("day"),
          col("o_totalprice"))
        .withColumn("trailing_30d",
          sum(col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double"))
        .orderBy(col("o_custkey"), col("day"), col("o_orderkey"))
    }),
    // Ranking-function family: rank, dense_rank, percent_rank, cume_dist,
    // ntile, first/nth value — over a deterministic total order.
    "q31_rank_functions" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.customer(s, d).select(
        col("c_mktsegment"), col("c_custkey"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        percent_rank().over(w).as("prnk"),
        cume_dist().over(w).as("cdist"),
        ntile(4).over(w).as("quartile"),
        first(col("c_custkey")).over(wf).as("top_key"))
        .filter(col("rnk") <= 10)
        .orderBy(col("c_mktsegment"), col("rnk"))
    }),

    // Explicit GROUPING SETS through the DataFrame API (one Expand pass,
    // like rollup/cube but with a hand-picked lattice: both keys, status
    // only, grand total — NOT the full cube).
    "q32_grouping_sets" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.groupingSets(
          Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
            Seq(col("o_orderstatus")), Seq()),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sumd2(col("o_totalprice")).as("sum_price"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    }),

    // CSV source/sink round-trip: write nation as headered CSV, read it
    // back with an explicit schema, aggregate — proving the csv format
    // tier end to end (oracle states the same result off the original
    // parquet, so any loss in the round-trip breaks the hash).
    "q33_csv_roundtrip" -> ((s, d) => {
      val n = Tables.nation(s, d)
      val dir = freshDir("q33csv")
      n.write.mode("overwrite").option("header", "true").csv(dir)
      s.read.option("header", "true").schema(n.schema).csv(dir)
        .groupBy(col("n_regionkey"))
        .agg(count(lit(1)).as("n_nations"),
          min(col("n_name")).as("first_nation"))
        .orderBy(col("n_regionkey"))
    }),

    // NOT IN with a subquery — Spark plans this as a null-aware anti
    // join (NullAwareAntiJoin / BroadcastNestedLoop when the build side
    // may hold NULLs), a distinct physical strategy from q09's left_anti.
    "q35_null_aware_anti" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer_v35")
      Tables.orders(s, d).createOrReplaceTempView("orders_v35")
      s.sql("""
        SELECT c_custkey, c_name FROM customer_v35
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders_v35
                                WHERE o_orderstatus = 'P')
        ORDER BY c_custkey""")
    }),

    // Offset window functions: lag/lead with a deterministic tiebroken
    // frame (the change-delta shape every CDC consumer writes).
    "q37_lead_lag" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d).select(
        col("o_custkey"), col("o_orderkey"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        (col("o_totalprice") - lag(col("o_totalprice"), 1).over(w)).as("delta"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // Correlated LATERAL subquery with a per-row LIMIT — top-n-per-group
    // expressed the SQL way (Catalyst plans the correlation as a lateral
    // join; the window-function formulation of the same shape is q05).
    "q36_lateral_topn" -> ((s, d) => {
      Tables.nation(s, d).createOrReplaceTempView("nation_v36")
      Tables.region(s, d).createOrReplaceTempView("region_v36")
      s.sql("""
        SELECT r_name, t.n_name FROM region_v36,
        LATERAL (SELECT n_name FROM nation_v36
                 WHERE n_regionkey = r_regionkey
                 ORDER BY n_name LIMIT 2) t
        ORDER BY r_name, n_name""")
    }),

    // JSON source/sink round-trip, same contract as q33 (dates survive as
    // ISO strings re-typed by the explicit read schema).
    "q34_json_roundtrip" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val dir = freshDir("q34json")
      o.write.mode("overwrite").json(dir)
      s.read.schema(o.schema).json(dir)
        .filter(col("o_orderstatus") === "O")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sumd2(col("o_totalprice")).as("sum_price"))
        .orderBy(col("o_orderpriority"))
    }),

    // ORC — the other columnar format Spark serves natively (vectorized
    // reader, predicate pushdown, same partition-pruning machinery as
    // parquet). Written partitioned by the filter key so the read-back
    // scan lists only the matching directories — the layout lever
    // TableWriterSpec pins for parquet, exercised here through the
    // oracle gate on a second format. Partition-column inference types
    // the key from the directory names; the explicit int cast pins the
    // read-back schema to the source's regardless of inference conf.
    // Per-group Pearson correlation + least-squares fit from EXACT
    // integer sufficient statistics — the single-pass, map-side-
    // combinable shape (n, Σx, Σy, Σxy, Σx², Σy²) every distributed
    // stats library reduces to, but with the sums in integer units
    // (quantity integral, price in cents) riding decimal(38,0): the
    // builtin float corr()/regr_*'s partial-merge order varies with
    // partitioning, so its last bits are not deterministic — this is,
    // to the bit, on any partitioning, and the oracle reproduces it
    // exactly (HUGEINT on the DuckDB side). Per-TERM products stay in
    // long range at any corpus size (they are row-level quantities);
    // the 38-digit group sums and cross-terms hold until the dominant
    // n·Σy² product (yc² ≈ 1e14 per row ⇒ n·Σy² ≈ n²·1e14) reaches
    // 1e38 — about 1e12 rows per group. Past that Spark's non-ANSI
    // decimal multiply returns NULL while DuckDB's HUGEINT raises, so
    // the cross-terms are null-guarded with raise_error below: an
    // overflowing group fails loudly on both engines instead of
    // silently emitting NULL fit columns on one of them. The guard is
    // per-GROUP (a handful of rows), not per-row — free.
    "q60_linear_fit" -> ((s, d) => {
      val x = col("l_quantity").cast("long")
      val yc = (col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")
      val g = Tables.lineitem(s, d)
        .select(col("l_returnflag"), x.as("x"), yc.as("yc"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
          sum(col("x").cast("decimal(38,0)")).as("sx"),
          sum(col("yc").cast("decimal(38,0)")).as("sy"),
          sum((col("x") * col("yc")).cast("decimal(38,0)")).as("sxy"),
          sum((col("x") * col("x")).cast("decimal(38,0)")).as("sx2"),
          sum((col("yc") * col("yc")).cast("decimal(38,0)")).as("sy2"))
      // All agg inputs are non-null, so a null cross-term can only mean
      // decimal(38,0) overflow — fail fast, don't ship NULL fits.
      def exact(c: org.apache.spark.sql.Column, name: String) =
        when(c.isNull, raise_error(lit(
          s"q60: decimal(38,0) overflow in $name — group exceeds the " +
            "~1e12-row exact-statistics envelope"))).otherwise(c)
      val num = exact(col("n") * col("sxy") - col("sx") * col("sy"),
        "n*sxy - sx*sy").cast("double")
      val dx = exact(col("n") * col("sx2") - col("sx") * col("sx"),
        "n*sx2 - sx^2").cast("double")
      val dy = exact(col("n") * col("sy2") - col("sy") * col("sy"),
        "n*sy2 - sy^2").cast("double")
      g.select(col("l_returnflag"),
          col("n").cast("long").as("n"),
          (num / sqrt(dx * dy)).as("corr_qty_price"),
          (num / dx / lit(100.0)).as("slope"),
          ((col("sy").cast("double") - num / dx * col("sx").cast("double"))
            / col("n").cast("double") / lit(100.0)).as("intercept"))
        .orderBy(col("l_returnflag"))
    }),

    "q59_orc_roundtrip" -> ((s, d) => {
      val sup = Tables.supplier(s, d)
      val dir = freshDir("q59orc")
      sup.write.mode("overwrite").partitionBy("s_nationkey").orc(dir)
      s.read.orc(dir)
        .withColumn("s_nationkey", col("s_nationkey").cast("int"))
        .filter(col("s_nationkey") < 10)
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_suppliers"),
          sumd2(col("s_acctbal")).as("sum_acctbal"))
        .orderBy(col("s_nationkey"))
    }),

    // TPC-H Q21's correlated-double-subquery shape (suppliers-who-kept-
    // orders-waiting), adapted to the fixture's columns: for 'F' orders,
    // count per supplier the returned ('R') line items in MULTI-supplier
    // orders where NO OTHER supplier's item was returned — an EXISTS
    // (some other supplier on the order) and a NOT EXISTS (no other
    // supplier returned) correlated on the same join key with a
    // non-equi supplier guard. DataFrame form: left_semi then left_anti
    // self-joins, each an equi-join on l_orderkey with the `<>` supplier
    // predicate as residual — Catalyst plans both as shuffled joins on
    // the order key, so the self-pairing never exceeds per-order fan-out
    // (orders are bounded-width) and the shape holds at any corpus
    // size. The supplier dimension broadcasts; the top-20 is a
    // TakeOrderedAndProject on a supplier-count-bounded aggregate.
    "q61_waiting_supplier" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val l1 = li.filter(col("l_returnflag") === "R")
        .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"))
      val l2 = li.select(col("l_orderkey").as("o2"), col("l_suppkey").as("s2"))
      val l3 = li.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("o3"), col("l_suppkey").as("s3"))
      l1.join(l2, col("l_orderkey") === col("o2") &&
          col("l_suppkey") =!= col("s2"), "left_semi")
        .join(l3, col("l_orderkey") === col("o3") &&
          col("l_suppkey") =!= col("s3"), "left_anti")
        .join(broadcast(Tables.supplier(s, d)
          .select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name").asc)
        .limit(20)
    }),

    // VARIANT — Spark 4's native semi-structured type: parse the JSON
    // props column ONCE into the binary variant encoding at the scan,
    // then typed path extraction (`variant_get($.k, int)`) runs as
    // codegen'd binary navigation, never re-parsing text per access —
    // the engine face that replaces ad-hoc from_json(schema) when the
    // payload schema is open-ended. try_variant_get pins the missing-
    // path contract (NULL, not an error) alongside. All extracted
    // values are ints, so the per-type aggregate is oracle-exact
    // against DuckDB's JSON extraction. Scale shape: one scan, one
    // map-side-combined agg; the variant parse is row-local.
    "q62_variant_extract" -> ((s, d) => {
      val v = parse_json(col("props"))
      Tables.events(s, d).filter(col("props").isNotNull)
        .select(col("event_type"),
          variant_get(v, "$.k", "int").as("k"),
          try_variant_get(v, "$.missing", "int").as("m"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("k").cast("long")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"),
          sum(when(col("m").isNull, 1L).otherwise(0L)).as("n_missing"))
        .orderBy(col("event_type"))
    }),

    // VARIANT persisted — q62's type written to parquet as the binary
    // variant encoding and read back: the storage face of open-schema
    // columns (store once in the compact binary form; every later
    // reader does typed path access with no JSON re-parse — at 100 TB
    // the parse cost is paid once at ingest, not per query). Extraction
    // after the round trip must equal extraction before it.
    "q63_variant_roundtrip" -> ((s, d) => {
      val dir = freshDir("variant-rt")
      Tables.events(s, d).filter(col("props").isNotNull)
        .select(col("event_id"), col("event_type"),
          parse_json(col("props")).as("v"))
        .write.mode("overwrite").parquet(dir)
      s.read.parquet(dir)
        .select(col("event_id"), col("event_type"),
          variant_get(col("v"), "$.k", "int").as("k"))
        .orderBy(col("event_id"))
    }),

    // VARIANT's third face: SCHEMA-DRIFT DISCOVERY — the metadata query
    // an open-schema ingest actually runs ("which keys and types appear,
    // per epoch?"): variant_explode over every document's top level,
    // schema_of_variant per value, both collapsed to a cross-engine
    // canonical type TIER (integer/number/string/boolean/null/array/
    // object — engines disagree on the fine-grained spelling:
    // DECIMAL(3,1) vs DOUBLE, BIGINT vs UBIGINT), aggregated into a
    // key×tier×epoch count profile. This is the DDL-drift monitor for
    // in-band schemas (the reference's dynamic-schema stance read as a
    // query). The fixture's props carry one fixed key, so the payload
    // is widened DETERMINISTICALLY from fixture columns (epoch-gated
    // fragments: keys appear over epochs — exactly the drift the
    // monitor exists to surface), and the oracle rebuilds the same JSON
    // text and profiles it with DuckDB's json_keys/json_type. Scale
    // shape: one corpus scan, row-local parse + explode (fan-out ≤
    // keys-per-doc), map-side-combined count; output is key-cardinality
    // × epochs — metadata-sized at any corpus size.
    "q64_variant_schema_profile" -> ((s, d) => {
      val ev = Tables.events(s, d).filter(col("props").isNotNull)
      val epoch = pmod(col("event_id"), lit(3)).cast("int")
      // fragments: NULL drops out of concat_ws on both engines
      val kF = concat(lit("\"k\": "),
        variant_get(parse_json(col("props")), "$.k", "int").cast("string"))
      // floor(x)+0.5 renders identically in Spark and DuckDB (exact
      // binary fraction, minimal-digit printing on both)
      val amtF = when(epoch >= 1,
        concat(lit("\"amt\": "), (floor(col("value")) + 0.5).cast("string")))
      val tagsF = when(epoch === 2 && col("event_type") === "click",
        concat(lit("\"tags\": [\""), col("event_type"), lit("\", 7]")))
      val metaF = when(epoch === 2 && pmod(col("user_id"), lit(5)) === 0,
        lit("\"meta\": {\"src\": \"web\"}"))
      val noteF = when(pmod(col("user_id"), lit(11)) === 0,
        lit("\"note\": null"))
      ev.select(epoch.as("epoch"),
          parse_json(concat(lit("{"),
            concat_ws(", ", kF, amtF, tagsF, metaF, noteF), lit("}"))).as("v"))
        .createOrReplaceTempView("q64_props")
      s.sql("""
        SELECT epoch, key,
          CASE
            WHEN sv IN ('BIGINT', 'INT', 'SMALLINT', 'TINYINT')
              THEN 'integer'
            WHEN sv = 'STRING' THEN 'string'
            WHEN sv = 'BOOLEAN' THEN 'boolean'
            WHEN sv IN ('VOID', 'NULL') THEN 'null'
            WHEN sv LIKE 'ARRAY%' THEN 'array'
            WHEN sv LIKE 'OBJECT%' OR sv LIKE 'STRUCT%' THEN 'object'
            ELSE 'number'
          END AS vtype,
          COUNT(*) AS n
        FROM (
          SELECT epoch, p.key AS key, schema_of_variant(p.value) AS sv
          FROM q64_props, LATERAL variant_explode(v) AS p
        )
        GROUP BY epoch, key, vtype
        ORDER BY epoch, key, vtype""")
    }),
  )

  val oracle: Map[String, String] = Map(
    "q62_variant_extract" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT)
        |    AS sum_k,
        |  CAST(MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS INT)
        |    AS min_k,
        |  CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS INT)
        |    AS max_k,
        |  CAST(COUNT(*) AS BIGINT) AS n_missing
        |FROM events WHERE props IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q63_variant_roundtrip" ->
      """SELECT event_id, event_type,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k
        |FROM events WHERE props IS NOT NULL
        |ORDER BY event_id""".stripMargin,
    "q64_variant_schema_profile" ->
      """WITH base AS (
        |  SELECT CAST(event_id % 3 AS INT) AS epoch,
        |    ('{' || concat_ws(', ',
        |      '"k": ' || CAST(CAST(json_extract_string(props, '$.k')
        |        AS BIGINT) AS VARCHAR),
        |      CASE WHEN event_id % 3 >= 1 THEN
        |        '"amt": ' || CAST(FLOOR(value) + 0.5 AS VARCHAR) END,
        |      CASE WHEN event_id % 3 = 2 AND event_type = 'click' THEN
        |        '"tags": ["' || event_type || '", 7]' END,
        |      CASE WHEN event_id % 3 = 2 AND user_id % 5 = 0 THEN
        |        '"meta": {"src": "web"}' END,
        |      CASE WHEN user_id % 11 = 0 THEN '"note": null' END
        |    ) || '}')::JSON AS js
        |  FROM events WHERE props IS NOT NULL)
        |SELECT epoch, u.k AS key,
        |  CASE COALESCE(json_type(base.js, '$.' || u.k), 'NULL')
        |    WHEN 'UBIGINT' THEN 'integer'
        |    WHEN 'BIGINT' THEN 'integer'
        |    WHEN 'VARCHAR' THEN 'string'
        |    WHEN 'BOOLEAN' THEN 'boolean'
        |    WHEN 'NULL' THEN 'null'
        |    WHEN 'ARRAY' THEN 'array'
        |    WHEN 'OBJECT' THEN 'object'
        |    ELSE 'number'
        |  END AS vtype,
        |  COUNT(*) AS n
        |FROM base, UNNEST(json_keys(base.js)) AS u(k)
        |GROUP BY 1, 2, 3
        |ORDER BY 1, 2, 3""".stripMargin,
    "q21_custom_aggregator" ->
      """SELECT o_custkey,
        | (CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0)
        |   / CAST(COUNT(*) AS DOUBLE) AS avg_price,
        | CAST(MAX(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
        |   AS max_price,
        | COUNT(*) AS n_orders
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "q22_approx_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_parts,
        | COUNT(*) AS n, TRUE AS hll_within_5pct
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q23_sql_api" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q50_quality_checks" ->
      """WITH checks AS (
        |  SELECT 'pk_unique_event_id' AS check_name,
        |    (SELECT COUNT(*) FROM (SELECT event_id FROM events
        |      GROUP BY event_id HAVING COUNT(*) > 1) d) AS violations
        |  UNION ALL
        |  SELECT 'fk_user_in_customer',
        |    (SELECT COUNT(*) FROM events e
        |     WHERE NOT EXISTS (SELECT 1 FROM customer c
        |                       WHERE c.c_custkey = e.user_id))
        |  UNION ALL
        |  SELECT 'value_non_negative',
        |    (SELECT CAST(SUM(CASE WHEN value < 0 OR value IS NULL
        |                     THEN 1 ELSE 0 END) AS BIGINT) FROM events))
        |SELECT check_name, violations, violations = 0 AS passed
        |FROM checks ORDER BY check_name""".stripMargin,
    "q48_approx_quantiles" ->
      """SELECT l_returnflag,
        | percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity) AS p50_exact,
        | TRUE AS approx_rank_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q52_filtered_agg" ->
      """SELECT l_returnflag,
        |  COUNT(*) AS n,
        |  COUNT(*) FILTER (WHERE l_quantity >= 25) AS n_big,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
        |    FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS disc_price,
        |  MAX(l_quantity) FILTER (WHERE l_linestatus = 'F') AS max_qty_f
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q54_multi_exists" ->
      """SELECT s_name, COUNT(*) AS numwait
        |FROM supplier s JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
        |WHERE EXISTS (
        |    SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate > l1.l_shipdate)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name""".stripMargin,
    "q55_corr_avg_threshold" ->
      """WITH pp AS (
        |  SELECT p_partkey, p_brand FROM part
        |  WHERE p_brand IN ('Brand#1', 'Brand#2')),
        |a AS (
        |  SELECT l_partkey,
        |    SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS sq,
        |    COUNT(*) AS cq
        |  FROM lineitem JOIN pp ON l_partkey = p_partkey
        |  GROUP BY l_partkey)
        |SELECT p_brand,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS small_lot_revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem JOIN pp ON l_partkey = p_partkey JOIN a USING (l_partkey)
        |WHERE CAST(FLOOR(l_quantity) AS BIGINT) * 5 * cq < sq
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q56_global_avg_anti" ->
      """WITH t AS (
        |  SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS tsum,
        |    COUNT(*) AS tcnt
        |  FROM customer WHERE c_acctbal > 0)
        |SELECT c_mktsegment,
        |  COUNT(*) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM customer, t
        |WHERE CAST(c_acctbal AS DECIMAL(18,2)) * tcnt > tsum
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q53_window_distinct" ->
      """SELECT o.o_orderkey, o.o_custkey, o.o_orderpriority, d.n_priorities
        |FROM orders o JOIN (
        |  SELECT o_custkey,
        |    CAST(COUNT(DISTINCT o_orderpriority) AS INT) AS n_priorities
        |  FROM orders GROUP BY o_custkey) d USING (o_custkey)
        |ORDER BY o.o_orderkey""".stripMargin,
    "q51_higher_order" ->
      """WITH a AS (
        |  SELECT l_orderkey,
        |    list_sort(list(CAST(FLOOR(l_quantity) AS BIGINT))) AS qty
        |  FROM lineitem GROUP BY l_orderkey)
        |SELECT l_orderkey,
        |  len(qty) AS n_items,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT), qty),
        |    (a, x) -> a + x) AS qty_sum,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(qty, x -> x * x)), (a, x) -> a + x) AS qty_sq_sum,
        |  len(list_filter(qty, x -> x >= 25)) AS n_big,
        |  len(list_filter(qty, x -> x = 1)) > 0 AS has_single
        |FROM a ORDER BY l_orderkey""".stripMargin,
    "q47_bloom_prune_join" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
        |                     WHERE o_orderpriority = '1-URGENT')
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q41_scalar_subquery" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
        |  AS avg_yearly
        |FROM lineitem l1
        |WHERE 5 * l1.l_quantity < (
        |  SELECT AVG(l2.l_quantity) FROM lineitem l2
        |  WHERE l2.l_partkey = l1.l_partkey)""".stripMargin,
    "q42_gap_fill" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n_orders
        |  FROM orders GROUP BY day),
        |b AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
        |cal AS (
        |  SELECT CAST(UNNEST(generate_series(CAST(d0 AS TIMESTAMP),
        |    CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM b)
        |SELECT cal.day AS day,
        |  CAST(COALESCE(daily.n_orders, 0) AS BIGINT) AS n_orders
        |FROM cal LEFT JOIN daily USING (day)
        |ORDER BY day""".stripMargin,
    "q44_nested_subqueries" ->
      """SELECT s_nationkey, COUNT(*) AS n_supp
        |FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem l
        |  WHERE l.l_partkey IN (
        |    SELECT p_partkey FROM part WHERE p_name LIKE '%widget%')
        |  GROUP BY l_suppkey
        |  HAVING SUM(l_quantity) > 2000)
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "q46_in_with_corr_scalar" ->
      """SELECT s_suppkey, s_name
        |FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT l1.l_suppkey FROM lineitem l1
        |  WHERE l1.l_partkey IN (
        |    SELECT p_partkey FROM part WHERE p_name LIKE '%bolt%')
        |  AND l1.l_quantity = (
        |    SELECT MAX(l2.l_quantity) FROM lineitem l2
        |    WHERE l2.l_partkey = l1.l_partkey))
        |ORDER BY s_suppkey""".stripMargin,
    "q45_fill_forward" ->
      """SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |  LAST_VALUE(CASE WHEN event_type = 'purchase' THEN value END
        |    IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS last_purchase_value
        |FROM events ORDER BY event_id""".stripMargin,
    "q43_zorder_key" ->
      """SELECT l_orderkey, l_partkey,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(0, 21),
        |    i -> (((CAST(l_orderkey AS BIGINT) >> i) & 1) << (2*i))
        |       + (((CAST(l_partkey AS BIGINT) >> i) & 1) << (2*i+1)))),
        |    (acc, x) -> acc + x) AS zkey
        |FROM lineitem WHERE l_orderkey < 400
        |ORDER BY zkey, l_orderkey, l_partkey""".stripMargin,
    "q25_typed_imperative_agg" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
        | COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q24_skew_salted_join" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q26_collect_agg" ->
      """SELECT o_orderpriority,
        | array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
        | COUNT(*) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q27_exact_median" ->
      """SELECT c_mktsegment, c_acctbal AS lower_median FROM (
        |  SELECT c_mktsegment, c_acctbal, c_custkey,
        |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment
        |      ORDER BY c_acctbal, c_custkey) AS rn,
        |    COUNT(*) OVER (PARTITION BY c_mktsegment) AS cnt
        |  FROM customer) t
        |WHERE rn = (cnt + 1) // 2
        |ORDER BY c_mktsegment""".stripMargin,
    "q40_date_functions" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS odate,
        | CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS y,
        | CAST(quarter(CAST(o_orderdate AS DATE)) AS INT) AS q,
        | CAST(month(CAST(o_orderdate AS DATE)) AS INT) AS m,
        | CAST(day(CAST(o_orderdate AS DATE)) AS INT) AS dom,
        | CAST(CAST(o_orderdate AS DATE) + INTERVAL 45 DAY AS DATE) AS plus45d,
        | CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus2m,
        | last_day(CAST(o_orderdate AS DATE)) AS month_end,
        | CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT)
        |   AS days_since_95
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q39_unpivot" ->
      """WITH c AS (SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
        |           FROM customer GROUP BY 1),
        |s AS (SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
        |      FROM supplier GROUP BY 1),
        |w AS (SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
        |        COALESCE(n_customers, 0) AS n_customers,
        |        COALESCE(n_suppliers, 0) AS n_suppliers
        |      FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey)
        |SELECT nationkey, 'n_customers' AS metric,
        |  CAST(n_customers AS BIGINT) AS n FROM w
        |UNION ALL
        |SELECT nationkey, 'n_suppliers' AS metric,
        |  CAST(n_suppliers AS BIGINT) AS n FROM w
        |ORDER BY nationkey, metric""".stripMargin,
    "q38_percentile_family" ->
      """SELECT l_returnflag,
        | percentile_cont(0.25) WITHIN GROUP (ORDER BY l_quantity) AS p25_cont,
        | percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity) AS p50_cont,
        | percentile_cont(0.75) WITHIN GROUP (ORDER BY l_quantity) AS p75_cont,
        | percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity) AS p25_disc,
        | percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity) AS p50_disc,
        | percentile_disc(0.75) WITHIN GROUP (ORDER BY l_quantity) AS p75_disc
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q28_full_outer_join" ->
      """SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
        | c.n_customers, s.n_suppliers
        |FROM (SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
        |      FROM customer GROUP BY 1) c
        |FULL OUTER JOIN (SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
        |      FROM supplier GROUP BY 1) s
        |ON c.nationkey = s.nationkey
        |ORDER BY nationkey""".stripMargin,
    "q31_rank_functions" ->
      """SELECT c_mktsegment, c_custkey, rnk, drnk, prnk, cdist, quartile, top_key
        |FROM (
        |  SELECT c_mktsegment, c_custkey,
        |    RANK() OVER w AS rnk,
        |    DENSE_RANK() OVER w AS drnk,
        |    PERCENT_RANK() OVER w AS prnk,
        |    CUME_DIST() OVER w AS cdist,
        |    NTILE(4) OVER w AS quartile,
        |    FIRST_VALUE(c_custkey) OVER (PARTITION BY c_mktsegment
        |      ORDER BY c_acctbal DESC, c_custkey ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS top_key
        |  FROM customer
        |  WINDOW w AS (PARTITION BY c_mktsegment
        |    ORDER BY c_acctbal DESC, c_custkey ASC)) t
        |WHERE rnk <= 10 ORDER BY c_mktsegment, rnk""".stripMargin,
    "q32_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |                        (o_orderstatus), ())
        |ORDER BY o_orderstatus ASC NULLS FIRST,
        |         o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q33_csv_roundtrip" ->
      """SELECT n_regionkey, COUNT(*) AS n_nations, MIN(n_name) AS first_nation
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
    "q35_null_aware_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
        |                        WHERE o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin,
    "q37_lead_lag" ->
      """SELECT o_custkey, o_orderkey,
        | LAG(o_totalprice, 1) OVER w AS prev_price,
        | LEAD(o_totalprice, 1) OVER w AS next_price,
        | o_totalprice - LAG(o_totalprice, 1) OVER w AS delta
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q36_lateral_topn" ->
      """SELECT r_name, t.n_name FROM region,
        |LATERAL (SELECT n_name FROM nation
        |         WHERE n_regionkey = r_regionkey
        |         ORDER BY n_name LIMIT 2) t
        |ORDER BY r_name, n_name""".stripMargin,
    "q34_json_roundtrip" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders WHERE o_orderstatus = 'O'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q61_waiting_supplier" ->
      """SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        |FROM supplier, lineitem l1, orders
        |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin,
    "q60_linear_fit" ->
      """WITH t AS (
        |  SELECT l_returnflag,
        |    CAST(l_quantity AS BIGINT) AS x,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS yc
        |  FROM lineitem),
        |g AS (
        |  SELECT l_returnflag, CAST(COUNT(*) AS HUGEINT) AS n,
        |    SUM(x) AS sx, SUM(yc) AS sy, SUM(x * yc) AS sxy,
        |    SUM(x * x) AS sx2, SUM(yc * yc) AS sy2
        |  FROM t GROUP BY l_returnflag),
        |f AS (
        |  SELECT l_returnflag, n,
        |    CAST(n * sxy - sx * sy AS DOUBLE) AS num,
        |    CAST(n * sx2 - sx * sx AS DOUBLE) AS dx,
        |    CAST(n * sy2 - sy * sy AS DOUBLE) AS dy,
        |    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
        |    CAST(n AS DOUBLE) AS nd
        |  FROM g)
        |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
        |  num / sqrt(dx * dy) AS corr_qty_price,
        |  num / dx / 100.0 AS slope,
        |  (syd - num / dx * sxd) / nd / 100.0 AS intercept
        |FROM f ORDER BY l_returnflag""".stripMargin,
    "q59_orc_roundtrip" ->
      """SELECT s_nationkey, COUNT(*) AS n_suppliers,
        | CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
        |FROM supplier WHERE s_nationkey < 10
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "q30_range_frame" ->
      """SELECT o_custkey, o_orderkey,
        | epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000 AS day,
        | o_totalprice,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |   PARTITION BY o_custkey
        |   ORDER BY epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000
        |   RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_30d
        |FROM orders ORDER BY o_custkey, day, o_orderkey""".stripMargin,
    "q29_array_result" ->
      """SELECT yr, array_to_string(arr, ',') AS statuses,
        | CAST(len(arr) AS INT) AS n_statuses,
        | arr[1] AS first_status, n
        |FROM (SELECT CAST(YEAR(o_orderdate) AS INT) AS yr,
        |        list_sort(list(DISTINCT o_orderstatus)) AS arr,
        |        COUNT(*) AS n
        |      FROM orders GROUP BY 1) t
        |ORDER BY yr""".stripMargin,
    "q57_observe_metrics" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |   AS sum_price,
        | MIN(l_shipdate) AS min_ship, MAX(l_shipdate) AS max_ship
        |FROM lineitem WHERE l_quantity > 10""".stripMargin,
    "q58_recursive_cte" ->
      """WITH RECURSIVE walk(custkey, node, depth) AS (
        |  SELECT c_custkey, c_custkey, 0 FROM customer WHERE c_custkey < 64
        |  UNION ALL
        |  SELECT custkey, node // 2, depth + 1 FROM walk WHERE node > 1
        |)
        |SELECT custkey, MAX(depth) AS depth,
        |  CAST(SUM(node) AS BIGINT) AS path_sum
        |FROM walk GROUP BY custkey ORDER BY custkey""".stripMargin,
  )
}
