package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The relational operator surface, declared Spark-first.
  *
  * The reference is a CDC pipeline tool with almost no relational algebra
  * of its own (SURVEY.md §2.3): its one join runs inside SQL Server, its
  * sorts are pushed-down ORDER BYs, its set op is an RDD union. This pack
  * declares the full relational surface our engine exposes once a change
  * stream has been flattened to a DataFrame (SURVEY.md §3.4) — scans,
  * projection/filter (pushed to parquet by Catalyst), broadcast + shuffle
  * joins, semi/anti joins, hash aggregation with partial aggregation,
  * rollup/cube, window functions, sort/limit, set ops, and scalar
  * functions — each hash-checked against a DuckDB oracle.
  *
  * Scale notes are per query; the common ones: filters/projections reach
  * the parquet scan (PushedFilters/ReadSchema), small dimensions are
  * broadcast explicitly, aggregations rely on Catalyst's partial+final
  * hash agg (map-side combine), and every shuffle keys on the join/group
  * columns so AQE can coalesce/skew-split at runtime.
  */
object Relational {
  import Q._

  val queries: Map[String, QueryFn] = Map(
    // TPC-H Q1 shape: the canonical scan→filter→hash-agg. One shuffle on
    // the (tiny-cardinality) group keys; partial agg does the heavy
    // lifting map-side, so the shuffle carries ~6 rows per partition
    // regardless of input size — this plan is flat to 100 TB.
    "q01_pricing_summary" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sumd2(col("l_quantity")).as("sum_qty"),
          sumd2(col("l_extendedprice")).as("sum_base_price"),
          sum(dec4(col("l_extendedprice")) * (lit(1).cast("decimal(18,4)") - dec4(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // Selective filter + narrow projection: both must reach the scan
    // (PushedFilters + 4-column ReadSchema) — the I/O-bound pattern that
    // decides 100 TB scan cost.
    "q02_filter_project" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_returnflag") === "R" && col("l_quantity") >= 30.0)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_shipdate"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // Fact ⋈ small dimension: explicit broadcast — no shuffle of the fact
    // side at any scale; part at SF100k is still broadcastable after the
    // 2-column prune.
    "q03_join_broadcast" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val p = Tables.part(s, d).select(col("p_partkey"), col("p_brand"))
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_items"), sumd2(col("l_quantity")).as("sum_qty"))
        .orderBy(col("p_brand"))
    }),

    // Multi-way join (TPC-H Q5 shape): lineitem⋈orders shuffle on
    // orderkey; customer/nation/region pruned then broadcast. Revenue per
    // nation in exact decimal.
    "q04_join_multi" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      val c = Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"))
      val n = Tables.nation(s, d).select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      val r = Tables.region(s, d).filter(col("r_name") === "ASIA").select(col("r_regionkey"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(dec4(col("l_extendedprice")) * (lit(1).cast("decimal(18,4)") - dec4(col("l_discount"))))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("n_name"))
    }),

    // Top-k per key: single shuffle on the partition key; rank pushdown
    // (WindowGroupLimit in Spark 4) keeps per-key heaps bounded at k.
    "q05_window_topk" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rnk"))
        .orderBy(col("o_custkey"), col("rnk"))
    }),

    // Global top-N: Spark plans TakeOrderedAndProject — per-partition
    // heaps of 100, no full sort at any scale.
    "q06_sort_limit" -> ((s, d) => {
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)
    }),

    // Distinct aggregation (exact): count(distinct) expands to a two-phase
    // agg; fine for low-cardinality keys. approx_count_distinct is the
    // scale path (see TextQueries for the sketch variant).
    "q07_distinct_agg" -> ((s, d) => {
      Tables.customer(s, d)
        .groupBy(col("c_mktsegment"))
        .agg(countDistinct(col("c_nationkey")).as("n_nations"),
          count(lit(1)).as("n_customers"))
        .orderBy(col("c_mktsegment"))
    }),

    // EXISTS as left-semi join — no row multiplication, build side only
    // carries the key.
    "q08_semi_join" -> ((s, d) => {
      val urgent = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      Tables.customer(s, d)
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // NOT EXISTS as left-anti join (restricted right side so the result
    // is non-empty in the fixture data: customers with no P-status order).
    "q09_anti_join" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .filter(col("o_orderstatus") === "P")
        .select(col("o_custkey"))
      Tables.customer(s, d)
        .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_acctbal"))
        .orderBy(col("c_custkey"))
    }),

    // Set ops: UNION (distinct), EXCEPT, INTERSECT — reference only has
    // RDD union (SURVEY.md §2.3); we declare the full set.
    "q10_union" -> ((s, d) => {
      Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
        .union(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
        .distinct()
        .orderBy(col("nationkey"))
    }),
    "q11_except" -> ((s, d) => {
      Tables.nation(s, d).select(col("n_nationkey").as("nationkey"))
        .except(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
        .orderBy(col("nationkey"))
    }),
    "q12_intersect" -> ((s, d) => {
      Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
        .intersect(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
        .orderBy(col("nationkey"))
    }),

    // Multiset (ALL) set-op semantics: duplicates are preserved by
    // COUNT, not collapsed — Spark plans these as aggregate+generate
    // (sum of per-side counts), no join. Aggregated to per-key
    // multiplicities so the result stays order-insensitive.
    "q49_set_ops_all" -> ((s, d) => {
      val c = Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      val su = Tables.supplier(s, d).select(col("s_nationkey").as("nationkey"))
      c.exceptAll(su).groupBy(col("nationkey")).agg(count(lit(1)).as("n_except_all"))
        .join(c.intersectAll(su).groupBy(col("nationkey"))
          .agg(count(lit(1)).as("n_intersect_all")), Seq("nationkey"), "full_outer")
        .select(col("nationkey"),
          coalesce(col("n_except_all"), lit(0L)).as("n_except_all"),
          coalesce(col("n_intersect_all"), lit(0L)).as("n_intersect_all"))
        .orderBy(col("nationkey"))
    }),

    // Hierarchical aggregates: ROLLUP / CUBE (one pass, Expand-based).
    "q13_rollup" -> ((s, d) => {
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sumd2(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }),
    "q14_cube" -> ((s, d) => {
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
    }),

    // Scalar function surface the reference actually uses — split/concat/
    // upper/lower/substr/length/CASE (SURVEY.md §2.3 "scalar functions") —
    // all codegen'd builtins, zero UDFs.
    "q15_scalar_funcs" -> ((s, d) => {
      Tables.part(s, d).select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        lower(col("p_type")).as("type_l"),
        length(col("p_name")).as("name_len"),
        substring(col("p_name"), 1, 12).as("name_pfx"),
        concat_ws(":", col("p_brand"), col("p_type")).as("brand_type"),
        (col("p_retailprice").cast("decimal(18,2)") * 2).cast("double").as("double_price"),
        when(col("p_size") < 10, "small")
          .when(col("p_size") < 30, "medium")
          .otherwise("large").as("size_class"))
        .orderBy(col("p_partkey"))
    }),

    // GROUP BY + HAVING.
    "q16_having" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"), sumd2(col("o_totalprice")).as("total_spent"))
        .filter(col("n_orders") >= 5)
        .orderBy(col("o_custkey"))
    }),

    // Scalar subquery: orders above the global mean. The mean is an exact
    // decimal sum divided in double — a 1-row broadcast join, not a
    // driver-side collect.
    "q17_scalar_subquery" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val stats = o.agg(
        (sum(col("o_totalprice").cast("decimal(18,2)")).cast("double") / count(lit(1)))
          .as("avg_price"))
      o.join(broadcast(stats))
        .filter(col("o_totalprice") > col("avg_price"))
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // Date-dimension aggregation: year/month extraction + counts.
    "q18_date_agg" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"))
        .agg(count(lit(1)).as("n_orders"), sumd2(col("o_totalprice")).as("total"))
        .orderBy(col("yr"), col("mo"))
    }),

    // Pivot: status columns per priority (fixed value list → static
    // schema; counts coalesced to 0 to match COUNT(CASE...) semantics).
    "q19_pivot" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("O", "F", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("O"), lit(0L)).as("n_open"),
          coalesce(col("F"), lit(0L)).as("n_finished"),
          coalesce(col("P"), lit(0L)).as("n_pending"))
        .orderBy(col("o_orderpriority"))
    }),

    // Running/frame window functions: cumulative sum (exact decimal,
    // cast per row), lag, rank — one shuffle on the partition key.
    "q20_window_running" -> ((s, d) => {
      val byCust = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val run = byCust.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d).select(
        col("o_custkey"), col("o_orderkey"),
        sum(col("o_totalprice").cast("decimal(18,2)")).over(run)
          .cast("double").as("run_total"),
        row_number().over(byCust).as("seq"),
        lag(col("o_totalprice"), 1).over(byCust).as("prev_price"))
        .orderBy(col("o_custkey"), col("seq"))
    }),
  )

  val oracle: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
        | COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
        |FROM lineitem WHERE l_returnflag = 'R' AND l_quantity >= 30.0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q03_join_broadcast" ->
      """SELECT p_brand, COUNT(*) AS n_items,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q04_join_multi" ->
      """SELECT n_name,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
        | COUNT(*) AS n_items
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q05_window_topk" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
        | FROM orders) t
        |WHERE rnk <= 3 ORDER BY o_custkey, rnk""".stripMargin,
    "q06_sort_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin,
    "q07_distinct_agg" ->
      """SELECT c_mktsegment, COUNT(DISTINCT c_nationkey) AS n_nations,
        | COUNT(*) AS n_customers
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q08_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q09_anti_join" ->
      """SELECT c_custkey, c_acctbal FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin,
    "q10_union" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |UNION SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin,
    "q11_except" ->
      """SELECT n_nationkey AS nationkey FROM nation
        |EXCEPT SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin,
    "q12_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin,
    "q49_set_ops_all" ->
      """WITH ea AS (
        |  SELECT nationkey, COUNT(*) AS n_except_all FROM (
        |    SELECT c_nationkey AS nationkey FROM customer
        |    EXCEPT ALL SELECT s_nationkey FROM supplier) t GROUP BY nationkey),
        |ia AS (
        |  SELECT nationkey, COUNT(*) AS n_intersect_all FROM (
        |    SELECT c_nationkey AS nationkey FROM customer
        |    INTERSECT ALL SELECT s_nationkey FROM supplier) t GROUP BY nationkey)
        |SELECT COALESCE(ea.nationkey, ia.nationkey) AS nationkey,
        |  COALESCE(n_except_all, 0) AS n_except_all,
        |  COALESCE(n_intersect_all, 0) AS n_intersect_all
        |FROM ea FULL OUTER JOIN ia ON ea.nationkey = ia.nationkey
        |ORDER BY nationkey""".stripMargin,
    "q13_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q14_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q15_scalar_funcs" ->
      """SELECT p_partkey, UPPER(p_brand) AS brand_u, LOWER(p_type) AS type_l,
        | LENGTH(p_name) AS name_len, SUBSTR(p_name, 1, 12) AS name_pfx,
        | CONCAT_WS(':', p_brand, p_type) AS brand_type,
        | CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 2 AS DOUBLE) AS double_price,
        | CASE WHEN p_size < 10 THEN 'small' WHEN p_size < 30 THEN 'medium'
        |      ELSE 'large' END AS size_class
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q16_having" ->
      """SELECT o_custkey, COUNT(*) AS n_orders,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
        |FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 5
        |ORDER BY o_custkey""".stripMargin,
    "q17_scalar_subquery" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > (
        |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        |  FROM orders)
        |ORDER BY o_orderkey""".stripMargin,
    "q18_date_agg" ->
      """SELECT YEAR(o_orderdate) AS yr, MONTH(o_orderdate) AS mo,
        | COUNT(*) AS n_orders,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY 1, 2 ORDER BY yr, mo""".stripMargin,
    "q19_pivot" ->
      """SELECT o_orderpriority,
        | COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_open,
        | COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_finished,
        | COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_pending
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q20_window_running" ->
      """SELECT o_custkey, o_orderkey,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_total,
        | ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS seq,
        | LAG(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price
        |FROM orders ORDER BY o_custkey, seq""".stripMargin,
  )
}
