package graft

/** Plan-shape regression guard: executes every registered query at
  * sf0.001 and asserts the physical-plan properties the 100 TB design
  * depends on. A future edit that sneaks a cartesian product, drops a
  * broadcast, or breaks scan pushdown fails HERE, not in a cluster.
  */
class PlanAuditSpec extends SparkSuite {

  private def executedPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf0001)
    df.collect() // materialize so AQE finalizes the plan
    df.queryExecution.executedPlan.toString
  }

  test("no query plans a CartesianProduct") {
    SparkEntry.queries.keys.foreach { name =>
      val plan = executedPlan(name)
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct:\n$plan")
    }
  }

  test("dimension joins broadcast; bucketed ANN joins stay equi") {
    assert(executedPlan("q03_join_broadcast").contains("BroadcastHashJoin"))
    val vs02 = executedPlan("vs02_knn_bucketed")
    assert(vs02.contains("BroadcastHashJoin") || vs02.contains("SortMergeJoin"),
      s"vs02 lost its hash/merge equi-join:\n$vs02")
    assert(!vs02.contains("BroadcastNestedLoopJoin"),
      "vs02 degenerated to a nested-loop join")
  }

  test("filters and projections reach the parquet scan") {
    val q02 = executedPlan("q02_filter_project")
    assert(q02.contains("PushedFilters: [IsNotNull(l_quantity)") ||
      q02.contains("PushedFilters: [IsNotNull"),
      s"q02 scan lost its pushed filters:\n$q02")
    // projection pruning: the scan must not read every lineitem column
    assert(!q02.contains("l_comment"),
      "q02 reads columns its projection never uses")
  }

  test("st09's stream-stream-shaped join pushes type filters and stays equi") {
    val p = executedPlan("st09_stream_stream_join")
    assert(p.contains("PushedFilters") && p.contains("EqualTo(event_type,purchase)"),
      s"st09 lost its pushed event-type filter:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "st09's range join degenerated from its bucketized equi form")
  }

  test("ns13's sampling is one scan and one aggregation exchange") {
    val p = executedPlan("ns13_stratified_sample")
    // partial + final hash aggregate around a single shuffle (plus the
    // final orderBy's range exchange) — no join, no extra shuffle. AQE
    // plan strings repeat the pre-adaptive plan after "== Initial Plan =="
    // — count exchanges in the final section only.
    val finalPlan = p.split("== Initial Plan ==").head
    assert(finalPlan.contains("HashAggregate"), s"ns13 lost hash aggregation:\n$p")
    assert(!finalPlan.contains("Join"), s"ns13 should not join:\n$p")
    assert(finalPlan.split("Exchange ").length - 1 <= 2,
      s"ns13 grew extra shuffles:\n$p")
  }

  test("top-k window queries keep Spark's rank pushdown (WindowGroupLimit)") {
    // A rank/row_number filter after a window should lower to
    // WindowGroupLimit with a PARTIAL instance below the exchange: each
    // map task keeps at most k rows per group BEFORE the shuffle, so at
    // corpus scale the window exchange carries tasks × groups × k rows,
    // never the corpus. A refactor that hides the rank filter from the
    // optimizer (e.g. a materialization boundary or an expression the
    // InferWindowGroupLimit rule can't see through) silently reverts to
    // full per-group sorts — this pins the pushdown on the top-k window
    // family.
    Seq("q05_window_topk", "st07_latest_n_per_key", "st17_windowed_topk",
        "vs01_knn_brute").foreach { name =>
      val p = executedPlan(name)
      assert(p.contains("WindowGroupLimit"),
        s"$name lost the WindowGroupLimit rank pushdown:\n$p")
      assert(p.contains("Partial"),
        s"$name has no partial (pre-shuffle) WindowGroupLimit:\n$p")
    }
  }

  test("ns44's per-cluster argmax is a partial aggregation, not a window") {
    // The representative pick needs BOTH the cluster's best row and its
    // count — a window form stacks an unbounded COUNT over the rank,
    // which blocks the rank pushdown and ships every cluster member
    // through the sort. The aggregation form (max over struct) collapses
    // map-side; pin that a refactor doesn't regress to the window.
    val p = executedPlan("ns44_cluster_best")
    val finalPlan = p.split("== Initial Plan ==").head
    assert(!finalPlan.contains("Window"),
      s"ns44 regressed to a windowed argmax:\n$p")
    assert(finalPlan.contains("partial_max") || finalPlan.contains("partial_count"),
      s"ns44 lost its partial aggregation:\n$p")
  }

  test("q38's percentile aggregation aggregates without a join or window") {
    val p = executedPlan("q38_percentile_family")
    assert(!p.contains("Join") && !p.contains("Window"),
      s"q38 should be a pure two-phase aggregation:\n$p")
  }

  test("ns15's decontamination joins the benchmark grams by broadcast") {
    // the corpus side must meet the (tiny) benchmark gram set in a
    // broadcast hash join — a shuffled join here would move the corpus
    val p = executedPlan("ns15_decontaminate")
    assert(p.contains("BroadcastHashJoin"),
      s"ns15 lost the broadcast gram join:\n$p")
  }

  test("ns16's mixture allocation broadcasts the per-source rates") {
    val p = executedPlan("ns16_token_budget_mix")
    assert(p.contains("BroadcastHashJoin"),
      s"ns16 lost the broadcast rates join:\n$p")
  }

  test("vs08's trained-IVF candidate join is a broadcast equi-join") {
    val p = executedPlan("vs08_ivf_trained_recall")
    assert(p.contains("BroadcastHashJoin"),
      s"vs08's probe-label join degenerated:\n$p")
  }

  test("cdc20's SCD2 build is one window over one shuffle, no join") {
    val p = executedPlan("cdc20_scd2_history")
    val finalPlan = p.split("== Initial Plan ==").head
    assert(finalPlan.contains("Window"), s"cdc20 lost its window:\n$p")
    assert(!finalPlan.contains("Join"), s"cdc20 should not join:\n$p")
  }

  test("ns17's bottom-k sample aggregates partially — no window, no sort of the corpus") {
    val p = executedPlan("ns17_bottomk_sample")
    val finalPlan = p.split("== Initial Plan ==").head
    assert(finalPlan.contains("ObjectHashAggregate") &&
      finalPlan.contains("partial_bottom_k"),
      s"ns17 lost its partial bottom-k aggregation:\n$p")
    assert(!finalPlan.contains("Window"), s"ns17 regressed to a window sort:\n$p")
  }

  test("q47's bloom test filters the fact side before its semi join") {
    val p = executedPlan("q47_bloom_prune_join")
    assert(p.contains("bloom_might_contain"), s"q47 lost the bloom filter:\n$p")
    assert(p.contains("LeftSemi"), s"q47 lost the verifying semi join:\n$p")
    // the bloom must appear on the fact scan's Filter, i.e. before any join
    val joinIdx = p.indexOf("Join")
    val bloomIdx = p.indexOf("bloom_might_contain")
    assert(bloomIdx > joinIdx, // plan prints top-down: filter is BELOW the join
      s"q47's bloom filter is not under the join:\n$p")
  }

  test("ns19's heavy hitters aggregate partially with no per-token shuffle rows") {
    val p = executedPlan("ns19_heavy_hitters")
    val finalPlan = p.split("== Initial Plan ==").head
    assert(finalPlan.contains("ObjectHashAggregate") &&
      finalPlan.contains("partial_heavy_hitters"),
      s"ns19 lost its partial sketch aggregation:\n$p")
    assert(!finalPlan.contains("Window"), s"ns19 must not sort the token stream:\n$p")
  }

  test("q48's rank gate joins the tiny percentile table by broadcast") {
    val p = executedPlan("q48_approx_quantiles")
    assert(p.contains("BroadcastHashJoin"),
      s"q48's per-group percentile join degenerated:\n$p")
  }

  test("st11's dimension join broadcasts; the stream side never shuffles for it") {
    val p = executedPlan("st11_stream_static_join")
    assert(p.contains("BroadcastHashJoin"),
      s"st11 lost the broadcast dimension join:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"st11 shuffled the stream side for the dim join:\n$p")
  }

  test("ns22's repetition stats aggregate partially and never join or window") {
    val p = executedPlan("ns22_repetition_stats")
    val finalPlan = p.split("== Initial Plan ==").head
    assert(finalPlan.contains("HashAggregate"),
      s"ns22 lost hash aggregation:\n$p")
    assert(!finalPlan.contains("Join") && !finalPlan.contains("Window"),
      s"ns22 should be two keyed aggregations, nothing else:\n$p")
  }

  test("ns23's pseudonymization is scan-local — no shuffle before the sort") {
    val p = executedPlan("ns23_pii_pseudonymize")
    val finalPlan = p.split("== Initial Plan ==").head
    assert(!finalPlan.contains("Join") && !finalPlan.contains("HashAggregate"),
      s"ns23 must not join or aggregate:\n$p")
    // the only exchange is the presentation sort's range partitioning
    assert(finalPlan.split("Exchange ").length - 1 <= 1,
      s"ns23 grew a non-sort shuffle:\n$p")
  }

  test("ns24's document-frequency table joins by broadcast") {
    val p = executedPlan("ns24_tfidf_top_token")
    assert(p.contains("BroadcastHashJoin"),
      s"ns24's vocabulary-sized df table must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"ns24 shuffled the corpus side for the df join:\n$p")
  }

  test("q51's array pipeline is one grouping shuffle, all scan-local after") {
    val p = executedPlan("q51_higher_order")
    val finalPlan = p.split("== Initial Plan ==").head
    assert(!finalPlan.contains("Join") && !finalPlan.contains("Window"),
      s"q51 should be one grouped collect + array projections:\n$p")
    // grouping exchange + presentation sort exchange, nothing else
    assert(finalPlan.split("Exchange ").length - 1 <= 2,
      s"q51 grew extra shuffles:\n$p")
  }

  test("ns26's CountMin sketch aggregates partially — fixed-size grids, no token shuffle") {
    val p = executedPlan("ns26_countmin_freq")
    val finalPlan = p.split("== Initial Plan ==").head
    assert(finalPlan.contains("ObjectHashAggregate") &&
      finalPlan.contains("partial_countmin_freq"),
      s"ns26 lost its partial sketch aggregation:\n$p")
    assert(!finalPlan.contains("Window") && !finalPlan.contains("Join"),
      s"ns26 must not sort or join the token stream:\n$p")
  }

  test("ns25's chunking is scan-local — explode, no join, no aggregation") {
    val p = executedPlan("ns25_chunking")
    val finalPlan = p.split("== Initial Plan ==").head
    assert(finalPlan.contains("Generate"), s"ns25 lost its explode:\n$p")
    assert(!finalPlan.contains("Join") && !finalPlan.contains("HashAggregate"),
      s"ns25 must not join or aggregate:\n$p")
    assert(finalPlan.split("Exchange ").length - 1 <= 1,
      s"ns25 grew a non-sort shuffle:\n$p")
  }

  test("vs14's IVF-PQ candidate and codebook joins broadcast the small sides") {
    val p = executedPlan("vs14_ivfpq_search")
    assert(p.contains("BroadcastHashJoin"),
      s"vs14's probe/codebook equi-joins must broadcast:\n$p")
  }

  test("vs13's MMR result unions the checkpointed greedy steps, no live joins") {
    // The greedy steps are eagerly local-checkpointed at construction
    // (each references the pool and every earlier step — lazy plans
    // would double per step), so the RETURNED plan must be a union of
    // checkpoint scans with no join left to re-execute.
    val p = executedPlan("vs13_mmr_diversified")
    assert(p.contains("Union") && p.contains("ExistingRDD"),
      s"vs13 should union the checkpointed steps:\n$p")
    assert(!p.contains("Join"),
      s"vs13's joins must run at construction, not in the returned plan:\n$p")
  }

  test("ns29's BM25 joins broadcast the query set and vocabulary") {
    // the corpus-sized side is the (doc, tok) tf table; both the query
    // terms and the document-frequency table must come to it broadcast
    val p = executedPlan("ns29_bm25_topk")
    assert(p.contains("BroadcastHashJoin"),
      s"ns29 lost its broadcast term/vocabulary joins:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"ns29 degenerated to a nested loop:\n$p")
  }

  test("st13's left-outer range join stays bucketized — no nested loop") {
    val p = executedPlan("st13_outer_stream_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"st13's outer range join degenerated from its equi form:\n$p")
  }

  test("st14's funnel is windows over one user partitioning — no join") {
    val p = executedPlan("st14_funnel")
    assert(!p.contains("Join"), s"st14 must not self-join the stages:\n$p")
    assert(p.contains("Window"), s"st14 lost its window form:\n$p")
  }

  test("ns34's collocation joins broadcast the token-frequency table") {
    // the corpus-sized side is the per-doc pair set; both ca lookups
    // must broadcast, and the global top-20 must be the distributed
    // TakeOrderedAndProject (per-partition heaps), never a
    // single-partition window sort over the lift table
    val p = executedPlan("ns34_collocation")
    assert(p.contains("BroadcastHashJoin"),
      s"ns34 lost its broadcast frequency joins:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"ns34 degenerated to a nested loop:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"ns34's top-20 must be a distributed TakeOrderedAndProject:\n$p")
    assert(!p.contains("Window"),
      s"ns34 must not rank via a global (single-partition) window:\n$p")
  }

  test("ns35's triangle wedge/closure joins stay equi-keyed — no nested loop") {
    // degree-oriented counting only works at scale if the wedge join
    // (on the low endpoint) and closure join (on the edge pair) are
    // shuffled/broadcast EQUI joins over the oriented edge set
    val p = executedPlan("ns35_triangles")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"ns35's wedge/closure degenerated to a nested loop:\n$p")
  }

  test("st17's rank window sits on the windowed aggregate, not raw events") {
    // the count agg must come first (partial+final), with the top-3
    // row_number partitioned by the time window over the aggregate
    val p = executedPlan("st17_windowed_topk")
    assert(p.contains("HashAggregate"), s"st17 lost its count aggregate:\n$p")
    assert(p.contains("Window"), s"st17 lost its rank window:\n$p")
    assert(!p.contains("Join"), s"st17 must not join:\n$p")
  }

  test("q54's correlated EXISTS/NOT EXISTS stay equi-keyed semi/anti joins") {
    val p = executedPlan("q54_multi_exists")
    assert(p.contains("LeftSemi") && p.contains("LeftAnti"),
      s"q54's subqueries must rewrite to semi/anti joins:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"q54's correlation degenerated to a nested loop:\n$p")
  }

  test("cdc28's changelog netting is one window over one key shuffle, no join") {
    val p = executedPlan("cdc28_changelog_net")
    val finalPlan = p.split("== Initial Plan ==").head
    assert(finalPlan.contains("Window"), s"cdc28 lost its window:\n$p")
    assert(!finalPlan.contains("Join"), s"cdc28 should not join:\n$p")
    // one key-hash exchange for the window + the presentation sort's
    // range exchange — anything more means first/last/count stopped
    // sharing the single window partitioning
    assert(finalPlan.split("Exchange ").length - 1 <= 2,
      s"cdc28 grew extra shuffles:\n$p")
  }

  test("ns50's top-512 cut is a TakeOrdered heap, never a global vocab sort") {
    val p = executedPlan("ns50_zipf_curve")
    val finalPlan = p.split("== Initial Plan ==").head
    assert(finalPlan.contains("TakeOrderedAndProject"),
      s"ns50 lost its TakeOrderedAndProject rank cut:\n$p")
  }

  test("st20's lateness profile is windows + aggregation over the user partitioning, no join") {
    val p = executedPlan("st20_watermark_profile")
    val finalPlan = p.split("== Initial Plan ==").head
    assert(finalPlan.contains("Window"), s"st20 lost its running-max window:\n$p")
    assert(!finalPlan.contains("Join"), s"st20 should not join:\n$p")
  }

  test("vs25's merged-index candidate join broadcasts the probe set, stays equi") {
    val p = executedPlan("vs25_incremental_index")
    assert(p.contains("BroadcastHashJoin"),
      s"vs25 lost the broadcast probe join:\n$p")
    assert(!p.contains("CartesianProduct"),
      "vs25 degenerated to an all-pairs scan")
  }

  test("cdc30's gap audit anti-joins on the computed key — never a global-order window") {
    val p = executedPlan("cdc30_version_gaps")
    val finalPlan = p.split("== Initial Plan ==").head
    assert(!finalPlan.contains("Window"),
      s"cdc30 must not serialize the feed through a window:\n$p")
    assert(finalPlan.contains("LeftAnti"), s"cdc30 lost its anti join:\n$p")
  }

  test("ns51's pairwise sketch stage broadcasts; the gram side never pair-joins") {
    val p = executedPlan("ns51_kmv_overlap")
    val finalPlan = p.split("== Initial Plan ==").head
    // the only join is over the n_sources-row sketch table (broadcast
    // nested loop on src_a < src_b — k-bounded metadata); the per-gram
    // data must never meet itself in a join
    assert(finalPlan.contains("BroadcastNestedLoopJoin"),
      s"ns51 lost the broadcast sketch pairing:\n$p")
    assert(finalPlan.split("Join").length - 1 <= 1,
      s"ns51 grew a second (per-gram?) join:\n$p")
  }

  test("q60's fit is pure partial aggregation — no join, no window, one group shuffle") {
    val p = executedPlan("q60_linear_fit")
    val finalPlan = p.split("== Initial Plan ==").head
    assert(!finalPlan.contains("Join") && !finalPlan.contains("Window"),
      s"q60 should be sufficient-statistics aggregation only:\n$p")
    assert(finalPlan.contains("partial_sum") || finalPlan.contains("HashAggregate"),
      s"q60 lost its partial aggregation:\n$p")
  }

  test("ns54's MAD gate broadcasts the per-source median tables") {
    val p = executedPlan("ns54_mad_outliers")
    val finalPlan = p.split("== Initial Plan ==").head
    assert(finalPlan.contains("BroadcastHashJoin"),
      s"ns54's median tables must broadcast:\n$p")
    assert(!finalPlan.contains("SortMergeJoin"),
      s"ns54 shuffled the corpus for a source-count-sized table:\n$p")
  }

  test("ns45 buckets by broadcast sampled thresholds — no source-sized window") {
    val p = executedPlan("ns45_perplexity_buckets")
    val finalPlan = p.split("== Initial Plan ==").head
    // The r12 formulation ran ntile(3) OVER (PARTITION BY source ...),
    // which serializes each source's whole document set through one
    // window task. The CCNet-sampled-threshold form has no window AT
    // ALL: the sample is a bounded bottom-k heap aggregate and the cut
    // rows reach the corpus through a broadcast join.
    assert(!finalPlan.contains("Window"),
      s"ns45 regressed to a source-partitioned window:\n$p")
    assert(finalPlan.contains("partial_bottom_k"),
      s"ns45 lost its bounded sample heap:\n$p")
    assert(finalPlan.contains("BroadcastHashJoin"),
      s"ns45's cut rows must broadcast:\n$p")
  }

  test("q61's double subquery lowers to semi+anti joins with a broadcast dim") {
    val p = executedPlan("q61_waiting_supplier")
    val finalPlan = p.split("== Initial Plan ==").head
    assert(finalPlan.contains("LeftSemi"), s"q61 lost the EXISTS semi join:\n$p")
    assert(finalPlan.contains("LeftAnti"), s"q61 lost the NOT EXISTS anti join:\n$p")
    assert(finalPlan.contains("BroadcastHashJoin"),
      s"q61's supplier dimension must broadcast:\n$p")
    assert(finalPlan.contains("TakeOrderedAndProject"),
      s"q61's top-20 must be a TakeOrderedAndProject, not a global sort:\n$p")
  }

  test("ns45's sample branch reuses the scoring exchange") {
    // The cut-row branch semi-restricts the SAME per-doc scoring
    // aggregate the bucketing consumes; if the subtrees drift apart the
    // heavy scoring runs twice. ReusedExchange in the final plan is the
    // mechanical witness that it runs once.
    val p = executedPlan("ns45_perplexity_buckets")
    val finalPlan = p.split("== Initial Plan ==").head
    assert(finalPlan.contains("ReusedExchange") ||
      finalPlan.contains("TableCacheQueryStage") ||
      finalPlan.contains("ReusedSubquery"),
      s"ns45's scoring subtree is computed more than once:\n$p")
  }

  test("vs31's covariance agg combines map-side and broadcasts the marginals") {
    // The d² pair sums must partial-aggregate before the shuffle (the
    // shuffle is tasks×d² rows, never data-sized) and the 64-row
    // marginal table must broadcast into the final join.
    val p = executedPlan("vs31_embedding_covariance")
    assert(p.contains("partial_sum"),
      s"vs31's cross-term aggregate lost its map-side combine:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"vs31's marginal join must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"vs31 shuffles a dimension-bounded join:\n$p")
  }

  test("vs33's lifecycle search probes the final postings by broadcast equi-join") {
    // The composed lifecycle must end in the same search shape as the
    // single-phase entries (vs08/vs16): probe assignments broadcast
    // into a label equi-join against the postings artifact, candidates
    // bounded per query by the group-limit pushdown. (The k-centroid
    // cross product inside probe assignment is the designed bounded
    // nested loop every IVF query carries — not audited here.)
    val p = executedPlan("vs33_index_lifecycle")
    val finalPlan = p.split("== Initial Plan ==").head
    assert(finalPlan.contains("BroadcastHashJoin"),
      s"vs33's probe join lost its broadcast:\n$p")
    assert(finalPlan.contains("WindowGroupLimit"),
      s"vs33's top-k lost the group-limit pushdown:\n$p")
  }

  test("ns54's windows rank the per-(source,value) histogram, never raw documents") {
    // The median walk is value-DOMAIN-bounded only because its window
    // input is the (source, value) histogram aggregate; a refactor that
    // re-ranks raw documents (the r12 shape ns45 once had) would still
    // return correct values but serialize each source's whole document
    // set through one window task. Mechanical form: every WindowExec in
    // the executed plan must have a grouping aggregate STRICTLY BELOW it.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.aggregate.{BaseAggregateExec, HashAggregateExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    import org.apache.spark.sql.execution.window.WindowExec
    def allNodes(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case r: ReusedExchangeExec => Seq(r.child)
        case other => other.children
      }
      p +: kids.flatMap(allNodes)
    }
    val df = SparkEntry.queries("ns54_mad_outliers")(spark, sf0001)
    df.collect() // finalize AQE
    val windows = allNodes(df.queryExecution.executedPlan)
      .collect { case w: WindowExec => w }
    assert(windows.nonEmpty, "ns54 lost its histogram-walk windows entirely")
    windows.foreach { w =>
      val below = allNodes(w.child)
      assert(below.exists(_.isInstanceOf[BaseAggregateExec]),
        s"ns54 window ranks un-aggregated rows (corpus-sized partition):\n$w")
    }
    // and the histogram aggregate is the hash form (map-side combined)
    assert(allNodes(df.queryExecution.executedPlan)
      .exists(_.isInstanceOf[HashAggregateExec]),
      "ns54's histogram lost hash aggregation")
  }

  test("ns60's carry window cumulates the range aggregate; row windows stay bucket-partitioned") {
    // The packing prefix sum is scale-honest only if the ONE global-
    // order window runs over the per-range partial sums (≤ buckets
    // rows, metadata-sized) and every window that touches corpus rows
    // is partitioned by the range key. A refactor to a single
    // SUM-OVER-(ORDER BY id) would still return correct values but
    // serialize the whole corpus through one window task.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    import org.apache.spark.sql.execution.window.WindowExec
    def allNodes(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case r: ReusedExchangeExec => Seq(r.child)
        case other => other.children
      }
      p +: kids.flatMap(allNodes)
    }
    val df = SparkEntry.queries("ns60_sequence_packing")(spark, sf0001)
    df.collect() // finalize AQE
    val windows = allNodes(df.queryExecution.executedPlan)
      .collect { case w: WindowExec => w }
    assert(windows.size >= 2, s"ns60 lost its two-phase window shape ($windows)")
    windows.filter(_.partitionSpec.isEmpty).foreach { w =>
      assert(allNodes(w.child).exists(_.isInstanceOf[BaseAggregateExec]),
        s"ns60's global-order window must cumulate the range AGGREGATE, " +
          s"not corpus rows:\n$w")
    }
    assert(windows.exists(_.partitionSpec.nonEmpty),
      "ns60 lost its bucket-partitioned local cumsum window")
  }

  test("scan-aggregation stays inside whole-stage codegen") {
    // '*(n)' is the WholeStageCodegen stage marker in executed-plan
    // strings; both aggregates must carry it
    val q01 = executedPlan("q01_pricing_summary")
    assert(q01.contains("*(1) HashAggregate") || q01.contains("*(2) HashAggregate"),
      s"q01's aggregation fell out of codegen:\n$q01")
  }

  /** Corpus-scan count in the FINAL plan section — the guard for the
    * model-materialization rule (SCALE.md round 14): a multiply-
    * consumed bounded aggregate must come off its artifact, never
    * rescan the corpus per consumer. */
  private def scansOf(plan: String, table: String): Int = {
    val finalPlan = plan.split("== Initial Plan ==").head
    finalPlan.sliding(table.length).count(_ == table)
  }

  test("ns62/ns63 score with ONE corpus scan; the model comes off its artifact") {
    Seq("ns62_dsir_weights", "ns63_kn_heldout").foreach { name =>
      val p = executedPlan(name)
      assert(scansOf(p, "documents.parquet") == 1,
        s"$name rescans the corpus for its model tables:\n$p")
    }
  }

  test("ns64's waterfill never rescans the corpus — metadata table only") {
    val p = executedPlan("ns64_unimax_quota")
    assert(scansOf(p, "documents.parquet") == 0,
      s"ns64's returned plan must read only the per-language artifact:\n$p")
    assert(!p.split("== Initial Plan ==").head.contains("CartesianProduct"))
  }

  test("vs41's scoring pass is one corpus scan against broadcast literals") {
    val p = executedPlan("vs41_ood_residual")
    assert(scansOf(p, "embeddings.parquet") == 1,
      s"vs41 must score in one scan (stats are collected, not re-planned):\n$p")
    val finalPlan = p.split("== Initial Plan ==").head
    assert(!finalPlan.contains("Join"),
      s"vs41's scoring must be join-free projection:\n$p")
  }

  test("ns65's confusion matrix is one scan; totals window over the cell table") {
    val p = executedPlan("ns65_langid_confusion")
    assert(scansOf(p, "documents.parquet") == 1,
      s"ns65 must not rescan for its per-language totals:\n$p")
    assert(!p.split("== Initial Plan ==").head.contains("Join"),
      s"ns65 should window over cells, not join:\n$p")
  }

  test("vs43's label attaches broadcast the tiny ranked side") {
    val p = executedPlan("vs43_retrieval_metrics")
    val finalPlan = p.split("== Initial Plan ==").head
    assert(finalPlan.contains("BroadcastHashJoin"),
      s"vs43 lost its broadcast label joins:\n$p")
    assert(!finalPlan.contains("SortMergeJoin") &&
      !finalPlan.contains("CartesianProduct"),
      s"vs43's label attach must never shuffle the ranked side:\n$p")
  }

  test("cdc32's merged sketch reads the artifact; events feed only the witness") {
    val p = executedPlan("cdc32_kmv_artifact")
    assert(scansOf(p, "events.parquet") == 1,
      s"cdc32 must scan events once (the monolithic witness), the rest " +
        s"comes off the persisted sketch rows:\n$p")
  }

  test("cdc33-cdc42 answer off the store and its artifacts, never the raw feed") {
    Seq("cdc33_indexed_lookup", "cdc34_bloom_lookup",
        "cdc35_range_lookup", "cdc36_index_intersection",
        "cdc37_sql_index_scan", "cdc38_stream_sink_e2e",
        "cdc39_prefix_lookup", "cdc40_sql_insert_apply",
        "cdc41_composite_index", "cdc42_ct_source_to_sink").foreach { name =>
      val p = executedPlan(name)
      assert(scansOf(p, "events.parquet") == 0,
        s"$name's returned plan must read buckets/postings only — the " +
          s"feed was consumed at apply time:\n$p")
    }
  }

  test("st22's drift monitor returns the artifact, not the corpus") {
    // the three per-epoch profile scans happened at ingest time (off
    // the persisted doc cache); the monitor read is artifact-only
    val p = executedPlan("st22_drift_monitor")
    assert(scansOf(p, "events.parquet") == 0,
      s"st22's returned plan must read the monitor artifact only:\n$p")
  }

  test("q64's drift profile is one corpus scan with a row-local explode") {
    val p = executedPlan("q64_variant_schema_profile")
    assert(scansOf(p, "events.parquet") == 1,
      s"q64 must profile the corpus in a single scan:\n$p")
    val finalPlan = p.split("== Initial Plan ==").head
    assert(finalPlan.contains("Generate"),
      s"q64 lost its variant_explode generator:\n$p")
    assert(!finalPlan.contains("SortMergeJoin") &&
      !finalPlan.contains("BroadcastHashJoin"),
      s"q64 is scan→explode→agg; a join crept in:\n$p")
  }

  test("ns66/ns67 pack off their cost artifacts, never rescanning the corpus") {
    // packSequences consumes its input in two branches; the per-doc
    // cost table is a materialized artifact so the returned plan reads
    // ONLY it — the corpus scan + broadcast word-table join happened
    // once, at artifact build time.
    Seq("ns66_bpe_packing" -> "ns66-costs",
        "ns67_bpe_pack_chunks" -> "ns67-costs").foreach { case (name, art) =>
      val p = executedPlan(name)
      assert(scansOf(p, "documents.parquet") == 0,
        s"$name's packing plan must run off the cost artifact:\n$p")
      assert(scansOf(p, art) >= 1,
        s"$name's packing plan lost its artifact read:\n$p")
      val finalPlan = p.split("== Initial Plan ==").head
      assert(finalPlan.contains("Window"),
        s"$name lost packing's prefix-sum windows:\n$p")
    }
  }
}
