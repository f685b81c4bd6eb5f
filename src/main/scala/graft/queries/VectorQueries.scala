package graft.queries

import graft.Tables
import graft.functions.VectorFunctions._
import graft.operators.{Similarity, Spectral}
import org.apache.spark.sql.functions._

/** Embedding similarity-search surface over the `embeddings` table
  * (training-data pipeline operators; SURVEY.md §2.3 ⊕).
  *
  * Oracle strategy: cosine is an in-order left fold over pairwise double
  * products on both engines (aggregate/zip_with ↔ list_reduce/
  * list_transform), so scores are bit-identical — no tolerance needed.
  */
object VectorQueries {
  import Q._

  // ---- shared DuckDB SQL fragments (lockstep with VectorFunctions) ----

  private def dotSql(a: String, b: String): String =
    s"""list_reduce(list_prepend(0.0, list_transform(range(1, len($a) + 1),
       |  i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))),
       |  (acc, x) -> acc + x)""".stripMargin

  private def cosSql(a: String, b: String): String =
    s"${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"

  private def bucketSql(e: String, bits: Int): String =
    s"""list_reduce(list_prepend(0, list_transform(range(0, $bits),
       |  i -> CASE WHEN $e[CAST(i AS INT) + 1] > 0
       |            THEN CAST(power(2, i) AS BIGINT) ELSE 0 END)),
       |  (acc, x) -> acc + x)""".stripMargin

  // ---- trained-IVF oracle: Lloyd iterations as generated CTE chain ----

  /** CTEs `cvec0 … cvec$iters` + `assign1 … assign$iters`: the exact SQL
    * twin of [[Similarity.ivfTrain]] — init from the k lowest vec_ids,
    * argmax-cosine assignment (ties to lower label), quantized-exact
    * per-dimension means. Deterministic on both engines because every
    * fold is in index order and every mean is an int64 sum. */
  private def ivfTrainCtes(k: Int, iters: Int, where: String = ""): String = {
    val andWhere = if (where.isEmpty) "" else s" AND ($where)"
    val trainSrc =
      if (where.isEmpty) "embeddings"
      else s"(SELECT * FROM embeddings WHERE $where)"
    val sb = new StringBuilder(
      s"""cvec0 AS (
         |  SELECT CAST(vec_id AS INT) AS label,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
         |  FROM embeddings WHERE vec_id < $k$andWhere)""".stripMargin)
    for (t <- 1 to iters) {
      sb.append(s""",
                   |assign$t AS (
                   |  SELECT vec_id, embedding, label FROM (
                   |    SELECT e.vec_id, e.embedding, c.label, ROW_NUMBER() OVER (
                   |      PARTITION BY e.vec_id
                   |      ORDER BY ${cosSql("e.embedding", "c.cv")} DESC, c.label ASC
                   |    ) AS arnk
                   |    FROM $trainSrc e CROSS JOIN cvec${t - 1} c) s
                   |  WHERE arnk = 1),
                   |cvec$t AS (
                   |  SELECT label, list(c ORDER BY i) AS cv FROM (
                   |    SELECT label, r.i AS i,
                   |      CAST(SUM(CAST(FLOOR(CAST(embedding[r.i] AS DOUBLE) * 1048576)
                   |        AS BIGINT)) AS DOUBLE) / COUNT(*) AS c
                   |    FROM assign$t, range(1, 65) r(i) GROUP BY label, r.i) d
                   |  GROUP BY label)""".stripMargin)
    }
    sb.toString
  }

  // ---- covariance + power-iteration oracle (twin of Spectral) ----

  /** CTEs `covf` = upper-triangle covariance rows (i ≤ j), identical
    * arithmetic to [[Spectral.covarianceUpper]]: int64-quantized (2^14)
    * per-dimension sums, then the fixed-order double expression
    * (S_ij/n − (S_i/n)(S_j/n)) / Scale². MATERIALIZED hints keep the
    * multiply-referenced CTEs single-evaluation (without them DuckDB's
    * inliner re-expands the chain exponentially). */
  private def covCtes: String =
    s"""covn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nd FROM embeddings),
       |covq AS MATERIALIZED (
       |  SELECT vec_id, CAST(r.i AS INT) AS i,
       |    CAST(FLOOR(CAST(embedding[r.i + 1] AS DOUBLE) * 16384.0) AS BIGINT) AS qi
       |  FROM embeddings, range(0, 64) r(i)),
       |covm AS (SELECT i, SUM(qi) AS s FROM covq GROUP BY i),
       |covp AS (
       |  SELECT a.i AS i, b.i AS j, SUM(a.qi * b.qi) AS s_ij
       |  FROM covq a JOIN covq b ON a.vec_id = b.vec_id AND a.i <= b.i
       |  GROUP BY a.i, b.i),
       |covf AS MATERIALIZED (
       |  SELECT p.i, p.j,
       |    (CAST(p.s_ij AS DOUBLE) / covn.nd
       |     - (CAST(ma.s AS DOUBLE) / covn.nd) * (CAST(mb.s AS DOUBLE) / covn.nd))
       |    / 16384.0 / 16384.0 AS cov
       |  FROM covp p
       |  JOIN covm ma ON ma.i = p.i
       |  JOIN covm mb ON mb.i = p.j
       |  CROSS JOIN covn)""".stripMargin

  /** CTEs `v0 … v$iters`: [[Spectral.principalComponent]] unrolled —
    * matrix-vector folds in ascending-j order from 0.0, norm fold in
    * ascending-i order from 0.0, one sqrt + one division per element,
    * exactly the driver-side loop's op sequence. `w$t` is referenced
    * twice (norm + normalize), so each iteration is MATERIALIZED to
    * stop the inliner doubling the chain per iteration. */
  private def powerIterCtes(iters: Int): String =
    s"""covfull AS MATERIALIZED (
       |  SELECT i, j, cov FROM covf
       |  UNION ALL
       |  SELECT j AS i, i AS j, cov FROM covf WHERE i < j),
       |${powerIterChain(iters, mat = "covfull", pfx = "")}""".stripMargin

  /** CTEs `${pfx}v0 … ${pfx}v$iters` power-iterating the full-matrix
    * CTE `mat` (columns i, j, cov) — the driver loop's op sequence
    * exactly (see [[powerIterCtes]] caller comments). With `ortho` set
    * to a converged iterate CTE (columns i, v), every raw iterate is
    * re-orthogonalized against it before normalizing — the projected
    * deflation step of [[graft.operators.Spectral.principalComponents]],
    * same folds, same multiply order (w − (d·vᵢ)). */
  private def powerIterChain(iters: Int, mat: String, pfx: String,
                             ortho: Option[String] = None): String = {
    val sb = new StringBuilder(
      s"""${pfx}v0 AS (SELECT CAST(r.i AS INT) AS i, 1.0 / sqrt(64.0) AS v
         |       FROM range(0, 64) r(i))""".stripMargin)
    for (t <- 1 to iters) {
      val raw = if (ortho.isDefined) s"${pfx}r$t" else s"${pfx}w$t"
      sb.append(s""",
                   |$raw AS MATERIALIZED (
                   |  SELECT f.i AS i,
                   |    list_reduce(list_prepend(0.0, list(f.cov * p.v ORDER BY f.j)),
                   |      (acc, x) -> acc + x) AS w
                   |  FROM $mat f JOIN ${pfx}v${t - 1} p ON p.i = f.j GROUP BY f.i)""".stripMargin)
      ortho.foreach { u =>
        sb.append(s""",
                     |${pfx}d$t AS (
                     |  SELECT list_reduce(list_prepend(0.0, list(r.w * p.v ORDER BY r.i)),
                     |    (acc, x) -> acc + x) AS dp
                     |  FROM $raw r JOIN $u p ON p.i = r.i),
                     |${pfx}w$t AS MATERIALIZED (
                     |  SELECT r.i AS i, r.w - d.dp * p.v AS w
                     |  FROM $raw r JOIN $u p ON p.i = r.i CROSS JOIN ${pfx}d$t d)""".stripMargin)
      }
      sb.append(s""",
                   |${pfx}n$t AS (
                   |  SELECT sqrt(list_reduce(list_prepend(0.0, list(w * w ORDER BY i)),
                   |    (acc, x) -> acc + x)) AS nm FROM ${pfx}w$t),
                   |${pfx}v$t AS MATERIALIZED (
                   |  SELECT i, w / nm AS v FROM ${pfx}w$t CROSS JOIN ${pfx}n$t)""".stripMargin)
    }
    sb.toString
  }

  /** Hotelling deflation CTEs: `dmat` = `mat` − λ v vᵀ for the
    * converged iterate `${vcte}` — Cv with the matrix-vector fold, λ
    * with the ascending-i fold, each entry cov − (λ·vᵢ)·vⱼ, mirroring
    * [[graft.operators.Spectral.principalComponents]] op for op. */
  private def deflateCtes(mat: String, vcte: String, dmat: String): String =
    s"""${dmat}_cv AS MATERIALIZED (
       |  SELECT f.i AS i,
       |    list_reduce(list_prepend(0.0, list(f.cov * p.v ORDER BY f.j)),
       |      (acc, x) -> acc + x) AS cv
       |  FROM $mat f JOIN $vcte p ON p.i = f.j GROUP BY f.i),
       |${dmat}_lam AS (
       |  SELECT list_reduce(list_prepend(0.0, list(p.v * c.cv ORDER BY p.i)),
       |    (acc, x) -> acc + x) AS lam
       |  FROM $vcte p JOIN ${dmat}_cv c ON c.i = p.i),
       |$dmat AS MATERIALIZED (
       |  SELECT f.i, f.j, f.cov - l.lam * a.v * b.v AS cov
       |  FROM $mat f
       |  JOIN $vcte a ON a.i = f.i
       |  JOIN $vcte b ON b.i = f.j
       |  CROSS JOIN ${dmat}_lam l)""".stripMargin

  val queries: Map[String, QueryFn] = Map(
    // Brute-force exact top-10 cosine neighbors for a broadcast query
    // set — the ANN correctness baseline. Corpus is scanned once, never
    // shuffled; per-query heaps come from window rank pushdown.
    "vs01_knn_brute" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.bruteForceTopK(emb.filter(col("vec_id") < 5), emb, k = 10)
        .orderBy(col("query_id"), col("rank"))
    }),

    // Sign-bucket LSH ANN (6 bits → 64 buckets): equi-join on bucket —
    // the scale path; recall traded for never crossing the corpus.
    "vs02_knn_bucketed" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.bucketedTopK(emb.filter(col("vec_id") < 20), emb, k = 3, bits = 6)
        .orderBy(col("query_id"), col("rank"))
    }),

    // FILTERED similarity search — the vector-store staple: top-k among
    // only the corpus vectors passing a metadata predicate. The filter
    // is applied BEFORE candidate generation (pre-filtering), so it
    // rides to the parquet scan and recall is exact w.r.t. the filtered
    // corpus — post-filtering an unfiltered top-k would return fewer
    // than k (or misranked) survivors. Same broadcast/no-corpus-shuffle
    // shape as vs01.
    "vs11_filtered_knn" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.bruteForceTopK(
        emb.filter(col("vec_id") < 5),
        emb.filter(col("label").isin(0, 1, 2)), k = 10)
        .orderBy(col("query_id"), col("rank"))
    }),

    // Hard-negative mining — the contrastive-training data op (ANCE
    // posture): per anchor, the 5 most-similar DIFFERENT-label vectors.
    // Exact over the label-filtered pair space; same broadcast/
    // no-corpus-shuffle shape as vs01, so the bucketed/IVF families
    // substitute unchanged when the index outgrows brute force.
    "vs20_hard_negatives" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.hardNegatives(emb.filter(col("vec_id") < 8), emb, k = 5)
        .orderBy(col("query_id"), col("rank"))
    }),

    // Progressive-refinement search (the Matryoshka/MRL serving shape):
    // pass 1 ranks by cosine over only the first 16 of 64 dimensions —
    // a quarter of the bytes per vector; at index scale a separate
    // stored prefix column, so the scan cost drops with the prefix —
    // pass 2 rescores the 4×-overfetched shortlist on full vectors.
    // Deterministic end to end (same in-order cosine fold both passes),
    // so the accuracy/cost trade sits under the oracle exactly.
    "vs21_truncated_rescore" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.truncatedRescoreTopK(emb.filter(col("vec_id") < 5), emb,
        k = 10, prefixDim = 16, overfetch = 4)
        .orderBy(col("query_id"), col("rank"))
    }),

    // IVF-PQ composed — the canonical large-index shape (FAISS
    // IVFx,PQy): trained coarse quantizer partitions the corpus,
    // queries probe their 2 nearest partitions, pass 1 scores only the
    // probed partitions' PQ reconstructions, pass 2 rescores the
    // shortlist exact. Scan cost is (nprobe/kCentroids) of the CODES
    // table; full-precision rows are touched k·overfetch per query.
    // Every stage is deterministic, so the composed index sits under
    // the oracle exactly.
    "vs14_ivfpq_search" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.ivfPqTopK(emb.filter(col("vec_id") < 10), emb,
        kCentroids = 8, iters = 2, nprobe = 2, numSub = 8, kCodes = 16,
        k = 3)
        .orderBy(col("query_id"), col("rank"))
    }),

    // MMR diversified retrieval (Carbonell & Goldstein 1998) — the
    // re-ranking staple: greedily pick k=4 of each query's 12-candidate
    // relevance pool maximizing λ·rel − (1−λ)·max-sim-to-selected, so
    // near-duplicate hits give way to coverage. Greedy steps are
    // unrolled as fixed plan stages (selection is sequential in k);
    // after the pool builder the cost is O(queries × pool × k) and the
    // corpus is never re-touched. All-IEEE scoring → oracle-exact.
    "vs13_mmr_diversified" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.mmrTopK(emb.filter(col("vec_id") < 5), emb,
        k = 4, poolSize = 12, lambda = 0.5)
        .orderBy(col("query_id"), col("step"))
    }),

    // Norms + bucket assignment per vector (scan-local, no shuffle).
    "vs03_vector_stats" -> ((s, d) => {
      Tables.embeddings(s, d).select(
        col("vec_id"), col("label"),
        size(col("embedding")).as("dim"),
        norm(col("embedding")).as("l2_norm"),
        signBucket(col("embedding"), 6).as("bucket"))
        .orderBy(col("vec_id"))
    }),

    // Embedding-cosine near-dup pairs within sign buckets (4 bits) —
    // the embedding half of the dedup suite.
    "vs04_cosine_neardup" -> ((s, d) => {
      Similarity.cosineNearDups(Tables.embeddings(s, d), threshold = 0.3, bits = 4)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Threshold (range) search: every neighbor with cosine ≥ τ per
    // query — the data-determined-size retrieval face top-k truncates.
    // Cheaper than vs01's exact top-k: the filter replaces the window,
    // so the plan is one broadcast + one corpus scan with NO shuffle.
    "vs17_range_search" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.rangeSearch(emb.filter(col("vec_id") < 5), emb, threshold = 0.25)
        .orderBy(col("query_id"), col("neighbor_id"))
    }),

    // Semantic-cluster-balanced sampling: assign each vector to its
    // sign-LSH bucket (vs12's semantic partition) and keep a
    // deterministic bottom-k-by-hash sample per bucket — the
    // embedding-space counterpart of ns13's column-stratified sample,
    // used to mix training data evenly across semantic regions instead
    // of metadata strata. The bounded-heap BottomK aggregate ships k
    // (hash, id) pairs per partition-group instead of window-sorting
    // each bucket — the same scale posture as ns17.
    // Per-cluster quality diagnostics over the TRAINED coarse quantizer
    // (vs08's Lloyd centroids): member count + min/max/quantized-mean
    // cosine to the assigned centroid — the dashboard query behind
    // cluster-balanced curation. The quantized mean (floor to 2^-20,
    // integer sum) is order-free, so the double is oracle-bit-exact.
    "vs19_cluster_stats" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.clusterStats(emb, Similarity.ivfTrain(emb, 8, 2))
        .orderBy(col("label"))
    }),

    // k-means|| scalable seeding (Bahmani et al., VLDB 2012) in its
    // deterministic farthest-point form: `rounds` corpus scans each
    // adding the `perRound` vectors farthest from the current center
    // set — the init that replaces k-means++'s k sequential scans at
    // corpus scale. Output: each selected center with its selection
    // round and nearest-center cosine at pick time, joined to the
    // resulting cluster diagnostics (member count, min/max/quantized-
    // mean cosine) so the query also exercises the assignment the seeds
    // exist for.
    "vs22_kmeans_par_init" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val centers = Similarity.kmeansParallelInit(emb, perRound = 4, rounds = 2)
      val cent = centers.select(col("vec_id").cast("int").as("label"),
        col("cvec"))
      val stats = Similarity.clusterStats(emb, cent)
      centers.select(col("round"), col("vec_id"), col("far_score"))
        .join(stats, col("vec_id").cast("int") === stats("label"))
        .select(col("round"), col("vec_id"), col("far_score"),
          col("n_members"), col("min_cos"), col("max_cos"), col("mean_cos"))
        .orderBy(col("round"), col("vec_id"))
    }),

    // ANN recall evaluation — the operator every approximate index
    // deployment runs beside the index itself: recall@10 of the
    // sign-bucketed ANN against the brute-force ground truth, per
    // query. The hit count is a semi-join of the two top-k sets on
    // (query, neighbor) — never a re-scan of the corpus — so the eval
    // costs two searches plus a query-set-sized join at any corpus
    // size. A recall regression after an index parameter change shows
    // up here as a number, not as silently worse retrieval.
    "vs24_ann_recall_eval" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val qs = emb.filter(col("vec_id") < 20)
      val exact = Similarity.bruteForceTopK(qs, emb, k = 10)
        .select(col("query_id"), col("neighbor_id"))
      val approx = Similarity.bucketedTopK(qs, emb, k = 10, bits = 6)
        .select(col("query_id"), col("neighbor_id"))
      val hits = exact.join(approx, Seq("query_id", "neighbor_id"), "leftsemi")
        .groupBy(col("query_id")).agg(count(lit(1)).as("n_hit"))
      exact.groupBy(col("query_id")).agg(count(lit(1)).as("n_exact"))
        .join(hits, Seq("query_id"), "left")
        .withColumn("n_hit", coalesce(col("n_hit"), lit(0L)))
        .withColumn("recall_at_10",
          col("n_hit").cast("double") / col("n_exact").cast("double"))
        .orderBy(col("query_id"))
    }),

    // Semantic decontamination — ns15's n-gram decontamination lifted
    // to embedding space (the leakage paraphrase rewriting hides from
    // exact grams): every corpus vector scored by max cosine to the
    // benchmark set, flagged at the threshold. The benchmark is a
    // broadcast (evaluation suites are tiny vs a training corpus), the
    // per-vector argmax is a partial-aggregable max(struct) — corpus
    // scanned once, shuffled once map-side-combined, never sorted.
    "vs23_semantic_decontam" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val bench = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("bench_id"), col("embedding").as("bv"))
      emb.filter(col("vec_id") >= 5)
        .crossJoin(broadcast(bench))
        .withColumn("cos", cosine(col("embedding"), col("bv")))
        .groupBy(col("vec_id"))
        .agg(max(struct(col("cos"), (-col("bench_id")).as("nb"))).as("best"))
        .select(col("vec_id"),
          (-col("best.nb")).as("nearest_bench"),
          col("best.cos").as("max_cos"),
          (col("best.cos") >= 0.35).as("contaminated"))
        .orderBy(col("vec_id"))
    }),

    "vs18_cluster_sample" -> ((s, d) => {
      val h = graft.functions.TextFunctions.portableHash(
        concat(lit("cs:"), col("vec_id").cast("string")))
      Tables.embeddings(s, d)
        .select(signBucket(col("embedding"), 4).as("bucket"),
          col("vec_id"), h.as("h"))
        .groupBy(col("bucket"))
        .agg(graft.functions.BottomK.bottomK(col("h"), col("vec_id"), 8)
          .as("picks"))
        .select(col("bucket"), explode(col("picks")).as("p"))
        .select(col("bucket"), col("p.h").as("h"), col("p.id").as("vec_id"))
        .orderBy(col("bucket"), col("h"), col("vec_id"))
    }),

    // SemDeDup-style semantic dedup composed end to end (Abbas et al.
    // 2023): embedding near-dup pairs within sign-LSH buckets (vs04's
    // shape, at the HIGHER threshold semantic dedup actually uses —
    // loose thresholds chain half the corpus into one component) →
    // connected components (ns12's min-label fixpoint) → keep the
    // smallest vec_id per cluster → per-label accounting of survivors.
    // Candidates never cross buckets, so the pair stage is an equi-join
    // at any corpus size; the oracle replays the identical closure as a
    // recursive CTE over the same bucket + cosine predicate.
    "vs12_semantic_dedup" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val pairs = Similarity.cosineNearDups(emb, threshold = 0.4, bits = 4)
      val canonical = graft.operators.Dedup.componentLabels(pairs, emb, "vec_id")
        .filter(col("id") === col("component"))
      emb.join(canonical, emb("vec_id") === canonical("id"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_kept"), min(col("vec_id")).as("min_kept_id"))
        .orderBy(col("label"))
    }),
    // IVF ANN: per-label centroids trained with order-independent
    // quantized means, nprobe=1 search in the assigned partition.
    "vs05_ivf_search" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.ivfTopK(emb.filter(col("vec_id") < 10), emb, "label", k = 3)
        .orderBy(col("query_id"), col("rank"))
    }),

    // IVF with nprobe=2: each query searches its TWO nearest centroids'
    // partitions — the recall dial. Candidates stay bounded by
    // nprobe/partitions of the corpus; top-k ranks across both probes.
    "vs06_ivf_nprobe" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.ivfTopK(emb.filter(col("vec_id") < 10), emb, "label",
          k = 3, nprobe = 2)
        .orderBy(col("query_id"), col("rank"))
    }),

    // Train-once / serve-many: the trained coarse quantizer is PERSISTED
    // to parquet and reloaded before searching — the index-artifact
    // lifecycle a 100 TB deployment needs (training is the expensive
    // pass; queries must not repeat it). Parquet round-trips the
    // double-valued centroids bit-exactly, so the persisted search
    // oracle-matches the in-memory one; at scale the same artifact
    // serves every executor via shared storage.
    "vs16_persisted_index" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val qs = emb.filter(col("vec_id") < 10)
      val cent = Similarity.ivfTrain(emb, kCentroids = 8, iters = 3)
      val dir = freshDir("ivf-index")
      cent.write.mode("overwrite").parquet(dir)
      val loaded = s.read.parquet(dir)
      Similarity.ivfSearch(qs, emb, loaded, k = 3, nprobe = 2)
        .orderBy(col("query_id"), col("rank"))
    }),

    // Incremental index append — the continuous-ingest ANN shape: train
    // centroids on the HISTORY corpus only, persist centroids + postings
    // (the index), then ingest the new batch (vec_id%10 slice) by
    // ASSIGNING it against the stored centroids and unioning onto the
    // stored postings — no retrain, no O(corpus) re-index; the append
    // costs O(batch). Search runs over the merged postings exactly as if
    // the index had been built whole (label-keyed candidates, exact
    // rescore), which is precisely what the oracle pins: train-on-history
    // + assign-everyone must equal the merged index's answers.
    "vs25_incremental_index" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val hist = emb.filter(pmod(col("vec_id"), lit(10)) =!= 0)
      val batch = emb.filter(pmod(col("vec_id"), lit(10)) === 0)
      val dir = freshDir("ivf-inc")
      val cent = Similarity.ivfTrain(hist, kCentroids = 8, iters = 3)
      cent.write.mode("overwrite").parquet(s"$dir/centroids")
      Similarity.ivfIndex(hist, cent)
        .write.mode("overwrite").parquet(s"$dir/postings")
      val loadedCent = s.read.parquet(s"$dir/centroids")
      val merged = s.read.parquet(s"$dir/postings")
        .unionByName(Similarity.ivfIndex(batch, loadedCent))
      val qs = emb.filter(col("vec_id") < 10)
      Similarity.ivfSearchIndexed(qs, merged, loadedCent, k = 3, nprobe = 2)
        .orderBy(col("query_id"), col("rank"))
    }),

    // Index maintenance under CDC deletes — the DELETE half of vs25's
    // append story. Tombstoned ids anti-join the posting list BEFORE the
    // probe join, so a deleted vector can never surface in a result and
    // the index is never rebuilt: search cost is unchanged and the mask
    // is one anti-join on the posting key (AQE broadcasts it while the
    // tombstone set is small; past that it is a plain shuffled anti-join
    // — either way no rebuild, no scan of the dead vectors). Compacting
    // the tombstones back into the postings parquet is the same
    // write-back as vs16's persisted index.
    "vs26_index_tombstones" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val cent = Similarity.ivfTrain(emb, kCentroids = 8, iters = 3)
      val tomb = emb.filter(pmod(col("vec_id"), lit(7)) === 3)
        .select(col("vec_id"))
      val live = Similarity.ivfIndex(emb, cent)
        .join(tomb, Seq("vec_id"), "left_anti")
      val qs = emb.filter(col("vec_id") < 10)
      Similarity.ivfSearchIndexed(qs, live, cent, k = 3, nprobe = 2)
        .orderBy(col("query_id"), col("rank"))
    }),

    // Tombstone COMPACTION — the write-back vs26 defers: vs26's
    // per-query anti-join masks deletes correctly but rides every
    // search forever; here the tombstones are folded into the postings
    // parquet ONCE (a posting-keyed anti-join + rewrite, the same
    // artifact write-back as vs16's persisted index), after which
    // searches run over the compacted postings with an EMPTY tombstone
    // set — no per-query mask cost, no rebuild, no retrain. The oracle
    // is vs26's verbatim: compacted-then-search must equal
    // masked-search bit for bit. At 100 TB the rewrite is one linear
    // pass over the postings partition-parallel, amortized across all
    // subsequent queries.
    "vs27_compacted_index" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val dir = freshDir("ivf-compact")
      Similarity.ivfTrain(emb, kCentroids = 8, iters = 3)
        .write.mode("overwrite").parquet(s"$dir/centroids")
      val cent = s.read.parquet(s"$dir/centroids")
      Similarity.ivfIndex(emb, cent)
        .write.mode("overwrite").parquet(s"$dir/postings")
      val tomb = emb.filter(pmod(col("vec_id"), lit(7)) === 3)
        .select(col("vec_id"))
      s.read.parquet(s"$dir/postings")
        .join(tomb, Seq("vec_id"), "left_anti")
        .write.mode("overwrite").parquet(s"$dir/postings-compacted")
      val qs = emb.filter(col("vec_id") < 10)
      Similarity.ivfSearchIndexed(qs,
        s.read.parquet(s"$dir/postings-compacted"), cent, k = 3, nprobe = 2)
        .orderBy(col("query_id"), col("rank"))
    }),

    // The FULL index lifecycle as one continuous story — vs16 (persist)
    // + vs25 (append) + vs26 (tombstone) + vs27 (compact) composed
    // end-to-end against the same artifact directory: build on history,
    // append batch A, tombstone a delete set, COMPACT the tombstones
    // out, append batch B AFTER the compaction, then search the final
    // postings. The final search is oracle-pinned to a from-scratch
    // build over the live set, which catches exactly the cross-phase
    // interactions the single-phase oracles cannot: a compaction that
    // drops a post-append posting, or a stale tombstone replayed onto a
    // LATER append (batch-B ids matching the delete predicate arrived
    // after the delete, so they are live — the oracle includes them).
    // Every phase is O(its own input) — train once on history, appends
    // assign only their batch, compaction is one linear anti-join pass;
    // nothing retrains or re-indexes the corpus.
    "vs33_index_lifecycle" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val m10 = pmod(col("vec_id"), lit(10))
      val hist = emb.filter(m10 =!= 0 && m10 =!= 1)
      val batchA = emb.filter(m10 === 0)
      val batchB = emb.filter(m10 === 1)
      val dir = freshDir("ivf-lifecycle")
      // build: train on history only, persist centroids + postings
      Similarity.ivfTrain(hist, kCentroids = 8, iters = 3)
        .write.mode("overwrite").parquet(s"$dir/centroids")
      val cent = s.read.parquet(s"$dir/centroids")
      Similarity.ivfIndex(hist, cent)
        .write.mode("overwrite").parquet(s"$dir/postings-0")
      // append A: assign the batch against the STORED centroids
      s.read.parquet(s"$dir/postings-0")
        .unionByName(Similarity.ivfIndex(batchA, cent))
        .write.mode("overwrite").parquet(s"$dir/postings-1")
      // delete: tombstone the ids matching the CDC delete predicate
      emb.filter(pmod(col("vec_id"), lit(7)) === 3).select(col("vec_id"))
        .write.mode("overwrite").parquet(s"$dir/tombstones")
      // compact: fold tombstones into the artifact, once
      s.read.parquet(s"$dir/postings-1")
        .join(s.read.parquet(s"$dir/tombstones"), Seq("vec_id"), "left_anti")
        .write.mode("overwrite").parquet(s"$dir/postings-2")
      // append B — after compaction; its ids are live even where they
      // match the (already-applied) delete predicate
      s.read.parquet(s"$dir/postings-2")
        .unionByName(Similarity.ivfIndex(batchB, cent))
        .write.mode("overwrite").parquet(s"$dir/postings-3")
      val qs = emb.filter(col("vec_id") < 10)
      Similarity.ivfSearchIndexed(qs,
        s.read.parquet(s"$dir/postings-3"), cent, k = 3, nprobe = 2)
        .orderBy(col("query_id"), col("rank"))
    }),

    // Recall@3 of the IVF index against the exact brute-force neighbors,
    // per query and per nprobe — the ANN quality claim as an
    // oracle-gated number instead of an assertion in prose. One brute
    // pass (broadcast queries, corpus never shuffled) + the two IVF
    // plans, joined on (query, neighbor); recall = hits/3 in exact
    // binary thirds on both engines.
    "vs07_ivf_recall" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val qs = emb.filter(col("vec_id") < 10)
      val exact = Similarity.bruteForceTopK(qs, emb, k = 3)
        .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
      def ivf(nprobe: Int) =
        Similarity.ivfTopK(qs, emb, "label", k = 3, nprobe = nprobe)
          .select(lit(nprobe).as("nprobe"), col("query_id"), col("neighbor_id"))
      ivf(1).unionByName(ivf(2))
        .join(exact, Seq("query_id", "neighbor_id"), "left_outer")
        .groupBy(col("nprobe"), col("query_id"))
        .agg(sum(coalesce(col("hit"), lit(0))).as("n_hit"))
        .withColumn("recall_at_3", col("n_hit") / lit(3.0))
        .orderBy(col("nprobe"), col("query_id"))
    }),

    // Recall@3 of the TRAINED IVF index (deterministic Lloyd, k=8
    // centroids, 3 rounds) — the quality fix for vs07's finding that
    // label-partitioned IVF has near-random recall when the label column
    // carries no geometry (this fixture's labels don't cluster; recall
    // 0.13/0.30 there vs 0.77/0.93 trained). Same oracle-exact posture:
    // quantized-exact means, in-order cosine folds, deterministic
    // tiebreaks.
    "vs08_ivf_trained_recall" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val qs = emb.filter(col("vec_id") < 10)
      val cent = Similarity.ivfTrain(emb, kCentroids = 8, iters = 3)
      val exact = Similarity.bruteForceTopK(qs, emb, k = 3)
        .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
      def ivf(nprobe: Int) =
        Similarity.ivfSearch(qs, emb, cent, k = 3, nprobe = nprobe)
          .select(lit(nprobe).as("nprobe"), col("query_id"), col("neighbor_id"))
      ivf(1).unionByName(ivf(2))
        .join(exact, Seq("query_id", "neighbor_id"), "left_outer")
        .groupBy(col("nprobe"), col("query_id"))
        .agg(sum(coalesce(col("hit"), lit(0))).as("n_hit"))
        .withColumn("recall_at_3", col("n_hit") / lit(3.0))
        .orderBy(col("nprobe"), col("query_id"))
    }),

    // SQ8 scalar-quantized search: pass 1 ranks on 8-bit dequantized
    // codes (what a 100 TB store would actually scan — 4× smaller),
    // pass 2 rescores only the k·overfetch shortlist at full precision.
    // All quantization arithmetic is order-independent, so codes,
    // shortlist, and final ranks hash-match the oracle exactly.
    "vs09_sq8_search" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.sq8TopK(emb.filter(col("vec_id") < 10), emb, k = 3)
        .orderBy(col("query_id"), col("rank"))
    }),

    // PQ product-quantized search (8 subspaces × 16 codewords): vectors
    // stored as 8 code ids, pass 1 scores codebook reconstructions, pass
    // 2 rescores the k·overfetch shortlist exactly. Codebook, codes and
    // ranks are all deterministic → hash-gated like vs09.
    "vs10_pq_search" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.pqTopK(emb.filter(col("vec_id") < 10), emb,
          numSub = 8, kCodes = 16, k = 3)
        .orderBy(col("query_id"), col("rank"))
    }),

    // The SQ8 codebook (per-dimension quantization ranges) as a
    // PERSISTED artifact — vs16's train-once/serve-many lifecycle for
    // the scalar-quantized tier: stats are computed once, written to
    // parquet, and the search quantizes against the RELOADED ranges.
    // Parquet round-trips the doubles bit-exactly, so the persisted
    // search shares vs09's oracle verbatim.
    "vs28_sq8_persisted" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val dir = freshDir("sq8-stats")
      Similarity.sq8Stats(emb).write.mode("overwrite").parquet(dir)
      Similarity.sq8TopKWithStats(emb.filter(col("vec_id") < 10), emb,
          s.read.parquet(dir), k = 3)
        .orderBy(col("query_id"), col("rank"))
    }),

    // Maximum-inner-product retrieval (MIPS) — the scoring used when
    // magnitude carries signal (popularity-weighted item embeddings)
    // and cosine's normalization would erase it. Bucketed form: sign-
    // bucket equi-join candidates (never all-pairs), exact-dot rescore,
    // per-query top-k. The raw-dot fold is index-ordered on both
    // engines → hash-gated; MipsSpec pins the norm-augmentation
    // reduction (Similarity.mipsAugment) that lets every cosine-path
    // index serve MIPS unchanged at scale.
    "vs30_mips_search" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.mipsBucketedTopK(emb.filter(col("vec_id") < 10), emb,
          k = 3, bits = 4)
        .orderBy(col("query_id"), col("rank"))
    }),

    // The PQ codebook (numSub×kCodes codeword sub-vectors) as a
    // PERSISTED artifact: train, write, reload, encode-and-search
    // against the stored codewords — vs10's oracle verbatim, same
    // bit-exact parquet round-trip argument.
    "vs29_pq_persisted" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val dir = freshDir("pq-codebook")
      Similarity.pqCodebook(emb, numSub = 8, kCodes = 16)
        .write.mode("overwrite").parquet(dir)
      Similarity.pqTopKWithCodebook(emb.filter(col("vec_id") < 10), emb,
          s.read.parquet(dir), numSub = 8, k = 3)
        .orderBy(col("query_id"), col("rank"))
    }),

    // Distributed d×d covariance of the embedding space — the second-
    // moment statistic PCA / whitening / drift monitoring start from.
    // One corpus pass generates the 2080 upper-triangle cross terms per
    // row inside codegen; the hash agg combines map-side so the shuffle
    // is tasks×d² rows, never data-sized. Int64-quantized sums (2^14)
    // make the distributed reduction order-insensitive and exactly
    // double-castable — the oracle replays the identical arithmetic.
    "vs31_embedding_covariance" -> ((s, d) => {
      Spectral.covarianceUpper(Tables.embeddings(s, d), "embedding", dim = 64)
        .orderBy(col("i"), col("j"))
    }),

    // PCA projection: principal direction by 24 deterministic power
    // iterations over the distributed covariance (d²-bounded driver
    // collect — the centroid pattern), then one broadcast-literal
    // in-order dot fold per document. The oracle unrolls the same
    // iterations as a CTE chain (the ivfTrain precedent) with
    // index-ordered folds, so projections are bit-identical. The
    // synthetic fixture is near-isotropic (λ₂/λ₁ ≈ 0.99), so the
    // iterate is still en route to the true eigenvector at any budget —
    // convergence rate is a data property ((λ₂/λ₁)^t); real embedding
    // corpora with a dominant direction converge in a handful of
    // rounds. Engine parity holds at ANY iteration count, and
    // SpectralSpec pins the Rayleigh-quotient monotonicity that makes
    // the fixed-budget iterate meaningful.
    "vs32_pca_projection" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val cov = Spectral.covarianceUpper(emb, "embedding", dim = 64)
      val pc = Spectral.principalComponent(cov, dim = 64, iters = 24)
      val pcLit = array(pc.map(lit).toIndexedSeq: _*)
      emb.select(col("vec_id"), col("label"),
          dotProductAny(col("embedding"), pcLit).as("pc1"))
        .orderBy(col("vec_id"))
    }),

    // Top-2 PCA subspace — vs32 extended past PC1 by Hotelling
    // deflation (the whitening / drift-monitoring prep needs the
    // subspace, not one axis): extract PC1, deflate the DRIVER-side
    // d×d matrix by its Rayleigh term (λ v vᵀ), power-iterate again
    // for PC2, and project the corpus onto both. Still exactly one
    // corpus pass (the covariance) + one d²-bounded collect; the
    // second component costs another driver-side power chain, never
    // another scan. The oracle unrolls the deflation with the same
    // fixed-order folds, so both projections are bit-exact.
    "vs34_pca_top2" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val cov = Spectral.covarianceUpper(emb, "embedding", dim = 64)
      val pcs = Spectral.principalComponents(cov, dim = 64, iters = 24, k = 2)
      val p1 = array(pcs(0).map(lit).toIndexedSeq: _*)
      val p2 = array(pcs(1).map(lit).toIndexedSeq: _*)
      emb.select(col("vec_id"), col("label"),
          dotProductAny(col("embedding"), p1).as("pc1"),
          dotProductAny(col("embedding"), p2).as("pc2"))
        .orderBy(col("vec_id"))
    }),

    // PCA WHITENING — the operation the spectral tier exists for
    // (Spectral.scala header): project onto the top-2 subspace and
    // scale each coordinate by 1/√λₖ, yielding unit population
    // variance per component (λₖ is the Rayleigh value the deflation
    // removes, so Var(x·vₖ)/λₖ = 1 by construction — SpectralSpec pins
    // it). Same one-corpus-pass + d²-bounded driver shape as vs32/
    // vs34; the eigenvalues are two driver scalars. The oracle reuses
    // the deflation CTE chain and reads λ₁/λ₂ from the same folds.
    "vs35_whitened_projection" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val cov = Spectral.covarianceUpper(emb, "embedding", dim = 64)
      val pcs = Spectral.principalComponentsWithValues(cov, dim = 64,
        iters = 24, k = 2)
      val (p1, l1) = pcs(0)
      val (p2, l2) = pcs(1)
      val a1 = array(p1.map(lit).toIndexedSeq: _*)
      val a2 = array(p2.map(lit).toIndexedSeq: _*)
      emb.select(col("vec_id"), col("label"),
          (dotProductAny(col("embedding"), a1) / lit(math.sqrt(l1))).as("w1"),
          (dotProductAny(col("embedding"), a2) / lit(math.sqrt(l2))).as("w2"))
        .orderBy(col("vec_id"))
    }),

    // SUPERVISED linear probe on the top-2 PCA subspace — the standard
    // embedding-quality read-out ("how much label does the dominant
    // subspace carry?"): OLS y ≈ b0 + b1·pc1 + b2·pc2 by closed-form
    // normal equations. Projections are quantized to int64 (the Scale
    // convention), so all 9 sufficient statistics are exact map-side-
    // combined integer sums; the 3×3 Cramer solve is fixed-order driver
    // math the oracle replays term for term, and the scoring pass is
    // one broadcast-literal expression per row. Corpus passes: three —
    // covariance, sufficient statistics, scoring — each a single
    // linear scan; no data-sized shuffle anywhere.
    "vs36_linear_probe" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val cov = Spectral.covarianceUpper(emb, "embedding", dim = 64)
      val pcs = Spectral.principalComponents(cov, dim = 64, iters = 24, k = 2)
      val p1 = array(pcs(0).map(lit).toIndexedSeq: _*)
      val p2 = array(pcs(1).map(lit).toIndexedSeq: _*)
      val proj = emb.select(col("vec_id"), col("label"),
        floor(dotProductAny(col("embedding"), p1) * lit(Spectral.Scale)).as("q1"),
        floor(dotProductAny(col("embedding"), p2) * lit(Spectral.Scale)).as("q2"),
        col("label").cast("long").as("y"))
      val (b0, b1, b2) = Spectral.probeCoefficients(proj)
      val pred = (lit(b0) + lit(b1) * col("q1").cast("double")) +
        lit(b2) * col("q2").cast("double")
      proj.select(col("vec_id"), col("label"), pred.as("pred"),
          (col("label").cast("double") - pred).as("resid"))
        .orderBy(col("vec_id"))
    }),

    // The probe under EVAL DISCIPLINE: coefficients fit on the TRAIN
    // slice only (vec_id % 5 ≠ 0), every row scored — the held-out
    // residuals are the generalization readout an embedding-quality
    // gate actually consumes (vs36's in-sample fit can only flatter).
    // Same exact-statistics machinery; the train restriction is one
    // pushed filter on the stats pass.
    "vs39_probe_holdout" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val cov = Spectral.covarianceUpper(emb, "embedding", dim = 64)
      val pcs = Spectral.principalComponents(cov, dim = 64, iters = 24, k = 2)
      val p1 = array(pcs(0).map(lit).toIndexedSeq: _*)
      val p2 = array(pcs(1).map(lit).toIndexedSeq: _*)
      val proj = emb.select(col("vec_id"), col("label"),
        floor(dotProductAny(col("embedding"), p1) * lit(Spectral.Scale)).as("q1"),
        floor(dotProductAny(col("embedding"), p2) * lit(Spectral.Scale)).as("q2"),
        col("label").cast("long").as("y"))
      val (b0, b1, b2) =
        Spectral.probeCoefficients(proj.filter(col("vec_id") % 5 =!= 0))
      val pred = (lit(b0) + lit(b1) * col("q1").cast("double")) +
        lit(b2) * col("q2").cast("double")
      proj.select(col("vec_id"), col("label"),
          (col("vec_id") % 5 === 0).as("holdout"), pred.as("pred"),
          (col("label").cast("double") - pred).as("resid"))
        .orderBy(col("vec_id"))
    }),

    // Leave-one-out k-NN majority-vote classification over the eval
    // slice — mislabel detection / pseudo-labeling (does each vector's
    // neighborhood agree with its stored label?). Exact-cosine votes
    // with deterministic ties: rank ties to lower neighbor_id, vote
    // ties to the smaller label.
    "vs37_knn_classify" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.knnClassify(emb.filter(col("vec_id") < 50), emb, k = 5)
        .orderBy(col("query_id"))
    }),

    // Embedding-space drift between two corpus snapshots (stand-in:
    // even/odd vec_id halves) — the monitoring query the covariance
    // tier's header promises: per-dimension mean shift in original
    // units, exact by int64-quantized sums.
    "vs38_embedding_drift" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Spectral.meanDrift(
          emb.filter(col("vec_id") % 2 === 0),
          emb.filter(col("vec_id") % 2 === 1), "embedding")
        .orderBy(col("i"))
    }),

    // MERGEABLE covariance maintenance — the artifact tier of the
    // spectral pipeline: yesterday's snapshot (even vec_ids) is reduced
    // to its d²-bounded sufficient statistics and PERSISTED; today's
    // delta (odd vec_ids) is scanned and its stats UNIONED with the
    // reloaded artifact; one exact integer re-sum per (i, j) merges
    // them. Because every statistic is an exact int64 sum of quantized
    // values, merged-stats covariance is BIT-IDENTICAL to the
    // monolithic corpus scan — the oracle is vs31's verbatim. At 100 TB
    // this is the difference between rescanning all history per
    // covariance refresh and scanning only the new shard (the persisted
    // SQ8/PQ posture applied to second moments).
    "vs40_cov_merge" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val dir = freshDir("cov-stats")
      Spectral.covarianceStats(emb.filter(col("vec_id") % 2 === 0),
          "embedding", dim = 64)
        .write.mode("overwrite").parquet(dir)
      val merged = s.read.parquet(dir).unionByName(
        Spectral.covarianceStats(emb.filter(col("vec_id") % 2 === 1),
          "embedding", dim = 64))
      Spectral.covarianceFromStats(merged).orderBy(col("i"), col("j"))
    }),

    // PCA reconstruction-error OOD scoring — the anomaly read-out of
    // the spectral tier: center each embedding at the per-dimension
    // mean, project onto the top-2 subspace (vs34's components), and
    // score by the squared norm of what the subspace CANNOT represent
    // (r = c − t₁v₁ − t₂v₂; resid2 = r·r). In-distribution rows live
    // near the dominant subspace (small residual); outliers/noise/
    // wrong-modality rows carry mass off it — the standard PCA anomaly
    // detector, and the OOD gate an embedding-ingest pipeline runs
    // before admitting a new shard. `cc` (centered energy c·c) ships
    // alongside so callers can rank by absolute or relative residual
    // without a second pass — the ratio is one division away, kept out
    // of the engine to avoid a 0/0 on constant rows.
    //
    // One corpus pass builds the mergeable stats artifact (CACHED —
    // d²-bounded, so the cache is metadata-sized; the PC collect and
    // the mean collect both read it without rescanning the corpus),
    // one pass scores: every per-row term is a fixed-order fold over
    // broadcast-literal μ/v₁/v₂ arrays, so both engines agree
    // bit-exactly. At 100 TB the stats pass IS vs40's artifact — a
    // persisted shard merge, not a scan.
    "vs41_ood_residual" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val stats = Spectral.covarianceStats(emb, "embedding", dim = 64).cache()
      val pcs = Spectral.principalComponents(
        Spectral.covarianceFromStats(stats), dim = 64, iters = 24, k = 2)
      val mu = Spectral.dimensionMeans(stats, dim = 64)
      stats.unpersist()
      val muL = array(mu.map(lit).toIndexedSeq: _*)
      val p1 = array(pcs(0).map(lit).toIndexedSeq: _*)
      val p2 = array(pcs(1).map(lit).toIndexedSeq: _*)
      val cent = zip_with(col("embedding"), muL,
        (x, m) => x.cast("double") - m)
      val tt = emb.select(col("vec_id"), col("label"), cent.as("c"))
        .select(col("vec_id"), col("label"), col("c"),
          dotProductAny(col("c"), p1).as("t1"),
          dotProductAny(col("c"), p2).as("t2"))
      tt.select(col("vec_id"), col("label"),
          dotProductAny(col("c"), col("c")).as("cc"),
          aggregate(sequence(lit(1), lit(64)), lit(0.0), (acc, i) => {
            val r = (element_at(col("c"), i) - col("t1") * element_at(p1, i)) -
              col("t2") * element_at(p2, i)
            acc + r * r
          }).as("resid2"))
        .orderBy(col("vec_id"))
    }),

    // Matryoshka-style PREFIX-DIMENSION retrieval, recall-evaluated
    // (Kusupati et al. 2022): search with only the first 16 of 64
    // dimensions — the cheap first-stage pass MRL-trained embeddings
    // are built for (store/scan 1/4 of the bytes, dot products cost
    // 1/4) — and score its top-10 against the full-dimension ground
    // truth, vs24's harness shape. On MRL embeddings the prefix is the
    // information-ordered summary; on the synthetic fixture the recall
    // number is the honest readout of what truncation costs. Scale
    // shape: both searches are the vs01 broadcast-query corpus scan
    // with rank-pushdown top-k; the truncation is a per-row slice at
    // the scan, exactly the column a real deployment would store.
    "vs42_prefix_dim_recall" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val pre = emb.select(col("vec_id"),
        slice(col("embedding"), 1, 16).as("embedding"))
      val qs = col("vec_id") < 20
      val exact = Similarity.bruteForceTopK(emb.filter(qs), emb, k = 10)
        .select(col("query_id"), col("neighbor_id"))
      val approx = Similarity.bruteForceTopK(pre.filter(qs), pre, k = 10)
        .select(col("query_id"), col("neighbor_id"))
      val hits = exact.join(approx, Seq("query_id", "neighbor_id"), "leftsemi")
        .groupBy(col("query_id")).agg(count(lit(1)).as("n_hit"))
      exact.groupBy(col("query_id")).agg(count(lit(1)).as("n_exact"))
        .join(hits, Seq("query_id"), "left")
        .withColumn("n_hit", coalesce(col("n_hit"), lit(0L)))
        .withColumn("recall_at_10",
          col("n_hit").cast("double") / col("n_exact").cast("double"))
        .orderBy(col("query_id"))
    }),

    // RANKING-QUALITY metrics — the eval tier recall alone doesn't
    // cover: per query, precision@10 (label-match relevance over the
    // exact top-10) and reciprocal rank of the FIRST relevant neighbor
    // (the MRR contribution; the mean is one driver-side step away and
    // deliberately not folded here — summing per-query doubles is
    // order-dependent, per-query rows are not). first_rel_rank stays
    // NULL (and rr 0.0) when nothing relevant surfaces in the top-10 —
    // the honest "retrieval failed" row. Scale shape: the ranked list
    // is 20×10 rows; each label attach broadcasts the TINY candidate
    // side against a pruned corpus projection — two thin column scans,
    // no corpus-sized shuffle.
    "vs43_retrieval_metrics" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val top = Similarity.bruteForceTopK(emb.filter(col("vec_id") < 20),
        emb, k = 10)
      val nl = emb.select(col("vec_id").as("neighbor_id"),
        col("label").as("n_label"))
      val ql = emb.select(col("vec_id").as("query_id"),
        col("label").as("q_label"))
      val marked = ql.join(
          broadcast(nl.join(broadcast(top), Seq("neighbor_id"))),
          Seq("query_id"))
        .withColumn("rel", (col("q_label") === col("n_label")).cast("int"))
      marked.groupBy(col("query_id"))
        .agg(sum(col("rel")).cast("long").as("n_rel_at_10"),
          min(when(col("rel") === 1, col("rank"))).cast("long")
            .as("first_rel_rank"))
        .withColumn("precision_at_10",
          col("n_rel_at_10").cast("double") / lit(10.0))
        .withColumn("rr", coalesce(
          lit(1.0) / col("first_rel_rank").cast("double"), lit(0.0)))
        .orderBy(col("query_id"))
    }),
  )

  private val oracleBase: Map[String, String] = Map(
    "vs11_filtered_knn" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
         |           FROM embeddings WHERE vec_id < 5),
         |c AS (SELECT vec_id AS neighbor_id, embedding AS cv
         |      FROM embeddings WHERE label IN (0, 1, 2)),
         |scored AS (
         |  SELECT query_id, neighbor_id, ${cosSql("qv", "cv")} AS cos
         |  FROM c JOIN q ON query_id <> neighbor_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, cos, ROW_NUMBER() OVER (
         |    PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
         |  FROM scored)
         |SELECT query_id, neighbor_id, rank, cos FROM ranked
         |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    "vs20_hard_negatives" ->
      s"""WITH q AS (SELECT vec_id AS query_id, label AS query_label,
         |             embedding AS qv
         |           FROM embeddings WHERE vec_id < 8),
         |c AS (SELECT vec_id AS neighbor_id, label AS neighbor_label,
         |        embedding AS cv
         |      FROM embeddings),
         |scored AS (
         |  SELECT query_id, query_label, neighbor_id, neighbor_label,
         |    ${cosSql("qv", "cv")} AS cos
         |  FROM c JOIN q ON query_id <> neighbor_id
         |    AND query_label <> neighbor_label),
         |ranked AS (
         |  SELECT query_id, query_label, neighbor_id, neighbor_label, cos,
         |    ROW_NUMBER() OVER (
         |      PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
         |  FROM scored)
         |SELECT query_id, query_label, neighbor_id, neighbor_label, rank, cos
         |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "vs01_knn_brute" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
         |           FROM embeddings WHERE vec_id < 5),
         |c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
         |scored AS (
         |  SELECT query_id, neighbor_id, ${cosSql("qv", "cv")} AS cos
         |  FROM c JOIN q ON query_id <> neighbor_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, cos, ROW_NUMBER() OVER (
         |    PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
         |  FROM scored)
         |SELECT query_id, neighbor_id, rank, cos FROM ranked
         |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    "vs21_truncated_rescore" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv,
         |             embedding[1:16] AS qp
         |           FROM embeddings WHERE vec_id < 5),
         |c AS (SELECT vec_id AS neighbor_id, embedding AS cv,
         |        embedding[1:16] AS cp
         |      FROM embeddings),
         |coarse AS (
         |  SELECT query_id, neighbor_id, qv, cv, ROW_NUMBER() OVER (
         |    PARTITION BY query_id
         |    ORDER BY ${cosSql("qp", "cp")} DESC, neighbor_id ASC) AS crank
         |  FROM c JOIN q ON query_id <> neighbor_id),
         |resc AS (
         |  SELECT query_id, neighbor_id, ${cosSql("qv", "cv")} AS cos
         |  FROM coarse WHERE crank <= 40),
         |ranked AS (
         |  SELECT query_id, neighbor_id, cos, ROW_NUMBER() OVER (
         |    PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
         |  FROM resc)
         |SELECT query_id, neighbor_id, rank, cos FROM ranked
         |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    "vs02_knn_bucketed" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv,
         |             ${bucketSql("embedding", 6)} AS bucket
         |           FROM embeddings WHERE vec_id < 20),
         |c AS (SELECT vec_id AS neighbor_id, embedding AS cv,
         |        ${bucketSql("embedding", 6)} AS bucket
         |      FROM embeddings),
         |scored AS (
         |  SELECT query_id, c.bucket AS bucket, neighbor_id,
         |    ${cosSql("qv", "cv")} AS cos
         |  FROM c JOIN q USING (bucket) WHERE query_id <> neighbor_id),
         |ranked AS (
         |  SELECT query_id, bucket, neighbor_id, cos, ROW_NUMBER() OVER (
         |    PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
         |  FROM scored)
         |SELECT query_id, bucket, neighbor_id, rank, cos FROM ranked
         |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
    "vs03_vector_stats" ->
      s"""SELECT vec_id, label, len(embedding) AS dim,
         | sqrt(${dotSql("embedding", "embedding")}) AS l2_norm,
         | ${bucketSql("embedding", 6)} AS bucket
         |FROM embeddings ORDER BY vec_id""".stripMargin,
    "vs05_ivf_search" ->
      s"""WITH dims AS (
         |  SELECT label, r.i AS i,
         |    CAST(FLOOR(CAST(embedding[r.i] AS DOUBLE) * 1048576) AS BIGINT) AS q
         |  FROM embeddings, range(1, 65) r(i)),
         |cent AS (
         |  SELECT label, i, CAST(SUM(q) AS DOUBLE) / COUNT(*) AS c
         |  FROM dims GROUP BY label, i),
         |cvec AS (
         |  SELECT label, list(c ORDER BY i) AS cv FROM cent GROUP BY label),
         |q AS (SELECT vec_id AS query_id, embedding AS qv
         |      FROM embeddings WHERE vec_id < 10),
         |scored AS (
         |  SELECT query_id, qv, label,
         |    list_reduce(list_prepend(0.0, list_transform(range(1, 65),
         |      i -> CAST(qv[i] AS DOUBLE) * cv[i])), (acc, x) -> acc + x) AS score
         |  FROM q CROSS JOIN cvec),
         |assigned AS (
         |  SELECT query_id, qv, label AS probe_label FROM (
         |    SELECT query_id, qv, label, ROW_NUMBER() OVER (
         |      PARTITION BY query_id ORDER BY score DESC, label ASC) AS arnk
         |    FROM scored) t WHERE arnk = 1),
         |cand AS (
         |  SELECT query_id, probe_label, e.vec_id AS neighbor_id,
         |    ${cosSql("qv", "e.embedding")} AS cos
         |  FROM assigned JOIN embeddings e ON e.label = assigned.probe_label
         |  WHERE e.vec_id <> query_id),
         |ranked AS (
         |  SELECT query_id, probe_label, neighbor_id, cos, ROW_NUMBER() OVER (
         |    PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
         |  FROM cand)
         |SELECT query_id, probe_label, neighbor_id, rank, cos FROM ranked
         |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
    "vs06_ivf_nprobe" ->
      s"""WITH dims AS (
         |  SELECT label, r.i AS i,
         |    CAST(FLOOR(CAST(embedding[r.i] AS DOUBLE) * 1048576) AS BIGINT) AS q
         |  FROM embeddings, range(1, 65) r(i)),
         |cent AS (
         |  SELECT label, i, CAST(SUM(q) AS DOUBLE) / COUNT(*) AS c
         |  FROM dims GROUP BY label, i),
         |cvec AS (
         |  SELECT label, list(c ORDER BY i) AS cv FROM cent GROUP BY label),
         |q AS (SELECT vec_id AS query_id, embedding AS qv
         |      FROM embeddings WHERE vec_id < 10),
         |scored AS (
         |  SELECT query_id, qv, label,
         |    list_reduce(list_prepend(0.0, list_transform(range(1, 65),
         |      i -> CAST(qv[i] AS DOUBLE) * cv[i])), (acc, x) -> acc + x) AS score
         |  FROM q CROSS JOIN cvec),
         |assigned AS (
         |  SELECT query_id, qv, label AS probe_label FROM (
         |    SELECT query_id, qv, label, ROW_NUMBER() OVER (
         |      PARTITION BY query_id ORDER BY score DESC, label ASC) AS arnk
         |    FROM scored) t WHERE arnk <= 2),
         |cand AS (
         |  SELECT query_id, probe_label, e.vec_id AS neighbor_id,
         |    ${cosSql("qv", "e.embedding")} AS cos
         |  FROM assigned JOIN embeddings e ON e.label = assigned.probe_label
         |  WHERE e.vec_id <> query_id),
         |ranked AS (
         |  SELECT query_id, probe_label, neighbor_id, cos, ROW_NUMBER() OVER (
         |    PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
         |  FROM cand)
         |SELECT query_id, probe_label, neighbor_id, rank, cos FROM ranked
         |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
    "vs07_ivf_recall" ->
      s"""WITH dims AS (
         |  SELECT label, r.i AS i,
         |    CAST(FLOOR(CAST(embedding[r.i] AS DOUBLE) * 1048576) AS BIGINT) AS q
         |  FROM embeddings, range(1, 65) r(i)),
         |cent AS (
         |  SELECT label, i, CAST(SUM(q) AS DOUBLE) / COUNT(*) AS c
         |  FROM dims GROUP BY label, i),
         |cvec AS (
         |  SELECT label, list(c ORDER BY i) AS cv FROM cent GROUP BY label),
         |q AS (SELECT vec_id AS query_id, embedding AS qv
         |      FROM embeddings WHERE vec_id < 10),
         |scored AS (
         |  SELECT query_id, qv, label,
         |    list_reduce(list_prepend(0.0, list_transform(range(1, 65),
         |      i -> CAST(qv[i] AS DOUBLE) * cv[i])), (acc, x) -> acc + x) AS score
         |  FROM q CROSS JOIN cvec),
         |aranked AS (
         |  SELECT query_id, qv, label, ROW_NUMBER() OVER (
         |    PARTITION BY query_id ORDER BY score DESC, label ASC) AS arnk
         |  FROM scored),
         |probes AS (
         |  SELECT 1 AS nprobe, query_id, qv, label FROM aranked WHERE arnk <= 1
         |  UNION ALL
         |  SELECT 2 AS nprobe, query_id, qv, label FROM aranked WHERE arnk <= 2),
         |cand AS (
         |  SELECT nprobe, query_id, e.vec_id AS neighbor_id,
         |    ${cosSql("qv", "e.embedding")} AS cos
         |  FROM probes JOIN embeddings e ON e.label = probes.label
         |  WHERE e.vec_id <> query_id),
         |ivf AS (
         |  SELECT nprobe, query_id, neighbor_id FROM (
         |    SELECT nprobe, query_id, neighbor_id, ROW_NUMBER() OVER (
         |      PARTITION BY nprobe, query_id
         |      ORDER BY cos DESC, neighbor_id ASC) AS rank
         |    FROM cand) t WHERE rank <= 3),
         |exact AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, c.vec_id AS neighbor_id, ROW_NUMBER() OVER (
         |      PARTITION BY query_id
         |      ORDER BY ${cosSql("qv", "c.embedding")} DESC, c.vec_id ASC) AS rank
         |    FROM q JOIN embeddings c ON c.vec_id <> query_id) t
         |  WHERE rank <= 3)
         |SELECT i.nprobe, i.query_id,
         |  CAST(SUM(CASE WHEN e.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_hit,
         |  CAST(SUM(CASE WHEN e.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) / 3.0 AS recall_at_3
         |FROM ivf i LEFT JOIN exact e
         |  ON i.query_id = e.query_id AND i.neighbor_id = e.neighbor_id
         |GROUP BY i.nprobe, i.query_id
         |ORDER BY i.nprobe, i.query_id""".stripMargin,
    "vs16_persisted_index" ->
      s"""WITH ${ivfTrainCtes(k = 8, iters = 3)},
         |indexed AS (
         |  SELECT vec_id AS neighbor_id, embedding AS cv2, label AS probe_label
         |  FROM (
         |    SELECT e.vec_id, e.embedding, c.label, ROW_NUMBER() OVER (
         |      PARTITION BY e.vec_id
         |      ORDER BY ${cosSql("e.embedding", "c.cv")} DESC, c.label ASC
         |    ) AS arnk
         |    FROM embeddings e CROSS JOIN cvec3 c) s
         |  WHERE arnk = 1),
         |q AS (SELECT vec_id AS query_id, embedding AS qv
         |      FROM embeddings WHERE vec_id < 10),
         |probes AS (
         |  SELECT query_id, qv, label FROM (
         |    SELECT query_id, qv, label, ROW_NUMBER() OVER (
         |      PARTITION BY query_id
         |      ORDER BY ${cosSql("qv", "c.cv")} DESC, label ASC) AS arnk
         |    FROM q CROSS JOIN cvec3 c) t WHERE arnk <= 2),
         |cand AS (
         |  SELECT query_id, label AS probe_label, i.neighbor_id,
         |    ${cosSql("qv", "i.cv2")} AS cos
         |  FROM probes p JOIN indexed i ON i.probe_label = p.label
         |  WHERE i.neighbor_id <> p.query_id),
         |ranked AS (
         |  SELECT query_id, probe_label, neighbor_id, cos, ROW_NUMBER() OVER (
         |    PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
         |  FROM cand)
         |SELECT query_id, probe_label, neighbor_id, rank, cos FROM ranked
         |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
    "vs25_incremental_index" ->
      s"""WITH ${ivfTrainCtes(k = 8, iters = 3, where = "vec_id % 10 <> 0")},
         |indexed AS (
         |  SELECT vec_id AS neighbor_id, embedding AS cv2, label AS probe_label
         |  FROM (
         |    SELECT e.vec_id, e.embedding, c.label, ROW_NUMBER() OVER (
         |      PARTITION BY e.vec_id
         |      ORDER BY ${cosSql("e.embedding", "c.cv")} DESC, c.label ASC
         |    ) AS arnk
         |    FROM embeddings e CROSS JOIN cvec3 c) s
         |  WHERE arnk = 1),
         |q AS (SELECT vec_id AS query_id, embedding AS qv
         |      FROM embeddings WHERE vec_id < 10),
         |probes AS (
         |  SELECT query_id, qv, label FROM (
         |    SELECT query_id, qv, label, ROW_NUMBER() OVER (
         |      PARTITION BY query_id
         |      ORDER BY ${cosSql("qv", "c.cv")} DESC, label ASC) AS arnk
         |    FROM q CROSS JOIN cvec3 c) t WHERE arnk <= 2),
         |cand AS (
         |  SELECT query_id, label AS probe_label, i.neighbor_id,
         |    ${cosSql("qv", "i.cv2")} AS cos
         |  FROM probes p JOIN indexed i ON i.probe_label = p.label
         |  WHERE i.neighbor_id <> p.query_id),
         |ranked AS (
         |  SELECT query_id, probe_label, neighbor_id, cos, ROW_NUMBER() OVER (
         |    PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
         |  FROM cand)
         |SELECT query_id, probe_label, neighbor_id, rank, cos FROM ranked
         |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
    "vs26_index_tombstones" ->
      s"""WITH ${ivfTrainCtes(k = 8, iters = 3)},
         |indexed AS (
         |  SELECT vec_id AS neighbor_id, embedding AS cv2, label AS probe_label
         |  FROM (
         |    SELECT e.vec_id, e.embedding, c.label, ROW_NUMBER() OVER (
         |      PARTITION BY e.vec_id
         |      ORDER BY ${cosSql("e.embedding", "c.cv")} DESC, c.label ASC
         |    ) AS arnk
         |    FROM embeddings e CROSS JOIN cvec3 c) s
         |  WHERE arnk = 1 AND s.vec_id % 7 <> 3),
         |q AS (SELECT vec_id AS query_id, embedding AS qv
         |      FROM embeddings WHERE vec_id < 10),
         |probes AS (
         |  SELECT query_id, qv, label FROM (
         |    SELECT query_id, qv, label, ROW_NUMBER() OVER (
         |      PARTITION BY query_id
         |      ORDER BY ${cosSql("qv", "c.cv")} DESC, label ASC) AS arnk
         |    FROM q CROSS JOIN cvec3 c) t WHERE arnk <= 2),
         |cand AS (
         |  SELECT query_id, label AS probe_label, i.neighbor_id,
         |    ${cosSql("qv", "i.cv2")} AS cos
         |  FROM probes p JOIN indexed i ON i.probe_label = p.label
         |  WHERE i.neighbor_id <> p.query_id),
         |ranked AS (
         |  SELECT query_id, probe_label, neighbor_id, cos, ROW_NUMBER() OVER (
         |    PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
         |  FROM cand)
         |SELECT query_id, probe_label, neighbor_id, rank, cos FROM ranked
         |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
    // Compaction must be invisible to search: the compacted index's
    // answers ARE the masked index's answers, so vs27's oracle is
    // vs26's query verbatim (tombstoned ids excluded from the postings,
    // regardless of whether the exclusion happened per-query or in the
    // artifact).
    "vs27_compacted_index" ->
      s"""WITH ${ivfTrainCtes(k = 8, iters = 3)},
         |indexed AS (
         |  SELECT vec_id AS neighbor_id, embedding AS cv2, label AS probe_label
         |  FROM (
         |    SELECT e.vec_id, e.embedding, c.label, ROW_NUMBER() OVER (
         |      PARTITION BY e.vec_id
         |      ORDER BY ${cosSql("e.embedding", "c.cv")} DESC, c.label ASC
         |    ) AS arnk
         |    FROM embeddings e CROSS JOIN cvec3 c) s
         |  WHERE arnk = 1 AND s.vec_id % 7 <> 3),
         |q AS (SELECT vec_id AS query_id, embedding AS qv
         |      FROM embeddings WHERE vec_id < 10),
         |probes AS (
         |  SELECT query_id, qv, label FROM (
         |    SELECT query_id, qv, label, ROW_NUMBER() OVER (
         |      PARTITION BY query_id
         |      ORDER BY ${cosSql("qv", "c.cv")} DESC, label ASC) AS arnk
         |    FROM q CROSS JOIN cvec3 c) t WHERE arnk <= 2),
         |cand AS (
         |  SELECT query_id, label AS probe_label, i.neighbor_id,
         |    ${cosSql("qv", "i.cv2")} AS cos
         |  FROM probes p JOIN indexed i ON i.probe_label = p.label
         |  WHERE i.neighbor_id <> p.query_id),
         |ranked AS (
         |  SELECT query_id, probe_label, neighbor_id, cos, ROW_NUMBER() OVER (
         |    PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
         |  FROM cand)
         |SELECT query_id, probe_label, neighbor_id, rank, cos FROM ranked
         |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
    // The lifecycle's final search must equal a FROM-SCRATCH build over
    // the live set: centroids trained on history (vec_id % 10 not in
    // (0,1) — batches A and B excluded from training), postings over
    // live = ((history ∪ A) minus the %7=3 deletes) ∪ B — batch B
    // appended AFTER the compaction, so its %7=3 ids are live.
    "vs33_index_lifecycle" ->
      s"""WITH ${ivfTrainCtes(k = 8, iters = 3, where = "vec_id % 10 NOT IN (0, 1)")},
         |indexed AS (
         |  SELECT vec_id AS neighbor_id, embedding AS cv2, label AS probe_label
         |  FROM (
         |    SELECT e.vec_id, e.embedding, c.label, ROW_NUMBER() OVER (
         |      PARTITION BY e.vec_id
         |      ORDER BY ${cosSql("e.embedding", "c.cv")} DESC, c.label ASC
         |    ) AS arnk
         |    FROM embeddings e CROSS JOIN cvec3 c) s
         |  WHERE arnk = 1
         |    AND (s.vec_id % 10 = 1 OR s.vec_id % 7 <> 3)),
         |q AS (SELECT vec_id AS query_id, embedding AS qv
         |      FROM embeddings WHERE vec_id < 10),
         |probes AS (
         |  SELECT query_id, qv, label FROM (
         |    SELECT query_id, qv, label, ROW_NUMBER() OVER (
         |      PARTITION BY query_id
         |      ORDER BY ${cosSql("qv", "c.cv")} DESC, label ASC) AS arnk
         |    FROM q CROSS JOIN cvec3 c) t WHERE arnk <= 2),
         |cand AS (
         |  SELECT query_id, label AS probe_label, i.neighbor_id,
         |    ${cosSql("qv", "i.cv2")} AS cos
         |  FROM probes p JOIN indexed i ON i.probe_label = p.label
         |  WHERE i.neighbor_id <> p.query_id),
         |ranked AS (
         |  SELECT query_id, probe_label, neighbor_id, cos, ROW_NUMBER() OVER (
         |    PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
         |  FROM cand)
         |SELECT query_id, probe_label, neighbor_id, rank, cos FROM ranked
         |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
    "vs08_ivf_trained_recall" ->
      s"""WITH ${ivfTrainCtes(k = 8, iters = 3)},
         |indexed AS (
         |  SELECT vec_id AS neighbor_id, embedding AS cv2, label AS probe_label
         |  FROM (
         |    SELECT e.vec_id, e.embedding, c.label, ROW_NUMBER() OVER (
         |      PARTITION BY e.vec_id
         |      ORDER BY ${cosSql("e.embedding", "c.cv")} DESC, c.label ASC
         |    ) AS arnk
         |    FROM embeddings e CROSS JOIN cvec3 c) s
         |  WHERE arnk = 1),
         |q AS (SELECT vec_id AS query_id, embedding AS qv
         |      FROM embeddings WHERE vec_id < 10),
         |aranked AS (
         |  SELECT query_id, qv, label, ROW_NUMBER() OVER (
         |    PARTITION BY query_id
         |    ORDER BY ${cosSql("qv", "c.cv")} DESC, label ASC) AS arnk
         |  FROM q CROSS JOIN cvec3 c),
         |probes AS (
         |  SELECT 1 AS nprobe, query_id, qv, label FROM aranked WHERE arnk <= 1
         |  UNION ALL
         |  SELECT 2 AS nprobe, query_id, qv, label FROM aranked WHERE arnk <= 2),
         |cand AS (
         |  SELECT nprobe, query_id, i.neighbor_id,
         |    ${cosSql("qv", "i.cv2")} AS cos
         |  FROM probes p JOIN indexed i ON i.probe_label = p.label
         |  WHERE i.neighbor_id <> p.query_id),
         |ivf AS (
         |  SELECT nprobe, query_id, neighbor_id FROM (
         |    SELECT nprobe, query_id, neighbor_id, ROW_NUMBER() OVER (
         |      PARTITION BY nprobe, query_id
         |      ORDER BY cos DESC, neighbor_id ASC) AS rank
         |    FROM cand) t WHERE rank <= 3),
         |exact AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, c.vec_id AS neighbor_id, ROW_NUMBER() OVER (
         |      PARTITION BY query_id
         |      ORDER BY ${cosSql("qv", "c.embedding")} DESC, c.vec_id ASC) AS rank
         |    FROM q JOIN embeddings c ON c.vec_id <> query_id) t
         |  WHERE rank <= 3)
         |SELECT i.nprobe, i.query_id,
         |  CAST(SUM(CASE WHEN e.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_hit,
         |  CAST(SUM(CASE WHEN e.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) / 3.0 AS recall_at_3
         |FROM ivf i LEFT JOIN exact e
         |  ON i.query_id = e.query_id AND i.neighbor_id = e.neighbor_id
         |GROUP BY i.nprobe, i.query_id
         |ORDER BY i.nprobe, i.query_id""".stripMargin,
    "vs09_sq8_search" ->
      s"""WITH dims AS (
         |  SELECT vec_id, r.i AS i, CAST(embedding[r.i] AS DOUBLE) AS v
         |  FROM embeddings, range(1, 65) r(i)),
         |st AS (SELECT i, MIN(v) AS mn, MAX(v) AS mx FROM dims GROUP BY i),
         |dq AS (
         |  SELECT vec_id, list(CASE WHEN mx = mn THEN mn
         |    ELSE mn + LEAST(255.0, GREATEST(0.0,
         |      FLOOR((v - mn) / (mx - mn) * 255))) * (mx - mn) / 255
         |    END ORDER BY i) AS dqv
         |  FROM dims JOIN st USING (i) GROUP BY vec_id),
         |q AS (SELECT vec_id AS query_id, embedding AS qv
         |      FROM embeddings WHERE vec_id < 10),
         |approx AS (
         |  SELECT query_id, qv, d.vec_id AS neighbor_id,
         |    ${dotSql("qv", "d.dqv")} AS ascore
         |  FROM dq d CROSS JOIN q WHERE d.vec_id <> query_id),
         |cand AS (
         |  SELECT query_id, qv, neighbor_id FROM (
         |    SELECT query_id, qv, neighbor_id, ROW_NUMBER() OVER (
         |      PARTITION BY query_id
         |      ORDER BY ascore DESC, neighbor_id ASC) AS arnk
         |    FROM approx) t WHERE arnk <= 12),
         |rescored AS (
         |  SELECT query_id, neighbor_id, ${cosSql("qv", "c.embedding")} AS cos
         |  FROM cand JOIN embeddings c ON c.vec_id = cand.neighbor_id)
         |SELECT query_id, neighbor_id, rank, cos FROM (
         |  SELECT query_id, neighbor_id, cos, ROW_NUMBER() OVER (
         |    PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
         |  FROM rescored) t
         |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
    "vs10_pq_search" ->
      s"""WITH sub AS (
         |  SELECT vec_id, r.m AS m,
         |    list_transform(list_slice(embedding, r.m * 8 + 1, r.m * 8 + 8),
         |      x -> CAST(x AS DOUBLE)) AS sv
         |  FROM embeddings, range(0, 8) r(m)),
         |cb AS (SELECT CAST(vec_id AS INT) AS code, m, sv AS cb
         |       FROM sub WHERE vec_id < 16),
         |enc AS (
         |  SELECT s.vec_id, s.m, cb.code,
         |    list_reduce(list_prepend(0.0, list_transform(range(1, 9),
         |      j -> (s.sv[j] - cb.cb[j]) * (s.sv[j] - cb.cb[j]))),
         |      (acc, x) -> acc + x) AS l2
         |  FROM sub s JOIN cb ON s.m = cb.m),
         |codes AS (
         |  SELECT vec_id, m, code FROM (
         |    SELECT vec_id, m, code, ROW_NUMBER() OVER (
         |      PARTITION BY vec_id, m ORDER BY l2 ASC, code ASC) AS crnk
         |    FROM enc) t WHERE crnk = 1),
         |recon AS (
         |  SELECT codes.vec_id, flatten(list(cb.cb ORDER BY codes.m)) AS rv
         |  FROM codes JOIN cb ON codes.m = cb.m AND codes.code = cb.code
         |  GROUP BY codes.vec_id),
         |q AS (SELECT vec_id AS query_id, embedding AS qv
         |      FROM embeddings WHERE vec_id < 10),
         |approx AS (
         |  SELECT query_id, qv, r.vec_id AS neighbor_id,
         |    ${dotSql("qv", "r.rv")} AS ascore
         |  FROM recon r CROSS JOIN q WHERE r.vec_id <> query_id),
         |cand AS (
         |  SELECT query_id, qv, neighbor_id FROM (
         |    SELECT query_id, qv, neighbor_id, ROW_NUMBER() OVER (
         |      PARTITION BY query_id
         |      ORDER BY ascore DESC, neighbor_id ASC) AS arnk
         |    FROM approx) t WHERE arnk <= 12),
         |rescored AS (
         |  SELECT query_id, neighbor_id, ${cosSql("qv", "c.embedding")} AS cos
         |  FROM cand JOIN embeddings c ON c.vec_id = cand.neighbor_id)
         |SELECT query_id, neighbor_id, rank, cos FROM (
         |  SELECT query_id, neighbor_id, cos, ROW_NUMBER() OVER (
         |    PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
         |  FROM rescored) t
         |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
    "vs30_mips_search" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv,
         |             ${bucketSql("embedding", 4)} AS bucket
         |           FROM embeddings WHERE vec_id < 10),
         |c AS (SELECT vec_id AS neighbor_id, embedding AS cv,
         |        ${bucketSql("embedding", 4)} AS bucket
         |      FROM embeddings)
         |SELECT query_id, bucket, neighbor_id, rank, dot FROM (
         |  SELECT query_id, bucket, neighbor_id,
         |    ${dotSql("qv", "cv")} AS dot,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY ${dotSql("qv", "cv")} DESC, neighbor_id ASC) AS rank
         |  FROM c JOIN q USING (bucket)
         |  WHERE neighbor_id <> query_id) t
         |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
    "vs04_cosine_neardup" ->
      s"""WITH c AS (SELECT vec_id, embedding,
         |             ${bucketSql("embedding", 4)} AS bucket
         |           FROM embeddings)
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  ${cosSql("a.embedding", "b.embedding")} AS cos
         |FROM c a JOIN c b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.3
         |ORDER BY id_a, id_b""".stripMargin,
    "vs17_range_search" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
         |           FROM embeddings WHERE vec_id < 5),
         |c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings)
         |SELECT query_id, neighbor_id, ${cosSql("qv", "cv")} AS cos
         |FROM c JOIN q ON query_id <> neighbor_id
         |WHERE ${cosSql("qv", "cv")} >= 0.25
         |ORDER BY query_id, neighbor_id""".stripMargin,
    "vs19_cluster_stats" ->
      s"""WITH ${ivfTrainCtes(k = 8, iters = 2)},
         |scored AS (
         |  SELECT vec_id, label, score FROM (
         |    SELECT e.vec_id, c.label,
         |      ${cosSql("e.embedding", "c.cv")} AS score,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosSql("e.embedding", "c.cv")} DESC, c.label ASC
         |      ) AS arnk
         |    FROM embeddings e CROSS JOIN cvec2 c) s
         |  WHERE arnk = 1)
         |SELECT label, COUNT(*) AS n_members,
         |  MIN(score) AS min_cos, MAX(score) AS max_cos,
         |  CAST(SUM(CAST(FLOOR(score * 1048576) AS BIGINT)) AS DOUBLE)
         |    / (1048576.0 * CAST(COUNT(*) AS DOUBLE)) AS mean_cos
         |FROM scored GROUP BY label ORDER BY label""".stripMargin,
    "vs24_ann_recall_eval" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv,
         |             ${bucketSql("embedding", 6)} AS bucket
         |           FROM embeddings WHERE vec_id < 20),
         |c AS (SELECT vec_id AS neighbor_id, embedding AS cv,
         |        ${bucketSql("embedding", 6)} AS bucket
         |      FROM embeddings),
         |exact AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id, ROW_NUMBER() OVER (
         |      PARTITION BY query_id
         |      ORDER BY ${cosSql("qv", "cv")} DESC, neighbor_id ASC) AS rank
         |    FROM c JOIN q ON query_id <> neighbor_id) s
         |  WHERE rank <= 10),
         |approx AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT q.query_id, c.neighbor_id, ROW_NUMBER() OVER (
         |      PARTITION BY q.query_id
         |      ORDER BY ${cosSql("q.qv", "c.cv")} DESC, c.neighbor_id ASC
         |    ) AS rank
         |    FROM c JOIN q ON c.bucket = q.bucket
         |    WHERE q.query_id <> c.neighbor_id) s
         |  WHERE rank <= 10),
         |h AS (
         |  SELECT e.query_id, CAST(COUNT(*) AS BIGINT) AS n_hit
         |  FROM exact e JOIN approx a
         |    ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
         |  GROUP BY e.query_id),
         |x AS (
         |  SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_exact
         |  FROM exact GROUP BY query_id)
         |SELECT x.query_id, n_exact,
         |  CAST(COALESCE(n_hit, 0) AS BIGINT) AS n_hit,
         |  CAST(COALESCE(n_hit, 0) AS DOUBLE) / CAST(n_exact AS DOUBLE)
         |    AS recall_at_10
         |FROM x LEFT JOIN h ON x.query_id = h.query_id
         |ORDER BY x.query_id""".stripMargin,
    "vs23_semantic_decontam" ->
      s"""WITH b AS (
         |  SELECT vec_id AS bench_id, embedding AS bv
         |  FROM embeddings WHERE vec_id < 5),
         |c AS (
         |  SELECT e.vec_id, b.bench_id,
         |    ${cosSql("e.embedding", "b.bv")} AS cos
         |  FROM embeddings e CROSS JOIN b WHERE e.vec_id >= 5),
         |m AS (
         |  SELECT vec_id, bench_id, cos, ROW_NUMBER() OVER (
         |    PARTITION BY vec_id ORDER BY cos DESC, bench_id ASC) AS rn
         |  FROM c)
         |SELECT vec_id, bench_id AS nearest_bench, cos AS max_cos,
         |  cos >= 0.35 AS contaminated
         |FROM m WHERE rn = 1 ORDER BY vec_id""".stripMargin,
    "vs22_kmeans_par_init" ->
      s"""WITH c0 AS (
         |  SELECT 0 AS round, vec_id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv,
         |    1.0 AS far_score
         |  FROM embeddings ORDER BY vec_id LIMIT 1),
         |f1 AS (
         |  SELECT 1 AS round, vec_id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv,
         |    near_cos AS far_score
         |  FROM (
         |    SELECT e.vec_id, e.embedding,
         |      MAX(${cosSql("e.embedding", "c.cv")}) AS near_cos
         |    FROM embeddings e CROSS JOIN c0 c
         |    GROUP BY e.vec_id, e.embedding) s
         |  ORDER BY near_cos ASC, vec_id ASC LIMIT 4),
         |c1 AS (SELECT * FROM c0 UNION ALL SELECT * FROM f1),
         |f2 AS (
         |  SELECT 2 AS round, vec_id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv,
         |    near_cos AS far_score
         |  FROM (
         |    SELECT e.vec_id, e.embedding,
         |      MAX(${cosSql("e.embedding", "c.cv")}) AS near_cos
         |    FROM embeddings e CROSS JOIN c1 c
         |    GROUP BY e.vec_id, e.embedding) s
         |  ORDER BY near_cos ASC, vec_id ASC LIMIT 4),
         |centers AS (SELECT * FROM c1 UNION ALL SELECT * FROM f2),
         |scored AS (
         |  SELECT vec_id, label, score FROM (
         |    SELECT e.vec_id, CAST(c.vec_id AS INT) AS label,
         |      ${cosSql("e.embedding", "c.cv")} AS score,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosSql("e.embedding", "c.cv")} DESC,
         |          CAST(c.vec_id AS INT) ASC) AS arnk
         |    FROM embeddings e CROSS JOIN centers c) s
         |  WHERE arnk = 1),
         |stats AS (
         |  SELECT label, CAST(COUNT(*) AS BIGINT) AS n_members,
         |    MIN(score) AS min_cos, MAX(score) AS max_cos,
         |    CAST(SUM(CAST(FLOOR(score * 1048576) AS BIGINT)) AS DOUBLE)
         |      / (1048576.0 * CAST(COUNT(*) AS DOUBLE)) AS mean_cos
         |  FROM scored GROUP BY label)
         |SELECT c.round, c.vec_id, c.far_score,
         |  s.n_members, s.min_cos, s.max_cos, s.mean_cos
         |FROM centers c JOIN stats s ON CAST(c.vec_id AS INT) = s.label
         |ORDER BY c.round, c.vec_id""".stripMargin,
    "vs18_cluster_sample" ->
      s"""WITH b AS (
         |  SELECT ${bucketSql("embedding", 4)} AS bucket, vec_id,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(
         |      range(1, length('cs:' || CAST(vec_id AS VARCHAR)) + 1),
         |      i -> CAST(unicode(substr('cs:' || CAST(vec_id AS VARCHAR),
         |             CAST(i AS INT), 1)) AS BIGINT))),
         |      (acc, c) -> (acc * 31 + c) % 2147483647) AS h
         |  FROM embeddings)
         |SELECT bucket, h, vec_id
         |FROM (SELECT bucket, h, vec_id, ROW_NUMBER() OVER (
         |        PARTITION BY bucket ORDER BY h, vec_id) AS rn
         |      FROM b) t
         |WHERE rn <= 8 ORDER BY bucket, h, vec_id""".stripMargin,
    "vs14_ivfpq_search" ->
      s"""WITH ${ivfTrainCtes(k = 8, iters = 2)},
         |indexed AS (
         |  SELECT vec_id AS neighbor_id, label AS probe_label
         |  FROM (
         |    SELECT e.vec_id, c.label, ROW_NUMBER() OVER (
         |      PARTITION BY e.vec_id
         |      ORDER BY ${cosSql("e.embedding", "c.cv")} DESC, c.label ASC
         |    ) AS arnk
         |    FROM embeddings e CROSS JOIN cvec2 c) s
         |  WHERE arnk = 1),
         |q AS (SELECT vec_id AS query_id, embedding AS qv
         |      FROM embeddings WHERE vec_id < 10),
         |probes AS (
         |  SELECT query_id, qv, label AS probe_label FROM (
         |    SELECT query_id, qv, label, ROW_NUMBER() OVER (
         |      PARTITION BY query_id
         |      ORDER BY ${cosSql("qv", "c.cv")} DESC, label ASC) AS arnk
         |    FROM q CROSS JOIN cvec2 c) t WHERE arnk <= 2),
         |sub AS (
         |  SELECT vec_id, r.m AS m,
         |    list_transform(list_slice(embedding, r.m * 8 + 1, r.m * 8 + 8),
         |      x -> CAST(x AS DOUBLE)) AS sv
         |  FROM embeddings, range(0, 8) r(m)),
         |cb AS (SELECT CAST(vec_id AS INT) AS code, m, sv AS cb
         |       FROM sub WHERE vec_id < 16),
         |enc AS (
         |  SELECT s.vec_id, s.m, cb.code,
         |    list_reduce(list_prepend(0.0, list_transform(range(1, 9),
         |      j -> (s.sv[j] - cb.cb[j]) * (s.sv[j] - cb.cb[j]))),
         |      (acc, x) -> acc + x) AS l2
         |  FROM sub s JOIN cb ON s.m = cb.m),
         |codes AS (
         |  SELECT vec_id, m, code FROM (
         |    SELECT vec_id, m, code, ROW_NUMBER() OVER (
         |      PARTITION BY vec_id, m ORDER BY l2 ASC, code ASC) AS crnk
         |    FROM enc) t WHERE crnk = 1),
         |recon AS (
         |  SELECT codes.vec_id, flatten(list(cb.cb ORDER BY codes.m)) AS rv
         |  FROM codes JOIN cb ON codes.m = cb.m AND codes.code = cb.code
         |  GROUP BY codes.vec_id),
         |approx AS (
         |  SELECT p.query_id, p.qv, i.neighbor_id,
         |    ${dotSql("p.qv", "r.rv")} AS ascore
         |  FROM probes p
         |  JOIN indexed i ON i.probe_label = p.probe_label
         |  JOIN recon r ON r.vec_id = i.neighbor_id
         |  WHERE i.neighbor_id <> p.query_id),
         |cand AS (
         |  SELECT query_id, qv, neighbor_id FROM (
         |    SELECT query_id, qv, neighbor_id, ROW_NUMBER() OVER (
         |      PARTITION BY query_id
         |      ORDER BY ascore DESC, neighbor_id ASC) AS arnk
         |    FROM approx) t WHERE arnk <= 12),
         |rescored AS (
         |  SELECT query_id, neighbor_id, ${cosSql("qv", "c.embedding")} AS cos
         |  FROM cand JOIN embeddings c ON c.vec_id = neighbor_id)
         |SELECT query_id, neighbor_id, rank, cos FROM (
         |  SELECT query_id, neighbor_id, cos, ROW_NUMBER() OVER (
         |    PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
         |  FROM rescored) t
         |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
    "vs13_mmr_diversified" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
         |           FROM embeddings WHERE vec_id < 5),
         |scored AS (
         |  SELECT query_id, e.vec_id AS neighbor_id, e.embedding AS cv,
         |    ${cosSql("qv", "e.embedding")} AS rel
         |  FROM q JOIN embeddings e ON e.vec_id <> query_id),
         |pool AS (
         |  SELECT * FROM (
         |    SELECT query_id, neighbor_id, cv, rel, ROW_NUMBER() OVER (
         |      PARTITION BY query_id ORDER BY rel DESC, neighbor_id ASC) AS rnk
         |    FROM scored) t WHERE rnk <= 12),
         |s1 AS (SELECT query_id, neighbor_id, rel, cv FROM pool WHERE rnk = 1),
         |p2 AS (
         |  SELECT c.query_id, c.neighbor_id, c.rel, c.cv,
         |    0.5 * c.rel - 0.5 * (${cosSql("c.cv", "a.cv")}) AS score
         |  FROM pool c JOIN s1 a ON c.query_id = a.query_id
         |  WHERE c.neighbor_id <> a.neighbor_id),
         |s2 AS (SELECT query_id, neighbor_id, rel, cv FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, neighbor_id ASC) AS rn FROM p2) t
         |  WHERE rn = 1),
         |p3 AS (
         |  SELECT c.query_id, c.neighbor_id, c.rel, c.cv,
         |    0.5 * c.rel - 0.5 * GREATEST(${cosSql("c.cv", "a.cv")},
         |      ${cosSql("c.cv", "b.cv")}) AS score
         |  FROM pool c JOIN s1 a ON c.query_id = a.query_id
         |              JOIN s2 b ON c.query_id = b.query_id
         |  WHERE c.neighbor_id <> a.neighbor_id
         |    AND c.neighbor_id <> b.neighbor_id),
         |s3 AS (SELECT query_id, neighbor_id, rel, cv FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, neighbor_id ASC) AS rn FROM p3) t
         |  WHERE rn = 1),
         |p4 AS (
         |  SELECT c.query_id, c.neighbor_id, c.rel, c.cv,
         |    0.5 * c.rel - 0.5 * GREATEST(${cosSql("c.cv", "a.cv")},
         |      ${cosSql("c.cv", "b.cv")}, ${cosSql("c.cv", "d.cv")}) AS score
         |  FROM pool c JOIN s1 a ON c.query_id = a.query_id
         |              JOIN s2 b ON c.query_id = b.query_id
         |              JOIN s3 d ON c.query_id = d.query_id
         |  WHERE c.neighbor_id <> a.neighbor_id
         |    AND c.neighbor_id <> b.neighbor_id
         |    AND c.neighbor_id <> d.neighbor_id),
         |s4 AS (SELECT query_id, neighbor_id, rel, cv FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, neighbor_id ASC) AS rn FROM p4) t
         |  WHERE rn = 1)
         |SELECT query_id, 1 AS step, neighbor_id, rel FROM s1
         |UNION ALL SELECT query_id, 2, neighbor_id, rel FROM s2
         |UNION ALL SELECT query_id, 3, neighbor_id, rel FROM s3
         |UNION ALL SELECT query_id, 4, neighbor_id, rel FROM s4
         |ORDER BY query_id, step""".stripMargin,
    "vs12_semantic_dedup" ->
      s"""WITH RECURSIVE c AS (
         |  SELECT vec_id, embedding, ${bucketSql("embedding", 4)} AS bucket
         |  FROM embeddings),
         |pairs AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM c a JOIN c b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |  WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.4),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |          UNION ALL SELECT id_b, id_a FROM pairs),
         |reach(id, r) AS (
         |  SELECT vec_id, vec_id FROM embeddings
         |  UNION
         |  SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src),
         |comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id)
         |SELECT e.label, COUNT(*) AS n_kept, MIN(e.vec_id) AS min_kept_id
         |FROM embeddings e JOIN comp ON e.vec_id = comp.id
         |WHERE comp.id = comp.component
         |GROUP BY e.label ORDER BY e.label""".stripMargin,
  )

  /** vs28/vs29 persist the codebook artifacts and search against the
    * reload; parquet round-trips the doubles bit-exactly, so their
    * oracles ARE vs09/vs10's — persisted == in-memory, bit for bit. */
  val oracle: Map[String, String] = oracleBase ++ Map(
    "vs28_sq8_persisted" -> oracleBase("vs09_sq8_search"),
    "vs29_pq_persisted" -> oracleBase("vs10_pq_search"),
    "vs31_embedding_covariance" ->
      s"""WITH $covCtes
         |SELECT i, j, cov FROM covf ORDER BY i, j""".stripMargin,
    // Stats are exactly additive (int64 sums of quantized values), so
    // the sharded+persisted+merged computation must equal the
    // monolithic covariance bit for bit — vs31's oracle verbatim.
    "vs40_cov_merge" ->
      s"""WITH $covCtes
         |SELECT i, j, cov FROM covf ORDER BY i, j""".stripMargin,
    "vs43_retrieval_metrics" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label AS q_label
         |           FROM embeddings WHERE vec_id < 20),
         |c AS (SELECT vec_id AS neighbor_id, embedding AS cv, label AS n_label
         |      FROM embeddings),
         |top AS (
         |  SELECT query_id, q_label, neighbor_id, n_label, rank FROM (
         |    SELECT query_id, q_label, neighbor_id, n_label, ROW_NUMBER() OVER (
         |      PARTITION BY query_id
         |      ORDER BY ${cosSql("qv", "cv")} DESC, neighbor_id ASC) AS rank
         |    FROM c JOIN q ON query_id <> neighbor_id) s
         |  WHERE rank <= 10),
         |m AS (
         |  SELECT query_id,
         |    CAST(SUM(CASE WHEN q_label = n_label THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_rel_at_10,
         |    CAST(MIN(CASE WHEN q_label = n_label THEN rank END) AS BIGINT)
         |      AS first_rel_rank
         |  FROM top GROUP BY query_id)
         |SELECT query_id, n_rel_at_10, first_rel_rank,
         |  CAST(n_rel_at_10 AS DOUBLE) / 10.0 AS precision_at_10,
         |  COALESCE(1.0 / CAST(first_rel_rank AS DOUBLE), 0.0) AS rr
         |FROM m ORDER BY query_id""".stripMargin,
    "vs42_prefix_dim_recall" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv,
         |             embedding[1:16] AS pqv
         |           FROM embeddings WHERE vec_id < 20),
         |c AS (SELECT vec_id AS neighbor_id, embedding AS cv,
         |        embedding[1:16] AS pcv
         |      FROM embeddings),
         |exact AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id, ROW_NUMBER() OVER (
         |      PARTITION BY query_id
         |      ORDER BY ${cosSql("qv", "cv")} DESC, neighbor_id ASC) AS rank
         |    FROM c JOIN q ON query_id <> neighbor_id) s
         |  WHERE rank <= 10),
         |approx AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id, ROW_NUMBER() OVER (
         |      PARTITION BY query_id
         |      ORDER BY ${cosSql("pqv", "pcv")} DESC, neighbor_id ASC) AS rank
         |    FROM c JOIN q ON query_id <> neighbor_id) s
         |  WHERE rank <= 10),
         |h AS (
         |  SELECT e.query_id, CAST(COUNT(*) AS BIGINT) AS n_hit
         |  FROM exact e JOIN approx a
         |    ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
         |  GROUP BY e.query_id),
         |x AS (
         |  SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_exact
         |  FROM exact GROUP BY query_id)
         |SELECT x.query_id, n_exact,
         |  CAST(COALESCE(n_hit, 0) AS BIGINT) AS n_hit,
         |  CAST(COALESCE(n_hit, 0) AS DOUBLE) / CAST(n_exact AS DOUBLE)
         |    AS recall_at_10
         |FROM x LEFT JOIN h ON x.query_id = h.query_id
         |ORDER BY x.query_id""".stripMargin,
    // μ comes off the same marginal sums the covariance uses
    // ((S_i/n)/Scale — the driver's dimensionMeans order); the centered
    // vector, both projections, and the residual fold replay the Spark
    // expressions index-ascending, so resid2 is bit-exact.
    "vs41_ood_residual" ->
      s"""WITH $covCtes,
         |${powerIterCtes(24)},
         |${deflateCtes(mat = "covfull", vcte = "v24", dmat = "defl")},
         |${powerIterChain(24, mat = "defl", pfx = "d", ortho = Some("v24"))},
         |pv1 AS (SELECT list(v ORDER BY i) AS p1 FROM v24),
         |pv2 AS (SELECT list(v ORDER BY i) AS p2 FROM dv24),
         |mu AS (SELECT list((CAST(s AS DOUBLE) / nd) / 16384.0 ORDER BY i) AS m
         |       FROM covm CROSS JOIN covn),
         |cent AS MATERIALIZED (
         |  SELECT vec_id, label,
         |    [CAST(embedding[i] AS DOUBLE) - m[i] for i in range(1, 65)] AS c
         |  FROM embeddings CROSS JOIN mu),
         |tt AS MATERIALIZED (
         |  SELECT vec_id, label, c, p1, p2,
         |    ${dotSql("c", "p1")} AS t1, ${dotSql("c", "p2")} AS t2
         |  FROM cent CROSS JOIN pv1 CROSS JOIN pv2)
         |SELECT vec_id, label, ${dotSql("c", "c")} AS cc,
         |  list_reduce(list_prepend(0.0, list_transform(range(1, 65), i ->
         |    ((c[i] - t1 * p1[i]) - t2 * p2[i])
         |      * ((c[i] - t1 * p1[i]) - t2 * p2[i]))), (acc, x) -> acc + x)
         |    AS resid2
         |FROM tt ORDER BY vec_id""".stripMargin,
    "vs32_pca_projection" ->
      s"""WITH $covCtes,
         |${powerIterCtes(24)},
         |pv AS (SELECT list(v ORDER BY i) AS pv FROM v24)
         |SELECT vec_id, label, ${dotSql("embedding", "pv")} AS pc1
         |FROM embeddings CROSS JOIN pv ORDER BY vec_id""".stripMargin,
    "vs34_pca_top2" ->
      s"""WITH $covCtes,
         |${powerIterCtes(24)},
         |${deflateCtes(mat = "covfull", vcte = "v24", dmat = "defl")},
         |${powerIterChain(24, mat = "defl", pfx = "d", ortho = Some("v24"))},
         |pv1 AS (SELECT list(v ORDER BY i) AS p1 FROM v24),
         |pv2 AS (SELECT list(v ORDER BY i) AS p2 FROM dv24)
         |SELECT vec_id, label, ${dotSql("embedding", "p1")} AS pc1,
         |  ${dotSql("embedding", "p2")} AS pc2
         |FROM embeddings CROSS JOIN pv1 CROSS JOIN pv2
         |ORDER BY vec_id""".stripMargin,
    // λ₁ comes from the first deflation's Rayleigh fold (defl_lam);
    // λ₂ from deflating AGAIN around the second converged iterate
    // (defl2_lam) — the same folds the driver loop runs, so the
    // whitened coordinates are bit-exact.
    "vs35_whitened_projection" ->
      s"""WITH $covCtes,
         |${powerIterCtes(24)},
         |${deflateCtes(mat = "covfull", vcte = "v24", dmat = "defl")},
         |${powerIterChain(24, mat = "defl", pfx = "d", ortho = Some("v24"))},
         |${deflateCtes(mat = "defl", vcte = "dv24", dmat = "defl2")},
         |pv1 AS (SELECT list(v ORDER BY i) AS p1 FROM v24),
         |pv2 AS (SELECT list(v ORDER BY i) AS p2 FROM dv24)
         |SELECT vec_id, label,
         |  ${dotSql("embedding", "p1")} / sqrt(l1.lam) AS w1,
         |  ${dotSql("embedding", "p2")} / sqrt(l2.lam) AS w2
         |FROM embeddings CROSS JOIN pv1 CROSS JOIN pv2
         |CROSS JOIN defl_lam l1 CROSS JOIN defl2_lam l2
         |ORDER BY vec_id""".stripMargin,
    // The Cramer determinants are the driver loop's formulas verbatim
    // (first-row cofactor expansion, left to right); every S is an
    // exact integer, so the doubles agree bit for bit.
    "vs36_linear_probe" -> {
      val det = "(n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)" +
        " + s2 * (s1 * s12 - s11 * s2))"
      s"""WITH $covCtes,
         |${powerIterCtes(24)},
         |${deflateCtes(mat = "covfull", vcte = "v24", dmat = "defl")},
         |${powerIterChain(24, mat = "defl", pfx = "d", ortho = Some("v24"))},
         |pv1 AS (SELECT list(v ORDER BY i) AS p1 FROM v24),
         |pv2 AS (SELECT list(v ORDER BY i) AS p2 FROM dv24),
         |proj AS MATERIALIZED (
         |  SELECT vec_id, label,
         |    CAST(FLOOR(${dotSql("embedding", "p1")} * 16384.0) AS BIGINT) AS q1,
         |    CAST(FLOOR(${dotSql("embedding", "p2")} * 16384.0) AS BIGINT) AS q2
         |  FROM embeddings CROSS JOIN pv1 CROSS JOIN pv2),
         |st AS (SELECT
         |    CAST(COUNT(*) AS DOUBLE) AS n,
         |    CAST(SUM(q1) AS DOUBLE) AS s1, CAST(SUM(q2) AS DOUBLE) AS s2,
         |    CAST(SUM(label) AS DOUBLE) AS sy,
         |    CAST(SUM(q1 * q1) AS DOUBLE) AS s11,
         |    CAST(SUM(q1 * q2) AS DOUBLE) AS s12,
         |    CAST(SUM(q2 * q2) AS DOUBLE) AS s22,
         |    CAST(SUM(q1 * label) AS DOUBLE) AS s1y,
         |    CAST(SUM(q2 * label) AS DOUBLE) AS s2y
         |  FROM proj),
         |coef AS (SELECT
         |    (sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)
         |      + s2 * (s1y * s12 - s11 * s2y)) / $det AS b0,
         |    (n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)
         |      + s2 * (s1 * s2y - s1y * s2)) / $det AS b1,
         |    (n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)
         |      + sy * (s1 * s12 - s11 * s2)) / $det AS b2
         |  FROM st)
         |SELECT vec_id, label,
         |  (b0 + b1 * CAST(q1 AS DOUBLE)) + b2 * CAST(q2 AS DOUBLE) AS pred,
         |  CAST(label AS DOUBLE)
         |    - ((b0 + b1 * CAST(q1 AS DOUBLE)) + b2 * CAST(q2 AS DOUBLE)) AS resid
         |FROM proj CROSS JOIN coef ORDER BY vec_id""".stripMargin
    },
    // vs36's chain with the sufficient statistics restricted to the
    // train slice; scoring covers every row.
    "vs39_probe_holdout" -> {
      val det = "(n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)" +
        " + s2 * (s1 * s12 - s11 * s2))"
      s"""WITH $covCtes,
         |${powerIterCtes(24)},
         |${deflateCtes(mat = "covfull", vcte = "v24", dmat = "defl")},
         |${powerIterChain(24, mat = "defl", pfx = "d", ortho = Some("v24"))},
         |pv1 AS (SELECT list(v ORDER BY i) AS p1 FROM v24),
         |pv2 AS (SELECT list(v ORDER BY i) AS p2 FROM dv24),
         |proj AS MATERIALIZED (
         |  SELECT vec_id, label,
         |    CAST(FLOOR(${dotSql("embedding", "p1")} * 16384.0) AS BIGINT) AS q1,
         |    CAST(FLOOR(${dotSql("embedding", "p2")} * 16384.0) AS BIGINT) AS q2
         |  FROM embeddings CROSS JOIN pv1 CROSS JOIN pv2),
         |st AS (SELECT
         |    CAST(COUNT(*) AS DOUBLE) AS n,
         |    CAST(SUM(q1) AS DOUBLE) AS s1, CAST(SUM(q2) AS DOUBLE) AS s2,
         |    CAST(SUM(label) AS DOUBLE) AS sy,
         |    CAST(SUM(q1 * q1) AS DOUBLE) AS s11,
         |    CAST(SUM(q1 * q2) AS DOUBLE) AS s12,
         |    CAST(SUM(q2 * q2) AS DOUBLE) AS s22,
         |    CAST(SUM(q1 * label) AS DOUBLE) AS s1y,
         |    CAST(SUM(q2 * label) AS DOUBLE) AS s2y
         |  FROM proj WHERE vec_id % 5 <> 0),
         |coef AS (SELECT
         |    (sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)
         |      + s2 * (s1y * s12 - s11 * s2y)) / $det AS b0,
         |    (n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)
         |      + s2 * (s1 * s2y - s1y * s2)) / $det AS b1,
         |    (n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)
         |      + sy * (s1 * s12 - s11 * s2)) / $det AS b2
         |  FROM st)
         |SELECT vec_id, label, vec_id % 5 = 0 AS holdout,
         |  (b0 + b1 * CAST(q1 AS DOUBLE)) + b2 * CAST(q2 AS DOUBLE) AS pred,
         |  CAST(label AS DOUBLE)
         |    - ((b0 + b1 * CAST(q1 AS DOUBLE)) + b2 * CAST(q2 AS DOUBLE)) AS resid
         |FROM proj CROSS JOIN coef ORDER BY vec_id""".stripMargin
    },
    "vs37_knn_classify" ->
      s"""WITH q AS (SELECT vec_id AS query_id, label AS true_label,
         |             embedding AS qv
         |           FROM embeddings WHERE vec_id < 50),
         |c AS (SELECT vec_id AS neighbor_id, label AS neighbor_label,
         |        embedding AS cv
         |      FROM embeddings),
         |scored AS (
         |  SELECT query_id, true_label, neighbor_id, neighbor_label,
         |    ${cosSql("qv", "cv")} AS cos
         |  FROM c JOIN q ON query_id <> neighbor_id),
         |ranked AS (
         |  SELECT query_id, true_label, neighbor_label, ROW_NUMBER() OVER (
         |    PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
         |  FROM scored),
         |votes AS (
         |  SELECT query_id, true_label, neighbor_label, COUNT(*) AS votes
         |  FROM ranked WHERE rank <= 5
         |  GROUP BY query_id, true_label, neighbor_label),
         |pick AS (
         |  SELECT query_id, true_label, neighbor_label AS pred_label, votes,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY votes DESC, neighbor_label ASC) AS vrnk
         |  FROM votes)
         |SELECT query_id, true_label, pred_label, votes
         |FROM pick WHERE vrnk = 1 ORDER BY query_id""".stripMargin,
    "vs38_embedding_drift" -> {
      def half(name: String, parity: Int) =
        s"""$name AS (
           |  SELECT CAST(r.i AS INT) AS i,
           |    CAST(FLOOR(CAST(embedding[r.i + 1] AS DOUBLE) * 16384.0)
           |      AS BIGINT) AS qi
           |  FROM embeddings, range(0, 64) r(i) WHERE vec_id % 2 = $parity)""".stripMargin
      s"""WITH ${half("qa", 0)},
         |${half("qb", 1)},
         |ma AS (SELECT i, CAST(SUM(qi) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         |         / 16384.0 AS mean_a FROM qa GROUP BY i),
         |mb AS (SELECT i, CAST(SUM(qi) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         |         / 16384.0 AS mean_b FROM qb GROUP BY i)
         |SELECT ma.i, mean_a, mean_b, mean_b - mean_a AS drift
         |FROM ma JOIN mb ON ma.i = mb.i ORDER BY ma.i""".stripMargin
    })
}
