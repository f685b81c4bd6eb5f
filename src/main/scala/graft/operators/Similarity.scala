package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY.md §2.3 north-star additions).
  *
  * Two tiers: brute-force top-k (broadcast the query set — exact, the
  * correctness baseline) and sign-bucket LSH (equi-join on bucket — the
  * scale path: corpus is shuffled once on bucket, never crossed).
  */
object Similarity {

  /** Exact top-k cosine neighbors for each query vector. The query set is
    * broadcast; the corpus streams through — at 100 TB this is one scan,
    * no shuffle of the corpus (the per-query top-k heap is the window's
    * rank pushdown). */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    // Norms are computed ONCE per vector at the scan (at 100 TB: a
    // stored column), not twice per scored pair — cosine per pair is
    // one dot product, a multiply and a divide. Same IEEE ops in the
    // same order as the inline form, so scores stay oracle-exact.
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"),
      norm(col("embedding")).as("qn"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"),
      norm(col("embedding")).as("cn"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dotProduct(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
  }

  /** Hard-negative mining for contrastive embedding training (the
    * in-batch-random-negatives upgrade every retrieval-model pipeline
    * runs — ANCE-style): for each anchor, the k corpus vectors MOST
    * similar to it among those carrying a DIFFERENT label. Near-miss
    * negatives carry the gradient signal random negatives lack; the
    * label inequality is what makes them negatives. Scale shape:
    * identical to [[bruteForceTopK]] — anchors broadcast, corpus
    * scanned once, the label predicate rides the broadcast join, one
    * per-anchor window over the scored slice; at index scale the
    * bucketed/IVF candidate families substitute exactly as for plain
    * top-k. */
  def hardNegatives(anchors: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = anchors.select(col("vec_id").as("query_id"),
      col("label").as("query_label"),
      col("embedding").as("qv"), norm(col("embedding")).as("qn"))
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      col("label").as("neighbor_label"),
      col("embedding").as("cv"), norm(col("embedding")).as("cn"))
    val scored = c.join(broadcast(q),
        col("query_id") =!= col("neighbor_id") &&
          col("query_label") =!= col("neighbor_label"))
      .withColumn("cos", dotProduct(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("query_label"), col("neighbor_id"),
        col("neighbor_label"), col("rank"), col("cos"))
  }

  /** Leave-one-out k-NN majority-vote classification — the standard
    * label-quality audit over an embedding table (pseudo-labeling /
    * mislabel detection: compare each vector's stored label against the
    * label its neighborhood predicts). For every query vector: its k
    * nearest corpus neighbors by exact cosine (self excluded), then the
    * modal neighbor label, ties to the SMALLEST label (deterministic on
    * both engines).
    *
    * Scale shape: identical to [[bruteForceTopK]] — the query/eval set
    * is broadcast, the corpus streams through once, and both windows
    * (neighbor rank, vote argmax) run over per-query candidate slices
    * (≤ corpus then ≤ k rows per query), never a corpus-sized
    * partition. At index scale the bucketed/IVF candidate families
    * substitute exactly as for plain top-k. */
  def knnClassify(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      col("label").as("true_label"),
      col("embedding").as("qv"), norm(col("embedding")).as("qn"))
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      col("label").as("neighbor_label"),
      col("embedding").as("cv"), norm(col("embedding")).as("cn"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dotProduct(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    val votes = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .groupBy(col("query_id"), col("true_label"), col("neighbor_label"))
      .agg(count(lit(1)).as("votes"))
    val vw = Window.partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col("neighbor_label").asc)
    votes.withColumn("vrnk", row_number().over(vw))
      .filter(col("vrnk") === 1)
      .select(col("query_id"), col("true_label"),
        col("neighbor_label").as("pred_label"), col("votes"))
  }

  /** Threshold (range) search: EVERY corpus vector with cosine ≥
    * `threshold` to each query — the "all similar enough" retrieval
    * face (FAISS range_search), where top-k's fixed budget would
    * either truncate dense neighborhoods or pad sparse ones. Scale
    * shape: queries broadcast, corpus scanned once, and NO shuffle at
    * all — the threshold filter replaces the per-query heap/window, so
    * this is strictly cheaper than [[bruteForceTopK]]; output size is
    * data-determined (callers bound it with the threshold; the
    * bucketed family is the sub-linear path). Exact w.r.t. the corpus:
    * same in-order cosine fold, oracle-bit-identical. */
  def rangeSearch(queries: DataFrame, corpus: DataFrame,
                  threshold: Double): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"),
      norm(col("embedding")).as("qn"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"),
      norm(col("embedding")).as("cn"))
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dotProduct(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .filter(col("cos") >= threshold)
      .select(col("query_id"), col("neighbor_id"), col("cos"))
  }

  /** Progressive-refinement (Matryoshka-style) search: rank by cosine
    * over only the first `prefixDim` dimensions, keep `k·overfetch`
    * candidates per query, then rescore exactly on the full vectors and
    * take the true top-k of the candidates. The cheap pass reads
    * prefixDim/dim of the bytes per vector — at index scale the prefix
    * is a separate stored column (or an MRL-truncated sibling table),
    * so pass 1's scan cost drops proportionally while pass 2 touches
    * only k·overfetch full rows per query. Both passes are the same
    * in-order cosine fold, so candidates and final scores are
    * oracle-bit-exact; recall < 1 exactly when a true neighbor's prefix
    * rank falls outside the overfetch window (the knob callers tune). */
  def truncatedRescoreTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                           prefixDim: Int, overfetch: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"),
      norm(col("embedding")).as("qn"),
      slice(col("embedding"), 1, prefixDim).as("qp"))
      .withColumn("qpn", norm(col("qp")))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"),
      norm(col("embedding")).as("cn"),
      slice(col("embedding"), 1, prefixDim).as("cp"))
      .withColumn("cpn", norm(col("cp")))
    val coarse = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("pcos", dotProduct(col("qp"), col("cp")) / (col("qpn") * col("cpn")))
    val wc = Window.partitionBy(col("query_id"))
      .orderBy(col("pcos").desc, col("neighbor_id").asc)
    val cands = coarse.withColumn("crank", row_number().over(wc))
      .filter(col("crank") <= k * overfetch)
    val rescored = cands.withColumn("cos",
      dotProduct(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    rescored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
  }

  /** Bucketed ANN: both sides hashed to a sign-bucket over the first
    * `bits` dimensions; candidates only within the same bucket (recall
    * trades off with `bits`). The join is a plain equi-join on bucket. */
  def bucketedTopK(queries: DataFrame, corpus: DataFrame, k: Int, bits: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"),
      norm(col("embedding")).as("qn"),
      signBucket(col("embedding"), bits).as("bucket"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"),
      norm(col("embedding")).as("cn"),
      signBucket(col("embedding"), bits).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dotProduct(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("bucket"), col("neighbor_id"), col("rank"), col("cos"))
  }

  /** IVF (inverted-file) ANN with trained coarse centroids: one centroid
    * per `labelCol` partition, each query probes only its nearest
    * centroid's partition. Centroid components are means of
    * floor-quantized values (floor(v·2^20) summed in exact int64) —
    * deterministic under any aggregation order, so the whole search is
    * oracle-verifiable; quantization at 2^-20 is far below the noise
    * floor of a float32 embedding. At scale: centroids are a tiny
    * broadcast, the corpus shuffles once on label, each query scans its
    * `nprobe` nearest centroids' partitions (recall rises with nprobe at
    * a linear cost in candidates — still never the full corpus). */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, labelCol: String,
              k: Int, nprobe: Int = 1): DataFrame = {
    val quant = 1048576L // 2^20
    // exact, order-independent centroid training
    val dims = corpus.select(col(labelCol).as("label"),
      posexplode(col("embedding")).as(Seq("i", "v")))
    val cent = dims.groupBy(col("label"), col("i"))
      .agg((sum(floor(col("v").cast("double") * quant).cast("long")).cast("double")
        / count(lit(1))).as("c"))
    val cvec = cent.groupBy(col("label"))
      .agg(transform(sort_array(collect_list(struct(col("i"), col("c")))),
        x => x.getField("c")).as("cvec"))
    // assignment: argmax centroid score per query (deterministic tiebreak)
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val scored = q.crossJoin(broadcast(cvec))
      .withColumn("score", aggregate(
        zip_with(col("qv"), col("cvec"), (x, y) => x.cast("double") * y),
        lit(0.0), (acc, x) => acc + x))
    val wAssign = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("label").asc)
    val assigned = scored.withColumn("arnk", row_number().over(wAssign))
      .filter(col("arnk") <= nprobe)
      .select(col("query_id"), col("qv"), norm(col("qv")).as("qn"),
        col("label").as("probe_label"))
    // search within the probed partition only
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("cv"), norm(col("embedding")).as("cn"),
      col(labelCol).as("probe_label"))
    val cand = c.join(broadcast(assigned), Seq("probe_label"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dotProduct(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("probe_label"), col("neighbor_id"),
        col("rank"), col("cos"))
  }

  /** Deterministic Lloyd-trained coarse quantizer — the IVF index whose
    * partitions actually FOLLOW the geometry, unlike [[ivfTopK]]'s
    * trust-the-label mode (on data whose label column is not a geometric
    * cluster, label-partitioned IVF has near-random recall; training
    * fixes that). Returns `(label int, cvec array<double>)`.
    *
    * Every step is order-independent so the whole index is
    * oracle-verifiable across engines:
    *   - init: the `kCentroids` lowest-`vec_id` embeddings;
    *   - assignment: argmax COSINE to a centroid, ties to the lower
    *     label (cosine is scale-invariant, so centroids may live in the
    *     quantized scale);
    *   - update: per-dimension mean of floor-quantized values
    *     (`floor(v·2^20)` summed in exact int64) — deterministic under
    *     any aggregation order. Empty clusters drop (both engines'
    *     GROUP BY drops them identically).
    *
    * Centroids are collected to the driver after each round (k×dim
    * doubles — broadcast-scale metadata), truncating plan lineage so
    * `iters` bounds plan depth, not plan size. At 100 TB, train on a
    * deterministic sample (e.g. a [[graft.queries.TextQueries]]-style
    * salted-hash keep) — Lloyd's result only needs representative
    * density, not every row. */
  def ivfTrain(corpus: DataFrame, kCentroids: Int, iters: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val quant = 1048576L // 2^20
    var cent: DataFrame = corpus.filter(col("vec_id") < kCentroids)
      .select(col("vec_id").cast("int").as("label"),
        transform(col("embedding"), x => x.cast("double")).as("cvec"))
    for (_ <- 1 to iters) {
      val assigned = assignToCentroid(corpus, cent)
      val dims = assigned
        .select(col("label"), posexplode(col("embedding")).as(Seq("i", "v")))
      val next = dims.groupBy(col("label"), col("i"))
        .agg((sum(floor(col("v").cast("double") * quant).cast("long"))
          .cast("double") / count(lit(1))).as("c"))
        .groupBy(col("label"))
        .agg(transform(sort_array(collect_list(struct(col("i"), col("c")))),
          x => x.getField("c")).as("cvec"))
      cent = next.as[(Int, Seq[Double])].collect().sortBy(_._1)
        .toSeq.toDF("label", "cvec")
    }
    cent
  }

  /** k-means||-style scalable seeding (Bahmani, Moseley, Vassilvitskii,
    * Vattani, Kumar — "Scalable k-means++", VLDB 2012), in its
    * deterministic hard-selection form: instead of sampling each point
    * with probability ∝ its distance-to-center cost, each of `rounds`
    * passes ADDS the `perRound` corpus points farthest from the current
    * center set (min cosine to any center — the batch generalization of
    * Gonzalez's farthest-point traversal, which k-means||'s oversampling
    * approximates in expectation). Deterministic ⇒ oracle-verifiable:
    * the seed is the lowest vec_id, per-round selection is the total
    * order (nearest-cos ASC, vec_id ASC), and every score is plain IEEE
    * dot/norm arithmetic both engines round identically. A center's own
    * cosine to itself is 1, so existing centers sort last and are never
    * re-picked — no explicit exclusion join needed.
    *
    * Scale shape — the reason k-means|| exists: k-means++ is k
    * SEQUENTIAL corpus scans (one per center), unusable at 1B vectors;
    * this is `rounds` scans picking `perRound` centers each. Per round:
    * centers are a ≤(1+rounds·perRound)-vector broadcast, the
    * per-vector nearest-cos is a partial-aggregable max (corpus shuffles
    * once, map-side-combined), the pick is a TakeOrdered heap (no global
    * sort), and the round's collect is center-count metadata that
    * truncates lineage exactly like [[ivfTrain]].
    *
    * @return (round int, vec_id, cvec array<double>, far_score double) —
    *         far_score is the vector's nearest-center cosine at the
    *         moment it was selected (1.0 for the seed). */
  def kmeansParallelInit(corpus: DataFrame, perRound: Int, rounds: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val seed = corpus.orderBy(col("vec_id").asc).limit(1)
      .select(lit(0).as("round"), col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("cvec"),
        lit(1.0).as("far_score"))
    var centers = seed.as[(Int, Long, Seq[Double], Double)].collect().toSeq
    for (r <- 1 to rounds) {
      val cent = centers.toDF("round", "c_id", "cvec", "fs")
        .select(col("c_id"), col("cvec"))
      val far = corpus.select(col("vec_id"), col("embedding"))
        .crossJoin(broadcast(cent))
        .withColumn("cos", cosineAny(col("embedding"), col("cvec")))
        .groupBy(col("vec_id"), col("embedding"))
        .agg(max(col("cos")).as("near_cos"))
        .orderBy(col("near_cos").asc, col("vec_id").asc)
        .limit(perRound)
        .select(lit(r).as("round"), col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("cvec"),
          col("near_cos").as("far_score"))
      centers = centers ++ far.as[(Int, Long, Seq[Double], Double)].collect().toSeq
    }
    centers.toDF("round", "vec_id", "cvec", "far_score")
  }

  /** Argmax-cosine centroid assignment: `(vec_id, embedding, label)`. */
  private def assignToCentroid(vectors: DataFrame, cent: DataFrame): DataFrame =
    assignScored(vectors, cent)
      .select(col("vec_id"), col("embedding"), col("label"))

  /** [[assignToCentroid]] keeping the winning cosine as `score`.
    *
    * The argmax is a partial-aggregable `max(struct(score, −label))` —
    * identical winner to a `row_number` over (score desc, label asc)
    * (ties impossible beyond score: labels are distinct per vector), but
    * the map side collapses the k centroid rows per vector BEFORE the
    * shuffle, so the exchange carries the corpus once instead of k× and
    * needs no per-vector sort. At 1B vectors × k=1024 centroids that is
    * the difference between shuffling the corpus and shuffling a
    * thousand corpora. */
  private def assignScored(vectors: DataFrame, cent: DataFrame): DataFrame =
    vectors.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(cent))
      .withColumn("score", cosineAny(col("embedding"), col("cvec")))
      .groupBy(col("vec_id"), col("embedding"))
      .agg(max(struct(col("score"), (-col("label")).as("nl"))).as("best"))
      .select(col("vec_id"), col("embedding"),
        (-col("best.nl")).cast("int").as("label"),
        col("best.score").as("score"))

  /** Per-cluster quality diagnostics over trained centroids — the
    * monitoring face of semantic curation (vs18's sampler and SemDeDup's
    * pruning both assume clusters are tight; this is the query that
    * checks). For each centroid: member count and the min / max /
    * mean cosine of members to their assigned centroid.
    *
    * The mean is a QUANTIZED mean (scores floored to 2⁻²⁰ before
    * summation): floating-point sums are order-dependent, and a
    * per-cluster sum at corpus scale visits members in partition order —
    * quantizing makes the sum an exact integer (decimal(38,0), overflow-
    * free at any corpus size) and the mean deterministic on any engine
    * and any partitioning, the same trick [[ivfTrain]] uses for centroid
    * means. Scale shape: one broadcast of k centroids, one corpus-keyed
    * window for the argmax, one partial agg per label. */
  def clusterStats(corpus: DataFrame, cent: DataFrame): DataFrame = {
    val quant = 1048576L // 2^20
    assignScored(corpus, cent)
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_members"),
        min(col("score")).as("min_cos"),
        max(col("score")).as("max_cos"),
        // Accumulate in decimal: a long accumulator of 2^20-scaled
        // summands wraps at ~8.8e12 members; decimal(38,0) never does.
        (sum(floor(col("score") * quant).cast("decimal(38,0)"))
          .cast("double")
          / (lit(quant.toDouble) * count(lit(1)).cast("double")))
          .as("mean_cos"))
  }

  /** IVF search against TRAINED centroids ([[ivfTrain]]): the corpus is
    * assigned once to its final centroid (at scale: one shuffle on the
    * assigned label, amortized across queries), each query probes its
    * `nprobe` nearest centroids, candidates meet in an equi-join on the
    * label — same scale shape as [[ivfTopK]], but with recall that holds
    * on data whose label column carries no geometry. */
  /** Top-`nprobe` centroid labels per query by cosine (ties to the
    * lower label): `(query_id, qv, probe_label)` — the probe-assignment
    * step shared by [[ivfSearch]] and [[ivfPqTopK]]. */
  private def probeAssignments(queries: DataFrame, cent: DataFrame,
                               nprobe: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val wAssign = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("label").asc)
    q.crossJoin(broadcast(cent))
      .withColumn("score", cosineAny(col("qv"), col("cvec")))
      .withColumn("arnk", row_number().over(wAssign))
      .filter(col("arnk") <= nprobe)
      .select(col("query_id"), col("qv"), norm(col("qv")).as("qn"),
        col("label").as("probe_label"))
  }

  /** Exact-cosine rescore of a pass-1 shortlist `(query_id, qv,
    * neighbor_id)` against the full-precision corpus, final top-k —
    * the pass-2 tail shared by [[sq8TopK]], [[pqTopK]] and
    * [[ivfPqTopK]]. */
  private def rescoreTopK(cand: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"),
      norm(col("embedding")).as("cn"))
    val rescored = cand.join(c, Seq("neighbor_id"))
      .withColumn("cos", dotProduct(col("qv"), col("cv")) / (norm(col("qv")) * col("cn")))
    val w2 = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    rescored.withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
  }

  def ivfSearch(queries: DataFrame, corpus: DataFrame, cent: DataFrame,
                k: Int, nprobe: Int = 1): DataFrame =
    ivfSearchIndexed(queries, ivfIndex(corpus, cent), cent, k, nprobe)

  /** Materialize the IVF postings index for a corpus against trained
    * centroids: `(vec_id, embedding, label)`. Persist this beside the
    * centroids and ANN serving needs no training or assignment pass —
    * and INCREMENTAL ingest becomes assignment of just the new batch
    * against the SAME centroids, unioned onto the stored postings
    * (vs25): candidate generation stays label-keyed, so the append
    * costs O(batch), never a retrain or an O(corpus) re-index. */
  def ivfIndex(corpus: DataFrame, cent: DataFrame): DataFrame =
    assignToCentroid(corpus, cent)

  /** IVF search over a PREBUILT postings index ([[ivfIndex]] output —
    * freshly computed, loaded from storage, or a stored base unioned
    * with an incremental batch). Same plan tail as [[ivfSearch]]: probe
    * assignments broadcast, candidates meet the postings in a label
    * equi-join, per-query top-k by exact cosine. */
  def ivfSearchIndexed(queries: DataFrame, index: DataFrame, cent: DataFrame,
                       k: Int, nprobe: Int = 1): DataFrame = {
    val indexed = index
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"),
        norm(col("embedding")).as("cn"), col("label").as("probe_label"))
    val assigned = probeAssignments(queries, cent, nprobe)
    val cand = indexed.join(broadcast(assigned), Seq("probe_label"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dotProduct(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("probe_label"), col("neighbor_id"),
        col("rank"), col("cos"))
  }

  /** Train + search in one call. */
  def ivfTrainedTopK(queries: DataFrame, corpus: DataFrame, kCentroids: Int,
                     iters: Int, k: Int, nprobe: Int = 1): DataFrame =
    ivfSearch(queries, corpus, ivfTrain(corpus, kCentroids, iters), k, nprobe)

  /** Scalar-quantized (SQ8) ANN: the memory-compression search path for
    * corpora whose float32 embeddings don't fit the page cache — 4×
    * smaller vectors scanned in pass 1, full precision touched only for
    * the shortlist.
    *
    *   1. per-dimension min/max over the corpus (one agg; broadcast);
    *   2. each corpus vector quantized to 8-bit codes
    *      `floor((v-min)/(max-min)·255)` and DEQUANTIZED to the bucket
    *      lower edge — all order-independent arithmetic, so the codes
    *      are oracle-verifiable (a constant dimension dequantizes to
    *      itself);
    *   3. pass 1 ranks by approximate dot(query, dequantized) and keeps
    *      `k·overfetch` candidates per query;
    *   4. pass 2 re-joins the shortlist to the full-precision corpus by
    *      id and rescores exact cosine for the final top-k.
    *
    * At 100 TB the quantized table is what pass 1 scans (store it as its
    * own column/file family); the full-precision re-join touches
    * `k·overfetch` rows per query. Recall loss only occurs when the
    * quantization error reorders candidates across the overfetch
    * boundary — the spec pins recall vs brute force on the fixture. */
  def sq8TopK(queries: DataFrame, corpus: DataFrame, k: Int,
              overfetch: Int = 4): DataFrame =
    sq8TopKWithStats(queries, corpus, sq8Stats(corpus), k, overfetch)

  /** The SQ8 "codebook": per-dimension `(i, mn, mx)` quantization stats
    * — dimensionality-sized metadata that parquet round-trips
    * bit-exactly, so the artifact lifecycle is train-once (one corpus
    * agg), persist, and quantize every later scan/ingest against the
    * STORED ranges ([[sq8TopKWithStats]]). Re-deriving stats per query
    * would also re-quantize the whole corpus whenever data drifts the
    * min/max — the stored form is what makes the codes table stable. */
  def sq8Stats(corpus: DataFrame): DataFrame =
    corpus
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "v")))
      .select(col("i"), col("v").cast("double").as("v"))
      .groupBy(col("i"))
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))

  /** [[sq8TopK]] against PRECOMPUTED quantization stats (typically
    * reloaded from parquet — the [[sq8Stats]] artifact). */
  def sq8TopKWithStats(queries: DataFrame, corpus: DataFrame, stats: DataFrame,
                       k: Int, overfetch: Int = 4): DataFrame = {
    val dims = corpus
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "v")))
      .select(col("vec_id"), col("i"), col("v").cast("double").as("v"))
    val st = stats.select(col("i"), col("mn"), col("mx"))
    val dq = dims.join(broadcast(st), Seq("i"))
      .withColumn("d", when(col("mx") === col("mn"), col("mn"))
        .otherwise(col("mn") + least(lit(255.0), greatest(lit(0.0),
          floor((col("v") - col("mn")) / (col("mx") - col("mn")) * 255)))
          * (col("mx") - col("mn")) / 255))
      .groupBy(col("vec_id"))
      .agg(transform(sort_array(collect_list(struct(col("i"), col("d")))),
        x => x.getField("d")).as("dqv"))
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val approx = dq.select(col("vec_id").as("neighbor_id"), col("dqv"))
      .join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("ascore", dotProductAny(col("qv"), col("dqv")))
    val w1 = Window.partitionBy(col("query_id"))
      .orderBy(col("ascore").desc, col("neighbor_id").asc)
    val cand = approx.withColumn("arnk", row_number().over(w1))
      .filter(col("arnk") <= k * overfetch)
      .select(col("query_id"), col("qv"), col("neighbor_id"))
    rescoreTopK(cand, corpus, k)
  }

  /** Product-quantized (PQ) ANN — the compression tier below SQ8: the
    * embedding is split into `numSub` sub-vectors, each encoded as the id
    * of its nearest codeword in a per-subspace codebook, so a vector
    * stores as `numSub` small ints (e.g. 64 float32 dims → 8 bytes, 32×)
    * and pass 1 scores against codebook reconstructions.
    *
    * Deterministic end-to-end, so the whole index is oracle-verifiable:
    *   - codebook: the sub-vectors of the `kCodes` lowest-`vec_id`
    *     corpus rows (a deterministic sample — at scale a trained
    *     codebook slots in the same way [[ivfTrain]] does for IVF);
    *   - encode: argmin L2 to a codeword, computed as an index-ordered
    *     fold of exact double ops (ties to the lower code id);
    *   - search: pass 1 ranks dot(query, reconstruction) and keeps
    *     `k·overfetch` per query; pass 2 rescores the shortlist against
    *     the full-precision corpus — same overfetch-then-rescore shape
    *     as [[sq8TopK]].
    *
    * At 100 TB: the codebook is `numSub·kCodes` sub-vectors (broadcast
    * metadata), encoding is one corpus scan against it, and pass 1 scans
    * the codes table (32× smaller than the raw embeddings) — the
    * full-precision table is touched only for `k·overfetch` rows per
    * query. */
  def pqTopK(queries: DataFrame, corpus: DataFrame, numSub: Int, kCodes: Int,
             k: Int, overfetch: Int = 4): DataFrame =
    pqTopKWithCodebook(queries, corpus,
      pqCodebook(corpus, numSub, kCodes), numSub, k, overfetch)

  /** The PQ codebook as a standalone artifact: `(code, m, cb)` — one
    * row per (subspace, codeword) with the codeword sub-vector,
    * `numSub·kCodes` rows of broadcast-sized metadata that parquet
    * round-trips bit-exactly. Train once, persist, and encode every
    * later corpus batch against the STORED codewords
    * ([[pqTopKWithCodebook]]) — re-deriving the codebook per call would
    * silently re-encode the entire codes table whenever the corpus
    * sample shifts. */
  def pqCodebook(corpus: DataFrame, numSub: Int, kCodes: Int): DataFrame =
    subVectors(corpus.filter(col("vec_id") < kCodes), numSub)
      .select(col("vec_id").cast("int").as("code"), col("m"), col("sv").as("cb"))

  /** [[pqTopK]] against a PRECOMPUTED codebook (typically reloaded from
    * parquet — the [[pqCodebook]] artifact). `numSub` must match the
    * codebook's build (the subspace split is only comparable under the
    * same partitioning). */
  def pqTopKWithCodebook(queries: DataFrame, corpus: DataFrame,
                         codebook: DataFrame, numSub: Int,
                         k: Int, overfetch: Int = 4): DataFrame = {
    val recon = pqReconstructionsWith(corpus, codebook, numSub)
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val approx = recon.select(col("vec_id").as("neighbor_id"), col("rv"))
      .join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("ascore", dotProductAny(col("qv"), col("rv")))
    val w1 = Window.partitionBy(col("query_id"))
      .orderBy(col("ascore").desc, col("neighbor_id").asc)
    val cand = approx.withColumn("arnk", row_number().over(w1))
      .filter(col("arnk") <= k * overfetch)
      .select(col("query_id"), col("qv"), col("neighbor_id"))
    rescoreTopK(cand, corpus, k)
  }

  /** PQ-encode the corpus and return codebook reconstructions
    * `(vec_id, rv)`: sub-vectors of the `kCodes` lowest-id rows form
    * the per-subspace codebook, each corpus sub-vector maps to its
    * argmin-L2 codeword (index-ordered exact double folds, ties to the
    * lower code id), and `rv` is the concatenated codeword vector — the
    * deterministic encode shared by [[pqTopK]] and [[ivfPqTopK]]. */
  /** `(vec_id, m, sv)` — each corpus vector split into `numSub`
    * double-cast sub-vectors (the shared PQ decomposition). */
  private def subVectors(df: DataFrame, numSub: Int): DataFrame = {
    val subDim = (size(col("embedding")) / numSub).cast("int")
    df.select(col("vec_id"), col("embedding"))
      .withColumn("m", explode(sequence(lit(0), lit(numSub - 1))))
      .select(col("vec_id"), col("m"), transform(
        slice(col("embedding"), col("m") * subDim + 1, subDim),
        x => x.cast("double")).as("sv"))
  }

  private def pqReconstructions(corpus: DataFrame, numSub: Int,
                                kCodes: Int): DataFrame =
    pqReconstructionsWith(corpus, pqCodebook(corpus, numSub, kCodes), numSub)

  /** [[pqReconstructions]] against a supplied codebook. */
  private def pqReconstructionsWith(corpus: DataFrame, codebook: DataFrame,
                                    numSub: Int): DataFrame = {
    val cb = codebook.select(col("code"), col("m"), col("cb"))
    val enc = subVectors(corpus, numSub)
      .join(broadcast(cb), Seq("m"))
      .withColumn("l2", aggregate(
        zip_with(col("sv"), col("cb"), (x, y) => (x - y) * (x - y)),
        lit(0.0), (a, x) => a + x))
    val wEnc = Window.partitionBy(col("vec_id"), col("m"))
      .orderBy(col("l2").asc, col("code").asc)
    val codes = enc.withColumn("crnk", row_number().over(wEnc))
      .filter(col("crnk") === 1)
      .select(col("vec_id"), col("m"), col("code"))
    codes.join(broadcast(cb), Seq("m", "code"))
      .groupBy(col("vec_id"))
      .agg(flatten(transform(
        sort_array(collect_list(struct(col("m"), col("cb")))),
        x => x.getField("cb"))).as("rv"))
  }

  /** IVF-PQ — the canonical large-index composition (the FAISS
    * `IVFx,PQy` shape): a TRAINED coarse quantizer partitions the
    * corpus ([[ivfTrain]]), queries probe their `nprobe` nearest
    * partitions, pass 1 scores only the probed partitions' PQ
    * reconstructions ([[pqReconstructions]]) and keeps `k·overfetch`
    * candidates, pass 2 rescores the shortlist exact — so the scan cost
    * is (nprobe/kCentroids) of the CODES table, and full-precision
    * vectors are touched for `k·overfetch` rows per query only.
    *
    * Deterministic end-to-end (quantized-exact Lloyd means, exact
    * double folds, id tie-breaks), so the whole composed index is
    * oracle-verifiable. Each corpus vector lives in exactly one
    * partition, so multi-probe candidates never duplicate.
    */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, kCentroids: Int,
                iters: Int, nprobe: Int, numSub: Int, kCodes: Int,
                k: Int, overfetch: Int = 4): DataFrame = {
    val cent = ivfTrain(corpus, kCentroids, iters)
    val indexed = assignToCentroid(corpus, cent)
      .select(col("vec_id").as("neighbor_id"), col("label").as("probe_label"))
    val probes = probeAssignments(queries, cent, nprobe)
    val recon = pqReconstructions(corpus, numSub, kCodes)
      .select(col("vec_id").as("neighbor_id"), col("rv"))
    val approx = indexed.join(recon, Seq("neighbor_id"))
      .join(broadcast(probes), Seq("probe_label"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("ascore", dotProductAny(col("qv"), col("rv")))
    val w1 = Window.partitionBy(col("query_id"))
      .orderBy(col("ascore").desc, col("neighbor_id").asc)
    val cand = approx.withColumn("arnk", row_number().over(w1))
      .filter(col("arnk") <= k * overfetch)
      .select(col("query_id"), col("qv"), col("neighbor_id"))
    rescoreTopK(cand, corpus, k)
  }

  /** Maximal-marginal-relevance diversified top-k (Carbonell &
    * Goldstein 1998) — the re-ranking staple of retrieval systems:
    * greedily pick `k` results from each query's `poolSize`-candidate
    * relevance pool, each step maximizing
    * `λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s)` (ties to the lower
    * neighbor id), so near-duplicate results are pushed out in favor of
    * coverage.
    *
    * Scale shape: the greedy selection is inherently sequential in k,
    * so k is unrolled as fixed plan steps — each step joins the pool
    * (poolSize rows per query) against the per-query single row chosen
    * by each earlier step (broadcast-scale), takes the max pairwise
    * similarity with `greatest`, and picks the argmax with one window
    * over the pool. The corpus is touched only by the initial
    * [[bruteForceTopK]] (or any ANN pool builder swapped in front);
    * everything after is O(queries × poolSize × k). All arithmetic is
    * correctly-rounded IEEE ops over in-order cosine folds, so scores
    * are bit-identical cross-engine and the selection is oracle-exact.
    *
    * Short-pool behavior: `require(poolSize >= k)` bounds the REQUESTED
    * pool, not its realized depth — a query whose actual pool runs out
    * before step k (corpus smaller than poolSize, or every remaining
    * candidate already selected) stops contributing: each later step's
    * inner join against that query's exhausted candidate set emits
    * nothing, so the query yields FEWER than k steps with no error or
    * null padding. Callers needing exactly-k must check
    * `count(*) per query_id == k` downstream (or size the corpus ≥
    * poolSize ≥ k up front, as vs13 does).
    *
    * @return (query_id, step ∈ [1,k], neighbor_id, rel) — rel is the
    *         query-cosine of the picked result; ≤ k rows per query
    *         (see short-pool behavior above)
    */
  def mmrTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              poolSize: Int, lambda: Double): DataFrame = {
    require(k >= 1 && poolSize >= k, s"need 1 <= k <= poolSize, got $k/$poolSize")
    // Each step references the pool AND every earlier step, so lazy
    // plans here would repeat the componentLabels failure mode: the
    // analyzed tree doubles per step and a normal retrieval k (20+)
    // OOMs the driver on analysis alone. The pool and each step are
    // therefore eagerly local-checkpointed — both are tiny (poolSize,
    // then ONE row per query), so the blocks are query-set-scale
    // metadata; an executor loss costs a job retry, which is the right
    // trade for an interactive re-rank step.
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"),
      norm(col("embedding")).as("cn"))
    val pool = bruteForceTopK(queries, corpus, poolSize)
      .join(c, Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("cos").as("rel"),
        col("cv"), col("cn"), col("rank"))
      .localCheckpoint(true)
    val first = pool.filter(col("rank") === 1)
      .select(col("query_id"), lit(1).as("step"), col("neighbor_id"),
        col("rel"), col("cv"), col("cn"))
      .localCheckpoint(true)
    var selected = List(first)
    for (t <- 2 to k) {
      var cand = pool
      var msim: org.apache.spark.sql.Column = lit(-2.0)
      var excluded: org.apache.spark.sql.Column = lit(true)
      selected.zipWithIndex.foreach { case (s, i) =>
        val si = s.select(col("query_id"), col("neighbor_id").as(s"sid$i"),
          col("cv").as(s"scv$i"), col("cn").as(s"svn$i"))
        cand = cand.join(si, Seq("query_id"))
        msim = greatest(msim, dotProduct(col("cv"), col(s"scv$i"))
          / (col("cn") * col(s"svn$i")))
        excluded = excluded && col("neighbor_id") =!= col(s"sid$i")
      }
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("score").desc, col("neighbor_id").asc)
      val next = cand.filter(excluded)
        .withColumn("score",
          lit(lambda) * col("rel") - lit(1.0 - lambda) * msim)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("query_id"), lit(t).as("step"), col("neighbor_id"),
          col("rel"), col("cv"), col("cn"))
        .localCheckpoint(true)
      selected = selected :+ next
    }
    selected.map(_.select(col("query_id"), col("step"), col("neighbor_id"),
        col("rel")))
      .reduce(_.unionByName(_))
  }

  /** Exact maximum-inner-product top-k (MIPS) — retrieval by RAW dot
    * product, the scoring recommendation/retrieval systems use when
    * vector magnitude carries signal (popularity-weighted item
    * embeddings, unnormalized two-tower outputs) and cosine's
    * normalization would erase it. Brute baseline: queries broadcast,
    * corpus scanned once, per-query top-k window over the broadcast
    * product — the same plan family as [[bruteForceTopK]].
    *
    * Scale path: MIPS reduces to cosine search via the norm-augmentation
    * transform (Bachrach et al. 2014; Neyshabur & Srebro 2015) — append
    * `sqrt(M² − ‖x‖²)` to each corpus vector (M = max corpus norm) and
    * `0` to each query; augmented corpus norms are all exactly M, so
    * cosine order on the augmented space IS inner-product order on the
    * original, and every cosine-path index (sign-LSH buckets, IVF)
    * serves MIPS unchanged. MipsSpec pins the rank equivalence on the
    * fixture; [[mipsBucketedTopK]] is the bucketed form. */
  def mipsTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("dot", dotProduct(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dot").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("dot"))
  }

  /** Bucketed MIPS: sign-bucket candidates ([[bucketedTopK]]'s
    * equi-join — never all-pairs), exact-dot rescore, per-query top-k.
    * Recall trades with `bits` exactly as in the cosine path. */
  def mipsBucketedTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                       bits: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"),
      signBucket(col("embedding"), bits).as("bucket"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"),
      signBucket(col("embedding"), bits).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("dot", dotProduct(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dot").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("bucket"), col("neighbor_id"),
        col("rank"), col("dot"))
  }

  /** The MIPS→cosine norm augmentation (see [[mipsTopK]]): corpus rows
    * gain a `sqrt(M² − ‖x‖²)` tail element (double precision — the
    * equal-norm identity must hold exactly enough to preserve order),
    * queries a literal 0. Returns (vec_id, aug) with `aug` an
    * array<double>. The one collect is the scalar M — metadata. */
  def mipsAugment(corpus: DataFrame, queries: DataFrame)
      : (DataFrame, DataFrame) = {
    val n2 = dotProduct(col("embedding"), col("embedding"))
    val m2Row = corpus.agg(max(n2)).head()
    require(!m2Row.isNullAt(0),
      "mipsAugment: corpus has no non-null embeddings — the norm bound " +
        "M² is undefined (empty or all-null embedding column)")
    val m2 = m2Row.getDouble(0)
    val toDouble = transform(col("embedding"), x => x.cast("double"))
    val c = corpus.select(col("vec_id"),
      concat(toDouble, array(sqrt(greatest(lit(m2) - n2, lit(0.0))))).as("aug"))
    val q = queries.select(col("vec_id"),
      concat(toDouble, array(lit(0.0))).as("aug"))
    (c, q)
  }

  /** All corpus pairs with cosine ≥ threshold, via the bucket equi-join
    * (embedding-cosine near-dup detection). */
  def cosineNearDups(corpus: DataFrame, threshold: Double, bits: Int): DataFrame = {
    val c = corpus.select(col("vec_id"), col("embedding"),
      norm(col("embedding")).as("n"),
      signBucket(col("embedding"), bits).as("bucket"))
    c.as("a").join(c.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", dotProduct(col("a.embedding"), col("b.embedding"))
        / (col("a.n") * col("b.n")))
      .filter(col("cos") >= threshold)
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"), col("cos"))
  }
}
