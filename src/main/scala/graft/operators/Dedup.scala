package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for the training-data pipeline surface
  * (SURVEY.md §2.3 north-star additions): exact, MinHash+LSH banded,
  * and SimHash fingerprinting.
  *
  * Scale design: exact dedup is one hash-shuffle on the dedup key (with
  * map-side partial aggregation); MinHash LSH is signature computation
  * (narrow, codegen) → explode to `bands` rows per doc → **equi-join on
  * (band, bucket)** → exact-Jaccard verification only on candidate pairs.
  * No cross join anywhere, so the plan survives 100 TB: the only shuffles
  * key on band buckets, and bucket skew (a degenerate band holding many
  * docs) is handled by AQE skew-join splitting.
  */
object Dedup {

  /** Exact dedup groups: canonical (minimum) id + multiplicity per
    * distinct key. */
  def exactGroups(df: DataFrame, keyCol: String, idCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))
      .select(col("keeper_id"), col("n_copies"))

  /** Shared LSH build: `(hashed, banded)` where `hashed` is
    * `(id, sorted distinct shingle hashes)` and `banded` is one row per
    * (doc, band) with the band's bucket hash — the join key is
    * (band, bucket), a plain shuffled equi-join at any scale. The
    * banded form IS the persistable index an incremental pipeline
    * stores ([[incrementalNearDups]]).
    *
    * The lazy local checkpoints are deliberate materialization barriers.
    * Catalyst collapses adjacent projections, and interpreted higher-order
    * expressions get no common-subexpression elimination — so without a
    * barrier the shingle-hash expression is inlined and recomputed
    * inside all k permutation lambdas, and the signature inside all
    * `bands` band hashes: O(k × |shingles| × |shingle|) per doc instead
    * of O(k × |shingles| + |shingles| × |shingle|). A checkpoint is
    * strictly stronger than the former repartition barrier: the heavy
    * projection is computed ONCE for every consumer (the repartition
    * form re-ran it per consumer whenever pushed filters differed
    * between their exchanges), and the materialized partitioning is
    * immune to byte-based AQE coalescing, which serialized these
    * CPU-dense-but-byte-light stages onto one core. The heavy compute
    * itself sits ABOVE an explicit cluster-sized exchange
    * ([[Compute.parallelism]]): a single-split corpus file otherwise
    * hashes every document in one scan task.
    * Hash sets are sorted ONCE here (behind the barrier): the
    * verification joins evaluate jaccard per candidate pair, and the
    * sorted form makes that a merge with no per-pair sort. The
    * signature is order-independent (min over elements). */
  private def lshIndex(df: DataFrame, idCol: String, textCol: String,
                       shingleN: Int, k: Int, bands: Int): (DataFrame, DataFrame) = {
    val r = k / bands
    val hashed = Compute.barrier(
      df.select(col(idCol).as("id"), col(textCol).as("__text"))
        .repartition(Compute.parallelism(df), col("id"))
        .select(col("id"),
          sort_array(shingleHashes(col("__text"), shingleN)).as("hashes")),
      "lsh-hashed")
    val sh = Compute.barrier(
      hashed.withColumn("sig", minhashSignature(col("hashes"), k)),
      "lsh-sig")
    val banded = sh.select(col("id"),
      explode(transform(sequence(lit(0), lit(bands - 1)), b =>
        struct(b.as("band"), bandHash(col("sig"), b, r).as("bucket")))).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    (hashed, banded)
  }

  /** Incremental near-dup detection — the continuous-ingest shape: flag
    * each NEW document whose exact Jaccard to any HISTORY document meets
    * the threshold, without ever pairing history against itself. Same
    * LSH machinery as [[minhashNearDups]] (identical signatures, so the
    * recall guarantees carry over), but the band join is ASYMMETRIC
    * (history bands × batch bands): candidate count scales with the
    * increment, not the corpus. At 100 TB the history's banded/hashed
    * form is the persisted index, built once and amortized across
    * increments; each increment signatures only itself and equi-joins
    * into the index.
    *
    * @return (id_new, id_hist, jaccard), one row per verified cross pair
    */
  def incrementalNearDups(history: DataFrame, batch: DataFrame,
                          idCol: String, textCol: String,
                          shingleN: Int = 3, k: Int = 64, bands: Int = 16,
                          threshold: Double = 0.8): DataFrame = {
    require(k % bands == 0, "k must be divisible by bands")
    val (hHashed, hBanded) = lshIndex(history, idCol, textCol, shingleN, k, bands)
    incrementalNearDupsIndexed(hHashed, hBanded, batch, idCol, textCol,
      shingleN, k, bands, threshold)
  }

  /** The history half of [[incrementalNearDups]]'s LSH machinery as a
    * PERSISTABLE index: `(hashed, banded)` DataFrames, both plain
    * columnar tables (id + sorted hashes; id + band + bucket) that
    * round-trip parquet losslessly. Build once over the corpus, write
    * both, and every subsequent increment — batch or micro-batch — joins
    * into the stored form via [[incrementalNearDupsIndexed]] at O(batch)
    * cost. Parameters must match between build and probe (the shingle/
    * signature spaces are only comparable under identical n, k, bands). */
  def buildLshIndex(df: DataFrame, idCol: String, textCol: String,
                    shingleN: Int = 3, k: Int = 64, bands: Int = 16)
      : (DataFrame, DataFrame) = {
    require(k % bands == 0, "k must be divisible by bands")
    lshIndex(df, idCol, textCol, shingleN, k, bands)
  }

  /** [[incrementalNearDups]] against a PREBUILT history index (the
    * [[buildLshIndex]] pair, typically reloaded from parquet) — the form
    * a streaming ingest runs per micro-batch: signature the increment,
    * asymmetric band join into the stored index, verify exact Jaccard.
    * Never touches history text and never pairs history with itself. */
  def incrementalNearDupsIndexed(hHashed: DataFrame, hBanded: DataFrame,
                                 batch: DataFrame,
                                 idCol: String, textCol: String,
                                 shingleN: Int = 3, k: Int = 64,
                                 bands: Int = 16,
                                 threshold: Double = 0.8): DataFrame = {
    require(k % bands == 0, "k must be divisible by bands")
    val (bHashed, bBanded) = lshIndex(batch, idCol, textCol, shingleN, k, bands)
    val cand = bBanded.as("n")
      .join(hBanded.as("h"),
        col("n.band") === col("h.band") && col("n.bucket") === col("h.bucket"))
      .select(col("n.id").as("id_new"), col("h.id").as("id_hist"))
      .dropDuplicates("id_new", "id_hist")
    cand
      .join(bHashed.select(col("id").as("id_new"), col("hashes").as("h_n")), "id_new")
      .join(hHashed.select(col("id").as("id_hist"), col("hashes").as("h_h")), "id_hist")
      .withColumn("jaccard", jaccardSorted(col("h_n"), col("h_h")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_new"), col("id_hist"), col("jaccard"))
  }

  /** MinHash-LSH near-duplicate pairs, exact-verified.
    *
    * @param df        documents
    * @param idCol     unique id column name
    * @param textCol   text column name
    * @param shingleN  tokens per shingle
    * @param k         signature length (minhash permutations)
    * @param bands     LSH bands (rows per band = k/bands)
    * @param threshold exact-Jaccard cutoff applied to candidates
    * @return (id_a, id_b, jaccard) with id_a < id_b
    */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      shingleN: Int = 3, k: Int = 64, bands: Int = 16,
                      threshold: Double = 0.8): DataFrame = {
    require(k % bands == 0, "k must be divisible by bands")
    val (hashed, banded) = lshIndex(df, idCol, textCol, shingleN, k, bands)
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    // Verify candidates with exact Jaccard: re-attach shingle sets by id
    // (two broadcast-or-shuffle hash joins on id, not carried through the
    // LSH explode).
    val sets = hashed.select(col("id"), col("hashes"))
    cand
      .join(sets.withColumnRenamed("id", "id_a").withColumnRenamed("hashes", "h_a"), "id_a")
      .join(sets.withColumnRenamed("id", "id_b").withColumnRenamed("hashes", "h_b"), "id_b")
      .withColumn("jaccard", jaccardSorted(col("h_a"), col("h_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Exact all-pairs n-gram Jaccard above a threshold — the oracle-exact
    * form. Quadratic in documents; use [[minhashNearDups]] or
    * [[blockedJaccardPairs]] at scale. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        shingleN: Int = 3, threshold: Double = 0.5): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      sort_array(shingleHashes(col(textCol), shingleN)).as("hashes"))
    sh.as("a").join(sh.as("b"), col("a.id") < col("b.id"))
      .withColumn("jaccard", jaccardSorted(col("a.hashes"), col("b.hashes")))
      .filter(col("jaccard") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("jaccard"))
  }

  /** Length-blocked n-gram Jaccard pairs: candidates restricted to
    * documents whose `lenCol` falls in the same or adjacent
    * `bucketWidth`-sized bucket (guaranteeing every pair within
    * `bucketWidth` length difference is considered — high-Jaccard pairs
    * are necessarily close in length). Left side explodes to 3 bucket
    * keys, right keeps 1, so each pair matches exactly once and the join
    * is a plain shuffled equi-join — the quadratic [[ngramJaccardPairs]]
    * made scale-safe with an oracle-expressible predicate. */
  def blockedJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                          lenCol: String, shingleN: Int = 3,
                          threshold: Double = 0.5, bucketWidth: Int = 32): DataFrame =
    blockedPairs(df, idCol, textCol, lenCol, shingleN, bucketWidth,
      blockSpan = 1, measure = jaccardSorted, outCol = "jaccard",
      threshold = threshold)

  /** Shared skeleton of the length-blocked pair families: materialization
    * barrier (without it the shingle-hash expression is collapsed into
    * both join sides' projections and recomputed — see minhashNearDups),
    * left side exploded to `2·blockSpan+1` bucket keys so each pair
    * matches exactly once in a plain shuffled equi-join, then the
    * `measure` scored once per surviving pair. */
  private def blockedPairs(df: DataFrame, idCol: String, textCol: String,
                           lenCol: String, shingleN: Int, bucketWidth: Int,
                           blockSpan: Int, measure: (Column, Column) => Column,
                           outCol: String, threshold: Double): DataFrame = {
    val sh = Compute.barrier(
      df.select(col(idCol).as("id"),
          (col(lenCol) / bucketWidth).cast("long").as("bucket"),
          col(textCol).as("__text"))
        .repartition(Compute.parallelism(df), col("id"))
        .select(col("id"), col("bucket"),
          sort_array(shingleHashes(col("__text"), shingleN)).as("hashes")),
      "blocked-hashed")
    val left = sh.select(col("id").as("id_a"), col("hashes").as("h_a"),
      explode(array((-blockSpan to blockSpan).map(col("bucket") + _): _*)).as("jb"))
    val right = sh.select(col("id").as("id_b"), col("hashes").as("h_b"),
      col("bucket").as("jb"))
    left.join(right, Seq("jb"))
      .filter(col("id_a") < col("id_b"))
      .withColumn(outCol, measure(col("h_a"), col("h_b")))
      .filter(col(outCol) >= threshold)
      .select(col("id_a"), col("id_b"), col(outCol))
  }

  /** Length-blocked CONTAINMENT pairs: |a∩b| / min(|a|,|b|) over the
    * shingle-hash sets — the asymmetric overlap that catches subset
    * duplication (quotes, excerpts, boilerplate wrappers) which Jaccard's
    * union normalization dilutes. Same blocked equi-join and sorted-merge
    * posture as [[blockedJaccardPairs]]; note length blocking bounds the
    * CANDIDATE window, so pairs more than `blockSpan` buckets apart in
    * length are out of scope by declaration — a short quote inside a much
    * longer page needs the LSH path over the shorter side's shingles,
    * not this blocked baseline. */
  def blockedContainmentPairs(df: DataFrame, idCol: String, textCol: String,
                              lenCol: String, shingleN: Int = 3,
                              threshold: Double = 0.8, bucketWidth: Int = 32,
                              blockSpan: Int = 2): DataFrame =
    blockedPairs(df, idCol, textCol, lenCol, shingleN, bucketWidth,
      blockSpan,
      measure = (a, b) =>
        graft.functions.TextFunctions.overlapSorted(a, b).cast("double") /
          least(size(a), size(b)).cast("double"),
      outCol = "containment", threshold = threshold)

  /** The ACTION face of [[dupSpanStats]]: rewrite each document with its
    * duplicated spans REMOVED — a token is dropped iff it is covered by
    * at least one n-token shingle whose total corpus occurrence count
    * (counting multiplicity, so within-document repeats count too —
    * Lee et al. 2022 dedup any repeated span, not just cross-document
    * ones) is ≥ 2. Documents with fewer than n tokens pass through
    * unchanged.
    *
    * Scale shape: positional-shingle explode → one hash-keyed frequency
    * agg (map-side partials) → equi-join + per-doc collect of duplicate
    * START positions (bounded by document length, never corpus size) →
    * one left join back to the corpus → per-row array rewrite in
    * codegen'd higher-order functions. No window over the shingle key.
    *
    * @return (id, n_tokens, n_removed, text_clean) */
  def removeDupSpans(df: DataFrame, idCol: String, textCol: String,
                     shingleN: Int = 3): DataFrame = {
    // Barrier: position-ordered hashes computed once (minhashNearDups
    // pattern), feeding both the frequency agg and the starts collect;
    // hashed above a cluster-sized exchange (single-split corpus would
    // otherwise hash on one core).
    val hp = Compute.barrier(
      df.select(col(idCol).as("id"), col(textCol).as("__text"))
        .repartition(Compute.parallelism(df), col("id"))
        .select(col("id"),
          shingleHashSeq(tokens(col("__text")), shingleN).as("hs")),
      "dupspan-hashed")
    val pos = hp.select(col("id"),
      posexplode(col("hs")).as(Seq("i0", "h")))
    val freq = pos.groupBy(col("h")).agg(count(lit(1)).as("c"))
    val starts = pos.join(freq, Seq("h"))
      .filter(col("c") >= 2)
      .groupBy(col("id"))
      .agg(sort_array(collect_list(col("i0") + 1)).as("st"))
    val covered = flatten(transform(col("st"),
      j => array((0 until shingleN).map(o => j + o): _*)))
    // sequence(1, 0) yields a DESCENDING [1, 0] (inferred step −1), and
    // element_at(t, 0) then throws — so an empty token array needs an
    // explicit empty index list, not the sequence.
    val idxAll = when(size(col("t")) > 0, sequence(lit(1), size(col("t"))))
      .otherwise(array().cast("array<int>"))
    val keptIdx = filter(idxAll, i => !array_contains(col("covered"), i))
    df.select(col(idCol).as("id"), tokens(col(textCol)).as("t"))
      .join(starts, Seq("id"), "left_outer")
      .withColumn("st", coalesce(col("st"), array().cast("array<int>")))
      .withColumn("covered", covered)
      .withColumn("kept", transform(keptIdx, i => element_at(col("t"), i)))
      .select(col("id"), size(col("t")).cast("long").as("n_tokens"),
        (size(col("t")) - size(col("kept"))).cast("long").as("n_removed"),
        array_join(col("kept"), " ").as("text_clean"))
  }

  /** All-pairs containment join WITHOUT length blocking — the scale path
    * for asymmetric (subset/quote) duplication that
    * [[blockedContainmentPairs]] scopes out: a short excerpt inside a
    * much longer page is exactly the pair length-blocking discards.
    *
    * Prefix filtering (the SSJoin/PPJoin family, Chaudhuri et al. 2006 /
    * Xiao et al. 2008): order every document's shingle-hash set by a
    * global (doc-frequency asc, hash) order and keep each document's
    * PREFIX — its `|x| − ⌊τ·|x|⌋ + 1` rarest elements (floor, not ceil:
    * float rounding may only ever LENGTHEN the prefix, so the bound
    * stays lossless). If `|a∩b| ≥ τ·min(|a|,|b|)` then at most
    * `⌈τ·|m|⌉ − 1` elements of the min side `m` lie outside its prefix,
    * so at least one intersection element is IN the prefix — every
    * qualifying pair is found by an equi-join of min-side prefix
    * postings against full postings, and the exact merge-only
    * verification keeps precision at 1. Rare-first ordering is what
    * bounds the join: a boilerplate shingle (huge full posting list)
    * appears in almost no prefixes, so per-hash candidate fan-out stays
    * P(h)·F(h) with P(h) small exactly where F(h) is large.
    *
    * Shuffles are all linear in postings: doc-frequency agg, prefix
    * selection (one per-doc sort of its own postings), the candidate
    * equi-join on the hash, a distinct, and two id-keyed array joins for
    * verification. No quadratic block anywhere.
    *
    * @return (id_a, id_b, containment) with id_a < id_b, containment =
    *         |a∩b| / min(|a|,|b|) ≥ `threshold` */
  def prefixContainmentPairs(df: DataFrame, idCol: String, textCol: String,
                             shingleN: Int = 3,
                             threshold: Double = 0.8): DataFrame =
    prefixFilteredPairs(df, idCol, textCol, shingleN, threshold,
      measure = (a, b) =>
        graft.functions.TextFunctions.overlapSorted(a, b).cast("double") /
          least(size(a), size(b)).cast("double"),
      outCol = "containment")

  /** Exact all-pairs n-gram JACCARD join via the same lossless prefix
    * filter — the unblocked twin of [[blockedJaccardPairs]] and the
    * exact counterpart of [[minhashNearDups]] (LSH trades a bounded miss
    * probability for speed; this trades nothing: `J ≥ τ ⇒ |a∩b| ≥
    * τ·max ≥ τ·min`, so the min-side prefix bound of the containment
    * join covers Jaccard too and recall is exactly 1). */
  def prefixJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                         shingleN: Int = 3,
                         threshold: Double = 0.8): DataFrame =
    prefixFilteredPairs(df, idCol, textCol, shingleN, threshold,
      measure = jaccardSorted(_, _).cast("double"), outCol = "jaccard")

  private def prefixFilteredPairs(df: DataFrame, idCol: String,
                                  textCol: String, shingleN: Int,
                                  threshold: Double,
                                  measure: (Column, Column) => Column,
                                  outCol: String): DataFrame = {
    // Materialization barrier: hash once (minhashNearDups pattern),
    // parallel (heavy projection above a cluster-sized exchange). The
    // checkpoint sits BELOW the non-empty filter: Catalyst pushes
    // filters through RepartitionByExpression, so a filter above the
    // heavy projection would otherwise be substituted-and-pushed to the
    // scan side of the exchange — re-running the whole shingle hash on
    // the (single-split) scan task. Above the checkpoint it evaluates
    // `size` on the materialized arrays instead.
    val hashed = Compute.barrier(
      df.select(col(idCol).as("id"), col(textCol).as("__text"))
        .repartition(Compute.parallelism(df), col("id"))
        .select(col("id"),
          sort_array(shingleHashes(col("__text"), shingleN)).as("hashes")),
      "prefix-hashed")
    val sh = hashed
      .filter(size(col("hashes")) >= 1)
      .select(col("id"), col("hashes"), size(col("hashes")).as("sz"))
    val ex = sh.select(col("id"), col("sz"), explode(col("hashes")).as("h"))
    val dfreq = ex.groupBy(col("h")).agg(count(lit(1)).as("df"))
    // Per-doc prefix in (df asc, h) order: the rarest ⌊(1−τ)·sz⌋+1
    // elements. One per-doc sort of that doc's own postings — bounded by
    // document size, never corpus size.
    val prefLen = (col("sz") - floor(lit(threshold) * col("sz")) + 1)
      .cast("int")
    val pref = ex.join(dfreq, Seq("h"))
      .groupBy(col("id"), col("sz"))
      .agg(sort_array(collect_list(struct(col("df"), col("h")))).as("ord"))
      .select(col("id"), col("sz"),
        explode(transform(slice(col("ord"), lit(1), prefLen),
          p => p("h"))).as("h"))
    // Min-side prefix postings × full postings; each unordered pair
    // generated with the smaller set (ties: smaller id) as the probe, so
    // the lossless-cover guarantee applies and each pair appears once
    // per shared prefix hash — distinct collapses the multiplicity
    // before the (exact) verification join.
    val cand = pref.as("p").join(ex.as("f"), Seq("h"))
      .filter(col("p.sz") < col("f.sz") ||
        (col("p.sz") === col("f.sz") && col("p.id") < col("f.id")))
      .select(least(col("p.id"), col("f.id")).as("id_a"),
        greatest(col("p.id"), col("f.id")).as("id_b"))
      .distinct()
    cand
      .join(sh.select(col("id").as("id_a"), col("hashes").as("h_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("hashes").as("h_b")), Seq("id_b"))
      .withColumn(outCol, measure(col("h_a"), col("h_b")))
      .filter(col(outCol) >= threshold)
      .select(col("id_a"), col("id_b"), col(outCol))
  }

  /** Connected components over a near-dup pair graph: every document
    * labeled with the SMALLEST doc id reachable through near-dup edges —
    * the canonical-representative step of a production dedup pipeline
    * (pairs say "these two match"; clusters say "keep one of these").
    *
    * Iterative min-label propagation WITH POINTER DOUBLING: each round
    * (a) joins labels across edges and keeps the minimum neighbor
    * label, and (b) adopts the label of the current label (the
    * "grandparent" self-join), so label chains halve every round and
    * convergence is O(log diameter) rather than O(diameter) — a chainy
    * similarity graph (loose cosine thresholds produce them) converges
    * in ~a dozen rounds where plain propagation needs one per hop.
    * Each round is two shuffled equi-joins + one aggregation, and the
    * loop stops at fixpoint; the per-round driver check is a single
    * `max(changed)` aggregate over an inline flag — loop control, not
    * data movement.
    *
    * Every `checkpointInterval` rounds the label table is RELIABLY
    * checkpointed (written to the session checkpoint dir and re-read).
    * This is not optional hygiene: each round's plan references the
    * previous round's plan three times (neighbor propagation, the
    * grandparent self-join, and the base), so without truncation the
    * analyzed tree grows exponentially with rounds and a graph needing
    * a few dozen rounds OOMs the driver on
    * analysis alone — the same reason GraphFrames' connectedComponents
    * defaults to checkpointInterval=2 (ours bounds plan depth at 3 with one extra round of headroom).
    *
    * @param pairs  near-dup pairs with `id_a < id_b` (e.g.
    *               [[minhashNearDups]] output)
    * @param ids    one row per document (column `idCol`) — singletons
    *               label themselves
    * @param checkpointInterval rounds between reliable label
    *               checkpoints (≥ 1; plan depth stays bounded by it)
    */
  def componentLabels(pairs: DataFrame, ids: DataFrame, idCol: String,
                      checkpointInterval: Int = 3): DataFrame = {
    require(checkpointInterval >= 1,
      s"checkpointInterval must be >= 1, got $checkpointInterval")
    // Cache the pair computation BEFORE the both-directions union reads
    // it twice — without this the (expensive) candidate join runs twice.
    val p = pairs.select(col("id_a"), col("id_b")).persist()
    val edges = p.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(p.select(col("id_b").as("src"), col("id_a").as("dst")))
      .persist()
    var labels = ids.select(col(idCol).as("id"), col(idCol).as("component"))
      .persist()
    val spark = labels.sparkSession
    val sc = spark.sparkContext
    val ckptRoot = sc.getCheckpointDir.getOrElse {
      // Auto-create a scratch dir ONLY in local mode: on a real cluster a
      // driver-local file: path is not shared storage and executors could
      // not read it back — require the operator to place it explicitly.
      require(sc.isLocal,
        "componentLabels needs a cluster-visible checkpoint dir: call " +
          "spark.sparkContext.setCheckpointDir(<shared storage path>)")
      val d = java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toString
      sc.setCheckpointDir(d)
      sc.getCheckpointDir.get
    }
    val iterDirs = scala.collection.mutable.ListBuffer.empty[String]
    def deleteDir(d: String): Unit = {
      val p0 = new org.apache.hadoop.fs.Path(d)
      p0.getFileSystem(sc.hadoopConfiguration).delete(p0, true)
    }
    try {
    var round = 0
    var converged = false
    while (!converged) {
      round += 1
      val prop = edges.join(labels, edges("dst") === labels("id"))
        .groupBy(col("src")).agg(min(col("component")).as("nbr"))
      // Pointer doubling: also adopt the label OF the current label (its
      // "grandparent"). Labels are always node ids inside the component,
      // so the lookup is a self-join on the label table; with it chains
      // halve every round and convergence is O(log diameter) instead of
      // O(diameter) — neighbor propagation alone needs diameter rounds,
      // which on a chainy similarity graph is dozens of extra scans.
      val gp = labels.as("l1")
        .join(labels.as("l2"), col("l1.component") === col("l2.id"))
        .select(col("l1.id").as("gid"), col("l2.component").as("gcomp"))
      // The new label is computed ONCE and compared inline — carrying a
      // `changed` flag makes the convergence check a filter over the
      // already-persisted round result instead of a join against the
      // previous labels (one fewer join per round).
      val newComp = least(col("l.component"),
        coalesce(col("nbr"), col("l.component")),
        coalesce(col("gcomp"), col("l.component")))
      var next = labels.as("l")
        .join(prop, col("l.id") === prop("src"), "left_outer")
        .join(gp, col("l.id") === col("gid"), "left_outer")
        .select(col("l.id").as("id"), newComp.as("component"),
          (newComp < col("l.component")).as("changed"))
        .persist()
      // One full-scan aggregate: materializes EVERY partition into the
      // cache (a limit-style probe would stop early and leave partitions
      // to recompute through the just-unpersisted parent next round) and
      // answers the convergence question in the same job.
      val improved = next.agg(coalesce(max(col("changed")), lit(false)))
        .head.getBoolean(0)
      labels.unpersist(blocking = true)
      if (improved && round % checkpointInterval == 0) {
        val idir = s"$ckptRoot/graft-cc-iter-${labelsSeq.incrementAndGet()}"
        // `changed` is a per-round transient (consumed by the probe
        // above) — keep the durable artifact to the label schema
        next.select(col("id"), col("component")).write.parquet(idir)
        next.unpersist(blocking = true)
        next = spark.read.parquet(idir).persist()
        iterDirs += idir
      }
      labels = next
      converged = !improved
    }
    // Hand back an UNPERSISTED plan with truncated lineage: the final
    // labels are materialized to parquet under the session checkpoint dir
    // (on a cluster that dir is shared storage — the standard way
    // iterative graph algorithms cut their round-per-round lineage) and
    // read back. Without this the caller either inherits a stranded cache
    // entry for the life of the session, or an unpersisted plan that
    // re-runs every propagation round on first use. Retention is TWO
    // generations: the dir just written plus the previous call's, with
    // anything older deleted — so the handle a caller still holds from
    // the immediately preceding call stays readable (lazy parquet plans
    // resolve their files at ACTION time, so deleting the newest-but-one
    // dir would fail a later count() on a live result), while a long
    // session or bench loop stays bounded at two label sets on disk.
    // Iteration checkpoints are deleted outright once the final labels
    // are safely in their own dir.
    val dir = s"$ckptRoot/graft-cc-labels-${labelsSeq.incrementAndGet()}"
    labels.select(col("id"), col("component")).write.parquet(dir)
    val out = spark.read.parquet(dir)
    val evicted = labelsHistory.synchronized {
      val hist = dir :: labelsHistory.getOrElse(ckptRoot, Nil).filterNot(_ == dir)
      val (keep, drop) = hist.splitAt(2)
      labelsHistory(ckptRoot) = keep
      drop
    }
    evicted.foreach(deleteDir)
    out
    } finally {
      // Runs on BOTH paths: a mid-loop failure (executor OOM, disk
      // full) must not strand persisted round state or iteration
      // checkpoints — on a cluster the checkpoint root is shared
      // storage, where a retry loop would otherwise accumulate orphan
      // label tables. On success the final labels live in their own
      // graft-cc-labels dir, so the iter dirs are always disposable;
      // unpersist on an already-unpersisted handle is a no-op.
      labels.unpersist(blocking = true)
      edges.unpersist(blocking = true)
      p.unpersist(blocking = true)
      // NonFatal, not just IOException: some filesystem clients throw
      // RuntimeExceptions from delete, and a cleanup failure must never
      // mask the loop's original exception
      iterDirs.foreach(d =>
        try deleteDir(d)
        catch { case scala.util.control.NonFatal(_) => () })
    }
  }

  private val labelsSeq = new java.util.concurrent.atomic.AtomicLong(0)
  private val labelsHistory =
    scala.collection.mutable.Map.empty[String, List[String]]

  /** Benchmark decontamination: flag every training document sharing at
    * least one token n-gram with an evaluation/benchmark set — the
    * n-gram-collision decontamination step of an LLM training-data
    * pipeline (train/test leakage kills benchmark validity, so this runs
    * over the full corpus before training).
    *
    * Scale shape: the benchmark's DISTINCT n-gram hash set is tiny
    * relative to the corpus (benchmarks are thousands of documents, the
    * corpus is billions), so it is aggregated and BROADCAST; the corpus
    * explodes to (id, gram) rows that meet it in a broadcast hash join —
    * the corpus is scanned once, and the only shuffle is the final
    * per-document count. Returns one row per training document:
    * `(idCol, n_shared_ngrams, contaminated)`.
    */
  def contaminationFlags(train: DataFrame, bench: DataFrame,
                         idCol: String, textCol: String, n: Int): DataFrame = {
    // per-doc distinct gram hashes (shingleHashes) → per (id, gram) rows
    val tg = train.select(col(idCol).as("id"),
      explode(shingleHashes(col(textCol), n)).as("gram"))
    val bg = bench.select(explode(shingleHashes(col(textCol), n)).as("gram"))
      .distinct()
    val hits = tg.join(broadcast(bg), Seq("gram"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_hits"))
    train.select(col(idCol).as("id"))
      .join(hits, Seq("id"), "left_outer")
      .select(col("id").as(idCol),
        coalesce(col("n_hits"), lit(0L)).as("n_shared_ngrams"),
        (coalesce(col("n_hits"), lit(0L)) > 0).as("contaminated"))
  }

  /** SimHash fingerprint per document (over whitespace-token hashes). */
  def simhashFingerprints(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
      simhash(array_distinct(
        transform(tokens(col(textCol)), portableHash _))).as("simhash"))

  /** Per-document duplicated-span diagnostic: the fraction of a
    * document's distinct n-token shingles that occur in at least one
    * OTHER document (doc-frequency ≥ 2). This is the corpus-level
    * substring-duplication signal of Lee et al. 2022 ("Deduplicating
    * Training Data Makes Language Models Better"): pairwise near-dup
    * detection ([[minhashNearDups]]) misses boilerplate spans smeared
    * across MANY documents, while a high `dup_frac` flags exactly those.
    * Documents with fewer than n tokens have no shingles and are absent
    * from the output.
    *
    * Scale shape: explode to (doc, shingle-hash) rows, one hash-shuffle
    * on the shingle for doc-frequency (map-side partials collapse
    * repeats), an equi-join back on the shingle (co-partitioned with the
    * agg — Catalyst reuses the exchange), and one final keyed agg per
    * doc. Same plan family as chunk-level dedup (ns28); no window over
    * the shingle key, so a hub shingle (boilerplate in millions of docs)
    * stays splittable by AQE instead of pinning one partition. */
  def dupSpanStats(df: DataFrame, idCol: String, textCol: String,
                   shingleN: Int = 3): DataFrame = {
    // Barrier before the fan-out: (id, h) feeds both the doc-frequency
    // agg and the join back, and without it each consumer re-runs the
    // full shingle-hash computation from the scan. The checkpointed
    // array form is hashed once IN PARALLEL (heavy projection above a
    // cluster-sized exchange — a single-split corpus otherwise hashes
    // on one core) and each consumer only re-explodes it.
    val hs = Compute.barrier(
      df.select(col(idCol).as("id"), col(textCol).as("__text"))
        .repartition(Compute.parallelism(df), col("id"))
        .select(col("id"), shingleHashes(col("__text"), shingleN).as("hs")),
      "crosssource-hashed")
    val ex = hs.select(col("id"), explode(col("hs")).as("h"))
    val dfreq = ex.groupBy(col("h")).agg(count(lit(1)).as("df"))
    ex.join(dfreq, Seq("h"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("dup_shingles"))
      .select(col("id"), col("n_shingles"), col("dup_shingles"),
        (col("dup_shingles").cast("double") /
          col("n_shingles").cast("double")).as("dup_frac"))
  }

  /** Substring-level near-duplicate candidates via winnowed fingerprints
    * ([[graft.functions.TextFunctions.winnowedFingerprints]]): pairs of
    * documents sharing ≥ `minShared` selected fingerprints. Catches
    * copied PASSAGES between otherwise-different documents — the case
    * whole-document Jaccard ([[blockedJaccardPairs]]) scores near 0.
    *
    * `maxDf` is the stopword-fingerprint guard: a fingerprint present in
    * d documents generates O(d²) candidate pairs, and one shared by more
    * than `maxDf` documents is boilerplate with no discriminative value
    * (the standard frequency cut in fingerprint-based plagiarism/dedup
    * systems). With it, the pair join is an equi-join on the fingerprint
    * whose per-key fan-out is bounded by maxDf² — no cross join, AQE
    * splits any residual skew.
    *
    * @return (id_a, id_b, shared_prints) with id_a < id_b */
  def winnowedPairs(df: DataFrame, idCol: String, textCol: String,
                    shingleN: Int = 3, window: Int = 4,
                    minShared: Int = 3, maxDf: Int = 10): DataFrame = {
    // Materialization barrier (the minhashNearDups pattern): without it,
    // projection collapse inlines the position-ordered hash sequence
    // into every window-min lambda — no CSE for interpreted HOFs, so the
    // whole hash array is recomputed per window position (O(len²) per
    // doc) and again per downstream join consumer. The checkpoint makes
    // winnowing O(len·w) exactly once per document, and the hashing runs
    // above a cluster-sized exchange (a single-split corpus otherwise
    // hashes on one core).
    val hashed = Compute.barrier(
      df.select(col(idCol).as("id"), col(textCol).as("__text"))
        .repartition(Compute.parallelism(df), col("id"))
        .select(col("id"),
          shingleHashSeq(tokens(col("__text")), shingleN).as("hs")),
      "winnow-hashed")
    // The fingerprint set feeds three consumers (df agg + both sides of
    // the pair join); materialize it once, durably (GraphOps posture).
    val fp = Checkpoints.reliable(
      hashed.select(col("id"),
        explode(winnowSelect(col("hs"), window)).as("fp")),
      "winnow-fp")
    val shared = fp.groupBy(col("fp")).agg(count(lit(1)).as("df"))
      .filter(col("df").between(2, maxDf))
    val fpR = fp.join(shared.select(col("fp")), Seq("fp"))
    fpR.as("a").join(fpR.as("b"),
        col("a.fp") === col("b.fp") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("shared_prints"))
      .filter(col("shared_prints") >= minShared)
  }

  /** Weighted (term-frequency) cosine top-k similarity join over hashed
    * `shingleN`-token shingles — the posting-list sparse-vector join
    * (Vernica et al. 2010's pair generation with tf·tf scoring, the
    * hashing-trick feature space). Complements the set-semantics paths:
    * ns04/ns39/ns40 score presence (Jaccard/containment); this scores
    * REPETITION — a document that repeats a shared phrase ranks its
    * partner higher, the retrieval-flavored notion of lexical closeness.
    *
    * Semantics: cosine over the df-capped hashed-shingle vocabulary
    * (shingles with df > dfCap are dropped from vectors AND norms — the
    * stopword-phrase guard that also bounds the join). df-1 shingles
    * stay in the norms but generate no postings (they cannot pair).
    * Per document, the top `k` neighbors by cosine desc, id asc.
    *
    * Determinism: tf, df, dot products, and squared norms are all int64
    * sums — no reduction-order sensitivity — and the final score is one
    * fixed-order double expression (cast, sqrt, multiply, divide), so
    * the oracle hash-matches exactly.
    *
    * Scale shape: tf is one (id, h) partial agg over the exploded
    * corpus; df one (h) agg; postings join equi on h with fan-out
    * ≤ dfCap² per shingle; pair scores partial-agg on (id_a, id_b); the
    * top-k window sees only a document's own candidates. No broadcast
    * of anything vocabulary- or corpus-sized; AQE splits skewed posting
    * buckets.
    */
  def tfCosineTopK(df: DataFrame, idCol: String, textCol: String,
                   shingleN: Int, dfCap: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // tokenize+shingle+hash above a cluster-sized exchange (a
    // single-split corpus otherwise runs it in one scan task), then the
    // (id, h, tf) table is checkpointed once for its three consumers
    // (df agg, norms, postings) instead of re-running the explode per
    // consumer from the scan.
    val tf = Compute.barrier(
      df.select(col(idCol).as("id"), col(textCol).as("__t"))
        .repartition(Compute.parallelism(df), col("id"))
        .select(col("id"),
          explode(shingleHashSeq(tokens(col("__t")), shingleN)).as("h"))
        .groupBy(col("id"), col("h"))
        .agg(count(lit(1)).as("tf")),
      "tfcos-tf")
    val dfreq = tf.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val keptTf = tf.join(dfreq.filter(col("df") <= dfCap), Seq("h"))
    val norms = keptTf.groupBy(col("id"))
      .agg(sum(col("tf") * col("tf")).as("nsq"))
    val post = keptTf.filter(col("df") >= 2)
      .select(col("h"), col("id"), col("tf"))
    val pairs = post.as("a").join(post.as("b"),
        col("a.h") === col("b.h") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(sum(col("a.tf") * col("b.tf")).as("num"))
    val scored = pairs
      .join(norms.select(col("id").as("id_a"), col("nsq").as("na")), Seq("id_a"))
      .join(norms.select(col("id").as("id_b"), col("nsq").as("nb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (col("num").cast("double") /
          (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
          .as("cos"))
    val directed = scored
      .select(col("id_a").as("doc_id"), col("id_b").as("neighbor_id"), col("cos"))
      .unionAll(scored
        .select(col("id_b").as("doc_id"), col("id_a").as("neighbor_id"), col("cos")))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    directed.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank").cast("int").as("rank"),
        col("neighbor_id"), col("cos"))
  }
}
