package graft.queries

import graft.Tables
import graft.functions.TextFunctions._
import graft.operators.{Checkpoints, Dedup, Packing}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis + deduplication surface over the `documents` table
  * (training-data pipeline operators; SURVEY.md §2.3 ⊕).
  *
  * Oracle strategy: all hashing is the portable polynomial hash
  * (TextFunctions.portableHash), so DuckDB recomputes identical values
  * via list_transform/list_reduce. DuckDB CAST(double AS BIGINT) rounds
  * while Spark's cast truncates — every oracle uses FLOOR before CAST.
  */
object TextQueries {
  import Q._

  /** Shared BPE trainer behind ns52/ns53 — see ns52's header comment.
    * Returns (post-merge word table `(cs array<string>, f long)`, the
    * learned merges `(round, lhs, rhs, merged, pair_count)`).
    * Stops early (recording fewer than `rounds` merges) when no
    * adjacent pair remains — a corpus whose every word has collapsed
    * to a single symbol has nothing left to merge, and the argmax
    * would otherwise read an empty table. The ns52/ns53 oracle CTE
    * chain does not model this exhaustion (each round cross-joins its
    * `best<r>` row, so an empty round would empty the oracle's word
    * table); both queries train rounds ≪ the fixture's collapse point,
    * and BpeSpec pins the early-stop against the local reference.
    *
    * Incremental pair recount (the fast-BPE-trainer shape, e.g.
    * SentencePiece's): the full pair table is aggregated ONCE from the
    * char-split words; every later round adjusts it by a DELTA computed
    * from only the words the last merge TOUCHED (those containing the
    * merged pair adjacently — subtract their pre-merge pair multiset,
    * add their post-merge one). Touched-word recounting (not analytic
    * count adjustment) keeps overlapping-run pairs like "aaa" exact,
    * and the sums stay exact int64, so every round's argmax — and
    * therefore every merge — is identical to the full re-aggregation;
    * the oracle chain is unchanged. Scale shape: round r touches the
    * words containing the round-r pair (a vanishing corpus fraction
    * past the first merges), not the vocabulary.
    *
    * `private[graft]` so BpeSpec can pin it against an independent
    * local reference implementation. `onRound` (spec instrumentation)
    * receives (round, touchedWords, totalWords) per merge round ≥ 2 —
    * counted only when set, so queries pay nothing. */
  private[graft] def bpeTrain(s: SparkSession, d: String, rounds: Int,
      onRound: Option[(Int, Long, Long) => Unit] = None)
      : (DataFrame, Seq[(Int, String, String, String, Long)]) = {
    val words0 = Tables.documents(s, d)
      .select(explode(tokens(col("text"))).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("tok")).agg(count(lit(1)).as("f"))
      .select(transform(sequence(lit(1), length(col("tok"))),
        i => col("tok").substr(i, lit(1))).as("cs"), col("f"))
    val pairsCol = when(size(col("cs")) >= 2,
      transform(sequence(lit(1), size(col("cs")) - 1),
        i => struct(element_at(col("cs"), i).as("a"),
          element_at(col("cs"), i + 1).as("b"))))
      .otherwise(array().cast("array<struct<a:string,b:string>>"))
    def pairCountsOf(w: DataFrame, sign: Int): DataFrame =
      w.select(explode(pairsCol).as("p"), col("f"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg((sum(col("f")) * sign).as("cnt"))
    // localCheckpoint per round: each round's tables feed the next
    // round's argmax AND fold; without it round r recomputes rounds
    // 1..r−1 from scratch (O(R²) passes). Vocabulary-sized data.
    var words = words0.localCheckpoint(true)
    var pairCounts = pairCountsOf(words, 1).localCheckpoint(true)
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      pairCounts
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1).collect().headOption match {
        case None => exhausted = true // fully collapsed: nothing to merge
        case Some(best) =>
          val (a, b, cnt) =
            (best.getString(0), best.getString(1), best.getLong(2))
          merges += ((r, a, b, a + b, cnt))
          // Only words holding the winning pair adjacently change.
          val hasPair = exists(pairsCol,
            p => p.getField("a") === lit(a) && p.getField("b") === lit(b))
          val touched = words.filter(hasPair)
          // Greedy left-to-right merge: the accumulator's LAST element
          // is the held symbol; a (held=a, next=b) match replaces it
          // with the merged symbol, which cannot re-merge with what
          // follows in the same pass (standard BPE application order).
          val mergedTouched = touched.select(aggregate(col("cs"),
              array().cast("array<string>"),
              (acc, c) => when(size(acc) > 0 &&
                  element_at(acc, size(acc)) === lit(a) && c === lit(b),
                concat(slice(acc, lit(1), greatest(size(acc) - 1, lit(0))),
                  array(lit(a + b))))
                .otherwise(concat(acc, array(c)))).as("cs"), col("f"))
          onRound.foreach { f =>
            if (r < rounds) f(r + 1, touched.count(), words.count())
          }
          words = words.filter(!hasPair).unionByName(mergedTouched)
            .localCheckpoint(true)
          pairCounts = pairCounts
            .unionByName(pairCountsOf(touched, -1))
            .unionByName(pairCountsOf(mergedTouched, 1))
            .groupBy(col("a"), col("b")).agg(sum(col("cnt")).as("cnt"))
            .filter(col("cnt") > 0)
            .localCheckpoint(true)
      }
      r += 1
    }
    (words, merges.result())
  }

  /** Oracle CTE chain for [[bpeTrain]]: `w0` (char-split word-frequency
    * table) then per round `best<r>` (deterministic argmax pair) and
    * `w<r>` (the identical greedy merge fold). */
  private def bpeCtes(rounds: Int): String = {
    val roundCtes = (1 to rounds).map { r =>
      s"""best$r AS (
         |  SELECT p.a AS a, p.b AS b, CAST(SUM(f) AS BIGINT) AS cnt
         |  FROM w${r - 1}, unnest([{'a': cs[i], 'b': cs[i + 1]}
         |    for i in range(1, len(cs))]) AS t(p)
         |  GROUP BY p.a, p.b ORDER BY cnt DESC, a, b LIMIT 1),
         |w$r AS (
         |  SELECT list_reduce(
         |    list_prepend(CAST([] AS VARCHAR[]),
         |      list_transform(cs, c -> [c])),
         |    (acc, x) -> CASE
         |      WHEN len(acc) > 0 AND acc[len(acc)] = best$r.a
         |        AND x[1] = best$r.b
         |      THEN acc[1:len(acc)-1] || [best$r.a || best$r.b]
         |      ELSE acc || x END) AS cs, f
         |  FROM w${r - 1}, best$r)""".stripMargin
    }.mkString(",\n")
    s"""w0 AS (
       |  SELECT [tok[i] for i in range(1, len(tok) + 1)] AS cs, f FROM (
       |    SELECT tok, CAST(COUNT(*) AS BIGINT) AS f FROM (
       |      SELECT unnest(string_split(text, ' ')) AS tok
       |      FROM documents) u
       |    WHERE tok <> '' GROUP BY tok) w),
       |$roundCtes""".stripMargin
  }

  // ---- shared DuckDB SQL fragments (kept in lockstep with TextFunctions) ----

  // Portable-hash SQL fragment now lives in Q.hashSql (shared with the
  // CDC tier's sketch oracles); `import Q._` above keeps every use here.

  /** FakeDecoder oracle replica (Multimodal.FakeDecoder): fold the UTF-8
    * bytes (== codepoints for the ASCII fixture) through h ← h·31 + b
    * wrapped to 64 bits (HUGEINT residue). */
  private def decodeFoldOf(x: String): String =
    s"""list_reduce(list_prepend(CAST(1125899906842597 AS HUGEINT),
       |    list_transform(range(1, length($x) + 1),
       |      i -> CAST(unicode(substr($x, CAST(i AS INT), 1)) AS HUGEINT))),
       |  (acc, c) -> (acc * 31 + c) % 18446744073709551616)""".stripMargin
  private val decodeFoldSql = decodeFoldOf("text")

  /** Per-dimension feature k = javaMod(h·(2i+1)+i, 1000) with the
    * signed-view correction (2^64 ≡ 616 mod 1000), f = k/1000 as REAL. */
  private def decodeFeatSql(i: Int) =
    s"""CAST(((((hu * ${2 * i + 1} + $i) % 18446744073709551616) % 1000)
       |  - CASE WHEN ((hu * ${2 * i + 1} + $i) % 18446744073709551616)
       |         >= 9223372036854775808 THEN 616 ELSE 0 END
       |  + 1000) % 1000 / 1000.0 AS REAL)""".stripMargin

  /** CTEs `h`, `f`: (vec_id, embedding) derived from document text via
    * the FakeDecoder replica — the oracle twin of ns18/vs15's
    * attachPayload → extractFeatures derivation. */
  private val decodeFeatureCtes =
    s"""h AS (SELECT doc_id, $decodeFoldSql AS hu FROM documents),
       |f AS (SELECT doc_id AS vec_id,
       |        [${decodeFeatSql(0)}, ${decodeFeatSql(1)},
       |         ${decodeFeatSql(2)}, ${decodeFeatSql(3)}] AS embedding
       |      FROM h)""".stripMargin

  private def decodeDotSql(a: String, b: String) =
    s"""list_reduce(list_prepend(0.0, list_transform(range(1, len($a) + 1),
       |  i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))),
       |  (acc, x) -> acc + x)""".stripMargin

  /** Cosine between CTE columns `qv`/`cv` — mirrors the vs01 oracle. */
  private val decodeCosSql =
    s"""${decodeDotSql("qv", "cv")} / (sqrt(${decodeDotSql("qv", "qv")})
       | * sqrt(${decodeDotSql("cv", "cv")}))""".stripMargin

  /** CTE producing doc_id + distinct 3-shingle hash set per document. */
  private val shingleHashCte =
    s"""WITH toks AS (
       |  SELECT doc_id, n_chars, string_split(text, ' ') AS t FROM documents),
       |sh AS (
       |  SELECT doc_id, n_chars, [t[i] || '_' || t[i+1] || '_' || t[i+2]
       |                  for i in range(1, len(t) - 1)] AS shingles
       |  FROM toks),
       |hs AS (
       |  SELECT doc_id, n_chars, list_distinct(list_transform(shingles,
       |    s -> ${hashSql("s")})) AS hashes
       |  FROM sh)""".stripMargin

  private val jaccardSql =
    "len(list_intersect(a.hashes, b.hashes)) * 1.0 / len(list_distinct(a.hashes || b.hashes))"

  /** BM25 scores per (query_id, doc_id) — Robertson k1=1.2, b=0.75 with
    * the log-free idf ratio (N-df+0.5)/(df+0.5); see ns29 for the
    * arithmetic-determinism rationale (in-order fold over tok-sorted
    * term scores — decimal casts would lose the quotient bits that
    * distinguish near-ties). `qterms` is a small (query_id, tok) set →
    * broadcast; set `excludeSelf` when query ids are themselves doc ids
    * ("more-like-this" retrieval). Scale shape: tf is one (doc_id, tok)
    * partial agg over the exploded corpus; df is vocabulary-sized →
    * broadcast; nothing but candidates reaches the downstream top-k. */
  private def bm25Scores(docs: DataFrame, qterms: DataFrame,
      excludeSelf: Boolean): DataFrame = {
    import graft.operators.Compute
    // Tokenize ONCE above a cluster-sized exchange (guide §2.6): the
    // corpus is a single-split scan, so the former form ran the full
    // tokenize+explode serially on one core — and TWICE more via the
    // tf subplan's two join branches (no CSE across branches). The
    // materialized token table feeds the stats head and the tf agg;
    // the tf barrier feeds the df table and the candidate join.
    val toks = Compute.barrier(
      docs.select(col("doc_id"), col("text"))
        .repartition(Compute.parallelism(docs), col("doc_id"))
        .select(col("doc_id"), tokens(col("text")).as("toks")),
      "bm25-toks")
    val stats = toks.agg(
      count(lit(1)).as("n"),
      sum(size(col("toks")).cast("long")).as("total")).head()
    val n = stats.getLong(0)
    val avgdl = stats.getLong(1).toDouble / n.toDouble
    val tf = Compute.barrier(
      toks
        .select(col("doc_id"), size(col("toks")).as("dl"),
          explode(col("toks")).as("tok"))
        .groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl")),
      "bm25-tf")
    val dfTab = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val tfD = col("tf").cast("double")
    val idf = (lit(n.toDouble) - col("df").cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5))
    val den = tfD + lit(1.2) *
      (lit(0.25) + lit(0.75) * (col("dl").cast("double") / lit(avgdl)))
    val cand = tf.join(broadcast(qterms), Seq("tok"))
    val kept =
      if (excludeSelf) cand.filter(col("doc_id") =!= col("query_id")) else cand
    kept.join(broadcast(dfTab), Seq("tok"))
      .withColumn("sc", (idf * (tfD * lit(2.2))) / den)
      .groupBy(col("query_id"), col("doc_id"))
      .agg(aggregate(
        array_sort(collect_list(struct(col("tok"), col("sc")))),
        lit(0.0),
        (acc, x) => acc + x.getField("sc")).as("bm25"))
  }

  /** CTEs `stats`,`btoks`,`tf`,`dfreq`,`term`,`byd`: the BM25 scoring
    * chain (k1=1.2, b=0.75, log-free idf, in-order fold over tok-sorted
    * term scores) over `documents`, scoring the (query_id, tok) rows of
    * the caller-defined CTE `qterms` (which must be self-contained and
    * defined BEFORE these CTEs). Kept in lockstep with [[bm25Scores]],
    * the Spark twin — one formula, two oracle consumers (ns29, vs15). */
  private def bm25Ctes(qterms: String, excludeSelf: Boolean): String =
    s"""stats AS (
       |  SELECT CAST(COUNT(*) AS DOUBLE) AS nd,
       |    CAST(SUM(len(string_split(text, ' '))) AS DOUBLE)
       |      / CAST(COUNT(*) AS DOUBLE) AS avgdl
       |  FROM documents),
       |btoks AS (
       |  SELECT doc_id, len(string_split(text, ' ')) AS dl,
       |    unnest(string_split(text, ' ')) AS tok
       |  FROM documents),
       |tf AS (
       |  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf, MAX(dl) AS dl
       |  FROM btoks GROUP BY doc_id, tok),
       |dfreq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok),
       |term AS (
       |  SELECT $qterms.query_id, tf.doc_id, tf.tok,
       |    (((nd - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
       |      * (CAST(tf.tf AS DOUBLE) * 2.2))
       |    / (CAST(tf.tf AS DOUBLE)
       |       + 1.2 * (0.25 + 0.75 * (CAST(tf.dl AS DOUBLE) / avgdl))) AS sc
       |  FROM tf JOIN $qterms USING (tok) JOIN dfreq USING (tok) CROSS JOIN stats${
      if (excludeSelf) s"\n  WHERE tf.doc_id <> $qterms.query_id" else ""}),
       |byd AS (
       |  SELECT query_id, doc_id,
       |    list_reduce(list_prepend(0.0, list(sc ORDER BY tok)),
       |      (acc, x) -> acc + x) AS bm25
       |  FROM term GROUP BY query_id, doc_id)""".stripMargin

  private val stopEn = Seq("the", "a", "of", "and", "to", "in", "is")
  private val stopDe = Seq("der", "die", "das", "und", "nicht")
  private val stopFr = Seq("le", "la", "et", "les", "des")
  private def stopCountSql(words: Seq[String]) =
    s"len(list_filter(string_split(text, ' '), w -> w IN (${words.map("'" + _ + "'").mkString(",")})))"

  val queries: Map[String, QueryFn] = Map(
    // Exact dedup: hash-groupBy on the full text, canonical id = min.
    // One shuffle on the dedup key with map-side partial agg; at 100 TB
    // swap the raw text key for its portableHash/sha fingerprint to keep
    // shuffle rows narrow (same plan shape).
    "ns01_dedup_exact" -> ((s, d) => {
      Dedup.exactGroups(Tables.documents(s, d), "text", "doc_id")
        .orderBy(col("keeper_id"))
    }),

    // Token counting + quality-score components: whitespace tokens,
    // average token length, stopword ratio, acceptance flag — pure
    // codegen'd expressions, no UDF, no shuffle (scan-local).
    "ns02_quality_score" -> ((s, d) => {
      val t = tokens(col("text"))
      val nTok = size(t)
      val nStop = size(filter(t, w => w.isin(stopEn: _*)))
      Tables.documents(s, d).select(
        col("doc_id"),
        nTok.as("n_tokens"),
        length(col("text")).as("text_len"),
        ((length(col("text")) - (nTok - 1)) * lit(1.0) / nTok).as("avg_token_len"),
        (nStop * lit(1.0) / nTok).as("stopword_ratio"),
        (nTok >= 20 && nTok <= 200 && nStop > 0).as("quality_ok"))
        .orderBy(col("doc_id"))
    }),

    // Language ID: stopword-count heuristic per language, argmax with a
    // fixed tiebreak order (en > de > fr).
    "ns03_lang_id" -> ((s, d) => {
      val t = tokens(col("text"))
      def score(ws: Seq[String]) = size(filter(t, w => w.isin(ws: _*)))
      val (se, sd, sf) = (score(stopEn), score(stopDe), score(stopFr))
      Tables.documents(s, d).select(
        col("doc_id"), col("lang").as("declared_lang"),
        se.as("score_en"), sd.as("score_de"), sf.as("score_fr"),
        when(se >= sd && se >= sf, "en")
          .when(sd >= sf, "de").otherwise("fr").as("predicted_lang"))
        .orderBy(col("doc_id"))
    }),

    // Exact 3-gram Jaccard near-dups (threshold in the data's verified
    // gap: planted dups ≥0.85, background ≤0.15), length-bucket blocked:
    // candidates restricted to same/adjacent 32-char buckets, which turns
    // the quadratic cross join into a shuffled equi-join (the oracle
    // states the identical bucket predicate).
    "ns04_ngram_jaccard" -> ((s, d) => {
      Dedup.blockedJaccardPairs(Tables.documents(s, d), "doc_id", "text",
        lenCol = "n_chars", shingleN = 3, threshold = 0.5, bucketWidth = 32)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // MinHash(64) + 16-band×4-row LSH candidates, exact-Jaccard verified
    // at 0.8. Oracle is brute force at the same threshold: with the
    // data's similarity gap, the per-pair LSH miss probability at j≥0.85
    // is < 1e-4 and at the planted j≈0.99 astronomically small, so
    // candidate-set ∩ threshold == brute force. r=4 rows per band keeps
    // buckets tiny even with a small shared vocabulary (r=2 degenerates
    // into quadratic buckets). All joins are equi-joins — no cross join.
    "ns05_minhash_lsh" -> ((s, d) => {
      Dedup.minhashNearDups(Tables.documents(s, d), "doc_id", "text",
        shingleN = 3, k = 64, bands = 16, threshold = 0.8)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // SimHash fingerprint per doc (31-bit, majority vote over distinct
    // token hashes) — the hamming-distance dedup primitive.
    "ns06_simhash" -> ((s, d) => {
      Dedup.simhashFingerprints(Tables.documents(s, d), "doc_id", "text")
        .orderBy(col("id"))
    }),

    // Rolling-hash document fingerprint over the raw text (content-
    // addressable id for shard-stable exact dedup).
    "ns07_fingerprint" -> ((s, d) => {
      Tables.documents(s, d).select(
        col("doc_id"), portableHash(col("text")).as("fingerprint"))
        .orderBy(col("doc_id"))
    }),

    // Multimodal column plumbing: opaque binary payload + typed metadata
    // (byte length, sha256). The decode/feature-extract stage is the
    // stubbed operator in graft.operators.Multimodal (spec-tested); this
    // verifies the binary-column schema path end-to-end.
    "ns08_multimodal_meta" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), col("text").cast("binary").as("payload"),
          col("source"))
        .select(col("doc_id"),
          octet_length(col("payload")).as("n_bytes"),
          sha2(col("payload"), 256).as("sha"),
          col("source"))
        .orderBy(col("doc_id"))
    }),

    // UDTF/explode surface: corpus token frequencies, top 20 with a
    // deterministic tiebreak.
    "ns10_token_freq" -> ((s, d) => {
      Tables.documents(s, d)
        .select(explode(tokens(col("text"))).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token").asc)
        .limit(20)
    }),

    // BPE-ish regex token count (letters / digits / single symbol runs).
    "ns09_bpe_tokens" -> ((s, d) => {
      Tables.documents(s, d).select(
        col("doc_id"),
        size(regexp_extract_all(col("text"),
          lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).as("n_bpe_tokens"))
        .orderBy(col("doc_id"))
    }),

    // Near-dup CLUSTERS, not just pairs: connected components over the
    // LSH pair graph, every doc labeled with the smallest reachable doc
    // id — the canonical-representative step of a dedup pipeline
    // ("keep one per cluster"). Spark runs iterative min-label
    // propagation to fixpoint; the oracle states the same transitive
    // closure as a recursive CTE over the brute-force pair predicate
    // (LSH == brute force on this corpus is separately verified, ns05).
    "ns12_dedup_clusters" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
        shingleN = 3, k = 64, bands = 16, threshold = 0.8)
      Dedup.componentLabels(pairs, docs, "doc_id")
        .select(col("id").as("doc_id"), col("component"))
        .orderBy(col("doc_id"))
    }),

    // Cluster-representative selection — the decision ns12's clusters
    // exist to enable: per near-dup cluster keep the BEST document
    // (here: most tokens; ties to the lower id), not the arbitrary
    // min-id member — the dedup policy real pipelines apply (keep the
    // longest/highest-quality variant, drop the rest). Composition of
    // the verified LSH→CC chain with a per-cluster argmax as a PARTIAL
    // AGGREGATION (max over struct(n_tok, −doc_id) — same winner as a
    // row_number over (n_tok desc, doc_id asc)): the map side collapses
    // each cluster to one candidate row BEFORE the shuffle, so the
    // exchange carries tasks × clusters rows, never the corpus, and no
    // per-group sort exists at all. The window form can't even take the
    // rank pushdown (its stacked unbounded COUNT needs the full group),
    // which is why the aggregation form wins at scale; PlanAuditSpec
    // pins the no-window shape.
    "ns44_cluster_best" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
        shingleN = 3, k = 64, bands = 16, threshold = 0.8)
      val labels = Dedup.componentLabels(pairs, docs, "doc_id")
        .select(col("id").as("doc_id"), col("component"))
      val scored = Tables.documents(s, d)
        .select(col("doc_id"), size(tokens(col("text"))).as("n_tok"))
      labels.join(scored, Seq("doc_id"))
        .groupBy(col("component"))
        .agg(count(lit(1)).as("n_docs"),
          max(struct(col("n_tok"), (-col("doc_id")).as("nid"))).as("best"))
        .select(col("component"), (-col("best.nid")).as("kept_id"),
          col("best.n_tok").as("kept_tokens"), col("n_docs"))
        .orderBy(col("component"))
    }),

    // Perplexity-bucketed corpus composition — the CCNet curation split
    // (Wenzek et al. 2020): score every document with the exact
    // in-corpus bigram LM (ns30's verified product fold, source carried
    // through), then cut each source into head/middle/tail thirds via
    // CCNet's own mechanism — SAMPLED percentile thresholds, not a
    // corpus sort. A deterministic k-per-source sample (bottom-k of a
    // portable hash — bounded heap, no RNG, same picks on any cluster
    // size or engine) is scored with the same LM, its tercile cut ROWS
    // are taken as discrete order statistics (actual (score, doc_id)
    // tuples — no interpolation, so cross-engine comparisons are exact
    // bit equality, never FP-boundary-fuzzy), and every document is
    // bucketed by comparing its (lm_score, doc_id) against the ≤2
    // broadcast cut tuples. Scale shape: the count tables are
    // vocabulary²-bounded broadcasts (web-scale → shuffled equi-joins,
    // same family); the sample heap ships ≤k pairs per (partition,
    // source); cut extraction collects nothing bigger than k structs
    // per source; bucketing is a broadcast join + two comparisons. No
    // window touches a source-sized partition anywhere (the r12 ntile
    // formulation serialized each source through one window task).
    "ns45_perplexity_buckets" -> ((s, d) => {
      val t = tokens(col("text"))
      val bg = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), posexplode(
          zip_with(slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
            (a, b) => struct(a.as("a"), b.as("b")))).as(Seq("pos", "ab")))
        .select(col("doc_id"), col("source"), col("pos"),
          col("ab.a").as("a"), col("ab.b").as("b"))
      val cnt = bg.groupBy(col("a"), col("b")).agg(count(lit(1)).as("c"))
      val pre = bg.groupBy(col("a")).agg(count(lit(1)).as("ca"))
      val scored = bg.join(broadcast(cnt), Seq("a", "b"))
        .join(broadcast(pre), Seq("a"))
        .withColumn("pr", col("c").cast("double") / col("ca").cast("double"))
        .groupBy(col("doc_id"), col("source"))
        .agg(count(lit(1)).as("n_bigrams"),
          aggregate(array_sort(collect_list(struct(col("pos"), col("pr")))),
            lit(1.0), (acc, x) => acc * x.getField("pr")).as("lm_score"))
      // Deterministic sample: the 8 docs per source with the smallest
      // salted portable hash (ns17's bounded bottom-k aggregate).
      // Drawn only from documents with >=2 tokens — shorter docs yield
      // no bigrams and so no lm_score; a sample of all-scoreless docs
      // would leave its source with no cut rows and silently drop every
      // scored doc of that source from the inner-join bucketing.
      val h = graft.functions.TextFunctions.portableHash(
        concat(lit("pb:"), col("doc_id").cast("string")))
      val sampleIds = Tables.documents(s, d)
        .filter(size(tokens(col("text"))) >= 2)
        .select(col("source"), col("doc_id"), h.as("h"))
        .groupBy(col("source"))
        .agg(graft.functions.BottomK.bottomK(col("h"), col("doc_id"), 8)
          .as("picks"))
        .select(col("source"), explode(col("picks")).as("p"))
        .select(col("source"), col("p.id").as("doc_id"))
      // The sample's scores are a broadcast-semi-join restriction of the
      // SAME scored subtree the final bucketing consumes — identical
      // plan subtree up through the per-doc aggregate, so ReuseExchange
      // computes the heavy scoring once and this branch reads the
      // exchange. Cut rows: the tercile positions of the (score desc,
      // doc_id asc) sample order, stored negated so one ascending
      // array_sort gives the order; k ≤ 8 structs per source, driver
      // never involved.
      val cuts = scored.join(broadcast(sampleIds), Seq("doc_id", "source"))
        .groupBy(col("source"))
        .agg(sort_array(collect_list(struct((-col("lm_score")).as("ns"),
          col("doc_id").as("id")))).as("ord"))
        .select(col("source"),
          element_at(col("ord"),
            ceil(size(col("ord")) / lit(3.0)).cast("int")).as("c1"),
          element_at(col("ord"),
            ceil(size(col("ord")) * 2 / lit(3.0)).cast("int")).as("c2"))
      // bucket = 1 + [after cut1] + [after cut2]; "after c" in the
      // (score desc, id asc) total order = strictly lower score, or a
      // score tie with a higher doc_id. Exact tuple comparison.
      def after(c: String) =
        (-col("lm_score") > col(s"$c.ns")) ||
          (-col("lm_score") === col(s"$c.ns") && col("doc_id") > col(s"$c.id"))
      scored.join(broadcast(cuts), Seq("source"))
        .withColumn("bucket",
          lit(1) + when(after("c1"), 1).otherwise(0)
            + when(after("c2"), 1).otherwise(0))
        .groupBy(col("source"), col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_bigrams")).as("sum_bigrams"),
          min(col("lm_score")).as("min_score"),
          max(col("lm_score")).as("max_score"))
        .orderBy(col("source"), col("bucket"))
    }),

    // Lexical-diversity profile per source — the corpus-health gauge a
    // curation pipeline reads before mixing: hapax count (tokens seen
    // exactly once in the source), distinct vocabulary, total tokens,
    // and the hapax/vocabulary ratio (high ⇒ productive natural text;
    // low ⇒ template/boilerplate-heavy source worth a dedup pass).
    // Scale shape: one corpus shuffle to the (source, token) partial
    // agg — map-side combine eats the heavy tail — then a
    // vocabulary-sized rollup per source; no window, no sort until the
    // final source-count-sized presentation ORDER BY. The ratio divides
    // two exactly-representable longs, so both engines round the same
    // IEEE quotient.
    "ns46_hapax_ratio" -> ((s, d) => {
      val cnt = Tables.documents(s, d)
        .select(col("source"), explode(tokens(col("text"))).as("tok"))
        .groupBy(col("source"), col("tok"))
        .agg(count(lit(1)).as("c"))
      cnt.groupBy(col("source"))
        .agg(sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"),
          count(lit(1)).as("n_distinct"),
          sum(col("c")).as("n_tokens"))
        .withColumn("hapax_ratio",
          col("n_hapax").cast("double") / col("n_distinct").cast("double"))
        .orderBy(col("source"))
    }),

    // Zipf rank-frequency curve — the corpus-naturalness gauge: natural
    // text keeps rank×frequency roughly constant (Zipf's law, exponent
    // ≈1); machine-generated or template-heavy corpora bend the curve.
    // Probed at power-of-two ranks so the whole diagnostic stays in
    // EXACT integer arithmetic (the log-log regression form needs ln(),
    // which is not correctly rounded and differs across libm — the
    // products ARE the slope signal: a flat rank_x_freq column is
    // exponent 1, decay below/above 1.0 reads as the local deviation).
    // Scale shape: token counts are one map-side-combined shuffle, the
    // top-512 cut is a TakeOrderedAndProject (no global sort), and both
    // windows run over ≤512 surviving rows — rank-bounded metadata, not
    // corpus data.
    "ns50_zipf_curve" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val cnt = Tables.documents(s, d)
        .select(explode(tokens(col("text"))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      val top = cnt.orderBy(col("c").desc, col("tok").asc).limit(512)
      val w = Window.orderBy(col("c").desc, col("tok").asc)
      val w2 = Window.orderBy(col("rank"))
      top.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank").bitwiseAND(col("rank") - 1) === 0)
        .withColumn("rank_x_freq", col("rank") * col("c"))
        .withColumn("decay", col("rank_x_freq").cast("double")
          / lag(col("rank_x_freq"), 1).over(w2).cast("double"))
        .select(col("rank"), col("tok"), col("c"), col("rank_x_freq"),
          col("decay"))
        .orderBy(col("rank"))
    }),

    // Incremental near-dedup — the continuous-ingest shape every crawl
    // pipeline runs daily: flag each NEW document (here the doc_id%10
    // slice, deterministic and scale-free) whose Jaccard to any HISTORY
    // document meets 0.8, via the asymmetric LSH band join
    // (Dedup.incrementalNearDups) — candidates scale with the
    // increment, never history×history. Output is per new doc: match
    // count, best Jaccard (NULL when clean), and the drop flag.
    "ns49_incremental_dedup" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val hist = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
      val batch = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
      val pairs = Dedup.incrementalNearDups(hist, batch, "doc_id", "text",
        shingleN = 3, k = 64, bands = 16, threshold = 0.8)
      val agg = pairs.groupBy(col("id_new"))
        .agg(count(lit(1)).as("n_dups"), max(col("jaccard")).as("max_jaccard"))
      batch.select(col("doc_id"))
        .join(agg, col("doc_id") === col("id_new"), "left")
        .select(col("doc_id"),
          coalesce(col("n_dups"), lit(0L)).as("n_dups"),
          col("max_jaccard"),
          col("id_new").isNotNull.as("is_dup"))
        .orderBy(col("doc_id"))
    }),

    // Cross-source overlap matrix — the source-level redundancy map
    // that tells a mixing pipeline which sources are mirrors of each
    // other before it double-counts them: for every source pair, the
    // distinct 5-gram hashes they share and the Jaccard overlap of
    // their gram sets. Scale shape: (source, gram-hash) is distinct-ed
    // once (fixed-width int64 keys, map-side combined), the pair
    // counts come from a gram-keyed self equi-join whose per-gram
    // fan-out is bounded by source-count² (sources are dozens, not
    // data-scaled), and the per-source totals broadcast back onto the
    // pair-count-sized result.
    // ns48's SCALE TWIN: the same cross-source overlap matrix from
    // k-minimum-values sketches (functions.KmvSketchAgg) instead of the
    // exact pairwise gram join. Per source the shuffle carries one
    // ≤k-long sketch (map-side partial-aggregated), the pairwise stage
    // is a broadcast self-join of n_sources sketch rows (k-bounded
    // metadata), and all estimates — per-source distinct, union,
    // Jaccard, intersection (Beyer et al., SIGMOD 2007) — come off the
    // sketches alone. No per-gram pair join anywhere: at 100 TB the
    // exact form shuffles every distinct gram of every source; this
    // ships n_sources × k longs. Deterministic hash → the oracle
    // recomputes identical k-minima and identical IEEE estimate
    // arithmetic, so even the "approximate" numbers hash-match exactly.
    "ns51_kmv_overlap" -> ((s, d) => {
      import graft.functions.KmvSketchAgg
      val k = 256
      val M = 2147483647.0 // portable-hash range; h_k/M estimates U(0,1) spacing
      val grams = Tables.documents(s, d)
        .select(col("source"), explode(shingleHashes(col("text"), 5)).as("g"))
      val sk = grams.groupBy(col("source"))
        .agg(KmvSketchAgg.kMinValues(col("g"), k).as("sk"))
      def est(arr: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        when(size(arr) < k, size(arr).cast("double"))
          .otherwise(lit((k - 1).toDouble) * M
            / element_at(arr, k).cast("double"))
      val u = slice(array_sort(array_union(col("ka"), col("kb"))), 1, k)
      sk.select(col("source").as("src_a"), col("sk").as("ka"))
        .join(broadcast(sk.select(col("source").as("src_b"), col("sk").as("kb"))),
          col("src_a") < col("src_b"))
        .withColumn("u", u)
        .select(col("src_a"), col("src_b"),
          size(array_intersect(array_intersect(col("u"), col("ka")), col("kb")))
            .cast("long").as("shared_kmin"),
          est(col("ka")).as("est_a"),
          est(col("kb")).as("est_b"),
          est(col("u")).as("est_union"),
          (size(array_intersect(array_intersect(col("u"), col("ka")), col("kb")))
            .cast("double") / size(col("u")).cast("double") * est(col("u")))
            .as("est_intersection"))
        .orderBy(col("src_a"), col("src_b"))
    }),

    // BPE tokenizer TRAINING — learn the first R merge rules from corpus
    // statistics (Sennrich et al., "Neural Machine Translation of Rare
    // Words with Subword Units", ACL 2016): per round, the most frequent
    // adjacent symbol pair (occurrences summed over the word-frequency
    // table) becomes a new symbol and is merged greedily left-to-right
    // in every word. This is how real trainers (subword-nmt,
    // SentencePiece-BPE) run — on the (word, freq) table, never the
    // corpus: the corpus collapses to word frequencies in ONE
    // map-side-combined agg, and every round's pair count and merge are
    // vocabulary-sized. The per-round argmax is one-row driver metadata
    // (the kmeansParallelInit pattern); ties break lexicographically, so
    // the whole run is deterministic and the oracle replays it as R
    // chained CTEs applying the IDENTICAL greedy fold.
    "ns52_bpe_train" -> ((s, d) => {
      import s.implicits._
      bpeTrain(s, d, rounds = 5)._2
        .toDF("round", "lhs", "rhs", "merged", "pair_count")
        .orderBy(col("round"))
    }),

    // The tokenizer's APPLY side: the subword vocabulary after ns52's
    // five merges, with corpus frequencies — what the trained tokenizer
    // would actually emit over this corpus. No corpus re-scan: the word
    // table's `f` column already carries corpus weight, so symbol
    // frequencies are one vocabulary-sized explode + agg over the
    // post-merge table. Top-20 by frequency (symbol-asc ties) is a
    // TakeOrderedAndProject.
    "ns53_bpe_vocab" -> ((s, d) => {
      val words = bpeTrain(s, d, rounds = 5)._1
      words.select(explode(col("cs")).as("symbol"), col("f"))
        .groupBy(col("symbol"))
        .agg(sum(col("f")).as("n_occurrences"))
        .orderBy(col("n_occurrences").desc, col("symbol").asc)
        .limit(20)
    }),

    // The trained tokenizer applied CORPUS-WIDE — the token-cost
    // estimate every training-data pipeline runs before mixing ("how
    // many tokens is this source under OUR tokenizer", which drives
    // sampling budgets and epoch math): per source, whitespace words,
    // BPE tokens after ns52's five merges, and tokens-per-word. No
    // per-document re-encoding: BPE merges act within words, so a
    // word's encoded length is a LOOKUP in the post-merge word table
    // (segments concat back to the word — the join key is exact), and
    // the corpus pass is one equi-join of the token stream against the
    // vocabulary-sized table plus one partial-aggregated rollup. At
    // 100 TB: the word table is vocabulary-bounded (broadcastable), the
    // token stream shuffles once into the per-source agg.
    "ns55_bpe_token_counts" -> ((s, d) => {
      val words = bpeTrain(s, d, rounds = 5)._1
      val wt = words.select(concat_ws("", col("cs")).as("tok"),
        size(col("cs")).cast("long").as("n_seg"))
      Tables.documents(s, d)
        .select(col("source"), explode(tokens(col("text"))).as("tok"))
        .filter(length(col("tok")) > 0)
        .join(broadcast(wt), Seq("tok"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_words"), sum(col("n_seg")).as("n_bpe_tokens"))
        .withColumn("bpe_per_word", col("n_bpe_tokens").cast("double")
          / col("n_words").cast("double"))
        .orderBy(col("source"))
    }),

    // Robust per-source outlier gate: median absolute deviation, the
    // robust z-score every cleaning pipeline prefers over mean/stddev
    // (one 100 MB page would drag a source's mean past most of its real
    // documents; the median doesn't move). All-integer on n_chars —
    // lower median via q27's row_number idiom — so every value is
    // oracle-exact. Flag = dev > 3·MAD. Scale shape: two source-keyed
    // window sorts (per-source, AQE-splittable — the ns45 shape) + two
    // broadcasts of source-count-sized median tables; the approximate
    // twin at extreme scale is percentile_approx (q48's sketch).
    "ns54_mad_outliers" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
        .select(col("source"), col("doc_id"), col("n_chars"))
      // Exact lower median WITHOUT a corpus-sized window: aggregate to
      // the per-(source, value) HISTOGRAM first (one map-side-combined
      // shuffle), then walk cumulative counts over distinct VALUES.
      // The window input is value-DOMAIN-bounded (doc lengths /
      // deviations — ≤ max doc length rows per source at any corpus
      // size), never corpus-bounded; the r12 formulation ranked every
      // document through one window task per source. Picks the same
      // value as ROW_NUMBER rn == (n+1) DIV 2 over (v, doc_id): the
      // bucket where the cumulative count first reaches the median
      // rank — so the oracle is unchanged.
      def lowerMedian(df: DataFrame, v: String, as: String): DataFrame = {
        val hist = df.groupBy(col("source"), col(v))
          .agg(count(lit(1)).as("c"))
        val w = Window.partitionBy(col("source")).orderBy(col(v))
        val wc = Window.partitionBy(col("source"))
        hist.withColumn("cum", sum(col("c")).over(w))
          .withColumn("n", sum(col("c")).over(wc))
          .withColumn("pos", expr("(n + 1) DIV 2"))
          .filter(col("cum") >= col("pos") &&
            col("cum") - col("c") < col("pos"))
          .select(col("source"), col(v).as(as))
      }
      val med = lowerMedian(docs, "n_chars", "med_chars")
      val dev = docs.join(broadcast(med), Seq("source"))
        .withColumn("dev", abs(col("n_chars") - col("med_chars")))
      val mad = lowerMedian(dev, "dev", "mad_chars")
      dev.join(broadcast(mad), Seq("source"))
        .groupBy(col("source"), col("med_chars"), col("mad_chars"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("dev") > lit(3) * col("mad_chars"), 1L)
            .otherwise(0L)).as("n_outliers"))
        .orderBy(col("source"))
    }),

    "ns48_source_overlap" -> ((s, d) => {
      val grams = Tables.documents(s, d)
        .select(col("source"), explode(shingleHashes(col("text"), 5)).as("g"))
        .distinct()
      val counts = grams.groupBy(col("source")).agg(count(lit(1)).as("cnt"))
      val shared = grams.select(col("g"), col("source").as("src_a"))
        .join(grams.select(col("g"), col("source").as("src_b")), Seq("g"))
        .filter(col("src_a") < col("src_b"))
        .groupBy(col("src_a"), col("src_b"))
        .agg(count(lit(1)).as("shared_grams"))
      shared
        .join(broadcast(counts.select(col("source").as("src_a"),
          col("cnt").as("n_a"))), Seq("src_a"))
        .join(broadcast(counts.select(col("source").as("src_b"),
          col("cnt").as("n_b"))), Seq("src_b"))
        .withColumn("jaccard", col("shared_grams").cast("double")
          / (col("n_a") + col("n_b") - col("shared_grams")).cast("double"))
        .select(col("src_a"), col("src_b"), col("shared_grams"),
          col("n_a"), col("n_b"), col("jaccard"))
        .orderBy(col("src_a"), col("src_b"))
    }),

    // Vocabulary-growth (Heaps-law) curve — the dedup/coverage gauge
    // that tells a curation pipeline whether more of a source still
    // adds vocabulary or just repeats it: ingest the corpus in doc_id
    // order, cut it into 10 arithmetic buckets, and report per bucket
    // the NEW tokens (first occurrence lands in that bucket), the
    // bucket's token volume, and both cumulative curves. A flattening
    // cum_vocab curve ⇒ the source is exhausted. Scale shape: the
    // bucket id is scan-local arithmetic (no global ntile over the
    // corpus), first-occurrence is one (token → min bucket) agg, and
    // the cumulative window runs over exactly 10 rows — bucket-count-
    // bounded metadata, not corpus data.
    "ns47_vocab_growth" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      val n = docs.count()
      val bucket = floor(col("doc_id") * lit(10) / lit(n.toDouble)).cast("int")
      val toks = docs.select(bucket.as("bucket"),
        explode(tokens(col("text"))).as("tok"))
      val firstSeen = toks.groupBy(col("tok"))
        .agg(min(col("bucket")).as("bucket"))
      val newPerBucket = firstSeen.groupBy(col("bucket"))
        .agg(count(lit(1)).as("new_tokens"))
      val totPerBucket = toks.groupBy(col("bucket"))
        .agg(count(lit(1)).as("bucket_tokens"))
      // left join from totals: a late bucket can introduce zero new
      // tokens but still carries volume the cumulative curve must count
      val w = Window.orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      totPerBucket.join(newPerBucket, Seq("bucket"), "left")
        .withColumn("new_tokens", coalesce(col("new_tokens"), lit(0L)))
        .withColumn("cum_vocab", sum(col("new_tokens")).over(w))
        .withColumn("cum_tokens", sum(col("bucket_tokens")).over(w))
        .select(col("bucket"), col("new_tokens"), col("bucket_tokens"),
          col("cum_vocab"), col("cum_tokens"))
        .orderBy(col("bucket"))
    }),

    // Deterministic stratified sampling — the data-mixing step of a
    // training-data pipeline: each document's keep/drop decision is a
    // salted portable hash of its id against a per-source rate (here
    // derived from the source id; in production a mixture-weights map),
    // so the sample is reproducible across runs, engines, and cluster
    // sizes — no RNG, no sort, one scan + one agg shuffle at any scale.
    "ns13_stratified_sample" -> ((s, d) => {
      val nTok = size(tokens(col("text")))
      val rate = lit(100) + lit(40) *
        regexp_extract(col("source"), "\\d+", 0).cast("int")
      val keep = pmod(portableHash(
        concat(lit("sample:"), col("doc_id").cast("string"))), lit(1000)) < rate
      Tables.documents(s, d)
        .select(col("source"), nTok.as("n_tokens"),
          keep.as("keep"), rate.as("rate"))
        .groupBy(col("source"))
        .agg(max(col("rate")).as("rate_per_mille"),
          count(lit(1)).as("n_total"),
          sum(when(col("keep"), 1).otherwise(0)).as("n_kept"),
          sum(when(col("keep"), col("n_tokens")).otherwise(0)).as("kept_tokens"))
        .orderBy(col("source"))
    }),

    // The SCALE-PATH prep pipeline composed end to end: LSH near-dup
    // clusters → keep one canonical document per cluster (smallest id) →
    // per-source accounting of what survived. ns11 is the exact-dedup
    // twin; this is the production path for corpora where exact match is
    // too strict — every stage is oracle-verified alone (ns05, ns12),
    // and this row proves the composition.
    "ns14_neardup_prep" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
        shingleN = 3, k = 64, bands = 16, threshold = 0.8)
      // canonical = label fixpoint rows where id == component: computable
      // on the labels side alone, so the join probes one row per cluster
      // instead of the whole corpus
      val canonical = Dedup.componentLabels(pairs, docs, "doc_id")
        .filter(col("id") === col("component"))
      docs.join(canonical, docs("doc_id") === canonical("id"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"),
          sum(size(tokens(col("text")))).as("kept_tokens"))
        .orderBy(col("source"))
    }),

    // Benchmark decontamination: every training doc (id >= 20) flagged
    // when it shares any 5-token n-gram with the benchmark set (id < 20
    // as the eval stand-in). The benchmark's distinct gram hashes are
    // broadcast; the corpus is scanned once — the standard
    // n-gram-collision decontamination of an LLM data pipeline.
    "ns15_decontaminate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.contaminationFlags(docs.filter(col("doc_id") >= 20),
        docs.filter(col("doc_id") < 20), "doc_id", "text", n = 5)
        .orderBy(col("doc_id"))
    }),

    // Token-budget allocation across sources — the data-mixing step that
    // turns "B tokens, uniform source weights" into per-source
    // deterministic sampling rates: thr_s = min(1000,
    // B·1000 / (n_sources · tokens_s)) per-mille, then the ns13
    // salted-hash keep. All integer arithmetic, so the allocation is
    // reproducible across engines and cluster sizes; two agg shuffles +
    // one broadcast join at any scale.
    "ns16_token_budget_mix" -> ((s, d) => {
      val budgetTokens = 10000L
      val nTok = size(tokens(col("text")))
      val base = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), nTok.as("n_tok"))
      val stats = base.groupBy(col("source"))
        .agg(sum(col("n_tok")).as("tokens_total"))
      val rates = stats
        .crossJoin(broadcast(stats.select(count(lit(1)).as("n_sources"))))
        .withColumn("thr_per_mille", least(lit(1000L),
          expr(s"${budgetTokens * 1000L} div (n_sources * tokens_total)")))
      val keep = pmod(portableHash(
        concat(lit("mix:"), col("doc_id").cast("string"))), lit(1000)) <
        col("thr_per_mille")
      base.join(broadcast(rates), Seq("source"))
        .groupBy(col("source"), col("tokens_total"), col("thr_per_mille"))
        .agg(sum(when(keep, 1).otherwise(0)).as("n_kept"),
          sum(when(keep, col("n_tok")).otherwise(0)).as("kept_tokens"))
        .orderBy(col("source"))
    }),

    // Temperature-weighted source mixing — the DoReMi/Gopher-style
    // refinement of ns16's uniform split: a source's budget share is
    // tokens_s^α / Σ tokens_t^α, so α=1 reproduces natural proportions,
    // α→0 approaches uniform, and the classic α=1/2 (used here) damps
    // a 100× size gap to 10×. Determinism without float-fold tricks:
    // IEEE sqrt is correctly rounded, so quantizing each weight to
    // 2^-20 units BEFORE the cross-source sum keeps every later step —
    // sum, products, floor-div — in order-free integer arithmetic
    // (the ns36/vs19 pattern), bit-reproducible on any engine and any
    // partitioning. Products ride decimal(38,0), overflow-free at any
    // corpus size. Scale shape: two agg shuffles (per-source totals, a
    // sources-count-sized weight sum) + one broadcast join back; the
    // keep decision is the ns13 salted-hash per-mille gate, scan-local.
    "ns42_temperature_mix" -> ((s, d) => {
      val budgetTokens = 10000L
      val base = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          size(tokens(col("text"))).as("n_tok"))
      val stats = base.groupBy(col("source"))
        .agg(sum(col("n_tok")).as("tokens_total"))
        .withColumn("w_q",
          floor(sqrt(col("tokens_total").cast("double")) * lit(1048576L))
            .cast("long"))
      val tot = stats.agg(sum(col("w_q")).as("w_total"))
      val rates = stats.crossJoin(broadcast(tot))
        .withColumn("thr_per_mille", least(lit(1000L),
          expr(s"(CAST(w_q AS DECIMAL(38,0)) * ${budgetTokens * 1000L}) div " +
            "(CAST(w_total AS DECIMAL(38,0)) * tokens_total)")))
      val keep = pmod(portableHash(
        concat(lit("tmix:"), col("doc_id").cast("string"))), lit(1000)) <
        col("thr_per_mille")
      base.join(broadcast(rates), Seq("source"))
        .groupBy(col("source"), col("tokens_total"), col("w_q"),
          col("thr_per_mille"))
        .agg(sum(when(keep, 1).otherwise(0)).as("n_kept"),
          sum(when(keep, col("n_tok")).otherwise(0)).as("kept_tokens"))
        .orderBy(col("source"))
    }),

    // The composed training-data-prep pipeline in one plan: quality gate
    // (token-count band + stopword presence) → exact dedup (min doc_id
    // per text) → per-source accounting of what survived. Each stage is
    // verified alone (ns01/ns02); this proves they compose — one scan,
    // one dedup shuffle, one agg shuffle, all codegen.
    "ns11_prep_pipeline" -> ((s, d) => {
      val t = tokens(col("text"))
      val gated = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("text"),
          size(t).as("n_tokens"),
          size(filter(t, w => w.isin(stopEn: _*))).as("n_stop"))
        .filter(col("n_stop") > 0 &&
          col("n_tokens") >= 20 && col("n_tokens") <= 200)
      val keep = gated.groupBy(col("text")).agg(min(col("doc_id")).as("doc_id"))
      gated.join(keep, Seq("text", "doc_id"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens_total"))
        .orderBy(col("source"))
    }),

    // Filter-funnel ablation — the observability table every corpus
    // pipeline publishes (Dolma/FineWeb style): how many documents
    // survive each gate APPLIED IN SEQUENCE, so a rule's marginal cost
    // is visible before it ships. Gates: token-length band → contains a
    // stopword → declared-English → exact-dedup representative. One
    // scan + one dedup shuffle + one single-row aggregate; every count
    // is an exact integer, so the funnel is engine-exact at any scale.
    "ns43_filter_funnel" -> ((s, d) => {
      val t = tokens(col("text"))
      val flags = Tables.documents(s, d)
        .select(col("doc_id"), col("text"), col("lang"),
          size(t).as("n_tok"),
          (size(filter(t, w => w.isin(stopEn: _*))) > 0).as("has_stop"))
      val keep = flags.groupBy(col("text")).agg(min(col("doc_id")).as("keep_id"))
      flags.join(keep, Seq("text"))
        .select(
          (col("n_tok") >= 10 && col("n_tok") <= 400).as("p_len"),
          col("has_stop").as("p_stop"),
          (col("lang") === "en").as("p_lang"),
          (col("doc_id") === col("keep_id")).as("p_dedup"))
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("p_len"), 1L).otherwise(0L)).as("after_length"),
          sum(when(col("p_len") && col("p_stop"), 1L).otherwise(0L))
            .as("after_stopword"),
          sum(when(col("p_len") && col("p_stop") && col("p_lang"), 1L)
            .otherwise(0L)).as("after_lang"),
          sum(when(col("p_len") && col("p_stop") && col("p_lang") &&
            col("p_dedup"), 1L).otherwise(0L)).as("after_dedup"))
    }),

    // Canonical text normalization — the first stage of every training
    // pipeline: casefold → strip non-alphanumerics → collapse runs of
    // spaces → trim. Pure scan-local codegen'd string expressions (no
    // shuffle at all until the final order); the patterns are RE2-safe
    // so the DuckDB oracle states the identical transform.
    "ns21_normalize_text" -> ((s, d) => {
      val norm = trim(regexp_replace(regexp_replace(
        lower(col("text")), "[^a-z0-9 ]", " "), " +", " "))
      Tables.documents(s, d)
        .select(col("doc_id"), norm.as("norm_text"),
          size(split(norm, " ")).as("n_tokens_norm"))
        .orderBy(col("doc_id"))
    }),

    // Single-pass column profiling (the Deequ/data-quality shape): one
    // aggregate computes per-column null rates, distinct counts, and
    // ranges — no per-column jobs, no second scan. At 100 TB this is
    // the profile you run before training: one scan, one partial+final
    // agg, distincts exact here (swap in approx_count_distinct/HLL at
    // vocabularies where exact no longer pays).
    "ns20_column_profile" -> ((s, d) => {
      Tables.documents(s, d).agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("text").isNull, 1).otherwise(0)).as("text_nulls"),
        count_distinct(col("source")).as("source_distinct"),
        count_distinct(col("lang")).as("lang_distinct"),
        min(col("n_chars")).as("n_chars_min"),
        max(col("n_chars")).as("n_chars_max"),
        sum(col("n_chars").cast("long")).as("n_chars_sum"),
        min(col("doc_id")).as("doc_id_min"),
        max(col("doc_id")).as("doc_id_max"))
    }),

    // Heavy hitters via the SpaceSaving sketch — the fixed-memory form
    // of ns10's exact token ranking: partials keep `capacity` counters
    // per partition, so the shuffle is O(partitions × capacity) at any
    // vocabulary size. The fixture vocabulary fits the capacity, so the
    // sketch is exact here and sits under ns10's oracle law; the
    // approximate regime's guarantees (upper bounds, guaranteed
    // presence above n/capacity) are spec-pinned.
    "ns19_heavy_hitters" -> ((s, d) => {
      Tables.documents(s, d)
        .select(explode(tokens(col("text"))).as("token"))
        .agg(graft.functions.SpaceSavingTopK
          .heavyHitters(col("token"), capacity = 4096, k = 20).as("hh"))
        .select(explode(col("hh")).as("h"))
        .select(col("h.item").as("token"), col("h.est").as("n"),
          col("h.err").as("err"))
        .orderBy(col("n").desc, col("token").asc)
    }),

    // The multimodal tier composed into the ANN tier: payload-attach →
    // per-partition feature decode (the mapInPandas-shaped stub; at
    // deploy time the codec call replaces FakeDecoder) → brute-force
    // cosine top-k over the decoded embeddings. Fully oracle-gated: the
    // fake decode is deterministic byte math, so DuckDB replays it
    // (64-bit wrap in HUGEINT; the documents fixture is ASCII, so
    // codepoints == UTF-8 bytes), and the cosine tier is vs01's.
    // Frame sampling — the video tier's explode shape: every payload
    // demuxed (stub: fixed 16-byte frames), every 2nd frame kept up to
    // 4 per media row, each sampled frame decoded through the
    // partition-batched decoder (frame identity rides a composite id).
    // Sampling is row-local codegen'd arithmetic pushed to the scan;
    // fan-out is hard-capped at maxFrames rows per media row, so the
    // explode never amplifies a 100 TB corpus by more than 4×; the
    // decode is ns18's honest stub with real batch plumbing, and the
    // whole chain — frame boundaries, remainder tail frame, per-frame
    // fold, feature arithmetic — is replayed by the oracle byte for
    // byte.
    "ns56_frame_sample" -> ((s, d) => {
      import graft.operators.Multimodal
      val media = Multimodal.attachPayload(
        Tables.documents(s, d), "doc_id", "text", "text/plain")
      val frames = Multimodal.sampleFrames(media,
        frameBytes = 16, stride = 2, maxFrames = 4)
      val feats = Multimodal.extractFeatures(
        frames.select((col("media_id") * 1000 + col("frame_idx"))
            .as("media_id"), col("frame").as("payload")), dim = 4)
        .toDF()
        .select(col("media_id").as("cid"),
          element_at(col("features"), 1).as("f0"))
      frames
        .withColumn("cid", col("media_id") * 1000 + col("frame_idx"))
        .join(feats, Seq("cid"))
        .select(col("media_id"), col("frame_idx"),
          octet_length(col("frame")).as("n_frame_bytes"),
          col("f0").cast("double").as("f0"))
        .orderBy(col("media_id"), col("frame_idx"))
    }),

    "ns18_multimodal_ann" -> ((s, d) => {
      import graft.operators.{Multimodal, Similarity}
      val media = Multimodal.attachPayload(
        Tables.documents(s, d), "doc_id", "text", "text/plain")
      val feats = Multimodal.extractFeatures(media, dim = 4).toDF()
        .select(col("media_id").as("vec_id"), col("features").as("embedding"))
      Similarity.bruteForceTopK(feats.filter(col("vec_id") < 3), feats, k = 5)
        .orderBy(col("query_id"), col("rank"))
    }),

    // Deterministic k-per-group sampling via the bounded bottom-k
    // aggregate: the k docs with the smallest salted portable hash per
    // source. Unlike the window form (q05 — shuffles every row to sort
    // it), the heap aggregate ships at most k pairs per (partition,
    // group) into the final shuffle: at 100 TB the shuffle carries the
    // sample, not the corpus. No RNG — the same rows come back on any
    // cluster size, and the oracle replays the pick exactly.
    "ns17_bottomk_sample" -> ((s, d) => {
      val h = graft.functions.TextFunctions.portableHash(
        concat(lit("bk:"), col("doc_id").cast("string")))
      Tables.documents(s, d)
        .select(col("source"), col("doc_id"), h.as("h"))
        .groupBy(col("source"))
        .agg(graft.functions.BottomK.bottomK(col("h"), col("doc_id"), 5)
          .as("picks"))
        .select(col("source"), explode(col("picks")).as("p"))
        .select(col("source"), col("p.h").as("h"), col("p.id").as("doc_id"))
        .orderBy(col("source"), col("h"), col("doc_id"))
    }),

    // Gopher-style repetition signals — the quality filters that drop
    // boilerplate and degenerate documents before training (Rae et al.
    // 2021 §A1.1): per document, the fraction of tokens that belong to
    // repeated tokens and the share of the single most frequent token.
    // One explode + two keyed aggregations; the (doc_id, token) partial
    // agg collapses repeats map-side, so the shuffle carries distinct
    // (doc, token) pairs — not the token stream — at any corpus size.
    "ns22_repetition_stats" -> ((s, d) => {
      val perTok = Tables.documents(s, d)
        .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
        .groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("c"))
      perTok.groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_tokens"),
          count(lit(1)).as("n_distinct"),
          max(col("c")).as("top_token_count"),
          sum(when(col("c") > 1, col("c")).otherwise(0L)).as("dup_tokens"))
        .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
          col("top_token_count"),
          (col("dup_tokens").cast("double") / col("n_tokens").cast("double"))
            .as("dup_token_frac"),
          (col("top_token_count").cast("double") / col("n_tokens").cast("double"))
            .as("top_token_frac"))
        .orderBy(col("doc_id"))
    }),

    // PII pseudonymization — the privacy pass of a training-data
    // pipeline: direct identifiers are replaced by a salted
    // deterministic hash (referential integrity survives — the same
    // user maps to the same pseudonym everywhere, across engines and
    // cluster sizes), and digit runs inside free-form payloads are
    // redacted. All scan-local codegen'd expressions; the only shuffle
    // is the final presentation sort.
    "ns23_pii_pseudonymize" -> ((s, d) => {
      Tables.events(s, d).select(
        col("event_id"),
        portableHash(concat(lit("pii:"), col("user_id").cast("string")))
          .as("user_pseudonym"),
        regexp_replace(col("props"), "[0-9]+", "#").as("props_redacted"),
        col("event_type"))
        .orderBy(col("event_id"))
    }),

    // Inter-document chunk-level dedup — the sub-document boilerplate
    // detector (the line-dedup of CCNet/RefinedWeb, stated over token
    // chunks since the corpus has no newlines): non-overlapping
    // 10-token chunks are hashed, chunks appearing in more than one
    // document are flagged, and each document reports its shared-chunk
    // fraction. Scale shape: the chunk stream shuffles on chunk_hash
    // twice (frequency agg + join probe side — both partial-agg
    // compacted map-side); the frequency table arrives at the join
    // already hash-partitioned by its own agg, so the join adds no
    // third exchange; then one per-doc agg.
    "ns28_chunk_dedup" -> ((s, d) => {
      val t = tokens(col("text"))
      val chunks = Tables.documents(s, d)
        .select(col("doc_id"), t.as("t"),
          explode(sequence(lit(0), size(t) - 1, lit(10))).as("start"))
        .select(col("doc_id"), portableHash(
          array_join(slice(col("t"), col("start") + 1, lit(10)), " "))
          .as("chunk_hash"))
      val freq = chunks.groupBy(col("chunk_hash"))
        .agg(count_distinct(col("doc_id")).as("n_docs_with"))
      chunks.join(freq, Seq("chunk_hash"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("n_docs_with") > 1, 1L).otherwise(0L))
            .as("n_shared_chunks"))
        .select(col("doc_id"), col("n_chunks"), col("n_shared_chunks"),
          (col("n_shared_chunks").cast("double") /
            col("n_chunks").cast("double")).as("shared_frac"))
        .orderBy(col("doc_id"))
    }),

    // Deterministic train/val/test split — the final assignment step of
    // a data-mixing pipeline: each document lands in exactly one split
    // by salted portable hash (98/1/1 per mille), so the partition is
    // reproducible across engines and cluster sizes, disjoint and
    // exhaustive by construction (one hash, three disjoint ranges — no
    // RNG, no sort, no leakage between splits). One scan + one agg
    // shuffle; the oracle replays the assignment exactly.
    "ns27_train_val_test" -> ((s, d) => {
      val h = pmod(portableHash(
        concat(lit("split:"), col("doc_id").cast("string"))), lit(1000))
      val split = when(h < 980, "train").when(h < 990, "val").otherwise("test")
      Tables.documents(s, d)
        .select(col("source"), split.as("split"),
          size(tokens(col("text"))).as("n_tokens"))
        .groupBy(col("source"), col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens").cast("long")).as("n_tokens_total"))
        .orderBy(col("source"), col("split"))
    }),

    // Count-Min frequency sketch — the fixed-memory "how frequent is
    // THIS token" twin of ns19's "which tokens are frequent": a
    // depth×width counter grid per partial buffer, merged cell-wise, so
    // the shuffle is O(partitions × depth × width) at any stream size.
    // Width ≫ vocabulary puts the fixture in the exact (collision-free)
    // regime, so the DuckDB oracle states plain exact counts; the
    // over-count bound and merge determinism are spec-pinned.
    "ns26_countmin_freq" -> ((s, d) => {
      val probes = Seq("agg", "data", "join", "key", "row", "scan",
        "table", "value")
      Tables.documents(s, d)
        .select(explode(tokens(col("text"))).as("token"))
        .agg(graft.functions.CountMinFreq
          .freq(col("token"), probes, depth = 5, width = 16384).as("f"))
        .select(explode(col("f")).as("p"))
        .select(col("p.item").as("token"), col("p.est").as("n"))
        .filter(col("n") > 0)
        .orderBy(col("token"))
    }),

    // Document chunking with stride — the context-window prep step of a
    // training/embedding pipeline: each document becomes overlapping
    // token windows (size 20, stride 10), each chunk re-joined to text
    // with its token count. Scan-local explode (no shuffle until the
    // presentation sort); chunk identity is (doc_id, chunk_id), so
    // downstream embedding/dedup stages key on it deterministically.
    "ns25_chunking" -> ((s, d) => {
      val chunkSize = 20
      val stride = 10
      val t = tokens(col("text"))
      Tables.documents(s, d)
        .select(col("doc_id"), t.as("t"))
        .select(col("doc_id"), col("t"),
          explode(sequence(lit(0), size(col("t")) - 1, lit(stride))).as("start"))
        .select(col("doc_id"),
          (col("start") / stride).cast("long").as("chunk_id"),
          array_join(slice(col("t"), col("start") + 1, lit(chunkSize)), " ")
            .as("chunk_text"),
          size(slice(col("t"), col("start") + 1, lit(chunkSize)))
            .as("n_chunk_tokens"))
        .orderBy(col("doc_id"), col("chunk_id"))
    }),

    // TF-IDF-shaped distinctiveness ranking: each document's most
    // distinctive token by tf × (N/df). The weight stays log-free on
    // purpose — ln() is not correctly rounded and differs across libm
    // implementations, while count × (exact-int division) is two
    // correctly-rounded IEEE ops, bit-identical on any engine — same
    // ranking semantics, oracle-exact. Scale shape: the document
    // frequency table is vocabulary-sized → broadcast to the corpus-side
    // (doc, token, tf) rows; the only corpus shuffles are the (doc,
    // token) partial agg and the per-doc argmax window.
    "ns24_tfidf_top_token" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      val perTok = docs
        .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
        .groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("tf"))
      val df = perTok.groupBy(col("tok"))
        .agg(count(lit(1)).as("df"))
      val n = docs.count()
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("tok").asc)
      perTok.join(broadcast(df), Seq("tok"))
        .withColumn("score",
          col("tf").cast("double") * (lit(n).cast("double") / col("df").cast("double")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("tok").as("top_token"),
          col("tf"), col("df"), col("score"))
        .orderBy(col("doc_id"))
    }),

    // BM25 lexical retrieval (Robertson k1=1.2, b=0.75): top-10 docs per
    // literal query. The idf keeps the classic (N-df+0.5)/(df+0.5) ratio
    // but stays log-free — ln() is not correctly rounded and differs
    // across libm builds, while the ratio is two IEEE ops, bit-identical
    // on any engine (log is monotone, so each term's doc ordering is
    // unchanged; cross-term weighting is the documented variant). The
    // per-(query,doc) score sums matched-term scores via an in-order
    // fold over the tok-sorted list — the one summation order both
    // engines reproduce exactly (see Q's oracle-parity rule; decimal
    // casts would lose the quotient bits that distinguish near-ties).
    // Scale shape: tf is one (doc_id, tok) partial agg over the exploded
    // corpus; df is vocabulary-sized → broadcast; the query set is tiny
    // → broadcast; the top-k window sees only matched candidates.
    "ns29_bm25_topk" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      import s.implicits._
      val qterms = Seq(
        0L -> "spark", 0L -> "join", 0L -> "window",
        1L -> "hash", 1L -> "merge", 1L -> "sort",
        2L -> "stream", 2L -> "batch", 2L -> "filter")
        .toDF("query_id", "tok")
      val byDoc = bm25Scores(Tables.documents(s, d), qterms, excludeSelf = false)
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("bm25").desc, col("doc_id").asc)
      byDoc.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .select(col("query_id"), col("rank"), col("doc_id"), col("bm25"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // Collocation mining: token pairs that co-occur in documents far
    // more than independence predicts — PMI's argument as the log-free
    // LIFT ratio p(a,b)/(p(a)p(b)) = (c_ab·N)/(c_a·c_b) over document
    // frequencies (log is monotone → identical ranking, and the ratio is
    // three correctly-rounded IEEE ops — oracle-exact). Support floor
    // c_ab ≥ 5 drops noise pairs. Scale shape: the exploded corpus is
    // prefiltered to frequent tokens BEFORE the per-doc self-join — a
    // lossless bound, because c_ab ≤ min(c_a, c_b) means the support
    // floor can never keep a pair involving a token with c_a < 5, and
    // the rare-token tail is most of any natural vocabulary (Zipf).
    // Pairs are then bounded by (frequent tokens per doc)², one (a,b)
    // partial agg, and the global top-20 is orderBy().limit() — a
    // distributed TakeOrderedAndProject (per-partition heaps, k rows to
    // the driver), never a single-partition window sort.
    "ns34_collocation" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val nd = docs.count().toDouble
      val td = docs.select(col("doc_id"),
        explode(array_distinct(tokens(col("text")))).as("tok"))
      val ca = td.groupBy(col("tok")).agg(count(lit(1)).as("ca"))
      val freq = ca.filter(col("ca") >= 5)
      val tdf = td.join(broadcast(freq.select(col("tok"))), Seq("tok"), "left_semi")
      val pairs = tdf.select(col("doc_id"), col("tok").as("ta"))
        .join(tdf.select(col("doc_id"), col("tok").as("tb")), Seq("doc_id"))
        .filter(col("ta") < col("tb"))
      val cab = pairs.groupBy(col("ta"), col("tb")).agg(count(lit(1)).as("cab"))
      val lifted = cab
        .join(broadcast(freq.select(col("tok").as("ta"), col("ca").as("c_a"))), Seq("ta"))
        .join(broadcast(freq.select(col("tok").as("tb"), col("ca").as("c_b"))), Seq("tb"))
        .filter(col("cab") >= 5)
        .withColumn("lift",
          (col("cab").cast("double") * lit(nd)) /
            (col("c_a").cast("double") * col("c_b").cast("double")))
      lifted
        .orderBy(col("lift").desc, col("ta").asc, col("tb").asc)
        .limit(20)
        .select(col("ta"), col("tb"), col("cab"), col("lift"))
        .orderBy(col("lift").desc, col("ta"), col("tb"))
    }),

    // Domain shift per source: total-variation distance between each
    // source's token distribution and the whole corpus's — the
    // data-mixing diagnostic that flags sources whose language diverges
    // from the blend (Gopher/DoReMi-style mixture tuning reads exactly
    // this signal; TV is the log-free metric, so no KL/entropy
    // nondeterminism). Determinism without fold tricks: over the
    // source's own vocabulary, Σ|p_s−p| = Σ|c_st·N − c_t·n_s|/(n_s·N)
    // has an INTEGER numerator summed order-free; the absent-token tail
    // is Σ_{t∉Vs} p = (N − Σ_{t∈Vs} c_t)/N, integer again. Two exact
    // sums, two divisions, one add, one multiply — oracle-bit-exact.
    // Scale shape: one (source, tok) partial agg over the exploded
    // corpus; the global df table is vocabulary-sized → broadcast; the
    // per-source totals are |sources| rows → broadcast.
    "ns36_domain_shift" -> ((s, d) => {
      val td = Tables.documents(s, d)
        .select(col("source"), explode(tokens(col("text"))).as("tok"))
      val n = td.count()
      val per = td.groupBy(col("source"), col("tok"))
        .agg(count(lit(1)).as("c_st"))
      val glob = per.groupBy(col("tok")).agg(sum(col("c_st")).as("c_t"))
      val totS = per.groupBy(col("source")).agg(sum(col("c_st")).as("n_s"))
      per.join(broadcast(glob), Seq("tok"))
        .join(broadcast(totS), Seq("source"))
        .groupBy(col("source"), col("n_s"))
        .agg(
          // Multiply in decimal, not long: at a ~3e9-token corpus the
          // long products c_st·N / c_t·n_s would wrap before the cast.
          sum(abs(col("c_st").cast("decimal(38,0)") * lit(n)
              - col("c_t").cast("decimal(38,0)") * col("n_s"))).as("s1"),
          sum(col("c_t")).as("s2"),
          count(lit(1)).as("vocab"))
        .select(col("source"), col("n_s").as("n_tokens"), col("vocab"),
          (lit(0.5) * (col("s1").cast("double")
              / (col("n_s") * lit(n)).cast("double")
            + (lit(n) - col("s2")).cast("double") / lit(n.toDouble)))
            .as("tv"))
        .orderBy(col("source"))
    }),

    // Triangle counting + local clustering coefficients over the
    // fuzzy-match graph (ns31's verified edge set) — the third
    // graph-analytics member beside ns12's connected components and
    // ns32's PageRank; triangle density separates genuine duplicate
    // clusters from chains of coincidental matches. Scale shape: the
    // classic degree-oriented distributed count — each undirected edge
    // points from its lower-(degree, id) endpoint to the higher, so
    // wedge enumeration fans out only from LOW-degree endpoints
    // (oriented out-degree is O(√m) on any graph) and each triangle is
    // found exactly once, never 3×. Wedge + closure are shuffled
    // equi-joins (node key, then edge key); per-node counts are one
    // partial agg over the exploded corners. All counts are exact
    // integers; lcc = 2·tri/(deg·(deg−1)) is one IEEE division —
    // oracle-exact.
    "ns35_triangles" -> ((s, d) => {
      val toks = tokens(col("text"))
      val t = Tables.documents(s, d).select(col("doc_id"),
        array_join(slice(toks, lit(1), lit(3)), " ").as("title"),
        element_at(toks, 1).as("blk"))
      val a = t.select(col("doc_id").as("id_a"), col("title").as("title_a"),
        col("blk"))
      val b = t.select(col("doc_id").as("id_b"), col("title").as("title_b"),
        col("blk"))
      val pairs = a.join(b, Seq("blk")).filter(col("id_a") < col("id_b"))
        .filter(levenshtein(col("title_a"), col("title_b")) <= 5)
        .select(col("id_a"), col("id_b"))
      graft.operators.GraphOps.triangleCounts(pairs, "id_a", "id_b")
        .withColumnRenamed("v", "doc_id")
        .orderBy(col("doc_id"))
    }),

    // Duplicated-span fraction per document (Lee et al. 2022): the share
    // of a doc's distinct 3-token shingles with corpus doc-frequency ≥ 2.
    // Flags boilerplate smeared across MANY documents — invisible to
    // pairwise near-dup (ns04/ns05), which normalizes per pair. Plan:
    // explode → shingle-keyed doc-frequency agg (map-side partials) →
    // equi-join back on the shingle → per-doc agg. No shingle-keyed
    // window, so hub shingles stay AQE-splittable.
    "ns37_dup_span" -> ((s, d) => {
      Dedup.dupSpanStats(Tables.documents(s, d), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"))
    }),

    // Substring-level near-dup candidates via MOSS winnowing
    // (Schleimer et al. 2003): min-hash per sliding window over the
    // position-ordered shingle-hash sequence; pairs sharing ≥ 2 selected
    // fingerprints. Catches copied PASSAGES between documents whose
    // whole-document Jaccard is near 0. The df ≤ 10 stopword-print cut
    // bounds per-fingerprint join fan-out (the standard frequency guard
    // in fingerprint dedup) — equi-join only, no cross join.
    "ns38_winnow_pairs" -> ((s, d) => {
      Dedup.winnowedPairs(Tables.documents(s, d), "doc_id", "text",
        shingleN = 3, window = 4, minShared = 2, maxDf = 10)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // UNBLOCKED all-pairs containment via prefix filtering (SSJoin/
    // PPJoin): df-ascending-ordered prefixes make every qualifying pair
    // share a prefix hash with the min side — the scale path for the
    // subset-duplication face ns33's length blocking scopes out, at
    // precision 1 (exact merge verification). Oracle is full quadratic
    // brute force: the prefix filter must lose nothing.
    "ns39_prefix_containment" -> ((s, d) => {
      Dedup.prefixContainmentPairs(Tables.documents(s, d), "doc_id", "text",
        shingleN = 3, threshold = 0.8)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Weighted sparse-vector similarity: tf·tf cosine top-3 neighbors
    // per document over hashed 3-shingles with a df-capped vocabulary —
    // the posting-list join that scores REPETITION where ns04/ns39/ns40
    // score presence. All sums are int64 (no reduction-order risk); the
    // score is one fixed-order double expression, so the oracle
    // hash-matches exactly.
    "ns57_tf_cosine_topk" -> ((s, d) => {
      Dedup.tfCosineTopK(Tables.documents(s, d), "doc_id", "text",
        shingleN = 3, dfCap = 64, k = 3)
        .orderBy(col("doc_id"), col("rank"))
    }),

    // Cross-source LEAKAGE MATRIX: ns05's verified near-dup pairs rolled
    // up to (source, source) cells — the split-hygiene audit ("which
    // sources share near-identical documents?") run before any
    // source-partitioned train/eval split. Unordered cells are
    // canonicalized lexicographically (least/greatest), so within-source
    // duplication lands on the diagonal. Scale shape: the LSH pair set
    // (never all-pairs) plus two id-keyed hash joins back to the doc
    // metadata and one bounded agg — output is |sources|², metadata-
    // sized.
    "ns59_cross_source_dups" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
        shingleN = 3, k = 64, bands = 16, threshold = 0.8)
      val src = docs.select(col("doc_id"), col("source"))
      pairs
        .join(src.withColumnRenamed("doc_id", "id_a")
          .withColumnRenamed("source", "src_a"), "id_a")
        .join(src.withColumnRenamed("doc_id", "id_b")
          .withColumnRenamed("source", "src_b"), "id_b")
        .groupBy(least(col("src_a"), col("src_b")).as("source_a"),
          greatest(col("src_a"), col("src_b")).as("source_b"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("source_a"), col("source_b"))
    }),

    // SEQUENCE PACKING — the loader-side "concat-and-chunk" step: lay
    // documents end to end in doc_id order and cut 256-token training
    // sequences. Each doc's global start offset comes from the
    // distributed two-phase prefix sum in operators.Packing (per-range
    // partial sums → one metadata-sized carry window → within-range
    // windows), so there is NO corpus-sized window partition anywhere;
    // PlanAuditSpec pins both window shapes.
    "ns60_sequence_packing" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), size(tokens(col("text"))).as("n_tok"))
      Packing.packSequences(docs, "doc_id", "n_tok", budget = 256)
        .withColumnRenamed("weight", "n_tokens")
        .orderBy(col("doc_id"))
    }),

    // The chunk table ns60 implies — the loader's read plan: one row
    // per (bin, doc) segment with the doc-local token range that bin
    // consumes; docs crossing a bin boundary appear once per bin.
    // Generator fan-out is bounded by each row's own length/budget.
    "ns61_pack_chunks" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), size(tokens(col("text"))).as("n_tok"))
      Packing.packChunks(docs, "doc_id", "n_tok", budget = 256)
        .orderBy(col("bin"), col("doc_id"))
    }),

    // The TRAINED tokenizer composed into packing — ns60 packs by
    // whitespace counts, but a real loader packs by what the tokenizer
    // actually emits: per-doc BPE token costs under ns52's five merges
    // (ns55's lookup discipline — a word's encoded length is an exact
    // join against the vocabulary-sized post-merge word table, never a
    // per-document re-encoding), fed into ns60's two-phase prefix-sum
    // bins. Docs whose every token is empty contribute no cost rows and
    // consume no budget. Scale shape: ns55's one token-stream scan +
    // broadcast word table produce the per-doc COST TABLE, which is
    // materialized as a parquet artifact (the round-14 model-
    // materialization rule — packSequences consumes its input in two
    // branches, and rescanning a 2-column artifact beats recomputing
    // the corpus join+agg per branch); packing's bucket-bounded carry
    // window then runs entirely off the artifact.
    "ns66_bpe_packing" -> ((s, d) => {
      val words = bpeTrain(s, d, rounds = 5)._1
      val wt = words.select(concat_ws("", col("cs")).as("tok"),
        size(col("cs")).cast("long").as("n_seg"))
      val costDir = freshDir("ns66-costs")
      Tables.documents(s, d)
        .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
        .filter(length(col("tok")) > 0)
        .join(broadcast(wt), Seq("tok"))
        .groupBy(col("doc_id"))
        .agg(sum(col("n_seg")).as("n_bpe"))
        .write.mode("overwrite").parquet(costDir)
      Packing.packSequences(s.read.parquet(costDir), "doc_id", "n_bpe",
          budget = 512)
        .withColumnRenamed("weight", "n_bpe_tokens")
        .orderBy(col("doc_id"))
    }),

    // The CHUNK TABLE of ns66 — what a loader actually reads: one row
    // per (bin, doc) segment with the doc-local BPE-token range that
    // bin consumes, docs crossing a bin boundary appearing once per
    // bin. Same cost artifact, same budget; every bin except the last
    // holds exactly 512 trained-tokenizer tokens by construction
    // (PackingSpec pins the fullness property on the lookup-cost
    // composition).
    "ns67_bpe_pack_chunks" -> ((s, d) => {
      val words = bpeTrain(s, d, rounds = 5)._1
      val wt = words.select(concat_ws("", col("cs")).as("tok"),
        size(col("cs")).cast("long").as("n_seg"))
      val costDir = freshDir("ns67-costs")
      Tables.documents(s, d)
        .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
        .filter(length(col("tok")) > 0)
        .join(broadcast(wt), Seq("tok"))
        .groupBy(col("doc_id"))
        .agg(sum(col("n_seg")).as("n_bpe"))
        .write.mode("overwrite").parquet(costDir)
      Packing.packChunks(s.read.parquet(costDir), "doc_id", "n_bpe",
          budget = 512)
        .orderBy(col("bin"), col("doc_id"))
    }),

    // DSIR importance weights (Xie et al. 2023, "Data Selection for
    // Language Models via Importance Resampling"): score every raw
    // document by how target-like its hashed-bigram feature profile is.
    // Features are bigrams hashed into B=64 buckets; the target model is
    // the bucket distribution of a curated slice (sources src0–src3
    // stand in for the high-quality domain), the raw model is the whole
    // corpus; each doc's weight is the product over its feature
    // OCCURRENCES of the add-one-smoothed ratio
    // p_t(f)/p_r(f) = ((ct+1)/(Nt+B)) / ((cr+1)/(Nr+B)). Log-free by
    // the ns30 rule (ln is not correctly rounded; the raw product is):
    // each ratio is (ct+1)/(cr+1) · (Nr+B)/(Nt+B) — two exact
    // int64→double conversions per division (counts < 2^53 even at
    // 100 TB), each division and the multiply one IEEE op, folded in
    // bigram position order, so both engines agree bit-exactly.
    // Scale shape: the feature-count table is B-sized (both models in
    // ONE corpus-pass agg — the target count is a conditional sum, not
    // a second scan) → broadcast back onto the exploded corpus; the
    // per-doc fold is ns30's. Nt/Nr are a 2-value driver aggregate of
    // the B-row table (metadata-bounded, the bm25Scores precedent).
    "ns62_dsir_weights" -> ((s, d) => {
      val B = 64
      val isTarget = col("source").isin("src0", "src1", "src2", "src3")
      val t = tokens(col("text"))
      val bg = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), posexplode(
          zip_with(slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
            (a, b) => struct(a.as("a"), b.as("b")))).as(Seq("pos", "ab")))
        .select(col("doc_id"), col("source"), col("pos"),
          pmod(graft.functions.TextFunctions.portableHash(
            concat(col("ab.a"), lit("_"), col("ab.b"))), lit(B.toLong)).as("f"))
      // Materialize the B-row model table once (the ns63 artifact
      // discipline): the scalar totals and the broadcast ratio join
      // both read it, so the corpus contributes exactly one model scan.
      val cntDir = freshDir("ns62-model")
      bg.groupBy(col("f")).agg(
          count(lit(1)).as("cr"),
          sum(when(isTarget, lit(1L)).otherwise(lit(0L))).as("ct"))
        .write.mode("overwrite").parquet(cntDir)
      val cnt = s.read.parquet(cntDir)
      val tot = cnt.agg(sum(col("cr")).as("nr"), sum(col("ct")).as("nt")).head()
      val (nr, nt) = (tot.getLong(0), tot.getLong(1))
      require(nt > 0, "ns62: target slice contributed no bigram features")
      val ratio = ((col("ct") + lit(1L)).cast("double") /
          (col("cr") + lit(1L)).cast("double")) *
        (lit(nr + B).cast("double") / lit(nt + B).cast("double"))
      bg.join(broadcast(cnt.select(col("f"), ratio.as("r"))), Seq("f"))
        .groupBy(col("doc_id"), col("source"))
        .agg(count(lit(1)).as("n_feats"),
          aggregate(array_sort(collect_list(struct(col("pos"), col("r")))),
            lit(1.0), (acc, x) => acc * x.getField("r")).as("dsir_weight"))
        .orderBy(col("doc_id"))
    }),

    // Language-ID CONFUSION MATRIX — ns03's heuristic classifier
    // evaluated against the gold `lang` column, the way a pipeline
    // qualifies its cheap classifier before trusting it to route
    // documents: one (declared, predicted) cell count per pair plus
    // each cell's share of its declared language (the row-normalized
    // recall view; diagonal share = per-language recall). Scale shape:
    // one corpus scan into a |langs|²-bounded cell agg; the
    // per-declared totals come from a window over the CELL table
    // (metadata-sized — no second corpus scan, no artifact needed).
    "ns65_langid_confusion" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val t = tokens(col("text"))
      def score(ws: Seq[String]) = size(filter(t, w => w.isin(ws: _*)))
      val (se, sd2, sf) = (score(stopEn), score(stopDe), score(stopFr))
      val pred = when(se >= sd2 && se >= sf, "en")
        .when(sd2 >= sf, "de").otherwise("fr")
      Tables.documents(s, d)
        .groupBy(col("lang").as("declared_lang"), pred.as("predicted_lang"))
        .agg(count(lit(1)).as("n"))
        .withColumn("n_declared",
          sum(col("n")).over(Window.partitionBy(col("declared_lang"))))
        .withColumn("share",
          col("n").cast("double") / col("n_declared").cast("double"))
        .orderBy(col("declared_lang"), col("predicted_lang"))
    }),

    // UniMax language quotas (Chung et al. 2023, "UniMax: Fairer and
    // More Effective Language Sampling") — the multilingual budget
    // allocator: each language may contribute at most E=2 epochs of its
    // own tokens (cap = 2·tokens), and the total budget (3/2 of the
    // corpus here, so both branches bind on the fixture's skew) is
    // waterfilled: languages whose cap fits under the fair share get
    // their full cap; the rest share the leftover at one common level.
    // Everything is exact int64 arithmetic (the `div` operator, never
    // FP), so both engines agree; the greedy funded flag is computable
    // per-row because it is monotone along the cap-ascending order —
    // once a language exceeds its fair share, every larger cap does too
    // (cap_r·(n−r+1) > remaining ⟹ remaining − cap_r < cap_r·(n−r),
    // and later caps only grow). Negative intermediate quotients (Spark
    // `div` truncates, DuckDB `//` floors) can never flip the flag:
    // caps are ≥ 2, and both semantics agree for non-negative operands
    // — the level numerator is provably ≥ 0 by the same invariant.
    // Scale shape: everything past the one corpus agg runs on the
    // n_langs-row table (metadata-sized windows — the ns54 histogram
    // precedent); the corpus is scanned once.
    "ns64_unimax_quota" -> ((s, d) => {
      // The per-language table is multiply consumed (budget scalar +
      // the waterfill's own rank/level passes) — artifact discipline:
      // write the n_langs-row agg once, read it everywhere, so the
      // corpus is scanned exactly once. The budget's 3t/2 uses Scala's
      // truncating Long division — identical to `div`/`//` on the
      // positive total.
      val ltDir = freshDir("ns64-langs")
      Tables.documents(s, d)
        .select(col("lang"), size(tokens(col("text"))).cast("long").as("n_tok"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tokens_total"))
        .withColumn("cap_tokens", col("tokens_total") * lit(2L))
        .write.mode("overwrite").parquet(ltDir)
      val lt = s.read.parquet(ltDir)
      val budget = 3L * lt.agg(sum(col("tokens_total"))).head().getLong(0) / 2L
      graft.operators.Budgeting.waterfill(lt, "lang", "cap_tokens", budget)
        .select(col("lang"), col("n_docs"), col("tokens_total"),
          col("cap_tokens"), col("funded"), col("quota").as("quota_tokens"))
        .orderBy(col("lang"))
    }),

    // Interpolated Kneser-Ney bigram LM under a HELD-OUT split — the
    // smoothed twin of ns30's exact in-corpus model, and the form a
    // perplexity filter actually needs: the model trains on half the
    // corpus (even doc_ids) and scores the other half, so unseen
    // bigrams and unseen prefixes occur for real and the KN machinery
    // (absolute discount D=0.75, continuation-probability backoff
    // p_cont(b) = N1+(·,b)/N1+(··)) does its job instead of decorating
    // in-vocabulary counts. Per test bigram:
    //   seen prefix:  p = max(c(a,b)−D, 0)/c(a)
    //                     + (D·N1+(a,·)/c(a)) · p_cont(b)
    //   unseen prefix: p = p_cont(b)   (pure continuation backoff)
    //   unseen b:      p_cont(b) = 0 → the doc's score is exactly 0 —
    //                  the OOV flag, not an engine error.
    // Log-free by the ns30 rule: every term is a few correctly-rounded
    // IEEE ops on exact-int64-derived doubles in a pinned tree, folded
    // in position order, so both engines agree bit-exactly (through
    // gradual underflow included). Scale shape: the four model tables
    // (pair, prefix, continuation counts + the 1-row N1+(··) scalar)
    // are vocabulary-bounded → broadcast (web-scale: shuffled
    // equi-joins, same family); the held-out corpus contributes one
    // explode and the per-doc fold.
    "ns63_kn_heldout" -> ((s, d) => {
      val D = 0.75
      val t = tokens(col("text"))
      def bigrams(df: DataFrame) = df
        .select(col("doc_id"), posexplode(
          zip_with(slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
            (a, b) => struct(a.as("a"), b.as("b")))).as(Seq("pos", "ab")))
        .select(col("doc_id"), col("pos"),
          col("ab.a").as("a"), col("ab.b").as("b"))
      val docs = Tables.documents(s, d)
      val train = bigrams(docs.filter(col("doc_id") % 2 === 0))
      val test = bigrams(docs.filter(col("doc_id") % 2 === 1))
      // The pair-count table is the TRAINED MODEL — materialize it once
      // (vocabulary-bounded parquet, exact int64 counts round-trip
      // bit-safe) so the three derived tables and the scoring join all
      // read the artifact: the train half is scanned exactly once.
      // Without this, column pruning gives pre/cont/nn each a
      // differently-pruned aggregation subtree, defeating exchange
      // reuse — four train scans where one suffices.
      val cntDir = freshDir("ns63-model")
      train.groupBy(col("a"), col("b")).agg(count(lit(1)).as("c"))
        .write.mode("overwrite").parquet(cntDir)
      val cnt = s.read.parquet(cntDir)
      val pre = cnt.groupBy(col("a"))
        .agg(sum(col("c")).as("ca"), count(lit(1)).as("n1a"))
      val cont = cnt.groupBy(col("b")).agg(count(lit(1)).as("n1b"))
      val nn = cnt.agg(count(lit(1)).as("nn"))
      val pcont = coalesce(col("n1b"), lit(0L)).cast("double") /
        col("nn").cast("double")
      val p = when(col("ca").isNull, pcont)
        .otherwise(
          greatest(coalesce(col("c"), lit(0L)).cast("double") - lit(D), lit(0.0))
            / col("ca").cast("double")
          + lit(D) * col("n1a").cast("double") / col("ca").cast("double")
            * pcont)
      test
        .join(broadcast(cnt), Seq("a", "b"), "left")
        .join(broadcast(pre), Seq("a"), "left")
        .join(broadcast(cont), Seq("b"), "left")
        .crossJoin(broadcast(nn))
        .withColumn("p", p)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          sum(when(col("ca").isNull, 1L).otherwise(0L)).as("n_unseen_prefix"),
          sum(when(col("n1b").isNull, 1L).otherwise(0L)).as("n_unseen_word"),
          aggregate(array_sort(collect_list(struct(col("pos"), col("p")))),
            lit(1.0), (acc, x) => acc * x.getField("p")).as("kn_score"))
        .orderBy(col("doc_id"))
    }),

    // The removal ACTION behind ns37's diagnostic (Lee et al. 2022):
    // rewrite each doc dropping every token covered by a shingle whose
    // corpus occurrence count (with multiplicity — within-doc repeats
    // count) is >= 2. Positional explode → frequency agg → per-doc
    // duplicate-start collect (doc-length bounded) → one left join back
    // → codegen'd HOF array rewrite.
    "ns41_span_removal" -> ((s, d) => {
      Dedup.removeDupSpans(Tables.documents(s, d), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"))
    }),

    // EXACT all-pairs Jaccard via the same lossless prefix filter — the
    // recall-1 counterpart of ns05's MinHash-LSH (which has a bounded
    // per-pair miss probability) and the unblocked twin of ns04. Same
    // brute-force oracle as ns05: precision and recall must both be 1.
    "ns40_prefix_jaccard" -> ((s, d) => {
      Dedup.prefixJaccardPairs(Tables.documents(s, d), "doc_id", "text",
        shingleN = 3, threshold = 0.8)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Containment overlap — the asymmetric dedup measure: |a∩b| over the
    // SMALLER set, catching subset duplication (quotes, excerpts,
    // boilerplate wrappers) that Jaccard's union normalization dilutes.
    // Same blocked equi-join + sorted-merge-overlap posture as ns04,
    // with a ±2-bucket candidate window (declared scope — full
    // asymmetric search is the LSH path).
    "ns33_containment" -> ((s, d) => {
      Dedup.blockedContainmentPairs(Tables.documents(s, d), "doc_id", "text",
        lenCol = "n_chars", shingleN = 3, threshold = 0.8, bucketWidth = 32,
        blockSpan = 2)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // PageRank over the near-dup graph (link analysis — the remaining
    // iterative-algorithm class beside ns12's connected components):
    // simplified PageRank, d=0.85, 3 unrolled iterations, no
    // dangling-mass redistribution (documented; mass shrinks, ordering
    // is what's consumed). Deterministic end to end: the per-node
    // in-neighbor sum folds in neighbor order, every other op is a
    // single correctly-rounded IEEE op. The edge set (ns04's verified
    // pairs) is RELIABLY checkpointed (parquet under the session
    // checkpoint dir — shared storage on a cluster) so the LSH subplan
    // executes once, not once per iteration, and an executor loss
    // mid-loop recomputes from the durable scan instead of losing the
    // truncated lineage (Checkpoints.reliable; executor-local
    // localCheckpoint is reserved for driver-adjacent artifacts like
    // vs13's greedy steps). Each iteration is one shuffled equi-join +
    // one agg — the 100 TB shape, with in-loop reliable checkpoints
    // once iterations grow past the unrolled 3 (SCALE.md).
    "ns32_pagerank" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val n = docs.count()
      val pairs = Dedup.blockedJaccardPairs(docs, "doc_id", "text",
        lenCol = "n_chars", shingleN = 3, threshold = 0.5, bucketWidth = 32)
        .select(col("id_a"), col("id_b"))
      val edges = Checkpoints.reliable(
        pairs.select(col("id_a").as("u"), col("id_b").as("v"))
          .unionByName(pairs.select(col("id_b").as("u"), col("id_a").as("v"))),
        "ns32-edges")
      val deg = edges.groupBy(col("u")).agg(count(lit(1)).as("deg"))
      val nodes = docs.select(col("doc_id").as("v"))
      var pr = nodes.withColumn("pr", lit(1.0 / n))
      for (_ <- 1 to 3) {
        val contrib = edges
          .join(pr.select(col("v").as("u"), col("pr").as("pru")), Seq("u"))
          .join(deg, Seq("u"))
          .select(col("v"), col("u"),
            (col("pru") / col("deg").cast("double")).as("c"))
        val summed = contrib.groupBy(col("v"))
          .agg(aggregate(array_sort(collect_list(struct(col("u"), col("c")))),
            lit(0.0), (a, x) => a + x.getField("c")).as("s2"))
        pr = nodes.join(summed, Seq("v"), "left_outer")
          .select(col("v"),
            (lit(0.15 / n) + lit(0.85) * coalesce(col("s2"), lit(0.0))).as("pr"))
      }
      pr.select(col("v").as("doc_id"), col("pr")).orderBy(col("doc_id"))
    }),

    // Blocked fuzzy matching — the entity-resolution primitive: candidate
    // pairs blocked on the first token (at scale: any cheap blocking key
    // — phonetic code, prefix, LSH bucket), then exact Levenshtein edit
    // distance on the 3-token "title", kept at distance ≤ 5. Edit
    // distance is integer-exact on both engines, and the self-join is an
    // equi-join on the block key with a < on doc_id so each pair scores
    // once — the declared-quadratic-within-block family (ns04's posture:
    // the verification baseline; production blocks are sized to keep
    // buckets bounded).
    "ns31_fuzzy_match" -> ((s, d) => {
      val toks = tokens(col("text"))
      val t = Tables.documents(s, d)
        .select(col("doc_id"),
          array_join(slice(toks, lit(1), lit(3)), " ").as("title"),
          element_at(toks, 1).as("blk"))
      val a = t.select(col("doc_id").as("id_a"), col("title").as("title_a"),
        col("blk"))
      val b = t.select(col("doc_id").as("id_b"), col("title").as("title_b"),
        col("blk"))
      a.join(b, Seq("blk"))
        .filter(col("id_a") < col("id_b"))
        .withColumn("dist", levenshtein(col("title_a"), col("title_b")))
        .filter(col("dist") <= 5)
        .select(col("id_a"), col("id_b"), col("dist"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Bigram language-model quality score — the statistical-LM filter of
    // the CCNet/KenLM pipeline, here an exact in-corpus bigram model:
    // p(b|a) = count(a,b)/count(a as prefix), each doc scored by the
    // product of its bigram probabilities in sequence order. Stays
    // log-free (ln/pow are not correctly rounded; the raw product IS —
    // every factor and multiply is one IEEE op, folded in position
    // order, so both engines agree bit-exactly; ~25-token docs can't
    // underflow). Scale shape: the bigram and prefix count tables are
    // vocabulary²-sized → broadcast here (a web-scale model makes these
    // shuffled equi-joins — same plan family); the corpus contributes
    // one (a,b) partial agg and the per-doc fold.
    "ns30_bigram_lm" -> ((s, d) => {
      val t = tokens(col("text"))
      val bg = Tables.documents(s, d)
        .select(col("doc_id"), posexplode(
          zip_with(slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
            (a, b) => struct(a.as("a"), b.as("b")))).as(Seq("pos", "ab")))
        .select(col("doc_id"), col("pos"),
          col("ab.a").as("a"), col("ab.b").as("b"))
      val cnt = bg.groupBy(col("a"), col("b")).agg(count(lit(1)).as("c"))
      val pre = bg.groupBy(col("a")).agg(count(lit(1)).as("ca"))
      bg.join(broadcast(cnt), Seq("a", "b"))
        .join(broadcast(pre), Seq("a"))
        .withColumn("pr", col("c").cast("double") / col("ca").cast("double"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          aggregate(array_sort(collect_list(struct(col("pos"), col("pr")))),
            lit(1.0), (acc, x) => acc * x.getField("pr")).as("lm_score"))
        .orderBy(col("doc_id"))
    }),

    // Hybrid retrieval: BM25 lexical ranking fused with embedding-cosine
    // ranking by reciprocal-rank fusion (rrf = Σ 1/(60+rank), the
    // Cormack/Clarke constant). Queries are documents 0..2 themselves
    // ("more-like-this"): the lexical side scores each query doc's
    // distinct tokens with bm25Scores (self excluded), the vector side
    // is ns18's decode→embed derivation + brute-force cosine (self
    // excluded by construction). Ranks are integers, so each fused score
    // is two correctly-rounded divisions plus one fixed-order add —
    // oracle-exact with no fold needed. Scale shape: both rank lists are
    // ≤k rows per query (corpus-sized work stays inside bm25Scores /
    // bruteForceTopK, each already scale-shaped); the fusion join and
    // final top-k touch only candidates.
    "vs15_hybrid_rrf" -> ((s, d) => {
      import graft.operators.{Multimodal, Similarity}
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      val media = Multimodal.attachPayload(docs, "doc_id", "text", "text/plain")
      val feats = Multimodal.extractFeatures(media, dim = 4).toDF()
        .select(col("media_id").as("vec_id"), col("features").as("embedding"))
      val vec = Similarity
        .bruteForceTopK(feats.filter(col("vec_id") < 3), feats, k = 20)
        .select(col("query_id"), col("neighbor_id").as("doc_id"),
          col("rank").as("vec_rank"))
      val qterms = docs.filter(col("doc_id") < 3)
        .select(col("doc_id").as("query_id"), explode(tokens(col("text"))).as("tok"))
        .distinct()
      val wl = Window.partitionBy(col("query_id"))
        .orderBy(col("bm25").desc, col("doc_id").asc)
      val lex = bm25Scores(docs, qterms, excludeSelf = true)
        .withColumn("lex_rank", row_number().over(wl))
        .filter(col("lex_rank") <= 20)
        .select(col("query_id"), col("doc_id"), col("lex_rank"))
      val fused = lex.join(vec, Seq("query_id", "doc_id"), "full_outer")
        .withColumn("rrf",
          coalesce(lit(1.0) / (lit(60.0) + col("lex_rank").cast("double")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60.0) + col("vec_rank").cast("double")), lit(0.0)))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("rrf").desc, col("doc_id").asc)
      fused.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .select(col("query_id"), col("rank"), col("doc_id"), col("rrf"),
          col("lex_rank"), col("vec_rank"))
        .orderBy(col("query_id"), col("rank"))
    }),
  )

  val oracle: Map[String, String] = Map(
    "ns01_dedup_exact" ->
      """SELECT MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY text ORDER BY keeper_id""".stripMargin,
    "ns02_quality_score" ->
      s"""SELECT doc_id,
         | len(string_split(text, ' ')) AS n_tokens,
         | LENGTH(text) AS text_len,
         | (LENGTH(text) - (len(string_split(text, ' ')) - 1)) * 1.0
         |   / len(string_split(text, ' ')) AS avg_token_len,
         | ${stopCountSql(stopEn)} * 1.0 / len(string_split(text, ' ')) AS stopword_ratio,
         | (len(string_split(text, ' ')) BETWEEN 20 AND 200
         |   AND ${stopCountSql(stopEn)} > 0) AS quality_ok
         |FROM documents ORDER BY doc_id""".stripMargin,
    "ns03_lang_id" ->
      s"""SELECT doc_id, lang AS declared_lang,
         | ${stopCountSql(stopEn)} AS score_en,
         | ${stopCountSql(stopDe)} AS score_de,
         | ${stopCountSql(stopFr)} AS score_fr,
         | CASE WHEN ${stopCountSql(stopEn)} >= ${stopCountSql(stopDe)}
         |        AND ${stopCountSql(stopEn)} >= ${stopCountSql(stopFr)} THEN 'en'
         |      WHEN ${stopCountSql(stopDe)} >= ${stopCountSql(stopFr)} THEN 'de'
         |      ELSE 'fr' END AS predicted_lang
         |FROM documents ORDER BY doc_id""".stripMargin,
    "ns04_ngram_jaccard" ->
      s"""$shingleHashCte
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b, $jaccardSql AS jaccard
         |FROM hs a JOIN hs b ON a.doc_id < b.doc_id
         |WHERE (b.n_chars // 32) - (a.n_chars // 32) BETWEEN -1 AND 1
         |  AND $jaccardSql >= 0.5
         |ORDER BY id_a, id_b""".stripMargin,
    "ns05_minhash_lsh" ->
      s"""$shingleHashCte
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b, $jaccardSql AS jaccard
         |FROM hs a JOIN hs b ON a.doc_id < b.doc_id
         |WHERE $jaccardSql >= 0.8
         |ORDER BY id_a, id_b""".stripMargin,
    "ns06_simhash" ->
      s"""WITH th AS (
         |  SELECT doc_id AS id, list_distinct(list_transform(
         |    string_split(text, ' '), s -> ${hashSql("s")})) AS hashes
         |  FROM documents)
         |SELECT id, list_reduce(list_prepend(0, list_transform(range(0, 31), b ->
         |  CASE WHEN 2 * list_reduce(list_prepend(0, list_transform(hashes,
         |         h -> CAST(FLOOR(h / power(2, b)) AS BIGINT) % 2)), (a, x) -> a + x)
         |       > len(hashes)
         |  THEN CAST(power(2, b) AS BIGINT) ELSE 0 END)), (a, x) -> a + x) AS simhash
         |FROM th ORDER BY id""".stripMargin,
    "ns07_fingerprint" ->
      s"""SELECT doc_id, ${hashSql("text")} AS fingerprint
         |FROM documents ORDER BY doc_id""".stripMargin,
    "ns08_multimodal_meta" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
        | sha256(text) AS sha, source
        |FROM documents ORDER BY doc_id""".stripMargin,
    "ns13_stratified_sample" -> {
      val rateSql = "100 + 40 * CAST(regexp_extract(source, '\\d+', 0) AS INT)"
      val keepSql =
        s"(${hashSql("'sample:' || CAST(doc_id AS VARCHAR)")}) % 1000 < $rateSql"
      s"""SELECT source,
         | MAX($rateSql) AS rate_per_mille,
         | COUNT(*) AS n_total,
         | CAST(SUM(CASE WHEN $keepSql THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         | CAST(SUM(CASE WHEN $keepSql
         |   THEN len(string_split(text, ' ')) ELSE 0 END) AS BIGINT) AS kept_tokens
         |FROM documents GROUP BY source ORDER BY source""".stripMargin
    },
    "ns15_decontaminate" -> {
      val gram5 = "t[i] || '_' || t[i+1] || '_' || t[i+2] || '_' || t[i+3] || '_' || t[i+4]"
      s"""WITH toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         |g AS (
         |  SELECT doc_id, list_distinct(list_transform(
         |    [$gram5 for i in range(1, len(t) - 3)],
         |    s -> ${hashSql("s")})) AS grams
         |  FROM toks),
         |bench AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id < 20),
         |tr AS (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id >= 20),
         |hits AS (
         |  SELECT tr.doc_id, COUNT(*) AS n_hits
         |  FROM tr JOIN bench USING (gram) GROUP BY tr.doc_id)
         |SELECT d.doc_id,
         |  CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_shared_ngrams,
         |  COALESCE(h.n_hits, 0) > 0 AS contaminated
         |FROM documents d LEFT JOIN hits h USING (doc_id)
         |WHERE d.doc_id >= 20 ORDER BY d.doc_id""".stripMargin
    },
    "ns16_token_budget_mix" -> {
      val keepSql =
        s"(${hashSql("'mix:' || CAST(doc_id AS VARCHAR)")}) % 1000 < thr_per_mille"
      s"""WITH d AS (
         |  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tok
         |  FROM documents),
         |st AS (
         |  SELECT source, CAST(SUM(n_tok) AS BIGINT) AS tokens_total
         |  FROM d GROUP BY source),
         |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_sources FROM st),
         |r AS (
         |  SELECT source, tokens_total,
         |    LEAST(CAST(1000 AS BIGINT),
         |      10000000 // (n_sources * tokens_total)) AS thr_per_mille
         |  FROM st CROSS JOIN n)
         |SELECT r.source, r.tokens_total, r.thr_per_mille,
         |  CAST(SUM(CASE WHEN $keepSql THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(SUM(CASE WHEN $keepSql THEN n_tok ELSE 0 END) AS BIGINT) AS kept_tokens
         |FROM d JOIN r USING (source)
         |GROUP BY r.source, r.tokens_total, r.thr_per_mille
         |ORDER BY r.source""".stripMargin
    },
    "ns43_filter_funnel" ->
      s"""WITH f AS (
         |  SELECT doc_id, text, lang,
         |    len(string_split(text, ' ')) AS n_tok,
         |    len(list_intersect(string_split(text, ' '),
         |      ['the','a','of','and','to','in','is'])) > 0 AS has_stop
         |  FROM documents),
         |k AS (SELECT text, MIN(doc_id) AS keep_id FROM f GROUP BY text),
         |s AS (
         |  SELECT (n_tok >= 10 AND n_tok <= 400) AS p_len,
         |    has_stop AS p_stop, (lang = 'en') AS p_lang,
         |    (doc_id = keep_id) AS p_dedup
         |  FROM f JOIN k USING (text))
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
         |  CAST(SUM(CASE WHEN p_len THEN 1 ELSE 0 END) AS BIGINT)
         |    AS after_length,
         |  CAST(SUM(CASE WHEN p_len AND p_stop THEN 1 ELSE 0 END) AS BIGINT)
         |    AS after_stopword,
         |  CAST(SUM(CASE WHEN p_len AND p_stop AND p_lang THEN 1 ELSE 0 END)
         |    AS BIGINT) AS after_lang,
         |  CAST(SUM(CASE WHEN p_len AND p_stop AND p_lang AND p_dedup
         |    THEN 1 ELSE 0 END) AS BIGINT) AS after_dedup
         |FROM s""".stripMargin,
    "ns42_temperature_mix" -> {
      val keepSql =
        s"(${hashSql("'tmix:' || CAST(doc_id AS VARCHAR)")}) % 1000 < thr_per_mille"
      s"""WITH d AS (
         |  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tok
         |  FROM documents),
         |st AS (
         |  SELECT source, CAST(SUM(n_tok) AS BIGINT) AS tokens_total
         |  FROM d GROUP BY source),
         |w AS (
         |  SELECT source, tokens_total,
         |    CAST(floor(sqrt(tokens_total) * 1048576) AS BIGINT) AS w_q
         |  FROM st),
         |t AS (SELECT CAST(SUM(w_q) AS BIGINT) AS w_total FROM w),
         |r AS (
         |  SELECT source, tokens_total, w_q,
         |    LEAST(CAST(1000 AS BIGINT), CAST(
         |      (CAST(w_q AS HUGEINT) * 10000000)
         |        // (CAST(w_total AS HUGEINT) * tokens_total) AS BIGINT))
         |      AS thr_per_mille
         |  FROM w CROSS JOIN t)
         |SELECT r.source, r.tokens_total, r.w_q, r.thr_per_mille,
         |  CAST(SUM(CASE WHEN $keepSql THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(SUM(CASE WHEN $keepSql THEN n_tok ELSE 0 END) AS BIGINT)
         |    AS kept_tokens
         |FROM d JOIN r USING (source)
         |GROUP BY r.source, r.tokens_total, r.w_q, r.thr_per_mille
         |ORDER BY r.source""".stripMargin
    },
    "ns12_dedup_clusters" ->
      s"""${shingleHashCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM hs a JOIN hs b ON a.doc_id < b.doc_id
         |  WHERE $jaccardSql >= 0.8),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |          UNION ALL SELECT id_b, id_a FROM pairs),
         |reach(id, r) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src)
         |SELECT id AS doc_id, MIN(r) AS component
         |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin,
    "ns44_cluster_best" ->
      s"""${shingleHashCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM hs a JOIN hs b ON a.doc_id < b.doc_id
         |  WHERE $jaccardSql >= 0.8),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |          UNION ALL SELECT id_b, id_a FROM pairs),
         |reach(id, r) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src),
         |comp AS (SELECT id AS doc_id, MIN(r) AS component
         |         FROM reach GROUP BY id),
         |tok AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tok
         |        FROM documents),
         |j AS (
         |  SELECT component, doc_id, n_tok,
         |    ROW_NUMBER() OVER (PARTITION BY component
         |      ORDER BY n_tok DESC, doc_id ASC) AS rnk,
         |    COUNT(*) OVER (PARTITION BY component) AS n_docs
         |  FROM comp JOIN tok USING (doc_id))
         |SELECT component, doc_id AS kept_id, n_tok AS kept_tokens,
         |  CAST(n_docs AS BIGINT) AS n_docs
         |FROM j WHERE rnk = 1 ORDER BY component""".stripMargin,
    "ns45_perplexity_buckets" -> {
      val h = hashSql("'pb:' || CAST(doc_id AS VARCHAR)")
      s"""WITH toks AS (
         |  SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
         |bg AS (
         |  SELECT doc_id, source, pr['pos'] AS pos, pr['a'] AS a, pr['b'] AS b
         |  FROM (
         |    SELECT doc_id, source,
         |      unnest([{'pos': i, 'a': t[i], 'b': t[i + 1]}
         |              for i in range(1, len(t))]) AS pr
         |    FROM toks) s),
         |cnt AS (
         |  SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c FROM bg GROUP BY a, b),
         |pre AS (
         |  SELECT a, CAST(COUNT(*) AS BIGINT) AS ca FROM bg GROUP BY a),
         |p AS (
         |  SELECT bg.doc_id, bg.source, bg.pos,
         |    CAST(cnt.c AS DOUBLE) / CAST(pre.ca AS DOUBLE) AS pr
         |  FROM bg JOIN cnt USING (a, b) JOIN pre USING (a)),
         |scored AS (
         |  SELECT doc_id, source, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         |    list_reduce(list_prepend(1.0, list(pr ORDER BY pos)),
         |      (acc, x) -> acc * x) AS lm_score
         |  FROM p GROUP BY doc_id, source),
         |sids AS (
         |  SELECT source, doc_id FROM (
         |    SELECT source, doc_id, ROW_NUMBER() OVER (PARTITION BY source
         |      ORDER BY $h, doc_id) AS rn
         |    FROM documents
         |    WHERE len(string_split(text, ' ')) >= 2) t WHERE rn <= 8),
         |ss AS (
         |  SELECT s.source, s.doc_id, s.lm_score,
         |    ROW_NUMBER() OVER (PARTITION BY s.source
         |      ORDER BY s.lm_score DESC, s.doc_id ASC) AS srn,
         |    COUNT(*) OVER (PARTITION BY s.source) AS k
         |  FROM scored s JOIN sids USING (source, doc_id)),
         |cuts AS (
         |  SELECT source,
         |    MAX(CASE WHEN srn = CAST(CEIL(k / 3.0) AS INT)
         |        THEN lm_score END) AS c1s,
         |    MAX(CASE WHEN srn = CAST(CEIL(k / 3.0) AS INT)
         |        THEN doc_id END) AS c1i,
         |    MAX(CASE WHEN srn = CAST(CEIL(k * 2 / 3.0) AS INT)
         |        THEN lm_score END) AS c2s,
         |    MAX(CASE WHEN srn = CAST(CEIL(k * 2 / 3.0) AS INT)
         |        THEN doc_id END) AS c2i
         |  FROM ss GROUP BY source),
         |b AS (
         |  SELECT s.source, s.n_bigrams, s.lm_score,
         |    1 + CASE WHEN s.lm_score < c.c1s
         |             OR (s.lm_score = c.c1s AND s.doc_id > c.c1i)
         |             THEN 1 ELSE 0 END
         |      + CASE WHEN s.lm_score < c.c2s
         |             OR (s.lm_score = c.c2s AND s.doc_id > c.c2i)
         |             THEN 1 ELSE 0 END AS bucket
         |  FROM scored s JOIN cuts c USING (source))
         |SELECT source, CAST(bucket AS INT) AS bucket,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(n_bigrams) AS BIGINT) AS sum_bigrams,
         |  MIN(lm_score) AS min_score, MAX(lm_score) AS max_score
         |FROM b GROUP BY source, bucket ORDER BY source, bucket""".stripMargin
    },
    "ns46_hapax_ratio" ->
      """WITH t AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |c AS (
        |  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM t GROUP BY source, tok)
        |SELECT source,
        |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
        |  CAST(COUNT(*) AS BIGINT) AS n_distinct,
        |  CAST(SUM(c) AS BIGINT) AS n_tokens,
        |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) AS hapax_ratio
        |FROM c GROUP BY source ORDER BY source""".stripMargin,
    "ns50_zipf_curve" ->
      """WITH t AS (
        |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |c AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
        |      FROM t GROUP BY tok),
        |top AS (SELECT tok, c FROM c ORDER BY c DESC, tok LIMIT 512),
        |r AS (SELECT tok, c, CAST(ROW_NUMBER() OVER (
        |        ORDER BY c DESC, tok) AS BIGINT) AS rank
        |      FROM top),
        |p AS (SELECT rank, tok, c, rank * c AS rank_x_freq
        |      FROM r WHERE (rank & (rank - 1)) = 0)
        |SELECT rank, tok, c, rank_x_freq,
        |  CAST(rank_x_freq AS DOUBLE)
        |    / CAST(LAG(rank_x_freq) OVER (ORDER BY rank) AS DOUBLE) AS decay
        |FROM p ORDER BY rank""".stripMargin,
    "ns49_incremental_dedup" ->
      s"""$shingleHashCte,
         |p AS (
         |  SELECT b.doc_id AS id_new, a.doc_id AS id_hist, $jaccardSql AS jaccard
         |  FROM hs a JOIN hs b
         |    ON a.doc_id % 10 <> 0 AND b.doc_id % 10 = 0),
         |f AS (
         |  SELECT id_new, CAST(COUNT(*) AS BIGINT) AS n_dups,
         |    MAX(jaccard) AS max_jaccard
         |  FROM p WHERE jaccard >= 0.8 GROUP BY id_new)
         |SELECT d.doc_id,
         |  CAST(COALESCE(n_dups, 0) AS BIGINT) AS n_dups,
         |  max_jaccard,
         |  f.id_new IS NOT NULL AS is_dup
         |FROM documents d LEFT JOIN f ON f.id_new = d.doc_id
         |WHERE d.doc_id % 10 = 0
         |ORDER BY d.doc_id""".stripMargin,
    "ns52_bpe_train" -> {
      val rounds = 5
      val unions = (1 to rounds).map { r =>
        s"""SELECT $r AS round, a AS lhs, b AS rhs, a || b AS merged,
           |  cnt AS pair_count FROM best$r""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH ${bpeCtes(rounds)}
         |$unions
         |ORDER BY round""".stripMargin
    },
    "ns53_bpe_vocab" ->
      s"""WITH ${bpeCtes(5)}
         |SELECT symbol, CAST(SUM(f) AS BIGINT) AS n_occurrences
         |FROM w5, unnest(cs) AS t(symbol)
         |GROUP BY symbol
         |ORDER BY n_occurrences DESC, symbol ASC LIMIT 20""".stripMargin,
    "ns55_bpe_token_counts" ->
      s"""WITH ${bpeCtes(5)},
         |wt AS (
         |  SELECT array_to_string(cs, '') AS tok, len(cs) AS n_seg FROM w5),
         |t AS (
         |  SELECT source, unnest(string_split(text, ' ')) AS tok
         |  FROM documents),
         |j AS (
         |  SELECT source, n_seg FROM t JOIN wt USING (tok) WHERE tok <> '')
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_words,
         |  CAST(SUM(n_seg) AS BIGINT) AS n_bpe_tokens,
         |  CAST(SUM(n_seg) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         |    AS bpe_per_word
         |FROM j GROUP BY source ORDER BY source""".stripMargin,
    "ns54_mad_outliers" ->
      """WITH d AS (SELECT source, doc_id, n_chars FROM documents),
        |m AS (SELECT source, n_chars AS med_chars FROM (
        |  SELECT source, n_chars, ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY n_chars, doc_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY source) AS cnt FROM d) t
        |  WHERE rn = (cnt + 1) // 2),
        |v AS (SELECT d.source, d.doc_id, m.med_chars,
        |    abs(d.n_chars - m.med_chars) AS dev
        |  FROM d JOIN m ON d.source = m.source),
        |md AS (SELECT source, dev AS mad_chars FROM (
        |  SELECT source, dev, ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY dev, doc_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY source) AS cnt FROM v) t
        |  WHERE rn = (cnt + 1) // 2)
        |SELECT v.source, v.med_chars, md.mad_chars,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN v.dev > 3 * md.mad_chars THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_outliers
        |FROM v JOIN md ON v.source = md.source
        |GROUP BY v.source, v.med_chars, md.mad_chars
        |ORDER BY v.source""".stripMargin,
    "ns51_kmv_overlap" -> {
      val gram5 = "t[i] || '_' || t[i+1] || '_' || t[i+2] || '_' || t[i+3] || '_' || t[i+4]"
      val estA = """CASE WHEN len(ka) < 256 THEN CAST(len(ka) AS DOUBLE)
                   |  ELSE 255.0 * 2147483647 / CAST(ka[256] AS DOUBLE) END""".stripMargin
      val estB = estA.replace("ka", "kb")
      val estU = estA.replace("ka", "u")
      val shared = "len(list_intersect(list_intersect(u, ka), kb))"
      s"""WITH toks AS (
         |  SELECT source, string_split(text, ' ') AS t FROM documents),
         |gd AS (
         |  SELECT source, unnest(list_distinct(list_transform(
         |    [$gram5 for i in range(1, len(t) - 3)],
         |    s -> ${hashSql("s")}))) AS g
         |  FROM toks),
         |g AS (SELECT DISTINCT source, g FROM gd),
         |r AS (SELECT source, g,
         |        ROW_NUMBER() OVER (PARTITION BY source ORDER BY g) AS rn
         |      FROM g),
         |sk AS (SELECT source, list(g ORDER BY g) AS ka
         |       FROM r WHERE rn <= 256 GROUP BY source),
         |p AS (SELECT a.source AS src_a, a.ka AS ka,
         |        b.source AS src_b, b.ka AS kb
         |      FROM sk a JOIN sk b ON a.source < b.source),
         |c AS (SELECT src_a, src_b, ka, kb,
         |        list_sort(list_distinct(ka || kb))[1:256] AS u FROM p)
         |SELECT src_a, src_b,
         |  CAST($shared AS BIGINT) AS shared_kmin,
         |  $estA AS est_a,
         |  $estB AS est_b,
         |  $estU AS est_union,
         |  CAST($shared AS DOUBLE) / CAST(len(u) AS DOUBLE)
         |    * ($estU) AS est_intersection
         |FROM c ORDER BY src_a, src_b""".stripMargin
    },
    "ns48_source_overlap" -> {
      val gram5 = "t[i] || '_' || t[i+1] || '_' || t[i+2] || '_' || t[i+3] || '_' || t[i+4]"
      s"""WITH toks AS (
         |  SELECT source, string_split(text, ' ') AS t FROM documents),
         |gd AS (
         |  SELECT source, unnest(list_distinct(list_transform(
         |    [$gram5 for i in range(1, len(t) - 3)],
         |    s -> ${hashSql("s")}))) AS g
         |  FROM toks),
         |g AS (SELECT DISTINCT source, g FROM gd),
         |c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS cnt
         |      FROM g GROUP BY source),
         |sh AS (
         |  SELECT a.source AS src_a, b.source AS src_b,
         |    CAST(COUNT(*) AS BIGINT) AS shared_grams
         |  FROM g a JOIN g b ON a.g = b.g AND a.source < b.source
         |  GROUP BY 1, 2)
         |SELECT src_a, src_b, shared_grams, ca.cnt AS n_a, cb.cnt AS n_b,
         |  CAST(shared_grams AS DOUBLE)
         |    / CAST(ca.cnt + cb.cnt - shared_grams AS DOUBLE) AS jaccard
         |FROM sh JOIN c ca ON ca.source = sh.src_a
         |  JOIN c cb ON cb.source = sh.src_b
         |ORDER BY src_a, src_b""".stripMargin
    },
    "ns47_vocab_growth" ->
      """WITH d AS (
        |  SELECT CAST(FLOOR(doc_id * 10.0
        |      / (SELECT COUNT(*) FROM documents)) AS INT) AS bucket,
        |    unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |fs AS (SELECT tok, MIN(bucket) AS bucket FROM d GROUP BY tok),
        |np AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS new_tokens
        |       FROM fs GROUP BY bucket),
        |tp AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS bucket_tokens
        |       FROM d GROUP BY bucket)
        |SELECT tp.bucket,
        |  COALESCE(new_tokens, CAST(0 AS BIGINT)) AS new_tokens,
        |  bucket_tokens,
        |  CAST(SUM(COALESCE(new_tokens, 0)) OVER (ORDER BY tp.bucket)
        |    AS BIGINT) AS cum_vocab,
        |  CAST(SUM(bucket_tokens) OVER (ORDER BY tp.bucket)
        |    AS BIGINT) AS cum_tokens
        |FROM tp LEFT JOIN np USING (bucket)
        |ORDER BY tp.bucket""".stripMargin,
    "ns14_neardup_prep" ->
      s"""${shingleHashCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM hs a JOIN hs b ON a.doc_id < b.doc_id
         |  WHERE $jaccardSql >= 0.8),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |          UNION ALL SELECT id_b, id_a FROM pairs),
         |reach(id, r) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src),
         |comp AS (
         |  SELECT id AS doc_id, MIN(r) AS component FROM reach GROUP BY id)
         |SELECT source, COUNT(*) AS n_kept,
         |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS kept_tokens
         |FROM documents JOIN comp USING (doc_id)
         |WHERE doc_id = component
         |GROUP BY source ORDER BY source""".stripMargin,
    "ns11_prep_pipeline" ->
      s"""WITH toks AS (
         |  SELECT doc_id, source, text,
         |    len(string_split(text, ' ')) AS n_tokens,
         |    ${stopCountSql(stopEn)} AS n_stop
         |  FROM documents),
         |gated AS (
         |  SELECT * FROM toks
         |  WHERE n_stop > 0 AND n_tokens BETWEEN 20 AND 200),
         |keep AS (
         |  SELECT text, MIN(doc_id) AS doc_id FROM gated GROUP BY text)
         |SELECT g.source, COUNT(*) AS n_docs,
         |  CAST(SUM(g.n_tokens) AS BIGINT) AS n_tokens_total
         |FROM gated g JOIN keep k ON g.text = k.text AND g.doc_id = k.doc_id
         |GROUP BY g.source ORDER BY g.source""".stripMargin,
    "ns10_token_freq" ->
      """SELECT token, COUNT(*) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
        |GROUP BY token ORDER BY n DESC, token ASC LIMIT 20""".stripMargin,
    "ns09_bpe_tokens" ->
      """SELECT doc_id,
        | len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "ns21_normalize_text" ->
      """SELECT doc_id,
        | trim(regexp_replace(regexp_replace(lower(text),
        |   '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm_text,
        | len(string_split(trim(regexp_replace(regexp_replace(lower(text),
        |   '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS n_tokens_norm
        |FROM documents ORDER BY doc_id""".stripMargin,
    "ns20_column_profile" ->
      """SELECT COUNT(*) AS n_rows,
        | CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS text_nulls,
        | COUNT(DISTINCT source) AS source_distinct,
        | COUNT(DISTINCT lang) AS lang_distinct,
        | MIN(n_chars) AS n_chars_min,
        | MAX(n_chars) AS n_chars_max,
        | CAST(SUM(n_chars) AS BIGINT) AS n_chars_sum,
        | MIN(doc_id) AS doc_id_min,
        | MAX(doc_id) AS doc_id_max
        |FROM documents""".stripMargin,
    "ns19_heavy_hitters" ->
      """SELECT token, COUNT(*) AS n, CAST(0 AS BIGINT) AS err FROM (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
        |GROUP BY token ORDER BY n DESC, token ASC LIMIT 20""".stripMargin,
    "ns56_frame_sample" ->
      s"""WITH fr AS (
         |  SELECT doc_id AS media_id, CAST(u.i * 2 AS INT) AS frame_idx,
         |    substr(text, CAST(u.i * 2 * 16 + 1 AS INT), 16) AS frame
         |  FROM documents,
         |  unnest(range(0, least(4, CAST(ceil(ceil(length(text) / 16.0)
         |    / 2.0) AS BIGINT)))) AS u(i)),
         |h AS (
         |  SELECT media_id, frame_idx, length(frame) AS n_frame_bytes,
         |    ${decodeFoldOf("frame")} AS hu
         |  FROM fr)
         |SELECT media_id, frame_idx,
         |  CAST(n_frame_bytes AS INT) AS n_frame_bytes,
         |  CAST(${decodeFeatSql(0)} AS DOUBLE) AS f0
         |FROM h ORDER BY media_id, frame_idx""".stripMargin,
    "ns18_multimodal_ann" -> {
      val cos = decodeCosSql
      s"""WITH $decodeFeatureCtes,
         |q AS (SELECT vec_id AS query_id, embedding AS qv FROM f WHERE vec_id < 3),
         |c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM f),
         |scored AS (
         |  SELECT query_id, neighbor_id, $cos AS cos
         |  FROM c JOIN q ON query_id <> neighbor_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, cos,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY cos DESC, neighbor_id ASC) AS rank
         |  FROM scored)
         |SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cos
         |FROM ranked WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin
    },
    "ns17_bottomk_sample" -> {
      val h = hashSql("'bk:' || CAST(doc_id AS VARCHAR)")
      s"""SELECT source, h, doc_id
         |FROM (SELECT source, doc_id, $h AS h,
         |        ROW_NUMBER() OVER (PARTITION BY source
         |          ORDER BY $h, doc_id) AS rn
         |      FROM documents) t
         |WHERE rn <= 5
         |ORDER BY source, h, doc_id""".stripMargin
    },
    "ns22_repetition_stats" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |pt AS (
        |  SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY doc_id, tok)
        |SELECT doc_id,
        |  CAST(SUM(c) AS BIGINT) AS n_tokens,
        |  COUNT(*) AS n_distinct,
        |  CAST(MAX(c) AS BIGINT) AS top_token_count,
        |  CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE)
        |    / CAST(SUM(c) AS DOUBLE) AS dup_token_frac,
        |  CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top_token_frac
        |FROM pt GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "ns23_pii_pseudonymize" -> {
      val h = hashSql("'pii:' || CAST(user_id AS VARCHAR)")
      s"""SELECT event_id, $h AS user_pseudonym,
         |  regexp_replace(props, '[0-9]+', '#', 'g') AS props_redacted,
         |  event_type
         |FROM events ORDER BY event_id""".stripMargin
    },
    "ns28_chunk_dedup" -> {
      val h = hashSql("array_to_string(list_slice(tk, start + 1, start + 10), ' ')")
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
         |ch AS (
         |  SELECT doc_id, $h AS chunk_hash
         |  FROM (SELECT doc_id, tk, unnest(range(0, len(tk), 10)) AS start
         |        FROM t) s),
         |fr AS (
         |  SELECT chunk_hash, COUNT(DISTINCT doc_id) AS n_docs_with
         |  FROM ch GROUP BY chunk_hash)
         |SELECT doc_id, COUNT(*) AS n_chunks,
         |  CAST(SUM(CASE WHEN n_docs_with > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_shared_chunks,
         |  CAST(SUM(CASE WHEN n_docs_with > 1 THEN 1 ELSE 0 END) AS DOUBLE)
         |    / CAST(COUNT(*) AS DOUBLE) AS shared_frac
         |FROM ch JOIN fr USING (chunk_hash)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },
    "ns27_train_val_test" -> {
      val h = s"(${hashSql("'split:' || CAST(doc_id AS VARCHAR)")}) % 1000"
      s"""SELECT source,
         |  CASE WHEN $h < 980 THEN 'train'
         |       WHEN $h < 990 THEN 'val' ELSE 'test' END AS split,
         |  COUNT(*) AS n_docs,
         |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens_total
         |FROM documents
         |GROUP BY source, split ORDER BY source, split""".stripMargin
    },
    "ns26_countmin_freq" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |SELECT token, COUNT(*) AS n FROM t
        |WHERE token IN ('agg','data','join','key','row','scan','table','value')
        |GROUP BY token ORDER BY token""".stripMargin,
    "ns25_chunking" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |s AS (SELECT doc_id, tk, unnest(range(0, len(tk), 10)) AS start FROM t)
        |SELECT doc_id, start // 10 AS chunk_id,
        |  array_to_string(list_slice(tk, start + 1, start + 20), ' ') AS chunk_text,
        |  len(list_slice(tk, start + 1, start + 20)) AS n_chunk_tokens
        |FROM s ORDER BY doc_id, chunk_id""".stripMargin,
    "ns24_tfidf_top_token" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |pt AS (
        |  SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok),
        |dfreq AS (SELECT tok, COUNT(*) AS df FROM pt GROUP BY tok),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
        |scored AS (
        |  SELECT doc_id, tok, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
        |    CAST(tf AS DOUBLE) * (CAST(n AS DOUBLE) / CAST(df AS DOUBLE)) AS score,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id
        |      ORDER BY CAST(tf AS DOUBLE) * (CAST(n AS DOUBLE) / CAST(df AS DOUBLE)) DESC,
        |               tok ASC) AS rn
        |  FROM pt JOIN dfreq USING (tok) CROSS JOIN n)
        |SELECT doc_id, tok AS top_token, tf, df, score
        |FROM scored WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "ns29_bm25_topk" ->
      s"""WITH q AS (
         |  SELECT CAST(v.qid AS BIGINT) AS query_id, v.tok AS tok
         |  FROM (VALUES (0,'spark'),(0,'join'),(0,'window'),
         |               (1,'hash'),(1,'merge'),(1,'sort'),
         |               (2,'stream'),(2,'batch'),(2,'filter')) v(qid, tok)),
         |${bm25Ctes("q", excludeSelf = false)},
         |rk AS (
         |  SELECT query_id, doc_id, bm25, ROW_NUMBER() OVER (
         |    PARTITION BY query_id ORDER BY bm25 DESC, doc_id ASC) AS rank
         |  FROM byd)
         |SELECT query_id, CAST(rank AS INT) AS rank, doc_id, bm25
         |FROM rk WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    "ns34_collocation" ->
      """WITH td AS (
        |  SELECT DISTINCT doc_id, tok FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |    FROM documents) s0),
        |n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nd FROM documents),
        |ca AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS ca FROM td GROUP BY tok),
        |pairs AS (
        |  SELECT a.doc_id, a.tok AS ta, b.tok AS tb
        |  FROM td a JOIN td b ON a.doc_id = b.doc_id AND a.tok < b.tok),
        |cab AS (
        |  SELECT ta, tb, CAST(COUNT(*) AS BIGINT) AS cab
        |  FROM pairs GROUP BY ta, tb),
        |lifted AS (
        |  SELECT ta, tb, cab.cab,
        |    (CAST(cab.cab AS DOUBLE) * nd)
        |      / (CAST(x.ca AS DOUBLE) * CAST(y.ca AS DOUBLE)) AS lift
        |  FROM cab JOIN ca x ON x.tok = cab.ta JOIN ca y ON y.tok = cab.tb
        |       CROSS JOIN n
        |  WHERE cab.cab >= 5)
        |SELECT ta, tb, cab, lift FROM (
        |  SELECT ta, tb, cab, lift,
        |    ROW_NUMBER() OVER (ORDER BY lift DESC, ta ASC, tb ASC) AS rn
        |  FROM lifted) t
        |WHERE rn <= 20 ORDER BY lift DESC, ta, tb""".stripMargin,
    "ns36_domain_shift" ->
      """WITH td AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents),
        |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM td),
        |per AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c_st
        |        FROM td GROUP BY 1, 2),
        |gfreq AS (SELECT tok, CAST(SUM(c_st) AS BIGINT) AS c_t FROM per GROUP BY 1),
        |tot AS (SELECT source, CAST(SUM(c_st) AS BIGINT) AS n_s FROM per GROUP BY 1),
        |agg AS (
        |  SELECT p.source, tot.n_s,
        |    SUM(CAST(abs(p.c_st * nn.n - g.c_t * tot.n_s) AS DECIMAL(38,0))) AS s1,
        |    CAST(SUM(g.c_t) AS BIGINT) AS s2,
        |    CAST(COUNT(*) AS BIGINT) AS vocab
        |  FROM per p JOIN gfreq g USING (tok)
        |    JOIN tot ON tot.source = p.source CROSS JOIN nn
        |  GROUP BY 1, 2)
        |SELECT source, n_s AS n_tokens, vocab,
        |  0.5 * (CAST(s1 AS DOUBLE) / CAST(n_s * (SELECT n FROM nn) AS DOUBLE)
        |    + CAST((SELECT n FROM nn) - s2 AS DOUBLE)
        |      / CAST((SELECT n FROM nn) AS DOUBLE)) AS tv
        |FROM agg ORDER BY source""".stripMargin,
    "ns37_dup_span" ->
      s"""$shingleHashCte,
         |ex AS (SELECT doc_id, unnest(hashes) AS h FROM hs),
         |dfreq AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS df FROM ex GROUP BY h)
         |SELECT e.doc_id, COUNT(*) AS n_shingles,
         |  CAST(SUM(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_shingles,
         |  CAST(SUM(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
         |    / CAST(COUNT(*) AS DOUBLE) AS dup_frac
         |FROM ex e JOIN dfreq d USING (h)
         |GROUP BY e.doc_id ORDER BY doc_id""".stripMargin,
    "ns38_winnow_pairs" ->
      s"""WITH toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         |sh AS (
         |  SELECT doc_id, [t[i] || '_' || t[i+1] || '_' || t[i+2]
         |                  for i in range(1, len(t) - 1)] AS g
         |  FROM toks),
         |hp AS (
         |  SELECT doc_id, list_transform(g, s -> ${hashSql("s")}) AS H FROM sh),
         |wins AS (
         |  SELECT doc_id, CASE WHEN len(H) >= 1 THEN list_distinct(
         |    [list_min(H[i:i+3]) for i in range(1, greatest(len(H) - 3, 1) + 1)])
         |    ELSE [] END AS fps
         |  FROM hp),
         |fp AS (SELECT doc_id, unnest(fps) AS fp FROM wins),
         |shared AS (
         |  SELECT fp FROM fp GROUP BY fp HAVING COUNT(*) BETWEEN 2 AND 10)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  COUNT(*) AS shared_prints
         |FROM fp a JOIN shared USING (fp)
         |  JOIN fp b ON b.fp = a.fp AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING COUNT(*) >= 2
         |ORDER BY id_a, id_b""".stripMargin,
    "ns39_prefix_containment" ->
      s"""$shingleHashCte
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  len(list_intersect(a.hashes, b.hashes)) * 1.0
         |    / least(len(a.hashes), len(b.hashes)) AS containment
         |FROM hs a JOIN hs b ON a.doc_id < b.doc_id
         |WHERE len(a.hashes) >= 1 AND len(b.hashes) >= 1
         |  AND len(list_intersect(a.hashes, b.hashes)) * 1.0
         |    / least(len(a.hashes), len(b.hashes)) >= 0.8
         |ORDER BY id_a, id_b""".stripMargin,
    "ns57_tf_cosine_topk" ->
      s"""WITH toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         |sh AS (
         |  SELECT doc_id, unnest([t[i] || '_' || t[i+1] || '_' || t[i+2]
         |                         for i in range(1, len(t) - 1)]) AS g
         |  FROM toks),
         |tf AS (
         |  SELECT doc_id, h, COUNT(*) AS tf FROM (
         |    SELECT doc_id, ${hashSql("g")} AS h FROM sh) s0
         |  GROUP BY doc_id, h),
         |dfreq AS (SELECT h, COUNT(*) AS df FROM tf GROUP BY h),
         |kept AS (
         |  SELECT tf.doc_id, tf.h, tf.tf, d.df
         |  FROM tf JOIN dfreq d USING (h) WHERE d.df <= 64),
         |norms AS (SELECT doc_id, SUM(tf * tf) AS nsq FROM kept GROUP BY doc_id),
         |post AS (SELECT h, doc_id, tf FROM kept WHERE df >= 2),
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, SUM(a.tf * b.tf) AS num
         |  FROM post a JOIN post b ON a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id),
         |scored AS (
         |  SELECT id_a, id_b,
         |    CAST(num AS DOUBLE)
         |      / (sqrt(CAST(na.nsq AS DOUBLE)) * sqrt(CAST(nb.nsq AS DOUBLE))) AS cos
         |  FROM pairs
         |  JOIN norms na ON na.doc_id = id_a
         |  JOIN norms nb ON nb.doc_id = id_b),
         |directed AS (
         |  SELECT id_a AS doc_id, id_b AS neighbor_id, cos FROM scored
         |  UNION ALL
         |  SELECT id_b AS doc_id, id_a AS neighbor_id, cos FROM scored),
         |rk AS (
         |  SELECT doc_id, neighbor_id, cos, ROW_NUMBER() OVER (
         |    PARTITION BY doc_id ORDER BY cos DESC, neighbor_id ASC) AS rank
         |  FROM directed)
         |SELECT doc_id, CAST(rank AS INT) AS rank, neighbor_id, cos
         |FROM rk WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    // Same brute-force exact-Jaccard pair set as the ns05 oracle (LSH
    // recall is separately pinned there), rolled up to source cells.
    "ns59_cross_source_dups" ->
      s"""$shingleHashCte,
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM hs a JOIN hs b ON a.doc_id < b.doc_id
         |  WHERE $jaccardSql >= 0.8)
         |SELECT least(sa.source, sb.source) AS source_a,
         |  greatest(sa.source, sb.source) AS source_b,
         |  COUNT(*) AS n_pairs
         |FROM pairs
         |JOIN documents sa ON sa.doc_id = pairs.id_a
         |JOIN documents sb ON sb.doc_id = pairs.id_b
         |GROUP BY least(sa.source, sb.source), greatest(sa.source, sb.source)
         |ORDER BY source_a, source_b""".stripMargin,
    // The oracle states the packing contract directly: one exclusive
    // running sum in doc_id order (the bucketed decomposition is
    // plan-shape, not semantics).
    "ns60_sequence_packing" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS start
        |  FROM t)
        |SELECT doc_id, n_tokens, start, start // 256 AS bin
        |FROM c ORDER BY doc_id""".stripMargin,
    "ns61_pack_chunks" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS start
        |  FROM t),
        |b AS (
        |  SELECT doc_id, start, start + n_tokens AS fin FROM c
        |  WHERE n_tokens > 0),
        |x AS (
        |  SELECT doc_id, start, fin,
        |    unnest(range(start // 256, (fin - 1) // 256 + 1)) AS bin
        |  FROM b)
        |SELECT bin, doc_id,
        |  greatest(start, bin * 256) - start AS tok_from,
        |  least(fin, (bin + 1) * 256) - start AS tok_to,
        |  least(fin, (bin + 1) * 256) - greatest(start, bin * 256) AS n_tok_chunk
        |FROM x ORDER BY bin, doc_id""".stripMargin,
    "ns66_bpe_packing" ->
      s"""WITH ${bpeCtes(5)},
         |wt AS (
         |  SELECT array_to_string(cs, '') AS tok, len(cs) AS n_seg FROM w5),
         |t AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
         |  FROM documents),
         |dc AS (
         |  SELECT doc_id, CAST(SUM(n_seg) AS BIGINT) AS n_bpe_tokens
         |  FROM t JOIN wt USING (tok) WHERE tok <> ''
         |  GROUP BY doc_id),
         |c AS (
         |  SELECT doc_id, n_bpe_tokens,
         |    CAST(COALESCE(SUM(n_bpe_tokens) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS start
         |  FROM dc)
         |SELECT doc_id, n_bpe_tokens, start, start // 512 AS bin
         |FROM c ORDER BY doc_id""".stripMargin,
    "ns67_bpe_pack_chunks" ->
      s"""WITH ${bpeCtes(5)},
         |wt AS (
         |  SELECT array_to_string(cs, '') AS tok, len(cs) AS n_seg FROM w5),
         |t AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
         |  FROM documents),
         |dc AS (
         |  SELECT doc_id, CAST(SUM(n_seg) AS BIGINT) AS n_bpe
         |  FROM t JOIN wt USING (tok) WHERE tok <> ''
         |  GROUP BY doc_id),
         |c AS (
         |  SELECT doc_id, n_bpe,
         |    CAST(COALESCE(SUM(n_bpe) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS start
         |  FROM dc),
         |b AS (
         |  SELECT doc_id, start, start + n_bpe AS fin FROM c
         |  WHERE n_bpe > 0),
         |x AS (
         |  SELECT doc_id, start, fin,
         |    unnest(range(start // 512, (fin - 1) // 512 + 1)) AS bin
         |  FROM b)
         |SELECT bin, doc_id,
         |  greatest(start, bin * 512) - start AS tok_from,
         |  least(fin, (bin + 1) * 512) - start AS tok_to,
         |  least(fin, (bin + 1) * 512) - greatest(start, bin * 512)
         |    AS n_tok_chunk
         |FROM x ORDER BY bin, doc_id""".stripMargin,
    "ns62_dsir_weights" ->
      s"""WITH toks AS (
         |  SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
         |g AS (
         |  SELECT doc_id, source, pr['pos'] AS pos,
         |    pr['a'] || '_' || pr['b'] AS gm
         |  FROM (SELECT doc_id, source,
         |          unnest([{'pos': i, 'a': t[i], 'b': t[i + 1]}
         |                  for i in range(1, len(t))]) AS pr
         |        FROM toks) s),
         |bg AS (
         |  SELECT doc_id, source, pos, (${hashSql("gm")}) % 64 AS f FROM g),
         |cnt AS (
         |  SELECT f, CAST(COUNT(*) AS BIGINT) AS cr,
         |    CAST(SUM(CASE WHEN source IN ('src0','src1','src2','src3')
         |             THEN 1 ELSE 0 END) AS BIGINT) AS ct
         |  FROM bg GROUP BY f),
         |tot AS (
         |  SELECT CAST(SUM(cr) AS BIGINT) AS nr, CAST(SUM(ct) AS BIGINT) AS nt
         |  FROM cnt),
         |r AS (
         |  SELECT f, (CAST(ct + 1 AS DOUBLE) / CAST(cr + 1 AS DOUBLE))
         |    * (CAST(nr + 64 AS DOUBLE) / CAST(nt + 64 AS DOUBLE)) AS r
         |  FROM cnt CROSS JOIN tot),
         |p AS (
         |  SELECT bg.doc_id, bg.source, bg.pos, r.r FROM bg JOIN r USING (f))
         |SELECT doc_id, source, CAST(COUNT(*) AS BIGINT) AS n_feats,
         |  list_reduce(list_prepend(1.0, list(r ORDER BY pos)),
         |    (acc, x) -> acc * x) AS dsir_weight
         |FROM p GROUP BY doc_id, source ORDER BY doc_id""".stripMargin,
    "ns65_langid_confusion" -> {
      val predSql =
        s"""CASE WHEN ${stopCountSql(stopEn)} >= ${stopCountSql(stopDe)}
           |      AND ${stopCountSql(stopEn)} >= ${stopCountSql(stopFr)}
           |     THEN 'en'
           |     WHEN ${stopCountSql(stopDe)} >= ${stopCountSql(stopFr)}
           |     THEN 'de' ELSE 'fr' END""".stripMargin
      s"""WITH cells AS (
         |  SELECT lang AS declared_lang, $predSql AS predicted_lang,
         |    CAST(COUNT(*) AS BIGINT) AS n
         |  FROM documents GROUP BY 1, 2)
         |SELECT declared_lang, predicted_lang, n,
         |  CAST(SUM(n) OVER (PARTITION BY declared_lang) AS BIGINT)
         |    AS n_declared,
         |  CAST(n AS DOUBLE) / CAST(CAST(SUM(n) OVER (
         |    PARTITION BY declared_lang) AS BIGINT) AS DOUBLE) AS share
         |FROM cells ORDER BY declared_lang, predicted_lang""".stripMargin
    },
    // Window sums CAST to BIGINT (DuckDB widens SUM to HUGEINT); `//`
    // and Spark's `div` agree on every quotient the flag can decide
    // (see the query comment on negative-operand semantics).
    "ns64_unimax_quota" ->
      """WITH lt AS (
        |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens_total
        |  FROM documents GROUP BY lang),
        |c AS (SELECT lang, n_docs, tokens_total,
        |        tokens_total * 2 AS cap_tokens FROM lt),
        |g AS (SELECT CAST(3 * SUM(tokens_total) AS BIGINT) // 2 AS budget,
        |        CAST(COUNT(*) AS BIGINT) AS n_langs FROM lt),
        |f AS (
        |  SELECT c.*, budget, n_langs,
        |    ROW_NUMBER() OVER (ORDER BY cap_tokens, lang) AS rnk,
        |    CAST(SUM(cap_tokens) OVER (ORDER BY cap_tokens, lang
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS pfx
        |  FROM c CROSS JOIN g),
        |ff AS (
        |  SELECT *, cap_tokens <=
        |    (budget - (pfx - cap_tokens)) // (n_langs - rnk + 1) AS funded
        |  FROM f),
        |lv AS (
        |  SELECT CAST((MAX(budget)
        |      - SUM(CASE WHEN funded THEN cap_tokens ELSE 0 END))
        |    // GREATEST(SUM(CASE WHEN funded THEN 0 ELSE 1 END), 1)
        |    AS BIGINT) AS level
        |  FROM ff)
        |SELECT lang, n_docs, tokens_total, cap_tokens, funded,
        |  CASE WHEN funded THEN cap_tokens ELSE level END AS quota_tokens
        |FROM ff CROSS JOIN lv ORDER BY lang""".stripMargin,
    // The KN terms replay the Spark expression tree left to right;
    // COALESCE(c, 0)/COALESCE(n1b, 0) mirror the left joins.
    "ns63_kn_heldout" ->
      s"""WITH toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         |bg AS (
         |  SELECT doc_id, pr['pos'] AS pos, pr['a'] AS a, pr['b'] AS b FROM (
         |    SELECT doc_id, unnest([{'pos': i, 'a': t[i], 'b': t[i + 1]}
         |                           for i in range(1, len(t))]) AS pr
         |    FROM toks) s),
         |cnt AS (
         |  SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c FROM bg
         |  WHERE doc_id % 2 = 0 GROUP BY a, b),
         |pre AS (
         |  SELECT a, CAST(SUM(c) AS BIGINT) AS ca,
         |    CAST(COUNT(*) AS BIGINT) AS n1a
         |  FROM cnt GROUP BY a),
         |cont AS (
         |  SELECT b, CAST(COUNT(*) AS BIGINT) AS n1b FROM cnt GROUP BY b),
         |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM cnt),
         |p AS (
         |  SELECT bg.doc_id, bg.pos,
         |    pre.a IS NULL AS unseen_prefix, cont.b IS NULL AS unseen_word,
         |    CASE WHEN pre.a IS NULL
         |      THEN CAST(COALESCE(cont.n1b, 0) AS DOUBLE) / CAST(nn.nn AS DOUBLE)
         |      ELSE GREATEST(CAST(COALESCE(cnt.c, 0) AS DOUBLE) - 0.75, 0.0)
         |             / CAST(pre.ca AS DOUBLE)
         |           + 0.75 * CAST(pre.n1a AS DOUBLE) / CAST(pre.ca AS DOUBLE)
         |             * (CAST(COALESCE(cont.n1b, 0) AS DOUBLE)
         |                / CAST(nn.nn AS DOUBLE))
         |      END AS p
         |  FROM bg
         |  LEFT JOIN cnt ON cnt.a = bg.a AND cnt.b = bg.b
         |  LEFT JOIN pre ON pre.a = bg.a
         |  LEFT JOIN cont ON cont.b = bg.b
         |  CROSS JOIN nn
         |  WHERE bg.doc_id % 2 = 1)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         |  CAST(SUM(CASE WHEN unseen_prefix THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_unseen_prefix,
         |  CAST(SUM(CASE WHEN unseen_word THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_unseen_word,
         |  list_reduce(list_prepend(1.0, list(p ORDER BY pos)),
         |    (acc, x) -> acc * x) AS kn_score
         |FROM p GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "ns41_span_removal" ->
      s"""WITH toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         |sh AS (
         |  SELECT doc_id, [t[i] || '_' || t[i+1] || '_' || t[i+2]
         |                  for i in range(1, len(t) - 1)] AS g
         |  FROM toks),
         |hp AS (
         |  SELECT doc_id, list_transform(g, s -> ${hashSql("s")}) AS H FROM sh),
         |ex AS (
         |  SELECT doc_id, s['i'] AS i, s['h'] AS h
         |  FROM (SELECT doc_id,
         |          unnest([{'i': i, 'h': H[i]} for i in range(1, len(H) + 1)]) AS s
         |        FROM hp)),
         |freq AS (SELECT h, COUNT(*) AS c FROM ex GROUP BY h),
         |starts AS (
         |  SELECT doc_id, list(i ORDER BY i) AS st
         |  FROM ex JOIN freq USING (h) WHERE c >= 2 GROUP BY doc_id),
         |base AS (
         |  SELECT tk.doc_id, tk.t,
         |    flatten(list_transform(coalesce(s.st, []),
         |      j -> [j, j + 1, j + 2])) AS covered
         |  FROM toks tk LEFT JOIN starts s USING (doc_id)),
         |kept AS (
         |  SELECT doc_id, t,
         |    [t[i] for i in range(1, len(t) + 1)
         |     if NOT list_contains(covered, i)] AS k
         |  FROM base)
         |SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
         |  CAST(len(t) - len(k) AS BIGINT) AS n_removed,
         |  -- DuckDB's array_to_string([]) is NULL; a fully-removed doc is
         |  -- an EMPTY rewrite, not a missing one (Spark array_join = '').
         |  coalesce(array_to_string(k, ' '), '') AS text_clean
         |FROM kept ORDER BY doc_id""".stripMargin,
    "ns40_prefix_jaccard" ->
      s"""$shingleHashCte
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b, $jaccardSql AS jaccard
         |FROM hs a JOIN hs b ON a.doc_id < b.doc_id
         |WHERE len(a.hashes) >= 1 AND len(b.hashes) >= 1
         |  AND $jaccardSql >= 0.8
         |ORDER BY id_a, id_b""".stripMargin,
    "ns35_triangles" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    array_to_string(string_split(text, ' ')[1:3], ' ') AS title,
        |    string_split(text, ' ')[1] AS blk
        |  FROM documents),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM t a JOIN t b ON a.blk = b.blk AND a.doc_id < b.doc_id
        |  WHERE levenshtein(a.title, b.title) <= 5),
        |deg AS (
        |  SELECT v, CAST(COUNT(*) AS BIGINT) AS deg FROM (
        |    SELECT id_a AS v FROM pairs UNION ALL SELECT id_b AS v FROM pairs) u
        |  GROUP BY v),
        |e AS (
        |  SELECT p.id_a, p.id_b, x.deg AS da, y.deg AS db
        |  FROM pairs p JOIN deg x ON x.v = p.id_a JOIN deg y ON y.v = p.id_b),
        |oriented AS (
        |  SELECT CASE WHEN da < db OR (da = db AND id_a < id_b)
        |              THEN id_a ELSE id_b END AS u,
        |         CASE WHEN da < db OR (da = db AND id_a < id_b)
        |              THEN id_b ELSE id_a END AS w,
        |         CASE WHEN da < db OR (da = db AND id_a < id_b)
        |              THEN db ELSE da END AS dw
        |  FROM e),
        |tri AS (
        |  SELECT x.u AS c1, x.w AS c2, y.w AS c3
        |  FROM oriented x JOIN oriented y ON x.u = y.u
        |    AND (x.dw < y.dw OR (x.dw = y.dw AND x.w < y.w))
        |  JOIN oriented z ON z.u = x.w AND z.w = y.w),
        |corners AS (
        |  SELECT c1 AS v FROM tri UNION ALL SELECT c2 FROM tri
        |  UNION ALL SELECT c3 FROM tri),
        |pn AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS triangles
        |       FROM corners GROUP BY v)
        |SELECT pn.v AS doc_id, deg.deg, pn.triangles,
        |  CAST(pn.triangles * 2 AS DOUBLE)
        |    / CAST(deg.deg * (deg.deg - 1) AS DOUBLE) AS lcc
        |FROM pn JOIN deg ON deg.v = pn.v
        |ORDER BY doc_id""".stripMargin,
    "ns33_containment" ->
      s"""$shingleHashCte
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  len(list_intersect(a.hashes, b.hashes)) * 1.0
         |    / least(len(a.hashes), len(b.hashes)) AS containment
         |FROM hs a JOIN hs b ON a.doc_id < b.doc_id
         |WHERE (b.n_chars // 32) - (a.n_chars // 32) BETWEEN -2 AND 2
         |  AND len(list_intersect(a.hashes, b.hashes)) * 1.0
         |    / least(len(a.hashes), len(b.hashes)) >= 0.8
         |ORDER BY id_a, id_b""".stripMargin,
    "ns32_pagerank" -> {
      val iterCtes = (1 to 3).map { t =>
        s"""contrib$t AS (
           |  SELECT e.v AS v, e.u AS u, p.pr / CAST(d.deg AS DOUBLE) AS c
           |  FROM edges e JOIN pr${t - 1} p ON e.u = p.v JOIN deg d ON e.u = d.u),
           |sum$t AS (
           |  SELECT v, list_reduce(list_prepend(0.0, list(c ORDER BY u)),
           |    (acc, x) -> acc + x) AS s2
           |  FROM contrib$t GROUP BY v),
           |pr$t AS (
           |  SELECT n.v, (0.15 / nd) + 0.85 * COALESCE(s.s2, 0.0) AS pr
           |  FROM nodes n CROSS JOIN nn LEFT JOIN sum$t s ON n.v = s.v)""".stripMargin
      }.mkString(",\n")
      s"""$shingleHashCte,
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM hs a JOIN hs b ON a.doc_id < b.doc_id
         |  WHERE (b.n_chars // 32) - (a.n_chars // 32) BETWEEN -1 AND 1
         |    AND $jaccardSql >= 0.5),
         |edges AS (
         |  SELECT id_a AS u, id_b AS v FROM pairs
         |  UNION ALL SELECT id_b AS u, id_a AS v FROM pairs),
         |deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY u),
         |nodes AS (SELECT doc_id AS v FROM documents),
         |nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nd FROM documents),
         |pr0 AS (SELECT v, 1.0 / nd AS pr FROM nodes CROSS JOIN nn),
         |$iterCtes
         |SELECT v AS doc_id, pr FROM pr3 ORDER BY doc_id""".stripMargin
    },
    "ns31_fuzzy_match" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    array_to_string(string_split(text, ' ')[1:3], ' ') AS title,
        |    string_split(text, ' ')[1] AS blk
        |  FROM documents)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(levenshtein(a.title, b.title) AS INT) AS dist
        |FROM t a JOIN t b ON a.blk = b.blk AND a.doc_id < b.doc_id
        |WHERE levenshtein(a.title, b.title) <= 5
        |ORDER BY id_a, id_b""".stripMargin,
    "ns30_bigram_lm" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |bg AS (
        |  SELECT doc_id, pr['pos'] AS pos, pr['a'] AS a, pr['b'] AS b FROM (
        |    SELECT doc_id, unnest([{'pos': i, 'a': t[i], 'b': t[i + 1]}
        |                           for i in range(1, len(t))]) AS pr
        |    FROM toks) s),
        |cnt AS (
        |  SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c FROM bg GROUP BY a, b),
        |pre AS (
        |  SELECT a, CAST(COUNT(*) AS BIGINT) AS ca FROM bg GROUP BY a),
        |p AS (
        |  SELECT bg.doc_id, bg.pos,
        |    CAST(cnt.c AS DOUBLE) / CAST(pre.ca AS DOUBLE) AS pr
        |  FROM bg JOIN cnt USING (a, b) JOIN pre USING (a))
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |  list_reduce(list_prepend(1.0, list(pr ORDER BY pos)),
        |    (acc, x) -> acc * x) AS lm_score
        |FROM p GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "vs15_hybrid_rrf" ->
      s"""WITH $decodeFeatureCtes,
         |q AS (SELECT vec_id AS query_id, embedding AS qv FROM f WHERE vec_id < 3),
         |c AS (SELECT vec_id AS doc_id, embedding AS cv FROM f),
         |vscored AS (
         |  SELECT query_id, doc_id, $decodeCosSql AS cos
         |  FROM c JOIN q ON query_id <> doc_id),
         |vrank AS (
         |  SELECT query_id, doc_id, CAST(rn AS INT) AS vec_rank FROM (
         |    SELECT query_id, doc_id, ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY cos DESC, doc_id ASC) AS rn
         |    FROM vscored) t WHERE rn <= 20),
         |qt AS (
         |  SELECT DISTINCT doc_id AS query_id, tok FROM (
         |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
         |    FROM documents WHERE doc_id < 3) s0),
         |${bm25Ctes("qt", excludeSelf = true)},
         |lrank AS (
         |  SELECT query_id, doc_id, CAST(rn AS INT) AS lex_rank FROM (
         |    SELECT query_id, doc_id, ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY bm25 DESC, doc_id ASC) AS rn
         |    FROM byd) t WHERE rn <= 20),
         |fused AS (
         |  SELECT COALESCE(l.query_id, v.query_id) AS query_id,
         |    COALESCE(l.doc_id, v.doc_id) AS doc_id,
         |    l.lex_rank, v.vec_rank,
         |    COALESCE(1.0 / (60.0 + CAST(l.lex_rank AS DOUBLE)), 0.0)
         |      + COALESCE(1.0 / (60.0 + CAST(v.vec_rank AS DOUBLE)), 0.0) AS rrf
         |  FROM lrank l FULL OUTER JOIN vrank v
         |    ON l.query_id = v.query_id AND l.doc_id = v.doc_id),
         |rk AS (
         |  SELECT query_id, doc_id, rrf, lex_rank, vec_rank,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY rrf DESC, doc_id ASC) AS rn
         |  FROM fused)
         |SELECT query_id, CAST(rn AS INT) AS rank, doc_id, rrf, lex_rank, vec_rank
         |FROM rk WHERE rn <= 10 ORDER BY query_id, rank""".stripMargin,
  )
}
