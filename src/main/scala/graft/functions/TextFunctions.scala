package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the training-data pipeline surface —
  * tokenization, portable hashing, shingling, MinHash, SimHash, Jaccard —
  * all built from Spark's codegen'd higher-order array functions
  * (`transform`/`aggregate`/`zip_with`), zero UDFs.
  *
  * Portability contract: every function here has an exact DuckDB
  * equivalent (list_transform/list_reduce over the same arithmetic), so
  * the driver's oracle can verify values bit-for-bit. That rules out
  * xxhash64/md5-style engine-specific hashes in favor of an explicit
  * polynomial hash mod 2^31-1 — same shape as Java's String.hashCode but
  * overflow-free in 64-bit arithmetic on both engines.
  */
object TextFunctions {

  /** Modulus for all portable hashing: 2^31-1 (Mersenne prime). Keeps
    * every intermediate product < 2^62, so int64 arithmetic never
    * overflows in either engine. */
  val HashMod = 2147483647L

  /** Whitespace tokens. Single-space split — matches DuckDB
    * string_split(text, ' ') including empty-string behavior. */
  def tokens(text: Column): Column = split(text, " ")

  /** Portable polynomial string hash:
    * fold over codepoints, h ← (h*31 + code) mod (2^31-1).
    * Backed by the native [[PortableHashExpr]] (codegen'd single-pass
    * loop); `portableHashHof` is the pure-builtins formulation kept for
    * cross-checking the two implementations in specs. */
  def portableHash(s: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      PortableHashExpr(org.apache.spark.sql.graftbridge.ColumnBridge.expression(s)))

  /** Higher-order-function formulation of [[portableHash]] — identical
    * values, no custom expression (reference implementation). */
  def portableHashHof(s: Column): Column =
    aggregate(
      transform(sequence(lit(1), length(s)), i => ascii(s.substr(i, lit(1)))),
      lit(0L),
      (acc, x) => (acc * 31 + x) % HashMod)

  /** n-token shingles joined with '_' (empty if fewer than n tokens). */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws("_", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Position-ordered shingle hash SEQUENCE for a token array — the
    * winnowing input. Backed by the native [[ShingleHashSeqExpr]]
    * (codegen'd single pass: each token hashed once, shingles combined
    * by modular arithmetic); [[shingleHashSeqHof]] is the pure-builtins
    * formulation kept for the bit-parity cross-check. */
  def shingleHashSeq(toks: Column, n: Int): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      ShingleHashSeqExpr(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(toks), n))

  /** Higher-order-function formulation of [[shingleHashSeq]] —
    * identical values (reference implementation, spec cross-check). */
  def shingleHashSeqHof(toks: Column, n: Int): Column =
    transform(shingles(toks, n), portableHash _)

  /** Distinct shingle hash set for a text column — the MinHash input.
    * array_distinct (codegen'd, first-occurrence order) over the native
    * hash sequence; [[shingleHashesHof]] is the original interpreted
    * HOF chain, retained as the cross-check. */
  def shingleHashes(text: Column, n: Int): Column =
    array_distinct(shingleHashSeq(tokens(text), n))

  /** Higher-order-function formulation of [[shingleHashes]]. */
  def shingleHashesHof(text: Column, n: Int): Column =
    array_distinct(transform(shingles(tokens(text), n), portableHash _))

  /** Winnowed fingerprint set (Schleimer/Wilkerson/Aiken 2003, the MOSS
    * scheme): slide a window of `w` consecutive positions over the
    * position-ordered k-gram hash sequence and keep each window's
    * minimum. Guarantee: any substring match of at least w+k-1 tokens
    * contributes at least one SHARED selected fingerprint to both
    * documents, so overlap on this set is a substring-level (not
    * whole-document) duplication signal. Returned as the DISTINCT
    * selected hashes — position info is dropped, which is all
    * overlap-counting needs. Documents with fewer than k tokens yield
    * an empty set; with fewer than w k-grams, the single window covers
    * the whole sequence (global min).
    *
    * Native single-pass expressions (no UDF, no interpreted lambdas);
    * exact DuckDB twin via list comprehension + list_min, and the HOF
    * formulations below are the in-engine cross-checks. */
  def winnowedFingerprints(text: Column, k: Int, w: Int): Column =
    winnowSelect(shingleHashSeq(tokens(text), k), w)

  /** The window-min selection step of [[winnowedFingerprints]], over a
    * position-ordered k-gram hash sequence column. Backed by the native
    * [[WinnowSelectExpr]] (one allocation-free pass over the primitive
    * array); [[winnowSelectHof]] is the builtins cross-check. */
  def winnowSelect(hs: Column, w: Int): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      WinnowSelectExpr(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(hs), w))

  /** Higher-order-function formulation of [[winnowSelect]] — identical
    * values (reference implementation, spec cross-check). Interpreted
    * higher-order expressions get no common-subexpression elimination,
    * so if `hs` is itself an expression it is re-evaluated inside EVERY
    * window lambda — O(len²·|shingle|) per document instead of
    * O(len·w); pass a materialized column. */
  def winnowSelectHof(hs: Column, w: Int): Column =
    when(size(hs) >= 1,
      array_distinct(
        transform(sequence(lit(1), greatest(size(hs) - (w - 1), lit(1))),
          i => array_min(slice(hs, i, lit(w))))))
      .otherwise(array().cast("array<bigint>"))

  /** MinHash signature: k permutations h_j(x) = ((2j+1)x + 7j+3) mod p,
    * signature[j] = min over the shingle-hash set. Native expression;
    * [[minhashSignatureHof]] is the builtins cross-check. */
  def minhashSignature(hashes: Column, k: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge._
    column(MinHashSigExpr(expression(hashes), k))
  }

  /** Higher-order-function formulation of [[minhashSignature]]. */
  def minhashSignatureHof(hashes: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), j =>
      array_min(transform(hashes, h => ((j * 2 + 1) * h + (j * 7 + 3)) % HashMod)))

  /** Hash one LSH band (rows [b*r+1, b*r+r] of the signature) to a single
    * bucket id — the join key of the banded LSH self-join. */
  def bandHash(sig: Column, band: Column, rowsPerBand: Int): Column =
    aggregate(slice(sig, band * rowsPerBand + 1, lit(rowsPerBand)),
      lit(0L), (acc, x) => (acc * 31 + x) % HashMod)

  /** Bit b (0-based) of a non-negative int64, via arithmetic shift so the
    * same expression runs in DuckDB (Spark's shiftright needs a literal
    * shift amount; division by 2^b does not). */
  private def bitAt(h: Column, b: Column): Column =
    pmod((h.cast("double") / pow(lit(2.0), b)).cast("long"), lit(2L))

  /** 31-bit SimHash over a token-hash multiset: bit b is set iff more
    * than half the tokens have bit b set in their hash. */
  def simhash(hashes: Column, bits: Int = 31): Column =
    aggregate(
      transform(sequence(lit(0), lit(bits - 1)), b =>
        when(aggregate(hashes, lit(0L), (acc, h) => acc + bitAt(h, b)) * 2 > size(hashes),
          pow(lit(2.0), b).cast("long")).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)

  /** Exact Jaccard similarity of two pre-deduplicated long-hash sets.
    * Native sort-merge expression; [[jaccardHof]] is the builtins
    * cross-check (identical for distinct inputs). */
  def jaccard(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge._
    column(SetJaccardExpr(expression(a), expression(b)))
  }

  /** [[jaccard]] for hash sets ALREADY sorted ascending (e.g.
    * `sort_array(shingleHashes(...))` materialized once per document):
    * merge-only, no per-pair sort — the right form inside candidate
    * joins that evaluate millions of pairs. */
  def jaccardSorted(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge._
    column(SortedSetJaccardExpr(expression(a), expression(b)))
  }

  /** Builtins formulation of [[jaccard]] (any element type). */
  def jaccardHof(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** Intersection size of pre-sorted distinct hash sets (native,
    * merge-only — [[SortedSetOverlapExpr]]); the numerator of
    * containment measures. */
  def overlapSorted(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge._
    column(SortedSetOverlapExpr(expression(a), expression(b)))
  }
}
