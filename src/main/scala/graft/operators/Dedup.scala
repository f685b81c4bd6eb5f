package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
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
                      shingleN: Int = 3, k: Int = 32, bands: Int = 16,
                      threshold: Double = 0.8): DataFrame = {
    require(k % bands == 0, "k must be divisible by bands")
    val r = k / bands
    val sh = df.select(col(idCol).as("id"),
        shingleHashes(col(textCol), shingleN).as("hashes"))
      .withColumn("sig", minhashSignature(col("hashes"), k))
    // One row per (doc, band) with the band's bucket hash; join key is
    // (band, bucket) — a plain shuffled equi-join at any scale.
    val banded = sh.select(col("id"),
      explode(transform(sequence(lit(0), lit(bands - 1)), b =>
        struct(b.as("band"), bandHash(col("sig"), b, r).as("bucket")))).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    // Verify candidates with exact Jaccard: re-attach shingle sets by id
    // (two broadcast-or-shuffle hash joins on id, not carried through the
    // LSH explode).
    val sets = sh.select(col("id"), col("hashes"))
    cand
      .join(sets.withColumnRenamed("id", "id_a").withColumnRenamed("hashes", "h_a"), "id_a")
      .join(sets.withColumnRenamed("id", "id_b").withColumnRenamed("hashes", "h_b"), "id_b")
      .withColumn("jaccard", jaccard(col("h_a"), col("h_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Exact all-pairs n-gram Jaccard above a threshold — the oracle-exact
    * form. Quadratic in documents; use [[minhashNearDups]] at scale. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        shingleN: Int = 3, threshold: Double = 0.5): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      shingleHashes(col(textCol), shingleN).as("hashes"))
    sh.as("a").join(sh.as("b"), col("a.id") < col("b.id"))
      .withColumn("jaccard", jaccard(col("a.hashes"), col("b.hashes")))
      .filter(col("jaccard") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("jaccard"))
  }

  /** SimHash fingerprint per document (over whitespace-token hashes). */
  def simhashFingerprints(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
      simhash(array_distinct(
        transform(tokens(col(textCol)), portableHash _))).as("simhash"))
}
