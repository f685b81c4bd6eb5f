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
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
  }

  /** Bucketed ANN: both sides hashed to a sign-bucket over the first
    * `bits` dimensions; candidates only within the same bucket (recall
    * trades off with `bits`). The join is a plain equi-join on bucket. */
  def bucketedTopK(queries: DataFrame, corpus: DataFrame, k: Int, bits: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"),
      signBucket(col("embedding"), bits).as("bucket"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"),
      signBucket(col("embedding"), bits).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("bucket"), col("neighbor_id"), col("rank"), col("cos"))
  }

  /** All corpus pairs with cosine ≥ threshold, via the bucket equi-join
    * (embedding-cosine near-dup detection). */
  def cosineNearDups(corpus: DataFrame, threshold: Double, bits: Int): DataFrame = {
    val c = corpus.select(col("vec_id"), col("embedding"),
      signBucket(col("embedding"), bits).as("bucket"))
    c.as("a").join(c.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", cosine(col("a.embedding"), col("b.embedding")))
      .filter(col("cos") >= threshold)
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"), col("cos"))
  }
}
