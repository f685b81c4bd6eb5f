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
      .select(col("query_id"), col("qv"), col("label").as("probe_label"))
    // search within the probed partition only
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("cv"), col(labelCol).as("probe_label"))
    val cand = c.join(broadcast(assigned), Seq("probe_label"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("probe_label"), col("neighbor_id"),
        col("rank"), col("cos"))
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
