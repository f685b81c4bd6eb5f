package graft

import graft.operators.Similarity
import graft.functions.VectorFunctions.{cosineHof, dotProductHof}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins the MIPS→cosine norm-augmentation reduction
  * ([[Similarity.mipsAugment]]): after appending sqrt(M²−‖x‖²) to every
  * corpus vector and 0 to every query, COSINE rank order on the
  * augmented space must equal raw INNER-PRODUCT rank order on the
  * original — the identity that lets every cosine-path index
  * (sign-LSH buckets, IVF) serve MIPS unchanged at scale. Also checks
  * the augmented-norm invariant itself and the bucketed operator's
  * exact-rescore containment. */
class MipsSpec extends SparkSuite {
  import spark.implicits._

  private def emb = spark.read.parquet(s"$sf0001/embeddings.parquet")

  test("augmented cosine order equals raw inner-product order") {
    val queries = emb.filter(col("vec_id") < 10)
    val want = Similarity.mipsTopK(queries, emb, k = 5)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
      .as[(Long, Int, Long)].collect().toSet

    val (cAug, qAug) = Similarity.mipsAugment(emb, queries)
    val scored = cAug.select(col("vec_id").as("neighbor_id"), col("aug").as("cv"))
      .join(broadcast(qAug.select(col("vec_id").as("query_id"), col("aug").as("qv"))),
        col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosineHof(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    val got = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
      .as[(Long, Int, Long)].collect().toSet

    assert(got == want,
      s"augmented-cosine ranks diverge from MIPS: ${got -- want} vs ${want -- got}")
  }

  test("every augmented corpus vector has norm exactly M") {
    val (cAug, _) = Similarity.mipsAugment(emb, emb.limit(1))
    val norms = cAug
      .select(sqrt(dotProductHof(col("aug"), col("aug"))).as("n"))
      .agg(min(col("n")), max(col("n"))).head()
    // sqrt of a double sum: equal to M up to one ulp of rounding in the
    // re-fold — the ordering argument needs near-constancy, pin 1e-9
    assert(math.abs(norms.getDouble(0) - norms.getDouble(1)) < 1e-9,
      s"augmented norms not constant: $norms")
  }

  test("bucketed MIPS results are a subset of exact MIPS candidates' scores") {
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Similarity.mipsTopK(queries, emb, k = 50)
      .select(col("query_id"), col("neighbor_id"), col("dot"))
      .as[(Long, Long, Double)].collect()
      .map { case (q, n, d) => (q, n) -> d }.toMap
    val bucketed = Similarity.mipsBucketedTopK(queries, emb, k = 3, bits = 4)
      .select(col("query_id"), col("neighbor_id"), col("dot"))
      .as[(Long, Long, Double)].collect()
    assert(bucketed.nonEmpty)
    // every bucketed hit carries the same exact dot the brute path
    // computed for that pair (same fold, no approximation in rescore)
    bucketed.foreach { case (q, n, d) =>
      exact.get((q, n)).foreach(ed => assert(ed == d,
        s"dot mismatch for ($q,$n): bucketed $d vs exact $ed"))
    }
  }
}
