package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Cross-phase invariants of the vs33 ANN index lifecycle that the
  * search-level oracle can only see indirectly (a dropped or
  * resurrected posting outside every query's top-3 would not move the
  * oracle): after build → append A → tombstone → compact → append B,
  * the postings id set must be exactly
  * `((history ∪ A) minus deletes) ∪ B` — batch B arrived AFTER the
  * delete, so its ids are live even where they match the delete
  * predicate, and no compacted-out id may resurface. */
class IndexLifecycleSpec extends SparkSuite {
  import spark.implicits._

  test("later appends survive earlier tombstones; compacted deletes stay dead") {
    val emb = Tables.embeddings(spark, sf0001)
    val m10 = pmod(col("vec_id"), lit(10))
    val hist = emb.filter(m10 =!= 0 && m10 =!= 1)
    val cent = Similarity.ivfTrain(hist, kCentroids = 8, iters = 3)

    val afterA = Similarity.ivfIndex(hist, cent)
      .unionByName(Similarity.ivfIndex(emb.filter(m10 === 0), cent))
    val tomb = emb.filter(pmod(col("vec_id"), lit(7)) === 3).select(col("vec_id"))
    val compacted = afterA.join(tomb, Seq("vec_id"), "left_anti")
    val finalIdx = compacted
      .unionByName(Similarity.ivfIndex(emb.filter(m10 === 1), cent))

    val ids = finalIdx.select(col("vec_id")).as[Long].collect().toSet
    val all = emb.select(col("vec_id")).as[Long].collect().toSet
    // the concrete faces: 31 is a batch-B id matching the delete
    // predicate (31 % 10 = 1, 31 % 7 = 3) — live; 3 is a history id the
    // compaction folded out (3 % 10 = 3, 3 % 7 = 3) — dead
    assert(ids.contains(31L), "post-delete append was lost")
    assert(!ids.contains(3L), "compacted tombstone resurfaced")
    // and the exact set, so nothing else leaked in either direction
    val expected = all.filter(v => v % 10 == 1 || v % 7 != 3)
    assert(ids == expected)
  }
}
