package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffled equi-joins: salting.
  *
  * A hot key floods one shuffle partition; salting splits it by joining
  * on (key, salt) — the large side gets a deterministic salt derived
  * from its row content, the small side is replicated once per salt
  * value. The result is exactly the plain inner equi-join (verified by
  * oracle in q24), but the hot key's rows now spread over `salts`
  * partitions. AQE's skew-join handles moderate skew automatically;
  * explicit salting is the tool for the pathological single-key case.
  */
object Skew {

  /** Inner equi-join of `large ⋈ small` on `key`, salted `salts` ways.
    * The salt is content-derived (xxhash64 of the large row), so plans
    * stay deterministic under retries. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    val salted = large.withColumn("__salt",
      pmod(xxhash64(struct(large.columns.toIndexedSeq.map(col): _*)), lit(salts)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
