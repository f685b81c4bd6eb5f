package graft.operators

import graft.functions.BloomMightContainExpr
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.graftbridge.ColumnBridge

import java.io.ByteArrayOutputStream

/** Bloom-pruned semi join: build a bloom filter over the (already
  * filtered) dim keys, pre-filter the fact side with it BEFORE the join
  * shuffle, then run the real semi join to discard the bloom's false
  * positives. Results are exactly the plain semi join's — a bloom has no
  * false negatives — but the fact-side shuffle carries only rows whose
  * key might match (dim selectivity + fpp) instead of the whole table.
  *
  * At 100 TB this is the difference between shuffling the fact table and
  * shuffling the matches: a 1% -selective dim at fpp=0.01 cuts the
  * fact shuffle ~50×. Spark's own runtime row-level filtering
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) injects the same
  * shape when its cost model fires; this operator is the deterministic,
  * always-on form for pipelines that know their dim is selective.
  * The bloom build is one driver-side aggregate over the dim keys
  * (`DataFrameStatFunctions.bloomFilter`) — size the dim side so the
  * filter fits the driver (default 1 M items ≈ 1.2 MB at fpp 0.01);
  * bigger dims belong in a plain shuffle join instead.
  */
object BloomPrune {

  /** `fact` rows whose `factKey` appears in `dim`'s `dimKey` — semantics
    * of `fact SEMI JOIN dim`, physically bloom-pruned before the shuffle.
    * Keys must be integral (both sides are cast to long for the bloom so
    * build and probe hash identically — a raw string key would be
    * inserted as bytes but probed as long, silently dropping matches). */
  def semiJoin(fact: DataFrame, factKey: Column, dim: DataFrame, dimKey: Column,
               expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val bf = dim.stat.bloomFilter(dimKey.cast("long"), expectedItems, fpp)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    val mightContain = ColumnBridge.column(BloomMightContainExpr(
      ColumnBridge.expression(factKey.cast("long")), bos.toByteArray))
    // no distinct on the dim side: left_semi output is independent of
    // right-side duplicates, and the aggregate would only add a shuffle
    fact.filter(mightContain)
      .join(dim.select(dimKey), factKey === dimKey, "left_semi")
  }
}
