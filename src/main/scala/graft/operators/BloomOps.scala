package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.BloomFunctions.might_contain_long

/** Bloom-prefiltered joins: the manual form of the runtime row-level
  * filtering a warehouse applies when a selective dimension prunes a
  * huge fact scan. The dimension's join keys are folded into a Bloom
  * filter (distributed tree aggregation, driver gets only the merged
  * bitmap), the filter probes the fact side IN ITS SCAN STAGE —
  * before the join shuffle — and the exact join afterwards removes
  * the false positives. Result ≡ the plain join (Bloom filters have
  * no false negatives); the shuffle shrinks by the selectivity.
  *
  * When to use at 100 TB: the dim side is too large to broadcast as
  * ROWS (so the join must shuffle both sides) but its BLOOM fits in
  * a few MB — e.g. 100M distinct keys at 3% fpp ≈ 87 MB, 10M ≈ 9 MB.
  * A broadcastable dim should just broadcast; AQE's runtime filters
  * handle simple cases automatically, and this operator is the
  * explicit, tunable version of the same trade.
  */
object BloomOps {

  /** Exact left-semi join on integral keys with a Bloom prefilter on
    * the fact side. `expectedItems`/`fpp` size the filter — overshoot
    * expectedItems rather than under (an overfull bloom degrades to
    * pass-everything, which is correct but prunes nothing). */
  def bloomSemiJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    val bloom = dim.stat.bloomFilter(dimKey, expectedItems, fpp)
    val out = new java.io.ByteArrayOutputStream()
    bloom.writeTo(out)
    val keys = dim.select(col(dimKey)).distinct()
    fact
      .where(might_contain_long(col(factKey), out.toByteArray))
      .join(keys, fact(factKey) === keys(dimKey), "left_semi")
  }
}
