package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for the 100 TB path. Spark's AQE skew-join
  * handles sort-merge skew at runtime; these operators cover the cases
  * AQE cannot: exploding a specific hot key across reducers when the
  * build side is too large to broadcast but small enough to replicate.
  */
object SkewOps {

  /** Salted inner equi-join: left rows scatter across `salt` buckets via
    * a deterministic row hash; right rows replicate into every bucket.
    * Result is exactly the plain join, but a hot left key now spreads
    * over `salt` reducers instead of one. Use when `right` is too big to
    * broadcast and `left`'s key distribution is skewed. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salt: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col): _*), lit(salt.toLong)))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(salt.toLong - 1))))
    saltedLeft.join(saltedRight, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase salted aggregation: partial counts per (key, salt bucket)
    * then final re-aggregation per key — caps any single reducer's input
    * at ~1/salt of the hottest key. (Spark's partial aggregation already
    * does this map-side; the explicit form matters when the partial step
    * itself needs a shuffle, e.g. after an exchange-reusing stage.) */
  def saltedCount(df: DataFrame, key: String, salt: Int): DataFrame =
    df.withColumn("__salt",
        pmod(xxhash64(df.columns.map(col): _*), lit(salt.toLong)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("n"))
}
