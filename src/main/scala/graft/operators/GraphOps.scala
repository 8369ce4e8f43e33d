package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Iterative graph algorithms expressed as repeated join+aggregate
  * plans — each iteration is one ordinary shuffle-on-key round, which
  * is exactly how Pregel-style systems map onto a relational engine.
  * (Connected components lives in [[Dedup.connectedComponents]] beside
  * its dedup use case.)
  */
object GraphOps {

  /** PageRank, `iters` synchronous iterations, damping `d`:
    * `PR₀ = 1/N`, `PRₜ₊₁(v) = (1−d)/N + d·Σ_{u→v} PRₜ(u)/deg(u)`.
    * Dangling mass (sink nodes) is dropped, not redistributed — the
    * simplest standard variant, chosen so the oracle stays a pure
    * relational recurrence; scores then sum to < 1.
    *
    * Determinism: per-edge contributions are IEEE double ops on
    * identical operands in any engine; the per-node Σ — the one
    * order-sensitive step — accumulates in DECIMAL(38,18), so ranks
    * after every iteration are bit-reproducible (the dsum pattern,
    * see SparkEntry's oracle-parity notes).
    *
    * Scale: each iteration shuffles (edge endpoint, contribution)
    * pairs once and the node list once — O(E+V) per round, no
    * driver-side state beyond the node count. Ranks are
    * `localCheckpoint`ed every iteration so the plan does not deepen
    * geometrically with `iters` (lineage cut = the relational form of
    * Pregel's superstep barrier). */
  def pageRank(edges: DataFrame, iters: Int, d: Double = 0.85,
      checkpoint: Boolean = true): DataFrame = {
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
    val nD = nodes.count().toDouble
    val outDeg = edges.groupBy(col("src"))
      .agg(count(lit(1)).as("deg"))
    val base = (lit(1.0) - lit(d)) / lit(nD)
    var pr = nodes.select(col("node"), (lit(1.0) / lit(nD)).as("pr"))
    for (_ <- 1 to iters) {
      val sums = edges.join(pr, edges("src") === pr("node"))
        .join(outDeg, "src")
        .select(col("dst"),
          (col("pr") / col("deg").cast("double")).as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c").cast(DecimalType(38, 18))).cast("double").as("s"))
      pr = nodes.join(sums, nodes("node") === sums("dst"), "left")
        .select(nodes("node"),
          (base + lit(d) * coalesce(col("s"), lit(0.0))).as("pr"))
      if (checkpoint) pr = pr.localCheckpoint(true)
    }
    pr
  }
}
