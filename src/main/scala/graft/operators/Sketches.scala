package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra–Gries heavy-hitters summary as a typed mergeable aggregate
  * (survey §2.10 custom-aggregate surface; companions: the HLL distinct
  * sketches and the typed top-k aggregator).
  *
  * The sketch keeps at most `k` (item, count) entries. Classic stream
  * step per item: bump a tracked item, insert if room, else decrement
  * every tracked count by one (dropping zeros). Partial sketches merge
  * by summing counts then subtracting the (k+1)-th largest count from
  * all (Agarwal et al., "Mergeable Summaries", PODS'12) — the same
  * guarantee survives any merge tree, which is what makes this a valid
  * map-side-partial Spark aggregate.
  *
  * Guarantee: for every item, `true_count - estimate ≤ n/(k+1)` (n =
  * stream length), and any item with `true_count > n/(k+1)` is present
  * in the sketch. Memory is O(k) regardless of cardinality — the whole
  * point at 100 TB, where exact per-key counts of a hot-key hunt would
  * shuffle billions of groups.
  */
final class MisraGriesAggregator(k: Int)
    extends Aggregator[Long, Map[Long, Long], Map[Long, Long]] {

  override def zero: Map[Long, Long] = Map.empty

  override def reduce(buf: Map[Long, Long], x: Long): Map[Long, Long] =
    buf.get(x) match {
      case Some(c) => buf.updated(x, c + 1L)
      case None if buf.size < k => buf.updated(x, 1L)
      case None =>
        buf.view.mapValues(_ - 1L).filter(_._2 > 0L).toMap
    }

  override def merge(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] = {
    val m = (a.keySet ++ b.keySet).iterator
      .map(key => key -> (a.getOrElse(key, 0L) + b.getOrElse(key, 0L)))
      .toMap
    if (m.size <= k) m
    else {
      // subtract the (k+1)-th largest count from everything: at most k
      // entries stay positive, and each estimate drops by no more than
      // the error the decrement steps are already allowed
      val d = m.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
      m.view.mapValues(_ - d).filter(_._2 > 0L).toMap
    }
  }

  override def finish(buf: Map[Long, Long]): Map[Long, Long] = buf

  override def bufferEncoder: Encoder[Map[Long, Long]] =
    ExpressionEncoder[Map[Long, Long]]()
  override def outputEncoder: Encoder[Map[Long, Long]] =
    ExpressionEncoder[Map[Long, Long]]()
}

object Sketches {

  /** Heavy hitters of a long-typed column via MG(k), reported through
    * the deterministic bound-flag scheme the approx sketches all use:
    * the emitted ROWS come from the exact counts (items whose true
    * count exceeds n/(k+1) — the set the sketch provably captures), and
    * the sketch contributes `bound_ok` = "item is in the sketch AND its
    * estimate is within the proven n/(k+1) error". A correct
    * implementation yields all-true flags (hash-stable against a plain
    * SQL oracle); a broken one fails the gate. The sketch itself is
    * order-sensitive across merges, so its raw content is NOT emitted.
    */
  def mgHeavyHitters(df: DataFrame, item: org.apache.spark.sql.Column,
      k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val items = df.select(item.cast("long").as("item"))
    val sk = items.as[Long]
      .groupByKey(_ => 0)
      .agg(new MisraGriesAggregator(k).toColumn.name("sk"))
      .select(explode(col("sk")).as(Seq("item", "approx")))
    val tot = items.agg(count(lit(1)).as("n"))
    items.groupBy(col("item"))
      .agg(count(lit(1)).as("exact_cnt"))
      .join(broadcast(tot))
      .where(col("exact_cnt") > col("n") / lit(k + 1))
      .join(broadcast(sk), Seq("item"), "left")
      .select(col("item"), col("exact_cnt"),
        (col("approx").isNotNull &&
          (col("exact_cnt") - col("approx")) <= col("n") / lit(k + 1))
          .as("bound_ok"))
  }

  /** Deterministic Count-Min bucket for hash row `r`: the first byte of
    * md5("r|key") — replicable in any engine with md5, like the
    * simhash/minhash seeds. */
  private def cmBucket(r: Int, key: org.apache.spark.sql.Column,
      w: Int): org.apache.spark.sql.Column =
    conv(substring(md5(concat_ws("|", lit(r.toString), key)), 1, 2),
      16, 10).cast("long") % w

  /** Count-Min sketch build (Cormode–Muthukrishnan, public): `d`
    * pairwise-independent-ish hash rows × `w` counters. The sketch is
    * the 100 TB frequency-estimation workhorse because it is MERGEABLE
    * and BOUNDED: however large the input, the counter relation tops
    * out at d·w rows (map-side partial aggregation collapses the d×
    * exploded stream long before the shuffle), partial sketches union
    * by plain counter addition, and estimates only ever OVERcount
    * (one-sided ε·n error with w ≈ e/ε). Returns (r, bucket, cnt). */
  def countMin(df: DataFrame, key: org.apache.spark.sql.Column,
      d: Int = 4, w: Int = 256): DataFrame =
    df.select(explode(array((0 until d).map(r =>
        struct(lit(r).as("r"), cmBucket(r, key, w).as("bucket"))): _*))
        .as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Point estimates from a Count-Min counter relation: for each row of
    * `keys` (column `key`), the minimum counter across the d hash
    * rows. Counters broadcast (≤ d·w rows by construction). */
  def countMinEstimate(counters: DataFrame, keys: DataFrame,
      d: Int = 4, w: Int = 256): DataFrame =
    keys.select(col("key"), explode(array((0 until d).map(r =>
        struct(lit(r).as("r"), cmBucket(r, col("key"), w).as("bucket"))): _*))
        .as("rb"))
      .select(col("key"), col("rb.r").as("r"), col("rb.bucket").as("bucket"))
      .join(broadcast(counters), Seq("r", "bucket"))
      .groupBy(col("key"))
      .agg(min(col("cnt")).as("cm_est"))
}
