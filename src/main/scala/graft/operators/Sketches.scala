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

/** Buffer of the KLL-style quantile sketch: `levels(i)` holds items of
  * weight 2^i; `count` is the exact item count. Compaction preserves
  * weight EXACTLY (each promoted pair moves up at double weight, odd
  * leftovers stay in place), so Σ levels(i).size · 2^i == count always —
  * the streaming state reconstruction in maintainKllState and the
  * weight-preservation test both rely on that exact invariant. */
final case class KllState(count: Long, levels: Seq[Seq[Double]])

/** Mergeable quantile sketch in the KLL compactor style (Karnin, Lang
  * & Liberty, FOCS'16 — public), DETERMINISTIC variant: when a level
  * buffer exceeds `capacity` it sorts and promotes the LOWER item of
  * each adjacent pair to the next level at double weight (KLL proper
  * flips a coin per pair for unbiasedness; the deterministic choice
  * keeps results reproducible run-to-run — this engine's house rule —
  * at the cost of a one-sided bias that stays inside the bound below).
  *
  * Error bound, deterministic variant: a query point's estimated rank
  * moves by at most 2^ℓ per compaction at level ℓ (the single pair
  * whose interval straddles it), and level ℓ sees ≤ n/(2^ℓ·⌊cap/2⌋)
  * compactions, so |est_rank − true_rank| ≤ 2·L·n/cap with
  * L = #levels ≈ log₂(n/cap). Memory is O(cap·L) per group whatever
  * the input size — the mergeable-summary shape that lets one
  * aggregation pass quantile 100 TB per group with map-side partials,
  * where exact per-group sorting would shuffle the corpus.
  *
  * Merging concatenates level-wise then re-compacts — valid under any
  * merge tree (same argument as the paper's), which is exactly what a
  * Spark partial aggregate needs. `finish` emits the quantile
  * ESTIMATES for the requested `qs` (rank-walk over the weighted
  * items); the raw buffer is merge-order-sensitive and never leaves
  * the aggregate. */
/** The KLL sketch operations, factored out so the estimate-emitting
  * aggregator, the state-emitting aggregator (streaming upkeep), and
  * the streaming merge all run ONE definition. */
object Kll {
  def zero: KllState = KllState(0L, Seq(Vector.empty))

  def compact(capacity: Int)(
      levels: Seq[Seq[Double]]): Seq[Seq[Double]] = {
    val out = scala.collection.mutable.ArrayBuffer(
      levels.map(_.toVector): _*)
    var i = 0
    while (i < out.length) {
      if (out(i).size > capacity) {
        val sorted = out(i).sorted
        // odd leftover stays at this level; pairs promote their lower
        // element at double weight
        val (body, leftover) =
          if (sorted.size % 2 == 0) (sorted, Vector.empty[Double])
          else (sorted.tail, Vector(sorted.head))
        val promoted = body.grouped(2).map(_.head).toVector
        out(i) = leftover
        if (i + 1 >= out.length) out += Vector.empty
        out(i + 1) = out(i + 1) ++ promoted
      }
      i += 1
    }
    out.toSeq
  }

  def reduce(capacity: Int)(buf: KllState, x: Double): KllState = {
    val l0 = buf.levels.head :+ x
    val levels = l0 +: buf.levels.tail
    KllState(buf.count + 1L,
      if (l0.size > capacity) compact(capacity)(levels) else levels)
  }

  def merge(capacity: Int)(a: KllState, b: KllState): KllState = {
    val n = math.max(a.levels.size, b.levels.size)
    val levels = (0 until n).map { i =>
      a.levels.applyOrElse(i, (_: Int) => Seq.empty[Double]) ++
        b.levels.applyOrElse(i, (_: Int) => Seq.empty[Double])
    }
    KllState(a.count + b.count, compact(capacity)(levels))
  }

  /** Rank-walk estimates for the requested quantiles. */
  def quantiles(buf: KllState, qs: Seq[Double]): Seq[Double] = {
    if (buf.count == 0L) return qs.map(_ => Double.NaN)
    val weighted = buf.levels.zipWithIndex.flatMap { case (xs, i) =>
      xs.map(x => (x, 1L << i))
    }.sortBy(_._1)
    val total = weighted.iterator.map(_._2).sum
    qs.map { q =>
      val target = math.max(1L, math.ceil(q * total).toLong)
      var acc = 0L
      var ans = weighted.last._1
      val it = weighted.iterator
      var found = false
      while (it.hasNext && !found) {
        val (v, w) = it.next()
        acc += w
        if (acc >= target) { ans = v; found = true }
      }
      ans
    }
  }
}

final class KllQuantileAggregator(capacity: Int, qs: Seq[Double])
    extends Aggregator[Double, KllState, Seq[Double]] {
  require(capacity >= 8, s"capacity must be >= 8, got $capacity")
  override def zero: KllState = Kll.zero
  override def reduce(buf: KllState, x: Double): KllState =
    Kll.reduce(capacity)(buf, x)
  override def merge(a: KllState, b: KllState): KllState =
    Kll.merge(capacity)(a, b)
  override def finish(buf: KllState): Seq[Double] =
    Kll.quantiles(buf, qs)
  override def bufferEncoder: Encoder[KllState] =
    ExpressionEncoder[KllState]()
  override def outputEncoder: Encoder[Seq[Double]] =
    ExpressionEncoder[Seq[Double]]()
}

/** The state-emitting twin: same reduce/merge, `finish` = identity —
  * the shape streaming upkeep needs (the maintained state table holds
  * the sketch itself; estimates read it without replaying history). */
final class KllStateAggregator(capacity: Int)
    extends Aggregator[Double, KllState, KllState] {
  require(capacity >= 8, s"capacity must be >= 8, got $capacity")
  override def zero: KllState = Kll.zero
  override def reduce(buf: KllState, x: Double): KllState =
    Kll.reduce(capacity)(buf, x)
  override def merge(a: KllState, b: KllState): KllState =
    Kll.merge(capacity)(a, b)
  override def finish(buf: KllState): KllState = buf
  override def bufferEncoder: Encoder[KllState] =
    ExpressionEncoder[KllState]()
  override def outputEncoder: Encoder[KllState] =
    ExpressionEncoder[KllState]()
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

  /** Per-group quantiles via the mergeable KLL sketch, reported
    * through the same deterministic bound-flag scheme as
    * [[mgHeavyHitters]]: emitted VALUES are the exact rank-based
    * quantiles (value at rank ⌈q·n⌉ — replicable in any engine), and
    * the sketch contributes `bound_ok` = "the sketch's estimate has
    * true rank within the proven 2·L·n/capacity band of the target".
    * A correct sketch yields all-true flags (hash-stable vs a plain
    * SQL oracle); a broken compactor fails the gate loudly. The raw
    * sketch is merge-order-sensitive and never emitted.
    *
    * Scale: the sketch pass is one typed aggregation with O(cap·log n)
    * state per group and map-side partials; the exact quantiles (for
    * the audit) cost one per-group window — at production scale a
    * consumer would read ONLY the sketch estimates and skip the exact
    * pass entirely. */
  def kllQuantiles(df: DataFrame, groupCol: String, valueCol: String,
      qs: Seq[Double], capacity: Int = 1024): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    // drop null / uncastable values BEFORE the primitive-Double typed
    // aggregation (it would throw on a null) — same pattern as
    // equiDepthHistogram; nulls carry no rank information anyway.
    // try_cast: under ANSI semantics a plain cast would itself throw
    // on a malformed string instead of yielding null.
    val v = df.select(col(groupCol).cast("string").as("grp"),
      col(valueCol).try_cast("double").as("v"))
      .where(col("v").isNotNull)
    val ests = v.as[(String, Double)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(new KllQuantileAggregator(capacity, qs).toColumn.name("est"))
      .toDF("grp", "est")
      .select(col("grp"), posexplode(col("est")).as(Seq("qi", "est")))
    val g = v.groupBy(col("grp")).agg(count(lit(1)).as("n"))
    val targets = g.crossJoin(broadcast(
        qs.zipWithIndex.map { case (q, i) => (i, q) }.toDF("qi", "q")))
      .withColumn("target", ceil(col("q") * col("n")).cast("long"))
      .withColumn("target", greatest(col("target"), lit(1L)))
    // true rank interval of each sketch estimate: [lt + 1, le]
    val ranks = v.join(broadcast(ests), Seq("grp"))
      .groupBy(col("grp"), col("qi"))
      .agg(sum(when(col("v") < col("est"), 1L).otherwise(0L)).as("lt"),
        sum(when(col("v") <= col("est"), 1L).otherwise(0L)).as("le"))
    // exact value at the target rank (any tie order yields the same
    // value at a given rank, so the window is deterministic here)
    val w = Window.partitionBy(col("grp")).orderBy(col("v"))
    // fresh column names on the ranked side: targets and ranked share
    // the `v` lineage, so a direct grp === grp would resolve to the
    // same attribute (trivially true)
    val ranked = v.withColumn("rk", row_number().over(w))
      .select(col("grp").as("rgrp"), col("v"), col("rk"))
    val exact = targets.join(ranked,
        col("grp") === col("rgrp") && col("rk") === col("target"))
      .select(col("grp"), col("qi"), col("q"), col("n"),
        col("target"), col("v").as("exact_q"))
    // proven deterministic-KLL band: 2·L·n/cap, L = #levels
    val levels = ceil(log(2.0, greatest(col("n").cast("double") /
      capacity, lit(1.0)))) + lit(2.0)
    exact.join(ranks, Seq("grp", "qi"))
      .withColumn("bound",
        ceil(lit(2.0) * levels * col("n") / capacity).cast("long"))
      .select(col("grp"), col("q"), col("n"), col("exact_q"),
        (col("lt") + 1L <= col("target") + col("bound") &&
          col("le") >= col("target") - col("bound")).as("bound_ok"))
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

  /** 2^60 — the KMV hash space size: 15 hex digits of md5 parsed as an
    * unsigned 60-bit integer (fits a long with headroom; DuckDB parses
    * the identical '0x…' literal). Exactly representable as a double
    * (power of two), so the estimate's one division is bit-stable. */
  private[operators] val KmvSpace = 1152921504606846976L

  /** The 60-bit KMV hash of a value's string rendering. */
  def kmvHash(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Per-group KMV ("k minimum values" / theta) distinct sketch
    * (Bar-Yossef et al. RANDOM'02; Beyer et al. SIGMOD'07): keep the k
    * smallest DISTINCT hash values; with θ = the k-th smallest, the
    * unbiased distinct estimate is (k−1)·2^60/θ (exact count when
    * fewer than k distinct values exist). Unlike HLL, the kept hash
    * SET supports set algebra — see [[kmvSetOps]] — which is why both
    * sketches earn a place. Reported beside the exact count in the
    * bound-flag style of the other sketches (the exact pass exists for
    * the audit only; a production consumer reads the estimate).
    *
    * Scale: one typed aggregation with an O(k) sorted buffer and
    * map-side partials; merge is a sorted distinct-merge truncate —
    * associative and commutative, so any merge tree yields the same
    * sketch (the mergeable-summary property all Sketches here share).
    */
  def kmvDistinct(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val hashed = df.where(col(valueCol).isNotNull)
      .select(col(groupCol).cast("string").as("grp"),
        kmvHash(col(valueCol)).as("h"))
    val sk = hashed.as[(String, Long)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(new KmvAggregator(k).toColumn.name("sk"))
      .toDF("grp", "sk")
    val exact = hashed.groupBy(col("grp"))
      .agg(countDistinct(col("h")).as("exact_distinct"))
    sk.join(exact, "grp")
      .withColumn("n_kept", size(col("sk")).cast("long"))
      .withColumn("theta", when(col("n_kept") >= k,
        element_at(col("sk"), k)).otherwise(lit(KmvSpace)))
      .select(col("grp"), col("n_kept"), col("theta"),
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(KmvSpace.toDouble) /
            col("theta").cast("double")).as("est_distinct"),
        col("exact_distinct"))
  }

  /** KMV set algebra between two arms of `armCol` — the operation HLL
    * cannot do: the union sketch is the k smallest of Sa ∪ Sb, and the
    * intersection estimate counts hashes present in BOTH kept sets
    * below θ∩ = min(θa, θb), scaled by 2^60/θ∩ (the standard theta-
    * sketch intersection; exact when both sets were fully kept since
    * θ∩ = 2^60). One corpus aggregation; everything after is
    * arithmetic on two k-length arrays. */
  def kmvSetOps(df: DataFrame, armCol: String, valueCol: String,
      armA: String, armB: String, k: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val hashed = df.where(col(valueCol).isNotNull &&
        col(armCol).isin(armA, armB))
      .select(col(armCol).cast("string").as("arm"),
        kmvHash(col(valueCol)).as("h"))
    val sk = hashed.as[(String, Long)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(new KmvAggregator(k).toColumn.name("sk"))
      .toDF("arm", "sk")
    def thetaOf(s: org.apache.spark.sql.Column) =
      when(size(s) >= k, element_at(s, k)).otherwise(lit(KmvSpace))
    val a = sk.where(col("arm") === armA).select(col("sk").as("sa"))
    val b = sk.where(col("arm") === armB).select(col("sk").as("sb"))
    a.crossJoin(b)
      .withColumn("n_a", size(col("sa")).cast("long"))
      .withColumn("n_b", size(col("sb")).cast("long"))
      .withColumn("theta_a", thetaOf(col("sa")))
      .withColumn("theta_b", thetaOf(col("sb")))
      .withColumn("su", slice(array_sort(
        array_distinct(concat(col("sa"), col("sb")))), 1, k))
      .withColumn("n_u", size(col("su")).cast("long"))
      .withColumn("theta_u", thetaOf(col("su")))
      .withColumn("theta_i", least(col("theta_a"), col("theta_b")))
      .withColumn("n_common", size(filter(
        array_intersect(col("sa"), col("sb")),
        x => x < col("theta_i"))).cast("long"))
      .select(col("n_a"), col("theta_a"), col("n_b"), col("theta_b"),
        when(col("n_u") < k, col("n_u").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(KmvSpace.toDouble) /
            col("theta_u").cast("double")).as("est_union"),
        col("n_common"), col("theta_i"),
        (col("n_common").cast("double") * lit(KmvSpace.toDouble) /
          col("theta_i").cast("double")).as("est_inter"))
  }
}

/** The KMV buffer: the k smallest distinct hashes seen, kept sorted
  * ascending. Reduce fast-path rejects values ≥ the current k-th once
  * full, so steady-state cost is O(1) compare per row. */
final class KmvAggregator(k: Int)
    extends Aggregator[Long, Seq[Long], Seq[Long]] {
  override def zero: Seq[Long] = Vector.empty
  override def reduce(buf: Seq[Long], x: Long): Seq[Long] =
    if (buf.length >= k && x >= buf.last) buf
    else {
      val merged = (buf :+ x).distinct.sorted
      if (merged.length > k) merged.take(k) else merged
    }
  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = {
    val merged = (a ++ b).distinct.sorted
    if (merged.length > k) merged.take(k) else merged
  }
  override def finish(buf: Seq[Long]): Seq[Long] = buf
  override def bufferEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}
