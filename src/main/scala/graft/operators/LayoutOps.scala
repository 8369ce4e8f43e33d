package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Storage-layout operators: space-filling-curve clustering for
  * multi-dimensional data skipping.
  *
  * A sort on (a, b) clusters files perfectly for predicates on `a` and
  * barely at all for predicates on `b` alone. Interleaving the two
  * keys' BITS into one Z-value and sorting by that gives every
  * dimension roughly sqrt-locality: a box predicate on either (or
  * both) dimension touches O(sqrt(files)) instead of all of them,
  * because parquet min/max row-group stats stay tight on BOTH columns.
  * This is the layout trick behind Delta/Iceberg `ZORDER BY`,
  * recreated on plain parquet with nothing but bit arithmetic and a
  * range repartition — at 100 TB it is the difference between a
  * two-dimensional scan pruning to a few hundred files and reading
  * the whole table.
  *
  * Everything here is built-in expressions (shifts, masks, OR), so the
  * Z-value computation rides whole-stage codegen and the sort is
  * Spark's ordinary distributed range sort — no custom physical
  * operator needed.
  */
object LayoutOps {

  /** Morton/Z-value of `cols` (each treated as a non-negative integer,
    * low `bits` bits used): bit j of column k lands at position
    * `j * cols.size + k`. With the default 21 bits × 2 columns the
    * result stays well inside a long. Columns must be pre-scaled to
    * non-negative ints (caller maps doubles/dates onto ranks or fixed
    * grids first — standard for curve clustering). */
  def zValue(cols: Seq[Column], bits: Int = 21): Column = {
    require(cols.nonEmpty && bits * cols.size <= 62,
      s"bits*cols must fit a long, got $bits*${cols.size}")
    val terms = for {
      (c, k) <- cols.zipWithIndex
      j <- 0 until bits
    } yield shiftleft(shiftright(c.cast("long"), j).bitwiseAND(lit(1L)),
      j * cols.size + k)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Hilbert curve index of (x, y) at the given order — the
    * locality-tighter alternative to [[zValue]] for 2-D clustering
    * (see [[graft.functions.HilbertIndex]]: one Manhattan-adjacent
    * step per index increment, so contiguous index ranges are tight
    * rectangles where Morton has quadrant seams). Native codegen'd
    * expression; inputs must lie in [0, 2^order). */
  def hilbertValue(x: Column, y: Column, order: Int = 16): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.HilbertIndex(
        org.apache.spark.sql.GraftSqlBridge.expression(x.cast("long")),
        org.apache.spark.sql.GraftSqlBridge.expression(y.cast("long")),
        order))

  /** Cluster `df` for multi-dimensional skipping: range-partition and
    * sort by the Z-value of `cols`. Writing the result (with a
    * per-file row cap) yields files whose parquet min/max stats are
    * tight on every clustered column. The z column is dropped — it is
    * layout, not data. */
  def clusterByZ(df: DataFrame, cols: Seq[String], numPartitions: Int,
      bits: Int = 21): DataFrame = {
    val z = zValue(cols.map(col), bits)
    df.withColumn("_z", z)
      .repartitionByRange(numPartitions, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
  }

  /** Driver-side scalar twin of [[hilbertValue]] — the identical
    * rotate-and-fold loop as [[graft.functions.HilbertIndex]], needed
    * where the value is query-PLANNING metadata (one call per covering
    * square in [[rectIndexRanges]]), not row data. */
  def hilbertScalar(x: Long, y: Long, order: Int): Long = {
    val side = 1L << order
    require(x >= 0 && x < side && y >= 0 && y < side,
      s"hilbert($x, $y) outside [0, 2^$order)")
    var hx = x; var hy = y; var d = 0L
    var s = side >> 1
    while (s > 0) {
      val rx = if ((hx & s) > 0) 1L else 0L
      val ry = if ((hy & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { hx = s - 1 - hx; hy = s - 1 - hy }
        val t = hx; hx = hy; hy = t
      }
      s >>= 1
    }
    d
  }

  /** Driver-side scalar twin of [[zValue]] for 2 columns (x, y) — the
    * same bit layout: bit j of x at position 2j, of y at 2j+1. */
  def mortonScalar(x: Long, y: Long, bits: Int): Long = {
    var d = 0L
    var j = 0
    while (j < bits) {
      d |= ((x >> j) & 1L) << (2 * j)
      d |= ((y >> j) & 1L) << (2 * j + 1)
      j += 1
    }
    d
  }

  /** Decompose the rectangle [x0,x1]×[y0,y1] into a bounded set of
    * 1-D curve-index intervals that COVER it — the query-side half of
    * curve clustering: segments are pruned by their index min/max
    * stats against these intervals (a 2-D predicate cannot use a 1-D
    * stat directly).
    *
    * Mechanism: both Morton and Hilbert visit every grid-aligned
    * 2^L×2^L square contiguously (an aligned square is a subtree of
    * the curve recursion), so its index image is exactly one interval
    * of length 4^L, recoverable from any member cell by masking the
    * low 2L bits. The rect is covered by the aligned squares at the
    * smallest level whose square count fits `maxSquares`; adjacent
    * intervals are merged. The cover OVER-approximates (alignment
    * spill at the rim) — safe for skipping: a segment is only skipped
    * when it can contain NO covered cell, and every rect cell is
    * covered.
    *
    * Work is O(maxSquares) scalar curve evaluations on the DRIVER —
    * this is planning metadata like a partition-pruning predicate,
    * independent of data size; the budget bounds it regardless of
    * rect size. */
  def rectIndexRanges(x0: Long, y0: Long, x1: Long, y1: Long,
      order: Int, hilbert: Boolean,
      maxSquares: Int = 256): Seq[(Long, Long)] = {
    val side = 1L << order
    require(0 <= x0 && x0 <= x1 && x1 < side &&
      0 <= y0 && y0 <= y1 && y1 < side, "rect outside the grid")
    require(maxSquares >= 1, "maxSquares must be positive")
    def nSquares(l: Int): Long =
      ((x1 >> l) - (x0 >> l) + 1) * ((y1 >> l) - (y0 >> l) + 1)
    var lvl = 0
    while (nSquares(lvl) > maxSquares && lvl < order) lvl += 1
    val len = 1L << (2 * lvl)
    val ivs = for {
      qx <- (x0 >> lvl) to (x1 >> lvl)
      qy <- (y0 >> lvl) to (y1 >> lvl)
    } yield {
      val d =
        if (hilbert) hilbertScalar(qx << lvl, qy << lvl, order)
        else mortonScalar(qx << lvl, qy << lvl, order)
      val base = (d >> (2 * lvl)) << (2 * lvl)
      (base, base + len - 1)
    }
    val merged = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    ivs.sortBy(_._1).foreach { case (lo, hi) =>
      merged.lastOption match {
        case Some((plo, phi)) if lo <= phi + 1 =>
          merged(merged.size - 1) = (plo, math.max(phi, hi))
        case _ => merged += ((lo, hi))
      }
    }
    merged.toSeq
  }

  /** Rectangle scan over a curve-clustered [[graft.catalog.LogStore]]
    * table whose statsCol is the curve index: the rect becomes index
    * intervals ([[rectIndexRanges]]), segment stats prune the scan,
    * and the TRUE 2-D predicate is applied to the survivors — pruning
    * is strictly an optimization, never a semantics change. Returns
    * (rows, segmentsScanned, segmentsLive) so callers (and specs) see
    * the skip rate. */
  def rectScanClustered(store: graft.catalog.LogStore,
      xCol: String, yCol: String,
      x0: Long, y0: Long, x1: Long, y1: Long,
      order: Int, hilbert: Boolean,
      maxSquares: Int = 256): (DataFrame, Int, Int) = {
    val ranges = rectIndexRanges(x0, y0, x1, y1, order, hilbert,
      maxSquares).map { case (lo, hi) => (lo.toString, hi.toString) }
    val (df, scanned, live) = store.readRanges(ranges)
    (df.where(col(xCol).between(x0, x1) && col(yCol).between(y0, y1)),
      scanned, live)
  }

  /** Segment-skipping statistics of a clustering curve, MEASURED over
    * a rectangle workload: the relation is sliced into `nSegments`
    * equal-WIDTH ranges of the curve value (the deterministic stand-in
    * for a range-partitioned clustered write; both curves get the
    * identical rule), each segment's (x, y) bounding box is collected,
    * and every workload rectangle counts the segments whose box it
    * overlaps — precisely the min/max-stats pruning a clustered table
    * (parquet row groups, Delta add-file stats) would do. Output is
    * ONE row of workload totals: rectangles, live segments,
    * segment-scans, row-scans — the number to compare across curves
    * (Hilbert's one-step walk keeps boxes tight where Morton's
    * quadrant seams widen them whenever a slice straddles one).
    *
    * `rects` must be a BOUNDED relation with columns
    * (rect_id, qx0, qy0, qx1, qy1) — a query workload, not data.
    *
    * Scale shape: one pass for the curve bounds (a 2-number agg), one
    * map-side-combined groupBy into ≤nSegments rows, then a broadcast
    * cross of two bounded relations (segments × rects). The corpus is
    * touched exactly twice; nothing corpus-sized shuffles. */
  def clusterSkipStats(df: DataFrame, xCol: String, yCol: String,
      curve: Column, curveName: String, nSegments: Int,
      rects: DataFrame): DataFrame = {
    val base = df.select(col(xCol).cast("long").as("x"),
      col(yCol).cast("long").as("y"), curve.as("v"))
    val bounds = base.agg(min(col("v")).as("vmin"), max(col("v")).as("vmax"))
    val segs = base.crossJoin(broadcast(bounds))
      .withColumn("seg",
        expr(s"((v - vmin) * $nSegments) div (vmax - vmin + 1)"))
      .groupBy(col("seg"))
      .agg(min(col("x")).as("sx0"), max(col("x")).as("sx1"),
        min(col("y")).as("sy0"), max(col("y")).as("sy1"),
        count(lit(1)).as("n_rows"))
    val hitCond = col("sx0") <= col("qx1") && col("sx1") >= col("qx0") &&
      col("sy0") <= col("qy1") && col("sy1") >= col("qy0")
    segs.crossJoin(broadcast(rects))
      .agg(countDistinct(col("rect_id")).as("n_rects"),
        countDistinct(col("seg")).as("segs_live"),
        count(when(hitCond, 1)).as("segs_scanned"),
        coalesce(sum(when(hitCond, col("n_rows"))), lit(0L))
          .as("rows_scanned"))
      .select(lit(curveName).as("curve"), col("n_rects"),
        col("segs_live"), col("segs_scanned"), col("rows_scanned"))
  }
}
