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
}
