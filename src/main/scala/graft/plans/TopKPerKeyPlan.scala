package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.functions.col

/** The full custom-operator stack for per-key top-k — a whole-operator
  * semantic Spark's built-ins only reach via a rank window (full sort
  * of every partition group): custom [[TopKPerKeyNode]] logical plan +
  * [[TopKStrategy]] planner strategy + [[TopKPerKeyExec]] physical
  * operator, registered through `extraStrategies` (the
  * SparkSessionExtensions-compatible hook).
  *
  * The strategy plans TWO stacked execs — a PARTIAL pass with no
  * distribution requirement (runs before the exchange, bounding every
  * map partition to ≤ k rows per key: the map-side combine a window
  * formulation cannot have) and a FINAL pass requiring
  * `ClusteredDistribution(keys)` (EnsureRequirements inserts the hash
  * exchange). Global-correct because each key's true top-k within a
  * partition is a superset of its contribution to the global top-k.
  * At 100 TB the shuffle carries at most k rows per (key, map
  * partition) instead of the full table.
  *
  * Selection order: (value DESC, tie ASC) — `tie` must be unique per
  * row for deterministic output (the same contract as every rank
  * window in this library). Nulls in `value` are dropped.
  */
case class TopKPerKeyNode(keys: Seq[Expression], value: Expression,
    tie: Expression, k: Int, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(
      newChild: LogicalPlan): LogicalPlan = copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, value, tie, k, child) =>
      TopKPerKeyExec(keys, value, tie, k, partial = false,
        TopKPerKeyExec(keys, value, tie, k, partial = true,
          planLater(child))) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(keys: Seq[Expression], value: Expression,
    tie: Expression, k: Int, partial: Boolean, child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  private final class Entry(val v: Double, val t: Long, val row: UnsafeRow)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    // bind to the child's attribute order: bare AttributeReferences are
    // Unevaluable until rewritten to positional BoundReferences
    val valueExpr = org.apache.spark.sql.catalyst.expressions.BindReferences
      .bindReference(value, child.output)
    val tieExpr = org.apache.spark.sql.catalyst.expressions.BindReferences
      .bindReference(tie, child.output)
    val limit = k
    val childOutput = child.output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // normalizes whatever row flavor the child emits to UnsafeRow
      // so retained rows can be copied and held across the scan
      val rowProj = UnsafeProjection.create(childOutput, childOutput)
      // worst-on-top ordering so the heap head is the eviction victim
      val worstFirst: Ordering[Entry] = new Ordering[Entry] {
        override def compare(a: Entry, b: Entry): Int = {
          val byV = java.lang.Double.compare(b.v, a.v) // smaller v = worse
          if (byV != 0) byV else java.lang.Long.compare(a.t, b.t)
        }
      }
      val heaps =
        mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[Entry]]
      iter.foreach { row =>
        val vAny = valueExpr.eval(row)
        if (vAny != null) {
          val v = vAny.asInstanceOf[Double]
          val tAny = tieExpr.eval(row)
          // the uniqueness contract needs a real value: a null tie
          // would unbox to 0L and silently collide with other nulls
          require(tAny != null,
            s"TopKPerKey tie column evaluated to null; " +
              s"the tie-break column must be unique and non-null")
          val t = tAny.asInstanceOf[Long]
          val heap = heaps.getOrElseUpdate(keyProj(row).copy(),
            mutable.PriorityQueue.empty[Entry](worstFirst))
          if (heap.size < limit) {
            heap.enqueue(new Entry(v, t, rowProj(row).copy()))
          } else {
            val w = heap.head
            // total order via Double.compare so NaN (= greatest, as in
            // Spark SQL ordering) agrees with the heap's comparator;
            // primitive > would strand NaN rows as never-displacing
            val byV = java.lang.Double.compare(v, w.v)
            if (byV > 0 || (byV == 0 && t < w.t)) {
              heap.dequeue()
              heap.enqueue(new Entry(v, t, rowProj(row).copy()))
            }
          }
        }
      }
      heaps.valuesIterator.flatMap { heap =>
        heap.toArray.sortInPlace()(worstFirst.reverse)
          .iterator.map(_.row: InternalRow)
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(
      newChild: SparkPlan): SparkPlan = copy(child = newChild)
}

object TopKPlan {

  /** Idempotently register [[TopKStrategy]] on the session. */
  def register(spark: SparkSession): Unit =
    spark.experimental.extraStrategies =
      spark.experimental.extraStrategies
        .filterNot(_ == TopKStrategy) :+ TopKStrategy

  /** Top `k` rows per key group by (`valueCol` DESC, `tieCol` ASC),
    * through the custom operator stack. `tieCol` must be unique.
    * Expressions are built straight from the analyzed plan's output
    * attributes — the unified Column API would hand back lazy
    * ColumnNode wrappers that stay Unevaluable inside a custom exec. */
  def topKPerKey(df: DataFrame, keyCols: Seq[String], valueCol: String,
      tieCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.Cast
    import org.apache.spark.sql.types.{DoubleType, LongType}
    register(df.sparkSession)
    val lp = GraftSqlBridge.analyzed(df)
    def attr(name: String): Attribute =
      lp.output.find(_.name.equalsIgnoreCase(name)).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not found in ${lp.output.map(_.name)}"))
    val node = TopKPerKeyNode(keyCols.map(attr),
      Cast(attr(valueCol), DoubleType), Cast(attr(tieCol), LongType),
      k, lp)
    GraftSqlBridge.ofRows(df.sparkSession, node)
  }
}
