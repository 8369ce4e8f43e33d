package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** One scored item inside the top-k buffer. */
final case class Scored(id: Long, score: Long)

/** Typed per-group top-k as an `Aggregator` (SURVEY §2.10's typed custom
  * aggregate surface). Why not `row_number` + filter: the window form
  * shuffles and sorts EVERY row of every group; this aggregator's
  * reduce/merge runs map-side, so each partition ships at most k rows
  * per group to the shuffle — at 100 TB the difference between moving
  * the dataset and moving k × |groups| rows.
  *
  * Ordering is (score desc, id asc) — ties pinned for deterministic
  * output. Buffer stays a sorted k-capped Vector: k is small (report
  * top-10s, per-type leaderboards), so O(k) insertion beats heap
  * bookkeeping.
  */
final class TopKAggregator(k: Int)
    extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {

  private val ord: Ordering[Scored] =
    Ordering.by((s: Scored) => (-s.score, s.id))

  override def zero: Seq[Scored] = Vector.empty

  override def reduce(buf: Seq[Scored], x: Scored): Seq[Scored] =
    if (buf.size < k) (buf :+ x).sorted(ord)
    else if (ord.lt(x, buf.last)) (buf.init :+ x).sorted(ord)
    else buf

  override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
    (a ++ b).sorted(ord).take(k)

  override def finish(buf: Seq[Scored]): Seq[Scored] = buf.sorted(ord)

  override def bufferEncoder: Encoder[Seq[Scored]] =
    ExpressionEncoder[Seq[Scored]]()
  override def outputEncoder: Encoder[Seq[Scored]] =
    ExpressionEncoder[Seq[Scored]]()
}

object TopK {

  /** Top-k `idCol` per `groupCol` by occurrence count, via the typed
    * aggregator. Output: (group, rank, id, n) with rank 1..k. */
  def topKByCount(df: DataFrame, groupCol: String, idCol: String,
      k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.where(col(idCol).isNotNull)
      .groupBy(col(groupCol), col(idCol))
      .agg(count(lit(1)).as("n"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapValues(t => Scored(t._2, t._3))
      .agg(new TopKAggregator(k).toColumn.name("topk"))
      .flatMap { case (g, xs) =>
        xs.zipWithIndex.map { case (s, i) => (g, (i + 1).toLong, s.id, s.score) }
      }
      .toDF(groupCol, "rank", idCol, "n")
  }
}
