package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Unit semantics for labelPropagation and asofNearest: hand-checked
  * fixtures plus a brute-force equivalence property for the nearest
  * as-of (the oracle gate covers hash parity; these pin the math).
  */
class LpaAsofNearestSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("labelPropagation separates two cliques joined by one bridge") {
    // cliques {1,2,3} and {10,11,12}, bridge 3-10: labels must
    // converge inside each clique to its min id, and the two
    // communities must stay distinct
    val edges = Seq(
      (1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L),
      (3L, 10L)
    ).toDF("src", "dst")
    val out = GraphOps.labelPropagation(edges, iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == out(2L), s"clique A must share a label: $out")
    assert(out(11L) == out(12L), s"clique B must share a label: $out")
    assert(out(1L) != out(11L),
      s"the bridge must not merge the communities: $out")
  }

  test("labelPropagation is deterministic: min label wins frequency ties") {
    // path 1-2-3: node 2 sees labels {1, 3} once each -> tie -> min 1
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val one = GraphOps.labelPropagation(edges, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one(2L) == 1L, s"tie must break to the smallest label: $one")
  }

  test("asofNearest equals the brute-force nearest match, ties backward") {
    val us = (v: Long) => new Timestamp(v / 1000) // micros -> Timestamp(ms)
    // left at t=1000ms and 5000ms; rights at 0, 2000 (equidistant from
    // 1000 -> tie -> backward 0), and 4500 (nearest to 5000)
    val left = Seq((1L, 1L, us(1000000L)), (2L, 1L, us(5000000L)))
      .toDF("event_id", "user_id", "ts")
    val right = Seq((1L, us(0L)), (1L, us(2000000L)), (1L, us(4500000L)))
      .toDF("user_id", "ts")
    val got = RelationalOps.asofNearest(left, right, "user_id", "ts",
        "ts", "nearest_ts")
      .orderBy("event_id")
      .select(col("event_id"), col("nearest_ts"))
      .as[(Long, Timestamp)].collect().toSeq
    assert(got == Seq(
      (1L, us(0L)),      // |1000-0| == |2000-1000| -> tie -> backward
      (2L, us(4500000L)) // 4500 is 500ms away vs 2000 at 3000ms
    ), s"got $got")
    // brute-force equivalence on a denser deterministic fixture
    val l2 = (1 to 40).map(i => (i.toLong, (i % 3).toLong,
      us(i * 700000L))).toDF("event_id", "user_id", "ts")
    val r2 = (1 to 25).map(j => ((j % 3).toLong, us(j * 1100000L)))
      .toDF("user_id", "ts")
    val fast = RelationalOps.asofNearest(l2, r2, "user_id", "ts", "ts",
        "nearest_ts")
      .select(col("event_id"), col("nearest_ts"))
      .as[(Long, Timestamp)].collect().toMap
    val brute = l2.as("l").join(r2.as("r"), col("l.user_id") === col("r.user_id"))
      .select(col("l.event_id").as("eid"),
        abs(unix_micros(col("l.ts")) - unix_micros(col("r.ts"))).as("d"),
        unix_micros(col("r.ts")).as("rus"), col("r.ts").as("rts"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("eid"))
          .orderBy(col("d").asc, col("rus").asc)))
      .where(col("rk") === 1)
      .select(col("eid"), col("rts"))
      .as[(Long, Timestamp)].collect().toMap
    assert(fast == brute,
      s"asofNearest must equal brute-force nearest: ${fast.toSeq.sorted
        .zip(brute.toSeq.sorted).filter(p => p._1 != p._2).take(3)}")
  }

  test("asofNearest resolves duplicate-ts right rows to the smallest " +
      "pick in BOTH directions") {
    val us = (v: Long) => new Timestamp(v / 1000)
    // two right rows share ts=0 (picks 9, 3) and two share ts=4000
    // (picks 8, 2): the backward match at 1000ms and the forward match
    // at 3500ms must BOTH choose the minimum pick of the tied group
    val left = Seq((1L, 1L, us(1000000L)), (2L, 1L, us(3500000L)))
      .toDF("event_id", "user_id", "ts")
    val right = Seq((1L, us(0L), 9L), (1L, us(0L), 3L),
      (1L, us(4000000L), 8L), (1L, us(4000000L), 2L))
      .toDF("user_id", "ts", "pick")
    val got = RelationalOps.asofNearest(left, right, "user_id", "ts",
        "pick", "nearest_pick")
      .orderBy("event_id")
      .select(col("event_id"), col("nearest_pick"))
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 3L), (2L, 2L)), s"got $got")
  }
}
