package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-10 operators: Theil–Sen robust slope, Neyman-allocation
  * stratified sampling. */
class Round10OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("theilSen: median pairwise slope resists the outlier day OLS " +
      "would chase") {
    // daily sums: day k carries value 2k (slope exactly 2.0), except
    // one wild outlier day. 7 days -> 21 pairwise slopes; the median
    // slope must stay 2.0 while the mean slope is dragged.
    val rows = (0 until 7).flatMap { k =>
      val v = if (k == 3) 1000.0 else 2.0 * k
      Seq((s"2024-01-0${k + 1} 10:00:00", "view", v))
    }.map { case (t, e, v) => (ts(t), e, v) }
    val out = AnalyticsOps.theilSen(rows.toDF("ts", "event_type", "value"))
      .as[(String, Long, Double)].collect()
    assert(out.length == 1)
    val (_, nPairs, slope) = out.head
    assert(nPairs == 21)
    assert(slope == 2.0, s"robust slope must ignore the outlier: $slope")
  }

  test("theilSen: even pair count takes (lo+hi)/2 of the two middles") {
    // 4 days, values 0, 1, 4, 5 on days 0..3 -> 6 slopes:
    // 1, 2, 5/3, 3, 2, 1 -> sorted [1, 1, 5/3, 2, 2, 3]; middles
    // 5/3 and 2 -> median (5/3 + 2)/2 = 11/6
    val rows = Seq((ts("2024-01-01 00:00:00"), "c", 0.0),
      (ts("2024-01-02 00:00:00"), "c", 1.0),
      (ts("2024-01-03 00:00:00"), "c", 4.0),
      (ts("2024-01-04 00:00:00"), "c", 5.0))
    val out = AnalyticsOps.theilSen(rows.toDF("ts", "event_type", "value"))
      .as[(String, Long, Double)].collect().head
    assert(out._2 == 6L)
    assert(out._3 == (5.0 / 3.0 + 2.0) / 2.0)
  }

  test("neymanSample: seats follow N_h*sigma_h, not group size") {
    // stratum A: 100 rows, constant value (sigma = 0) -> weight 0
    // stratum B: 50 rows, high spread -> all non-floor seats
    // stratum C: 50 rows, half B's spread over half the rows
    val rows =
      (1 to 100).map(i => ("A", i.toLong, 10L)) ++
      (1 to 50).map(i => ("B", 1000L + i, if (i % 2 == 0) 0L else 100L)) ++
      (1 to 50).map(i => ("C", 2000L + i, if (i % 2 == 0) 0L else 50L))
    val df = rows.toDF("g", "id", "v")
    val out = PipelineOps.neymanSample(df, "g", "id", "v", totalN = 30)
      .as[(String, Long, Long)].collect()
    val byG = out.groupBy(_._1).view.mapValues(_.length).toMap
    // weights: A = 0, B = 50*sigmaB, C = 50*sigmaC = B/2
    // quotas: A 0, B 20, C 10
    assert(!byG.contains("A"), "zero-variance stratum gets no seats")
    assert(byG("B") == 20 && byG("C") == 10, byG.toString)
    assert(out.length == 30)
    // deterministic: same call, same selection
    val again = PipelineOps.neymanSample(df, "g", "id", "v", 30)
      .as[(String, Long, Long)].collect()
    assert(out.sortBy(_._2).sameElements(again.sortBy(_._2)))
  }

  test("neymanSample: target caps at stratum size") {
    val rows = (1 to 3).map(i => ("S", i.toLong, (i * 7).toLong)) ++
      (1 to 100).map(i => ("T", 100L + i, (i % 13).toLong))
    val out = PipelineOps.neymanSample(rows.toDF("g", "id", "v"),
        "g", "id", "v", totalN = 50)
      .as[(String, Long, Long)].collect()
    val byG = out.groupBy(_._1).view.mapValues(_.length).toMap
    assert(byG.getOrElse("S", 0) <= 3, "cannot take more than the stratum")
  }
}
