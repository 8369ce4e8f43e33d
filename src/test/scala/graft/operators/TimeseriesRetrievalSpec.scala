package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Specs for the time-series downsampling, distributed-scan sampling,
  * rank-fusion, MinHash-estimator, and PQ operators. */
class TimeseriesRetrievalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("filterFunnel: cumulative conjunction counts, null flags are " +
      "false, shares relative to stage 0") {
    val flags = Seq(
      (1L, Option(true), Option(true)),
      (2L, Option(true), Option(false)),
      (3L, Option(false), Option(true)), // fails s1 → can't count in s2
      (4L, Option.empty[Boolean], Option(true)) // unjoined → false
    ).toDF("id", "s1", "s2")
    val out = PipelineOps.filterFunnel(flags, Seq("s1", "s2"))
      .select("stage_idx", "stage", "n", "share_of_input")
      .as[(Long, String, Long, Double)].collect().sortBy(_._1)
    assert(out.map(r => (r._1, r._2, r._3)).toSeq === Seq(
      (0L, "all", 4L), (1L, "s1", 2L), (2L, "s2", 1L)))
    assert(out.map(_._4).toSeq === Seq(1.0, 0.5, 0.25))
  }

  test("resampleOhlc: open/close by event order, extremes, exact sum") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:05:00"), "view", 3.0),
      (2L, ts("2024-01-01 10:10:00"), "view", 9.0),
      (3L, ts("2024-01-01 10:55:00"), "view", 1.0),
      (4L, ts("2024-01-01 11:01:00"), "view", 7.0),
      // equal-ts tie inside one bucket: event_id breaks it
      (6L, ts("2024-01-01 12:00:00"), "click", 5.0),
      (5L, ts("2024-01-01 12:00:00"), "click", 2.0)
    ).toDF("event_id", "ts", "event_type", "value")
    val out = RelationalOps.resampleOhlc(ev, unit = "hour")
      .orderBy("event_type", "bucket")
      .select("event_type", "n", "open", "high", "low", "close", "vsum")
      .as[(String, Long, Double, Double, Double, Double, Double)]
      .collect()
    assert(out === Array(
      ("click", 2L, 2.0, 5.0, 2.0, 5.0, 7.0), // id 5 opens, id 6 closes
      ("view", 3L, 3.0, 9.0, 1.0, 1.0, 13.0),
      ("view", 1L, 7.0, 7.0, 7.0, 7.0, 7.0)))
  }

  test("rollingZscore: trailing frame excludes current row, min-prev gate") {
    val rows = (1 to 6).map(i =>
      (i.toLong, 1L, ts(f"2024-01-01 10:0$i:00"), i.toDouble))
    val out = RelationalOps.rollingZscore(rows.toDF(
        "event_id", "user_id", "ts", "value"),
        key = "user_id", tsCol = "ts", idCol = "event_id",
        valCol = "value", n = 10, minPrev = 3)
      .orderBy("event_id")
      .select("n_prev", "mean_prev", "z")
      .collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(0L, 1L, 2L, 3L, 4L, 5L))
    // row 4 scores against {1,2,3}: mean 2, var 1, z = (4-2)/1 = 2
    assert(out(3).getDouble(1) === 2.0 && out(3).getDouble(2) === 2.0)
    // first three rows have < minPrev trailing points → NULL z
    assert(out.take(3).forall(_.isNullAt(2)))
  }

  test("distributedPrefixSum equals the global window cumsum") {
    val df = Seq((3L, 10L), (1L, 5L), (8L, 2L), (4L, 7L), (12L, 1L),
      (9L, 4L), (0L, 3L)).toDF("id", "w")
    val got = RelationalOps.distributedPrefixSum(df, "id", "w",
        nBuckets = 4)
      .orderBy("id").select("id", "cum").as[(Long, Long)].collect()
    val want = df.withColumn("cum", sum(col("w")).over(
        Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)))
      .orderBy("id").select("id", "cum").as[(Long, Long)].collect()
    assert(got === want)
  }

  test("distributedPrefixSum survives orderCol keys near 2^63 " +
      "(decimal bucket split, no Long-multiply wraparound)") {
    // keys above 2^63/nBuckets would wrap a Long multiply and scramble
    // bucket order; the decimal split must keep the exact cumsum
    val top = Long.MaxValue
    val df = Seq((top - 2, 1L), (top - 10, 2L), (5L, 3L),
      (top - 5, 4L), (1000L, 5L)).toDF("id", "w")
    val got = RelationalOps.distributedPrefixSum(df, "id", "w",
        nBuckets = 4)
      .orderBy("id").select("id", "cum").as[(Long, Long)].collect()
    val want = df.withColumn("cum", sum(col("w")).over(
        Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)))
      .orderBy("id").select("id", "cum").as[(Long, Long)].collect()
    assert(got === want)
  }

  test("ppsSystematicSample: uniform weights draw exactly every W/k-th") {
    val df = (1L to 100L).map(i => (i, 1L)).toDF("id", "w")
    val out = PipelineOps.ppsSystematicSample(df, "id", "w", k = 10)
      .select("id").as[Long].collect().sorted
    // equal weights degrade to plain systematic sampling: every 10th
    assert(out === Array(10L, 20L, 30L, 40L, 50L, 60L, 70L, 80L, 90L, 100L))
  }

  test("ppsSystematicSample: heavy rows always drawn, at most k draws") {
    val df = (1L to 100L).map(i =>
      // one heavy row (weight 300 > W/k) among 99 light ones
      (i, if (i == 50L) 300L else 1L + i % 3)).toDF("id", "w")
    val out = PipelineOps.ppsSystematicSample(df, "id", "w", k = 10)
      .select("id").as[Long].collect().toSet
    // a row with weight > W/k spans ≥1 slot boundary by construction
    assert(out.contains(50L))
    // one draw per spanned slot start, collapsed per row → ≤ k rows
    assert(out.size <= 10)
  }

  test("rrfFuse: shared ids outrank single-list ids, pinned scores") {
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("doc_id", "rank")
    val b = Seq((20L, 1), (40L, 2)).toDF("doc_id", "rank")
    val out = AnalyticsOps.rrfFuse(a, b)
      .select("rank", "id", "rrf").as[(Int, Long, Double)].collect()
    assert(out.head._2 === 20L) // in both lists → highest fused score
    assert(out.head._3 === 1.0 / 62 + 1.0 / 61)
    assert(out.map(_._2).toSet === Set(10L, 20L, 30L, 40L))
  }

  test("minhashEstimatePairs: identical docs estimate 1 with zero error") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six seven")
    ).toDF("doc_id", "text")
    val out = Dedup.minhashEstimatePairs(docs)
      .select("id_a", "id_b", "est", "jaccard", "abs_err")
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(out.exists(r => r._1 == 1L && r._2 == 2L &&
      r._3 == 1.0 && r._4 == 1.0 && r._5 == 0.0))
  }

  test("pqTopK: self-coded codebook vectors rank themselves first") {
    // corpus = 20 spread-out vectors; the first 16 form the codebook,
    // so each of them encodes to itself and its ADC self-distance
    // (via a twin query) is strictly minimal
    val vecs = (0L until 20L).map { i =>
      (i, Array.tabulate(64)(d =>
        (if (d % 16 == i % 16) 10f + i else 0f) + 0.01f * d))
    }.toDF("vec_id", "embedding")
    val out = Similarity.pqTopK(vecs,
        vecs.where(col("vec_id") === 17L), k = 3)
      .select("rank", "neighbor_id").as[(Int, Long)].collect()
    // 17 ≡ 1 (mod 16): its nearest PQ cell is codeword 1's pattern
    assert(out.length === 3 && out.head._1 === 1)
    assert(out.head._2 === 1L)
  }
}
