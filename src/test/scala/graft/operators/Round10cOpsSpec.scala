package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-10 third batch: Holt–Winters seasonal smoothing, the A/B
  * minimum-detectable-effect readout, and the data-constrained
  * epoch/repetition budget. */
class Round10cOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  /** Reference JVM replay of the additive HW recursion — the spec's
    * oracle for the SQL fold (same IEEE ops in the same order). */
  private def hwReference(xs: Seq[Double], m: Int, a: Double,
      b: Double, g: Double): (Double, Double, Double) = {
    var l = xs.take(m).foldLeft(0.0)(_ + _) / m.toDouble
    var tr = 0.0
    val s = scala.collection.mutable.ArrayDeque.from(
      xs.take(m).map(_ - l))
    for (x <- xs.drop(m)) {
      val sOld = s.removeHead()
      val lNew = a * (x - sOld) + (1 - a) * (l + tr)
      tr = b * (lNew - l) + (1 - b) * tr
      s.append(g * (x - lNew) + (1 - g) * sOld)
      l = lNew
    }
    (l, tr, s.head)
  }

  test("holtWinters: the SQL fold replays the reference recursion " +
      "bit-for-bit and locks onto a pure weekly pattern") {
    // 28 days of a clean period-7 pattern: value = seasonal[dow]
    val season = Seq(10.0, 20.0, 30.0, 40.0, 30.0, 20.0, 10.0)
    val xs = (0 until 28).map(k => season(k % 7))
    val rows = (0 until 28).map(k =>
      (ts(f"2024-01-${k + 1}%02d 12:00:00"), "a", xs(k)))
    val out = AnalyticsOps.holtWinters(
        rows.toDF("ts", "event_type", "value"), "event_type", "ts",
        "value")
      .as[(String, Long, Double, Double, Double, Double)]
      .collect().head
    val (_, nDays, level, trend, seasonNext, forecast) = out
    assert(nDays == 28)
    val (rl, rt, rs) = hwReference(xs, 7, 0.5, 0.3, 0.2)
    assert(level == rl && trend == rt && seasonNext == rs,
      s"fold must equal the reference replay: ($level,$trend," +
        s"$seasonNext) vs ($rl,$rt,$rs)")
    assert(forecast == rl + rt + rs)
    // day 29 is a Monday (k % 7 == 0): the forecast must sit near the
    // Monday seasonal low, far from the Thursday high
    assert(math.abs(forecast - 10.0) < 4.0,
      s"weekly pattern must dominate the forecast: $forecast")
  }

  test("holtWinters: keys with under two full seasons are dropped") {
    val rows = (0 until 10).map(k =>
      (ts(f"2024-01-${k + 1}%02d 12:00:00"), "short", 1.0))
    val out = AnalyticsOps.holtWinters(
      rows.toDF("ts", "event_type", "value"), "event_type", "ts",
      "value").collect()
    assert(out.isEmpty, "10 days < 2x7 must not emit a row")
  }

  test("abPowerMde: more data means a smaller detectable effect") {
    def mk(n: Int, tag: String) = (1 to n).map(i =>
      (ts("2024-01-01 00:00:00"), tag, i.toLong,
        (i % 7).toDouble + (if (i % 2 == 0) 1.0 else 0.0)))
    val df = (mk(200, "small") ++ mk(5000, "big"))
      .toDF("ts", "event_type", "event_id", "value")
      .withColumn("arm",
        org.apache.spark.sql.functions.expr("cast(event_id % 2 as int)"))
    val out = AnalyticsOps.abPowerMde(df, "event_type", "arm", "value")
      .as[(String, Long, Long, Double, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    val small = out("small")
    val big = out("big")
    assert(small._6 > big._6,
      s"MDE must shrink with n: small ${small._6} vs big ${big._6}")
    // MDE = (z_{.975} + z_{.8}) * se, exactly
    assert(small._6 ==
      (1.959963984540054 + 0.8416212335729143) * small._5)
    assert(small._7 == small._6 / small._4, "relative MDE = mde/mean_a")
  }

  test("repeatBudget: small sources repeat up to the cap, large ones " +
      "serve one partial epoch, effective discounts repeats") {
    // two sources; budget 1000 chars -> target 500 each
    // tiny: u = 100 -> needs 5 epochs, capped at 4 -> served 400
    //   e = 4, frac 0 -> effective = 100*(2 - 2/16) = 187.5
    // large: u = 2000 -> 1 epoch, served 500 (partial)
    //   e = 0, frac 500 -> effective = 2000*(2-2/1) + 500/1 = 500
    val docs = ((1 to 10).map(i => (s"t$i", "tiny", "x" * 10)) ++
      (1 to 10).map(i => (s"l$i", "large", "y" * 200)))
      .toDF("doc_id", "source", "text")
    val out = PipelineOps.repeatBudget(docs, "source",
        budgetChars = 1000L, maxEpochs = 4)
      .as[(String, Long, Long, Long, Long, Double)]
      .collect().map(r => r._1 -> r).toMap
    val tiny = out("tiny")
    assert(tiny._2 == 100 && tiny._3 == 500)
    assert(tiny._4 == 4, s"epoch cap must bind: ${tiny._4}")
    assert(tiny._5 == 400, "served = u * cappedEpochs")
    assert(tiny._6 == 187.5, s"geometric discount: ${tiny._6}")
    val large = out("large")
    assert(large._2 == 2000 && large._4 == 1 && large._5 == 500)
    assert(large._6 == 500.0,
      "a first partial epoch is undiscounted at full value")
    assert(tiny._6 < tiny._5.toDouble,
      "repetition must be worth less than its raw char count")
  }

  test("katzCentrality: exact truncated-series values on a chain, " +
      "and K beyond the diameter reaches the fixpoint") {
    // chain 1 -> 2 -> 3 with beta = 1/2: x(1) = 1 (no in-edges),
    // x(2) = 1 + 1/2, x(3) = 1 + 1/2*(1 + 1/2) = 1.75 — all exact
    // halving arithmetic, so equality is exact
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val out = GraphOps.katzCentrality(edges, iters = 4)
      .as[(Long, Double)].collect().toMap
    assert(out == Map(1L -> 1.0, 2L -> 1.5, 3L -> 1.75), out.toString)
  }

  test("segmentedTrend: per-week OLS slopes are exact on linear " +
      "segments and the delta reads the slope change") {
    // week of 2024-01-01 (a Monday): y = day index (slope 1);
    // next week: y jumps by 3 per day (slope 3) -> delta exactly 2
    val rows =
      (0 until 7).map(k =>
        (ts(f"2024-01-${1 + k}%02d 06:00:00"), "e", (k + 1).toDouble)) ++
      (0 until 7).map(k =>
        (ts(f"2024-01-${8 + k}%02d 06:00:00"), "e", (10 + 3 * k).toDouble))
    val out = AnalyticsOps.segmentedTrend(
        rows.toDF("ts", "event_type", "value"))
      .orderBy("seg")
      .as[(String, java.sql.Date, Long, Double, Option[Double])]
      .collect()
    assert(out.length == 2)
    assert(out(0)._4 == 1.0 && out(0)._5.isEmpty,
      s"first segment: ${out(0)}")
    assert(out(1)._4 == 3.0 && out(1)._5.contains(2.0),
      s"second segment: ${out(1)}")
  }
}
