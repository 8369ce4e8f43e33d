package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-11 batch: the ε-budget composition ledger (accounting view +
  * refusing accountant) over the DP release family, and the
  * local-level Kalman filter. */
class Round11OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("kalmanLevel: matches the scalar predict/gain/update recursion, " +
      "gain converges to the steady state, variance is monotone there") {
    // one key, six days (one out of order in the input — the sort is
    // the operator's job), values chosen to move the level visibly
    val rows = Seq(
      ("k", "2024-01-02 00:00:00", 4.0),
      ("k", "2024-01-01 00:00:00", 2.0),
      ("k", "2024-01-03 00:00:00", 6.0),
      ("k", "2024-01-04 00:00:00", 5.0),
      ("k", "2024-01-05 00:00:00", 7.0),
      ("k", "2024-01-06 00:00:00", 6.5)
    ).toDF("event_type", "ts_s", "value")
      .withColumn("ts", col("ts_s").cast("timestamp"))
    val out = AnalyticsOps.kalmanLevel(rows, "event_type", "ts", "value",
        q = 0.1, r = 1.0, p0 = 1.0)
      .select("n_days", "level", "p_var", "gain_next")
      .as[(Long, Double, Double, Double)].head()

    // scalar reference: the textbook recursion, day-sorted values
    var l = 2.0; var p = 1.0
    Seq(4.0, 6.0, 5.0, 7.0, 6.5).foreach { x =>
      val pp = p + 0.1
      val k = pp / (pp + 1.0)
      l = l + k * (x - l)
      p = (1.0 - k) * pp
    }
    assert(out._1 == 6L)
    assert(out._2 == l, s"level ${out._2} != reference $l")
    assert(out._3 == p, s"p_var ${out._3} != reference $p")
    assert(out._4 == (p + 0.1) / ((p + 0.1) + 1.0))

    // steady state of the Riccati recursion for (q=0.1, r=1):
    // P* = (−q + sqrt(q² + 4qr))/2, K* = (P*+q)/(P*+q+r); after a long
    // series the tracked gain must sit at K* (the whole point of the
    // filter: the gain is derived, not a tuned constant like EWMA's α)
    val long = (1 to 200).map(i =>
      ("k", f"2024-01-01 00:00:00", i.toDouble)).zipWithIndex
      .map { case ((t, _, v), i) =>
        (t, java.time.LocalDate.of(2024, 1, 1).plusDays(i)
          .toString + " 00:00:00", v) }
      .toDF("event_type", "ts_s", "value")
      .withColumn("ts", col("ts_s").cast("timestamp"))
    val g = AnalyticsOps.kalmanLevel(long, "event_type", "ts", "value")
      .select("gain_next").as[Double].head()
    val pStar = (-0.1 + math.sqrt(0.01 + 0.4)) / 2
    val kStar = (pStar + 0.1) / (pStar + 0.1 + 1.0)
    assert(math.abs(g - kStar) < 1e-12,
      f"gain $g%.15f must converge to the Riccati fixed point $kStar%.15f")
  }

  test("privacyBudget: per-salt cumulative spend in release order, " +
      "with the over-budget row flagged — never the whole ledger") {
    val ledger = Seq(
      ("a_counts", "geometric", 0.5, "dp"),
      ("b_mean", "geometric_ratio", 1.2, "dp"),
      ("a_counts", "geometric", 0.5, "other")
    ).toDF("release", "mechanism", "epsilon", "salt")
    val out = AnalyticsOps.privacyBudget(ledger, budget = 1.0)
      .select("salt", "release", "cum_epsilon", "within_budget")
      .as[(String, String, Double, Int)].collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq == Seq(
      ("dp", "a_counts", 0.5, 1),
      ("dp", "b_mean", 1.7, 0), // composition: 0.5 + 1.2 over budget
      ("other", "a_counts", 0.5, 1))) // independent salt: own budget
  }

  test("PrivacyAccountant refuses the release that would exceed the " +
      "budget, BEFORE it observes the data") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0)).toDF("g", "v")
    val ln2 = math.log(2.0)
    val acct = new AnalyticsOps.PrivacyAccountant(budget = 1.5)
    // ln 2 ≈ 0.693 fits; the mean's 2·ln 2 ≈ 1.386 would compose to
    // 2.079 > 1.5 on the same salt — refused loudly
    val counts = acct.noisyCounts(df, "g")
    assert(counts.count() == 2)
    assert(math.abs(acct.spent("dp") - ln2) < 1e-12)
    val e = intercept[IllegalStateException] {
      acct.noisyMean(df, "g", "v")
    }
    assert(e.getMessage.contains("over") &&
      e.getMessage.contains("budget"), e.getMessage)
    // the refused charge spent nothing and logged nothing
    assert(math.abs(acct.spent("dp") - ln2) < 1e-12)
    assert(acct.ledger(spark).count() == 1)
    // a different salt is a different budget: the same release passes
    assert(acct.noisyMean(df, "g", "v", salt = "dp2").count() == 2)
    assert(math.abs(acct.spent("dp2") - 2 * ln2) < 1e-12)
    // and its ledger view agrees with the accounting operator
    val view = AnalyticsOps.privacyBudget(acct.ledger(spark), 1.5)
      .select("salt", "within_budget").as[(String, Int)]
      .collect().toMap
    assert(view == Map("dp" -> 1, "dp2" -> 1))
  }
}
