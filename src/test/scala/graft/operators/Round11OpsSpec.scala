package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-11 batch: the ε-budget composition ledger (accounting view +
  * refusing accountant) over the DP release family. */
class Round11OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

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
